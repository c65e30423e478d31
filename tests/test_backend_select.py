"""Huffman-unpack backend auto-selection (VERDICT round-1 item 8).

The decode pipeline has two sample-unpack engines (SURVEY §7.3 plans A/B):
the C++ host parser and the on-device bit-scan. Measured end-to-end the C++
parser wins whenever it loads; the device scan only beats the pure-python
fallback. These tests pin that selection logic and the byte-equality of the
device-scan decode against the standard float32 path.
"""

import numpy as np

from mp3stego_tpu.models.decoder import Decoder, _huffman_backend


def test_selection_heuristic(monkeypatch):
    from mp3stego_tpu import native

    monkeypatch.delenv("MP3STEGO_TPU_DEVICE_HUFFMAN", raising=False)
    monkeypatch.setattr(native, "get_lib", lambda: object())
    assert _huffman_backend("float32") == "host"    # C++ wins when loadable
    assert _huffman_backend("float64") == "host"    # parity plane is host-only
    monkeypatch.setattr(native, "get_lib", lambda: None)
    assert _huffman_backend("float32") == "device"  # beats the python fallback
    assert _huffman_backend("float64") == "host"
    monkeypatch.setenv("MP3STEGO_TPU_DEVICE_HUFFMAN", "1")
    assert _huffman_backend("float64") == "device"  # explicit override
    monkeypatch.setenv("MP3STEGO_TPU_DEVICE_HUFFMAN", "0")
    monkeypatch.setattr(native, "get_lib", lambda: None)
    assert _huffman_backend("float32") == "host"


def test_device_backend_decodes_identically(fixture_mp3, tmp_path,
                                            monkeypatch):
    """Forcing the device bit-scan must produce the exact same WAV as the
    standard float32 path (the raw sample plane is bit-exact)."""
    monkeypatch.delenv("MP3STEGO_TPU_DEVICE_HUFFMAN", raising=False)
    host_wav = str(tmp_path / "h.wav")
    Decoder(fixture_mp3, host_wav, precision="float32").decode(quiet=True)
    monkeypatch.setenv("MP3STEGO_TPU_DEVICE_HUFFMAN", "1")
    dev_wav = str(tmp_path / "d.wav")
    Decoder(fixture_mp3, dev_wav, precision="float32").decode(quiet=True)
    with open(host_wav, "rb") as f1, open(dev_wav, "rb") as f2:
        a, b = f1.read(), f2.read()
    assert a == b
    assert len(a) > 44


def test_device_backend_reveals(fixture_mp3, tmp_path, monkeypatch,
                                stego_golden):
    """The device-scan path still extracts stego bits (table_select comes
    from the light host parse)."""
    monkeypatch.setenv("MP3STEGO_TPU_DEVICE_HUFFMAN", "1")
    d = Decoder(fixture_mp3, str(tmp_path / "x.wav"), precision="float32")
    d.decode(quiet=True)
    d2 = Decoder(fixture_mp3, str(tmp_path / "y.wav"))
    d2.decode(quiet=True)
    assert d.output_bits == d2.output_bits
    _ = np, stego_golden
