"""Property tests of the steganographic channel: roundtrip lossless for any
message that fits, `too_long` exactly when it does not, clear erases."""

import numpy as np
import pytest

from mp3stego_tpu import Steganography
from mp3stego_tpu.bitstream import decoder_host as dh


def _capacity_bits(mp3_path):
    """Nonzero table_select slots = embeddable bits (decoder/util.py:67-81)."""
    with open(mp3_path, "rb") as f:
        p = dh.parse_mp3(f.read(), 0)
    return len(dh.stego_bits(p))


@pytest.mark.parametrize("msg", ["a", "hello world", "punct!?#2", "x" * 40])
def test_roundtrip_any_fitting_ascii_message(msg, fixture_mp3, tmp_path):
    s = Steganography(quiet=True)
    hidden = str(tmp_path / "h.mp3")
    txt = str(tmp_path / "m.txt")
    framed_bits = len(f"{len(msg)}#{msg}".encode("utf-8")) * 8
    cap = _capacity_bits(fixture_mp3)
    too_long = s.hide_message(fixture_mp3, hidden, msg)
    if framed_bits <= cap - 8:   # clearly fits
        assert too_long is False
        s.reveal_massage(hidden, txt)
        with open(txt, encoding="utf-8") as f:
            assert f.read() == msg
    else:
        assert too_long is True


def test_non_ascii_mangled_like_reference(fixture_mp3, tmp_path):
    """Reference quirk (reproduced): the frame header stores the CHARACTER
    count while the payload is UTF-8 BYTES, and reveal rebuilds one chr() per
    byte — so non-ASCII messages come back as mojibake truncated to the char
    count (steganography.py:46-47 vs decoder.py:90-105)."""
    s = Steganography(quiet=True)
    msg = "ünïcödé ✓"
    hidden = str(tmp_path / "h.mp3")
    txt = str(tmp_path / "m.txt")
    assert s.hide_message(fixture_mp3, hidden, msg) is False
    s.reveal_massage(hidden, txt)
    expected = msg.encode("utf-8")[:len(msg)].decode("latin-1")
    with open(txt, encoding="utf-8") as f:
        assert f.read() == expected


def test_capacity_boundary(fixture_mp3, tmp_path):
    """Walk message sizes across the capacity boundary: every fitting size
    roundtrips exactly; every overflowing size reports too_long."""
    s = Steganography(quiet=True)
    cap = _capacity_bits(fixture_mp3)
    # len prefix "NN#" costs (len(str(n))+1)*8 bits
    fits = (cap - 8 * 4) // 8          # safely below
    for n in [max(1, fits - 1), fits]:
        msg = "m" * n
        hidden = str(tmp_path / f"h{n}.mp3")
        txt = str(tmp_path / f"m{n}.txt")
        assert s.hide_message(fixture_mp3, hidden, msg) is False, n
        s.reveal_massage(hidden, txt)
        with open(txt) as f:
            assert f.read() == msg, n
    big = cap // 8 + 8
    assert s.hide_message(fixture_mp3, str(tmp_path / "big.mp3"),
                          "m" * big) is True


def test_clear_erases_channel(fixture_mp3, tmp_path):
    s = Steganography(quiet=True)
    hidden = str(tmp_path / "h.mp3")
    cleared = str(tmp_path / "c.mp3")
    txt = str(tmp_path / "m.txt")
    s.hide_message(fixture_mp3, hidden, "secret")
    s.clear_file(hidden, cleared)
    s.reveal_massage(cleared, txt)
    with open(txt) as f:
        assert f.read() == ""
    # the cleared file still decodes to valid audio
    wav = str(tmp_path / "c.wav")
    assert s.decode_mp3_to_wav(cleared, wav) == 320


def test_trace_hook_writes_profile(fixture_mp3, tmp_path, monkeypatch):
    """MP3STEGO_TPU_TRACE=<dir> dumps a JAX profiler trace during decode."""
    tdir = tmp_path / "trace"
    monkeypatch.setenv("MP3STEGO_TPU_TRACE", str(tdir))
    s = Steganography(quiet=True)
    s.decode_mp3_to_wav(fixture_mp3, str(tmp_path / "t.wav"))
    files = list(tdir.rglob("*")) if tdir.exists() else []
    assert any(f.is_file() for f in files), "no trace artifacts written"
