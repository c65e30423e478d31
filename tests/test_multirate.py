"""Cross-samplerate/bitrate parity: encode + decode byte-identity against
reference-generated goldens at 32/44.1/48 kHz and several bitrates
(tools/gen_multirate_golden.py)."""

import numpy as np
import pytest

from mp3stego_tpu import Steganography

CASES = [(32000, 64), (32000, 192), (44100, 128), (48000, 96), (48000, 320)]


@pytest.fixture(scope="module")
def multirate_golden():
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "multirate_golden.npz")
    return np.load(path)


@pytest.mark.parametrize("rate,kbps", CASES)
def test_encode_matches_reference(rate, kbps, multirate_golden, tmp_path):
    tag = f"{rate}_{kbps}"
    wav = tmp_path / "in.wav"
    wav.write_bytes(multirate_golden[f"wav_{tag}"].tobytes())
    out = tmp_path / "out.mp3"
    s = Steganography(quiet=True)
    s.encode_wav_to_mp3(str(wav), str(out), kbps)
    assert out.read_bytes() == multirate_golden[f"mp3_{tag}"].tobytes(), tag


@pytest.mark.parametrize("rate,kbps", CASES)
def test_decode_matches_reference(rate, kbps, multirate_golden, tmp_path):
    tag = f"{rate}_{kbps}"
    mp3 = tmp_path / "in.mp3"
    mp3.write_bytes(multirate_golden[f"mp3_{tag}"].tobytes())
    out = tmp_path / "out.wav"
    s = Steganography(quiet=True)
    assert s.decode_mp3_to_wav(str(mp3), str(out)) == kbps
    assert out.read_bytes() == multirate_golden[f"rt_{tag}"].tobytes(), tag


def test_hide_reveal_roundtrip_48k(multirate_golden, tmp_path):
    """The stego channel works across samplerates, not just the fixture."""
    mp3 = tmp_path / "in.mp3"
    mp3.write_bytes(multirate_golden["mp3_48000_320"].tobytes())
    hidden = tmp_path / "h.mp3"
    txt = tmp_path / "m.txt"
    s = Steganography(quiet=True)
    too_long = s.hide_message(str(mp3), str(hidden), "ok!")
    assert too_long is False
    s.reveal_massage(str(hidden), str(txt))
    assert txt.read_text() == "ok!"
