"""Acceptance contract: the five reference integration tests
(reference tests/steganography_test.py:15-60), driven through the façade."""

import os

from mp3stego_tpu import Steganography


def test_decoder_encoder(tmp_path, original_fixture_mp3):
    s = Steganography(quiet=True)
    wav = str(tmp_path / "out.wav")
    mp3 = str(tmp_path / "out.mp3")
    bitrate = s.decode_mp3_to_wav(original_fixture_mp3, wav)
    assert bitrate == 320
    s.encode_wav_to_mp3(wav, mp3, bitrate)
    assert os.path.getsize(mp3) > 0


def test_hiding(tmp_path, fixture_mp3):
    s = Steganography(quiet=True)
    out = str(tmp_path / "hidden.mp3")
    too_long = s.hide_message(fixture_mp3, out, "ddd")
    assert too_long is False


def test_too_long_hiding(tmp_path, fixture_mp3):
    s = Steganography(quiet=True)
    out = str(tmp_path / "hidden.mp3")
    too_long = s.hide_message(fixture_mp3, out, "ddd" * 100)
    assert too_long is True


def test_reveal_hiding(tmp_path, fixture_mp3):
    s = Steganography(quiet=True)
    out = str(tmp_path / "hidden.mp3")
    txt = str(tmp_path / "msg.txt")
    s.hide_message(fixture_mp3, out, "ddd")
    s.reveal_massage(out, txt)
    with open(txt) as f:
        assert f.read() == "ddd"


def test_reveal_cleared(tmp_path, fixture_mp3):
    s = Steganography(quiet=True)
    hidden = str(tmp_path / "hidden.mp3")
    cleared = str(tmp_path / "cleared.mp3")
    txt = str(tmp_path / "msg.txt")
    s.hide_message(fixture_mp3, hidden, "ddd")
    s.clear_file(hidden, cleared)
    s.reveal_massage(cleared, txt)
    with open(txt) as f:
        assert f.read() == ""
