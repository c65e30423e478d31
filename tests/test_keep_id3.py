"""ID3v2 carry-over through hide/clear (beyond the reference: its re-encode
always drops the tag — the decoder skips ID3 and the encoder writes bare
frames). Default off = byte parity; ``keep_id3=True`` /
``MP3STEGO_TPU_KEEP_ID3=1`` prepends the input's tag to the output."""

import numpy as np
import pytest

from mp3stego_tpu import Steganography

FIX = "/root/reference/tests/test.mp3"


def _id3_tag() -> bytes:
    """A minimal valid ID3v2.3 tag: one TIT2 frame."""
    payload = b"\x00Test Title"
    frame = b"TIT2" + bytes([0, 0, 0, len(payload)]) + b"\x00\x00" + payload
    body = frame
    size = len(body)
    ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                (size >> 7) & 0x7F, size & 0x7F])
    return b"ID3" + b"\x03\x00" + b"\x00" + ss + body


@pytest.fixture()
def tagged_mp3(tmp_path):
    with open(FIX, "rb") as f:
        data = f.read()
    p = tmp_path / "tagged.mp3"
    p.write_bytes(_id3_tag() + data)
    return str(p)


def test_keep_id3_roundtrip(tagged_mp3, tmp_path):
    tag = _id3_tag()
    s = Steganography(quiet=True, keep_id3=True)
    out = str(tmp_path / "out.mp3")
    assert s.hide_message(tagged_mp3, out, "ddd") is False
    blob = open(out, "rb").read()
    assert blob.startswith(tag)
    # the hidden message still reads back through the tagged output
    txt = str(tmp_path / "r.txt")
    s.reveal_massage(out, txt)
    assert open(txt).read() == "ddd"
    # and clear_file carries it too
    cleared = str(tmp_path / "clear.mp3")
    s.clear_file(out, cleared)
    assert open(cleared, "rb").read().startswith(tag)


def test_keep_id3_default_off_is_reference_parity(tagged_mp3, tmp_path):
    gold = np.load("tests/golden/stego_golden.npz")
    s = Steganography(quiet=True)
    out = str(tmp_path / "out.mp3")
    assert s.hide_message(tagged_mp3, out, "ddd") is False
    # tag dropped, bytes identical to the reference's output for the
    # untagged fixture (the ID3 block never affects the audio path)
    assert open(out, "rb").read() == gold["hidden_short"].tobytes()


def test_keep_id3_ignores_untagged_input(tmp_path):
    s = Steganography(quiet=True, keep_id3=True)
    out = str(tmp_path / "out.mp3")
    gold = np.load("tests/golden/stego_golden.npz")
    assert s.hide_message(FIX, out, "ddd") is False
    assert open(out, "rb").read() == gold["hidden_short"].tobytes()
