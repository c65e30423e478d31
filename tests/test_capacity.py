"""`Steganography.message_capacity` (beyond the reference, whose only
capacity signal is the post-hoc ``too_long`` bool): the returned length must
be the EXACT boundary — c chars fit and reveal whole, c+1 overflows."""

from mp3stego_tpu import Steganography

FIX = "/root/reference/tests/test.mp3"


def test_capacity_exact_boundary(tmp_path):
    s = Steganography(quiet=True)
    c = s.message_capacity(FIX)
    assert c > 0
    fit = str(tmp_path / "fit.mp3")
    over = str(tmp_path / "over.mp3")
    assert s.hide_message(FIX, fit, "x" * c) is False
    assert s.hide_message(FIX, over, "x" * (c + 1)) is True
    txt = str(tmp_path / "r.txt")
    s.reveal_massage(fit, txt)
    assert open(txt).read() == "x" * c


def test_capacity_deterministic_value():
    """decode + re-encode of the fixture is deterministic, so its capacity
    is a constant — pin it (48 chars for the 0.94 s 320 kbps fixture)."""
    s = Steganography(quiet=True)
    assert s.message_capacity(FIX) == 48
