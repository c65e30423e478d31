#!/usr/bin/env python
"""Capacity-saturated hide golden: drive the REFERENCE library with a message
that keeps the stego bit cursor live to the end of the fixture.

Hide re-encodes the decoded WAV, and THAT stream offers 414 usable stego
bits (nonzero table-select slots of the clear re-encode; the original
fixture offers 419). A 48-char message frames to "48#<msg>" = 408 bits, so
the cursor is still embedding inside the final frame (414-408 = 6 spare
bits < the ~12 slots of one frame). This is the worst case for the hide
engines: no granule can be searched without the pair-transform feedback.
Reference hot path: MP3_Encoder.py:958-996 + 1257-1263 per granule,
sequentially.

Writes tests/golden/capstego_golden.npz {hidden_cap, msg_cap}.

    python tools/gen_golden_cap.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "golden")
WORK = os.path.join(GOLD, "_work")
FIXTURE = "/root/reference/tests/test.mp3"

sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, "/root/reference")

os.makedirs(WORK, exist_ok=True)

MSG_CAP = "pack my box with five dozen liquor jugs and more"  # 48 chars


def main():
    from mp3stego.steganography import Steganography
    assert len(MSG_CAP) == 48, len(MSG_CAP)
    s = Steganography(quiet=True)
    out = os.path.join(WORK, "hidden_cap.mp3")
    too_long = s.hide_message(FIXTURE, out, MSG_CAP)
    assert too_long is False, "capacity message must still fit"

    rev = os.path.join(WORK, "rev_cap.txt")
    s.reveal_massage(out, rev)
    with open(rev) as f:
        assert f.read() == MSG_CAP

    with open(out, "rb") as f:
        hidden = np.frombuffer(f.read(), dtype=np.uint8)
    np.savez_compressed(
        os.path.join(GOLD, "capstego_golden.npz"),
        hidden_cap=hidden,
        msg_cap=np.frombuffer(MSG_CAP.encode(), dtype=np.uint8))
    print(f"capacity-hide golden saved ({len(hidden)} bytes)")


if __name__ == "__main__":
    main()
