#!/usr/bin/env python
"""Golden capture for the MPEG-2 / 2.5 encoder branches (VERDICT item 7).

The reference's WAV reader only admits 32/44.1/48 kHz (WAV_Reader.py:68), so
its ``version != 3`` encoder branches (granules_per_frame == 1, 9-bit
scale_fac_compress side info, shorter side-info lengths) are unreachable
through files — but they exist, and this repo mirrors them. To test them,
drive the reference ``MP3Encoder`` directly with a crafted WavReader stand-in
at 24 kHz (MPEG-2) and 12 kHz... (12 kHz is not in the reference SAMPLE_RATES
table's encoder rows? it is: rows 6-8 are MPEG-2.5) — and record the output
bytes as goldens.

    python tools/gen_mpeg2_golden.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "golden")

sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, "/root/reference")

from mp3stego.encoder.MP3_Encoder import MP3Encoder  # noqa: E402
from mp3stego.encoder import util as ref_util  # noqa: E402


class FakeWavReader:
    """The WavReader surface MP3Encoder consumes (WAV_Reader.py:120-164),
    fed directly so non-MPEG-1 samplerates become reachable."""

    def __init__(self, samplerate, bitrate, pcm_int16, num_channels=2):
        self.mpeg_mode = (ref_util.MODES["STEREO"] if num_channels > 1
                          else ref_util.MODES["MONO"])
        self.bitrate = bitrate
        self.emphasis = 0
        self.copyright = 0
        self.original = 1
        self.samplerate = samplerate
        self.num_of_channels = num_channels
        self.file_path = "synth.wav"
        self.buffer = pcm_int16
        self.num_of_samples = len(pcm_int16) // 2  # WAV_Reader.py:108 semantics
        self._pos = {0: 0, 1: 1}

    def get_buffer_pos(self, ch):
        return self._pos[ch]

    def set_buffer_pos(self, ch, offset):
        self._pos[ch] += offset


def synth(sr, frames, seed):
    """``frames`` whole 576-sample granule passes per channel: the reference
    IndexErrors on any WAV whose sample count is not a multiple of the frame
    pass (its two-cursor reader runs off the buffer; PARITY.md)."""
    rng = np.random.default_rng(seed)
    n = 576 * frames
    t = np.arange(n)
    sig = (0.4 * np.sin(2 * np.pi * 220 * t / sr)
           + 0.1 * rng.standard_normal(n))
    pcm = np.clip(sig * 20000, -32768, 32767).astype(np.int16)
    stereo = np.empty(2 * n, np.int16)
    stereo[0::2] = pcm
    stereo[1::2] = (-pcm).astype(np.int16)
    return stereo


def main():
    out = {}
    cases = [(24000, 64, "mpeg2_24k_64"), (22050, 80, "mpeg2_22k05_80"),
             (8000, 32, "mpeg25_8k_32")]
    for sr, br, name in cases:
        pcm = synth(sr, 20, seed=sr % 97)
        try:
            enc = MP3Encoder(FakeWavReader(sr, br, pcm))
            enc.encode()
            data = bytes(bytearray(int(b) & 0xFF for b in
                                   enc._MP3Encoder__out_buffer))
            out[name] = np.frombuffer(data, np.uint8)
            out[name + "_pcm"] = pcm
            print(f"{name}: {len(data)} bytes")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: reference FAILED: {type(e).__name__}: {e}")
            out[name + "_error"] = np.frombuffer(
                f"{type(e).__name__}: {e}".encode(), np.uint8)
            out[name + "_pcm"] = pcm
    np.savez_compressed(os.path.join(GOLD, "mpeg2_golden.npz"), **out)
    print("wrote", os.path.join(GOLD, "mpeg2_golden.npz"))


if __name__ == "__main__":
    main()
