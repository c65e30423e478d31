#!/usr/bin/env python
"""Generate cross-samplerate/bitrate golden vectors from the reference.

Synthesizes short stereo WAVs (sine + noise mix) at 32/44.1/48 kHz, encodes
each at several bitrates with the reference encoder (numba/bitarray shims),
decodes the result with the reference decoder, and stores the byte-level
outputs. These extend the parity contract beyond the 44.1k/320k fixture.

    python tools/gen_multirate_golden.py
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLD = os.path.join(REPO, "tests", "golden")
WORK = os.path.join(GOLD, "_work")

sys.path.insert(0, os.path.join(HERE, "shims"))
sys.path.insert(0, "/root/reference")

from mp3stego.steganography import Steganography  # noqa: E402


def make_wav(path, rate, seconds=0.35):
    # the reference overruns its sample buffer on partial last frames
    # (WAV_Reader loads exactly num_samples while the encoder reads a whole
    # 1152-sample pass), so keep the signal frame-aligned
    n = max(1, round(rate * seconds / 1152)) * 1152
    t = np.arange(n) / rate
    rng = np.random.default_rng(42)
    left = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(n)
    right = 0.5 * np.sin(2 * np.pi * 1210 * t * (1 + 0.2 * t)) \
        + 0.1 * rng.standard_normal(n)
    pcm = np.stack([left, right], axis=1)
    pcm = np.clip(pcm * 20000, -32768, 32767).astype(np.int16)
    import struct
    payload = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, rate, rate * 4,
                                      4, 16))
        f.write(b"data" + struct.pack("<I", len(payload)) + payload)


def main():
    os.makedirs(WORK, exist_ok=True)
    s = Steganography(quiet=True)
    cases = [(32000, 64), (32000, 192), (44100, 128), (48000, 96),
             (48000, 320)]
    pack = {}
    for rate, kbps in cases:
        tag = f"{rate}_{kbps}"
        wav = os.path.join(WORK, f"mr_{tag}.wav")
        mp3 = os.path.join(WORK, f"mr_{tag}.mp3")
        rt = os.path.join(WORK, f"mr_{tag}_rt.wav")
        make_wav(wav, rate)
        s.encode_wav_to_mp3(wav, mp3, kbps)
        got = s.decode_mp3_to_wav(mp3, rt)
        assert got == kbps, (tag, got)
        with open(wav, "rb") as f:
            pack[f"wav_{tag}"] = np.frombuffer(f.read(), dtype=np.uint8)
        with open(mp3, "rb") as f:
            pack[f"mp3_{tag}"] = np.frombuffer(f.read(), dtype=np.uint8)
        with open(rt, "rb") as f:
            pack[f"rt_{tag}"] = np.frombuffer(f.read(), dtype=np.uint8)
        print(f"{tag}: mp3 {len(pack[f'mp3_{tag}'])}B")
    np.savez_compressed(os.path.join(GOLD, "multirate_golden.npz"), **pack)
    print("multirate golden saved:", len(cases), "cases")


if __name__ == "__main__":
    main()
