#!/usr/bin/env python
"""Benchmark: batched MP3 decode throughput (realtime-x) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = audio-seconds decoded per wall-second by the batched device decode
plane (steady state, host parse amortized once per unique file). Baseline =
the driver's north-star target of 100x realtime on one chip (BASELINE.json;
the Python reference publishes no numbers and decodes slower than realtime).
"""

import json
import sys
import time

import numpy as np

FIXTURE_CANDIDATES = [
    "/root/reference/tests/test.mp3",
]


def main():
    import jax

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    from mp3stego_tpu.parallel.batch_decode import _decode_batch, prepare_batch

    fixture = next((p for p in FIXTURE_CANDIDATES if _exists(p)), None)
    if fixture is None:
        # standalone fallback: rebuild the fixture from the committed golden
        import os
        gold = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests", "golden", "encode_golden.npz"))
        fixture = "/tmp/bench_fixture.mp3"
        with open(fixture, "wb") as f:
            f.write(gold["mp3_bytes"].tobytes())

    with open(fixture, "rb") as f:
        data = f.read()

    t0 = time.time()
    parsed = dh.parse_mp3(data, 0)
    host_parse_s = time.time() - t0
    prep = dp.host_prepare(parsed)

    n_files = 64
    batch = prepare_batch([prep] * n_files)
    args = tuple(np.ascontiguousarray(batch[k]) for k in (
        "raw", "exp1_idx", "exp2x2", "reorder_mask", "ms_mask", "win_row",
        "is_short_blk", "reorder_perm"))
    dev_args = jax.device_put(args)

    out = _decode_batch(*dev_args, dtype_name="float32")   # compile
    jax.block_until_ready(out)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = _decode_batch(*dev_args, dtype_name="float32")
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters

    frames = parsed.num_frames * n_files
    audio_seconds = frames * 1152 / parsed.header.sampling_rate
    realtime_x = audio_seconds / dt

    # end-to-end (single host parse + one batched device pass) for context
    e2e_x = audio_seconds / (dt + host_parse_s * n_files)
    print(f"# device plane: {realtime_x:.1f}x realtime "
          f"({frames / dt:.0f} frames/s, batch={n_files}, dt={dt * 1e3:.1f}ms); "
          f"end-to-end incl. host Huffman parse: {e2e_x:.1f}x",
          file=sys.stderr)

    print(json.dumps({
        "metric": "batched MP3 decode (device plane)",
        "value": round(realtime_x, 1),
        "unit": "x realtime per chip",
        "vs_baseline": round(realtime_x / 100.0, 3),
    }))


def _exists(p):
    import os
    return os.path.exists(p)


if __name__ == "__main__":
    main()
