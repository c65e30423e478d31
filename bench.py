#!/usr/bin/env python
"""Benchmark: end-to-end batched MP3 decode throughput (realtime-x) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

End-to-end = native host bitstream parse (C++ sync walk, side info, reservoir,
Huffman sample unpack) + dense batching + the batched TPU decode plane
(requantize -> stereo -> alias -> IMDCT -> synthesis), per BASELINE.json's
"batched throughput mode". Baseline = the driver's north-star target of 100x
realtime on one chip (the Python reference publishes no numbers and decodes
slower than realtime, BASELINE.md).
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

FIXTURE = "/root/reference/tests/test.mp3"
N_FILES = 64
ITERS = 5


def main():
    import jax

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    from mp3stego_tpu.parallel.batch_decode import _decode_batch, prepare_batch

    fixture = FIXTURE
    if not os.path.exists(fixture):
        # standalone fallback: rebuild an equivalent fixture from the goldens
        gold = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "tests", "golden", "encode_golden.npz"))
        fixture = "/tmp/bench_fixture.mp3"
        with open(fixture, "wb") as f:
            f.write(gold["mp3_bytes"].tobytes())

    with open(fixture, "rb") as f:
        data = f.read()

    pool = ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1))

    def host_one(_):
        return dp.host_prepare(dh.parse_mp3(data, 0))

    def batch_args(batch):
        return {k: batch[k] for k in dp.ALL_KEYS}

    def pipeline_once():
        preps = list(pool.map(host_one, range(N_FILES)))
        batch = prepare_batch(preps)
        return _decode_batch(batch_args(batch), dtype_name="float32")

    parsed = dh.parse_mp3(data, 0)
    jax.block_until_ready(pipeline_once())   # warm compile + native build

    t0 = time.time()
    for _ in range(ITERS):
        out = pipeline_once()
    jax.block_until_ready(out)
    dt = (time.time() - t0) / ITERS

    frames = parsed.num_frames * N_FILES
    audio_seconds = frames * 1152 / parsed.header.sampling_rate
    realtime_x = audio_seconds / dt

    # device-plane-only throughput for context
    batch = prepare_batch([dp.host_prepare(parsed)] * N_FILES)
    dev_args = jax.device_put(batch_args(batch))
    jax.block_until_ready(_decode_batch(dev_args, dtype_name="float32"))
    t0 = time.time()
    for _ in range(10):
        out = _decode_batch(dev_args, dtype_name="float32")
    jax.block_until_ready(out)
    dev_dt = (time.time() - t0) / 10
    print(f"# end-to-end: {realtime_x:.0f}x realtime ({frames / dt:.0f} fps, "
          f"batch={N_FILES}, {dt * 1e3:.1f}ms/iter, host workers="
          f"{pool._max_workers}); device plane alone: "
          f"{audio_seconds / dev_dt:.0f}x", file=sys.stderr)

    print(json.dumps({
        "metric": "batched MP3 decode, end-to-end (host parse + TPU plane)",
        "value": round(realtime_x, 1),
        "unit": "x realtime per chip",
        "vs_baseline": round(realtime_x / 100.0, 3),
    }))


if __name__ == "__main__":
    # the tunneled chip occasionally throws transient internal errors; the
    # driver runs this once, so retry rather than record a crash
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            print(f"# attempt {attempt + 1} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr)
            if attempt == 2:
                raise
            time.sleep(5)
