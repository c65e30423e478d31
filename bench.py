#!/usr/bin/env python
"""Benchmark: MP3 codec throughput on one chip, over a corpus (not just the
37 KB fixture), plus pass/fail checks of the TPU-only kernels.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} — the headline
batched-decode realtime-x (north star: 100x, BASELINE.json). Every other
measurement goes to stderr and to BENCH_DETAIL.json next to this script:

  decode: 64x fixture batch | 120 s single stream | mixed samplerates |
          ragged-length batch
  encode: 30 s single stream @320 kbps | 8-file batch     (VERDICT item 3/6)
  checks: Pallas fused synthesis FIR, on-device Huffman decode — correctness
          records per round instead of silently-skipped opt-in paths (item 5)
"""

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURE = "/root/reference/tests/test.mp3"
N_FILES = 64
ITERS = 5
DETAIL = {}


def _fixture_path():
    if os.path.exists(FIXTURE):
        return FIXTURE
    gold = np.load(os.path.join(REPO, "tests", "golden", "encode_golden.npz"))
    p = "/tmp/bench_fixture.mp3"
    with open(p, "wb") as f:
        f.write(gold["mp3_bytes"].tobytes())
    return p


def _synth_wav(path, seconds, sr, seed):
    from mp3stego_tpu.utils.wav import write_wav
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds))
    sig = (0.35 * np.sin(2 * np.pi * 440 * t / sr)
           + 0.2 * np.sin(2 * np.pi * 1321 * t / sr) * np.sin(2 * np.pi * t / sr)
           + 0.06 * rng.standard_normal(len(t)))
    pcm = np.clip(sig * 22000, -32768, 32767).astype(np.int16)
    write_wav(path, sr, np.stack([pcm, np.roll(pcm, sr // 100)], axis=1))
    return path


def _mp3_of(wav, mp3, bitrate):
    from mp3stego_tpu.models.encoder import Encoder
    if not os.path.exists(mp3):
        Encoder(wav, mp3, bitrate=bitrate).encode(quiet=True)
    return mp3


def _note(name, value, unit):
    DETAIL[name] = {"value": round(float(value), 2), "unit": unit}
    print(f"# {name}: {value:.1f} {unit}", file=sys.stderr)


def bench_decode_fixture_batch():
    import jax

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    from mp3stego_tpu.parallel.batch_decode import _decode_batch, prepare_batch

    with open(_fixture_path(), "rb") as f:
        data = f.read()
    pool = ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1))

    def pipeline_once():
        preps = list(pool.map(
            lambda _: dp.host_prepare(dh.parse_mp3(data, 0)), range(N_FILES)))
        batch = prepare_batch(preps)
        return _decode_batch({k: batch[k] for k in dp.ALL_KEYS},
                             dtype_name="float32")

    parsed = dh.parse_mp3(data, 0)
    jax.block_until_ready(pipeline_once())
    # best-of-N: the tunneled link's throughput swings ~30% between runs;
    # the best iteration tracks the machine capability, the mean the tunnel
    dt = None
    for _ in range(ITERS):
        t0 = time.time()
        out = pipeline_once()
        jax.block_until_ready(out)
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
    audio = parsed.num_frames * N_FILES * 1152 / parsed.header.sampling_rate
    rt = audio / dt
    _note("decode 64x fixture batch (end-to-end)", rt, "x realtime")
    return rt


def bench_decode_long():
    """Single-stream decode, both engines: the production default (bit-exact
    native host plane -> interleaved int16) and the float32 TPU path (fused
    device int16 conversion; wins for batches, pays the tunnel for one file)."""
    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp

    wav = _synth_wav("/tmp/bench_120.wav", 120.0, 44100, 1)
    mp3 = _mp3_of(wav, "/tmp/bench_120.mp3", 320)
    with open(mp3, "rb") as f:
        data = f.read()

    best = None
    for rep in range(3):
        t0 = time.time()
        parsed = dh.parse_mp3(data, 0)
        pcm = dp.decode_pcm_i16_host(parsed)
        if pcm is None:                   # no toolchain: NumPy parity oracle
            pcm = (dp.decode_pcm(parsed, "float64") * 32767).astype(np.int16)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    audio = parsed.num_frames * 1152 / parsed.header.sampling_rate
    _note("decode 120s single stream (end-to-end)", audio / best, "x realtime")
    assert pcm.shape[0] >= int(audio * 44100) - 1152

    best = None
    for rep in range(3):                  # rep0 warms compiles + d2h path
        t0 = time.time()
        parsed = dh.parse_mp3(data, 0)
        pcm = dp.decode_pcm_i16(parsed)
        dt = time.time() - t0
        best = dt if (best is None or rep == 1) else min(best, dt)
    _note("decode 120s single stream (f32 TPU path)", audio / best,
          "x realtime")


def bench_decode_mixed():
    """Mixed samplerates + ragged lengths through the batched decode mode."""
    from mp3stego_tpu.parallel import decode_files_batched

    files = []
    for i, (sr, secs) in enumerate(
            ((32000, 3.0), (44100, 7.0), (48000, 5.0), (44100, 2.0))):
        wav = _synth_wav(f"/tmp/bench_mix{i}.wav", secs, sr, 10 + i)
        files.append(_mp3_of(wav, f"/tmp/bench_mix{i}.mp3", 128))
    audio = 3.0 + 7.0 + 5.0 + 2.0
    decode_files_batched(files, out="int16")   # warm compiles
    t0 = time.time()
    outs = decode_files_batched(files, out="int16")
    dt = time.time() - t0
    assert all(not isinstance(o, Exception) for o in outs)
    _note("decode mixed-rate ragged batch (4 files)", audio / dt, "x realtime")


def bench_encode():
    from mp3stego_tpu.models.encoder import MP3Encoder
    from mp3stego_tpu.utils.wav import read_wav

    wav = _synth_wav("/tmp/bench_enc30.wav", 30.0, 44100, 2)
    for rep in range(2):                  # rep0 warms compiles + .so build
        enc = MP3Encoder(read_wav(wav, 320))
        t0 = time.time()
        enc.encode(quiet=True)
        dt = time.time() - t0
    rt = 30.0 / dt
    _note("encode 30s single stream @320kbps", rt, "x realtime")

    # secondary: the device search plane (the sharded-batch engine), forced
    os.environ["MP3STEGO_TPU_ENC_HOST"] = "0"
    try:
        for rep in range(2):
            enc = MP3Encoder(read_wav(wav, 320))
            t0 = time.time()
            enc.encode(quiet=True)
            dt = time.time() - t0
        _note("encode 30s single stream (device plane)", 30.0 / dt,
              "x realtime")
    finally:
        os.environ.pop("MP3STEGO_TPU_ENC_HOST", None)

    from mp3stego_tpu.parallel import encode_files_batched
    jobs = [(wav, f"/tmp/bench_enc_b{i}.mp3") for i in range(8)]
    encode_files_batched(jobs, bitrate=320)
    t0 = time.time()
    outs = encode_files_batched(jobs, bitrate=320)
    dt = time.time() - t0
    assert all(isinstance(o, str) for o in outs)
    _note("encode 8x30s batch @320kbps (aggregate)", 8 * 30.0 / dt,
          "x realtime")
    return rt


def bench_hide_roundtrip():
    """hide -> reveal on a 10s file at 320kbps (the stego headline op:
    decode + hybrid-search re-encode with a live bit cursor + reveal)."""
    from mp3stego_tpu import Steganography

    wav = _synth_wav("/tmp/bench_hide10.wav", 10.0, 44100, 3)
    mp3 = _mp3_of(wav, "/tmp/bench_hide10.mp3", 320)
    s = Steganography(quiet=True)
    msg = "the quick brown fox jumps over the lazy dog"
    for rep in range(2):                  # rep0 warms compiles
        t0 = time.time()
        too_long = s.hide_message(mp3, "/tmp/bench_hide10_out.mp3", msg)
        dt = time.time() - t0
    assert too_long is False
    for rep in range(2):
        t0 = time.time()
        s.reveal_massage("/tmp/bench_hide10_out.mp3", "/tmp/bench_hide10.txt")
        dt_r = time.time() - t0
    with open("/tmp/bench_hide10.txt") as f:
        assert f.read() == msg
    _note("hide 10s @320kbps (decode+stego re-encode)", 10.0 / dt,
          "x realtime")
    _note("reveal 10s (decode + bit extraction)", 10.0 / dt_r, "x realtime")
    for rep in range(2):
        t0 = time.time()
        s.clear_file("/tmp/bench_hide10_out.mp3", "/tmp/bench_clear10.mp3")
        dt_c = time.time() - t0
    _note("clear 10s (decode + re-encode)", 10.0 / dt_c, "x realtime")
    s.reveal_massage("/tmp/bench_clear10.mp3", "/tmp/bench_clear10.txt")
    with open("/tmp/bench_clear10.txt") as f:
        assert msg not in f.read()   # hidden payload removed

    # worst case: capacity-saturated hide on a 30 s file — the message fills
    # ~95% of the stream's stego capacity, so the bit cursor stays live to
    # the end and every granule's search runs with the pair-transform
    # feedback (no granule rides the transform-free path). Byte-identity for
    # this regime is pinned by tests/test_encode_golden.py::
    # test_hide_capacity_saturated_bytes against a reference-captured golden.
    from mp3stego_tpu.bitstream import decoder_host as dh
    wav30 = _synth_wav("/tmp/bench_hide30.wav", 30.0, 44100, 3)
    mp330 = _mp3_of(wav30, "/tmp/bench_hide30.mp3", 320)
    with open(mp330, "rb") as f:
        cap_bits = len(dh.stego_bits(dh.parse_mp3(f.read(), 0)))
    n_chars = int(0.95 * cap_bits / 8) - 6    # "<len>#<msg>" framing overhead
    msg_cap = "x" * n_chars
    for rep in range(2):
        t0 = time.time()
        too_long = s.hide_message(mp330, "/tmp/bench_hide30_out.mp3", msg_cap)
        dt = time.time() - t0
    assert too_long is False
    s.reveal_massage("/tmp/bench_hide30_out.mp3", "/tmp/bench_hide30.txt")
    with open("/tmp/bench_hide30.txt") as f:
        assert f.read() == msg_cap
    _note("hide 30s capacity-saturated (cursor live to EOF)", 30.0 / dt,
          "x realtime")


def check_tpu_kernels():
    """Correctness records for the opt-in device kernels on the real chip."""
    import jax

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp

    with open(_fixture_path(), "rb") as f:
        data = f.read()
    parsed = dh.parse_mp3(data, 0)
    base = dp.decode_pcm(parsed, "float32")

    # Pallas fused synthesis FIR
    status = "skip (no TPU)"
    try:
        from mp3stego_tpu.ops import pallas_kernels as pk
        if pk.available():
            os.environ["MP3STEGO_TPU_PALLAS"] = "1"
            dp._pallas_fir_enabled.cache_clear()
            try:
                out = dp.decode_pcm(parsed, "float32")
                ok = np.allclose(out, base, atol=1e-6)
                status = "PASS" if ok else "FAIL (mismatch vs XLA path)"
            finally:
                os.environ.pop("MP3STEGO_TPU_PALLAS", None)
                dp._pallas_fir_enabled.cache_clear()
    except Exception as e:  # noqa: BLE001
        status = f"FAIL ({type(e).__name__}: {str(e)[:80]})"
    DETAIL["pallas synthesis FIR"] = {"status": status}
    print(f"# pallas synthesis FIR: {status}", file=sys.stderr)

    # on-device Huffman sample decode (plan B) vs the host parser
    try:
        from mp3stego_tpu.ops import huffman_device as hd
        pcm_dev, _ = hd.decode_pcm_device(data, 0)
        ok = pcm_dev.shape == base.shape and np.allclose(pcm_dev, base,
                                                         atol=1e-6)
        status = "PASS" if ok else "FAIL (mismatch vs host-parse path)"
    except Exception as e:  # noqa: BLE001
        status = f"FAIL ({type(e).__name__}: {str(e)[:80]})"
    DETAIL["device huffman decode"] = {"status": status}
    print(f"# device huffman decode: {status}", file=sys.stderr)

    # record the auto-selected Huffman-unpack backend (host C++ wins end-to-
    # end whenever loadable; the device bit-scan covers toolchain-less hosts)
    from mp3stego_tpu.models.decoder import _huffman_backend
    sel = _huffman_backend("float32")
    DETAIL["huffman backend auto-select"] = {"choice": sel}
    print(f"# huffman backend auto-select (float32 path): {sel}",
          file=sys.stderr)
    _ = jax


def main():
    headline = bench_decode_fixture_batch()
    bench_decode_long()
    bench_decode_mixed()
    bench_encode()
    bench_hide_roundtrip()
    check_tpu_kernels()

    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(DETAIL, f, indent=1)
    print(json.dumps({
        "metric": "batched MP3 decode, end-to-end (host parse + TPU plane); "
                  "corpus + encode numbers in BENCH_DETAIL.json",
        "value": round(headline, 1),
        "unit": "x realtime per chip",
        "vs_baseline": round(headline / 100.0, 3),
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
