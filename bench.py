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
DEVICE_OK = True   # set by main(); gates every device-touching section


def _device_available(timeout_s: float = 180.0) -> bool:
    """Bounded device check. Backend init reaches out over the tunnel and
    hangs indefinitely when the chip is unreachable (not catchable with
    try/except) — probe it on a daemon thread so an unreachable chip
    degrades the run to host-only rows instead of producing no artifact."""
    import threading
    out = []

    def run():
        try:
            import jax
            out.append(jax.default_backend() != "cpu"
                       and len(jax.devices()) > 0)
        except Exception:
            out.append(False)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    return bool(out and out[0])


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
    """Honest end-to-end batched decode: 64 files -> int16 PCM in host
    memory through the production ``decode_files_batched`` path. Three rows:

      * auto-select (the HEADLINE: what a user gets; the calibrated cost
        model picks the engine for this host),
      * forced device path with the chunked prep/compute pipeline,
      * device-plane compute+dispatch only (no PCM fetch — the chip/link
        capability number; this was the round-2 headline, kept for
        continuity but no longer labeled end-to-end),

    plus a roofline split of the device path (parse / h2d / compute / fetch
    and the probed link rates) showing which resource binds."""
    import jax

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    from mp3stego_tpu.parallel import decode_files_batched
    from mp3stego_tpu.parallel.batch_decode import (_decode_batch_concat,
                                                    prepare_batch_concat)
    from mp3stego_tpu.utils import calibrate
    from mp3stego_tpu.utils.transfer import fetch_pieces, put_pieces

    with open(_fixture_path(), "rb") as f:
        data = f.read()
    paths = []
    for i in range(N_FILES):
        p = f"/tmp/bench_fix{i}.mp3"
        if not os.path.exists(p):
            with open(p, "wb") as f:
                f.write(data)
        paths.append(p)
    parsed = dh.parse_mp3(data, 0)
    audio = parsed.num_frames * N_FILES * 1152 / parsed.header.sampling_rate

    def best_of(fn, iters=ITERS):
        fn()                                  # warm
        dt = None
        for _ in range(iters):
            t0 = time.time()
            fn()
            d = time.time() - t0
            dt = d if dt is None else min(dt, d)
        return dt

    # 1. production path, engine auto-select — the headline
    rt = audio / best_of(lambda: decode_files_batched(paths, out="int16"))
    _note("decode 64x fixture batch (end-to-end, auto engine)", rt,
          "x realtime")

    if not DEVICE_OK:
        DETAIL["device rows"] = {"status": "SKIPPED (device unreachable)"}
        return rt

    # 2. forced device path (chunked pipeline)
    os.environ["MP3STEGO_TPU_BATCH_HOST_G"] = "0"
    try:
        rt_dev = audio / best_of(
            lambda: decode_files_batched(paths, out="int16"), iters=3)
    finally:
        os.environ.pop("MP3STEGO_TPU_BATCH_HOST_G", None)
    _note("decode 64x batch (device path end-to-end, pipelined)", rt_dev,
          "x realtime")

    # 3. device-plane compute+dispatch only (no PCM fetch)
    pool = ThreadPoolExecutor(max_workers=min(8, os.cpu_count() or 1))

    def compute_only():
        preps = list(pool.map(
            lambda _: dp.host_prepare(dh.parse_mp3(data, 0)), range(N_FILES)))
        batch = prepare_batch_concat(preps)
        out = _decode_batch_concat({k: batch[k] for k in dp.ALL_KEYS},
                                   num_files=batch["num_files"],
                                   dtype_name="float32")
        jax.block_until_ready(out)

    rt_comp = audio / best_of(compute_only)
    _note("decode 64x batch (device plane, compute+dispatch only)", rt_comp,
          "x realtime")
    # record the measured device rate (granules/s) into the cached probe so
    # production engine selections on this host use it
    total_g = parsed.num_frames * 2 * N_FILES
    calibrate.refresh_device_rates(device_gps=total_g * rt_comp / audio)

    # Roofline split of one non-pipelined device pass. Two tunnel gotchas
    # shape this: (a) the warm pass must include a FETCH (the process's
    # first d2h stalls for seconds), and (b) jax.block_until_ready returns
    # without a device round trip on the tunneled backend, so the
    # h2d+compute boundary is taken with a 1-element sync fetch (waits for
    # the whole program, transfers 2 bytes) instead. The warm pass also
    # compiles the single-shot 64-file i16 program, whose shape differs
    # from the chunked pipeline runs above.
    def concat_i16(batch):
        args = {k: put_pieces(batch[k]) for k in dp.ALL_KEYS}
        return _decode_batch_concat(args, num_files=batch["num_files"],
                                    dtype_name="float32", to_i16=True)

    warm = prepare_batch_concat([dp.host_prepare(dh.parse_mp3(data, 0))
                                 for _ in range(N_FILES)])
    fetch_pieces([concat_i16(warm)])
    t0 = time.time()
    preps = [dp.host_prepare(dh.parse_mp3(data, 0)) for _ in range(N_FILES)]
    batch = prepare_batch_concat(preps)
    t1 = time.time()
    dev = concat_i16(batch)
    np.asarray(dev[0, 0, 0, 0])   # sync: whole program done, 2-byte fetch
    t2 = time.time()
    pcm = fetch_pieces([dev])[0]
    t3 = time.time()
    probe = calibrate.get_probe()
    split = {
        "parse+prep_ms": round(1000 * (t1 - t0), 1),
        "h2d+compute_ms": round(1000 * (t2 - t1), 1),
        "fetch_ms": round(1000 * (t3 - t2), 1),
        "fetch_bytes": int(pcm.nbytes),
        "link_out_mbps": round(probe.link_out_mbps, 1),
        "link_in_mbps": round(probe.link_in_mbps, 1),
        "host_plane_gps": round(probe.host_plane_gps),
    }
    DETAIL["decode batch roofline split"] = split
    print(f"# decode batch roofline: {split}", file=sys.stderr)

    # Cost-model residual (VERDICT r3 item 8): the calibrated model's
    # predicted device-path time vs the time just measured, on this host's
    # real link. The model (calibrate.batch_decode_engine) excludes parse —
    # both engines pay it — so the measured side is h2d+compute + fetch.
    # "mispredict" flags when the model's engine choice differs from what
    # the measured times would pick.
    # the same analytic formula calibrate.batch_decode_engine uses (the
    # transfer terms scaled by the probe-measured overlap factor): this
    # record validates the ANALYTIC fallback — the empirical linear model
    # is recorded separately below and never feeds predicted_s
    predicted_s = (probe.device_overhead_s
                   + (total_g * probe.h2d_bpg / (probe.link_out_mbps * 1e6)
                      + total_g * probe.d2h_bpg / (probe.link_in_mbps * 1e6))
                   * probe.xfer_overlap
                   + total_g / probe.device_gps)
    measured_s = (t3 - t1)
    host_s = total_g / probe.host_plane_gps
    model_choice = calibrate.batch_decode_engine(total_g)
    measured_choice = "host" if host_s <= measured_s else "device"
    # actual per-granule transfer volumes of THIS batch (the prep schema
    # evolves) — recorded here and refreshed into the probe so the next
    # selection's prediction tracks the real upload/fetch sizes
    h2d_actual = sum(np.asarray(batch[k]).nbytes
                     for k in dp.ALL_KEYS) / total_g
    d2h_actual = pcm.nbytes / total_g
    resid = {
        "predicted_device_s": round(predicted_s, 3),
        "measured_device_s": round(measured_s, 3),
        "residual_ratio": round(predicted_s / max(measured_s, 1e-6), 2),
        "host_s": round(host_s, 3),
        "model_choice": model_choice,
        "measured_optimal": measured_choice,
        "mispredict": model_choice != measured_choice,
        "within_2x": 0.5 <= predicted_s / max(measured_s, 1e-6) <= 2.0,
        "xfer_overlap": round(probe.xfer_overlap, 2),
        "h2d_bpg_model": round(probe.h2d_bpg),
        "h2d_bpg_actual": round(h2d_actual),
        "d2h_bpg_actual": round(d2h_actual),
    }
    if probe.device_path_gps:          # the empirical model, if already set
        emp_s = probe.device_overhead_s + total_g / probe.device_path_gps
        resid["predicted_empirical_s"] = round(emp_s, 3)
        resid["empirical_within_2x"] = (
            0.5 <= emp_s / max(measured_s, 1e-6) <= 2.0)
    # store the MARGINAL rate (fixed dispatch overhead subtracted); the
    # selector adds the intercept back, so short files aren't priced at the
    # large-batch rate (ADVICE r4)
    calibrate.refresh_device_rates(
        h2d_bpg=h2d_actual, d2h_bpg=d2h_actual,
        device_path_gps=total_g / max(measured_s - probe.device_overhead_s,
                                      1e-3))
    DETAIL["decode cost-model residual"] = resid
    print(f"# decode cost-model residual: {resid}", file=sys.stderr)
    return rt


def bench_link_duplex():
    """Can the host link move both directions at once? Decides the device
    decode path's end-to-end ceiling: full-duplex would bound it by
    max(h2d+compute, fetch); a contended tunnel bounds it by the SUM of all
    bytes over the better solo rate. Recorded so the pipelined-path number
    is judged against the right ceiling."""
    if not DEVICE_OK:
        return
    import threading

    import jax
    import jax.numpy as jnp

    from mp3stego_tpu.utils.transfer import fetch_pieces, put_pieces

    n = 12 << 20
    buf = np.zeros(n, np.uint8)

    @jax.jit
    def touch(x):
        return x + jnp.uint8(1)

    dev = touch(put_pieces(buf))
    jax.block_until_ready(dev)
    fetch_pieces([dev])                   # absorb the first-fetch stall

    def up():
        jax.block_until_ready(touch(put_pieces(buf)))

    def down():
        fetch_pieces([dev])

    t0 = time.time()
    up()
    up_s = time.time() - t0
    t0 = time.time()
    down()
    down_s = time.time() - t0
    reps = 2
    t0 = time.time()
    ta = threading.Thread(target=lambda: [up() for _ in range(reps)])
    tb = threading.Thread(target=lambda: [down() for _ in range(reps)])
    ta.start(); tb.start(); ta.join(); tb.join()
    dt = time.time() - t0
    rec = {
        "solo_up_mbps": round(n / up_s / 1e6, 1),
        "solo_down_mbps": round(n / down_s / 1e6, 1),
        "concurrent_aggregate_mbps": round(2 * reps * n / dt / 1e6, 1),
        "half_duplex_model_mbps": round(2 * n / (up_s + down_s) / 1e6, 1),
        "full_duplex_model_mbps": round(2 * n / max(up_s, down_s) / 1e6, 1),
    }
    DETAIL["link duplex probe"] = rec
    print(f"# link duplex probe: {rec}", file=sys.stderr)


def bench_decode_corpus_device():
    """The device plane's on-chip rate at corpus scale (VERDICT r3 item 2):
    16 distinct 120 s streams (0.59M granule-decodes over 4 dispatches) with
    RESIDENT inputs — the analog of host_plane_gps, which also reads its prep
    from RAM. Production h2d/fetch costs are covered by the end-to-end rows
    above; this row records what the chip itself sustains, with the
    granule-half / synthesis-half split alongside.

    Scale note: one dispatch is capped near 16x120s files by HBM — the
    (F,2,T,32,36) f32 block plane is ~1.35 GB at F=16 and XLA's temps put
    F=64 at 19.4 G > 15.75 G HBM — so corpus scale means chunked dispatches
    (the pipelined production path already chunks at 16 files)."""
    import functools

    import jax
    import jax.numpy as jnp

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    from mp3stego_tpu.parallel.batch_decode import (_decode_batch_concat,
                                                    prepare_batch_concat)
    from mp3stego_tpu.utils import calibrate

    if not DEVICE_OK:
        DETAIL["decode plane corpus (on-chip)"] = {
            "status": "SKIPPED (device unreachable)"}
        return

    preps = []
    g_total = 0
    for i in range(16):
        wav = _synth_wav(f"/tmp/bench_corpus{i}.wav", 120.0, 44100, 100 + i)
        mp3 = _mp3_of(wav, f"/tmp/bench_corpus{i}.mp3", 320)
        with open(mp3, "rb") as f:
            parsed = dh.parse_mp3(f.read(), 0)
        preps.append(dp.host_prepare(parsed))
        g_total += parsed.num_frames * 2
    batch = prepare_batch_concat(preps)
    n_files = batch["num_files"]
    args = {k: jax.device_put(batch[k]) for k in dp.ALL_KEYS}

    @functools.partial(jax.jit, static_argnames=("dn",))
    def blocks_only(a, dn="float32"):
        return dp.granule_blocks(a, jnp.dtype(dn))   # concat: no file axis

    def full(a):
        return _decode_batch_concat(a, num_files=n_files,
                                    dtype_name="float32")

    def rate(f, dispatches=4):
        out = f(args)
        np.asarray(out.reshape(-1)[0])          # warm + sync
        t0 = time.time()
        for _ in range(dispatches):
            out = f(args)
        np.asarray(out.reshape(-1)[0])          # 2-byte sync fetch
        return g_total * dispatches / (time.time() - t0)

    gps_blocks = rate(blocks_only)
    gps_full = rate(full)
    host_gps = calibrate.get_probe().host_plane_gps
    split = {
        "granules_decoded": g_total * 4,
        "device_plane_gps": round(gps_full),
        "granule_half_gps": round(gps_blocks),
        "synthesis_share": round(1 - gps_full / gps_blocks, 2),
        "host_plane_gps_1core": round(host_gps),
        "device_vs_host_core": round(gps_full / max(host_gps, 1.0), 1),
    }
    DETAIL["decode plane corpus (on-chip, resident inputs)"] = split
    print(f"# decode plane corpus on-chip: {split}", file=sys.stderr)
    _note("decode plane corpus on-chip (0.59M granules, resident)",
          gps_full / 153.1, "x realtime")   # 44.1kHz: 153.1 granules/s/s


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
    for rep in range(6):
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

    if not DEVICE_OK:
        return
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
    dt = None
    for rep in range(8):                  # rep0 warms compiles + .so build
        enc = MP3Encoder(read_wav(wav, 320))
        t0 = time.time()
        enc.encode(quiet=True)
        d = time.time() - t0
        dt = d if (dt is None or rep == 1) else min(dt, d)
    rt = 30.0 / dt
    _note("encode 30s single stream @320kbps", rt, "x realtime")

    # constant-quality VBR (target average 128): a bisection over the
    # whole-file cost picks the global quality step (AVX-512 C++ pass per
    # visited step; device cost grid on toolchain-less hosts), then the
    # chosen engine runs at the per-frame budgets — recorded since round 3
    # as the beyond-reference encode mode
    dt = None
    for rep in range(8):                  # best-of past the warm rep: this
        enc = MP3Encoder(read_wav(wav, 128), vbr=True)   # host's single-shot
        t0 = time.time()                                 # noise is +-40%
        enc.encode(quiet=True)
        d = time.time() - t0
        dt = d if (dt is None or rep == 1) else min(dt, d)
    _note("encode 30s VBR (target avg 128kbps, bisected rate choice)",
          30.0 / dt, "x realtime")

    # secondary: the device search plane (the sharded-batch engine), forced
    if DEVICE_OK:
        os.environ["MP3STEGO_TPU_ENC_HOST"] = "0"
        try:
            dt = None
            for rep in range(4):          # rep0 warms compiles; best-of rest
                enc = MP3Encoder(read_wav(wav, 320))
                t0 = time.time()
                enc.encode(quiet=True)
                d = time.time() - t0
                dt = d if (dt is None or rep == 1) else min(dt, d)
            _note("encode 30s single stream (device plane)", 30.0 / dt,
                  "x realtime")
        finally:
            os.environ.pop("MP3STEGO_TPU_ENC_HOST", None)

    from mp3stego_tpu.parallel import encode_files_batched
    jobs = [(wav, f"/tmp/bench_enc_b{i}.mp3") for i in range(8)]
    encode_files_batched(jobs, bitrate=320)     # warm
    dt = None
    for _ in range(5):                          # best-of: this host's timing
        t0 = time.time()                        # noise is +-20% single-shot
        outs = encode_files_batched(jobs, bitrate=320)
        d = time.time() - t0
        dt = d if dt is None else min(dt, d)
        assert all(isinstance(o, str) for o in outs)
    _note("encode 8x30s batch @320kbps (aggregate)", 8 * 30.0 / dt,
          "x realtime")

    # the sharded device group engine, forced (the flagship distributed
    # encode construct — on a mesh this shards over "files"; here it runs
    # on the one real chip so the row records its per-chip throughput)
    if DEVICE_OK:
        os.environ["MP3STEGO_TPU_BATCH_ENC_HOST"] = "0"
        try:
            encode_files_batched(jobs, bitrate=320)   # warm compiles
            t0 = time.time()
            outs = encode_files_batched(jobs, bitrate=320)
            dt = time.time() - t0
            assert all(isinstance(o, str) for o in outs)
            _note("encode 8x30s batch (device group engine forced)",
                  8 * 30.0 / dt, "x realtime")
        finally:
            os.environ.pop("MP3STEGO_TPU_BATCH_ENC_HOST", None)
    return rt


def bench_encode_corpus_device():
    """The encode plane's on-chip rate at corpus scale (VERDICT r3 item 3):
    Q31 analysis+MDCT plus the FULL bisection+inner rate search for 2x120s
    stereo files per dispatch (one lane-budget sub-batch of the group
    engine, 36,864 lanes), inputs RESIDENT — the analog of host_search_gps,
    which also reads PCM from RAM. Production h2d/fetch costs are covered by
    the end-to-end group-engine rows above; this row records what the chip
    itself sustains, with the analysis/search split alongside."""
    import functools

    import jax
    import jax.numpy as jnp

    from mp3stego_tpu.models.encoder import MP3Encoder
    from mp3stego_tpu.ops import quant as Q
    from mp3stego_tpu.ops import search_plane as SP
    from mp3stego_tpu.ops.encode_plane import _PAST, analysis_mdct_i16
    from mp3stego_tpu.utils import calibrate
    from mp3stego_tpu.utils.wav import read_wav

    if not DEVICE_OK:
        DETAIL["encode plane corpus (on-chip)"] = {
            "status": "SKIPPED (device unreachable)"}
        return

    wav = _synth_wav("/tmp/bench_enc_corpus.wav", 120.0, 44100, 7)
    enc = MP3Encoder(read_wav(wav, 320))
    nf = enc._num_frames()
    gpf = enc.granules_per_frame
    tg = nf * gpf
    tg_max = -(-tg // 256) * 256
    nch, F = 2, 2                       # 2 files/dispatch = the lane budget
    s = enc._channel_streams_i16(nf)
    pcm = np.zeros((F, nch, _PAST + tg_max * 576), np.int16)
    pcm[:, :, _PAST:_PAST + s.shape[1]] = s
    _, mean_bits_f = enc._plane_framing(nf)
    lane_block = np.repeat(np.minimum(
        np.asarray(mean_bits_f, np.int64) // nch,
        Q.MAX_BITS_ALLOWANCE), gpf)
    max_bits = np.zeros((F, nch * tg_max), np.int32)
    for ch in range(nch):
        max_bits[:, ch * tg_max: ch * tg_max + tg] = lane_block

    pcm_dev = jax.device_put(pcm)
    mb_dev = jax.device_put(max_bits)
    sr_idx = enc.samplerate_index

    @functools.partial(jax.jit, static_argnames=("sr",))
    def full(p, mb, sr):
        xr = jax.vmap(analysis_mdct_i16)(p).reshape(F, nch * tg_max, 576)
        fin, *_ = jax.vmap(
            lambda a, b: SP._search_body_packed(a, b, sr))(xr, mb)
        return fin

    @functools.partial(jax.jit, static_argnames=("sr",))
    def analysis_only(p, sr):
        return jax.vmap(analysis_mdct_i16)(p)

    @functools.partial(jax.jit, static_argnames=("sr",))
    def search_only(xr, mb, sr):
        fin, *_ = jax.vmap(
            lambda a, b: SP._search_body_packed(a, b, sr))(xr, mb)
        return fin

    def rate(f, args, dispatches=4):
        out = f(*args)
        np.asarray(out.reshape(-1)[0])           # warm + sync
        t0 = time.time()
        for _ in range(dispatches):
            out = f(*args)
        np.asarray(out.reshape(-1)[0])           # 2-byte sync fetch
        return F * nch * tg * dispatches / (time.time() - t0)

    gps_a = rate(analysis_only, (pcm_dev, sr_idx))
    gps_f = rate(full, (pcm_dev, mb_dev, sr_idx))
    # like-for-like row: the rate search alone over RESIDENT spectra —
    # host_search_gps measures exactly this (rate_search_file on xr in RAM),
    # so this pair is the honest device-vs-one-core comparison; gps_f
    # additionally pays Q31 analysis+MDCT, which the host engine pays in
    # its own separate C++ pass (encode_plane.run_analysis_native)
    xr_res = jax.device_put(np.asarray(
        analysis_only(pcm_dev, sr_idx)).reshape(F, nch * tg_max, 576))
    gps_s = rate(search_only, (xr_res, mb_dev, sr_idx))
    host_gps = calibrate.get_probe().host_search_gps
    split = {
        "lanes_searched": F * nch * tg * 4,
        "device_encode_gps": round(gps_f),
        "analysis_only_gps": round(gps_a),
        "search_only_gps": round(gps_s),
        "search_share": round(1 - gps_f / gps_a, 2),
        "host_search_gps_1core": round(host_gps),
        "device_vs_host_core": round(gps_s / max(host_gps, 1.0), 2),
        "device_full_vs_host_search": round(gps_f / max(host_gps, 1.0), 2),
    }
    DETAIL["encode plane corpus (on-chip, resident inputs)"] = split
    print(f"# encode plane corpus on-chip: {split}", file=sys.stderr)
    _note("encode plane corpus on-chip (147k lane-searches, resident)",
          gps_f / 153.1, "x realtime")   # stereo 44.1k: 153.1 lanes/s/s


def bench_plane_utilization():
    """Per-stage MFU / utilization of both device planes from a profiler
    trace (VERDICT r4 item 1): time share, executed vs useful FLOPs,
    achieved TFLOP/s and GB/s, % of v5e peak, binding resource per stage,
    plus the per-evaluation split of the encode search. Full method in
    tools/profile_planes.py; the full record also lands in
    PROFILE_PLANES.json."""
    if not DEVICE_OK:
        DETAIL["device plane utilization"] = {
            "status": "SKIPPED (device unreachable)"}
        return
    sys.path.insert(0, REPO)
    from tools import profile_planes as PP

    try:
        dec = PP.profile_decode_plane(dispatches=2)
        enc = PP.profile_encode_plane(dispatches=2)
    except Exception as e:  # noqa: BLE001 - profiling must not kill bench
        DETAIL["device plane utilization"] = {
            "status": f"FAIL ({type(e).__name__}: {str(e)[:120]})"}
        return
    rec = {"decode": dec, "encode": enc,
           "peaks": {"bf16_tflops": PP.PEAK_BF16_TFLOPS,
                     "f32_highest_tflops": round(PP.PEAK_F32HI_TFLOPS, 1),
                     "hbm_gbps": PP.PEAK_HBM_GBPS}}
    with open(os.path.join(REPO, "PROFILE_PLANES.json"), "w") as f:
        json.dump(rec, f, indent=1)
    DETAIL["decode plane utilization"] = {
        "summary": dec["summary"],
        "stages": {k: {f: v[f] for f in ("ms", "share", "tflops_s", "gb_s",
                                         "pct_hbm", "binding", "dominant")}
                   for k, v in dec["stages"].items()}}
    DETAIL["encode plane utilization"] = {
        "summary": enc["summary"],
        "per_eval": enc["per_eval"],
        "stages": {k: {f: v[f] for f in ("ms", "share", "tflops_s", "gb_s",
                                         "pct_hbm", "binding", "dominant")}
                   for k, v in enc["stages"].items()}}
    print(PP.fmt_table(dec, "decode plane utilization"), file=sys.stderr)
    print(PP.fmt_table(enc, "encode plane utilization"), file=sys.stderr)


def bench_weak_scaling():
    """Multi-chip scaling shape on the 8-virtual-device CPU mesh (VERDICT
    r4 item 9): collective counts per width from compiled HLO + wall clock.
    Runs in a subprocess (needs the CPU backend with 8 virtual devices)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-u", os.path.join(REPO, "tools",
                                                "weak_scaling.py")],
            capture_output=True, text=True, timeout=1500,
            env=dict(os.environ, MP3STEGO_TPU_PROBE="0",
                     MP3STEGO_TPU_SEARCH_CHUNK="128"))
        rec = json.loads(r.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001
        rec = {"status": f"FAIL ({type(e).__name__}: {str(e)[:120]})"}
    DETAIL["multichip weak scaling (CPU-sim, 8 files)"] = rec
    print(f"# multichip weak scaling (CPU-sim): {rec}", file=sys.stderr)


def bench_decode_streaming():
    """Long-file decode through the O(chunk)-memory streaming path
    (models/streaming.py): a 30-minute 128 kbps stream decoded start to
    finish, with peak RSS measured in a fresh subprocess so the bounded-
    memory claim is on the record (whole-file parse of the same stream
    would materialize ~1.3 GB of planes; the streaming path stays flat)."""
    import subprocess

    wav = _synth_wav("/tmp/bench_30min.wav", 1800.0, 44100, 9)
    mp3 = _mp3_of(wav, "/tmp/bench_30min.mp3", 128)
    code = (
        # peak RSS via /proc/self/status VmHWM: ru_maxrss lives in the
        # kernel's signal_struct and SURVIVES fork+exec, so a subprocess of
        # this (JAX-heavy) bench inherits the parent's multi-GB peak; VmHWM
        # is per-mm and resets on exec, measuring only this process.
        "import json, sys, time\n"
        "def hwm():\n"
        "    with open('/proc/self/status') as f:\n"
        "        for ln in f:\n"
        "            if ln.startswith('VmHWM:'): return int(ln.split()[1])\n"
        "    return 0\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from mp3stego_tpu.models.streaming import decode_file_streaming\n"
        "from mp3stego_tpu.ops import decode_plane  # import-only baseline\n"
        "base = hwm()\n"
        "t0 = time.time()\n"
        f"info = decode_file_streaming({mp3!r}, '/tmp/bench_30min_out.wav')\n"
        "dt = time.time() - t0\n"
        "rss = hwm()\n"
        "print(json.dumps({'dt': dt, 'rss_mb': rss / 1024,\n"
        "                  'delta_mb': (rss - base) / 1024,\n"
        "                  'frames': info['num_frames']}))\n")
    best = None
    for rep in range(2):   # rep0 warms the page cache + .so build
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=900,
                           env=dict(os.environ, JAX_PLATFORMS="cpu"))
        out = json.loads(r.stdout.strip().splitlines()[-1])
        if best is None:
            best = dict(out)
        else:   # steady state: best time, min footprint across reps
            best["dt"] = min(best["dt"], out["dt"])
            best["rss_mb"] = min(best["rss_mb"], out["rss_mb"])
            best["delta_mb"] = min(best["delta_mb"], out["delta_mb"])
    rt = 1800.0 / best["dt"]
    _note("decode 30min stream (streaming, bounded memory)", rt, "x realtime")
    DETAIL["streaming decode peak RSS"] = {
        "value": round(best["rss_mb"]), "unit": "MB",
        "decode_delta_mb": round(best["delta_mb"]),
        "frames": best["frames"]}
    print(f"# streaming decode peak RSS: {best['rss_mb']:.0f} MB "
          f"(+{best['delta_mb']:.0f} MB over import baseline)",
          file=sys.stderr)


def bench_encode_streaming():
    """Long-input encode through the O(chunk)-memory streaming path: a
    30-minute WAV (318 MB) encoded start to finish in a fresh subprocess
    with peak RSS on the record (the whole-file engine materializes the
    full spectra plane, ~2.4 GB for this input; the streaming path stays
    flat and byte-identical)."""
    import subprocess

    wav = _synth_wav("/tmp/bench_30min.wav", 1800.0, 44100, 9)
    code = (
        "import json, sys, time\n"
        "def hwm():\n"
        "    with open('/proc/self/status') as f:\n"
        "        for ln in f:\n"
        "            if ln.startswith('VmHWM:'): return int(ln.split()[1])\n"
        "    return 0\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from mp3stego_tpu.models.streaming import encode_file_streaming\n"
        "base = hwm()\n"
        "t0 = time.time()\n"
        f"info = encode_file_streaming({wav!r}, '/tmp/bench_30min_enc.mp3',"
        " 128)\n"
        "dt = time.time() - t0\n"
        "print(json.dumps({'dt': dt, 'rss_mb': hwm() / 1024,\n"
        "                  'delta_mb': (hwm() - base) / 1024,\n"
        "                  'frames': info['frames']}))\n")
    best = None
    for rep in range(2):   # rep0 warms the page cache + .so build
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=900,
                           env=dict(os.environ, JAX_PLATFORMS="cpu"))
        out = json.loads(r.stdout.strip().splitlines()[-1])
        if best is None:
            best = dict(out)
        else:
            best["dt"] = min(best["dt"], out["dt"])
            best["rss_mb"] = min(best["rss_mb"], out["rss_mb"])
            best["delta_mb"] = min(best["delta_mb"], out["delta_mb"])
    _note("encode 30min stream (streaming, bounded memory)",
          1800.0 / best["dt"], "x realtime")
    DETAIL["streaming encode peak RSS"] = {
        "value": round(best["rss_mb"]), "unit": "MB",
        "encode_delta_mb": round(best["delta_mb"]),
        "frames": best["frames"]}
    print(f"# streaming encode peak RSS: {best['rss_mb']:.0f} MB "
          f"(+{best['delta_mb']:.0f} MB over import baseline)",
          file=sys.stderr)


def bench_hide_roundtrip():
    """hide -> reveal on a 10s file at 320kbps (the stego headline op:
    decode + hybrid-search re-encode with a live bit cursor + reveal)."""
    from mp3stego_tpu import Steganography

    wav = _synth_wav("/tmp/bench_hide10.wav", 10.0, 44100, 3)
    mp3 = _mp3_of(wav, "/tmp/bench_hide10.mp3", 320)
    s = Steganography(quiet=True)
    msg = "the quick brown fox jumps over the lazy dog"
    dt = None
    for rep in range(6):                  # rep0 warms compiles; then best-of
        t0 = time.time()
        too_long = s.hide_message(mp3, "/tmp/bench_hide10_out.mp3", msg)
        d = time.time() - t0
        dt = d if (dt is None or rep == 1) else min(dt, d)
    assert too_long is False
    dt_r = None
    for rep in range(6):
        t0 = time.time()
        s.reveal_massage("/tmp/bench_hide10_out.mp3", "/tmp/bench_hide10.txt")
        d = time.time() - t0
        dt_r = d if (dt_r is None or rep == 1) else min(dt_r, d)
    with open("/tmp/bench_hide10.txt") as f:
        assert f.read() == msg
    _note("hide 10s @320kbps (decode+stego re-encode)", 10.0 / dt,
          "x realtime")
    _note("reveal 10s (decode + bit extraction)", 10.0 / dt_r, "x realtime")
    dt_c = None
    for rep in range(6):
        t0 = time.time()
        s.clear_file("/tmp/bench_hide10_out.mp3", "/tmp/bench_clear10.mp3")
        d = time.time() - t0
        dt_c = d if (dt_c is None or rep == 1) else min(dt_c, d)
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
    dt = None
    for rep in range(6):
        t0 = time.time()
        too_long = s.hide_message(mp330, "/tmp/bench_hide30_out.mp3", msg_cap)
        d = time.time() - t0
        dt = d if (dt is None or rep == 1) else min(dt, d)
    assert too_long is False
    s.reveal_massage("/tmp/bench_hide30_out.mp3", "/tmp/bench_hide30.txt")
    with open("/tmp/bench_hide30.txt") as f:
        assert f.read() == msg_cap
    _note("hide 30s capacity-saturated (cursor live to EOF)", 30.0 / dt,
          "x realtime")

    # same saturated hide through the cursor-pinned PARALLEL device engine
    # (models/encoder._encode_hide_parallel): the whole-file search runs on
    # device with pinned cursors, no sequential head. On a fast link / mesh
    # this is the scale-out hide path; the row proves it on-chip each round.
    if not DEVICE_OK:
        return
    os.environ["MP3STEGO_TPU_ENC_HOST"] = "0"
    try:
        dt = None
        for rep in range(4):              # rep0 warms compiles; best-of rest
            t0 = time.time()
            too_long = s.hide_message(mp330, "/tmp/bench_hide30_dev.mp3",
                                      msg_cap)
            d = time.time() - t0
            dt = d if (dt is None or rep == 1) else min(dt, d)
        assert too_long is False
        with open("/tmp/bench_hide30_dev.mp3", "rb") as fa, \
                open("/tmp/bench_hide30_out.mp3", "rb") as fb:
            assert fa.read() == fb.read()   # engine byte-identity on-chip
        _note("hide 30s capacity-saturated (device parallel engine)",
              30.0 / dt, "x realtime")
        # fixpoint record (VERDICT r3 item 4): the cursor-pinning loop's
        # measured convergence — "fused" = pass A + on-device pinning +
        # pass B + scfsi ran as one program; extra_rounds = re-pin rounds
        # the count feedback actually needed
        from mp3stego_tpu.models.encoder import MP3Encoder
        if MP3Encoder.last_hide_parallel_stats is not None:
            DETAIL["hide parallel fixpoint"] = dict(
                MP3Encoder.last_hide_parallel_stats)
            print(f"# hide parallel fixpoint: "
                  f"{MP3Encoder.last_hide_parallel_stats}", file=sys.stderr)
        if MP3Encoder.last_redo_split is not None:
            DETAIL["hide verify/redo split"] = dict(
                MP3Encoder.last_redo_split)
            print(f"# hide verify/redo split: "
                  f"{MP3Encoder.last_redo_split}", file=sys.stderr)
    finally:
        os.environ.pop("MP3STEGO_TPU_ENC_HOST", None)


def check_tpu_kernels():
    """Correctness records for the opt-in device kernels on the real chip."""
    if not DEVICE_OK:
        DETAIL["pallas synthesis FIR"] = {
            "status": "SKIPPED (device unreachable)"}
        DETAIL["device huffman decode"] = {
            "status": "SKIPPED (device unreachable)"}
        return
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

    # on-device Huffman sample decode (plan B) vs the host parser:
    # correctness on the fixture + a throughput record on a 30 s stream
    # (the documented ceiling — the bit-scan is gather-bound on TPU)
    try:
        from mp3stego_tpu.ops import huffman_device as hd
        pcm_dev, _ = hd.decode_pcm_device(data, 0)
        ok = pcm_dev.shape == base.shape and np.allclose(pcm_dev, base,
                                                         atol=1e-6)
        status = "PASS" if ok else "FAIL (mismatch vs host-parse path)"
        if ok:
            import jax.numpy as jnp
            with open("/tmp/bench_hide30.mp3", "rb") as f:
                d30 = f.read()
            t0 = time.time()
            p30 = dh.parse_mp3(d30, 0)
            t_host = time.time() - t0
            _, desc = dh.parse_mp3_light(d30, 0)
            pk = hd.pack_descriptors(desc)
            a30 = [jnp.asarray(pk[k]) for k in
                   ("words", "start_bit", "max_bit", "region0", "region1",
                    "big2", "ts", "c1sel")]

            def scan_once():
                o = hd.decode_samples_device(*a30)
                return int(np.asarray(jnp.sum(o)))   # fetch forces completion

            scan_once()
            t0 = time.time()
            scan_once()
            t_dev = time.time() - t0
            g30 = p30.num_frames * 2
            DETAIL["device huffman scan 30s"] = {
                "device_ms": round(t_dev * 1000, 1),
                "host_parse_ms": round(t_host * 1000, 1),
                "ratio": round(t_dev / max(t_host, 1e-6), 1),
                "us_per_granule": round(t_dev / g30 * 1e6, 1)}
            print(f"# device huffman scan 30s: {t_dev*1000:.0f} ms vs host "
                  f"parse {t_host*1000:.0f} ms "
                  f"({t_dev/max(t_host,1e-6):.1f}x)", file=sys.stderr)
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
    global DEVICE_OK
    DEVICE_OK = _device_available()
    if not DEVICE_OK:
        print("# device unreachable within 180s: host-only rows this run",
              file=sys.stderr)
    headline = bench_decode_fixture_batch()
    bench_link_duplex()
    bench_decode_corpus_device()
    bench_decode_long()
    bench_decode_mixed()
    bench_decode_streaming()
    bench_encode()
    bench_encode_corpus_device()
    bench_encode_streaming()
    bench_hide_roundtrip()
    bench_plane_utilization()
    bench_weak_scaling()
    check_tpu_kernels()

    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as f:
        json.dump(DETAIL, f, indent=1)
    print(json.dumps({
        "metric": "batched MP3 decode, honest end-to-end (files on disk -> "
                  "int16 PCM in host memory, auto-selected engine; device "
                  "path + compute-only + roofline in BENCH_DETAIL.json)",
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
