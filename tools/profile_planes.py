#!/usr/bin/env python
"""Per-stage MFU / utilization profile of the two device planes (VERDICT r4
item 1): what share of device time each pipeline stage takes, which lowered
ops dominate it, the achieved FLOP/s and bandwidth, the % of chip peak, and
how many of the executed FLOPs are one-hot-expansion overhead versus the
FLOPs a hand-written kernel would need.

Method: the corpus-scale decode and encode programs (the same shapes as
bench.py's "plane corpus (on-chip, resident inputs)" rows) run under a
``jax.profiler`` trace; the device timeline's per-op records (duration,
XLA model_flops, bytes_accessed, hlo_category, and the ``jax.named_scope``
path in tf_op metadata) are aggregated per stage by
utils/profiling.parse_device_trace / stage_utilization. Caveat: XLA fuses
across scope boundaries; a fusion carries one representative op's scope, so
attribution is at fusion granularity.

"Useful" FLOPs per stage are analytic estimates of the work a minimal
hand-written kernel would do (formulas inline below, per granule/lane); the
executed/useful ratio quantifies the cost of the gather-avoidance strategy
(TPU data-dependent gathers lower to ~10 ns/element scalar loads, so the
planes trade inflated MXU FLOPs for wall-clock — this table records how much).

Peaks used for %: TPU v5e ≈ 197 TFLOP/s bf16 MXU, 819 GB/s HBM. The planes'
exact one-hot matmuls run HIGHEST precision (f32 emulated by ~6 bf16 MXU
passes), so their *attainable* matmul peak is ≈ 197/6 ≈ 33 TFLOP/s of logical
(model_flops) throughput; both percentages are recorded.

Run standalone (writes PROFILE_PLANES.json at the repo root and prints the
tables) or through bench.py, which records the summaries in BENCH_DETAIL.
Reference hot loops being profiled: decoder/Frame.py:65-218 and
encoder/MP3_Encoder.py:958-996 of the reference.
"""

import functools
import json
import os
import shutil
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PEAK_BF16_TFLOPS = 197.0      # v5e MXU peak, bf16
PEAK_F32HI_TFLOPS = PEAK_BF16_TFLOPS / 6.0   # HIGHEST-precision f32 emulation
PEAK_HBM_GBPS = 819.0

DECODE_STAGES = ["requantize", "stereo", "reorder_alias", "imdct",
                 "overlap_freqinv", "synth_v", "synth_fir"]
ENCODE_STAGES = ["an_window", "an_filter", "an_mdct", "an_alias",
                 "quant_scale", "quant_rank", "quant_float",
                 "cost_runlen", "cost_count1", "cost_subdivide",
                 "cost_pair", "cost_regions", "cost_select", "cost_hide"]

# Useful FLOPs a minimal kernel needs, PER STEREO GRANULE (decode; 2ch x 576
# samples) and PER LANE (encode; one ch-granule, x9 search evaluations where
# the stage runs once per evaluation). Estimates, documented per stage:
USEFUL_DECODE = {
    # sign*pow43[|x|]*2^(q/4): q per sample (3 int ops) + scale + mul ~ 5/sample
    "requantize": 2 * 576 * 5,
    # MS butterfly: 2 flops per output sample
    "stereo": 2 * 576 * 2,
    # 31 bands x 8 butterflies x (4 mul + 2 add), x2 ch; reorder is a copy
    "reorder_alias": 2 * 31 * 8 * 6,
    # 32 bands x (36x18 matmul) + windowing, x2 ch — already a dense matmul
    "imdct": 2 * (32 * 2 * 36 * 18 + 32 * 36),
    "overlap_freqinv": 2 * (576 + 576),
    # 18 steps x (64x32 matmul), x2 ch
    "synth_v": 2 * 18 * 2 * 64 * 32,
    # 18 steps x 32 outputs x 16 taps x 2, x2 ch
    "synth_fir": 2 * 18 * 32 * 16 * 2,
}
EVALS = 9   # 8 bisection rounds + 1 inner-loop round (measured convergence)
USEFUL_ENCODE = {
    # 18 steps x 64 x 8 Q31 mul+add
    "an_window": 18 * 64 * 8 * 2,
    "an_filter": 18 * 32 * 64 * 2,
    "an_mdct": 32 * 2 * 18 * 36,
    "an_alias": 31 * 8 * 6,
    # per evaluation: ln = (|x|*scale)>>32 per sample
    "quant_scale": EVALS * 576 * 2,
    # int2idx[ln]: one load per sample in a hand kernel
    "quant_rank": EVALS * 576 * 1,
    "quant_float": EVALS * 8,           # rare escape samples only
    "cost_runlen": EVALS * 576 * 2,
    "cost_count1": EVALS * 144 * 8,
    "cost_subdivide": EVALS * 46,
    # h_len[x,y] load + add for 4 candidate tables per pair
    "cost_pair": EVALS * 288 * 8,
    "cost_regions": EVALS * 3 * 288 * 2,
    "cost_select": EVALS * 3 * 12,
    "cost_hide": 0,                      # not exercised in the clear search
}
# the full program's trace shows the whole search as one opaque loop row;
# its useful work is the sum of the per-evaluation stages
USEFUL_ENCODE["search_loop"] = sum(
    v for k, v in USEFUL_ENCODE.items()
    if k.startswith("quant") or k.startswith("cost"))


def _trace_stage_table(fn, args, stages, dispatches=3, rolled_stage=None):
    """Run ``fn(args)`` under a profiler trace and aggregate the device ops
    per stage. Also times the same dispatches WITHOUT the trace (tracing can
    slow the tunneled device); returns (stage table, untraced seconds per
    dispatch, module runs)."""
    import time

    import jax

    from mp3stego_tpu.utils import profiling as prof

    out = fn(args)
    np.asarray(out.reshape(-1)[0])          # warm + sync
    t0 = time.time()
    for _ in range(dispatches):
        out = fn(args)
    np.asarray(out.reshape(-1)[0])          # 2-byte sync fetch
    untraced_s = (time.time() - t0) / dispatches
    tmp = tempfile.mkdtemp(prefix="mp3stego_prof_")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(dispatches):
                out = fn(args)
            np.asarray(out.reshape(-1)[0])  # 2-byte sync fetch
        tr = prof.parse_device_trace(tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    table = prof.stage_utilization(tr["ops"], stages, runs=dispatches,
                                   rolled_stage=rolled_stage)
    return table, untraced_s, tr["module_runs"]


def _finish(table, useful, work_units, unit_name):
    """Attach %-of-peak, useful-FLOP and binding-resource columns."""
    out = {}
    tot_ms = sum(s["ms"] for s in table.values())
    for name, s in table.items():
        u = useful.get(name, 0) * work_units / 1e9   # GFLOP per dispatch
        pct_mxu = 100.0 * s["tflops_s"] / PEAK_BF16_TFLOPS
        pct_mxu_f32 = 100.0 * s["tflops_s"] / PEAK_F32HI_TFLOPS
        pct_hbm = 100.0 * s["gb_s"] / PEAK_HBM_GBPS
        binding = "HBM" if pct_hbm >= pct_mxu_f32 else "MXU"
        out[name] = dict(
            ms=s["ms"], share=s["share"], dominant=s["dominant"],
            exec_gflops=s["gflops"],
            useful_gflops=round(u, 3),
            overhead_x=round(s["gflops"] / u, 1) if u > 0 else None,
            tflops_s=s["tflops_s"], gb_s=s["gb_s"],
            pct_peak_bf16=round(pct_mxu, 2),
            pct_peak_f32hi=round(pct_mxu_f32, 2),
            pct_hbm=round(pct_hbm, 2),
            binding=binding,
        )
    summary = dict(
        total_device_ms=round(tot_ms, 2),
        work_units=work_units, unit=unit_name,
        exec_gflops=round(sum(s["exec_gflops"] for s in out.values()), 2),
        useful_gflops=round(sum(s["useful_gflops"] for s in out.values()), 2),
        achieved_tflops_s=round(
            sum(s["exec_gflops"] for s in out.values()) / max(tot_ms, 1e-9),
            2),
        useful_tflops_s=round(
            sum(s["useful_gflops"] for s in out.values()) / max(tot_ms, 1e-9),
            3),
    )
    summary["mfu_pct_bf16"] = round(
        100.0 * summary["achieved_tflops_s"] / PEAK_BF16_TFLOPS, 2)
    summary["useful_mfu_pct_bf16"] = round(
        100.0 * summary["useful_tflops_s"] / PEAK_BF16_TFLOPS, 3)
    return {"stages": out, "summary": summary}


def _synth_corpus_files(n_files, seconds=120.0):
    """The bench corpus fixtures (synth WAV -> 320 kbps MP3), cached in /tmp."""
    sys.path.insert(0, REPO)
    import bench
    out = []
    for i in range(n_files):
        wav = bench._synth_wav(f"/tmp/bench_corpus{i}.wav", seconds, 44100,
                               100 + i)
        out.append(bench._mp3_of(wav, f"/tmp/bench_corpus{i}.mp3", 320))
    return out


def profile_decode_plane(n_files=4, dispatches=3):
    """Utilization table of the corpus-scale decode plane (requantize ->
    stereo -> reorder/alias -> IMDCT -> synthesis), resident inputs."""
    import jax

    from mp3stego_tpu.bitstream import decoder_host as dh
    from mp3stego_tpu.ops import decode_plane as dp
    from mp3stego_tpu.parallel.batch_decode import (_decode_batch_concat,
                                                    prepare_batch_concat)

    preps = []
    g_total = 0
    for mp3 in _synth_corpus_files(n_files):
        with open(mp3, "rb") as f:
            parsed = dh.parse_mp3(f.read(), 0)
        preps.append(dp.host_prepare(parsed))
        g_total += parsed.num_frames * 2
    batch = prepare_batch_concat(preps)
    args = {k: jax.device_put(batch[k]) for k in dp.ALL_KEYS}

    def full(a):
        return _decode_batch_concat(a, num_files=batch["num_files"],
                                    dtype_name="float32")

    table, untraced_s, runs = _trace_stage_table(full, args, DECODE_STAGES,
                                                 dispatches)
    rec = _finish(table, USEFUL_DECODE, g_total, "stereo granules")
    rec["summary"]["granules_per_dispatch"] = g_total
    rec["summary"]["untraced_ms"] = round(untraced_s * 1e3, 2)
    rec["summary"]["untraced_gps"] = round(g_total / untraced_s)
    return rec


def profile_encode_plane(n_files=2, dispatches=3):
    """Utilization table of the corpus-scale encode plane (Q31 analysis+MDCT
    + the full 9-evaluation rate search), resident inputs. Stage FLOPs are
    summed over all evaluations of the bisection+inner loop."""
    import jax

    from mp3stego_tpu.models.encoder import MP3Encoder
    from mp3stego_tpu.ops import quant as Q
    from mp3stego_tpu.ops import search_plane as SP
    from mp3stego_tpu.ops.encode_plane import _PAST, analysis_mdct_i16
    from mp3stego_tpu.utils.wav import read_wav

    import bench
    wav = bench._synth_wav("/tmp/bench_enc_corpus.wav", 120.0, 44100, 7)
    enc = MP3Encoder(read_wav(wav, 320))
    nf = enc._num_frames()
    gpf = enc.granules_per_frame
    tg = nf * gpf
    tg_max = -(-tg // 256) * 256
    nch, F = 2, n_files
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
    def full(a, sr=sr_idx):
        p, mb = a
        xr = jax.vmap(analysis_mdct_i16)(p).reshape(F, nch * tg_max, 576)
        fin, *_ = jax.vmap(
            lambda x, b: SP._search_body_packed(x, b, sr))(xr, mb)
        return fin

    # the bisection+inner search runs inside fori/while loops, whose body
    # ops carry no scope metadata in the trace — the full program therefore
    # shows the analysis stages + one opaque "search_loop" row
    table, untraced_s, runs = _trace_stage_table(
        full, (pcm_dev, mb_dev), ENCODE_STAGES, dispatches,
        rolled_stage="search_loop")
    lanes = F * nch * tg
    rec = _finish(table, USEFUL_ENCODE, lanes, "lane-searches")
    rec["summary"]["lanes_per_dispatch"] = lanes
    rec["summary"]["untraced_ms"] = round(untraced_s * 1e3, 2)
    rec["summary"]["untraced_lanes_ps"] = round(lanes / untraced_s)
    rec["per_eval"] = _profile_one_eval(pcm_dev, mb_dev, F, nch, tg_max,
                                        lanes, sr_idx, dispatches)
    return rec


def _profile_one_eval(pcm_dev, mb_dev, F, nch, tg_max, lanes, sr_idx,
                      dispatches):
    """The per-evaluation on-chip split the opaque search loop hides: ONE
    search evaluation (quantize -> run-length -> count1 -> subdivide ->
    pair-cost -> select), unrolled outside any device loop so every stage's
    scope survives into the trace. The real search runs ~9 of these
    (8 bisection rounds + 1 inner round, measured convergence) in lockstep;
    the per-lane preamble (abs/max) runs once per search. Spectra come in
    PRE-COMPUTED so analysis doesn't pollute the eval's "other" row."""
    import jax
    import jax.numpy as jnp

    from mp3stego_tpu import tables as T
    from mp3stego_tpu.ops import search_plane as SP
    from mp3stego_tpu.ops.encode_plane import analysis_mdct_i16

    band = T.BAND_ALL[sr_idx].astype(np.int32)
    xr_res = jax.device_put(np.asarray(
        jax.jit(jax.vmap(analysis_mdct_i16))(pcm_dev)).reshape(-1, 576))

    @jax.jit
    def one_eval(xr):
        c = SP._sconsts()
        with jax.named_scope("search_prep"):
            labs64 = jnp.abs(xr.astype(jnp.int64))
            xrabs32 = jnp.abs(xr)
            xrabs_f32 = xrabs32.astype(jnp.float32)
            xrmax64 = jnp.max(jnp.maximum(xrabs32, 0),
                              axis=1).astype(jnp.int64)
            s = jnp.full(xr.shape[0], -60, jnp.int32)  # round-1 step
        ix, ixmax_eff, approx, oob = SP._quantize(labs64, xrabs_f32,
                                                  xrmax64, s, c)
        co = SP._cost(ix, jnp.zeros((xr.shape[0], 3), jnp.int32), band, c,
                      None)
        return (co["bits"] + ixmax_eff + approx + oob
                + co["a1"] + co["cts"] + co["r0c"])

    stages = ["search_prep"] + [s for s in ENCODE_STAGES
                                if not s.startswith("an_")]
    table, untraced_s, _ = _trace_stage_table(one_eval, xr_res, stages,
                                              dispatches)
    per_eval = {}
    tot_us = sum(v["ms"] for v in table.values())
    for k, v in table.items():
        per_eval[k] = dict(ms=v["ms"], share=round(v["ms"] / tot_us, 3),
                           tflops_s=v["tflops_s"], gb_s=v["gb_s"],
                           dominant=v["dominant"])
    return {"stages": per_eval,
            "eval_ms": round(tot_us, 2),
            "evals_per_search": EVALS,
            "us_per_lane_eval": round(tot_us * 1e3 / lanes, 3)}


def fmt_table(rec, title):
    lines = [f"== {title} ==",
             f"{'stage':<16}{'ms':>8}{'share':>7}{'exec GF':>9}"
             f"{'useful':>8}{'ovh x':>7}{'TF/s':>7}{'GB/s':>7}"
             f"{'%bf16':>7}{'%HBM':>6}  binding/dominant"]
    for name, s in rec["stages"].items():
        lines.append(
            f"{name:<16}{s['ms']:>8.2f}{s['share']:>7.1%}"
            f"{s['exec_gflops']:>9.2f}{s['useful_gflops']:>8.2f}"
            f"{(s['overhead_x'] or 0):>7.1f}{s['tflops_s']:>7.2f}"
            f"{s['gb_s']:>7.1f}{s['pct_peak_bf16']:>7.2f}"
            f"{s['pct_hbm']:>6.1f}  {s['binding']}/{s['dominant']}")
    su = rec["summary"]
    lines.append(
        f"total {su['total_device_ms']:.1f} ms/dispatch over "
        f"{su['work_units']} {su['unit']}; executed {su['exec_gflops']} GF "
        f"({su['achieved_tflops_s']} TF/s = {su['mfu_pct_bf16']}% of bf16 "
        f"peak); useful {su['useful_gflops']} GF "
        f"({su['useful_tflops_s']} TF/s = {su['useful_mfu_pct_bf16']}% "
        f"useful-MFU)")
    if "per_eval" in rec:
        pe = rec["per_eval"]
        lines.append(f"-- one search evaluation, unrolled "
                     f"({pe['eval_ms']:.2f} ms; x{pe['evals_per_search']} "
                     f"evaluations per search) --")
        for name, s in pe["stages"].items():
            lines.append(f"{name:<16}{s['ms']:>8.2f}{s['share']:>7.1%}"
                         f"{'':>9}{'':>8}{'':>7}{s['tflops_s']:>7.2f}"
                         f"{s['gb_s']:>7.1f}{'':>7}{'':>6}  {s['dominant']}")
    return "\n".join(lines)


def main():
    rec = {
        "decode": profile_decode_plane(),
        "encode": profile_encode_plane(),
        "peaks": {"bf16_tflops": PEAK_BF16_TFLOPS,
                  "f32_highest_tflops": round(PEAK_F32HI_TFLOPS, 1),
                  "hbm_gbps": PEAK_HBM_GBPS},
    }
    print(fmt_table(rec["decode"], "decode plane (corpus, resident)"))
    print()
    print(fmt_table(rec["encode"], "encode plane (corpus, resident)"))
    with open(os.path.join(REPO, "PROFILE_PLANES.json"), "w") as f:
        json.dump(rec, f, indent=1)
    print(f"\nwritten: {os.path.join(REPO, 'PROFILE_PLANES.json')}")


if __name__ == "__main__":
    main()
