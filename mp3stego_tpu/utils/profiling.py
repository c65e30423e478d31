"""Tracing / profiling utilities.

The reference's only instrumentation is a wall-clock print of the parse loop
(decoder/decoder.py:76-80) and tqdm progress bars (MP3_Parser.py:67,
MP3_Encoder.py:607). The TPU-native equivalents here:

* ``StageTimer`` — per-stage wall-clock accounting for the codec pipelines
  (host parse, host prepare, device dispatch, device fetch, serialization),
  printed when ``quiet=False`` or collected programmatically.
* ``trace()`` — context manager around ``jax.profiler.trace``: dumps a
  TensorBoard/perfetto trace of the device work under a directory
  (set MP3STEGO_TPU_TRACE=<dir> to trace any pipeline without code changes).
* ``progress()`` — tqdm iterator when available/enabled, plain iterator
  otherwise.
"""

import contextlib
import os
import time
from collections import OrderedDict


class StageTimer:
    """Accumulates wall-clock per named stage.

    >>> t = StageTimer()
    >>> with t.stage("host_parse"):
    ...     pass
    >>> _ = t.report()
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times = OrderedDict()
        self.counts = OrderedDict()

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{'stage':<24}{'time':>10}  {'calls':>6}  {'share':>6}"]
        for name, t in self.times.items():
            share = (t / total * 100.0) if total else 0.0
            lines.append(f"{name:<24}{t * 1e3:>8.1f}ms  {self.counts[name]:>6}"
                         f"  {share:>5.1f}%")
        lines.append(f"{'total':<24}{total * 1e3:>8.1f}ms")
        return "\n".join(lines)

    def print_report(self):
        print(self.report())


@contextlib.contextmanager
def trace(log_dir: str = None):
    """Wrap a block in a JAX profiler trace (TensorBoard / perfetto viewable).
    No-op when no directory is given and MP3STEGO_TPU_TRACE is unset."""
    log_dir = log_dir or os.environ.get("MP3STEGO_TPU_TRACE")
    if not log_dir:
        yield
        return
    import jax
    with jax.profiler.trace(log_dir):
        yield


def parse_device_trace(log_dir: str) -> dict:
    """Parse the newest ``jax.profiler`` trace under ``log_dir`` into per-op
    records from the DEVICE timeline.

    Returns ``{"ops": [...], "module_runs": {name: count}}`` where each op
    record carries ``name`` (HLO op), ``scope`` (the ``jax.named_scope`` path
    segments from the op's ``tf_op`` metadata), ``dur_us`` (device time),
    ``flops`` (XLA's model_flops — logical FLOPs of the lowered op, 2MNK for
    dots regardless of precision passes), ``bytes`` (bytes_accessed) and
    ``category`` (hlo_category). ``module_runs`` counts executions of each
    jitted module inside the trace window, so callers can normalize per-op
    sums to per-dispatch numbers.
    """
    import glob
    import gzip
    import json

    dirs = sorted(glob.glob(os.path.join(log_dir, "plugins", "profile", "*")))
    if not dirs:
        raise FileNotFoundError(f"no profile under {log_dir}")
    files = glob.glob(os.path.join(dirs[-1], "*.trace.json.gz"))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {dirs[-1]}")
    with gzip.open(files[0]) as f:
        d = json.load(f)
    events = d.get("traceEvents", [])
    dev_pids = set()
    tnames = {}
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if (ev.get("name") == "process_name"
                and "/device:" in ev["args"].get("name", "")):
            dev_pids.add(ev["pid"])
        if ev.get("name") == "thread_name":
            tnames[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    ops = []
    module_runs = {}
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        tn = tnames.get((ev["pid"], ev["tid"]), "")
        args = ev.get("args", {})
        if tn == "XLA Modules":
            base = ev["name"].split("(")[0]
            module_runs[base] = module_runs.get(base, 0) + 1
            continue
        if tn != "XLA Ops":
            continue
        tf_op = args.get("tf_op", "")
        # 'jit(f)/vmap(scope_a)/.../op_name:' -> ['scope_a', ...]; transform
        # wrappers (vmap/jit/scan/...) around a path component are stripped
        # so named_scope labels survive batching
        parts = [_unwrap(p) for p in tf_op.rstrip(":").split("/") if p]
        scope = parts[1:-1] if len(parts) > 2 else []
        ops.append(dict(
            name=ev["name"],
            scope=scope,
            dur_us=float(ev.get("dur", 0.0)),
            flops=int(args.get("model_flops", 0) or 0),
            bytes=int(args.get("bytes_accessed", 0) or 0),
            category=args.get("hlo_category", ""),
        ))
    return {"ops": ops, "module_runs": module_runs}


def _unwrap(part: str) -> str:
    """'vmap(requantize)' / 'jit(clip)' -> 'requantize' / 'clip'."""
    while "(" in part and part.endswith(")"):
        part = part[part.index("(") + 1:-1]
    return part


# hlo categories of ops XLA's loop-rolling pass emits with no tf_op metadata
# (a re-rolled unrolled loop, e.g. the synthesis FIR's 16 taps): callers that
# know their program's only rolled loop can claim these via ``rolled_stage``
ROLLED_CATEGORIES = ("while", "dynamic-update-slice", "dynamic-slice",
                     "loop fusion")


def stage_utilization(ops: list, stage_names: list, runs: int = 1,
                      rolled_stage: str = None) -> dict:
    """Aggregate device-op records per pipeline stage.

    ``stage_names`` are the ``jax.named_scope`` labels; an op whose scope
    path contains one of them is attributed to the FIRST match (fusions that
    span scope boundaries carry one representative op's scope — attribution
    at fusion granularity). Everything else lands in ``"other"``. Returns
    per-stage: device ms per dispatch, time share, executed GFLOPs per
    dispatch (XLA model_flops), bytes per dispatch, achieved TFLOP/s and
    GB/s, and the dominant (by time) lowered-op category.
    """
    agg = {}
    for op in ops:
        stage = "other"
        for s in op["scope"]:
            if s in stage_names:
                stage = s
                break
        if (stage == "other" and rolled_stage and not op["scope"]
                and op["category"] in ROLLED_CATEGORIES):
            stage = rolled_stage
        a = agg.setdefault(stage, dict(us=0.0, flops=0, bytes=0, cats={}))
        a["us"] += op["dur_us"]
        a["flops"] += op["flops"]
        a["bytes"] += op["bytes"]
        a["cats"][op["category"]] = (a["cats"].get(op["category"], 0.0)
                                     + op["dur_us"])
    total_us = sum(a["us"] for a in agg.values()) or 1e-9
    out = {}
    for stage, a in sorted(agg.items(), key=lambda kv: -kv[1]["us"]):
        s = a["us"] / 1e6 / max(runs, 1)
        out[stage] = dict(
            ms=round(a["us"] / 1e3 / max(runs, 1), 3),
            share=round(a["us"] / total_us, 3),
            gflops=round(a["flops"] / 1e9 / max(runs, 1), 3),
            gbytes=round(a["bytes"] / 1e9 / max(runs, 1), 4),
            tflops_s=round(a["flops"] / max(runs, 1) / max(s, 1e-12) / 1e12,
                           2),
            gb_s=round(a["bytes"] / max(runs, 1) / max(s, 1e-12) / 1e9, 1),
            dominant=max(a["cats"], key=a["cats"].get) if a["cats"] else "",
        )
    return out


def progress(iterable, desc: str = "", enabled: bool = True):
    """tqdm-wrapped iterable (the reference's progress observability,
    MP3_Encoder.py:607), degrading to the plain iterable."""
    if not enabled:
        return iterable
    try:
        from tqdm import tqdm
        return tqdm(iterable, desc=desc)
    except Exception:
        return iterable


class _NullBar:
    def update(self, n=0):
        pass

    def close(self):
        pass


def byte_bar(total: int, enabled: bool = True, desc: str = "decoding"):
    """Byte-progress bar (the reference's per-byte decode tqdm,
    MP3_Parser.py:67); a no-op object when disabled or tqdm is missing."""
    if not enabled:
        return _NullBar()
    try:
        from tqdm import tqdm
    except ImportError:
        return _NullBar()
    return tqdm(total=total, unit="B", unit_scale=True, desc=desc)
