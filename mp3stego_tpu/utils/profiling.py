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
