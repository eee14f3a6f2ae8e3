"""Lightweight tracing/timing layer.

The reference's only instrumentation is throttled tqdm bars
(reference: fom/base.py:744-750, rom/rom.py:468-474). On TPU the loops are
compiled scans, so instrumentation moves to the phase level: wall-clock
timers around pipeline stages plus optional JAX profiler traces for kernel-
level inspection.
"""

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    """Accumulating wall-clock timer for named pipeline phases.

    >>> timer = PhaseTimer()
    >>> with timer("offline/pod"):
    ...     ...
    >>> timer.summary()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self):
        return {
            name: dict(total_s=round(self.totals[name], 4),
                       calls=self.counts[name])
            for name in sorted(self.totals)
        }

    def report(self):
        lines = [
            f"{name:<40s} {info['total_s']:>10.3f}s x{info['calls']}"
            for name, info in self.summary().items()
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def jax_trace(log_dir):
    """JAX profiler trace around a block — the TPU-native analog of the
    reference's tqdm progress view; inspect with TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, repeats=1, **kwargs):
    """Wall-time a jitted callable with proper device synchronization."""
    import jax

    out = fn(*args, **kwargs)  # warm-up/compile
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats, out
