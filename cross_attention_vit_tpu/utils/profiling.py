"""Profiling & tracing utilities (SURVEY.md §5 tracing row).

The reference's tooling was forward-hook shape prints and wall-clock prints
(modify_model.py:7-55, other_model.py:255-312).  Here:

  * `profile_trace(logdir)`: context manager around jax.profiler — captures a
    real device trace (XLA op timeline, HBM usage) viewable in TensorBoard
    or Perfetto;
  * `StageTimer`: lightweight wall-clock stage timing with device sync, for
    the host-side pipeline (decode / H2D / step);
  * shape tracing lives in models.surgery (trace_shapes / inspect_model).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall time per named stage; `block=True` syncs the device
    so async dispatch doesn't hide compute in a later stage."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name:24s} {tot:8.3f}s total  {tot / n * 1000:8.1f} ms/call  ×{n}")
        return "\n".join(lines)
