"""Tracing/profiling hooks - new work relative to the reference, which ships
only tqdm progress bars (SURVEY.md 5).

- trace(dir): context manager around jax.profiler for device traces
  (view in TensorBoard / xprof).
- annotate(name): TraceAnnotation for labelling harness phases.
- Timer: simple wall-clock accumulator for host-side phases, with a
  device-sync option so async dispatch doesn't hide TPU time.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Timer:
    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {self.totals[k]:.3f}s/{self.counts[k]}x"
            for k in sorted(self.totals))
