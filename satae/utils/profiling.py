"""Profiling + debugging hooks (SURVEY.md §5 tracing/profiling).

The reference has no profiling at all (tqdm imported, never used,
Report.md:152). Here:
  * ``trace(dir)`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace of the device timeline.
  * ``Stopwatch`` — wall-clock stage timer with a report dict.
  * ``debug_mode()`` — enables NaN checks (jax_debug_nans) for triage runs;
    the train step itself stays side-effect free.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    import jax

    prev = jax.config.jax_debug_nans  # .read() rejects ctx-manager flags
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class Stopwatch:
    """Named stage timer: with sw.stage('train'): ... ; sw.report()"""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + \
                time.perf_counter() - t0

    def report(self) -> Dict[str, float]:
        return {k: round(v, 3) for k, v in self.times.items()}
