"""Step-phase wall-clock profiling (src/util/profile/).

The reference brackets every step-loop phase with TIC/TOC around a fixed
timer enum (profile.h:11-63) and prints interval + cumulative tables at
status_interval.  Under jit the whole step fuses into one XLA program, so
two modes are provided:

* ``Profile``: host-side named timers (TIC/TOC) for coarse phases (step,
  diagnostics, dumps, checkpoint) -- the table printer is format-compatible
  with update_profile's output.
* ``trace``: a jax.profiler wrapper producing an XLA trace for per-kernel
  analysis (the modern equivalent of the fixed timer table for device code).
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class Profile:
    def __init__(self):
        self._interval = OrderedDict()
        self._total = OrderedDict()
        self._counts = OrderedDict()

    @contextlib.contextmanager
    def tic(self, name: str, n: int = 1):
        """TIC {...} TOC(name, n) (profile.h:52-63)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._interval[name] = self._interval.get(name, 0.0) + dt
            self._total[name] = self._total.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + n

    def update_profile(self, dump: bool = True) -> str:
        """Print the interval + cumulative table and reset the interval
        counters (update_profile analogue)."""
        lines = [f"{'phase':<28} {'interval(s)':>12} {'total(s)':>12} "
                 f"{'count':>8}"]
        for name, tot in self._total.items():
            lines.append(f"{name:<28} {self._interval.get(name, 0.0):12.4f} "
                         f"{tot:12.4f} {self._counts[name]:8d}")
        self._interval.clear()
        table = "\n".join(lines)
        if dump:
            print(table)
        return table


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace wrapper: `with profile.trace('/tmp/trace'): ...`"""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
