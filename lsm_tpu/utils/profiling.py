"""Step timing, observability and profiler hooks.

The reference's observability surface is the ``prehook``/``posthook`` callback
pair plus a ``@debug`` line per accepted step (SURVEY.md section 5); this module
provides the production versions:

- :class:`StepMonitor` — a posthook that records per-step wall time, dt, and any
  user-selected observables (volume, perimeter, band size, ...), with a compact
  report.
- :func:`trace` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace of the wrapped region.
- :func:`timed` — lightweight block timer with device synchronization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List, Optional

import jax

__all__ = ["StepMonitor", "trace", "timed"]


class StepMonitor:
    """Posthook recording per-step timing and observables.

    >>> mon = StepMonitor(observables={"volume": lambda eq: eq.volume()})
    >>> eq.integrate(1.0, posthook=mon)
    >>> mon.summary()
    """

    def __init__(self, observables: Optional[Dict[str, Callable]] = None, log_every: int = 0):
        self.observables = observables or {}
        self.log_every = log_every
        self.times: List[float] = []
        self.ts: List[float] = []
        self.records: Dict[str, List[float]] = {k: [] for k in self.observables}
        self._last = None

    def __call__(self, eq):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now
        self.ts.append(eq.current_time)
        for name, fn in self.observables.items():
            self.records[name].append(float(fn(eq)))
        if self.log_every and len(self.ts) % self.log_every == 0:
            obs = ", ".join(f"{k}={v[-1]:.6g}" for k, v in self.records.items())
            print(f"[step {len(self.ts)}] t={eq.current_time:.6g} {obs}")

    @property
    def nsteps(self) -> int:
        return len(self.ts)

    def summary(self) -> Dict[str, float]:
        out = {"steps": float(self.nsteps)}
        if self.times:
            out["mean_step_s"] = sum(self.times) / len(self.times)
            out["total_s"] = sum(self.times)
        for k, v in self.records.items():
            if v:
                out[f"{k}_final"] = v[-1]
        return out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/lsm_tpu_trace"):
    """Profile the wrapped region with ``jax.profiler`` (view in TensorBoard or
    xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str = "block", sync: bool = True, out: Optional[dict] = None):
    """Wall-time a block, synchronizing outstanding device work at exit."""
    t0 = time.perf_counter()
    yield
    if sync:
        try:
            jax.effects_barrier()
        except Exception:
            pass
    elapsed = time.perf_counter() - t0
    if out is not None:
        out[label] = elapsed
    else:
        print(f"[{label}] {elapsed * 1e3:.2f} ms")
