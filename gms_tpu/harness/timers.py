"""Wall-clock + phase timing + device profiling hooks.

Role of the reference's Timer (gms/third_party/gapbs/timer.h:18-44),
DetailTimer (gms/common/detail_timer.h:13-35) and PAPIW
(gms/common/papi/papiw.h:45-100): phase timing and hardware counters.
The TPU equivalent of PAPI counters is a `jax.profiler` trace
(ProfileScope), which records device kernel timelines viewable in
TensorBoard/XProf, plus derived bytes/s against the HBM roofline.

Timing device work requires block_until_ready at phase boundaries — the
helpers here do that when handed JAX arrays.
"""

from __future__ import annotations

import contextlib
import time


def _sync(value):
    try:
        import jax

        jax.block_until_ready(value)
    except Exception:
        pass
    return value


class Timer:
    """start/stop wall-clock timer (gapbs/timer.h:18-44 role)."""

    def __init__(self):
        self._t0 = 0.0
        self.seconds = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None):
        if sync_on is not None:
            _sync(sync_on)
        self.seconds = time.perf_counter() - self._t0
        return self.seconds


class DetailTimer:
    """Named-phase timer (common/detail_timer.h:13-35 role): accumulates
    (name, seconds) pairs; print() emits reference-style labeled lines."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.phases: list[tuple[str, float]] = []
        self._t0 = time.perf_counter()

    def phase(self, name: str, sync_on=None):
        if sync_on is not None:
            _sync(sync_on)
        now = time.perf_counter()
        if self.enabled:
            self.phases.append((name, now - self._t0))
        self._t0 = now

    def print(self, out=None):
        import sys

        out = out or sys.stdout
        for name, secs in self.phases:
            print(f"{name + ':':21s}{secs:3.5f}", file=out)


@contextlib.contextmanager
def ProfileScope(logdir: str | None = None):
    """Device profiler trace (PAPIW START/STOP equivalent).

    with ProfileScope("/tmp/trace"): run_kernels()
    Produces an XProf trace; no-op when logdir is None.
    """
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, sync_on=None, out=None):
    """Context manager printing `label: seconds` (PrintTime role,
    gapbs/util.h:31-33)."""
    import sys

    t0 = time.perf_counter()
    yield
    if sync_on is not None:
        _sync(sync_on)
    print(f"{label + ':':21s}{time.perf_counter() - t0:3.5f}",
          file=out or sys.stdout)
