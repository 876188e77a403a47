"""Scoped wall-clock timer (samgraph/common/timer.h analog)."""
from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()

    def passed(self) -> float:
        """Seconds since construction / last reset (Timer::Passed)."""
        return time.perf_counter() - self._start

    def passed_micro(self) -> float:
        return self.passed() * 1e6

    @staticmethod
    def now_us() -> float:
        """Monotonic microseconds (TimePointMicro analog)."""
        return time.perf_counter() * 1e6


def force_done(x) -> None:
    """Block until the computation producing ``x`` completes.

    Fetches a single element of the first leaf instead of
    ``block_until_ready`` — remote-device tunnels (axon) don't implement
    ready-event propagation, but a one-element device_get of a value that
    depends on the program forces completion everywhere, and costs ~nothing.
    Used by profile_level>=2 stage timing (the per-stage analog of the
    reference's per-op cuda-event syncs, cuda_loops.cc:238-264).
    """
    import jax
    import numpy as np

    leaves = jax.tree.leaves(x)
    if not leaves:
        return
    leaf = leaves[0]
    idx = tuple(0 for _ in range(getattr(leaf, "ndim", 0)))
    np.asarray(leaf[idx] if idx else leaf)
