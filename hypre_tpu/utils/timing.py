"""Named-timer registry + profiler scopes.

Mirrors the reference's two host-side mechanisms (SURVEY §5): the
HYPRE_TIMING named-timer registry (utilities/timing.h:102-108) and the
HYPRE_PROFILE phase accumulators keyed by a fixed phase taxonomy
(seq_mv/HYPRE_seq_mv.h:81-120).  Device-side, phases map to
jax.profiler.TraceAnnotation so XLA traces carry the same names.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

# The reference's HYPRE_TimerID phase taxonomy.
PHASES = (
    "MATVEC",
    "BLAS1",
    "RELAX",
    "PACK_UNPACK",
    "HALO_EXCHANGE",
    "ALL_REDUCE",
    "STRENGTH",
    "COARSEN",
    "INTERP",
    "RAP",
    "SETUP",
    "SOLVE",
)


class Timer:
    """Accumulating wall-clock registry: begin/end by name, print summary."""

    def __init__(self):
        self._acc: dict[str, float] = defaultdict(float)
        self._count: dict[str, int] = defaultdict(int)
        self._start: dict[str, float] = {}

    def begin(self, name: str) -> None:
        self._start[name] = time.perf_counter()

    def end(self, name: str) -> None:
        t0 = self._start.pop(name, None)
        if t0 is not None:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    @contextlib.contextmanager
    def scope(self, name: str):
        self.begin(name)
        try:
            yield
        finally:
            self.end(name)

    def accumulated(self) -> dict[str, float]:
        """Public snapshot of the accumulated wall seconds per scope.

        Scopes NEST (e.g. TRANSFER contains XFER_PUT/XFER_GROUPS), so a
        consumer must not sum sibling keys blindly — see bench.py's
        child-scope filter.
        """
        return dict(self._acc)

    def summary(self) -> str:
        lines = ["=" * 50, f"{'phase':<24}{'wall (s)':>12}{'calls':>8}", "-" * 50]
        for name, acc in sorted(self._acc.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:<24}{acc:>12.4f}{self._count[name]:>8}")
        lines.append("=" * 50)
        return "\n".join(lines)

    def clear(self) -> None:
        self._acc.clear()
        self._count.clear()
        self._start.clear()


GLOBAL_TIMER = Timer()


@contextlib.contextmanager
def timed(name: str, timer: Timer | None = None):
    t = timer or GLOBAL_TIMER
    with t.scope(name):
        yield


def named_scope(name: str):
    """Device-trace annotation carrying the hypre phase taxonomy."""
    return jax.named_scope(name)
