"""Wall-clock timing harness.

Parity with the reference's `measureDuration(fn, N)` repeat-averaged milliseconds
(`/root/reference/inc/_utility.hxx:113-119`), adapted to an async accelerator:
results are synced before the clock stops, and an optional warmup call excludes XLA
compilation (the reference's g++ compiles ahead of time, so timed regions never
include compilation).

Sync discipline: `jax.block_until_ready` alone is NOT trusted — on relay/remote
PJRT backends it can return before device execution completes (measured: a 20 s
program "blocking" in 0.3 ms).  `_sync` additionally fetches one element per array
leaf, which forces the producing computation to finish while transferring only a
few bytes (a full `device_get` would bottleneck on the relay link instead).
"""
from __future__ import annotations

import time
from typing import Callable, Tuple, TypeVar

import jax

T = TypeVar("T")

__all__ = ["measure_duration", "measure_duration_marked", "sync"]


def sync(result: T) -> T:
    """Force completion of ``result`` (see module docstring).

    Fetches one element of the first array leaf of each TOP-LEVEL tuple/list
    entry: all outputs of one executable materialize together, so one fetch per
    entry syncs one program each while costing a single small round-trip (a
    per-leaf fetch would multiply relay RTTs).  Callers running several
    executables return their results as a tuple so every program is forced.
    """
    result = jax.block_until_ready(result)
    parts = result if isinstance(result, (tuple, list)) else (result,)
    for part in parts:
        for leaf in jax.tree.leaves(part):
            if isinstance(leaf, jax.Array) and leaf.size:
                jax.device_get(leaf.ravel()[0])
                break
    return result


def measure_duration(fn: Callable[[], T], repeat: int = 1, warmup: bool = True) -> Tuple[float, T]:
    """Run ``fn`` ``repeat`` times; return (average milliseconds, last result).

    The sync happens ONCE after the loop: dispatches queue sequentially on the
    device, so the final fetch bounds all ``repeat`` executions while paying the
    relay round-trip (~30 ms here) once instead of per repeat — the reference's
    CPU loop is synchronous and has no such cost (`_utility.hxx:113-119`).
    """
    result = None
    if warmup:
        result = sync(fn())
    t0 = time.perf_counter()
    for _ in range(max(repeat, 1)):
        result = fn()
    result = sync(result)  # device programs run in dispatch order; the last
    t1 = time.perf_counter()  # completing bounds them all
    return (t1 - t0) * 1e3 / max(repeat, 1), result


def measure_duration_marked(fn: Callable[[Callable], T], repeat: int = 1) -> Tuple[float, T]:
    """Time only sub-sections that ``fn`` wraps in the provided ``mark`` callable
    (reference ``measureDurationMarked``, `_utility.hxx:155-164`)."""
    acc = 0.0
    result = None
    for _ in range(max(repeat, 1)):
        def mark(f):
            nonlocal acc
            t0 = time.perf_counter()
            r = sync(f())
            acc += time.perf_counter() - t0
            return r
        result = fn(mark)
    return acc * 1e3 / max(repeat, 1), result
