"""Sorted-sequence set operations.

Reference parity (`/root/reference/inc/_algorithm.hxx`): ``set_union_last_inplace``
(:177-232), ``set_difference_inplace`` (:114-159), ``unique_last_copy`` (:74-98),
``non_adjacent_find`` (:21-43) — the engine behind ``LazyBitset``'s deferred batch
updates (`inc/_bitset.hxx:227-262`).

The reference merges in place with deque views; here every op is one vectorized
sort/mask pass over NumPy arrays (host: these run during functional graph rebuilds,
not on the device hot path).  "Last wins" duplicate semantics are preserved.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "set_union_last",
    "set_difference",
    "set_intersection",
    "unique_last",
    "non_adjacent_find",
]


def _as1d(x):
    return np.asarray(x).reshape(-1)


def unique_last(keys, values=None):
    """Dedup sorted ``keys`` keeping the LAST occurrence's value
    (``unique_last_copy``, `_algorithm.hxx:74-98`)."""
    keys = _as1d(keys)
    if keys.size == 0:
        return (keys, values) if values is not None else keys
    last = np.empty(keys.shape[0], dtype=bool)
    last[:-1] = keys[1:] != keys[:-1]
    last[-1] = True
    if values is not None:
        return keys[last], _as1d(values)[last]
    return keys[last]


def set_union_last(a_keys, b_keys, a_values=None, b_values=None):
    """Union of two sorted key sets; on collision the second set's value wins
    (``set_union_last_inplace``, `_algorithm.hxx:177-232`)."""
    a_keys, b_keys = _as1d(a_keys), _as1d(b_keys)
    keys = np.concatenate([a_keys, b_keys])
    if a_values is None:
        order = np.argsort(keys, kind="stable")
        return np.unique(keys[order])
    values = np.concatenate([_as1d(a_values), _as1d(b_values)])
    order = np.argsort(keys, kind="stable")  # stable => b after a on ties
    return unique_last(keys[order], values[order])


def set_difference(a_keys, b_keys, a_values=None):
    """Sorted ``a`` minus keys of sorted ``b`` (``set_difference_inplace``,
    `_algorithm.hxx:114-159`)."""
    a_keys, b_keys = _as1d(a_keys), _as1d(b_keys)
    keep = ~np.isin(a_keys, b_keys)
    if a_values is not None:
        return a_keys[keep], _as1d(a_values)[keep]
    return a_keys[keep]


def set_intersection(a_keys, b_keys):
    """Common keys of two sorted sets (``commonEdges`` building block,
    `main.cxx:129-133`)."""
    return np.intersect1d(_as1d(a_keys), _as1d(b_keys), assume_unique=False)


def non_adjacent_find(x, equal=None):
    """Index of the first adjacent pair that is NOT equal under ``equal``
    (`_algorithm.hxx:21-43`); len(x) if none — the reference's sortedness probe."""
    x = _as1d(x)
    if x.size < 2:
        return x.size
    if equal is None:
        neq = x[1:] != x[:-1]
    else:
        neq = ~np.fromiter(
            (equal(x[i], x[i + 1]) for i in range(x.size - 1)),
            dtype=bool, count=x.size - 1)
    hits = np.nonzero(neq)[0]
    return int(hits[0]) if hits.size else int(x.size)
