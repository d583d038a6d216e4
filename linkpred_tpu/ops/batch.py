"""Batch-update generation and application for dynamic-graph experiments.

Reference parity (`/root/reference/inc/batch.hxx`):

* ``generate_edge_deletions`` (`batch.hxx:100-112`) — pick a uniform random vertex,
  then a uniform random incident edge (note: vertex-first sampling biases toward
  edges of low-degree vertices — preserved, it shapes the published F1 numbers);
  zero-degree picks are retried up to 5 times (`_utility.hxx:199-203`); undirected
  mode records both directions.
* ``generate_edge_insertions`` (`batch.hxx:127-139`) — uniform random vertex pairs.
* ``tidy_batch`` (`batch.hxx:201-208`) — filter deletions to existing edges and
  insertions to non-existing ones, sort by (u, v), dedup.
* ``apply_batch`` (`batch.hxx:222-247`) — remove deletions then add insertions.

Generation is vectorized NumPy with an explicit seeded Generator (the reference
seeds from ``random_device`` — non-reproducible; we make reproducibility a feature).
A `jax.random` device-side variant is provided for fully-on-device pipelines.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..graph import CSRGraph, from_edges, edge_list

__all__ = [
    "generate_edge_deletions",
    "generate_edge_insertions",
    "tidy_batch",
    "apply_batch",
    "generate_edge_deletions_device",
]

RETRIES = 5  # batch.hxx:102,129


def generate_edge_deletions(
    rng: np.random.Generator, g: CSRGraph, batch_size: int, undirected: bool = True,
) -> np.ndarray:
    """Sample ``batch_size`` candidate edge deletions; returns int64[*, 2] directed
    pairs (both directions per pick when ``undirected``). May contain duplicates and
    fewer than requested picks (parity with the retry-bounded reference)."""
    g = g.host()
    deg = np.asarray(g.degrees, dtype=np.int64)
    offsets = np.asarray(g.offsets, dtype=np.int64)
    indices = np.asarray(g.indices, dtype=np.int64)

    picked_u = np.empty(0, dtype=np.int64)
    need = int(batch_size)
    for _ in range(RETRIES):
        if need <= 0:
            break
        u = rng.integers(0, g.n, size=need)
        ok = deg[u] > 0
        picked_u = np.concatenate([picked_u, u[ok]])
        need -= int(ok.sum())
    if picked_u.size == 0:
        return np.empty((0, 2), dtype=np.int64)
    vi = np.floor(rng.random(picked_u.shape[0]) * deg[picked_u]).astype(np.int64)
    vi = np.minimum(vi, deg[picked_u] - 1)
    v = indices[offsets[picked_u] + vi]
    pairs = np.stack([picked_u, v], axis=1)
    if undirected:
        pairs = np.concatenate([pairs, pairs[:, ::-1]], axis=0)
    return pairs


def generate_edge_insertions(
    rng: np.random.Generator, g: CSRGraph, batch_size: int, undirected: bool = True,
) -> np.ndarray:
    """Sample ``batch_size`` uniform random vertex pairs as candidate insertions."""
    if batch_size <= 0 or g.n == 0:
        return np.empty((0, 2), dtype=np.int64)
    u = rng.integers(0, g.n, size=batch_size)
    v = rng.integers(0, g.n, size=batch_size)
    pairs = np.stack([u, v], axis=1)
    if undirected:
        pairs = np.concatenate([pairs, pairs[:, ::-1]], axis=0)
    return pairs


def _edge_exists(g: CSRGraph, pairs: np.ndarray) -> np.ndarray:
    """Vectorized membership test of directed pairs against sorted CSR rows."""
    if pairs.shape[0] == 0:
        return np.zeros(0, dtype=bool)
    g = g.host()
    offsets = np.asarray(g.offsets, dtype=np.int64)
    indices = np.asarray(g.indices, dtype=np.int64)
    u, v = pairs[:, 0], pairs[:, 1]
    lo, hi = offsets[u], offsets[u + 1]
    # branchless vectorized lower_bound over each row
    length = hi - lo
    while True:
        mx = int(length.max(initial=0))
        if mx <= 0:
            break
        half = length // 2
        midpos = lo + half
        go = indices[np.minimum(midpos, indices.shape[0] - 1)] < v
        go &= length > 0
        lo = np.where(go, midpos + 1, lo)
        length = np.where(go, length - half - 1, half)
        if mx == 1:
            break
    found = (lo < hi) & (indices[np.minimum(lo, indices.shape[0] - 1)] == v)
    return found


def tidy_batch(
    deletions: np.ndarray, insertions: np.ndarray, g: CSRGraph,
) -> Tuple[np.ndarray, np.ndarray]:
    """Filter by existence, sort by (u, v), dedup (batch.hxx:201-208)."""

    def _tidy(pairs: np.ndarray, keep_existing: bool) -> np.ndarray:
        if pairs.shape[0] == 0:
            return pairs.reshape(0, 2)
        mask = _edge_exists(g, pairs)
        pairs = pairs[mask if keep_existing else ~mask]
        if pairs.shape[0] == 0:
            return pairs
        order = np.lexsort((pairs[:, 1], pairs[:, 0]))
        pairs = pairs[order]
        keep = np.empty(pairs.shape[0], dtype=bool)
        keep[0] = True
        keep[1:] = (pairs[1:] != pairs[:-1]).any(axis=1)
        return pairs[keep]

    return _tidy(deletions, True), _tidy(insertions, False)


def apply_batch(
    g: CSRGraph, deletions: np.ndarray, insertions: np.ndarray,
    insertion_weights: Optional[np.ndarray] = None,
) -> CSRGraph:
    """Functional batch update: remove then add, returning a new graph
    (batch.hxx:222-247; the LazyBitset deferred-commit machinery collapses into one
    sort-based rebuild, SURVEY.md §7).

    Edge weights flow through like the reference's edge values E
    (`update.hxx:130-150`): surviving edges keep theirs, insertions take
    ``insertion_weights`` (default 1.0, the reference driver's ``V(1)``), and
    re-inserting an existing pair replaces its value (``_bitset.hxx:258``
    set-union-LAST semantics, via ``from_edges``' last-wins dedup)."""
    src, dst, w = edge_list(g, with_weights=True)
    if deletions.shape[0]:
        # mark deletions via membership in sorted edge ids
        keys = src * g.n + dst
        dkeys = deletions[:, 0] * g.n + deletions[:, 1]
        keep = ~np.isin(keys, dkeys)
        src, dst = src[keep], dst[keep]
        if w is not None:
            w = w[keep]
    if insertions.shape[0]:
        # Mirror GraphBuilder.update: an unweighted base stays unweighted when
        # every insertion weight is the default 1.0 (no spurious promotion to a
        # weighted representation / m-sized float32 allocation).
        if insertion_weights is not None and w is None \
                and not np.any(np.asarray(insertion_weights) != 1.0):
            insertion_weights = None
        if w is not None or insertion_weights is not None:
            base_w = w if w is not None \
                else np.ones(src.shape[0], dtype=np.float32)
            ins_w = (np.asarray(insertion_weights, dtype=np.float32)
                     if insertion_weights is not None
                     else np.ones(insertions.shape[0], dtype=np.float32))
            w = np.concatenate([base_w, ins_w])
        src = np.concatenate([src, insertions[:, 0]])
        dst = np.concatenate([dst, insertions[:, 1]])
    return from_edges(src, dst, n=g.n, weights=w)


def generate_edge_deletions_device(
    key, g: CSRGraph, batch_size: int,
):
    """Device-side deletion sampling with `jax.random` (single retry-free pass;
    zero-degree picks are masked out). Returns (pairs int32[batch, 2], valid bool[batch]).
    """
    import jax
    import jax.numpy as jnp

    gd = g.device()
    ku, kv = jax.random.split(key)
    u = jax.random.randint(ku, (batch_size,), 0, max(g.n, 1), dtype=jnp.int32)
    d = gd.degrees[u]
    r = jax.random.uniform(kv, (batch_size,))
    vi = jnp.minimum((r * d).astype(jnp.int32), jnp.maximum(d - 1, 0))
    v = gd.indices[gd.offsets[u] + vi]
    valid = d > 0
    return jnp.stack([u, v], axis=1), valid
