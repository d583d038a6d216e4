"""Top-k containers and selection helpers.

Replaces the reference's per-thread bounded min-heaps + serial k-way max-heap
merge (`/root/reference/inc/predict.hxx:309-337,440-459`).  The scoring engine
carries a :class:`TopK` per metric and merges with descending 1-D sorts (see
`predict/scoring.py` — `lax.top_k` compiles pathologically inside `lax.scan`,
and batched dimension-1 sorts pick a slow T(1,128) layout; these helpers remain
for standalone/out-of-scan selection).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["TopK", "topk_init", "topk_merge", "topk_from_candidates"]

# Plain float, NOT a jnp scalar: a module-level jnp computation would
# initialise the XLA backend at import time, which breaks
# jax.distributed.initialize() for multi-host users.
NEG_INF = float("-inf")


class TopK(NamedTuple):
    scores: jax.Array  # float32[..., k], -inf = empty slot
    u: jax.Array       # int32[..., k]
    v: jax.Array       # int32[..., k]


def topk_init(k: int) -> TopK:
    return TopK(
        scores=jnp.full((k,), NEG_INF, dtype=jnp.float32),
        u=jnp.zeros((k,), dtype=jnp.int32),
        v=jnp.zeros((k,), dtype=jnp.int32),
    )


def topk_from_candidates(scores, u, v, k: int) -> TopK:
    """Top-k of a candidate set (invalid lanes must carry -inf scores)."""
    kk = min(k, scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, kk)
    out = TopK(top_scores, u[idx], v[idx])
    if kk < k:  # pad up to k
        pad = k - kk
        out = TopK(
            jnp.concatenate([out.scores, jnp.full((pad,), NEG_INF, jnp.float32)]),
            jnp.concatenate([out.u, jnp.zeros((pad,), jnp.int32)]),
            jnp.concatenate([out.v, jnp.zeros((pad,), jnp.int32)]),
        )
    return out


def topk_merge(a: TopK, b: TopK) -> TopK:
    """Exact merge of two top-k buffers (k = |a|) via one descending sort."""
    k = a.scores.shape[0]
    s2 = jnp.concatenate([a.scores, b.scores])
    u2 = jnp.concatenate([a.u, b.u])
    v2 = jnp.concatenate([a.v, b.v])
    ns, u2, v2 = jax.lax.sort((-s2, u2, v2), num_keys=1, is_stable=False)
    return TopK(-ns[:k], u2[:k], v2[:k])
