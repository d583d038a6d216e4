"""Top-k selection and merging.

Replaces the reference's per-thread bounded min-heaps + serial k-way max-heap merge
(`/root/reference/inc/predict.hxx:309-337,440-459`) with `jax.lax.top_k` over
concatenated buffers — per-tile candidates merge into a running top-k carry inside
`lax.scan`, and per-device buffers merge with one more top_k after an all_gather.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["TopK", "topk_init", "topk_merge", "topk_from_candidates"]

NEG_INF = jnp.float32(-jnp.inf)


class TopK(NamedTuple):
    scores: jax.Array  # float32[k], -inf = empty slot
    u: jax.Array       # int32[k]
    v: jax.Array       # int32[k]


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
    """Exact merge of two top-k buffers (k = |a|)."""
    k = a.scores.shape[0]
    scores = jnp.concatenate([a.scores, b.scores])
    u = jnp.concatenate([a.u, b.u])
    v = jnp.concatenate([a.v, b.v])
    return topk_from_candidates(scores, u, v, k)
