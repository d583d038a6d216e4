"""Work-balanced tiling plan for the second-hop expansion.

The reference load-balances its irregular per-vertex work with
``schedule(dynamic, 2048)`` (`/root/reference/inc/predict.hxx:287`).  XLA needs static
shapes, so we *precompute* a balanced schedule on the host:

1. Build the filtered first-hop edge list: directed edges (u → mid) whose intermediate
   passes the LHub hub mask ``deg(mid) <= min_degree1`` (`predict.hxx:301`) and has
   work to do (``deg(mid) > 0``).  Each such edge expands into ``deg(mid)`` candidate
   slots — the innermost loop of `predict.hxx:154-179`.
2. Append one *pseudo edge* (u → u) per active source.  Its slots enumerate N(u) with
   a large negative count, so after the sort + segmented reduction every first-order
   pair's run total goes negative and is dropped — the sort-native equivalent of the
   reference's "zero out self + 1-hop" pass (`predict.hxx:306-307`), with no per-slot
   binary search.
3. Partition sources into tiles of total slot count <= ``cap``, aligned to source
   boundaries so every (u, w) pair reduces inside exactly one tile (exact counts —
   the analog of per-thread-private scratch).
4. Sources whose slot count alone exceeds ``cap`` ("huge" hubs) are routed to a dense
   scatter-add fallback (`linkpred_tpu.predict.scoring.score_huge_sources`).

The plan depends on (graph, min_degree1, cap) only; planning is vectorized NumPy,
O(m log m), and sits outside the timed scoring path (like the reference's hashtable
allocation, `predict.hxx:414-424`).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..graph import CSRGraph

__all__ = ["TilePlan", "build_plan", "KILL"]

# Count contribution of a killer slot; any run containing one goes negative.
# Real contributions per run are bounded by max degree < 2**30.
KILL = -(1 << 30)


def _next_pow2(x: int) -> int:
    return 1 << max(int(x) - 1, 0).bit_length()


@dataclasses.dataclass(frozen=True)
class TilePlan:
    # Filtered first-hop edges + pseudo killer edges (sorted by source), padded:
    fe_src: np.ndarray    # int32[M1_pad] source vertex per edge
    fe_mid: np.ndarray    # int32[M1_pad] intermediate vertex (== src for killers)
    fe_work: np.ndarray   # int32[M1_pad] = deg(mid); 0 in padding
    fe_cnt: np.ndarray    # int32[M1_pad] per-slot count contribution: +1 or KILL
    tile_edge_start: np.ndarray  # int32[T_pad + 1]; tile t covers edges [t, t+1)
    cap: int              # static slot budget per tile
    num_tiles: int        # true tile count (<= T_pad)
    huge_src: np.ndarray  # int64[H] sources routed to the dense fallback
    total_slots: int      # expansion slots across tiles (incl. killer slots)
    huge_slots: int       # expansion slots routed to the huge-source path

    @property
    def num_tiles_padded(self) -> int:
        return int(self.tile_edge_start.shape[0]) - 1


def build_plan(g: CSRGraph, min_degree1: int, cap: int = 1 << 20,
               pad_tiles_pow2: bool = True) -> TilePlan:
    g = g.host()
    n = g.n
    deg = np.asarray(g.degrees, dtype=np.int64)
    indices = np.asarray(g.indices, dtype=np.int64)

    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    mid = indices[: g.m]
    dmid = deg[mid]
    # LHub mask: skip intermediates with deg > min_degree1 when the threshold is set
    # (predict.hxx:227,301); min_degree1 == 0 means IHub (scan everything).
    keep = dmid > 0
    if min_degree1:
        keep &= dmid <= min_degree1
    src, mid = src[keep], mid[keep]

    # Killer pseudo-edges: one per active source, expanding over N(u) itself.
    uniq = np.unique(src)
    src = np.concatenate([src, uniq])
    mid = np.concatenate([mid, uniq])
    cnt = np.concatenate([
        np.ones(src.shape[0] - uniq.shape[0], dtype=np.int32),
        np.full(uniq.shape[0], KILL, dtype=np.int32),
    ])
    order = np.lexsort((mid, src))
    src, mid, cnt = src[order], mid[order], cnt[order]
    work = deg[mid]

    # Per-source slot counts; sources too big for one tile go to the dense path.
    w_u = np.bincount(src, weights=work.astype(np.float64), minlength=n).astype(np.int64)
    huge_src = np.nonzero(w_u > cap)[0]
    huge_slots = int(w_u[huge_src].sum())
    if huge_src.size:
        not_huge = ~np.isin(src, huge_src)
        src, mid, cnt, work = src[not_huge], mid[not_huge], cnt[not_huge], work[not_huge]
        w_u = w_u.copy()
        w_u[huge_src] = 0

    m1 = src.shape[0]
    total_slots = int(work.sum())

    # Source-aligned greedy partition: tile boundaries at row starts, each tile's
    # slot total <= cap.  The Python loop runs num_tiles times (small).
    row_prefix = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(w_u, out=row_prefix[1:])
    row_edge_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(src, minlength=n), out=row_edge_start[1:])

    bounds = [0]
    b = 0
    while row_prefix[b] < total_slots:
        nb = int(np.searchsorted(row_prefix, row_prefix[b] + cap, side="right")) - 1
        if nb <= b:  # defensive; cannot happen since per-source work <= cap
            nb = b + 1
        bounds.append(nb)
        b = nb
    num_tiles = max(len(bounds) - 1, 1)
    t_pad = _next_pow2(num_tiles) if pad_tiles_pow2 else num_tiles
    edge_bounds = row_edge_start[np.asarray(bounds, dtype=np.int64)]
    tile_edge_start = np.full(t_pad + 1, m1, dtype=np.int32)
    tile_edge_start[: len(bounds)] = edge_bounds
    if len(bounds) == 1:  # empty stream: single all-padding tile
        tile_edge_start[:] = 0

    # Pad edge arrays so every tile can read a full cap-sized window, rounded to a
    # power of two so jitted shapes are stable across experiment batches.
    m1_pad = _next_pow2(m1 + cap)
    fe_src = np.zeros(m1_pad, dtype=np.int32)
    fe_mid = np.zeros(m1_pad, dtype=np.int32)
    fe_work = np.zeros(m1_pad, dtype=np.int32)
    fe_cnt = np.zeros(m1_pad, dtype=np.int32)
    fe_src[:m1] = src
    fe_mid[:m1] = mid
    fe_work[:m1] = work
    fe_cnt[:m1] = cnt

    return TilePlan(
        fe_src=fe_src,
        fe_mid=fe_mid,
        fe_work=fe_work,
        fe_cnt=fe_cnt,
        tile_edge_start=tile_edge_start,
        cap=cap,
        num_tiles=num_tiles,
        huge_src=huge_src,
        total_slots=total_slots,
        huge_slots=huge_slots,
    )
