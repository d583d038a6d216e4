"""The scoring engine: tiled expand → sort → segment-reduce → fused top-k.

This is the TPU-native re-expression of the reference's hot loop
(`/root/reference/inc/predict.hxx:284-339`):

* the per-thread dense scratch scatter (`predict.hxx:154-179`) becomes a
  lexicographic sort of (u, w) candidate slots + a segmented run reduction
  (sort-based accumulation is the XLA-idiomatic hash table);
* the "zero out self + first-order neighbors" pass (`predict.hxx:306-307`) becomes
  killer slots injected by the plan (see `plan.py`) whose large negative count makes
  first-order runs drop out of the reduction;
* the per-thread bounded min-heap (`predict.hxx:309-337`) becomes a fused per-tile
  `lax.top_k` merged into a running top-k carry inside `lax.scan`;
* `schedule(dynamic, 2048)` load balancing (`predict.hxx:287`) is precomputed as the
  work-balanced tile schedule.

Everything here is static-shaped and jit-compiled once per
(metric, cap, k, padded sizes) — the analog of the reference's template
instantiation over <MINDEGREE1, MAXFACTOR2, ...>.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..graph import CSRGraph
from ..ops.segment import cummax, run_boundaries, segment_run_totals
from ..ops.topk import TopK, topk_from_candidates, topk_init, topk_merge
from .metrics import METRICS, MetricSpec
from .plan import TilePlan

__all__ = ["score_tiles", "tile_candidates", "score_huge_sources_host"]

_SENTINEL = np.int32(2**31 - 1)


def tile_candidates(
    offsets, indices, degrees, wt_table,
    fe_src, fe_mid, fe_work, fe_cnt,
    t_start, t_end,
    *, metric: MetricSpec, cap: int, maxf2: int, min_score,
):
    """Score one tile's candidate pairs. Returns (score[cap], u[cap], w[cap]) with
    -inf scores on invalid lanes."""
    i32 = jnp.int32
    iota = jax.lax.broadcasted_iota(i32, (cap,), 0)

    # --- edge window -------------------------------------------------------
    eids = t_start + iota                       # global edge ids; fe_* are padded
    evalid = eids < t_end
    ework = jnp.where(evalid, fe_work[eids], 0)
    ecnt = fe_cnt[eids]
    eprefix = jnp.cumsum(ework) - ework         # exclusive slot prefix within tile
    total = eprefix[-1] + ework[-1]

    # --- slot -> edge mapping (scatter starts + cummax; no per-slot search) --
    pos = jnp.where(ework > 0, eprefix, cap)    # cap => dropped
    starts = jnp.zeros((cap,), i32).at[pos].max(iota, mode="drop")
    eloc = cummax(starts)                       # local edge index per slot

    # --- expansion ---------------------------------------------------------
    svalid = iota < total
    u = fe_src[t_start + eloc]
    mid = fe_mid[t_start + eloc]
    j = iota - eprefix[eloc]                    # j-th neighbor of mid
    w = indices[offsets[mid] + j]               # in-range: j < deg(mid)
    cnt = fe_cnt[t_start + eloc]

    # Candidate filter ft: second-order neighbor beyond u (predict.hxx:221 "v>u").
    cand = svalid & (w > u)
    ku = jnp.where(cand, u, _SENTINEL)
    kw = jnp.where(cand, w, _SENTINEL)
    cnt = jnp.where(cand, cnt, 0)

    # --- sort + segmented reduction (the "hash table") ----------------------
    if metric.needs_weight:
        wt = jnp.where(cnt > 0, wt_table[mid], jnp.float32(0.0))
        ku, kw, cnt, wt = jax.lax.sort((ku, kw, cnt, wt), num_keys=2)
        is_start, is_end = run_boundaries(ku, kw)
        cnt_tot, wt_tot = segment_run_totals(is_start, cnt, wt)
    else:
        ku, kw, cnt = jax.lax.sort((ku, kw, cnt), num_keys=2)
        is_start, is_end = run_boundaries(ku, kw)
        cnt_tot = segment_run_totals(is_start, cnt)
        wt_tot = cnt_tot.astype(jnp.float32)

    # --- scoring (predict.hxx:503-831 formulas) -----------------------------
    n = degrees.shape[0]
    du = degrees[jnp.minimum(ku, n - 1)]
    dw = degrees[jnp.minimum(kw, n - 1)]
    valid = is_end & (ku != _SENTINEL) & (cnt_tot > 0)
    if maxf2:
        # Parity with the reference's MAXFACTOR2 predicate *as written*
        # (predict.hxx:221,295): note it compares deg(u) against maxf2*deg(u)
        # (self-compare) — kept verbatim; the published experiment never sets it.
        valid &= (du <= maxf2 * du) & (dw <= maxf2 * du)
    score = metric.score(jnp.maximum(cnt_tot, 0), wt_tot, du, dw)
    score = jnp.where(valid & (score > min_score), score, -jnp.inf)
    return score, ku, kw


@partial(
    jax.jit,
    static_argnames=("metric_name", "cap", "k", "maxf2"),
)
def score_tiles(
    offsets, indices, degrees, wt_table,
    fe_src, fe_mid, fe_work, fe_cnt,
    tile_edge_start,
    min_score,
    *, metric_name: str, cap: int, k: int, maxf2: int = 0,
) -> TopK:
    """Run all tiles under `lax.scan`, carrying a running global top-k."""
    metric = METRICS[metric_name]
    kt = min(k, cap)

    def body(carry: TopK, ts):
        t_start, t_end = ts
        score, u, w = tile_candidates(
            offsets, indices, degrees, wt_table,
            fe_src, fe_mid, fe_work, fe_cnt,
            t_start, t_end,
            metric=metric, cap=cap, maxf2=maxf2, min_score=min_score,
        )
        cand = topk_from_candidates(score, u, w, kt)
        return topk_merge(carry, cand), None

    carry, _ = jax.lax.scan(
        body, topk_init(k), (tile_edge_start[:-1], tile_edge_start[1:])
    )
    return carry


def score_huge_sources_host(
    g: CSRGraph, huge_src: np.ndarray, metric: MetricSpec,
    min_degree1: int, maxf2: int, min_score: float,
    k: Optional[int] = None,
):
    """Exact scoring for hub sources whose expansion exceeds one tile.

    Dense per-source accumulation via vectorized bincount — the direct analog of the
    reference's dense ``veout`` scratch (`predict.hxx:117-123`), used only for the
    rare sources where sort-based tiles would fragment (host NumPy for now; these
    sources are off the benchmark path by construction of ``cap``).
    Returns (scores f32[*], u i32[*], w i32[*]) candidate arrays.
    """
    g = g.host()
    deg = np.asarray(g.degrees, dtype=np.int64)
    offsets = np.asarray(g.offsets, dtype=np.int64)
    indices = np.asarray(g.indices, dtype=np.int64)
    out_s, out_u, out_w = [], [], []
    for u in np.asarray(huge_src, dtype=np.int64):
        nbrs = indices[offsets[u]: offsets[u] + deg[u]]
        mids = nbrs[(deg[nbrs] > 0) & ((deg[nbrs] <= min_degree1) if min_degree1 else True)]
        if mids.size == 0:
            continue
        dm = deg[mids]
        # expansion: all neighbors of all mids (repeat+cumsum trick)
        base = np.repeat(offsets[mids], dm)
        step = np.arange(base.shape[0], dtype=np.int64) - np.repeat(
            np.cumsum(dm) - dm, dm)
        cand = indices[base + step]
        sel = cand > u
        cand = cand[sel]
        cnt = np.bincount(cand, minlength=g.n).astype(np.int64)
        if metric.needs_weight:
            if metric.name == "adamic_adar":
                wt_mid = np.where(dm > 1, 1.0 / np.log(np.maximum(dm, 2)), 0.0)
            else:  # resource_allocation
                wt_mid = np.where(dm > 0, 1.0 / np.maximum(dm, 1), 0.0)
            wts = np.repeat(wt_mid.astype(np.float64), dm)[sel]
            acc = np.bincount(cand, weights=wts, minlength=g.n)
        else:
            acc = cnt.astype(np.float64)
        # drop self + first-order neighbors (predict.hxx:306-307)
        cnt[nbrs] = 0
        cnt[u] = 0
        ws = np.nonzero(cnt > 0)[0]
        if ws.size == 0:
            continue
        du, dws = float(deg[u]), deg[ws].astype(np.float64)
        nuv = cnt[ws].astype(np.float64)
        name = metric.name
        if name == "common_neighbors":
            s = nuv
        elif name == "jaccard_coefficient":
            s = nuv / (du + dws - nuv)
        elif name == "sorensen_index":
            s = nuv / (du + dws)
        elif name == "salton_cosine_similarity":
            s = nuv / np.sqrt(du * dws)
        elif name == "hub_promoted":
            s = nuv / np.minimum(du, dws)
        elif name == "hub_depressed":
            s = nuv / np.maximum(du, dws)
        elif name == "leicht_holme_nerman":
            s = nuv / (du * dws)
        else:
            s = acc[ws]
        s = s.astype(np.float32)
        keep = s > min_score
        if maxf2:
            keep &= (du <= maxf2 * du) & (dws <= maxf2 * du)
        ws, s = ws[keep], s[keep]
        if k is not None and s.shape[0] > k:
            top = np.argpartition(-s, k - 1)[:k]
            ws, s = ws[top], s[top]
        out_s.append(s)
        out_u.append(np.full(ws.shape[0], u, dtype=np.int32))
        out_w.append(ws.astype(np.int32))
    if not out_s:
        z = np.empty(0, dtype=np.float32)
        zi = np.empty(0, dtype=np.int32)
        return z, zi, zi
    return (np.concatenate(out_s), np.concatenate(out_u), np.concatenate(out_w))
