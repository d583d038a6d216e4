"""Dense NumPy oracle for link-prediction semantics.

Independent re-derivation of the reference algorithm (`/root/reference/inc/
predict.hxx:214-265` + metric formulas `:503-831`) in dense linear algebra, used as
ground truth for the TPU engine. float64 throughout.
"""
from __future__ import annotations

import numpy as np

from linkpred_tpu.graph import CSRGraph, to_dense


def oracle_scores(g: CSRGraph, metric: str, min_degree1: int, max_factor2: int = 0,
                  min_score: float = 0.0, sources=None):
    """Return dict {(u, v): score} over all valid candidate pairs — upper
    triangle (u < v) by default; with ``sources``, directed pairs (s, w) for
    s in sources, w != s."""
    A = to_dense(g).astype(np.float64)
    n = g.n
    deg = A.sum(axis=1)
    mid_ok = deg > 0
    if min_degree1:
        mid_ok &= deg <= min_degree1

    cnt = (A * mid_ok[None, :]) @ A  # cnt[u, w] = |{v in N(u): deg v <= D1, w in N(v)}|
    if metric == "adamic_adar":
        wt = np.where(deg > 1, 1.0 / np.log(np.maximum(deg, 2.0)), 0.0) * mid_ok
        acc = (A * wt[None, :]) @ A
    elif metric == "resource_allocation":
        wt = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0) * mid_ok
        acc = (A * wt[None, :]) @ A
    else:
        acc = cnt

    du = deg[:, None]
    dv = deg[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        if metric == "common_neighbors":
            s = cnt
        elif metric == "jaccard_coefficient":
            s = cnt / (du + dv - cnt)
        elif metric == "sorensen_index":
            s = cnt / (du + dv)
        elif metric == "salton_cosine_similarity":
            s = cnt / np.sqrt(du * dv)
        elif metric == "hub_promoted":
            s = cnt / np.minimum(du, dv)
        elif metric == "hub_depressed":
            s = cnt / np.maximum(du, dv)
        elif metric == "leicht_holme_nerman":
            s = cnt / (du * dv)
        elif metric in ("adamic_adar", "resource_allocation"):
            s = acc
        else:
            raise KeyError(metric)

    if sources is None:
        valid = np.triu(np.ones((n, n), dtype=bool), k=1)  # w > u
    else:
        valid = np.zeros((n, n), dtype=bool)
        valid[np.asarray(sources, dtype=np.int64), :] = True
        np.fill_diagonal(valid, False)                 # w != u
    valid &= ~(A > 0)                                  # not first-order
    valid &= cnt > 0                                   # touched candidates only
    if max_factor2:
        valid &= (du <= max_factor2 * du) & (dv <= max_factor2 * du)
    valid &= np.nan_to_num(s, nan=-np.inf) > min_score
    us, vs = np.nonzero(valid)
    return {(int(u), int(v)): float(s[u, v]) for u, v in zip(us, vs)}


def oracle_topk_scores(pairs: dict, k: int) -> np.ndarray:
    """Descending score array of the oracle's top-k (for tie-robust comparison)."""
    s = np.sort(np.array(list(pairs.values()), dtype=np.float64))[::-1]
    return s[:k]
