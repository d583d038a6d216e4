"""The nine neighborhood-similarity metrics.

Reference parity (`/root/reference/inc/predict.hxx:503-831`): each metric is a score
function of (|N(u) ∩ N(v)|, deg(u), deg(v)); Adamic–Adar and Resource Allocation
instead accumulate a per-intermediate weight during the second-hop scan
(`predict.hxx:770,788` — ``1/log(deg(mid))``; `:810,828` — ``1/deg(mid)``) and return
the accumulated value directly.

Here every metric is one elementwise JAX function over the vectorized run totals, so
all nine share the same expansion/reduction kernel; the kernel is specialized per
metric at jit time (the analog of the reference's template instantiation).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["METRICS", "MetricSpec", "get_metric", "TECHNIQUE_NAMES"]


class MetricSpec(NamedTuple):
    name: str
    needs_weight: bool  # True => accumulate mid-vertex weights (CUSTOMVALUE variant)

    def weight_table(self, degrees):
        """Per-vertex intermediate weight table (host NumPy, float64 → float32).

        The reference computes ``1.0/log(degree)`` in double per scan step
        (`predict.hxx:770,788,810,828`); we precompute it once per vertex — a gather
        replaces a transcendental in the hot loop, and accuracy does not depend on
        XLA's fast-math ``log``.  Guarded against deg<=1 (such lanes are always
        masked downstream, but inf/nan must not be produced).
        """
        import numpy as np

        d = np.asarray(degrees, dtype=np.float64)
        if self.name == "adamic_adar":
            w = np.where(d > 1, 1.0 / np.log(np.maximum(d, 2.0)), 0.0)
        elif self.name == "resource_allocation":
            w = np.where(d > 0, 1.0 / np.maximum(d, 1.0), 0.0)
        else:
            raise AssertionError(self.name)
        return w.astype(np.float32)

    def weight_from_degree(self, deg):
        """Per-intermediate weight as an elementwise function of deg(mid)
        (float32 array in, float32 out) — the gather-free form of
        ``weight_table`` used by the packed slot stream."""
        d = deg.astype(jnp.float32)
        if self.name == "adamic_adar":
            return jnp.where(d > 1, 1.0 / jnp.log(jnp.maximum(d, 2.0)), 0.0)
        if self.name == "resource_allocation":
            return jnp.where(d > 0, 1.0 / jnp.maximum(d, 1.0), 0.0)
        raise AssertionError(self.name)

    def score(self, cnt, acc, deg_u, deg_v):
        """Similarity score. ``cnt`` int32 common-neighbor count, ``acc`` float32
        accumulated weight (AA/RA only), degrees int32."""
        nuv = cnt.astype(jnp.float32)
        du = deg_u.astype(jnp.float32)
        dv = deg_v.astype(jnp.float32)
        n = self.name
        if n == "common_neighbors":      # predict.hxx:504
            return nuv
        if n == "jaccard_coefficient":   # predict.hxx:542
            return nuv / (du + dv - nuv)
        if n == "sorensen_index":        # predict.hxx:580
            return nuv / (du + dv)
        if n == "salton_cosine_similarity":  # predict.hxx:618
            return nuv / jnp.sqrt(du * dv)
        if n == "hub_promoted":          # predict.hxx:656
            return nuv / jnp.minimum(du, dv)
        if n == "hub_depressed":         # predict.hxx:694
            return nuv / jnp.maximum(du, dv)
        if n == "leicht_holme_nerman":   # predict.hxx:732
            return nuv / (du * dv)
        if n in ("adamic_adar", "resource_allocation"):  # predict.hxx:771,811
            return acc
        raise AssertionError(n)


METRICS = {
    s.name: s
    for s in [
        MetricSpec("common_neighbors", False),
        MetricSpec("jaccard_coefficient", False),
        MetricSpec("sorensen_index", False),
        MetricSpec("salton_cosine_similarity", False),
        MetricSpec("hub_promoted", False),
        MetricSpec("hub_depressed", False),
        MetricSpec("leicht_holme_nerman", False),
        MetricSpec("adamic_adar", True),
        MetricSpec("resource_allocation", True),
    ]
}

# Technique-name stems used in result-log lines, mirroring the reference's
# function-name-derived labels (main.cxx:212-220) with the Tpu backend suffix.
TECHNIQUE_NAMES = {
    "common_neighbors": "predictLinksCommonNeighbors",
    "jaccard_coefficient": "predictLinksJaccardCoefficient",
    "sorensen_index": "predictLinksSorensenIndex",
    "salton_cosine_similarity": "predictLinksSaltonCosineSimilarity",
    "hub_promoted": "predictLinksHubPromoted",
    "hub_depressed": "predictLinksHubDepressed",
    "leicht_holme_nerman": "predictLinksLeichtHolmeNermanScore",
    "adamic_adar": "predictLinksAdamicAdarCoefficient",
    "resource_allocation": "predictLinksResourceAllocationScore",
}


def get_metric(name: str) -> MetricSpec:
    key = name.lower()
    aliases = {
        "cn": "common_neighbors",
        "jaccard": "jaccard_coefficient",
        "sorensen": "sorensen_index",
        "salton": "salton_cosine_similarity",
        "cosine": "salton_cosine_similarity",
        "hpi": "hub_promoted",
        "hdi": "hub_depressed",
        "lhn": "leicht_holme_nerman",
        "aa": "adamic_adar",
        "ra": "resource_allocation",
    }
    key = aliases.get(key, key)
    if key not in METRICS:
        raise KeyError(f"unknown metric {name!r}; one of {sorted(METRICS)}")
    return METRICS[key]
