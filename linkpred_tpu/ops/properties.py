"""Graph properties: degrees, edge weights, modularity, communities.

Reference parity (`/root/reference/inc/properties.hxx`): ``vertexKeys`` (:26-33),
``degreesW`` (:53-55), ``edgeWeight[Omp]`` (:69-106), the modularity family
(:123-233), ``communitySize/Vertices/communities`` (:270-364), and
``communitiesDisconnectedOmp`` (:379-400).

All aggregations are vectorized: modularity reduces the edge list with one
``bincount`` keyed by community pairs instead of per-vertex locks/atomics
(`properties.hxx:227-230`); disconnected-community detection runs one multi-source
BFS per community from its minimum vertex.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..graph import CSRGraph, edge_list
from .traverse import bfs_levels

__all__ = [
    "vertex_keys",
    "degrees",
    "edge_weight",
    "modularity_communities",
    "modularity",
    "modularity_by",
    "community_size",
    "community_vertices",
    "communities",
    "communities_disconnected",
]


def vertex_keys(g: CSRGraph) -> np.ndarray:
    """All vertex ids (reference ``vertexKeys``, `properties.hxx:26-33`)."""
    return np.arange(g.n, dtype=np.int64)


def degrees(g: CSRGraph) -> np.ndarray:
    """Out-degrees (reference ``degreesW``, `properties.hxx:53-55`)."""
    return np.asarray(g.host().degrees, dtype=np.int64)


def edge_weight(g: CSRGraph) -> float:
    """Total edge weight; unweighted edges count 1 (`properties.hxx:69-106`)."""
    g = g.host()
    if g.weights is None:
        return float(g.m)
    return float(np.asarray(g.weights[: g.m], dtype=np.float64).sum())


def _edge_weights_arr(g: CSRGraph) -> np.ndarray:
    if g.weights is None:
        return np.ones(g.m, dtype=np.float64)
    return np.asarray(g.weights[: g.m], dtype=np.float64)


def modularity_communities(g: CSRGraph, x: np.ndarray,
                           M: Optional[float] = None, R: float = 1.0):
    """Per-community (intra-weight, total-weight) pairs (`properties.hxx:123-162`).

    Returns (cin, ctot) float64 arrays indexed by community id."""
    g = g.host()
    x = np.asarray(x, dtype=np.int64)
    src, dst = edge_list(g)
    w = _edge_weights_arr(g)
    ncomm = int(x.max()) + 1 if x.size else 0
    same = x[src] == x[dst]
    cin = np.bincount(x[src], weights=w * same, minlength=ncomm)
    ctot = np.bincount(x[src], weights=w, minlength=ncomm)
    return cin, ctot


def modularity_by(g: CSRGraph, x: np.ndarray, M: Optional[float] = None,
                  R: float = 1.0) -> float:
    """Modularity of a community assignment ``x`` (`properties.hxx:187-233`):
    Q = Σ_c [ cin_c/(2M) - R·(ctot_c/(2M))² ] over undirected weight M."""
    if M is None:
        M = edge_weight(g) / 2
    if M <= 0:
        return 0.0
    cin, ctot = modularity_communities(g, x)
    # edge_list counts both directions; cin/ctot are directed sums.
    return float((cin / (2 * M) - R * (ctot / (2 * M)) ** 2).sum())


def modularity(g: CSRGraph, M: Optional[float] = None, R: float = 1.0) -> float:
    """Modularity with singleton communities (vertex = community), matching the
    reference's default overload (`properties.hxx:219-233`)."""
    return modularity_by(g, np.arange(g.n, dtype=np.int64), M=M, R=R)


def community_size(x: np.ndarray, c: int) -> int:
    """Vertices in community ``c`` (`properties.hxx:270-277`)."""
    return int((np.asarray(x) == c).sum())


def community_vertices(x: np.ndarray, c: int) -> np.ndarray:
    """Vertex ids of community ``c`` (`properties.hxx:289-297`)."""
    return np.nonzero(np.asarray(x) == c)[0]


def communities(x: np.ndarray) -> np.ndarray:
    """Distinct community ids (`properties.hxx:309-317`)."""
    return np.unique(np.asarray(x))


def communities_disconnected(g: CSRGraph, x: np.ndarray) -> np.ndarray:
    """Ids of communities that are internally disconnected
    (`properties.hxx:379-400`): BFS within each community from its minimum vertex
    must reach every member."""
    g = g.host()
    x = np.asarray(x, dtype=np.int64)
    src, dst = edge_list(g)
    disconnected = []
    for c in np.unique(x):
        members = np.nonzero(x == c)[0]
        if members.size <= 1:
            continue
        keep = (x[src] == c) & (x[dst] == c)
        if not keep.any():
            disconnected.append(int(c))
            continue
        from ..graph import from_edges
        sub = from_edges(src[keep], dst[keep], n=g.n)
        start = np.zeros(g.n, bool)
        start[members[0]] = True
        levels = bfs_levels(sub, start)
        if (levels[members] < 0).any():
            disconnected.append(int(c))
    return np.asarray(disconnected, dtype=np.int64)
