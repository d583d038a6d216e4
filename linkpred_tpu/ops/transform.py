"""Functional graph transforms.

Reference parity: ``symmetrizeOmp`` (`/root/reference/inc/symmetrize.hxx:72-82`),
``removeSelfLoopsOmpU`` (`inc/selfLoop.hxx:118-124`), ``transposeOmp``
(`inc/transpose.hxx:44-65`), ``duplicate`` (`inc/duplicate.hxx:98-101`).

The reference mutates adjacency bitsets in parallel under owner-computes sharding;
here every transform is a pure function producing a new CSR graph via one vectorized
sort pass (host NumPy — these run once per experiment setup, off the hot path).
"""
from __future__ import annotations

import numpy as np

from ..graph import CSRGraph, from_edges, edge_list

__all__ = [
    "symmetrize",
    "remove_self_loops",
    "add_self_loops",
    "count_self_loops",
    "transpose",
    "transpose_with_degree",
    "duplicate",
    "duplicate_if",
    "subgraph",
]


def symmetrize(g: CSRGraph) -> CSRGraph:
    """Union of the graph and its reverse (reference `symmetrize.hxx:72-82`)."""
    src, dst = edge_list(g)
    return from_edges(
        np.concatenate([src, dst]), np.concatenate([dst, src]), n=g.n,
        weights=None if g.weights is None else np.concatenate(
            [np.asarray(g.host().weights[: g.m])] * 2),
    )


def remove_self_loops(g: CSRGraph) -> CSRGraph:
    """Drop u→u edges (reference `selfLoop.hxx:118-124`)."""
    return duplicate_if(g, lambda u, v: u != v)


def add_self_loops(g: CSRGraph) -> CSRGraph:
    """Add u→u for every vertex (reference `selfLoop.hxx:15-47`)."""
    src, dst = edge_list(g)
    loops = np.arange(g.n, dtype=np.int64)
    return from_edges(np.concatenate([src, loops]), np.concatenate([dst, loops]), n=g.n)


def count_self_loops(g: CSRGraph) -> int:
    src, dst = edge_list(g)
    return int(np.count_nonzero(src == dst))


def transpose(g: CSRGraph) -> CSRGraph:
    """Reverse every edge (reference `transpose.hxx:44-65`)."""
    src, dst = edge_list(g)
    w = None if g.weights is None else np.asarray(g.host().weights[: g.m])
    return from_edges(dst, src, n=g.n, weights=w)


def transpose_with_degree(g: CSRGraph):
    """Transpose and record each vertex's ORIGINAL out-degree as its VERTEX
    VALUE (reference ``transposeWithDegree``, `transpose.hxx:79-134`, storing
    into `Graph.hxx:176-186`'s vertex-value slot).  The degree vector lands on
    the returned graph's ``values`` field; it is also returned alongside for
    convenience: ``(gT, out_degree_of_g)`` with ``gT.values is out_degree``."""
    deg = np.asarray(g.host().degrees).copy()
    return transpose(g).with_vertex_values(deg), deg


def subgraph(g: CSRGraph, ks) -> CSRGraph:
    """Induced subgraph over the vertex subset ``ks``: vertices remapped to
    [0, len(ks)) in ``ks`` order, keeping edges whose BOTH endpoints are in
    the subset.  Vertex values and edge weights flow through.

    Parity note: this covers the reference's subset CSR builders
    (``csrCreateDegreesW``/``csrCreateVertexValuesW``/``csrCreateEdgeKeysW``/
    ``csrCreateEdgeValuesW`` over a ``ks`` vector, `/root/reference/inc/
    csr.hxx:156-287`).  Those templates are dead code there (no driver calls
    them), and their edge-keys variant maps out-of-subset TARGETS to id 0 via
    ``unordered_map::operator[]`` default-insertion (`csr.hxx:244`) — a
    latent quirk, not a semantic anyone relies on; here the well-defined
    induced-subgraph contract (drop out-of-subset edges) replaces it.
    One vectorized pass: a membership/remap table + per-source repeat, no
    Python loops.
    """
    gh = g.host()
    ks = np.asarray(ks, dtype=np.int64)
    deg = np.asarray(gh.degrees, dtype=np.int64)
    offs = np.asarray(gh.offsets, dtype=np.int64)
    inds = np.asarray(gh.indices, dtype=np.int64)
    remap = np.full(g.n, -1, dtype=np.int64)
    remap[ks] = np.arange(ks.shape[0], dtype=np.int64)
    # expand the subset's adjacency rows (repeat + cumsum addressing)
    dk = deg[ks]
    base = np.repeat(offs[ks], dk)
    step = np.arange(int(dk.sum()), dtype=np.int64) \
        - np.repeat(np.cumsum(dk) - dk, dk)
    adr = base + step
    dst = inds[adr]
    src = np.repeat(remap[ks], dk)
    keep = remap[dst] >= 0
    w = None if gh.weights is None else np.asarray(gh.weights)[adr][keep]
    out = from_edges(src[keep], remap[dst[keep]], n=ks.shape[0], weights=w)
    if gh.values is not None:
        out = out.with_vertex_values(np.asarray(gh.values)[ks])
    return out


def duplicate(g: CSRGraph) -> CSRGraph:
    """Copy (reference `duplicate.hxx:98-101`). CSRGraph is immutable, so this is
    a cheap structural share; provided for API parity."""
    return CSRGraph(g.offsets, g.indices, g.degrees, g.weights, g.n, g.m,
                    values=g.values)


def duplicate_if(g: CSRGraph, pred) -> CSRGraph:
    """Filtered copy (reference ``duplicateIfOmpW``, `duplicate.hxx:17-72`).

    ``pred(src, dst) -> bool mask`` is evaluated vectorized on int64 arrays.
    """
    src, dst = edge_list(g)
    keep = np.asarray(pred(src, dst), dtype=bool)
    w = None if g.weights is None else np.asarray(g.host().weights[: g.m])[keep]
    return from_edges(src[keep], dst[keep], n=g.n, weights=w)
