"""Graph container, MTX I/O, and transform tests (oracle: NumPy/dense)."""
import io

import numpy as np

from conftest import random_graph

from linkpred_tpu import from_edges, from_dense, to_dense, edge_list, read_mtx, write_mtx
from linkpred_tpu.io.mtx import read_mtx_header
from linkpred_tpu.ops.transform import (
    add_self_loops, count_self_loops, duplicate, remove_self_loops, symmetrize,
    transpose,
)


def test_from_edges_sorted_dedup():
    g = from_edges([2, 0, 0, 1, 0], [1, 2, 1, 0, 1], n=3)
    assert g.n == 3 and g.m == 4  # (0,1) deduplicated
    assert g.neighbors(0).tolist() == [1, 2]
    assert g.degree(0) == 2 and g.degree(1) == 1 and g.degree(2) == 1
    assert g.has_edge(0, 1) and not g.has_edge(1, 2)


def test_dense_roundtrip(rng):
    a = rng.random((40, 40)) < 0.1
    g = from_dense(a)
    np.testing.assert_array_equal(to_dense(g), a)


def test_indices_padding_sentinel():
    g = from_edges([0], [1], n=5)
    idx = np.asarray(g.indices)
    assert idx.shape[0] % 128 == 0
    assert (idx[g.m:] == g.n).all()


def test_symmetrize_and_self_loops(rng):
    a = rng.random((30, 30)) < 0.15
    g = from_dense(a)
    gs = symmetrize(g)
    np.testing.assert_array_equal(to_dense(gs), a | a.T)
    gl = remove_self_loops(gs)
    expect = (a | a.T) & ~np.eye(30, dtype=bool)
    np.testing.assert_array_equal(to_dense(gl), expect)
    assert count_self_loops(gl) == 0
    assert count_self_loops(add_self_loops(gl)) == 30


def test_transpose(rng):
    a = rng.random((25, 25)) < 0.2
    g = from_dense(a)
    np.testing.assert_array_equal(to_dense(transpose(g)), a.T)


def test_duplicate_shares_structure(rng):
    g = random_graph(rng, 20, 3)
    d = duplicate(g)
    assert d.n == g.n and d.m == g.m
    np.testing.assert_array_equal(np.asarray(d.indices), np.asarray(g.indices))


MTX_GENERAL = """%%MatrixMarket matrix coordinate pattern general
% a comment
4 4 5
1 2
2 1
1 3
3 4
4 4
"""

MTX_SYMMETRIC = """%%MatrixMarket matrix coordinate real symmetric
3 3 3
2 1 1.5
3 1 2.0
3 2 0.5
"""


def test_read_mtx_general():
    g = read_mtx(io.StringIO(MTX_GENERAL))
    assert g.n == 4 and g.m == 5
    assert g.has_edge(0, 1) and g.has_edge(1, 0) and g.has_edge(2, 3)
    assert g.has_edge(3, 3)  # self loop kept at read (main.cxx removes later)


def test_read_mtx_symmetric_adds_reverse():
    g = read_mtx(io.StringIO(MTX_SYMMETRIC))
    assert g.m == 6
    assert g.has_edge(0, 1) and g.has_edge(1, 0)


def test_read_mtx_weighted():
    g = read_mtx(io.StringIO(MTX_SYMMETRIC), weighted=True)
    w = np.asarray(g.weights[: g.m])
    assert w.shape[0] == 6 and set(np.round(w, 2)) == {1.5, 2.0, 0.5}


def test_read_mtx_transform_flags():
    g = read_mtx(io.StringIO(MTX_GENERAL), symmetrize=True, remove_self_loops=True)
    assert not g.has_edge(3, 3)
    assert g.has_edge(3, 2)  # reverse of 3->4 line


def test_read_mtx_header():
    h = read_mtx_header(io.StringIO(MTX_SYMMETRIC))
    assert h.symmetric and h.rows == 3 and h.size == 3


def test_mtx_roundtrip(rng):
    g = random_graph(rng, 30, 4)
    buf = io.StringIO()
    write_mtx(g, buf)
    g2 = read_mtx(io.StringIO(buf.getvalue()))
    np.testing.assert_array_equal(to_dense(g2), to_dense(g))


def test_edge_list_roundtrip(rng):
    g = random_graph(rng, 25, 3)
    src, dst = edge_list(g)
    g2 = from_edges(src, dst, n=g.n)
    np.testing.assert_array_equal(to_dense(g2), to_dense(g))


def test_graph_pytree_jit(rng):
    import jax

    g = random_graph(rng, 16, 3).device()

    @jax.jit
    def total_degree(gr):
        return gr.degrees.sum()

    assert int(total_degree(g)) == g.m


def test_npz_roundtrip(rng, tmp_path):
    from conftest import random_graph

    from linkpred_tpu.io.npz import load_graph, save_graph

    g = random_graph(rng, n=60, avg_deg=4)
    p = tmp_path / "g.npz"
    save_graph(g, p)
    h = load_graph(p)
    assert (g.n, g.m) == (h.n, h.m)
    np.testing.assert_array_equal(np.asarray(g.offsets), np.asarray(h.offsets))
    np.testing.assert_array_equal(np.asarray(g.indices), np.asarray(h.indices))


def test_graph_builder_lazy_update():
    from linkpred_tpu.graph import GraphBuilder

    b = GraphBuilder()
    g = (b.add_edge(0, 1).add_edge(1, 2).add_edge(0, 1)  # dup collapses
         .update())
    assert g.n == 3 and g.m == 2
    assert g.has_edge(0, 1) and g.has_edge(1, 2)

    b2 = GraphBuilder(base=g)
    g2 = b2.remove_edge(0, 1).add_edge(2, 0).update()
    assert not g2.has_edge(0, 1)
    assert g2.has_edge(2, 0) and g2.m == 2

    g3 = GraphBuilder(base=g2).respan(10).update()
    assert g3.n == 10 and g3.m == 2


def test_profiling_summarize(tmp_path):
    import gzip
    import json

    from linkpred_tpu.utils.profiling import summarize_trace

    d = tmp_path / "plugins" / "profile" / "x"
    d.mkdir(parents=True)
    events = {"traceEvents": [
        {"ph": "X", "name": "sort.1", "dur": 5000},
        {"ph": "X", "name": "sort.1", "dur": 3000},
        {"ph": "X", "name": "fusion", "dur": 1000},
        {"ph": "M", "name": "meta", "dur": 99999},
    ]}
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(events, f)
    top = summarize_trace(str(tmp_path))
    assert top[0] == ("sort.1", 8.0)
    assert top[1] == ("fusion", 1.0)


def _weight_of(g, u, v):
    g = g.host()
    off = int(np.asarray(g.offsets)[u])
    row = np.asarray(g.indices[off: off + int(np.asarray(g.degrees)[u])])
    pos = np.searchsorted(row, v)
    assert pos < row.shape[0] and row[pos] == v, f"edge ({u},{v}) missing"
    return float(np.asarray(g.weights)[off + pos])


def test_from_edges_duplicate_weight_last_wins():
    # the reference's bitset commit merges pending insertions with
    # set_union_last_inplace (_bitset.hxx:258): later addEdge replaces value
    g = from_edges([0, 0, 1], [1, 1, 2], n=3, weights=[2.5, 7.0, 1.0])
    assert g.m == 2
    assert _weight_of(g, 0, 1) == 7.0


def test_graph_builder_weighted_update_roundtrip():
    from linkpred_tpu.graph import GraphBuilder

    base = from_edges([0, 1, 1, 2], [1, 0, 2, 1], n=4,
                      weights=[3.0, 3.0, 5.0, 5.0])
    b = GraphBuilder(base)
    b.remove_edge(1, 2).remove_edge(2, 1)
    b.add_edge(2, 3, 9.0).add_edge(3, 2, 9.0)
    b.add_edge(0, 1, 4.5)  # re-add existing pair: value replaced (union-last)
    g = b.update()
    assert g.weights is not None
    assert _weight_of(g, 0, 1) == 4.5       # replaced
    assert _weight_of(g, 1, 0) == 3.0       # untouched survivor
    assert _weight_of(g, 2, 3) == 9.0       # insertion
    assert not g.has_edge(1, 2)
    # a second update cycle keeps flowing values through the rebuild
    g2 = GraphBuilder(g).add_edge(1, 2, 6.0).update()
    assert _weight_of(g2, 1, 2) == 6.0 and _weight_of(g2, 0, 1) == 4.5


def test_apply_batch_preserves_weights():
    from linkpred_tpu.ops.batch import apply_batch

    g = from_edges([0, 1, 1, 2, 2, 3], [1, 0, 2, 1, 3, 2], n=5,
                   weights=[1.5, 1.5, 2.5, 2.5, 3.5, 3.5])
    deletions = np.array([[2, 3], [3, 2]], dtype=np.int64)
    insertions = np.array([[3, 4], [4, 3], [0, 1]], dtype=np.int64)
    y = apply_batch(g, deletions, insertions,
                    insertion_weights=np.array([8.0, 8.0, 0.25]))
    assert y.weights is not None
    assert not y.has_edge(2, 3)
    assert _weight_of(y, 1, 2) == 2.5        # survivor keeps its value
    assert _weight_of(y, 3, 4) == 8.0        # insertion takes its value
    assert _weight_of(y, 0, 1) == 0.25       # re-insert replaces (union-last)
    # unweighted graphs stay unweighted through a default batch cycle
    gu = from_edges([0, 1], [1, 0], n=3)
    yu = apply_batch(gu, np.empty((0, 2), np.int64),
                     np.array([[1, 2], [2, 1]], dtype=np.int64))
    assert yu.weights is None


def test_vertex_values(rng):
    """Per-vertex value slot (reference Graph.hxx:176-186
    vertexValue/setVertexValue) — functional here (VERDICT r3 item 7)."""
    from linkpred_tpu import GraphBuilder, from_edges
    from linkpred_tpu.io.npz import load_graph, save_graph
    from linkpred_tpu.ops.transform import duplicate, transpose_with_degree

    g = random_graph(rng, n=30, avg_deg=3)
    assert g.values is None and g.vertex_value(0) is None

    vals = np.arange(30, dtype=np.int32) * 10
    gv = g.with_vertex_values(vals)
    assert gv.vertex_value(3) == 30
    assert g.values is None  # functional: the original is untouched
    np.testing.assert_array_equal(np.asarray(gv.device().values), vals)
    np.testing.assert_array_equal(duplicate(gv).values, vals)

    # transposeWithDegree stores the pre-transpose out-degree AS the vertex
    # value (transpose.hxx:79-134)
    gt, deg = transpose_with_degree(g)
    np.testing.assert_array_equal(np.asarray(gt.values), deg)
    np.testing.assert_array_equal(deg, np.asarray(g.degrees))

    # values survive builder updates; respan extends with V() == 0
    b = GraphBuilder(gv)
    b.add_edge(31, 2)
    g2 = b.update()
    assert g2.n == 32
    np.testing.assert_array_equal(np.asarray(g2.values)[:30], vals)
    assert int(np.asarray(g2.values)[31]) == 0

    # persistence round-trip (io/npz.py)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        p = d + "/g.npz"
        save_graph(gv, p)
        back = load_graph(p)
        np.testing.assert_array_equal(np.asarray(back.values), vals)

    # builders accept vertex values directly
    g3 = from_edges(np.array([0, 1]), np.array([1, 2]), n=3,
                    vertex_values=np.array([5.0, 6.0, 7.0]))
    assert float(g3.vertex_value(2)) == 7.0
