"""Tests for traversal, properties, scans, set ops, RNG, and debug utilities."""
import numpy as np
import pytest

from conftest import random_graph

from linkpred_tpu import from_edges
from linkpred_tpu.ops.properties import (
    communities,
    communities_disconnected,
    community_size,
    community_vertices,
    degrees,
    edge_weight,
    modularity,
    modularity_by,
    vertex_keys,
)
from linkpred_tpu.ops.scan import (
    count_value,
    exclusive_scan,
    inclusive_scan,
    l1_norm_delta,
    l2_norm,
    li_norm_delta,
    sum_values,
)
from linkpred_tpu.ops.setops import (
    non_adjacent_find,
    set_difference,
    set_intersection,
    set_union_last,
    unique_last,
)
from linkpred_tpu.ops.traverse import bfs_levels, bfs_visited, dfs_order, dfs_visited
from linkpred_tpu.utils.random import Xorshift32, xorshift32_step


def path_graph(k):
    src = np.arange(k - 1)
    return from_edges(np.concatenate([src, src + 1]),
                      np.concatenate([src + 1, src]), n=k)


def test_bfs_levels_path():
    g = path_graph(6)
    lv = bfs_levels(g, 0)
    np.testing.assert_array_equal(lv, [0, 1, 2, 3, 4, 5])


def test_bfs_levels_disconnected():
    g = from_edges(np.array([0, 1]), np.array([1, 0]), n=4)
    lv = bfs_levels(g, 0)
    assert lv[0] == 0 and lv[1] == 1 and lv[2] == -1 and lv[3] == -1


def test_bfs_visited_matches_levels(rng):
    g = random_graph(rng, n=60, avg_deg=3)
    vis = bfs_visited(g, 7)
    lv = bfs_levels(g, 7)
    np.testing.assert_array_equal(vis, lv >= 0)


def test_bfs_visit_order_callback():
    g = path_graph(4)
    seen = []
    bfs_visited(g, 0, fp=lambda v, d: seen.append((v, d)))
    assert seen == [(0, 0), (1, 1), (2, 2), (3, 3)]


def test_dfs_order_preorder():
    #   0 -> 1 -> 2,  0 -> 3
    g = from_edges(np.array([0, 1, 0]), np.array([1, 2, 3]), n=4)
    np.testing.assert_array_equal(dfs_order(g, 0), [0, 1, 2, 3])
    assert dfs_visited(g, 1).tolist() == [False, True, True, False]


def test_vertex_keys_degrees(rng):
    g = random_graph(rng, n=40, avg_deg=4)
    np.testing.assert_array_equal(vertex_keys(g), np.arange(40))
    np.testing.assert_array_equal(degrees(g), np.asarray(g.degrees))
    assert edge_weight(g) == g.m


def test_modularity_two_cliques():
    # two disjoint triangles: perfect 2-community split
    e = np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5]])
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    g = from_edges(src, dst, n=6)
    x = np.array([0, 0, 0, 1, 1, 1])
    q = modularity_by(g, x)
    assert q == pytest.approx(0.5, abs=1e-9)
    # singleton communities score lower
    assert modularity(g) < q


def test_community_helpers():
    x = np.array([0, 1, 0, 2, 1])
    assert community_size(x, 0) == 2
    np.testing.assert_array_equal(community_vertices(x, 1), [1, 4])
    np.testing.assert_array_equal(communities(x), [0, 1, 2])


def test_communities_disconnected():
    # community 0 = {0,1} connected; community 1 = {2,3} with no internal edge
    g = from_edges(np.array([0, 1, 2]), np.array([1, 0, 1]), n=4)
    x = np.array([0, 0, 1, 1])
    np.testing.assert_array_equal(communities_disconnected(g, x), [1])


def test_scans():
    import jax.numpy as jnp

    x = jnp.asarray([1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(inclusive_scan(x)), [1, 3, 6, 10])
    np.testing.assert_array_equal(np.asarray(exclusive_scan(x)), [0, 1, 3, 6])
    assert int(sum_values(x)) == 10
    assert int(count_value(x, 3)) == 1
    assert float(l2_norm(jnp.asarray([3.0, 4.0]))) == pytest.approx(5.0)
    assert float(l1_norm_delta(jnp.asarray([1.0, 2.0]), jnp.asarray([0.0, 0.0]))) == 3.0
    assert float(li_norm_delta(jnp.asarray([1.0, -5.0]), jnp.asarray([0.0, 0.0]))) == 5.0


def test_set_union_last_wins():
    k, v = set_union_last([1, 3, 5], [3, 4], [10, 30, 50], [33, 44])
    np.testing.assert_array_equal(k, [1, 3, 4, 5])
    np.testing.assert_array_equal(v, [10, 33, 44, 50])


def test_set_difference_and_intersection():
    k, v = set_difference([1, 2, 3, 4], [2, 4], [1, 2, 3, 4])
    np.testing.assert_array_equal(k, [1, 3])
    np.testing.assert_array_equal(v, [1, 3])
    np.testing.assert_array_equal(set_intersection([1, 2, 3], [2, 3, 9]), [2, 3])


def test_unique_last():
    k, v = unique_last([1, 1, 2, 3, 3], [9, 8, 7, 6, 5])
    np.testing.assert_array_equal(k, [1, 2, 3])
    np.testing.assert_array_equal(v, [8, 7, 5])


def test_non_adjacent_find():
    assert non_adjacent_find([5, 5, 5]) == 3
    assert non_adjacent_find([5, 5, 7]) == 1
    assert non_adjacent_find([1]) == 1


def test_xorshift32_reference_sequence():
    # first values of xorshift32 with seed 1 (Marsaglia 2003)
    rng = Xorshift32(1)
    assert rng() == 270369
    assert rng() == 67634689
    # vectorized step matches the scalar engine lane-wise
    import jax.numpy as jnp

    s = xorshift32_step(jnp.asarray([1, 2], dtype=jnp.uint32))
    r1, r2 = Xorshift32(1), Xorshift32(2)
    np.testing.assert_array_equal(np.asarray(s), [r1(), r2()])


def test_debug_assert_modes():
    from linkpred_tpu.utils.debug import (
        ASSERT, BUILD_ERROR, BUILD_RELEASE, build_mode, set_build_mode)

    old = build_mode()
    try:
        set_build_mode(BUILD_RELEASE)
        ASSERT(False, "compiled out")  # no-op in release
        set_build_mode(BUILD_ERROR)
        with pytest.raises(AssertionError):
            ASSERT(False, "active")
    finally:
        set_build_mode(old)


def test_vector_ops():
    import jax.numpy as jnp

    from linkpred_tpu.ops.vector import (
        add_value, copy_values, fill_value, gather_values, multiply_value,
        multiply_values, scatter_or, scatter_values, value_indices)

    x = jnp.asarray([10, 20, 30, 40])
    ids = jnp.asarray([2, 0])
    np.testing.assert_array_equal(np.asarray(gather_values(x, ids)), [30, 10])
    np.testing.assert_array_equal(
        np.asarray(scatter_values(x, ids, jnp.asarray([7, 8]))), [8, 20, 7, 40])
    b = jnp.asarray([False, True, False])
    np.testing.assert_array_equal(
        np.asarray(scatter_or(b, jnp.asarray([0, 2]), jnp.asarray([True, False]))),
        [True, True, False])
    np.testing.assert_array_equal(
        np.asarray(value_indices(jnp.asarray([2, 0, 1]), 3)), [1, 2, 0])
    np.testing.assert_array_equal(np.asarray(fill_value(x, 5)), [5, 5, 5, 5])
    np.testing.assert_array_equal(np.asarray(fill_value(x, 5, ids)), [5, 20, 5, 40])
    np.testing.assert_array_equal(np.asarray(add_value(x, 1, ids)), [11, 20, 31, 40])
    np.testing.assert_array_equal(np.asarray(copy_values(x)), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(multiply_value(x, 2)), [20, 40, 60, 80])
    np.testing.assert_array_equal(
        np.asarray(multiply_values(x, jnp.asarray([1, 0, 1, 0]))), [10, 0, 30, 0])


# ---------------------------------------------------------------------------
# prime helpers (_cmath.hxx:100-146 parity) + subset CSR builder (csr.hxx
# :156-287 — induced-subgraph contract, see ops.transform.subgraph docstring)
# ---------------------------------------------------------------------------

def test_prime_helpers():
    from linkpred_tpu.utils.numeric import is_prime, next_prime, random_prime

    primes = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47}
    for x in range(50):
        assert is_prime(x) == (x in primes), x
    assert is_prime(7919) and not is_prime(7917)
    assert next_prime(1) == 2 and next_prime(13) == 17
    assert next_prime(7907) == 7919
    rng = np.random.default_rng(0)
    p = random_prime(100, 200, rng)
    assert 100 <= p <= 200 and is_prime(p)
    # bounded-attempts contract: a prime-free range returns end + 1
    assert random_prime(24, 28, rng) == 29


def test_subgraph_induced(rng):
    from linkpred_tpu.ops.transform import subgraph

    g = random_graph(rng, 60, 5)
    g = g.with_vertex_values(np.arange(g.n, dtype=np.float32) * 2.0)
    ks = np.sort(rng.choice(g.n, size=25, replace=False))
    s = subgraph(g, ks)
    assert s.n == 25
    # degrees/values remap in ks order
    np.testing.assert_array_equal(np.asarray(s.values),
                                  np.asarray(g.values)[ks])
    # edge set == edges of g with both endpoints in ks, remapped
    remap = {int(v): i for i, v in enumerate(ks)}
    from linkpred_tpu.graph import edge_list
    want = {(remap[int(u)], remap[int(v)])
            for u, v in zip(*edge_list(g))
            if int(u) in remap and int(v) in remap}
    got = set(zip(*(np.asarray(a) for a in edge_list(s))))
    assert {(int(a), int(b)) for a, b in got} == want


def test_subgraph_weights(rng):
    from linkpred_tpu.graph import edge_list
    from linkpred_tpu.ops.transform import subgraph

    src = np.array([0, 1, 2, 3, 0])
    dst = np.array([1, 2, 3, 0, 2])
    w = np.array([10., 20., 30., 40., 50.], dtype=np.float32)
    g = from_edges(src, dst, n=4, weights=w)
    s = subgraph(g, [0, 2, 3])
    es, ed = edge_list(s)
    pairs = {(int(a), int(b)): float(np.asarray(s.weights)[i])
             for i, (a, b) in enumerate(zip(es, ed))}
    # kept: 2->3 (30), 3->0 (40), 0->2 (50); dropped: 0->1, 1->2
    assert pairs == {(1, 2): 30.0, (2, 0): 40.0, (0, 1): 50.0}
