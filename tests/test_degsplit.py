"""Degree-regime split (``TilePlan.side_plan``) + mesh sub-plan sharding.

A single vertex with degree >= 2^16 used to force the ENTIRE packed slot
stream onto the 4-operand sort (global ``deg16`` off).  The plan now routes
only the slots whose (u, w) pair touches such a vertex to a small 4-operand
side plan; the main stream keeps the degree-pair 3-operand packing.  These
tests pin the routing, exactness vs the unsplit engine / host scorer /
closed-form scores, and that sub-plans (side + hub) ride the sharded path
under a mesh (reference keeps every source in its one parallel loop,
`predict.hxx:287-288`).
"""
import numpy as np
import pytest

from conftest import powerlaw_graph

from linkpred_tpu import PredictOptions, from_edges, predict_links
from linkpred_tpu.predict.plan import build_plan

N_RING = 10
N_PAIRS = 32800  # hub degree = 2 * N_PAIRS = 65600 >= 2^16


@pytest.fixture(scope="module")
def hubg():
    """One mega-degree hub (deg 65600, the LAST vertex id) reached through
    degree-2 connector mids from degree-1 satellites, plus a small ring
    community.  Every (satellite, hub) pair shares exactly its connector as a
    common neighbor and the satellite is NOT adjacent to the hub, so the pair
    is live hi-regime work; the ring pairs are lo-regime.  The hub itself has
    no expansion (max id -> the w > u prefilter empties it) and min_degree1=2
    keeps connectors/ring vertices valid mids while skipping the hub."""
    k = 2 * N_PAIRS
    ring = np.arange(N_RING, dtype=np.int64)
    ring_edges = np.stack([ring, (ring + 1) % N_RING], axis=1)
    sat = N_RING + np.arange(k, dtype=np.int64)
    con = N_RING + k + np.arange(k, dtype=np.int64)
    hub = N_RING + 2 * k
    sat_edges = np.stack([sat, con], axis=1)
    hub_edges = np.stack([con, np.full(k, hub)], axis=1)
    e = np.concatenate([ring_edges, sat_edges, hub_edges])
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    return from_edges(src, dst, n=hub + 1)


def _rows(res):
    return {(int(u), int(v)): float(s)
            for u, v, s in zip(res.u, res.v, res.score)}


def test_split_routing(hubg):
    plan = build_plan(hubg, 2, cap=1 << 16)
    assert plan.packed
    assert plan.deg16, "main stream should regain the packed degree pair"
    assert plan.side_plan is not None
    assert not plan.side_plan.deg16 and plan.side_plan.packed
    # every satellite pair contributes exactly one (satellite, hub) slot
    assert plan.side_plan.total_slots == 2 * N_PAIRS
    # ring slots (w > u survivors) stay in the main stream
    assert 0 < plan.total_slots <= N_RING
    assert plan.huge_src.size == 0 and plan.host_src.size == 0


def test_split_exact_vs_unsplit_and_closed_form(hubg, monkeypatch):
    opts = PredictOptions(max_edges=100_000)
    res = predict_links(hubg, metric="jaccard_coefficient", min_degree1=2,
                        options=opts, cap=1 << 16)
    monkeypatch.setenv("LINKPRED_DEG_SPLIT", "0")
    plan_off = build_plan(hubg, 2, cap=1 << 16)
    assert plan_off.side_plan is None and not plan_off.deg16
    res_off = predict_links(hubg, metric="jaccard_coefficient", min_degree1=2,
                            options=opts, cap=1 << 16, plan=plan_off)
    got, want = _rows(res), _rows(res_off)
    assert got == want  # identical pair sets AND bit-identical f32 scores
    # closed form: (satellite, hub) via its connector mid ->
    # 1/(1 + 65600 - 1); ring (i, i+2) via mid i+1 -> 1/(2 + 2 - 1)
    hub = N_RING + 4 * N_PAIRS
    sat = N_RING  # first satellite
    assert np.isclose(got[(sat, hub)], 1.0 / (2 * N_PAIRS), rtol=1e-6)
    assert np.isclose(got[(0, 2)], 1.0 / 3.0, rtol=1e-6)
    # every live slot here is a distinct (u, w) pair (all counts are 1)
    assert len(got) == plan_off.total_slots


def test_split_weighted_metric_exact(hubg, monkeypatch):
    # AA exercises the slot_middeg payload through both sub-streams
    opts = PredictOptions(max_edges=100_000)
    res = predict_links(hubg, metric="adamic_adar", min_degree1=2,
                        options=opts, cap=1 << 16)
    monkeypatch.setenv("LINKPRED_DEG_SPLIT", "0")
    res_off = predict_links(hubg, metric="adamic_adar", min_degree1=2,
                            options=opts, cap=1 << 16)
    assert _rows(res) == _rows(res_off)
    # every mid has degree 2 -> score == 1/log(2)
    s = np.asarray(res.score)
    np.testing.assert_allclose(s, 1.0 / np.log(2.0), rtol=1e-5)


@pytest.fixture(scope="module")
def mesh8():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from linkpred_tpu.parallel.mesh import make_mesh

    return make_mesh(8)


def test_side_plan_sharded_matches_single_device(hubg, mesh8):
    opts = PredictOptions(max_edges=100_000)
    kwargs = dict(metric="jaccard_coefficient", min_degree1=2, options=opts,
                  cap=1 << 16)
    single = predict_links(hubg, **kwargs)
    sharded = predict_links(hubg, mesh=mesh8, **kwargs)
    assert _rows(single) == _rows(sharded)


def test_hub_subplan_sharded_matches_single_device(rng, mesh8):
    # power-law graph + small cap forces the hub sub-plan; under a mesh it
    # must ride the sharded path (and stay exact), not serialize on device 0
    g = powerlaw_graph(rng, n=300, m=2000)
    plan = build_plan(g, 0, cap=512)
    assert plan.huge_plan is not None
    kwargs = dict(metric="jaccard_coefficient", min_degree1=0,
                  options=PredictOptions(max_edges=100_000), cap=512)
    single = predict_links(g, **kwargs)
    sharded = predict_links(g, mesh=mesh8, **kwargs)
    assert _rows(single) == _rows(sharded)
