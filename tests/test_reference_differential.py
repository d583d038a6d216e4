"""Differential validation against the COMPILED reference implementation.

Every other correctness test rests on the repo's own NumPy oracle; this one
runs the reference's actual ``predictLinks*Omp`` code (built from
`/root/reference/inc` via the thin ``tests/ref_driver.cxx`` — headers are
included with ``-I``, nothing is copied) on shared ``.mtx`` inputs and
compares per-pair scores, pair sets, and precision/recall rows.  The
reference's own ``main.cxx`` sweep is not reproducible (``random_device``
seed, `main.cxx:191-199`), so the shared input is the PRE-REDUCED graph:
the Python side generates the graph + deletion batch with a fixed seed,
applies the batch, writes the result as MTX, and both engines score it.

Skips when ``g++``/OpenMP or the reference tree is unavailable.
"""
import os
import shutil
import subprocess

import numpy as np
import pytest

from conftest import powerlaw_graph, random_graph

from linkpred_tpu import PredictOptions, predict_links
from linkpred_tpu.io.mtx import write_mtx
from linkpred_tpu.ops.batch import (apply_batch, generate_edge_deletions,
                                    tidy_batch)

REF = os.environ.get("LINKPRED_REF", "/root/reference")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ref_driver metric tokens -> our metric names
METRIC_TOKENS = {
    "cn": "common_neighbors",
    "jaccard": "jaccard_coefficient",
    "sorensen": "sorensen_index",
    "salton": "salton_cosine_similarity",
    "hpi": "hub_promoted",
    "hdi": "hub_depressed",
    "lhn": "leicht_holme_nerman",
    "aa": "adamic_adar",
    "ra": "resource_allocation",
}


@pytest.fixture(scope="module")
def ref_driver(tmp_path_factory):
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    if not os.path.isdir(os.path.join(REF, "inc")):
        pytest.skip(f"reference tree not found at {REF}")
    out = tmp_path_factory.mktemp("refbin") / "ref_driver"
    r = subprocess.run(
        ["g++", "-std=c++17", "-O1", "-fopenmp", f"-I{REF}",
         os.path.join(REPO, "tests", "ref_driver.cxx"), "-o", str(out)],
        capture_output=True, text=True, timeout=600)
    if r.returncode != 0:
        pytest.fail("reference driver failed to compile:\n" + r.stderr[-3000:])
    return str(out)


def ref_predict(driver, mtx_path, n, metric_token, mindeg1, max_edges):
    """Run the reference implementation; returns {(u, v): score}, 0-indexed,
    u < v (the reference emits 1-indexed pairs).

    Takes the longest VALID PREFIX of the output: the reference's k-way merge
    seeds its heap with T default-constructed entries (`predict.hxx:424`
    ``vector<tuple<int, W>> heap(T)``), so once the real predictions drain it
    pops from empty per-thread lists (UB) and emits garbage — which only
    happens when ``maxEdges`` exceeds the true prediction count, a regime the
    reference's own driver never enters (`main.cxx:50` caps maxEdges at the
    batch size).  All real predictions precede the garbage (the bogus heap
    keys are 0, below every real score), and garbage rows fail the id-range /
    positive-score sanity checks."""
    r = subprocess.run(
        [driver, mtx_path, "1", metric_token, str(mindeg1), str(max_edges)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    out = {}
    for line in r.stdout.splitlines():
        us, vs, ss = line.split()
        u, v, s = int(us), int(vs), float(ss)
        if not (1 <= u <= n and 1 <= v <= n and u != v
                and np.isfinite(s) and s > 0):
            break
        u, v = u - 1, v - 1
        out[(min(u, v), max(u, v))] = s
    return out


def our_rows(res):
    return {(min(int(u), int(v)), max(int(u), int(v))): float(s)
            for u, v, s in zip(res.u, res.v, res.score)}


def reduced_graph(rng, g, fraction):
    dele = generate_edge_deletions(rng, g, int(fraction * g.size / 2),
                                   undirected=True)
    dele, ins = tidy_batch(dele, np.empty((0, 2), np.int64), g)
    return apply_batch(g, dele, ins), dele


@pytest.mark.parametrize("metric_token,mindeg1", [
    ("jaccard", 0), ("jaccard", 4), ("cn", 0), ("aa", 4), ("ra", 0),
    ("sorensen", 4), ("salton", 0), ("hpi", 4), ("hdi", 0), ("lhn", 4),
])
def test_per_pair_scores_match_reference(ref_driver, tmp_path, rng,
                                         metric_token, mindeg1):
    # FULL-set comparison.  maxEdges is set to OUR prediction count: if the
    # reference has more predictions it returns a different top set (set
    # mismatch below); if fewer, its merge runs past the real entries and the
    # valid prefix comes up short (length mismatch) — both directions of a
    # count disagreement fail loudly.  maxEdges beyond the true count is
    # unusable: the reference merge then pops empty per-thread lists (UB,
    # observed SIGSEGV) — see ref_predict's docstring.
    g = random_graph(rng, n=200, avg_deg=5)
    y, _ = reduced_graph(rng, g, 0.1)
    mtx = str(tmp_path / "y.mtx")
    write_mtx(y, mtx)
    res = predict_links(y, metric=METRIC_TOKENS[metric_token],
                        min_degree1=mindeg1,
                        options=PredictOptions(max_edges=10_000_000), cap=4096)
    ours = our_rows(res)
    assert ours, "empty comparison would be vacuous"
    theirs = ref_predict(ref_driver, mtx, y.n, metric_token, mindeg1,
                         len(ours))
    assert len(theirs) == len(ours)
    assert set(ours) == set(theirs)
    for kk, s in ours.items():
        assert np.isclose(s, theirs[kk], rtol=2e-4), (kk, s, theirs[kk])


def test_precision_recall_rows_match_reference(ref_driver, tmp_path, rng):
    # the reference protocol (main.cxx:191-221): predict |deletions| edges,
    # precision = |common|/|predicted|, recall = |common|/|deleted|.
    # Tie-breaking at the k-th score is arbitrary on both sides (their heap,
    # our sort), so pairs strictly above the boundary must match exactly and
    # the boundary tie mass bounds the precision difference.
    g = powerlaw_graph(rng, n=300, m=2400)
    for fraction in (0.01, 0.1):
        y, dele = reduced_graph(rng, g, fraction)
        k = max(len(dele), 1)
        mtx = str(tmp_path / f"y{fraction}.mtx")
        write_mtx(y, mtx)
        res = predict_links(y, metric="jaccard_coefficient", min_degree1=4,
                            options=PredictOptions(max_edges=k), cap=4096)
        ours = our_rows(res)
        # when fewer than k predictions exist, clamp the reference's maxEdges
        # to the true count — beyond it its merge is UB (see ref_predict)
        theirs = ref_predict(ref_driver, mtx, y.n, "jaccard", 4,
                             max(min(k, len(ours)), 1))
        assert len(ours) == len(theirs)
        if not ours:
            continue
        o_scores = np.sort(np.fromiter(ours.values(), float))[::-1]
        t_scores = np.sort(np.fromiter(theirs.values(), float))[::-1]
        np.testing.assert_allclose(o_scores, t_scores, rtol=2e-4)
        boundary = o_scores[-1]
        above_o = {p for p, s in ours.items() if s > boundary * (1 + 1e-5)}
        above_t = {p for p, s in theirs.items() if s > boundary * (1 + 1e-5)}
        assert above_o == above_t
        # precision/recall row parity up to the boundary tie mass
        deleted = {(min(int(a), int(b)), max(int(a), int(b))) for a, b in dele}
        common_o = len(deleted & set(ours))
        common_t = len(deleted & set(theirs))
        ties = len(ours) - len(above_o)
        assert abs(common_o - common_t) <= ties


@pytest.mark.parametrize("key64", [True, False])
def test_full_engine_scale_matches_reference(ref_driver, tmp_path, rng,
                                             monkeypatch, key64):
    """Round-4 verdict #5: a differential run at a scale where the ENGINE'S
    FULL machinery engages at once against the compiled reference — not a toy
    fixture.  The constructed graph forces, in ONE predict pass:

    * a degree-regime SIDE PLAN (``plan.side_plan``): a candidate-side hub
      with deg >= 2^16 routes ~130k slots through the wide 4-operand side
      stream while the main stream keeps the deg16 packed-pair sort;
    * a device HUGE-HUB SUB-PLAN (``plan.huge_plan``): a source-side hub
      whose expansion exceeds the tile cap gets its own giant-cap sub-pass
      (riding the wide fused tail — its pairs are all hi-regime);
    * MULTI-SEGMENT deferred selection (>= 2 segments): SEG_LANES is pinned
      below the scan's lane count so the hierarchical segment merge runs;
    * the PACKED threshold selection (second run, k=10k with
      LINKPRED_SEL_PACK_MIN lowered): the top-k run statically dispatches
      through `_argselect_packed` inside the full engine.

    Reference hot loop being raced: /root/reference/inc/predict.hxx:284-339
    (dense scratch + per-thread heaps); merge: predict.hxx:409-467.
    """
    from linkpred_tpu import from_edges
    from linkpred_tpu.predict import scoring as scoring_mod
    from linkpred_tpu.predict import plan as plan_mod
    from linkpred_tpu.predict.api import predict_links_multi
    from linkpred_tpu.predict.plan import build_plan

    NB, NS = 50_000, 66_000            # base block, satellites (hub deg > 2^16)
    n = 1 + NB + NS + 1
    H_SRC, H_CAND = 0, n - 1           # source-side hub, candidate-side hub
    base = 1 + rng.integers(0, NB, size=(4 * NB, 2))
    base = base[base[:, 0] != base[:, 1]]
    keys = np.unique(base.min(1).astype(np.int64) * n + base.max(1))
    bu, bv = keys // n, keys % n
    sats = 1 + NB + np.arange(NS, dtype=np.int64)
    # Probe vertices: base ids adjacent to a satellite but NOT to H_CAND, so
    # their (probe, H_CAND) second-order candidates are LIVE hi-regime slots
    # in the MAIN stream (satellite sources' H_CAND candidates are all dead —
    # every satellite is itself adjacent to H_CAND).
    NPROBE = 20_000
    probes = 1 + np.arange(NPROBE, dtype=np.int64)
    pairs_u = np.concatenate([bu, np.full(NS, H_SRC), sats,
                              sats[0::2], probes])
    pairs_v = np.concatenate([bv, sats, np.full(NS, H_CAND),
                              sats[1::2], sats[:NPROBE]])
    g = from_edges(np.concatenate([pairs_u, pairs_v]),
                   np.concatenate([pairs_v, pairs_u]), n=n)
    assert int(np.asarray(g.degrees).max()) >= (1 << 16)

    cap = 1 << 16
    monkeypatch.setattr(plan_mod, "HUGE_DEVICE_MAX", 1 << 20)
    monkeypatch.setattr(scoring_mod, "SEG_LANES", 1 << 19)
    scoring_mod.score_tiles.clear_cache()
    try:
        plan = build_plan(g, 64, cap=cap)
        # --- the whole machinery is engaged, not just present ---------------
        assert plan.packed and plan.deg16, "main stream: packed deg16"
        assert plan.side_plan is not None and not plan.side_plan.deg16
        assert plan.side_plan.total_slots > 10_000
        assert plan.huge_plan is not None and plan.huge_src.size
        assert plan.host_src.size == 0, "hub must run on DEVICE"
        seg_lanes = max(cap, (1 << 19) * 12 // 12)
        assert plan.num_tiles_padded * cap > 2 * seg_lanes, ">=2 segments"

        mtx = str(tmp_path / "engine_scale.mtx")
        write_mtx(g, mtx)

        # --- run 1: FULL prediction set, per-pair score parity --------------
        res = predict_links_multi(
            g, ("jaccard_coefficient", "adamic_adar"), min_degree1=64,
            options=PredictOptions(max_edges=10_000_000), plan=plan,
            key64=key64)
        for token, name in (("jaccard", "jaccard_coefficient"),
                            ("aa", "adamic_adar")):
            ours = our_rows(res[name])
            assert len(ours) > 50_000, "scale premise: a real prediction set"
            theirs = ref_predict(ref_driver, mtx, n, token, 64, len(ours))
            assert len(theirs) == len(ours)
            assert set(ours) == set(theirs)
            ok = np.fromiter((ours[p] for p in ours), float, len(ours))
            tk = np.fromiter((theirs[p] for p in ours), float, len(ours))
            np.testing.assert_allclose(ok, tk, rtol=2e-4)
            # the huge hub's pair is in the set and correct
            hub_pairs = [p for p in ours if H_SRC in p]
            assert hub_pairs, "the huge-hub source produced its prediction"

        # --- run 2: top-k with the PACKED threshold selection engaged -------
        k = 10_000
        monkeypatch.setenv("LINKPRED_SEL_PACK_MIN", str(1 << 18))
        scoring_mod.score_tiles.clear_cache()
        from linkpred_tpu.ops.compact import PACK_RATIO
        kk = min(k, 8 * cap)
        assert 8 * cap >= (1 << 18) and kk * 4 <= (8 * cap) // PACK_RATIO, \
            "premise: _argselect statically dispatches to the packed path"
        res_k = predict_links_multi(
            g, ("jaccard_coefficient",), min_degree1=64,
            options=PredictOptions(max_edges=k), plan=plan, key64=key64)
        ours_k = our_rows(res_k["jaccard_coefficient"])
        theirs_k = ref_predict(ref_driver, mtx, n, "jaccard", 64,
                               max(min(k, len(ours_k)), 1))
        assert len(ours_k) == len(theirs_k) == k
        o_scores = np.sort(np.fromiter(ours_k.values(), float))[::-1]
        t_scores = np.sort(np.fromiter(theirs_k.values(), float))[::-1]
        np.testing.assert_allclose(o_scores, t_scores, rtol=2e-4)
        boundary = o_scores[-1]
        above_o = {p for p, s in ours_k.items() if s > boundary * (1 + 1e-5)}
        above_t = {p for p, s in theirs_k.items() if s > boundary * (1 + 1e-5)}
        assert above_o == above_t
    finally:
        scoring_mod.score_tiles.clear_cache()


def test_mega_degree_split_matches_reference(ref_driver, tmp_path):
    # external check of the degree-regime side plan: a hub with deg >= 2^16
    # (pairs routed through the 4-operand side stream) must score identically
    # in the reference's dense-scratch implementation
    k = 66000
    n_ring = 10
    ring = np.arange(n_ring, dtype=np.int64)
    ring_e = np.stack([ring, (ring + 1) % n_ring], axis=1)
    sat = n_ring + np.arange(k, dtype=np.int64)
    con = n_ring + k + np.arange(k, dtype=np.int64)
    hub = n_ring + 2 * k
    e = np.concatenate([ring_e, np.stack([sat, con], axis=1),
                        np.stack([con, np.full(k, hub)], axis=1)])
    src = np.concatenate([e[:, 0], e[:, 1]])
    dst = np.concatenate([e[:, 1], e[:, 0]])
    from linkpred_tpu import from_edges
    from linkpred_tpu.predict.plan import build_plan

    g = from_edges(src, dst, n=hub + 1)
    plan = build_plan(g, 2, cap=1 << 16)
    assert plan.side_plan is not None and plan.deg16
    mtx = str(tmp_path / "hub.mtx")
    write_mtx(g, mtx)
    res = predict_links(g, metric="jaccard_coefficient", min_degree1=2,
                        options=PredictOptions(max_edges=10_000_000),
                        plan=plan)
    ours = our_rows(res)
    theirs = ref_predict(ref_driver, mtx, g.n, "jaccard", 2, len(ours))
    assert len(theirs) == len(ours)
    assert set(ours) == set(theirs)
    for kk, s in ours.items():
        assert np.isclose(s, theirs[kk], rtol=2e-4)
