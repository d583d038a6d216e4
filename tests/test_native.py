"""Native C++ MTX parser: build, parse, and parity with the NumPy path."""
import io

import numpy as np
import pytest

from conftest import random_graph

from linkpred_tpu import read_mtx, to_dense, write_mtx
from linkpred_tpu.io.native import native_lib, parse_mtx_body


@pytest.fixture(scope="module")
def lib():
    lib = native_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


def test_detect_cols(lib):
    assert lib.lp_mtx_detect_cols(b"1 2\n3 4\n", 8) == 2
    assert lib.lp_mtx_detect_cols(b"% comment\n1 2 3.5\n", 18) == 3
    assert lib.lp_mtx_detect_cols(b"", 0) == 0


def test_parse_body_pattern(lib):
    src, dst, w = parse_mtx_body(b"1 2\n2 3\n% mid comment\n3 1\n", 10, False)
    np.testing.assert_array_equal(src, [1, 2, 3])
    np.testing.assert_array_equal(dst, [2, 3, 1])
    assert w is None


def test_parse_body_weighted(lib):
    src, dst, w = parse_mtx_body(b"1 2 0.5\n2 3 -1e3\n", 10, True)
    np.testing.assert_array_equal(src, [1, 2])
    np.testing.assert_allclose(w, [0.5, -1000.0])


def test_parse_body_max_rows(lib):
    src, dst, w = parse_mtx_body(b"1 2\n2 3\n3 4\n", 2, False)
    assert src.shape[0] == 2


def test_native_matches_numpy_reader(lib, rng, tmp_path):
    g = random_graph(rng, n=80, avg_deg=5)
    p = tmp_path / "g.mtx"
    write_mtx(g, str(p))
    g_native = read_mtx(str(p), use_native=True)
    g_numpy = read_mtx(str(p), use_native=False)
    np.testing.assert_array_equal(to_dense(g_native), to_dense(g_numpy))
    assert g_native.m == g.m


def test_native_matches_numpy_weighted(lib, tmp_path):
    p = tmp_path / "w.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 2\n1 2 1.5\n2 3 2.5\n")
    a = read_mtx(str(p), weighted=True, use_native=True)
    b = read_mtx(str(p), weighted=True, use_native=False)
    np.testing.assert_array_equal(to_dense(a), to_dense(b))
    np.testing.assert_allclose(np.asarray(a.weights[: a.m]),
                               np.asarray(b.weights[: b.m]))


def test_native_plan_matches_numpy(rng, monkeypatch):
    # The C++ slot expansion (native/src/plan_native.cpp) must reproduce the
    # NumPy pipeline element-for-element: same kept slots in the same order,
    # same degree packing, same tile boundaries — for both deg16 and plain
    # payloads, LHub and IHub, and the serving (sources=) mode.
    from conftest import random_graph

    from linkpred_tpu.io.native import native_lib
    from linkpred_tpu.predict.plan import build_plan

    if native_lib() is None:
        pytest.skip("native library unavailable")

    def plans(g, deg, **kw):
        monkeypatch.setenv("LINKPRED_NATIVE_PLAN", "0")
        p_np = build_plan(g, deg, **kw)
        monkeypatch.setenv("LINKPRED_NATIVE_PLAN", "1")
        p_nat = build_plan(g, deg, **kw)
        return p_np, p_nat

    g = random_graph(rng, n=300, avg_deg=8)
    for deg, kw in [(4, {}), (0, {}), (16, {"cap": 512}),
                    (4, {"sources": np.arange(0, 300, 7)})]:
        p_np, p_nat = plans(g, deg, **kw)
        assert p_nat.packed and p_np.packed
        assert p_nat.total_slots == p_np.total_slots
        assert p_nat.cap == p_np.cap and p_nat.num_tiles == p_np.num_tiles
        for f in ("slot_w", "slot_u", "slot_udeg", "slot_wdeg",
                  "slot_middeg", "tile_slot_start"):
            np.testing.assert_array_equal(
                getattr(p_nat, f), getattr(p_np, f), err_msg=f"{f} deg={deg}")
    # Edge-stream plans: the native FIRST-HOP stage (lp_plan_firsthop) feeds
    # the fe_* arrays (incl. killer rows/skips) — must match NumPy exactly.
    for deg in (0, 12):
        p_np, p_nat = plans(g, deg, slot_budget=0)
        assert p_np.total_slots > 0
        assert not p_nat.packed and not p_np.packed
        assert p_nat.total_slots == p_np.total_slots
        for f in ("fe_work", "fe_adr", "fe_usrc", "fe_middeg",
                  "tile_edge_start"):
            np.testing.assert_array_equal(
                getattr(p_nat, f), getattr(p_np, f),
                err_msg=f"{f} deg={deg} (edge stream)")


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_native_firsthop_fuzz(rng, monkeypatch, seed):
    # lp_plan_firsthop vs the NumPy stage-1 across graph shapes: skewed
    # (power-law-ish) degrees, hubs above cap (huge routing), directed
    # remainders after symmetrize, self-loop-free and with isolated vertices.
    from conftest import random_graph

    from linkpred_tpu import from_edges
    from linkpred_tpu.io.native import native_lib
    from linkpred_tpu.predict.plan import build_plan

    if native_lib() is None:
        pytest.skip("native library unavailable")
    r = np.random.default_rng(seed)
    # skewed graph: preferential-attachment-flavored edges + isolated tail
    n = 400
    deg_w = 1.0 / (np.arange(n) + 1.0)
    deg_w /= deg_w.sum()
    m = 3000
    src = r.choice(n, size=m, p=deg_w)
    dst = r.integers(0, n - 50, size=m)  # vertices n-50..n-1 stay isolated
    keep = src != dst
    g = from_edges(src[keep], dst[keep], n=n)

    def plans(deg, **kw):
        monkeypatch.setenv("LINKPRED_NATIVE_PLAN", "0")
        p_np = build_plan(g, deg, **kw)
        monkeypatch.setenv("LINKPRED_NATIVE_PLAN", "1")
        p_nat = build_plan(g, deg, **kw)
        return p_np, p_nat

    for deg, kw in [(0, {}), (0, {"cap": 1024}), (8, {}),
                    (0, {"slot_budget": 0}), (16, {"slot_budget": 0})]:
        p_np, p_nat = plans(deg, **kw)
        assert p_nat.packed == p_np.packed, (deg, kw)
        assert p_nat.total_slots == p_np.total_slots, (deg, kw)
        np.testing.assert_array_equal(p_nat.huge_src, p_np.huge_src)
        fields = (("slot_w", "slot_u", "slot_udeg", "slot_wdeg",
                   "slot_middeg", "tile_slot_start") if p_np.packed else
                  ("fe_work", "fe_adr", "fe_usrc", "fe_middeg",
                   "tile_edge_start"))
        for f in fields:
            np.testing.assert_array_equal(
                getattr(p_nat, f), getattr(p_np, f),
                err_msg=f"{f} deg={deg} kw={kw}")
        if p_np.huge_plan is not None:
            assert p_nat.huge_plan is not None
            assert (p_nat.huge_plan.total_slots
                    == p_np.huge_plan.total_slots)
