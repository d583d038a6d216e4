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
