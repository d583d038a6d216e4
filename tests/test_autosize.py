"""HBM-derived memory budgets (utils/device.py): the slot/selection bounds
auto-size from the queried device instead of hard-coded 16 GB-era constants
(VERDICT r3 item 3 — `BENCH_SCALE=23 python bench.py` with zero env knobs)."""
import numpy as np


def test_formulas_reproduce_the_validated_16gb_points(monkeypatch):
    from linkpred_tpu.utils import device as dev

    monkeypatch.setattr(dev, "hbm_bytes", lambda: 16 << 30)
    # s23's ~575M-slot stream used to need LINKPRED_SLOT_BUDGET=7e8 by hand;
    # the 16 GB auto budget must cover it
    assert dev.auto_slot_budget() >= 700_000_000
    # the selection segment bound reproduces the measured-safe 2^28 (±25%)
    assert abs(dev.auto_seg_lanes() - (1 << 28)) < (1 << 26)


def test_budgets_scale_with_hbm(monkeypatch):
    from linkpred_tpu.utils import device as dev

    monkeypatch.setattr(dev, "hbm_bytes", lambda: 32 << 30)
    b32 = dev.auto_slot_budget()
    monkeypatch.setattr(dev, "hbm_bytes", lambda: 16 << 30)
    b16 = dev.auto_slot_budget()
    assert abs(b32 - 2 * b16) <= 2  # linear in HBM (up to integer rounding)
    # int32 slot indexing bounds the budget no matter the part size
    monkeypatch.setattr(dev, "hbm_bytes", lambda: 1 << 44)
    assert dev.auto_slot_budget() < (1 << 31)


def test_overrides_win(monkeypatch):
    from linkpred_tpu.predict import plan as plan_mod
    from linkpred_tpu.predict import scoring as scoring_mod

    monkeypatch.setattr(plan_mod, "SLOT_BUDGET", 123)
    assert plan_mod._slot_budget() == 123
    monkeypatch.setattr(plan_mod, "HUGE_DEVICE_MAX", 55)
    assert plan_mod._huge_device_max() == 55
    monkeypatch.setattr(scoring_mod, "SEG_LANES", 77)
    assert scoring_mod._seg_lanes() == 77
    # None => derived from the device query
    monkeypatch.setattr(plan_mod, "SLOT_BUDGET", None)
    assert plan_mod._slot_budget() > 0
    monkeypatch.setattr(scoring_mod, "SEG_LANES", None)
    assert scoring_mod._seg_lanes() > 0


def test_zero_budget_still_forces_edge_stream(rng):
    """slot_budget=0 (explicit) must keep meaning 'force the edge stream' —
    only None auto-sizes."""
    from conftest import random_graph

    from linkpred_tpu.predict.plan import build_plan

    g = random_graph(rng, n=150, avg_deg=5)
    p0 = build_plan(g, 0, cap=2048, slot_budget=0)
    assert not p0.packed
    pauto = build_plan(g, 0, cap=2048)
    assert pauto.packed  # tiny plan, any sane auto budget covers it


def test_stream_padding_bucket_and_budget_accounting(rng):
    """Round-5 regression: stream arrays pad to a 4-bit-mantissa bucket
    (<= 9/8 of the request; pow2 padding could DOUBLE memory and OOMed an
    IHub s16 plan), and the packed decision prices the PADDED demand — a
    budget below it must flip the plan to the edge stream."""
    from conftest import random_graph
    from linkpred_tpu.predict.plan import _pad_bucket, build_plan

    for x in range(8, 4097):
        b = _pad_bucket(x)
        assert x <= b <= -(-9 * x) // 8, (x, b)

    g = random_graph(rng, 300, 8)
    p = build_plan(g, 0, cap=256, slot_budget=10**9)   # IHub, ample budget
    assert p.packed
    kept = p.total_slots
    # padded allocation bounded by the bucket guarantee
    assert p.slot_w.shape[0] <= -(-9 * (kept + 256)) // 8
    # a budget below the padded demand must refuse to materialize the stream
    p_edge = build_plan(g, 0, cap=256, slot_budget=kept // 2)
    assert not p_edge.packed and p_edge.slot_w is None
