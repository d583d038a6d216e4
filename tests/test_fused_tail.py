"""Fused Pallas tail (ops/fused_tail.py) == the XLA tail, bit for bit.

The fused kernel replaces run-boundary detection, the run-start cummax, the
count, the score formulas and the selection-key build after the packed-path
tile sort.  These tests pin (a) kernel-level bitwise equality against the
XLA tail on adversarial streams, (b) end-to-end `score_tiles` equality
fused vs unfused in both engine modes, and (c) the sharded path.  On CPU the
kernel runs in Pallas interpret mode — same arithmetic, no Mosaic.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linkpred_tpu.ops.fused_tail import fused_tail, fused_tail_supported
from linkpred_tpu.predict.metrics import METRICS
from linkpred_tpu.predict import scoring
from linkpred_tpu.predict.scoring import score_tiles

UNWEIGHTED = [n for n, m in METRICS.items() if not m.needs_weight]


def _xla_tail(hi, lo, dpack, neq, min_score, metrics, w_bits, n, maxf2=0):
    """The exact XLA tail the kernel replaces (scoring post-sort + key build,
    with the fused path's tile-local spread)."""
    i32 = jnp.int32
    cap = hi.shape[0]
    iota = jax.lax.broadcasted_iota(i32, (cap,), 0)
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    cnt = iota - start + 1
    du = (dpack >> 16) & 0xFFFF
    dw = dpack & 0xFFFF
    valid = is_end & (hi < (1 << w_bits))
    if maxf2:
        valid &= (du <= maxf2 * du) & (dw <= maxf2 * du)
    keys = []
    for m in metrics:
        s = m.score(cnt, cnt.astype(jnp.float32), du, dw)
        s = jnp.where(valid & (s > min_score), s, -jnp.inf)
        key = scoring._desc_score_key(s)
        key = jnp.where(jnp.isneginf(s),
                        key | (iota & i32(0x7FFFFE)).astype(jnp.uint32), key)
        keys.append(key)
    return (jnp.stack(keys), jnp.minimum(lo, n - 1), jnp.minimum(hi, n - 1))


def _stream(rng, cap, w_bits, fill=0.9, run_len=6):
    n_real = int(cap * fill)
    nv = 1 << w_bits
    base = max(n_real // run_len, 1)
    w = rng.integers(0, nv, base, dtype=np.int64)[
        rng.integers(0, base, n_real)]
    src = rng.integers(0, nv, base, dtype=np.int64)[
        rng.integers(0, base, n_real)]
    key = np.sort((w << 32) | src)
    hi = (key >> 32).astype(np.int32)
    lo = (key & 0xFFFFFFFF).astype(np.int32)
    iota = np.arange(cap, dtype=np.int64)
    hi = np.concatenate([hi, ((1 << w_bits) | (iota[n_real:] & 1023)).astype(np.int32)])
    lo = np.concatenate([lo, np.zeros(cap - n_real, np.int32)])
    udeg = rng.integers(1, 1 << 16, cap, dtype=np.int64)
    wdeg = rng.integers(1, 1 << 16, cap, dtype=np.int64)
    dpack = ((udeg << 16) | wdeg).astype(np.uint32).view(np.int32)
    neq = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    return (jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(dpack),
            jnp.asarray(neq))


@pytest.mark.parametrize("metric", ["jaccard_coefficient", "common_neighbors",
                                    "hub_depressed"])
@pytest.mark.parametrize("cap", [256, 1024, 4096])
def test_kernel_bitwise_vs_xla_tail(rng, metric, cap):
    w_bits, n = 12, 1 << 12
    hi, lo, dpack, neq = _stream(rng, cap, w_bits)
    metrics = (METRICS[metric],)
    ms = jnp.float32(0.0)
    k1, u1, v1 = _xla_tail(hi, lo, dpack, neq, ms, metrics, w_bits, n)
    k2, u2, v2 = fused_tail(hi, lo, (dpack,), [], neq, ms, metrics=metrics,
                            w_bits=w_bits, n=n)
    assert jnp.array_equal(k1, k2)
    assert jnp.array_equal(u1, u2)
    assert jnp.array_equal(v1, v2)


def test_kernel_multi_metric_and_min_score(rng):
    cap, w_bits, n = 2048, 11, 1 << 11
    hi, lo, dpack, neq = _stream(rng, cap, w_bits, fill=1.0, run_len=3)
    metrics = tuple(METRICS[m] for m in UNWEIGHTED)
    ms = jnp.float32(0.25)
    k1, u1, v1 = _xla_tail(hi, lo, dpack, neq, ms, metrics, w_bits, n)
    k2, u2, v2 = fused_tail(hi, lo, (dpack,), [], neq, ms, metrics=metrics,
                            w_bits=w_bits, n=n)
    assert jnp.array_equal(k1, k2) and jnp.array_equal(u1, u2) \
        and jnp.array_equal(v1, v2)


def test_kernel_degenerate_runs(rng):
    """All lanes one run / every lane its own run — the scan-carry edges."""
    cap, w_bits, n = 512, 10, 1 << 10
    metrics = (METRICS["jaccard_coefficient"],)
    ms = jnp.float32(0.0)
    for hi_np in (np.full(cap, 7, np.int32),
                  np.arange(cap, dtype=np.int32) % n):
        hi = jnp.asarray(np.sort(hi_np))
        lo = jnp.zeros(cap, jnp.int32)
        dpack = jnp.asarray(
            ((rng.integers(1, 1 << 16, cap) << 16)
             | rng.integers(1, 1 << 16, cap)).astype(np.uint32).view(np.int32))
        neq = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
        out1 = _xla_tail(hi, lo, dpack, neq, ms, metrics, w_bits, n)
        out2 = fused_tail(hi, lo, (dpack,), [], neq, ms, metrics=metrics,
                          w_bits=w_bits, n=n)
        for a, b in zip(out1, out2):
            assert jnp.array_equal(a, b)


def test_supported_predicate():
    mets = (METRICS["jaccard_coefficient"],)
    # every keyed configuration is covered now; only the cap shape gates
    assert fused_tail_supported(packed=True, deg16=True, metrics=mets,
                                cap=1024)
    assert fused_tail_supported(packed=False, deg16=False,
                                metrics=(METRICS["adamic_adar"],), cap=1024)
    assert not fused_tail_supported(packed=True, deg16=True, metrics=mets,
                                    cap=96)


def test_weighted_and_killers_fused_vs_oracle(rng):
    """AA/RA (segmented-sum accumulators) and the keyed edge stream (killer
    flags) ride the fused tail; predict_links stays oracle-exact."""
    from conftest import random_graph
    from oracle import oracle_scores
    from linkpred_tpu import PredictOptions, predict_links

    g = random_graph(rng, 250, 6)
    for metric, d1 in [("adamic_adar", 0), ("resource_allocation", 16)]:
        pairs = oracle_scores(g, metric, d1)
        res = predict_links(g, metric=metric, min_degree1=d1,
                            options=PredictOptions(max_edges=20_000))
        assert len(res) == min(20_000, len(pairs))
        for u, v, s in zip(res.u, res.v, res.score):
            assert np.isclose(s, pairs[(int(u), int(v))], rtol=1e-5)


@pytest.mark.parametrize("key64", [False, True])
def test_score_tiles_fused_equals_unfused(rng, key64):
    from conftest import random_graph
    from linkpred_tpu.predict.plan import build_plan

    g = random_graph(rng, 800, 10)
    plan = build_plan(g, 64, cap=1 << 10)
    assert plan.packed and plan.deg16, "test premise: packed deg16 plan"
    stream, ts = plan.device_stream()
    deg = jnp.asarray(g.degrees)
    dummy = jnp.zeros((1,), jnp.int32)
    kwargs = dict(metric_names=("jaccard_coefficient", "common_neighbors"),
                  cap=plan.cap, k=64, w_bits=plan.w_bits, packed=True,
                  deg16=True, key64=key64)
    t_unf = score_tiles(dummy, deg, stream, ts, jnp.float32(0.0),
                        fused=False, **kwargs)
    t_fus = score_tiles(dummy, deg, stream, ts, jnp.float32(0.0),
                        fused=True, **kwargs)
    # identical score multisets per metric; pair sets identical ABOVE the
    # k-th score (among ties at the cutoff the two paths may legitimately
    # pick different pairs: the spread iota is tile-local when fused, global
    # when not, so the selection's tie order differs)
    for i in range(t_unf.scores.shape[0]):
        sa = np.asarray(t_unf.scores[i])
        sb = np.asarray(t_fus.scores[i])
        np.testing.assert_array_equal(np.sort(sa), np.sort(sb))
        cut = sa[np.isfinite(sa)].min() if np.isfinite(sa).any() else 0.0
        pairs_a = {(int(u), int(v), float(s))
                   for u, v, s in zip(t_unf.u[i], t_unf.v[i], sa) if s > cut}
        pairs_b = {(int(u), int(v), float(s))
                   for u, v, s in zip(t_fus.u[i], t_fus.v[i], sb) if s > cut}
        assert pairs_a == pairs_b


@pytest.mark.parametrize("metric", ["adamic_adar", "resource_allocation"])
@pytest.mark.parametrize("key64", [False, True])
def test_weighted_fused_vs_unfused_within_ulps(rng, key64, metric):
    """The fused kernel's segmented weight sums use a different (but fixed)
    f32 summation order than XLA's segment_run_totals, so fused vs unfused
    weighted scores are documented as equal-to-f32-rounding rather than
    bit-equal (fused_tail.py module docstring).  Pin that bound: measured on
    this IHub-maximal stream the divergence is <= 2 ulp (8 of ~121k scores at
    exactly 2.0 ulp, the rest bit-equal or 1 ulp) — summation-order noise.
    Any wider divergence is a logic bug, not rounding, and fails here.
    (Advisor r4.)"""
    from conftest import random_graph
    from linkpred_tpu.predict.plan import build_plan

    g = random_graph(rng, 800, 10)
    plan = build_plan(g, 0, cap=1 << 10)   # IHub: maximal weighted runs
    assert plan.packed, "test premise: packed plan"
    stream, ts = plan.device_stream()
    deg = jnp.asarray(g.degrees)
    dummy = jnp.zeros((1,), jnp.int32)
    # k = all lanes: cutoff membership can't hide a divergent score
    k = plan.num_tiles_padded * plan.cap
    kwargs = dict(metric_names=(metric,), cap=plan.cap, k=k,
                  w_bits=plan.w_bits, packed=True, deg16=plan.deg16,
                  key64=key64)
    t_unf = score_tiles(dummy, deg, stream, ts, jnp.float32(0.0),
                        fused=False, **kwargs)
    t_fus = score_tiles(dummy, deg, stream, ts, jnp.float32(0.0),
                        fused=True, **kwargs)
    sa = np.sort(np.asarray(t_unf.scores[0]))
    sb = np.sort(np.asarray(t_fus.scores[0]))
    fa, fb = sa[np.isfinite(sa)], sb[np.isfinite(sb)]
    assert fa.shape == fb.shape, "finite-score counts differ"
    assert fa.size > 100, "test premise: enough weighted runs to matter"
    np.testing.assert_array_compare(
        lambda a, b: np.abs(a - b) <= 2 * np.spacing(np.maximum(np.abs(a),
                                                                np.abs(b))),
        fa, fb, err_msg="fused/unfused weighted scores differ by > 2 ulp")


def test_predict_links_fused_on_off_identical(rng, monkeypatch):
    """Full predict_links with LINKPRED_FUSED_TAIL on vs off: same results."""
    from conftest import random_graph
    from linkpred_tpu import PredictOptions, predict_links

    g = random_graph(rng, 400, 8)
    opts = PredictOptions(max_edges=60)
    monkeypatch.setenv("LINKPRED_FUSED_TAIL", "0")
    r_off = predict_links(g, metric="jaccard_coefficient", min_degree1=32,
                          options=opts)
    monkeypatch.setenv("LINKPRED_FUSED_TAIL", "1")
    r_on = predict_links(g, metric="jaccard_coefficient", min_degree1=32,
                         options=opts)
    np.testing.assert_array_equal(np.sort(r_off.score), np.sort(r_on.score))
    cut = r_off.score.min() if len(r_off) else 0.0
    assert ({(int(u), int(v)) for u, v, s in zip(r_off.u, r_off.v,
                                                 r_off.score) if s > cut}
            == {(int(u), int(v)) for u, v, s in zip(r_on.u, r_on.v,
                                                    r_on.score) if s > cut})
