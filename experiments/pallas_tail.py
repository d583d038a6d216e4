"""Fused Pallas post-sort tail: boundary detect + run-start cummax + count +
score + selection-key emit in ONE kernel.

The s21 anatomy (STATUS.md) shows the non-sort tail of the packed tile pass
costs ~200 ms of the 791 ms device total: cummax reduce-window 49.5 ms,
window/score fusions ~30 ms, raw-buffer writes 32 ms, and most of the ~95 ms
scan-step residual.  All of it is elementwise + one scan over the sorted
stream — HBM-roofline cost at s21 (142M lanes) is ~28 B/lane ≈ 4 GB ≈ 5 ms.
This experiment builds the fused kernel and A/Bs it against the exact XLA
tail it replaces (scoring.py::_keyed_sort_reduce post-sort + the
_select_topk key build), asserting BITWISE equality of (selection key, ku,
kw) and timing both with the in-jit iterated method (ab_width2.py): per-tile
cost = (t(ITERS) - t(1)) / (ITERS - 1), so dispatch/transfer/sync cancel.

Kernel structure (grid sequential over CHR*128-lane chunks):
  * flags (is_start | is_end<<1) are computed by ONE fused XLA pass over the
    sorted (hi, lo) pair — shifted compares need the neighbor element, which
    a non-overlapping block grid can't see; XLA fuses it into a single
    elementwise pass (read 8B, write 4B per lane).
  * run-start positions: within-row (lane-axis) log-step cummax via
    pltpu.roll, then a row-totals exclusive cummax down the sublane axis,
    then a cross-chunk carry scalar in SMEM (TPU grid steps run sequentially
    on the core, so the carry is well-defined).
  * scores call MetricSpec.score directly (the single source of truth), and
    the descending-selection key transform + invalid-lane spread are fused in
    (the spread iota is TILE-LOCAL here — equally valid: it only needs to
    break the -inf duplicate mass, and the reserved 0xFFFFFFFF pad sentinel
    still sorts last; _select_topk's global-iota spread has ~34 dups/value at
    s21, tile-local has ~68).

Run: python experiments/pallas_tail.py          (TPU)
     CHECK_ONLY=1 ... (skip timing)
"""
import os
import sys
from functools import partial

import numpy as np
import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from linkpred_tpu.utils.timing import measure_duration  # noqa: E402
from linkpred_tpu.predict.metrics import METRICS  # noqa: E402

N = 1 << int(os.environ.get("LANES_LOG2", "21"))
ITERS = int(os.environ.get("ITERS", "16"))
REPEAT = int(os.environ.get("REPEAT", "3"))
CHR = int(os.environ.get("CHR", "1024"))          # rows per chunk (x128 lanes)
W_BITS = int(os.environ.get("W_BITS", "21"))
NVERT = 1 << W_BITS
METRIC = METRICS[os.environ.get("METRIC", "jaccard_coefficient")]
INTERPRET = jax.default_backend() == "cpu"

rng = np.random.default_rng(0)


# --------------------------------------------------------------------------
# XLA reference tail (exact mirror of scoring.py post-sort + selection key)
# --------------------------------------------------------------------------

def _desc_score_key(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    asc = u ^ jnp.where(u >> 31 == 1, jnp.uint32(0xFFFFFFFF),
                        jnp.uint32(0x80000000))
    return ~asc


@jax.jit
def xla_tail(hi, lo, dpack, min_score):
    i32 = jnp.int32
    cap = hi.shape[0]
    iota = jax.lax.broadcasted_iota(i32, (cap,), 0)
    neq = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    start = jax.lax.cummax(jnp.where(is_start, iota, 0))
    cnt = iota - start + 1
    du = (dpack >> 16) & 0xFFFF
    dw = dpack & 0xFFFF
    valid = is_end & (hi < (1 << W_BITS))
    s = METRIC.score(cnt, cnt.astype(jnp.float32), du, dw)
    s = jnp.where(valid & (s > min_score), s, -jnp.inf)
    key = _desc_score_key(s)
    key = jnp.where(jnp.isneginf(s),
                    key | (iota & i32(0x7FFFFE)).astype(jnp.uint32), key)
    ku = jnp.minimum(lo, NVERT - 1)
    kw = jnp.minimum(hi, NVERT - 1)
    return key, ku, kw


# --------------------------------------------------------------------------
# Pallas fused tail
# --------------------------------------------------------------------------

def _tail_kernel(ms_ref, flags_ref, hi_ref, lo_ref, dpack_ref,
                 skey_ref, ku_ref, kw_ref, carry_ref, *, chr_rows, w_bits, n):
    i32 = jnp.int32
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry_ref[0] = 0

    flags = flags_ref[...]
    hi = hi_ref[...]
    lo = lo_ref[...]
    dpack = dpack_ref[...]
    rows = jax.lax.broadcasted_iota(i32, (chr_rows, 128), 0)
    lanes = jax.lax.broadcasted_iota(i32, (chr_rows, 128), 1)
    gidx = c * (chr_rows * 128) + rows * 128 + lanes

    is_start = (flags & 1) != 0
    is_end = (flags & 2) != 0

    # run-start positions: cummax over the flattened (row-major) chunk
    x = jnp.where(is_start, gidx, 0)
    s = 1
    while s < 128:                       # within-row, along lanes
        x = jnp.where(lanes >= s, jnp.maximum(x, pltpu.roll(x, s, 1)), x)
        s *= 2
    rt = jnp.broadcast_to(x[:, 127:128], (chr_rows, 128))   # row totals
    rte = pltpu.roll(rt, 1, 0)                               # exclusive rows
    rte = jnp.where(rows >= 1, rte, carry_ref[0])
    s = 1
    while s < chr_rows:                  # running max down rows
        rte = jnp.where(rows >= s, jnp.maximum(rte, pltpu.roll(rte, s, 0)),
                        rte)
        s *= 2
    start = jnp.maximum(x, rte)
    carry_ref[0] = jnp.max(start)

    cnt = gidx - start + 1
    du = (dpack >> 16) & 0xFFFF
    dw = dpack & 0xFFFF
    valid = is_end & (hi < (1 << w_bits))

    sc = METRIC.score(cnt, cnt.astype(jnp.float32), du, dw)
    sc = jnp.where(valid & (sc > ms_ref[0, 0]), sc, -jnp.inf)
    u = pltpu.bitcast(sc, jnp.uint32)
    asc = u ^ jnp.where((u >> 31) == 1, jnp.uint32(0xFFFFFFFF),
                        jnp.uint32(0x80000000))
    sk = ~asc
    sk = jnp.where(sc == -jnp.inf,
                   sk | (gidx & i32(0x7FFFFE)).astype(jnp.uint32), sk)
    skey_ref[...] = sk
    ku_ref[...] = jnp.minimum(lo, n - 1)
    kw_ref[...] = jnp.minimum(hi, n - 1)


@jax.jit
def pallas_tail(hi, lo, dpack, min_score):
    i32 = jnp.int32
    cap = hi.shape[0]
    rows_total = cap // 128
    nch = rows_total // CHR
    assert nch * CHR == rows_total, (cap, CHR)

    # one fused XLA pass: boundary flags from the shifted compares
    neq = (hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    flags = is_start.astype(i32) | (is_end.astype(i32) << 1)

    shp2 = (rows_total, 128)
    blk = pl.BlockSpec((CHR, 128), lambda c: (c, 0),
                       memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct(shp2, jnp.uint32),
                 jax.ShapeDtypeStruct(shp2, jnp.int32),
                 jax.ShapeDtypeStruct(shp2, jnp.int32)]
    kern = partial(_tail_kernel, chr_rows=CHR, w_bits=W_BITS, n=NVERT)
    skey, ku, kw = pl.pallas_call(
        kern,
        grid=(nch,),
        in_specs=[pl.BlockSpec((1, 1), lambda c: (0, 0),
                               memory_space=pltpu.SMEM),
                  blk, blk, blk, blk],
        out_specs=[blk, blk, blk],
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=INTERPRET,
    )(jnp.reshape(min_score.astype(jnp.float32), (1, 1)),
      flags.reshape(shp2), hi.reshape(shp2), lo.reshape(shp2),
      dpack.reshape(shp2))
    return skey.reshape(cap), ku.reshape(cap), kw.reshape(cap)


# --------------------------------------------------------------------------
# data: a realistic sorted stream (duplicate-heavy w, sorted (w, src) pairs)
# --------------------------------------------------------------------------

def make_stream(n_lanes, fill=0.97):
    n_real = int(n_lanes * fill)
    w = rng.integers(0, NVERT, n_real, dtype=np.int64)
    src = rng.integers(0, NVERT, n_real, dtype=np.int64)
    # heavy duplication: ~8 slots per (w, src) run on average
    w = w[rng.integers(0, n_real // 8, n_real)] if n_real >= 8 else w
    src = src[rng.integers(0, n_real // 8, n_real)] if n_real >= 8 else src
    key = (w << 32) | src
    key.sort()
    hi = (key >> 32).astype(np.int32)
    lo = (key & 0xFFFFFFFF).astype(np.int32)
    iota = np.arange(n_lanes, dtype=np.int64)
    pad_hi = ((1 << W_BITS) | (iota[n_real:] & 1023)).astype(np.int32)
    hi = np.concatenate([hi, pad_hi])
    lo = np.concatenate([lo, np.zeros(n_lanes - n_real, np.int32)])
    udeg = rng.integers(1, 1 << 16, n_lanes, dtype=np.int64)
    wdeg = rng.integers(1, 1 << 16, n_lanes, dtype=np.int64)
    dpack = ((udeg << 16) | wdeg).astype(np.uint32).view(np.int32)
    return jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(dpack)


def check():
    hi, lo, dpack = make_stream(N)
    ms = jnp.float32(0.0)
    k1, u1, w1 = xla_tail(hi, lo, dpack, ms)
    k2, u2, w2 = pallas_tail(hi, lo, dpack, ms)
    ok_k = bool(jnp.array_equal(k1, k2))
    ok_u = bool(jnp.array_equal(u1, u2))
    ok_w = bool(jnp.array_equal(w1, w2))
    print(f"bitwise equal: skey={ok_k} ku={ok_u} kw={ok_w}", flush=True)
    if not (ok_k and ok_u and ok_w):
        bad = np.nonzero(np.asarray(k1) != np.asarray(k2))[0]
        print("first mismatches:", bad[:10])
        for i in bad[:5]:
            print(i, hex(int(np.asarray(k1)[i])), hex(int(np.asarray(k2)[i])))
        sys.exit(1)


def iterated(fn, iters):
    xors = jnp.asarray(
        rng.integers(1, 1 << 20, iters, dtype=np.int64).astype(np.int32))

    @jax.jit
    def run(hi, lo, dpack, ms):
        def body(carry, x):
            z = carry  # runtime zero derived from the previous output
            k, u, w = fn(hi ^ x ^ z, lo, dpack, ms)
            return (u[0] >> 31), (k[0], u[0])
        _, outs = jax.lax.scan(body, jnp.int32(0), xors)
        return outs

    return run


def bench(name, fn):
    hi, lo, dpack = make_stream(N)
    ms = jnp.float32(0.0)
    f1 = iterated(fn, 1)
    fn_ = iterated(fn, ITERS)
    t1, _ = measure_duration(lambda: f1(hi, lo, dpack, ms), repeat=REPEAT)
    tn, _ = measure_duration(lambda: fn_(hi, lo, dpack, ms), repeat=REPEAT)
    per = (tn - t1) / (ITERS - 1)
    gbs = (N * 28) / (per * 1e-3) / 1e9   # ~28 B/lane end-to-end
    print(f"{name:12s} {per:7.2f} ms per 2^{int(np.log2(N))}-lane tail  "
          f"(~{gbs:.0f} GB/s end-to-end; t1 {t1:.1f}, t{ITERS} {tn:.1f})",
          flush=True)


if __name__ == "__main__":
    check()
    if os.environ.get("CHECK_ONLY", "0") != "1":
        bench("xla-tail", xla_tail)
        bench("pallas-tail", pallas_tail)
