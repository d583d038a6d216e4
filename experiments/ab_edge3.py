"""A/B: edge-stream tile rebuild — current 5-array layout vs fused 3-array.

Current per-tile chain (w-key path, count metric):
  fe_src[eloc], fe_mid[eloc], fe_skip[eloc], fe_cnt[eloc],
  offsets[mid], indices[adr], degrees[u], degrees[w]       = 8 gathers
Proposed: plan precomputes fe_adr = offsets[mid] + skip and
fe_upay = (src << 1) | real (fe_cnt/fe_mid/fe_skip all fold away;
weighted metrics add fe_middeg = degrees[mid] host-side):
  fe_adr[eloc], fe_upay[eloc], indices[adr], degrees[u], degrees[w]
                                                           = 5 gathers
Run with `python -m experiments.ab_edge3`.
"""
import numpy as np
import jax
import jax.numpy as jnp

from linkpred_tpu.ops.segment import cummax
from linkpred_tpu.utils.timing import measure_duration

CAP = 1 << 21
T = 8
N = 1 << 22
W_BITS = 22
AVG_WORK = 32

rng = np.random.default_rng(0)
m1 = T * CAP // AVG_WORK
fe_work = rng.integers(1, 2 * AVG_WORK, m1).astype(np.int32)
fe_src = rng.integers(0, N, m1, dtype=np.int32)
fe_mid = rng.integers(0, N, m1, dtype=np.int32)
fe_skip = rng.integers(0, 4, m1).astype(np.int32)
fe_cnt = np.where(rng.random(m1) < 0.02, -(1 << 30), 1).astype(np.int32)
degrees = rng.integers(1, 1 << 12, N, dtype=np.int32)
offsets = np.zeros(N + 1, dtype=np.int32)
np.cumsum(degrees, out=offsets[1:])
M = int(offsets[-1])
indices = rng.integers(0, N, max(M, 1), dtype=np.int32)
# balanced tile windows over the edge rows (by work)
prefix = np.cumsum(fe_work) - fe_work
ts = np.searchsorted(prefix, np.arange(T + 1) * CAP).astype(np.int32)
ts[-1] = m1
# fused layout precomputes
fe_adr = (offsets[fe_mid] + fe_skip).astype(np.int32)
fe_upay = ((fe_src.astype(np.int64) << 1) | (fe_cnt > 0)).astype(np.int32)
# pad every edge array so each tile window can read CAP rows (plans do the same)
pad = lambda a: np.concatenate([a, np.zeros(CAP, a.dtype)])
fe_work, fe_src, fe_mid, fe_skip, fe_cnt, fe_adr, fe_upay = map(
    pad, (fe_work, fe_src, fe_mid, fe_skip, fe_cnt, fe_adr, fe_upay))

iota = jax.lax.broadcasted_iota(jnp.int32, (CAP,), 0)


def slot_map(fe_work, t0, t1):
    win = lambda a: jax.lax.dynamic_slice(a, (t0,), (CAP,))
    evalid = iota < (t1 - t0)
    ework = jnp.where(evalid, win(fe_work), 0)
    eprefix = jnp.cumsum(ework) - ework
    total = eprefix[-1] + ework[-1]
    pos = jnp.where(ework > 0, eprefix, CAP)
    starts = jnp.zeros((CAP,), jnp.int32).at[pos].max(iota, mode="drop")
    return win, cummax(starts), eprefix, total


def reduce_sum(key, upay, udeg, wdeg):
    key, upay, udeg, wdeg = jax.lax.sort((key, upay, udeg, wdeg),
                                         num_keys=1, is_stable=True)
    src = upay >> 1
    neq = (key[1:] != key[:-1]) | (src[1:] != src[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    start = cummax(jnp.where(is_start, iota, 0))
    cnt = iota - start + 1
    return jnp.sum(cnt + udeg + wdeg + key)


def tile_a(offsets, indices, degrees, fsrc, fmid, fwork, fskip, fcnt, t0, t1):
    win, eloc, eprefix, total = slot_map(fwork, t0, t1)
    svalid = iota < total
    u = win(fsrc)[eloc]
    mid = win(fmid)[eloc]
    j = iota - eprefix[eloc]
    w = indices[jnp.clip(offsets[mid] + win(fskip)[eloc] + j, 0, M - 1)]
    cnt = win(fcnt)[eloc]
    real = cnt > 0
    key = jnp.where(~svalid, jnp.int32(1 << W_BITS) | (iota & 1023), w)
    upay = (u << 1) | real.astype(jnp.int32)
    udeg = degrees[jnp.clip(u, 0, N - 1)]
    wdeg = degrees[jnp.clip(w, 0, N - 1)]
    return reduce_sum(key, upay, udeg, wdeg)


def tile_b(indices, degrees, fadr, fupay, fwork, t0, t1):
    win, eloc, eprefix, total = slot_map(fwork, t0, t1)
    svalid = iota < total
    j = iota - eprefix[eloc]
    w = indices[jnp.clip(win(fadr)[eloc] + j, 0, M - 1)]
    upay = win(fupay)[eloc]
    key = jnp.where(~svalid, jnp.int32(1 << W_BITS) | (iota & 1023), w)
    udeg = degrees[jnp.clip(upay >> 1, 0, N - 1)]
    wdeg = degrees[jnp.clip(w, 0, N - 1)]
    return reduce_sum(key, upay, udeg, wdeg)


def tile_c(indices, degrees, fadr, fupay, fwork, t0, t1):
    win, eloc, eprefix, total = slot_map(fwork, t0, t1)
    svalid = iota < total
    # fold the two eloc-gathers (fadr, eprefix) into one: adr = base[eloc]+iota
    base = win(fadr) - eprefix
    w = indices[jnp.clip(base[eloc] + iota, 0, M - 1)]
    upay = win(fupay)[eloc]
    key = jnp.where(~svalid, jnp.int32(1 << W_BITS) | (iota & 1023), w)
    udeg = degrees[jnp.clip(upay >> 1, 0, N - 1)]
    wdeg = degrees[jnp.clip(w, 0, N - 1)]
    return reduce_sum(key, upay, udeg, wdeg)


def make(variant):
    if variant == "A":
        arrs = (offsets, indices, degrees, fe_src, fe_mid, fe_work,
                fe_skip, fe_cnt)

        def run(offsets, indices, degrees, fsrc, fmid, fwork, fskip, fcnt, ts):
            def body(c, se):
                return c, tile_a(offsets, indices, degrees, fsrc, fmid,
                                 fwork, fskip, fcnt, se[0], se[1])
            return jax.lax.scan(body, 0, (ts[:-1], ts[1:]))[1]
        return jax.jit(run), arrs + (ts,)
    arrs = (indices, degrees, fe_adr, fe_upay, fe_work)
    tile = tile_b if variant == "B" else tile_c

    def run(indices, degrees, fadr, fupay, fwork, ts):
        def body(c, se):
            return c, tile(indices, degrees, fadr, fupay, fwork,
                           se[0], se[1])
        return jax.lax.scan(body, 0, (ts[:-1], ts[1:]))[1]
    return jax.jit(run), arrs + (ts,)


if __name__ == "__main__":
    for name in ("A", "B", "C"):
        fn, args = make(name)
        dargs = jax.tree.map(jnp.asarray, args)
        ms, _ = measure_duration(lambda: fn(*dargs), repeat=3)
        print(f"{name}: {ms:.1f} ms total, {ms / T:.2f} ms/tile", flush=True)

# MEASURED (v5e, 8x 2^21-lane tiles, avg work 32, repeat=3):
#   A (src/mid/skip/cnt 5-array layout, 8 gathers): 89.40 ms/tile
#   B (adr/upay fused 3-array layout, 5 gathers):   71.46 ms/tile  (-20%)
#   C (B + base-eprefix fold):                      71.33 ms/tile  (== B;
#      XLA already fuses the row-aligned elementwise fold)
# Adopted as the plan's edge-stream format (fe_work/fe_adr/fe_usrc/fe_middeg,
# killer rows bitwise-NOTed in fe_usrc so the flag costs no extra gather).
