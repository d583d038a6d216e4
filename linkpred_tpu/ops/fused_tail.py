"""Fused Pallas post-sort tail: run reduction + scoring + selection-key emit.

After the tile sort, the packed-path engine needs (per lane): run boundaries
on the sorted (w, src) pairs, the run-start position (one cummax), the run
length (= the common-neighbor count, `/root/reference/inc/predict.hxx:309-337`),
AA/RA weight run totals (the CUSTOMVALUE accumulator, `predict.hxx:770,788,
810,828`), the per-metric score formula, and the descending-selection key for
the deferred top-k.  As separate XLA ops these cost several HBM round trips
per tile (the s21 trace: cummax reduce-window ~50 ms + score/key fusions
~30 ms + much of the ~95 ms scan residual); this kernel does all of it in
ONE pass over the sorted stream.

Structure (grid is sequential over (CHR*128)-lane chunks on a TPU core):

* boundary flags are computed by one fused XLA pass over the sorted keys
  (shifted compares need the neighbor element, which a non-overlapping block
  grid can't see) — `_flags_from_sorted`;
* the run-start cummax runs two-level in VMEM: a lane-axis log-step scan via
  `pltpu.roll`, then a row-totals exclusive scan down the sublane axis, with
  a cross-chunk carry scalar in SMEM (grid steps execute in order).  With
  ``killers`` (keyed edge stream) the scanned value carries the first slot's
  real/killer flag in its low bit, exactly like the XLA tail;
* weighted metrics get a SEGMENTED two-level sum scan of the same shape
  (combine: (f2,v2)∘(f1,v1) = (f1|f2, f2 ? v2 : v1+v2)) with per-metric f32
  cross-chunk carries — float32 adds in within-run order, matching
  `ops/segment.py::segment_run_totals`'s associative_scan exactly for the
  in-order tree XLA builds... NOT bit-guaranteed, so fused weighted runs are
  validated against the oracle in tests (f32 sums are order-sensitive; both
  implementations use the same lane-major log-step order);
* scores call :meth:`MetricSpec.score` directly — the single source of truth
  for the 9 formulas (`predict.hxx:503-831`);
* the selection-key transform (`scoring._desc_score_key`) and the
  invalid-lane spread are fused in.  The spread iota is TILE-LOCAL (the
  unfused path uses the scan-global lane index): equally valid — it only
  needs to break the -inf duplicate mass for the selection sort, and the
  reserved 0xFFFFFFFF pad sentinel of `_argselect_blocked` still sorts after
  every emitted key (max spread key is 0xFF800000 | 0x7FFFFE).

Supported engine configurations (see :func:`fused_tail_supported`): any
packed or keyed-edge stream whose cap is a multiple of 128 — deg16 or wide
degrees, unweighted or AA/RA-weighted metrics, killer-flagged or clean, both
key64 and u32 engine modes.  LINKPRED_FUSED_TAIL=0 forces the XLA tail.

Mosaic pitfalls pinned here (found the hard way, each a hard compile loop or
a compile-helper crash): Python-int roll shifts and where-literals lift to
64-bit under JAX_ENABLE_X64 and Mosaic's i64->i32 convert lowering
self-recurses; a GRIDDED pallas_call traced under x64 crashes this host's
remote tpu_compile_helper — the kernel is traced under jax.enable_x64(False)
(every operand is explicitly 32-bit).

Measured (v5e, in-jit iterated, 2^21 lanes): isolated XLA tail 0.80 ms vs
fused kernel 0.72 ms — the end-to-end win is larger because the kernel also
replaces the key64 unpack and selection-key fusions and their intermediate
HBM buffers (see experiments/pallas_tail.py and STATUS.md).
"""
from __future__ import annotations

import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..predict.metrics import maxf2_mask

__all__ = ["fused_tail_enabled", "fused_tail_supported", "fused_tail"]

# rows (x128 lanes) per kernel chunk; 1024 rows = 2^17 lanes ≈ 0.5 MB per
# i32 buffer in VMEM (inputs + outputs double-buffered: well under the
# ~16 MB/core budget at any metric count)
_CHR_MAX = 1024


def fused_tail_enabled() -> bool:
    """Call-time kill switch (default ON where supported)."""
    return os.environ.get("LINKPRED_FUSED_TAIL", "1") != "0"


def fused_tail_supported(*, packed: bool, deg16: bool, metrics, cap: int) -> bool:
    """Static predicate: can this engine configuration ride the fused tail?
    (``packed``/``deg16`` no longer restrict — kept for call-site clarity.)"""
    del packed, deg16
    return cap % 128 == 0 and cap >= 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _lane_row_scan(v, lanes, rows_iota, chr_rows, carry, *, op):
    """Two-level inclusive scan of ``v`` over the flattened (row-major)
    chunk: lane-axis log-steps, then a row-totals exclusive scan down the
    sublane axis seeded by the scalar ``carry``.  ``op`` is max or add
    (both have identity-compatible seeds here: run-start positions are
    nonneg, sums reset at boundaries via the caller's (f, v) encoding)."""
    s = 1
    while s < 128:
        v = jnp.where(lanes >= s, op(v, pltpu.roll(v, np.int32(s), 1)), v)
        s *= 2
    rt = jnp.broadcast_to(v[:, 127:128], (chr_rows, 128))
    rte = pltpu.roll(rt, np.int32(1), 0)
    rte = jnp.where(rows_iota >= 1, rte, carry)
    s = 1
    while s < chr_rows:
        rte = jnp.where(rows_iota >= s, op(rte, pltpu.roll(rte, np.int32(s), 0)),
                        rte)
        s *= 2
    return op(v, rte), rte


def _seg_sum_scan(wt, is_start, lanes, rows_iota, chr_rows, carry):
    """Two-level SEGMENTED inclusive sum: resets at ``is_start``; lanes
    before the chunk's first boundary continue the previous chunk's run via
    the scalar ``carry``.  Returns (per-lane within-run inclusive sums,
    chunk-end running value for the next carry).  Segment flags are carried
    as i32 0/1 — Mosaic cannot rotate i1 vectors ("Rotate with non-32-bit
    data")."""
    i32 = jnp.int32
    f = is_start.astype(i32)
    v = wt
    s = 1
    while s < 128:
        mask = lanes >= s
        rf = pltpu.roll(f, np.int32(s), 1)
        rv = pltpu.roll(v, np.int32(s), 1)
        v = jnp.where(mask & (f == 0), v + rv, v)
        f = jnp.where(mask, f | rf, f)
        s *= 2
    # row aggregates: last lane's (f, v) per row
    fr = jnp.broadcast_to(f[:, 127:128], (chr_rows, 128))
    vr = jnp.broadcast_to(v[:, 127:128], (chr_rows, 128))
    # exclusive down rows, seeded by (0, carry)
    fe = pltpu.roll(fr, np.int32(1), 0)
    ve = pltpu.roll(vr, np.int32(1), 0)
    fe = jnp.where(rows_iota >= 1, fe, i32(0))
    ve = jnp.where(rows_iota >= 1, ve, carry)
    s = 1
    while s < chr_rows:
        mask = rows_iota >= s
        rf = pltpu.roll(fe, np.int32(s), 0)
        rv = pltpu.roll(ve, np.int32(s), 0)
        ve = jnp.where(mask & (fe == 0), ve + rv, ve)
        fe = jnp.where(mask, fe | rf, fe)
        s *= 2
    out = jnp.where(f != 0, v, v + ve)
    # chunk-end running value via a masked reduction (scalar element reads
    # from VMEM vectors don't lower reliably)
    last = (rows_iota == chr_rows - 1) & (lanes == 127)
    return out, jnp.sum(jnp.where(last, out, 0.0))


def _tail_kernel(ms_ref, flags_ref, hi_ref, lo_ref, *refs,
                 chr_rows: int, w_bits: int, n: int, maxf2: int,
                 metrics, wide: bool, killers: bool):
    i32 = jnp.int32
    u32 = jnp.uint32
    n_wt = sum(1 for m in metrics if m.needs_weight)
    n_deg = 2 if wide else 1
    deg_refs = refs[:n_deg]
    wt_refs = refs[n_deg: n_deg + n_wt]
    refs = refs[n_deg + n_wt:]
    skey_refs = refs[:len(metrics)]
    ku_ref, kw_ref, carry_ref, wcarry_ref = refs[len(metrics):]
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        carry_ref[0] = 0
        for i in range(max(n_wt, 1)):
            wcarry_ref[i] = 0.0

    flags = flags_ref[...]
    hi = hi_ref[...]
    lo = lo_ref[...]
    rows_iota = jax.lax.broadcasted_iota(i32, (chr_rows, 128), 0)
    lanes = jax.lax.broadcasted_iota(i32, (chr_rows, 128), 1)
    gidx = c * (chr_rows * 128) + rows_iota * 128 + lanes

    is_start = (flags & 1) != 0
    is_end = (flags & 2) != 0

    # run-start positions (with the killer liveness flag riding the low bit
    # when the stream carries killers, mirroring scoring.py's XLA tail)
    if killers:
        flag = lo & 1
        v0 = jnp.where(is_start, (gidx << 1) | flag, i32(0))
    else:
        v0 = jnp.where(is_start, gidx, i32(0))
    m, _ = _lane_row_scan(v0, lanes, rows_iota, chr_rows, carry_ref[0],
                          op=jnp.maximum)
    carry_ref[0] = jnp.max(m)     # cummax => the last element IS the max
    if killers:
        start = m >> 1
        alive = (m & 1) == 1
        src = lo >> 1
    else:
        start = m
        alive = None
        src = lo

    cnt = gidx - start + 1                       # run length == Nuv
    if wide:
        du, dw = deg_refs[0][...], deg_refs[1][...]
    else:
        dpack = deg_refs[0][...]
        du = (dpack >> 16) & 0xFFFF
        dw = dpack & 0xFFFF
    valid = is_end & (hi < (1 << w_bits))
    if alive is not None:
        valid &= alive
    if maxf2:
        # single source of truth: metrics.maxf2_mask (elementwise, so the
        # Pallas kernel body can share the XLA tail's / host oracle's code)
        valid &= maxf2_mask(du, dw, maxf2)

    accs = {}
    for i, metric in enumerate(m for m in metrics if m.needs_weight):
        acc, end_val = _seg_sum_scan(wt_refs[i][...], is_start, lanes,
                                     rows_iota, chr_rows, wcarry_ref[i])
        wcarry_ref[i] = end_val
        accs[metric.name] = acc

    min_score = ms_ref[0, 0]
    spread = (gidx & i32(0x7FFFFE)).astype(u32)
    neginf = jnp.float32(-jnp.inf)     # a Python float would lift to f64[]
    cntf = cnt.astype(jnp.float32)
    for metric, skey_ref in zip(metrics, skey_refs):
        acc = accs[metric.name] if metric.needs_weight else cntf
        sc = metric.score(cnt, acc, du, dw)
        sc = jnp.where(valid & (sc > min_score), sc, neginf)
        # scoring._desc_score_key fused in (same bit transform)
        ubits = pltpu.bitcast(sc, u32)
        asc = ubits ^ jnp.where((ubits >> 31) == 1, u32(0xFFFFFFFF),
                                u32(0x80000000))
        sk = ~asc
        skey_ref[...] = jnp.where(sc == neginf, sk | spread, sk)
    ku_ref[...] = jnp.minimum(src, n - 1)
    kw_ref[...] = jnp.minimum(hi, n - 1)


def _flags_from_sorted(neq):
    """is_start | is_end<<1 from the sorted stream's neighbor-inequality."""
    i32 = jnp.int32
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    return is_start.astype(i32) | (is_end.astype(i32) << 1)


def fused_tail(hi, lo, degs, wts, neq, min_score, *, metrics, w_bits: int,
               n: int, maxf2: int = 0, killers: bool = False):
    """Run the fused tail over one sorted tile.

    ``hi``/``lo``: the sorted (candidate id, source payload) pair, int32[cap]
    — ``lo`` is the bare source id, or ``src << 1 | real_flag`` when
    ``killers``; ``degs``: ``(dpack,)`` deg16-packed degree pairs or
    ``(udeg, wdeg)`` wide; ``wts``: one f32[cap] sorted weight array per
    weighted metric, in ``metrics`` order; ``neq``: bool[cap-1]
    neighbor-inequality of the sorted keys (one u64 compare in key64 mode).
    Returns ``(skeys u32[M, cap], ku i32[cap], kw i32[cap])`` where ``skeys``
    are ready-made descending selection keys (spread applied) for
    `scoring._argselect_blocked`.
    """
    cap = hi.shape[0]
    rows_total = cap // 128
    chr_rows = rows_total
    while chr_rows > _CHR_MAX or rows_total % chr_rows:
        # cap is a multiple of 128; find the largest chunk height <= _CHR_MAX
        # that divides the row count (caps are powers of two in practice, so
        # this loop terminates at a power of two immediately)
        chr_rows -= 1
    nch = rows_total // chr_rows
    wide = len(degs) == 2
    n_wt = len(wts)
    assert n_wt == sum(1 for m in metrics if m.needs_weight)

    flags = _flags_from_sorted(neq)

    shp2 = (rows_total, 128)
    blk = pl.BlockSpec((chr_rows, 128), lambda c: (c, 0),
                       memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct(shp2, jnp.uint32)] * len(metrics)
                 + [jax.ShapeDtypeStruct(shp2, jnp.int32)] * 2)
    kern = partial(_tail_kernel, chr_rows=chr_rows, w_bits=w_bits, n=n,
                   maxf2=maxf2, metrics=tuple(metrics), wide=wide,
                   killers=killers)
    n_in = 2 + len(degs) + n_wt          # flags, hi, lo(+degs)(+wts)
    # The kernel is traced from deep inside jit -> scan(unroll) -> cond; the
    # default 1000-frame recursion budget is mostly spent by then and
    # pallas_call's kernel-to-jaxpr trace blows it (RecursionError inside
    # jax.util.weakrefs_to_sentinel).  Raising the limit is the same remedy
    # JAX applies for deep jaxpr work — scoped to the trace and restored
    # (advisor r4: library code must not leave a process-global behind for
    # the embedding application).
    saved_limit = sys.getrecursionlimit()
    if saved_limit < 20000:
        sys.setrecursionlimit(20000)
    try:
        with jax.enable_x64(False):
            outs = pl.pallas_call(
                kern,
                grid=(nch,),
                in_specs=[pl.BlockSpec((1, 1), lambda c: (0, 0),
                                       memory_space=pltpu.SMEM)]
                         + [blk] * (n_in + 1),
                out_specs=[blk] * (len(metrics) + 2),
                out_shape=out_shape,
                scratch_shapes=[pltpu.SMEM((1,), jnp.int32),
                                pltpu.SMEM((max(n_wt, 1),), jnp.float32)],
                interpret=_interpret(),
            )(jnp.reshape(min_score.astype(jnp.float32), (1, 1)),
              flags.reshape(shp2), hi.reshape(shp2), lo.reshape(shp2),
              *[d.reshape(shp2) for d in degs],
              *[w.astype(jnp.float32).reshape(shp2) for w in wts])
    finally:
        if sys.getrecursionlimit() != saved_limit:
            sys.setrecursionlimit(saved_limit)
    skeys = jnp.stack([o.reshape(cap) for o in outs[:len(metrics)]])
    return skeys, outs[-2].reshape(cap), outs[-1].reshape(cap)
