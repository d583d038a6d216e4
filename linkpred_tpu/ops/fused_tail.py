"""Fused Pallas post-sort tail: run reduction + scoring + selection-key emit.

After the tile sort, the packed-path engine needs (per lane): run boundaries
on the sorted (w, src) pairs, the run-start position (one cummax), the run
length (= the common-neighbor count, `/root/reference/inc/predict.hxx:309-337`),
the per-metric score formula, and the descending-selection key for the
deferred top-k.  As separate XLA ops these cost several HBM round trips per
tile (the s21 trace: cummax reduce-window ~50 ms + score/key fusions ~30 ms
+ much of the ~95 ms scan residual); this kernel does all of it in ONE pass
over the sorted stream (read ~16 B/lane, write ~12 B/lane at one metric).

Structure (grid is sequential over (CHR*128)-lane chunks on a TPU core):

* boundary flags are computed by one fused XLA pass over the sorted keys
  (shifted compares need the neighbor element, which a non-overlapping block
  grid can't see) — `_flags_from_sorted`;
* the run-start cummax runs two-level in VMEM: a lane-axis log-step scan via
  `pltpu.roll`, then a row-totals exclusive scan down the sublane axis, with
  a cross-chunk carry scalar in SMEM (grid steps execute in order);
* scores call :meth:`MetricSpec.score` directly — the single source of truth
  for the 9 formulas (`predict.hxx:503-831`) — so fused and unfused paths
  share bit-identical float32 arithmetic;
* the selection-key transform (`scoring._desc_score_key`) and the
  invalid-lane spread are fused in.  The spread iota is TILE-LOCAL (the
  unfused path uses the scan-global lane index): equally valid — it only
  needs to break the -inf duplicate mass for the selection sort, and the
  reserved 0xFFFFFFFF pad sentinel of `_argselect_blocked` still sorts after
  every emitted key (max spread key is 0xFF800000 | 0x7FFFFE).

Supported engine configuration (see :func:`fused_tail_supported`): packed
slot stream (killers dropped at plan time), deg16 packed degree pairs,
unweighted metrics (AA/RA run totals need a segmented sum — they ride the
XLA tail), cap a multiple of 128.  Both key64 and u32 engine modes.
Unsupported configs fall back to the XLA tail; LINKPRED_FUSED_TAIL=0 forces
the fallback everywhere.

Measured (v5e, in-jit iterated, 2^21 lanes): isolated XLA tail 0.80 ms vs
fused kernel 0.72 ms — the end-to-end win is larger because the kernel also
replaces the key64 unpack and selection-key fusions and their intermediate
HBM buffers (see experiments/pallas_tail.py and STATUS.md).
"""
from __future__ import annotations

import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_tail_enabled", "fused_tail_supported", "fused_tail"]

# rows (x128 lanes) per kernel chunk; 1024 rows = 2^17 lanes ≈ 0.5 MB per
# i32 buffer in VMEM (4 inputs + 2+M outputs, double-buffered: well under
# the ~16 MB/core budget at any metric count)
_CHR_MAX = 1024


def fused_tail_enabled() -> bool:
    """Call-time kill switch (default ON where supported)."""
    return os.environ.get("LINKPRED_FUSED_TAIL", "1") != "0"


def fused_tail_supported(*, packed: bool, deg16: bool, metrics, cap: int) -> bool:
    """Static predicate: can this engine configuration ride the fused tail?"""
    return (
        packed                                  # killer-free stream
        and deg16                               # packed degree pairs
        and all(not m.needs_weight for m in metrics)  # no segmented sums
        and cap % 128 == 0
        and cap >= 128
    )


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _tail_kernel(ms_ref, flags_ref, hi_ref, lo_ref, dpack_ref,
                 *refs, chr_rows: int, w_bits: int, n: int, maxf2: int,
                 metrics):
    i32 = jnp.int32
    u32 = jnp.uint32
    skey_refs = refs[:len(metrics)]
    ku_ref, kw_ref, carry_ref = refs[len(metrics):]
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

    # run-start positions: cummax over the flattened (row-major) chunk.
    # Level 1: within each row, along lanes.  NOTE roll shifts are passed as
    # np.int32: under JAX_ENABLE_X64 a Python int lifts to an i64[] operand,
    # and Mosaic's i64->i32 convert lowering self-recurses (no 64-bit support).
    import numpy as _np
    x = jnp.where(is_start, gidx, i32(0))
    s = 1
    while s < 128:
        x = jnp.where(lanes >= s,
                      jnp.maximum(x, pltpu.roll(x, _np.int32(s), 1)), x)
        s *= 2
    # Level 2: running max of row totals down the sublane axis (exclusive,
    # seeded by the cross-chunk carry).
    rt = jnp.broadcast_to(x[:, 127:128], (chr_rows, 128))
    rte = pltpu.roll(rt, _np.int32(1), 0)
    rte = jnp.where(rows >= 1, rte, carry_ref[0])
    s = 1
    while s < chr_rows:
        rte = jnp.where(rows >= s,
                        jnp.maximum(rte, pltpu.roll(rte, _np.int32(s), 0)),
                        rte)
        s *= 2
    start = jnp.maximum(x, rte)
    carry_ref[0] = jnp.max(start)

    cnt = gidx - start + 1                       # run length == Nuv
    du = (dpack >> 16) & 0xFFFF
    dw = dpack & 0xFFFF
    valid = is_end & (hi < (1 << w_bits))
    if maxf2:
        # reference MAXFACTOR2 predicate as written (predict.hxx:221,295)
        valid &= (du <= maxf2 * du) & (dw <= maxf2 * du)

    min_score = ms_ref[0, 0]
    spread = (gidx & i32(0x7FFFFE)).astype(u32)
    neginf = jnp.float32(-jnp.inf)     # a Python float would lift to f64[]
    for metric, skey_ref in zip(metrics, skey_refs):
        sc = metric.score(cnt, cnt.astype(jnp.float32), du, dw)
        sc = jnp.where(valid & (sc > min_score), sc, neginf)
        # scoring._desc_score_key fused in (same bit transform)
        ubits = pltpu.bitcast(sc, u32)
        asc = ubits ^ jnp.where((ubits >> 31) == 1, u32(0xFFFFFFFF),
                                u32(0x80000000))
        sk = ~asc
        skey_ref[...] = jnp.where(sc == neginf, sk | spread, sk)
    ku_ref[...] = jnp.minimum(lo, n - 1)
    kw_ref[...] = jnp.minimum(hi, n - 1)


def _flags_from_sorted(neq):
    """is_start | is_end<<1 from the sorted stream's neighbor-inequality."""
    i32 = jnp.int32
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    return is_start.astype(i32) | (is_end.astype(i32) << 1)


def fused_tail(hi, lo, dpack, neq, min_score, *, metrics, w_bits: int,
               n: int, maxf2: int = 0):
    """Run the fused tail over one sorted tile.

    ``hi``/``lo``: the sorted (candidate id, source id) pair, int32[cap];
    ``dpack``: deg16-packed degree pairs riding the sort, int32[cap];
    ``neq``: bool[cap-1] neighbor-inequality of the sorted keys (computed by
    the caller from whichever key encoding the sort used — one u64 compare in
    key64 mode).  Returns ``(skeys u32[M, cap], ku i32[cap], kw i32[cap])``
    where ``skeys`` are ready-made descending selection keys (spread already
    applied) for `scoring._argselect_blocked`.
    """
    i32 = jnp.int32
    cap = hi.shape[0]
    rows_total = cap // 128
    chr_rows = rows_total
    while chr_rows > _CHR_MAX or rows_total % chr_rows:
        # cap is a multiple of 128; find the largest chunk height <= _CHR_MAX
        # that divides the row count (caps are powers of two in practice, so
        # this loop terminates at a power of two immediately)
        chr_rows -= 1
    nch = rows_total // chr_rows

    flags = _flags_from_sorted(neq)

    # The kernel is traced from deep inside jit -> scan(unroll) -> cond; the
    # default 1000-frame recursion budget is mostly spent by then and
    # pallas_call's kernel-to-jaxpr trace blows it (RecursionError inside
    # jax.util.weakrefs_to_sentinel).  Raising the limit here is the same
    # remedy JAX applies for deep jaxpr work.
    if sys.getrecursionlimit() < 20000:
        sys.setrecursionlimit(20000)

    shp2 = (rows_total, 128)
    blk = pl.BlockSpec((chr_rows, 128), lambda c: (c, 0),
                       memory_space=pltpu.VMEM)
    out_shape = ([jax.ShapeDtypeStruct(shp2, jnp.uint32)] * len(metrics)
                 + [jax.ShapeDtypeStruct(shp2, jnp.int32)] * 2)
    kern = partial(_tail_kernel, chr_rows=chr_rows, w_bits=w_bits, n=n,
                   maxf2=maxf2, metrics=tuple(metrics))
    # Trace the kernel with x64 OFF even inside an x64 program (the key64
    # engine mode): a GRIDDED pallas_call traced under jax_enable_x64 emits
    # 64-bit grid index arithmetic that hard-crashes this host's remote
    # tpu_compile_helper (HTTP 500; gridless kernels compile fine).  Every
    # operand below is explicitly 32-bit, so the flip changes nothing else.
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kern,
            grid=(nch,),
            in_specs=[pl.BlockSpec((1, 1), lambda c: (0, 0),
                                   memory_space=pltpu.SMEM),
                      blk, blk, blk, blk],
            out_specs=[blk] * (len(metrics) + 2),
            out_shape=out_shape,
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            interpret=_interpret(),
        )(jnp.reshape(min_score.astype(jnp.float32), (1, 1)),
          flags.reshape(shp2), hi.reshape(shp2), lo.reshape(shp2),
          dpack.reshape(shp2))
    skeys = jnp.stack([o.reshape(cap) for o in outs[:len(metrics)]])
    return skeys, outs[-2].reshape(cap), outs[-1].reshape(cap)
