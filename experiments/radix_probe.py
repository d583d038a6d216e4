"""Radix-sort feasibility probe (the round-3 verdict covered only bitonic).

A multi-pass radix/histogram sort needs, per pass: (a) digit extraction +
per-chunk histogram + rank (VPU scans — cheap, measured via the shift-pack
kernel which IS a 1-bit split), and (b) a SCATTER: every (chunk, bucket)
group moves to a computed offset.  TPU has no vector scatter, so the only
lowerings are (1) sequential dynamic-offset block stores — measured here
(`dynstore`), (2) one-hot matmul permutations (C ops/lane VPU just to build
the permutation), or (3) log-step shift routing — measured here via the
production pack kernel (`ops/compact.py`), which is exactly a 1-bit
stable split restricted to the keep-side.

Measured columns (in-jit iterated, dispatch/RTT cancels; run on the TPU):
  lax-2op-u64   the engine's tile sort baseline (what radix must beat)
  pack-split    one 1-bit shift-routing split pass over the same lanes
  dynstore      per sequential dynamic-offset VMEM store (8 rows x 128)

Feasibility arithmetic for a u64 (w,src) tile key of b significant bits:
  shift-routing radix: b splits x >= 1 pack-pass each  => b x pack-split
  block-scatter radix: ceil(b/r) passes; each pass needs
      (lanes/chunk) x 2^r sequential stores + 2 HBM round trips
so radix beats lax.sort only if its per-pass cost is under
lax_sort_ms / passes — the numbers below close the question with data.

Run: python experiments/radix_probe.py        (TPU; LANES_LOG2=21 default)
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
from linkpred_tpu.ops.compact import pack_survivors  # noqa: E402

N = 1 << int(os.environ.get("LANES_LOG2", "21"))
ITERS = int(os.environ.get("ITERS", "8"))
REPEAT = int(os.environ.get("REPEAT", "3"))
rng = np.random.default_rng(0)


def bench(name, make_run, per_divisor=1.0):
    f1 = make_run(1)
    fn = make_run(ITERS)
    t1, _ = measure_duration(f1, repeat=REPEAT)
    tn, _ = measure_duration(fn, repeat=REPEAT)
    per = (tn - t1) / (ITERS - 1) / per_divisor
    print(f"{name:12s} {per:8.3f} ms  (t1 {t1:.1f}, t{ITERS} {tn:.1f})",
          flush=True)
    return per


# --- baseline: the engine's 2-operand u64 tile sort -------------------------
def lax_sort_run(iters):
    k = rng.integers(0, 1 << 42, N, dtype=np.uint64)
    p = rng.integers(0, 1 << 31, N, dtype=np.int64).astype(np.int32)
    k, p = jnp.asarray(k), jnp.asarray(p)
    xors = jnp.asarray(rng.integers(1, 1 << 21, iters, dtype=np.uint64))

    @jax.jit
    def run(k, p):
        def body(c, x):
            kk, pp = jax.lax.sort((c[0] ^ x, c[1]), num_keys=1,
                                  is_stable=False)
            return (kk, pp), 0
        out, _ = jax.lax.scan(body, (k, p), xors)
        return out

    return lambda: run(k, p)


# --- 1-bit split via the production shift-pack kernel -----------------------
def pack_run(iters):
    k = rng.integers(0, 1 << 31, N, dtype=np.int64).astype(np.uint32)
    k = jnp.asarray(k)
    thr = jnp.uint32(1 << 30)      # ~50/50 split: a radix bit is balanced
    xors = jnp.asarray(rng.integers(1, 1 << 21, iters, dtype=np.int64)
                       .astype(np.uint32))

    @jax.jit
    def run(k):
        def body(c, x):
            pk, pidx, cnt = pack_survivors(c ^ x, thr, ratio=1)
            return pk, cnt[0]
        out, _ = jax.lax.scan(body, k, xors)
        return out

    return lambda: run(k)


# --- sequential dynamic-offset VMEM stores (the scatter primitive) ----------
def dynstore_run(iters):
    ROWS, NSTORES, BLK = 512, 256, 8

    def kern(off_ref, x_ref, o_ref):
        def body(i, carry):
            off = off_ref[i]
            o_ref[pl.ds(off, BLK), :] = x_ref[pl.ds((i % (ROWS // BLK)) * BLK,
                                                    BLK), :] + carry
            return carry + 1
        jax.lax.fori_loop(0, NSTORES, body, jnp.int32(0))

    offs = jnp.asarray(rng.integers(0, ROWS - BLK, NSTORES, dtype=np.int64)
                       .astype(np.int32))
    x = jnp.asarray(rng.integers(0, 1 << 30, (ROWS, 128), dtype=np.int64)
                    .astype(np.int32))

    with jax.enable_x64(False):
        call = pl.pallas_call(
            kern,
            grid=(iters,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((ROWS, 128), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, 128), lambda c: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
            interpret=jax.default_backend() == "cpu",
        )

    @jax.jit
    def run(offs, x):
        return call(offs, x)

    return lambda: run(offs, x)


if __name__ == "__main__":
    lax_ms = bench("lax-2op-u64", lax_sort_run)
    pack_ms = bench("pack-split", pack_run)
    # dynstore grid counts as its own iteration axis: per-store cost
    f1 = dynstore_run(1)
    fn = dynstore_run(ITERS * 4)
    t1, _ = measure_duration(f1, repeat=REPEAT)
    tn, _ = measure_duration(fn, repeat=REPEAT)
    per_grid = (tn - t1) / (ITERS * 4 - 1)
    per_store_us = per_grid / 256 * 1e3
    print(f"{'dynstore':12s} {per_store_us:8.3f} us/store "
          f"(8x128 rows; {per_grid:.3f} ms per 256 stores)", flush=True)

    bits = 42
    print(f"\nradix arithmetic at 2^{int(np.log2(N))} lanes, {bits}-bit key:")
    print(f"  shift-routing radix: {bits} x {pack_ms:.2f} ms = "
          f"{bits * pack_ms:.1f} ms vs lax.sort {lax_ms:.2f} ms "
          f"({bits * pack_ms / lax_ms:.0f}x slower)")
    for r, chunk in [(4, 1 << 17), (8, 1 << 17)]:
        passes = -(-bits // r)
        stores = (N // chunk) * (1 << r)
        scatter_ms = stores * per_store_us / 1e3
        hbm_ms = 2 * 12 * N / 800e9 * 1e3
        print(f"  block-scatter radix r={r}: {passes} passes x "
              f"({stores} stores x {per_store_us:.2f} us + {hbm_ms:.2f} ms "
              f"HBM) = {passes * (scatter_ms + hbm_ms):.1f} ms"
              f" ({passes * (scatter_ms + hbm_ms) / lax_ms:.1f}x lax.sort)")
