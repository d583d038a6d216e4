"""Pallas bitonic sort v2: DYNAMIC stages (fori_loop + SMEM stage table).

v1 (`pallas_bitonic.py`) fully unrolled all O(log^2 n) compare-exchange stages;
Mosaic compile time exploded (349 s at 2^18, >58 min at 2^20 — killed), which
is the real verdict on the unrolled design.  Here ONE fori_loop body handles
every stage: the (k, j) parameters live in an SMEM table and the XOR-partner
permutation uses `pltpu.roll` with DYNAMIC shifts (row rolls for j >= 128,
lane rolls for j < 128; the inactive axis degenerates to an identity roll).
Compile time is then independent of n's log^2 factor.

Keys are int32 (Mosaic lacks minui); payload i32 optional.  Correctness is
checked against np.sort in interpret mode (CPU) and on device; timing uses the
in-jit iterated harness (see ab_width2.py) against `lax.sort`.

    JAX_PLATFORMS=cpu python experiments/pallas_bitonic2.py 12      # interpret
    python experiments/pallas_bitonic2.py 20 --tpu                  # measure
"""
import functools
import os
import sys

import numpy as np
import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LANES = 128


def stage_table(n):
    ks, js = [], []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            ks.append(k)
            js.append(j)
            j //= 2
        k *= 2
    return np.asarray(ks, np.int32), np.asarray(js, np.int32)


def make_kernel(n, with_payload):
    R = n // LANES

    def iotas():
        row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        return row, lane, row * LANES + lane

    def partner(row, lane, v, jr, jl):
        # XOR-permute v[i ^ j] via two dynamic rolls per axis + bit-select.
        # When jr == 0 (lane stage) the row rolls are identity, and vice
        # versa, so composing both axes is always correct.
        fwd_r = pltpu.roll(v, (R - jr) % R, axis=0)
        bwd_r = pltpu.roll(v, jr, axis=0)
        v = jnp.where((row & jr) == 0, fwd_r, bwd_r)
        fwd_l = pltpu.roll(v, (LANES - jl) % LANES, axis=1)
        bwd_l = pltpu.roll(v, jl, axis=1)
        return jnp.where((lane & jl) == 0, fwd_l, bwd_l)

    def kernel(ks_ref, js_ref, x_ref, p_ref, ok_ref, op_ref):
        ns = ks_ref.shape[0]
        row, lane, lin = iotas()

        def body(i, carry):
            v, p = carry
            k = ks_ref[i]
            j = js_ref[i]
            jr = j // LANES
            jl = j % LANES
            vp = partner(row, lane, v, jr, jl)
            asc = (lin & k) == 0
            low = (lin & j) == 0
            take_min = asc == low
            if with_payload:
                pp = partner(row, lane, p, jr, jl)
                keep_own = (take_min & (v <= vp)) | (~take_min & (v >= vp))
                p = jnp.where(keep_own, p, pp)
            v = jnp.where(take_min, jnp.minimum(v, vp), jnp.maximum(v, vp))
            return v, p

        v, p = jax.lax.fori_loop(0, ns, body, (x_ref[:], p_ref[:]))
        ok_ref[:] = v
        op_ref[:] = p

    return kernel


def make_sort(n, interpret, with_payload=True):
    kernel = make_kernel(n, with_payload)
    ks, js = stage_table(n)
    ksj, jsj = jnp.asarray(ks), jnp.asarray(js)
    R = n // LANES

    @jax.jit
    def f(x, p):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((R, LANES), x.dtype),
                       jax.ShapeDtypeStruct((R, LANES), p.dtype)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(ksj, jsj, x, p)

    return f


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    on_tpu = "--tpu" in sys.argv
    n = 1 << log2n
    R = n // LANES
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 31, n, dtype=np.int32)
    pay = np.arange(n, dtype=np.int32)
    xj = jnp.asarray(x).reshape(R, LANES)
    pj = jnp.asarray(pay).reshape(R, LANES)

    import time

    f = make_sort(n, interpret=not on_tpu)
    t0 = time.time()
    ks_, ps_ = jax.device_get(f(xj, pj))
    print(f"first call (compile) {time.time()-t0:.1f}s", flush=True)
    ks_, ps_ = np.asarray(ks_).reshape(-1), np.asarray(ps_).reshape(-1)
    ok = bool((ks_ == np.sort(x)).all() and (x[ps_] == ks_).all())
    print("sorted correctly:", ok, flush=True)
    if not ok:
        sys.exit(1)
    if not on_tpu:
        return

    from linkpred_tpu.utils.timing import measure_duration

    ITERS = int(os.environ.get("ITERS", "8"))
    xors = jnp.asarray(rng.integers(1, 1 << 21, ITERS,
                                    dtype=np.int64).astype(np.int32))

    def iterated(sort2, iters):
        @jax.jit
        def run(xj, pj):
            def body(carry, z):
                v, p = carry
                return sort2(v ^ z, p), 0
            out, _ = jax.lax.scan(body, (xj, pj), xors[:iters])
            return out[0]
        return run

    def pallas2(v, p):
        return f(v, p)

    def xla2(v, p):
        return jax.lax.sort((v, p), num_keys=1, is_stable=False)

    xf, pf = jnp.asarray(x), jnp.asarray(pay)
    for name, sortfn, args in (("pallas-dyn", pallas2, (xj, pj)),
                               ("lax.sort  ", xla2, (xf, pf))):
        f1 = iterated(sortfn, 1)
        fn = iterated(sortfn, ITERS)
        t1, _ = measure_duration(lambda: f1(*args), repeat=2)
        tn, _ = measure_duration(lambda: fn(*args), repeat=2)
        per = (tn - t1) / (ITERS - 1)
        print(f"{name} {per:7.2f} ms/sort / 2^{log2n} "
              f"({per*1e6/n:.2f} ns/lane)", flush=True)


if __name__ == "__main__":
    main()
