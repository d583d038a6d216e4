"""Pallas in-VMEM bitonic sort experiment (round-2 moonshot scoping).

Hypothesis (STATUS.md): XLA's `lax.sort` is ~70% of device time at ~2-3 ms per
2^20 keys; a VMEM-resident bitonic network has a ~1 ms bandwidth ceiling.

Design: keys viewed as (R, 128) row-major (i = r*128 + c).  A bitonic stage
(k, j) compare-exchanges i with i^j; for power-of-two j the partner permutation
is a static reshape-flip: rows for j >= 128, lanes for j < 128.  All 210 stages
unroll inside one kernel over a VMEM-resident block.

Usage:
    PYTHONPATH=/root/repo python experiments/pallas_bitonic.py [log2_n] [--tpu]
(interpret mode on CPU by default; --tpu compiles via Mosaic.)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _partner(v, j, R, use_roll):
    """v[i^j] for power-of-two stride j over row-major (R, 128) layout.

    Mosaic has no `rev` lowering, so on TPU the XOR permute is two circular
    rolls + a bit-select (the wrapped lanes are never selected: for bit-clear
    positions the partner is i+j within the same 2j block, and vice versa)."""
    if not use_roll:
        if j >= LANES:
            jr = j // LANES
            return v.reshape(R // (2 * jr), 2, jr, LANES)[:, ::-1].reshape(R, LANES)
        return v.reshape(R, LANES // (2 * j), 2, j)[:, :, ::-1].reshape(R, LANES)
    if j >= LANES:
        jr = j // LANES
        fwd = pltpu.roll(v, R - jr, axis=0)   # == roll(-jr): fwd[i] = v[i + jr]
        bwd = pltpu.roll(v, jr, axis=0)
        bit = (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0) & jr) == 0
        return jnp.where(bit, fwd, bwd)
    fwd = pltpu.roll(v, LANES - j, axis=1)
    bwd = pltpu.roll(v, j, axis=1)
    bit = (jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1) & j) == 0
    return jnp.where(bit, fwd, bwd)


def _asc_mask(k, R):
    """ascending iff (i & k) == 0, as a (R, 128) bool."""
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    i = row * LANES + lane
    return (i & k) == 0


def _lower_mask(j, R):
    """i < i^j  <=>  (i & j) == 0, as a (R, 128) bool."""
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    i = row * LANES + lane
    return (i & j) == 0


def bitonic_stages(v, n, use_roll=False, payload=None):
    R = n // LANES
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            vp = _partner(v, j, R, use_roll)
            take_min = _asc_mask(k, R) == _lower_mask(j, R)
            if payload is not None:
                pp = _partner(payload, j, R, use_roll)
                # logical form: where() on i1 vectors trips Mosaic truncation
                keep_own = (take_min & (v <= vp)) | (~take_min & (v >= vp))
                payload = jnp.where(keep_own, payload, pp)
            v = jnp.where(take_min, jnp.minimum(v, vp), jnp.maximum(v, vp))
            j //= 2
        k *= 2
    return v if payload is None else (v, payload)


def make_pallas_sort_kv(n, interpret):
    def kernel(x_ref, p_ref, ok_ref, op_ref):
        ok, op = bitonic_stages(x_ref[:], n, use_roll=not interpret,
                                payload=p_ref[:])
        ok_ref[:] = ok
        op_ref[:] = op

    @jax.jit
    def f(x, p):
        return pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((n // LANES, LANES), x.dtype),
                       jax.ShapeDtypeStruct((n // LANES, LANES), p.dtype)),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 2,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, p)

    return f


def make_pallas_sort(n, interpret):
    def kernel(x_ref, o_ref):
        o_ref[:] = bitonic_stages(x_ref[:], n, use_roll=not interpret)

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n // LANES, LANES), x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x)

    return f


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    on_tpu = "--tpu" in sys.argv
    n = 1 << log2n
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 31, n, dtype=np.int32)  # 31-bit keys: signed min/max OK (Mosaic lacks minui)
    xj = jnp.asarray(x).reshape(n // LANES, LANES)

    f = make_pallas_sort(n, interpret=not on_tpu)
    t0 = time.time()
    out = np.asarray(jax.device_get(f(xj))).reshape(-1)
    print(f"first call {time.time()-t0:.1f}s")
    ok = bool((out == np.sort(x)).all())
    print("sorted correctly:", ok)
    if not ok:
        sys.exit(1)

    if "--payload" in sys.argv:
        pay = np.arange(n, dtype=np.int32)
        fkv = make_pallas_sort_kv(n, interpret=not on_tpu)
        t0 = time.time()
        ks, ps = jax.device_get(fkv(xj, jnp.asarray(pay).reshape(n // LANES, LANES)))
        print(f"kv first call {time.time()-t0:.1f}s")
        ks, ps = np.asarray(ks).reshape(-1), np.asarray(ps).reshape(-1)
        kv_ok = bool((ks == np.sort(x)).all() and (x[ps] == ks).all())
        print("kv sorted correctly:", kv_ok)
        if on_tpu and kv_ok:
            N = 8

            @jax.jit
            def rep_kv(seed, xj, pj):
                def body(c, _):
                    z = c.astype(jnp.int32) >> 31
                    kk, pp = fkv(xj + z, pj)
                    return c + kk[-1, -1].astype(jnp.float32) + pp[0, 0].astype(jnp.float32), None
                r, _ = jax.lax.scan(body, seed, None, length=N)
                return r

            @jax.jit
            def rep_xla_kv(seed, xf, pf):
                def body(c, _):
                    z = c.astype(jnp.int32) >> 31
                    kk, pp = jax.lax.sort((xf + z, pf), num_keys=1, is_stable=False)
                    return c + kk[-1].astype(jnp.float32) + pp[0].astype(jnp.float32), None
                r, _ = jax.lax.scan(body, seed, None, length=N)
                return r

            pj = jnp.asarray(pay).reshape(n // LANES, LANES)
            for name, fn, args in (("pallas kv", rep_kv, (xj, pj)),
                                   ("lax.sort kv", rep_xla_kv,
                                    (jnp.asarray(x), jnp.asarray(pay)))):
                v = float(jax.device_get(fn(jnp.float32(0.0), *args)))
                t0 = time.perf_counter()
                v = float(jax.device_get(fn(jnp.float32(1.0), *args)))
                print(f"{name}: {(time.perf_counter()-t0)*1e3/N:.2f} ms per 2^{log2n}")
    if on_tpu:
        # honest amortized timing vs lax.sort
        N = 8

        @jax.jit
        def rep_pallas(seed, xj):
            def body(c, _):
                z = c.astype(jnp.int32) >> 31
                r = f(xj + z)
                return c + r[-1, -1].astype(jnp.float32), None
            r, _ = jax.lax.scan(body, seed, None, length=N)
            return r

        @jax.jit
        def rep_xla(seed, xf):
            def body(c, _):
                z = c.astype(jnp.int32) >> 31
                r = jax.lax.sort(xf + z)
                return c + r[-1].astype(jnp.float32), None
            r, _ = jax.lax.scan(body, seed, None, length=N)
            return r

        for name, fn, arg in (("pallas bitonic", rep_pallas, xj),
                              ("lax.sort", rep_xla, jnp.asarray(x))):
            v = float(jax.device_get(fn(jnp.float32(0.0), arg)))
            t0 = time.perf_counter()
            v = float(jax.device_get(fn(jnp.float32(1.0), arg)))
            print(f"{name}: {(time.perf_counter()-t0)*1e3/N:.2f} ms per 2^{log2n} sort")


if __name__ == "__main__":
    main()
