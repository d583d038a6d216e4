"""A/B: final top-k selection strategies over T*cap tile outputs.

The deferred-merge global sort (desc-key u32 + iota payload, 32M lanes) measured
~380 ms at bench scale — suspect: duplicate-key masses (60-70% of lanes are
-inf, plus score-tie masses).  Candidates:

  A. raw       — sort (desc_key, iota) as shipped
  B. spread    — invalid lanes get distinct keys (0x80000000 | lane)
  C. top_k     — jax.lax.top_k on the f32 scores (outside scan)
  D. 2-pass    — count-threshold prefilter (31-step binary search on the key
                 space, pure reductions) + spread sort of survivors-only mask

Honest timing: N data-dependent iterations inside one jit, one-element fetch.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 4
K = 1 << 19


def desc_key(x):
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    asc = u ^ jnp.where(u >> 31 == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
    return ~asc


def make_data(log2n):
    n = 1 << log2n
    rng = np.random.default_rng(0)
    x = np.full(n, -np.inf, dtype=np.float32)
    valid = rng.random(n) < 0.35                  # ~35% valid lanes
    nv = int(valid.sum())
    # jaccard-like: many small rationals (heavy ties) + a continuous tail
    half = np.repeat(np.float32(1.0) / np.arange(1, 64, dtype=np.float32),
                     nv // 64 + 1)[: nv // 2]
    pool = np.concatenate([half, rng.random(nv - half.shape[0],
                                            dtype=np.float32)])
    rng.shuffle(pool)
    x[valid] = pool
    return jnp.asarray(x)


def run(name, fn, x):
    f = jax.jit(fn)
    v = jax.device_get(f(jnp.float32(0.0), x))    # compile+warm
    t0 = time.perf_counter()
    v = jax.device_get(f(jnp.float32(1.0), x))
    dt = (time.perf_counter() - t0) * 1e3 / N
    print(f"{name}: {dt:.1f} ms  (checksum {float(np.asarray(v).ravel()[0]):.3f})",
          flush=True)


def main():
    log2n = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    x = make_data(log2n)
    n = x.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)

    def a_raw(seed, x):
        def body(c, _):
            z = (c.astype(jnp.int32) >> 31).astype(jnp.float32)
            k, idx = jax.lax.sort((desc_key(x + z), iota), num_keys=1,
                                  is_stable=False)
            return c + idx[:K].sum().astype(jnp.float32) * 0 + \
                k[0].astype(jnp.float32) * 1e-12, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    def b_spread(seed, x):
        def body(c, _):
            z = (c.astype(jnp.int32) >> 31).astype(jnp.float32)
            xv = x + z
            dk = desc_key(xv)
            dk = jnp.where(jnp.isfinite(xv), dk,
                           jnp.uint32(0x80000000) | iota.astype(jnp.uint32))
            k, idx = jax.lax.sort((dk, iota), num_keys=1, is_stable=False)
            return c + idx[:K].sum().astype(jnp.float32) * 0 + \
                k[0].astype(jnp.float32) * 1e-12, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    def c_topk(seed, x):
        def body(c, _):
            z = (c.astype(jnp.int32) >> 31).astype(jnp.float32)
            vals, idx = jax.lax.top_k(x + z, K)
            return c + vals[0] * 1e-12 + idx[0].astype(jnp.float32) * 0, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    def d_twopass(seed, x):
        def body(c, _):
            z = (c.astype(jnp.int32) >> 31).astype(jnp.float32)
            xv = x + z
            dk = desc_key(xv)
            dk = jnp.where(jnp.isfinite(xv), dk,
                           jnp.uint32(0x80000000) | iota.astype(jnp.uint32))
            # binary search the k-th smallest desc-key (31 reduction steps)
            def step(state, shift):
                lo = state
                cand = lo | (jnp.uint32(1) << shift)
                cnt = jnp.sum((dk < cand).astype(jnp.int32))
                return jnp.where(cnt >= K, lo, cand), None
            tau, _ = jax.lax.scan(
                step, jnp.uint32(0),
                jnp.arange(31, -1, -1, dtype=jnp.uint32))
            # spread everything above tau, sort (survivors cluster in front)
            dk2 = jnp.where(dk <= tau, dk,
                            jnp.uint32(0x80000000) | iota.astype(jnp.uint32))
            k, idx = jax.lax.sort((dk2, iota), num_keys=1, is_stable=False)
            return c + k[0].astype(jnp.float32) * 1e-12 + \
                idx[:K].sum().astype(jnp.float32) * 0, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    for name, fn in (("A raw sort", a_raw), ("B spread sort", b_spread),
                     ("C top_k", c_topk), ("D 2-pass", d_twopass)):
        if name[0] in os.environ.get("AB_SKIP", ""):
            continue
        try:
            run(name, fn, x)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
