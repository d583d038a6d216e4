"""A/B: stable w-only-key sort vs the unstable packed-key sort (tile reduce).

Motivation: the packed key (u_local | w | flag) forces a tile source-span bound
(u_bits = 31 - w_bits), leaving tiles 40% full at RMAT-18 and worse at RMAT-20.
If the key is w ALONE and u rides as a payload, a STABLE sort keeps each
(w, u)-group contiguous (stream order is source-ascending) — no span bound, so
tiles fill to cap and the tile count drops ~2.5x.  Stability is load-bearing;
the question is its price.

  A. unstable (u32 packed key, i32 dpack)           — current engine sort
  B. stable   (i32 w key, i32 u|flag, i32 dpack)    — proposed
  C. unstable (i32 w key, i32 u|flag, i32 dpack)    — isolates stability cost
Per-2^20-tile times; honest scan harness.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

N = 8


def run(name, fn, *args):
    f = jax.jit(fn)
    jax.device_get(f(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    jax.device_get(f(jnp.float32(1.0), *args))
    print(f"{name}: {(time.perf_counter()-t0)*1e3/N:.2f} ms / 2^20",
          flush=True)


def main():
    n = 1 << 20
    rng = np.random.default_rng(0)
    # realistic tile: sources ascending, per-source runs of mid-sorted w
    u = np.sort(rng.integers(0, 4000, n, dtype=np.int32))
    w = rng.integers(0, 1 << 18, n, dtype=np.int32)
    dpack = rng.integers(0, 1 << 31, n, dtype=np.int32)
    packed = ((u.astype(np.uint32) << np.uint32(19))
              | (w.astype(np.uint32) << np.uint32(1)) | np.uint32(1))
    upay = (u << 1) | 1
    packed_j = jnp.asarray(packed)
    wj = jnp.asarray(w)
    uj = jnp.asarray(upay)
    dj = jnp.asarray(dpack)

    def a_unstable_packed(seed, key, d):
        def body(c, _):
            z = (c.astype(jnp.int32) >> 31).astype(jnp.uint32)
            k, dd = jax.lax.sort((key + z, d), num_keys=1, is_stable=False)
            return c + k[0].astype(jnp.float32) * 1e-12 + \
                dd[0].astype(jnp.float32) * 0, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    def b_stable_w(seed, key, up, d):
        def body(c, _):
            z = c.astype(jnp.int32) >> 31
            k, uu, dd = jax.lax.sort((key + z, up, d), num_keys=1,
                                     is_stable=True)
            return c + k[0].astype(jnp.float32) * 1e-12 + \
                (uu[0] + dd[0]).astype(jnp.float32) * 0, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    def c_unstable_w(seed, key, up, d):
        def body(c, _):
            z = c.astype(jnp.int32) >> 31
            k, uu, dd = jax.lax.sort((key + z, up, d), num_keys=1,
                                     is_stable=False)
            return c + k[0].astype(jnp.float32) * 1e-12 + \
                (uu[0] + dd[0]).astype(jnp.float32) * 0, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    def d_stable_2key(seed, key, up, d):
        def body(c, _):
            z = c.astype(jnp.int32) >> 31
            k, uu, dd = jax.lax.sort((key + z, up, d), num_keys=2,
                                     is_stable=False)
            return c + k[0].astype(jnp.float32) * 1e-12 + \
                (uu[0] + dd[0]).astype(jnp.float32) * 0, None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r

    run("A unstable packed 2op", a_unstable_packed, packed_j, dj)
    run("B stable w-key 3op   ", b_stable_w, wj, uj, dj)
    run("C unstable w-key 3op ", c_unstable_w, wj, uj, dj)
    run("D 2key (w,u) 3op     ", d_stable_2key, wj, uj, dj)


if __name__ == "__main__":
    main()
