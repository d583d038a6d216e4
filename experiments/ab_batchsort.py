"""A/B: batched [T, cap] dim-1 stable sort vs T sequential 1-D sorts.

Round-1 measured batched dim-1 sorts picking a T(1,128) layout ~10x slower at
M<=9 rows; with T=32 full tiles the layout choice may differ.  Also probes the
per-element scaling of the stable 3-op sort at 2^20 / 2^21 / 2^22 (explains the
cap sweep).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from linkpred_tpu.utils.timing import sync


def timeit(name, fn, *args):
    sync(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name}: {min(ts):.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    T, CAP = 32, 1 << 20
    w = jnp.asarray(rng.integers(0, 1 << 19, (T, CAP), dtype=np.int32))
    u = jnp.asarray(rng.integers(0, 1 << 20, (T, CAP), dtype=np.int32))
    d = jnp.asarray(rng.integers(0, 1 << 31, (T, CAP), dtype=np.int32))

    @jax.jit
    def batched(w, u, d):
        kw, ku, kd = jax.lax.sort((w, u, d), dimension=1, num_keys=1,
                                  is_stable=True)
        return kw[:, 0].sum() + ku[:, -1].sum() + kd[:, 0].sum()

    @jax.jit
    def sequential(w, u, d):
        def body(c, xs):
            kw, ku, kd = jax.lax.sort(xs, num_keys=1, is_stable=True)
            return c + kw[0] + ku[-1] + kd[0], None
        c, _ = jax.lax.scan(body, jnp.int32(0), (w, u, d))
        return c

    timeit("batched [32,2^20] ", batched, w, u, d)
    timeit("sequential scan 32", sequential, w, u, d)

    for lg in (20, 21, 22):
        n = 1 << lg
        w1 = jnp.asarray(rng.integers(0, 1 << 19, n, dtype=np.int32))
        u1 = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.int32))
        d1 = jnp.asarray(rng.integers(0, 1 << 31, n, dtype=np.int32))

        @jax.jit
        def single(w1, u1, d1):
            kw, ku, kd = jax.lax.sort((w1, u1, d1), num_keys=1, is_stable=True)
            return kw[0] + ku[-1] + kd[0]

        timeit(f"single 2^{lg}       ", single, w1, u1, d1)


if __name__ == "__main__":
    main()
