"""A/B for the non-deg16 packed path (hub degrees >= 2^16, e.g. RMAT-20):

  A) status quo — udeg/wdeg ride the stable w-key sort as TWO extra int32
     payloads (each also a slot-stream array in HBM: window-read per tile);
  B) gather-late — 2-operand sort (key, src), then TWO full-cap gathers
     degrees[src] / degrees[key] AFTER the sort (degrees only matter at run
     boundaries, but gathers are whole-lane anyway).

B also halves the slot stream (2 int32/slot instead of 4), doubling the
effective SLOT_BUDGET.  Measured winner decides the plan layout.
"""
import numpy as np
import jax
import jax.numpy as jnp

from linkpred_tpu.ops.segment import cummax
from linkpred_tpu.utils.timing import measure_duration

CAP = 1 << 21
T = 16
N = 1 << 22  # vertex count (degree-table size)
W_BITS = 22

rng = np.random.default_rng(0)
slot_w = rng.integers(0, N, T * CAP, dtype=np.int32)
slot_u = rng.integers(0, N, T * CAP, dtype=np.int32)
degrees = rng.integers(1, 1 << 20, N, dtype=np.int32)  # forces non-deg16
slot_udeg = degrees[slot_u]
slot_wdeg = degrees[slot_w]
ts = np.arange(T + 1, dtype=np.int32) * CAP

iota = jax.lax.broadcasted_iota(jnp.int32, (CAP,), 0)


def reduce_tail(key, src, udeg, wdeg):
    neq = (key[1:] != key[:-1]) | (src[1:] != src[:-1])
    is_start = jnp.concatenate([jnp.ones((1,), bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), bool)])
    start = cummax(jnp.where(is_start, iota, 0))
    cnt = iota - start + 1
    valid = is_end & (key < (1 << W_BITS))
    s = cnt.astype(jnp.float32) / jnp.maximum(udeg + wdeg - cnt, 1).astype(jnp.float32)
    return jnp.where(valid, s, -jnp.inf), src, key


def tile_a(sw, su, sud, swd, t0):
    win = lambda a: jax.lax.dynamic_slice(a, (t0,), (CAP,))
    key, src, ud, wd = win(sw), win(su), win(sud), win(swd)
    key, src, ud, wd = jax.lax.sort((key, src, ud, wd), num_keys=1,
                                    is_stable=True)
    return reduce_tail(key, src, ud, wd)


def tile_b(sw, su, deg, t0):
    win = lambda a: jax.lax.dynamic_slice(a, (t0,), (CAP,))
    key, src = win(sw), win(su)
    key, src = jax.lax.sort((key, src), num_keys=1, is_stable=True)
    ud = deg[jnp.minimum(src, N - 1)]
    wd = deg[jnp.minimum(key, N - 1)]
    return reduce_tail(key, src, ud, wd)


def make(variant):
    if variant == "A":
        def run(sw, su, sud, swd, ts):
            def body(c, t0):
                return c, jax.tree.map(jnp.sum, tile_a(sw, su, sud, swd, t0))
            return jax.lax.scan(body, 0, ts[:-1])[1]
        return jax.jit(run), (slot_w, slot_u, slot_udeg, slot_wdeg, ts)
    def run(sw, su, deg, ts):
        def body(c, t0):
            return c, jax.tree.map(jnp.sum, tile_b(sw, su, deg, t0))
        return jax.lax.scan(body, 0, ts[:-1])[1]
    return jax.jit(run), (slot_w, slot_u, degrees, ts)


if __name__ == "__main__":
    for name in ("A", "B"):
        fn, args = make(name)
        dargs = jax.tree.map(jnp.asarray, args)
        ms, _ = measure_duration(lambda: fn(*dargs), repeat=3)
        print(f"{name}: {ms:.1f} ms total, {ms / T:.2f} ms/tile", flush=True)

# MEASURED (v5e, 2^21-lane tiles, 2^22-vertex degree table, repeat=3):
#   A (degrees as 2 sort payloads):  7.97 ms/tile
#   B (2-op sort + 2 post-sort gathers): 39.68 ms/tile  -- 5x WORSE
# Gathers are per-lane bound (~17.6 ms per 2^21 lanes) and INDEPENDENT of
# table size (2^15 VMEM-sized table == 2^22 HBM table, measured separately),
# so no small-table/hub-escape indirection can win either.  The non-deg16
# path keeps the degree payloads; its one-extra-operand cost vs deg16
# (~3 ms/tile) is the honest floor.
