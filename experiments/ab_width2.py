"""A/B v2: lax.sort cost by operand count/width, measured IN-JIT.

ab_width.py timed one sort per dispatch; on the relay-backed device every
sample pays a host round-trip, which inflates absolutes and compresses
ratios.  Here each timed program runs ITERS sorts inside one `lax.scan`
(each iteration XORs the key with a different constant, so the data stays
pseudo-shuffled and the compiler can't hoist or reuse the sort), and the
per-sort cost is (t(ITERS) - t(1)) / (ITERS - 1) — dispatch, transfer and
sync cancel exactly.

Variants (shapes mirror the bench tiles, N = 2^21 lanes):
  scan-3x32    (u32 key, u32, u32) stable     — today's deg16 tile sort
  scan-4x32    (u32 key, u32, u32, u32) st.   — today's wide-degree tile sort
  scan-2x32    (u32 key, u32) stable          — hypothetical floor
  scan-3x32+f  (u32 key, u32, u32, f32) st.   — deg16 + one AA/RA weight
  sel-2x32     (u32 key, i32 iota) unstable   — today's deferred selection
  sel-1x32     (u32 key) unstable             — 1-operand floor probe
  [x64 only]
  k64-2op      (u64 key, u32) unstable        — LINKPRED_KEY64 deg16 tile sort
  k64-2op64    (u64 key, u64) unstable        — LINKPRED_KEY64 wide-degree
  sel-1x64     (u64 key) unstable             — LINKPRED_KEY64 selection

Run on the TPU:            python experiments/ab_width2.py
u64 rows need x64:         JAX_ENABLE_X64=1 python experiments/ab_width2.py

MEASURED (v5e via relay, 2026-08-19, 2^21 lanes, ITERS=16, ms/sort):
  scan-3x32 3.91-4.12 | scan-4x32 4.35-4.61 | scan-2x32 3.28 |
  scan-3x32+f 4.58-4.80 | sel-2x32 1.78-1.81 | sel-1x32 0.97-1.05 |
  k64-2op 2.88 | k64-2op64 3.61 | sel-1x64 1.46
Takeaways: (1) the u64-key rewiring wins everywhere it applies — deg16 tile
sort -26%, wide-degree -22%, selection -18%; (2) ab_width.py's single-
dispatch numbers were relay-RTT-inflated (~16-20 ms/dispatch), which had
masked that stability is NOT free (stable 2x32 3.28 vs unstable 1.81) —
the key64 mode's stability removal is a large share of its win.
"""
import os
import sys

import numpy as np
import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    # the host sitecustomize pins the axon TPU regardless of JAX_PLATFORMS;
    # honor the env before the first device touch
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from linkpred_tpu.utils.timing import measure_duration  # noqa: E402

N = 1 << int(os.environ.get("LANES_LOG2", "21"))
ITERS = int(os.environ.get("ITERS", "16"))
REPEAT = int(os.environ.get("REPEAT", "3"))
X64 = bool(jax.config.jax_enable_x64)

rng = np.random.default_rng(0)


def mk(dtype, bits):
    a = rng.integers(0, 1 << bits, N, dtype=np.int64)
    return jnp.asarray(a.astype(dtype))


def iterated(ops, iters, num_keys=1, stable=True):
    """jit program: `iters` chained sorts; key re-deranged by XOR per iter."""
    xors = jnp.asarray(
        rng.integers(1, 1 << 21, iters, dtype=np.int64).astype(np.uint32))

    @jax.jit
    def run(ops):
        def body(carry, x):
            key, *pays = carry
            key = key ^ x.astype(key.dtype)
            out = jax.lax.sort((key, *pays), num_keys=num_keys,
                               is_stable=stable)
            return out, 0
        out, _ = jax.lax.scan(body, ops, xors)
        return out[0]

    return run


def bench(name, ops, num_keys=1, stable=True):
    try:
        f1 = iterated(ops, 1, num_keys, stable)
        fn = iterated(ops, ITERS, num_keys, stable)
        t1, _ = measure_duration(lambda: f1(ops), repeat=REPEAT)
        tn, _ = measure_duration(lambda: fn(ops), repeat=REPEAT)
        per = (tn - t1) / (ITERS - 1)
        print(f"{name:12s} {per:7.2f} ms/sort / 2^{int(np.log2(N))} lanes   "
              f"(t1 {t1:.1f}, t{ITERS} {tn:.1f})", flush=True)
    except Exception as e:
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


k32 = mk(np.uint32, 21)
a32 = mk(np.int32, 21)
b32 = mk(np.int32, 31)
c32 = mk(np.int32, 31)
f32 = jnp.asarray(rng.random(N, dtype=np.float32))

bench("scan-3x32", (k32, a32, b32))
bench("scan-4x32", (k32, a32, b32, c32))
bench("scan-2x32", (k32, a32))
bench("scan-3x32+f", (k32, a32, b32, f32))
bench("sel-2x32", (k32, a32), stable=False)
bench("sel-1x32", (k32,), stable=False)

if X64:
    k64 = (k32.astype(jnp.uint64) << jnp.uint64(32)) | \
        a32.astype(jnp.uint32).astype(jnp.uint64)
    p64 = (b32.astype(jnp.uint32).astype(jnp.uint64) << jnp.uint64(32)) | \
        c32.astype(jnp.uint32).astype(jnp.uint64)
    bench("k64-2op", (k64, b32), stable=False)
    bench("k64-2op64", (k64, p64), stable=False)
    bench("sel-1x64", (k64,), stable=False)
else:
    print("(x64 disabled: u64 rows skipped — rerun with JAX_ENABLE_X64=1)",
          flush=True)
