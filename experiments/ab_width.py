"""A/B: does lax.sort cost scale with operand COUNT or operand BYTES?

Round-2 established the engine sits within ~2x of the lax.sort floor and that
fewer/cheaper lanes (not a faster sort) are the remaining lever.  This probes
a dimension never measured: narrower payload dtypes and u64 key packing.

Shapes mirror the bench tiles: N = 2^21 lanes, keys uniform u32.
Variants:
  scan-3x32   (u32 key, u32, u32)        — today's deg16 tile sort
  scan-2x32   (u32 key, u32)             — hypothetical (no degree payload)
  scan-32+16  (u32 key, u32, u16)        — deg8 pair packed to 16 bits
  scan-32+8   (u32 key, u32, u8)         — degenerate probe (bytes vs count)
  scan-u64+32 (u64 key = w<<21|u, u32)   — 2 operands, run id in ONE key
  sel-2x32    (u32 key, u32 iota)        — today's deferred selection
  sel-u64     (u64 key = score<<27|iota) — ONE operand selection
Run alone on the chip.  REPEAT env (default 5).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from linkpred_tpu.utils.timing import measure_duration  # noqa: E402

N = 1 << 21
REPEAT = int(os.environ.get("REPEAT", "5"))
rng = np.random.default_rng(0)
k32 = jnp.asarray(rng.integers(0, 1 << 21, N, dtype=np.int64).astype(np.uint32))
p32a = jnp.asarray(rng.integers(0, 1 << 21, N, dtype=np.int64).astype(np.int32))
p32b = jnp.asarray(rng.integers(0, 1 << 31, N, dtype=np.int64).astype(np.int32))
p16 = jnp.asarray(rng.integers(0, 1 << 16, N, dtype=np.int64).astype(np.uint16))
p8 = jnp.asarray(rng.integers(0, 1 << 8, N, dtype=np.int64).astype(np.uint8))
k64 = (k32.astype(jnp.uint64) << jnp.uint64(21)) | p32a.astype(jnp.uint64)
sel64 = (k32.astype(jnp.uint64) << jnp.uint64(27)) \
    | jnp.arange(N, dtype=jnp.uint64)


def bench(name, ops, num_keys=1, stable=True):
    fn = jax.jit(lambda *a: jax.lax.sort(a, num_keys=num_keys,
                                         is_stable=stable))
    try:
        ms, _ = measure_duration(lambda: fn(*ops), repeat=REPEAT)
        print(f"{name:12s} {ms:7.2f} ms / 2^21 lanes", flush=True)
    except Exception as e:  # dtype unsupported etc.
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


bench("scan-3x32", (k32, p32a, p32b))
bench("scan-2x32", (k32, p32a))
bench("scan-32+16", (k32, p32a, p16))
bench("scan-32+8", (k32, p32a, p8))
bench("scan-u64+32", (k64, p32b))
bench("scan-u64+32u", (k64, p32b), stable=False)
bench("sel-2x32", (k32, p32a), stable=False)
bench("sel-u64", (sel64,), stable=False)
bench("sel-u64-st", (sel64,))
