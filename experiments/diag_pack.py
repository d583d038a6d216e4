"""Does the pack selection engage at the bench shape?  Reproduce the scan's
selection-key buffer, compute the sampled threshold + per-chunk survivor
counts, and report the cond decision (host fetch of scalars only).

Run alone on the chip:  BENCH_SCALE=21 python experiments/diag_pack.py
"""
import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from linkpred_tpu.graph import CSRGraph  # noqa: E402
from linkpred_tpu.predict.plan import build_plan  # noqa: E402
from linkpred_tpu.predict import scoring  # noqa: E402
from linkpred_tpu.predict.metrics import METRICS  # noqa: E402
from linkpred_tpu.ops.compact import (PACK_CHUNK, PACK_RATIO,  # noqa: E402
                                      pack_survivors, sample_threshold)

scale = int(os.environ.get("BENCH_SCALE", "21"))
cache = os.path.join(os.environ.get("BENCH_CACHE_DIR",
                                    "/tmp/linkpred_bench_cache"),
                     f"rmat{scale}_e16_s42_f0.1.npz")
with np.load(cache) as d:
    y = CSRGraph(offsets=d["offsets"], indices=d["indices"],
                 degrees=d["degrees"], weights=None,
                 n=int(d["n"]), m=int(d["m"]))
    deletions = d["deletions"]
# the ENGINE's selection k, not the raw request: api.py rounds max_edges to
# a 1024 multiple (round-5 lesson: this script modeled the raw k while the
# engine used next_pow2(k) — 1.88x more survivors — and reported "engaged"
# for a cond that was falling back in the real program)
k = -(-max(deletions.shape[0] // 2, 1) // 1024) * 1024
plan = build_plan(y, 64)
stream, ts = plan.device_stream()
metrics = (METRICS["jaccard_coefficient"],)
deg = jnp.asarray(y.degrees)
key64 = scoring.default_key64()


@partial(jax.jit, static_argnames=("cap",))
def skey_stats(stream, ts, degrees, *, cap):
    stream_fn = scoring._make_stream_fn(
        jnp.zeros((1,), jnp.int32), degrees, stream, metrics, cap, 0,
        jnp.float32(0.0), plan.w_bits, True, True, True, key64, True)

    def body(carry, bounds):
        t_start, t_end = bounds
        out = jax.lax.cond(t_start < t_end,
                           lambda: stream_fn(t_start, t_end),
                           lambda: (jnp.broadcast_to(
                               jnp.uint32(0xFF800000)
                               | (jax.lax.broadcasted_iota(
                                   jnp.int32, (cap,), 0)
                                  & jnp.int32(0x7FFFFE)).astype(jnp.uint32),
                               (1, cap)),
                               jnp.zeros((cap,), jnp.int32),
                               jnp.zeros((cap,), jnp.int32)))
        return carry, out[0]
    _, skeys = jax.lax.scan(body, 0, (ts[:-1], ts[1:]))
    flat = skeys.reshape(-1)
    kk = min(k, flat.shape[0])
    pad = -flat.shape[0] % PACK_CHUNK
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.full((pad,), jnp.uint32(0xFFFFFFFF))])
    thr, qi = sample_threshold(flat, kk)
    pk, pidx, cnt = pack_survivors(flat, thr)
    return (thr, jnp.sum(cnt), jnp.max(cnt),
            jnp.sum((cnt > PACK_CHUNK // PACK_RATIO).astype(jnp.int32)))


thr, surv, mx, nover = jax.device_get(skey_stats(stream, ts, deg,
                                                 cap=plan.cap))
kk = min(k, plan.num_tiles_padded * plan.cap)
w = PACK_CHUNK // PACK_RATIO
print(f"kk={kk} thr={int(thr):#010x} survivors={int(surv)} "
      f"({int(surv)/kk:.2f}x kk) max_chunk={int(mx)} budget={w} "
      f"chunks_over={int(nover)} ok={int(surv) >= kk and int(mx) <= w}",
      flush=True)
