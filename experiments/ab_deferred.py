"""Isolate the deferred-engine cost components at bench scale (RMAT-18 LHub-64).

Times three jitted programs on the real plan arrays:
  full  — score_tiles as shipped (scan + final selection)
  scan  — the tile scan only (ys reduced to checksums, no final sort)
  sel   — the final selection only (on ys-shaped random inputs)
Honest sync via utils.timing.sync; each timed thrice after warmup.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from linkpred_tpu import PredictOptions
from linkpred_tpu.bench.synth import rmat_graph
from linkpred_tpu.predict.plan import build_plan
from linkpred_tpu.predict import scoring
from linkpred_tpu.predict.metrics import METRICS
from linkpred_tpu.utils.timing import sync

MAXE = 380_000


def timeit(name, fn, *args):
    r = sync(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name}: {min(ts):.1f} ms (runs: {[round(t) for t in ts]})", flush=True)
    return r


def main():
    g = rmat_graph(18, edge_factor=16, seed=42)
    plan = build_plan(g, 64, cap=1 << 20)
    print(f"tiles={plan.num_tiles} padded={plan.num_tiles_padded} "
          f"slots={plan.total_slots} packed={plan.packed} deg16={plan.deg16}",
          flush=True)
    gd = g.device()
    stream, tile_start = plan.device_stream()
    metrics = (METRICS["jaccard_coefficient"],)
    k = 1 << 19
    cap = plan.cap
    min_score = jnp.float32(0.0)

    def full():
        # big arrays enter as jit ARGUMENTS (closure constants embed in the
        # HLO and break the remote compile endpoint)
        return scoring.score_tiles(
            gd.offsets, gd.indices, gd.degrees, stream,
            tile_start, min_score,
            metric_names=("jaccard_coefficient",), cap=cap, k=k,
            w_bits=plan.w_bits, packed=plan.packed, deg16=plan.deg16)

    @jax.jit
    def scan_impl(offsets, indices, degrees, stream, tile_start,
                  min_score):
        stream_fn = scoring._make_stream_fn(
            offsets, indices, degrees, stream, metrics, cap, 0,
            min_score, plan.w_bits, plan.packed, plan.deg16, True)

        def body(c, ts):
            t_start, t_end = ts
            out = jax.lax.cond(
                t_start < t_end,
                lambda: stream_fn(t_start, t_end),
                lambda: (jnp.full((1, cap), -jnp.inf, jnp.float32),
                         jnp.zeros((cap,), jnp.int32),
                         jnp.zeros((cap,), jnp.int32)))
            return c, out
        _, (scores, us, vs) = jax.lax.scan(
            body, 0, (tile_start[:-1], tile_start[1:]))
        return (jnp.sum(scores[:, :, ::1024]), jnp.sum(us[:, ::1024]),
                jnp.sum(vs[:, ::1024]))

    def scan_only():
        return scan_impl(gd.offsets, gd.indices, gd.degrees, stream,
                         tile_start, min_score)

    t_pad = plan.num_tiles_padded
    total = t_pad * cap
    rng = np.random.default_rng(0)
    fake_scores = np.full(total, -np.inf, np.float32)
    nv = int(total * 0.35)
    pos = rng.choice(total, nv, replace=False)
    fake_scores[pos] = rng.random(nv, dtype=np.float32)
    fs = jnp.asarray(fake_scores.reshape(t_pad, 1, cap))
    fu = jnp.zeros((t_pad, cap), jnp.int32)
    fv = jnp.zeros((t_pad, cap), jnp.int32)

    @jax.jit
    def sel_only(scores, us, vs):
        us = us.reshape(total)
        vs = vs.reshape(total)
        iota = jax.lax.broadcasted_iota(jnp.int32, (total,), 0)
        flat = scores[:, 0, :].reshape(total)
        _, idx = jax.lax.sort((scoring._desc_score_key(flat), iota),
                              num_keys=1, is_stable=False)
        top = idx[:k]
        return flat[top], us[top], vs[top]

    timeit("full ", full)
    timeit("scan ", scan_only)
    timeit("sel  ", sel_only, fs, fu, fv)


if __name__ == "__main__":
    main()
