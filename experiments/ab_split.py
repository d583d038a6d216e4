"""A/B: tile-scan-only vs full pass (scan + deferred selection) at bench config.

Honest-sync timing of two jits; the difference isolates the deferred selection
sort's true cost (the profiler's op attribution disagrees with wall-clock on
this relay host, so measure, don't trust traces).
"""
import os
import numpy as np
import jax
import jax.numpy as jnp

from linkpred_tpu.bench.synth import rmat_graph
from linkpred_tpu.ops.batch import apply_batch, generate_edge_deletions, tidy_batch
from linkpred_tpu.predict.metrics import METRICS
from linkpred_tpu.predict.plan import build_plan
from linkpred_tpu.predict.scoring import _make_stream_fn, scan_tiles
from linkpred_tpu.utils.timing import measure_duration

scale = int(os.environ.get("BENCH_SCALE", "18"))
g = rmat_graph(scale, edge_factor=16, seed=42)
rng = np.random.default_rng(0)
dels = generate_edge_deletions(rng, g, int(0.1 * g.size / 2), undirected=True)
dels, ins = tidy_batch(dels, np.empty((0, 2), np.int64), g)
y = apply_batch(g, dels, ins)
plan = build_plan(y, 64, cap=1 << 20)
k = 1 << 18
metrics = (METRICS["jaccard_coefficient"],)
gd = y.device()
stream, tile_start = plan.device_stream()
cap = plan.cap
print(f"slots={plan.total_slots} tiles={plan.num_tiles}/{plan.num_tiles_padded}",
      flush=True)


def make(selection: bool):
    def run(stream, ts, min_score):
        fn = _make_stream_fn(gd.indices, gd.degrees, stream,
                             metrics, cap, 0, min_score, plan.w_bits, plan.packed,
                             plan.deg16, plan.upper_only)
        if selection:
            return scan_tiles(fn, ts[:-1], ts[1:], k, 1, cap)

        def body(carry, se):
            out = jax.lax.cond(se[0] < se[1], lambda: fn(se[0], se[1]),
                               lambda: (jnp.full((1, cap), -jnp.inf, jnp.float32),
                                        jnp.zeros((cap,), jnp.int32),
                                        jnp.zeros((cap,), jnp.int32)))
            return carry, out
        _, outs = jax.lax.scan(body, 0, (ts[:-1], ts[1:]))
        return outs
    return jax.jit(run)

for name, fn in [("scan_only", make(False)), ("full", make(True))]:
    ms, _ = measure_duration(lambda: fn(stream, tile_start, jnp.float32(0.0)),
                             repeat=3)
    print(f"{name}: {ms:.1f} ms", flush=True)
