"""Quantify multi-device overhead of the sharded path on the virtual CPU mesh.

Real multi-chip hardware doesn't exist in this environment, so speedup can't
be measured — but the OVERHEAD of the sharded machinery can: walltime of the
same fixed plan on 1/2/4/8 virtual CPU devices, per-device slot counts, and
the all_gather merge volume.  On CPU all "devices" share one physical core,
so ideal behavior is FLAT walltime vs D (same total work, zero-cost
collectives); any growth above flat is sharding/merge overhead.  This is the
table a future real-hardware run is judged against (BASELINE ≥80% efficiency
at 2 hosts; the reference publishes 1.6x/thread-doubling, README.md:9).

Merge model (parallel/mesh.py:206-214): per chunk dispatch, each device
all_gathers the TopK buffers — 3 arrays x M metrics x k entries x 4 B from
each of the other D-1 devices.  Gathers per run = ceil(T_loc / chunk).

Run: python experiments/mesh_overhead.py   (forces the 8-device CPU mesh)
"""
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import math
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from linkpred_tpu import PredictOptions, predict_links  # noqa: E402
from linkpred_tpu.bench.synth import rmat_graph  # noqa: E402
from linkpred_tpu.parallel.mesh import make_mesh, shard_stream_for_mesh  # noqa: E402
from linkpred_tpu.predict.plan import build_plan  # noqa: E402
from linkpred_tpu.predict.scoring import CHUNK_TILES_PACKED  # noqa: E402

SCALE = int(os.environ.get("MO_SCALE", "15"))
DEG = int(os.environ.get("MO_DEG", "16"))
CAP = 1 << int(os.environ.get("MO_CAP_LOG2", "16"))
K = int(os.environ.get("MO_K", "2048"))
REPEAT = int(os.environ.get("REPEAT", "3"))
METRIC = "jaccard_coefficient"

print(f"devices: {jax.device_count()}  graph: RMAT-{SCALE}  deg={DEG} "
      f"cap={CAP} k={K}", flush=True)
g = rmat_graph(SCALE)
plan = build_plan(g, DEG, cap=CAP)
assert plan.packed
slots_total = int(plan.tile_start[-1])
tiles = len(plan.tile_start) - 1
print(f"plan: {tiles} tiles, {slots_total:,} slots", flush=True)
opts = PredictOptions(max_edges=K)

rows = []
base_scores = None
for d in (None, 1, 2, 4, 8):
    mesh = make_mesh(d) if d else None
    best = math.inf
    res = None
    for _ in range(REPEAT):
        t0 = time.perf_counter()
        res = predict_links(g, metric=METRIC, min_degree1=DEG, options=opts,
                            cap=CAP, plan=plan, mesh=mesh)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    if base_scores is None:
        base_scores = np.sort(np.asarray(res.score))
    else:
        np.testing.assert_allclose(np.sort(np.asarray(res.score)),
                                   base_scores, rtol=1e-6)
    if d:
        stream, ts, te = shard_stream_for_mesh(plan, mesh)
        slots_dev = int(stream[0].shape[1])
        t_loc = int(ts.shape[1]) if ts.ndim > 1 else int(ts.shape[0]) // d
        gathers = max(1, math.ceil(t_loc / CHUNK_TILES_PACKED))
        merge_mb = gathers * 3 * 1 * K * 4 * (d - 1) / 1e6
        rows.append((str(d), best, f"{slots_dev:,}", gathers,
                     f"{merge_mb:.2f}"))
        print(f"D={d}: wall {best:8.1f} ms  slots/dev {slots_dev:>10,}  "
              f"gathers {gathers}  merge recv {merge_mb:.2f} MB/dev",
              flush=True)
    else:
        rows.append(("single", best, f"{slots_total:,}", 0, "0"))
        print(f"single-device: wall {best:8.1f} ms", flush=True)

flat = rows[1][1]
print("\n| devices | walltime ms | slots/device | gathers | merge recv MB/dev "
      "| wall vs D=1 |")
print("|---|---|---|---|---|---|")
for name, ms, slots, gathers, mb in rows:
    rel = ms / flat if flat else float("nan")
    print(f"| {name} | {ms:.1f} | {slots} | {gathers} | {mb} | {rel:.2f}x |")
print("\nall shardings score-multiset-exact vs single-device", flush=True)
