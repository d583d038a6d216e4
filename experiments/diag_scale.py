"""Diagnose the s20->s21 per-slot cost doubling (VERDICT r2 item 1).

Breaks the bench-config device time into its constituent passes — main packed
scan, huge-hub sub-plan pass, host mega-hub fallback — and prints per-slot ns
for each, plus the plan's routing stats (how many slots ride which path, what
cap the hub sub-plan chose, whether the deferred selection went hierarchical).

Usage: BENCH_SCALE=21 python experiments/diag_scale.py
Run alone on the chip (experiments/README.md rule 4).
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

# Touch the device BEFORE the long host-side plan build: the axon relay's
# backend init fails if the first device use happens minutes after import.
print("devices:", jax.devices(), jnp.zeros(1).block_until_ready().shape,
      flush=True)

from linkpred_tpu import PredictOptions, predict_links
from linkpred_tpu.bench.synth import rmat_graph
from linkpred_tpu.graph import CSRGraph
from linkpred_tpu.ops.batch import apply_batch, generate_edge_deletions, tidy_batch
from linkpred_tpu.predict.plan import build_plan
from linkpred_tpu.predict.scoring import (CHUNK_TILES, CHUNK_TILES_PACKED,
                                          _seg_lanes, score_tiles_chunked)
from linkpred_tpu.utils.timing import measure_duration

scale = int(os.environ.get("BENCH_SCALE", "21"))
cache = f"/tmp/linkpred_bench_cache/rmat{scale}_e16_s42_f0.1.npz"
if os.path.exists(cache):
    with np.load(cache) as d:
        y = CSRGraph(offsets=d["offsets"], indices=d["indices"],
                     degrees=d["degrees"], weights=None,
                     n=int(d["n"]), m=int(d["m"]))
        deletions = d["deletions"]
    print(f"loaded cache {cache}", flush=True)
else:
    g = rmat_graph(scale, edge_factor=16, seed=42)
    rng = np.random.default_rng(0)
    deletions = generate_edge_deletions(rng, g, int(0.1 * g.size / 2),
                                        undirected=True)
    deletions, insertions = tidy_batch(deletions, np.empty((0, 2), np.int64), g)
    y = apply_batch(g, deletions, insertions)
    os.makedirs(os.path.dirname(cache), exist_ok=True)
    np.savez(cache, offsets=np.asarray(y.offsets),
             indices=np.asarray(y.indices), degrees=np.asarray(y.degrees),
             n=np.int64(y.n), m=np.int64(y.m), deletions=deletions)
    print(f"built + cached {cache}", flush=True)

deg = np.asarray(y.degrees)
print(f"n={y.n} m={y.m} max_deg={deg.max()} "
      f"verts>=2^16 deg: {(deg >= 1 << 16).sum()} "
      f"(deg mass {deg[deg >= 1 << 16].sum() / max(deg.sum(), 1):.4f})",
      flush=True)

t0 = time.perf_counter()
cap_env = os.environ.get("CAP")
plan = build_plan(y, 64, cap=int(cap_env) if cap_env else None)
print(f"plan build {time.perf_counter() - t0:.1f}s", flush=True)


def describe(p, label):
    if p is None:
        print(f"{label}: None", flush=True)
        return
    t_pad = p.num_tiles_padded
    lanes = t_pad * p.cap
    print(f"{label}: slots={p.total_slots:,} tiles={p.num_tiles} "
          f"(padded {t_pad}) cap=2^{p.cap.bit_length()-1} deg16={p.deg16} "
          f"packed={p.packed} sel_lanes={lanes:,} "
          f"hier_sel={lanes > _seg_lanes() and t_pad > max(1, _seg_lanes() // p.cap)}",
          flush=True)


describe(plan, "main")
print(f"huge_src={plan.huge_src.size} huge_slots={plan.huge_slots:,} "
      f"host_src={plan.host_src.size}", flush=True)
describe(plan.huge_plan, "huge_plan")
describe(plan.side_plan, "side_plan")

k = int(os.environ.get("DIAG_K", str(1 << 20)))
names = ("jaccard_coefficient",)
gd = y.device()
import jax.numpy as jnp

min_score = jnp.float32(0.0)


def run_pass(p, label):
    stream, tile_start = p.device_stream()
    kwargs = dict(metric_names=names, cap=p.cap, k=k, maxf2=0,
                  w_bits=p.w_bits if p.keyed else 0, packed=p.packed,
                  deg16=p.deg16, upper_only=p.upper_only,
                  chunk=CHUNK_TILES_PACKED if p.packed else CHUNK_TILES)

    def go():
        return score_tiles_chunked(gd.indices, gd.degrees, stream,
                                   tile_start, min_score, **kwargs)

    ms, _ = measure_duration(go, repeat=int(os.environ.get("REPEAT", "3")))
    ns_slot = ms * 1e6 / max(p.total_slots, 1)
    print(f"{label}: {ms:.1f} ms  -> {ns_slot:.2f} ns/slot "
          f"({p.total_slots:,} slots)", flush=True)
    return ms


main_ms = run_pass(plan, "main pass")
huge_ms = side_ms = 0.0
if plan.huge_plan is not None:
    huge_ms = run_pass(plan.huge_plan, "huge pass")
if plan.side_plan is not None:
    side_ms = run_pass(plan.side_plan, "side pass")

host_ms = 0.0
if plan.host_src.size:
    from linkpred_tpu.predict.metrics import METRICS
    from linkpred_tpu.predict.scoring import score_huge_sources_host_multi

    t0 = time.perf_counter()
    score_huge_sources_host_multi(y, plan.host_src,
                                  (METRICS["jaccard_coefficient"],), 64, 0,
                                  0.0, k=k)
    host_ms = (time.perf_counter() - t0) * 1e3
    print(f"host pass: {host_ms:.1f} ms ({plan.host_src.size} sources)",
          flush=True)

if os.environ.get("DIAG_TRACE") == "1":
    # per-op device table of ONE main-pass run (the r2 bottleneck-finder)
    from linkpred_tpu.utils.profiling import summarize_trace, trace

    stream, tile_start = plan.device_stream()
    kwargs = dict(metric_names=names, cap=plan.cap, k=k, maxf2=0,
                  w_bits=plan.w_bits if plan.keyed else 0, packed=plan.packed,
                  deg16=plan.deg16, upper_only=plan.upper_only,
                  chunk=CHUNK_TILES_PACKED if plan.packed else CHUNK_TILES)
    with trace() as d:
        score_tiles_chunked(gd.indices, gd.degrees, stream, tile_start,
                            min_score, **kwargs)
    for name, ms in summarize_trace(d, top=30):
        print(f"  {ms:10.1f} ms  {name}", flush=True)

total = main_ms + huge_ms + side_ms + host_ms
all_slots = (plan.total_slots
             + (plan.huge_plan.total_slots if plan.huge_plan is not None else 0)
             + (plan.side_plan.total_slots if plan.side_plan is not None else 0))
print(f"TOTAL {total:.1f} ms; blended "
      f"{total * 1e6 / max(all_slots, 1):.2f} ns/slot over {all_slots:,} "
      f"device slots; rate = {y.m / (total / 1e3) / 1e6:.1f}M edges/s",
      flush=True)
