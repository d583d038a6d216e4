"""Round-4 diagnostic: where does s21 device time go with the fused tail +
pack selection, and does the pack path actually engage (or cond-fallback)?

Loads the bench cache (run `BENCH_SCALE=21 python bench.py` once first),
profiles one scoring pass, and separately reproduces the selection inputs to
report the sampled threshold's survivor counts vs the pack budget.

Run alone on the chip:  BENCH_SCALE=21 python experiments/diag_s21.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from linkpred_tpu import PredictOptions, predict_links  # noqa: E402
from linkpred_tpu.graph import CSRGraph  # noqa: E402
from linkpred_tpu.predict.plan import build_plan  # noqa: E402
from linkpred_tpu.utils.profiling import profile_fn  # noqa: E402

scale = int(os.environ.get("BENCH_SCALE", "21"))
cache = os.path.join(os.environ.get("BENCH_CACHE_DIR",
                                    "/tmp/linkpred_bench_cache"),
                     f"rmat{scale}_e16_s42_f0.1.npz")
with np.load(cache) as d:
    y = CSRGraph(offsets=d["offsets"], indices=d["indices"],
                 degrees=d["degrees"], weights=None,
                 n=int(d["n"]), m=int(d["m"]))
    deletions = d["deletions"]
k = max(deletions.shape[0] // 2, 1)
plan = build_plan(y, 64)
print(f"n={y.n} m={y.m} tiles={plan.num_tiles_padded} cap=2^"
      f"{plan.cap.bit_length()-1} k={k} packed={plan.packed} "
      f"deg16={plan.deg16}", flush=True)
o = PredictOptions(repeat=1, max_edges=k)

r = predict_links(y, metric="jaccard_coefficient", min_degree1=64,
                  options=o, plan=plan)
print("warm scoring_ms", r.scoring_ms, flush=True)

# --- does the pack selection engage?  Reproduce its decision inputs --------
if os.environ.get("DIAG_PACK", "1") == "1":
    from linkpred_tpu.ops.compact import (PACK_CHUNK, PACK_RATIO,
                                          sample_threshold)
    from linkpred_tpu.predict import scoring

    total = int(plan.tile_slot_start[-1])
    t_pad = plan.num_tiles_padded
    cap = plan.cap
    lanes_total = t_pad * cap
    kk = min(k, lanes_total)
    engaged = (lanes_total >= scoring._sel_pack_min()
               and kk * 4 <= lanes_total // PACK_RATIO)
    print(f"selection lanes={lanes_total} kk={kk} engage={engaged}",
          flush=True)

r, table = profile_fn(
    predict_links, y, metric="jaccard_coefficient", min_degree1=64,
    options=o, plan=plan, top=30)
print("traced scoring_ms", r.scoring_ms, flush=True)
for name, ms in table:
    print(f"{ms:10.1f} ms  {name[:110]}")
