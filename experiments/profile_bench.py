"""Per-op device-time breakdown of the EXACT bench.py configuration.

Replicates bench.py's graph/batch/options (RMAT-18, 0.1|E| removed, LHub-64
jaccard, k = #removed/2) and prints the aggregated per-op table — the basis for
deciding where the next optimization dollar goes.  Run alone on the chip
(serialize device experiments; see experiments/README.md rule 4).
"""
import os
import numpy as np

from linkpred_tpu import PredictOptions, predict_links
from linkpred_tpu.bench.synth import rmat_graph
from linkpred_tpu.ops.batch import apply_batch, generate_edge_deletions, tidy_batch
from linkpred_tpu.predict.plan import build_plan
from linkpred_tpu.utils.profiling import profile_fn

scale = int(os.environ.get("BENCH_SCALE", "18"))
cap = int(os.environ.get("BENCH_CAP", str(1 << 20)))
g = rmat_graph(scale, edge_factor=16, seed=42)
rng = np.random.default_rng(0)
deletions = generate_edge_deletions(rng, g, int(0.1 * g.size / 2), undirected=True)
deletions, insertions = tidy_batch(deletions, np.empty((0, 2), np.int64), g)
y = apply_batch(g, deletions, insertions)
plan = build_plan(y, 64, cap=cap)
print(f"n={y.n} m={y.m} slots={plan.total_slots} tiles={plan.num_tiles} "
      f"(padded {plan.num_tiles_padded}) cap=2^{cap.bit_length()-1}", flush=True)
o = PredictOptions(repeat=1, max_edges=max(deletions.shape[0] // 2, 1))

r = predict_links(y, metric="jaccard_coefficient", min_degree1=64, options=o, plan=plan)
print("warm scoring_ms", r.scoring_ms, flush=True)

r, table = profile_fn(
    predict_links, y, metric="jaccard_coefficient", min_degree1=64,
    options=o, plan=plan, top=30)
print("traced scoring_ms", r.scoring_ms, flush=True)
for name, ms in table:
    print(f"{ms:10.1f} ms  {name[:110]}")
