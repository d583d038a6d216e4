import dataclasses, time, numpy as np
from linkpred_tpu.bench.synth import rmat_graph
from linkpred_tpu import predict_links, PredictOptions
from linkpred_tpu.predict.plan import build_plan
g = rmat_graph(13, edge_factor=12, seed=3)
plan = build_plan(g, 0, cap=1<<19, slot_budget=0)  # IHub, edge stream
print(f"IHub scale13: slots={plan.total_slots/1e6:.0f}M tiles={plan.num_tiles} packed={plan.packed} keyed={plan.keyed}", flush=True)
o = PredictOptions(repeat=2, max_edges=4096)
r1 = predict_links(g, metric="jaccard_coefficient", min_degree1=0, options=o, plan=plan)
print(f"keyed edge path:    {r1.scoring_ms:.0f} ms", flush=True)
plan2 = dataclasses.replace(plan, keyed=False)
r2 = predict_links(g, metric="jaccard_coefficient", min_degree1=0, options=o, plan=plan2)
print(f"sentinel edge path: {r2.scoring_ms:.0f} ms  (speedup {r2.scoring_ms/r1.scoring_ms:.1f}x)", flush=True)
np.testing.assert_allclose(np.sort(r1.score), np.sort(r2.score), rtol=1e-6)
print("outputs match", flush=True)
