import time, numpy as np
from linkpred_tpu.bench.synth import rmat_graph
from linkpred_tpu import predict_links, PredictOptions
from linkpred_tpu.predict.plan import build_plan
g = rmat_graph(18, edge_factor=16, seed=42)
plan = build_plan(g, 64, cap=1<<20)
res = predict_links(g, metric="jaccard_coefficient", min_degree1=64,
                    options=PredictOptions(repeat=2, max_edges=4096), plan=plan)
import os
print(f"cond={os.environ.get('LINKPRED_TILE_COND','1')}: scoring {res.scoring_ms:.0f} ms "
      f"({g.m/res.scoring_ms*1e3/1e6:.2f}M edges/s)", flush=True)
