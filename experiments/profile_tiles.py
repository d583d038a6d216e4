import glob, gzip, json, time, os, numpy as np, jax, jax.numpy as jnp
from linkpred_tpu import predict_links, PredictOptions
from linkpred_tpu.bench.synth import rmat_graph
from linkpred_tpu.predict.plan import build_plan

g = rmat_graph(18, edge_factor=16, seed=42)
plan = build_plan(g, 64, cap=1<<20)
o = PredictOptions(repeat=1, max_edges=int(os.environ.get("PROF_MAXE", "4096")))
# warm up compile
r = predict_links(g, metric="jaccard_coefficient", min_degree1=64, options=o, plan=plan)
print("warm scoring_ms", r.scoring_ms, flush=True)

jax.profiler.start_trace("/tmp/jaxtrace")
r = predict_links(g, metric="jaccard_coefficient", min_degree1=64, options=o, plan=plan)
jax.profiler.stop_trace()
print("traced scoring_ms", r.scoring_ms, flush=True)

files = glob.glob("/tmp/jaxtrace/**/*.trace.json.gz", recursive=True)
print("trace files:", files)
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # aggregate device-side op durations by name
    agg = {}
    for e in evs:
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0) + e.get("dur", 0)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    for name, dur in top:
        print(f"{dur/1e3:10.1f} ms  {name[:110]}")
