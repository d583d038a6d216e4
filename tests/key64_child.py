"""Child process for test_key64: oracle-exactness of the experimental u64-key
engine (LINKPRED_KEY64=1 + JAX_ENABLE_X64=1, set by the parent test).

Covers every sort the flag rewires:
  * packed deg16 tile sort      (u64 key = w<<32|src, u32 degree-pack payload)
  * packed wide-degree tile sort (u64 key + u64 degree-pack payload; forced by
    a >=2^16-degree hub with the degree-regime split disabled)
  * edge-stream killer sort      (killer flag ordered by key VALUE, not by
    stream order + stability)
Selection is the shared u32 (key, index) blocked path in both engine modes
(the u64 single-operand variant measured slower once blocked and was
removed); the parent shrinks LINKPRED_SEL_BLOCK so it runs multi-level here.
"""
import os
import sys

assert os.environ.get("LINKPRED_KEY64") == "1"
assert os.environ.get("JAX_ENABLE_X64") == "1"
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.config.jax_enable_x64

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))  # repo root: linkpred_tpu package
sys.path.insert(0, _here)                   # tests: conftest/oracle helpers
from conftest import random_graph  # noqa: E402
from oracle import oracle_scores  # noqa: E402

from linkpred_tpu import PredictOptions, from_edges, predict_links  # noqa: E402
from linkpred_tpu.ops.transform import remove_self_loops, symmetrize  # noqa: E402
from linkpred_tpu.predict.plan import build_plan  # noqa: E402

rng = np.random.default_rng(11)


def check(g, metric, deg, plan=None, cap=4096, tag=""):
    pairs = oracle_scores(g, metric, deg)
    res = predict_links(g, metric=metric, min_degree1=deg,
                        options=PredictOptions(max_edges=10_000), plan=plan,
                        cap=cap)
    assert len(res) == min(10_000, len(pairs)), (tag, len(res), len(pairs))
    for u, v, s in zip(res.u, res.v, res.score):
        assert (int(u), int(v)) in pairs, (tag, u, v)
        assert np.isclose(s, pairs[(int(u), int(v))], rtol=1e-5), \
            (tag, u, v, s, pairs[(int(u), int(v))])
    print(f"OK {tag}: {len(res)} rows oracle-exact", flush=True)


# packed deg16 path (the default for small degrees), weighted + unweighted
g = random_graph(rng, n=200, avg_deg=6)
check(g, "jaccard_coefficient", 0, tag="packed-deg16 jaccard IHub")
check(g, "adamic_adar", 8, tag="packed-deg16 AA LHub (weights payload)")

# edge stream: killer slots must still head their runs without sort stability
plan = build_plan(g, 0, cap=4096, slot_budget=0)
assert not plan.packed and plan.keyed
check(g, "common_neighbors", 0, plan=plan, tag="edge-stream killers CN")

# wide-degree (non-deg16) packed path: a >=2^16-degree hub flips the plan's
# deg16 bit; LINKPRED_DEG_SPLIT=0 (set by the parent) keeps every slot on the
# wide path instead of re-splitting them back into a deg16 substream.
assert os.environ.get("LINKPRED_DEG_SPLIT") == "0"
core_u, core_v = np.nonzero(rng.random((120, 120)) < 0.08)
hub = 120
n_leaves = (1 << 16) + 50
leaves = np.arange(hub + 1, hub + 1 + n_leaves)
u = np.concatenate([core_u, np.full(n_leaves, hub)])
v = np.concatenate([core_v, leaves])
g2 = remove_self_loops(symmetrize(from_edges(u, v, n=hub + 1 + n_leaves)))
assert int(np.asarray(g2.degrees).max()) >= (1 << 16)
plan2 = build_plan(g2, 64, cap=4096)
assert plan2.packed and not plan2.deg16
# The dense oracle is infeasible at n=65k, but under LHub-64 the hub is never
# a mid (degree too high) and each leaf's only mid IS the hub — so the
# candidate set and every score equal those of the 120-vertex core alone
# (core degrees are untouched: the hub has no core edges).
g_core = remove_self_loops(symmetrize(from_edges(core_u, core_v, n=120)))
pairs = oracle_scores(g_core, "salton_cosine_similarity", 64)
res = predict_links(g2, metric="salton_cosine_similarity", min_degree1=64,
                    options=PredictOptions(max_edges=10_000), plan=plan2,
                    cap=4096)
assert len(res) == len(pairs), (len(res), len(pairs))
for u, v, s in zip(res.u, res.v, res.score):
    assert np.isclose(s, pairs[(int(u), int(v))], rtol=1e-5), (u, v, s)
print(f"OK packed wide-degree (u64 degree pack): {len(res)} rows "
      "oracle-exact", flush=True)

print("key64 child: all paths oracle-exact", flush=True)
