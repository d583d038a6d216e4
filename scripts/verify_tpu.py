"""End-to-end oracle drive on the CURRENT jax backend (real TPU by default).

Unit tests pin the CPU mesh (tests/conftest.py); this script is the
verify-on-hardware companion: dense-oracle-exact jaccard + adamic_adar
(the accurate-log device path) on a 200-vertex ER graph.

    python scripts/verify_tpu.py              # axon TPU
    JAX_PLATFORMS=cpu python scripts/verify_tpu.py   # CPU sanity
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax  # noqa: E402

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    # The host sitecustomize pins the axon TPU backend regardless of
    # JAX_PLATFORMS; honor the env explicitly (during a relay outage the axon
    # init hangs, so this must happen before the first device touch).
    jax.config.update("jax_platforms", "cpu")

print("devices:", jax.devices())
import linkpred_tpu as lp  # noqa: E402

rng = np.random.default_rng(7)
n = 200
A = (rng.random((n, n)) < 0.08)
A = np.triu(A, 1); A = A | A.T
src, dst = np.nonzero(A)
g = lp.from_edges(src, dst)
deg = A.sum(1)

res = lp.predict_links(g, metric="jaccard_coefficient", min_degree1=0,
                       options=lp.PredictOptions(max_edges=500))
CN = (A.astype(np.int64) @ A.astype(np.int64))
want = {}
for u in range(n):
    for v in range(u+1, n):
        if A[u, v]: continue
        c = CN[u, v]
        if c <= 0: continue
        want[(u, v)] = c / (deg[u] + deg[v] - c)
assert len(res) > 0
for u, v, s in zip(res.u, res.v, res.score):
    key = (min(int(u),int(v)), max(int(u),int(v)))
    assert key in want and np.isclose(s, want[key], rtol=1e-5), (key, s)
top = sorted(want.values(), reverse=True)[:len(res)]
assert np.allclose(sorted(res.score.tolist(), reverse=True), top, rtol=1e-5)
print(f"OK: jaccard {len(res)} rows oracle-exact on this device; top {res.score[0]:.4f}")

res2 = lp.predict_links(g, metric="adamic_adar", min_degree1=0,
                        options=lp.PredictOptions(max_edges=500))
wantAA = {}
for u in range(n):
    for v in range(u+1, n):
        if A[u, v]: continue
        mids = np.nonzero(A[u] & A[v])[0]
        mids = mids[deg[mids] > 1]
        if mids.size == 0: continue
        s = float(np.sum(1.0/np.log(deg[mids].astype(np.float64))))
        if s > 0: wantAA[(u, v)] = s
assert len(res2) > 0
for u, v, s in zip(res2.u, res2.v, res2.score):
    key = (min(int(u),int(v)), max(int(u),int(v)))
    assert key in wantAA and np.isclose(s, wantAA[key], rtol=1e-5), (key, s, wantAA.get(key))
print(f"OK: adamic_adar {len(res2)} rows oracle-exact (accurate-log device path)")
