"""Oracle-exactness of the experimental u64-key engine (LINKPRED_KEY64=1).

The flag is read at import time and requires JAX_ENABLE_X64, which is a
process-global config — so the actual checks run in a child process
(tests/key64_child.py).  See scoring.py `_KEY64` for what the flag rewires.
"""
import os
import subprocess
import sys


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
