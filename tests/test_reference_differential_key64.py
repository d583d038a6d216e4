"""The u64-key engine (the bench default) must ALSO agree with the compiled
reference binary.  LINKPRED_KEY64 is process-global (read at import +
requires JAX_ENABLE_X64), so the whole differential module re-runs in a
child pytest with the key64 environment — the same oracle, the strictest
cross-check the bench mode can get."""
import os
import shutil
import subprocess
import sys

import pytest


def test_reference_differential_in_key64_mode():
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    env = dict(os.environ,
               LINKPRED_KEY64="1",
               JAX_ENABLE_X64="1",
               JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-m", "pytest",
         os.path.join(os.path.dirname(__file__),
                      "test_reference_differential.py"),
         "-q", "-x", "-p", "no:cacheprovider"],
        env=env, timeout=540, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert " passed" in r.stdout
