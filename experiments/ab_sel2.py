"""A/B final-selection variants at production shape ([32, 1, 2^20] tile scores).

  A. sort2   — 2-op sort (desc key, iota) + 3 top-gathers       (shipped)
  B. sort1   — 1-op key sort -> tau = kth key -> nonzero(size=k) extraction
  C. topk    — jax.lax.top_k on the flat f32 scores
  D. approx  — jax.lax.approx_max_k (recall 0.95; NOT exact — reference point)

Timing: 3 synced runs each, min reported.  PYTHONPATH=/root/repo + axon.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from linkpred_tpu.predict.scoring import _desc_score_key
from linkpred_tpu.utils.timing import sync

T, CAP, K = 32, 1 << 20, 1 << 19
TOTAL = T * CAP


def timeit(name, fn, *args):
    r = sync(fn(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = sync(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"{name}: {min(ts):.1f} ms", flush=True)
    return r


def main():
    rng = np.random.default_rng(0)
    scores = np.full(TOTAL, -np.inf, np.float32)
    nv = int(TOTAL * 0.35)
    pos = rng.choice(TOTAL, nv, replace=False)
    half = np.repeat((1.0 / np.arange(1, 64)).astype(np.float32),
                     nv // 64 + 1)[: nv // 2]
    vals = np.concatenate([half, rng.random(nv - half.shape[0],
                                            dtype=np.float32)])
    rng.shuffle(vals)
    scores[pos] = vals
    fs = jnp.asarray(scores.reshape(T, 1, CAP))
    fu = jnp.asarray(rng.integers(0, 1 << 18, (T, CAP), dtype=np.int32))
    fv = jnp.asarray(rng.integers(0, 1 << 18, (T, CAP), dtype=np.int32))

    @jax.jit
    def a_sort2(scores, us, vs):
        flat = scores[:, 0, :].reshape(TOTAL)
        iota = jax.lax.broadcasted_iota(jnp.int32, (TOTAL,), 0)
        _, idx = jax.lax.sort((_desc_score_key(flat), iota), num_keys=1,
                              is_stable=False)
        top = idx[:K]
        return flat[top], us.reshape(TOTAL)[top], vs.reshape(TOTAL)[top]

    @jax.jit
    def b_sort1(scores, us, vs):
        flat = scores[:, 0, :].reshape(TOTAL)
        key = _desc_score_key(flat)
        skey = jax.lax.sort(key, is_stable=False)
        tau = skey[K - 1]
        # lanes strictly above tau, then fill with tau-ties (arbitrary order,
        # same multiset)
        strict = key < tau
        ties = key == tau
        n_strict = jnp.sum(strict.astype(jnp.int32))
        take_ties = K - n_strict
        tie_rank = jnp.cumsum(ties.astype(jnp.int32)) - 1
        sel = strict | (ties & (tie_rank < take_ties))
        idx = jnp.nonzero(sel, size=K, fill_value=0)[0]
        return flat[idx], us.reshape(TOTAL)[idx], vs.reshape(TOTAL)[idx]

    @jax.jit
    def c_topk(scores, us, vs):
        flat = scores[:, 0, :].reshape(TOTAL)
        vals, idx = jax.lax.top_k(flat, K)
        return vals, us.reshape(TOTAL)[idx], vs.reshape(TOTAL)[idx]

    @jax.jit
    def d_approx(scores, us, vs):
        flat = scores[:, 0, :].reshape(TOTAL)
        vals, idx = jax.lax.approx_max_k(flat, K, recall_target=0.95)
        return vals, us.reshape(TOTAL)[idx], vs.reshape(TOTAL)[idx]

    for name, fn in (("A sort2 ", a_sort2), ("B sort1 ", b_sort1),
                     ("C topk  ", c_topk), ("D approx", d_approx)):
        try:
            timeit(name, fn, fs, fu, fv)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
