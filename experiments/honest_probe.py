import sys, time, numpy as np, jax, jax.numpy as jnp
from linkpred_tpu.predict.scoring import tile_candidates
from linkpred_tpu.predict.metrics import METRICS

K = 32768
d = np.load('/tmp/bench18.npz')
cap = int(d['cap']); w_bits = int(d['w_bits'])
metric = METRICS["jaccard_coefficient"]
base = tuple(jnp.asarray(d[k]) for k in ('offsets','indices','degrees')) + (jnp.ones(1, jnp.float32),) + tuple(jnp.asarray(d[k]) for k in ('fe_src','fe_mid','fe_work','fe_cnt','tes','tss'))

@jax.jit
def f(ms, offsets, indices, degrees, wt_table, fe_src, fe_mid, fe_work, fe_cnt, tes, tss):
    def body(carry, ts):
        t_start, t_end, t_src = ts
        score, u, w = tile_candidates(offsets, indices, degrees, wt_table,
            fe_src, fe_mid, fe_work, fe_cnt, t_start, t_end, t_src,
            metric=metric, cap=cap, maxf2=0, min_score=ms, w_bits=w_bits)
        cs, cu, cv = carry
        s2 = jnp.concatenate([cs, score]); u2 = jnp.concatenate([cu, u]); v2 = jnp.concatenate([cv, w])
        s2, u2, v2 = jax.lax.sort((-s2, u2, v2), num_keys=1)
        return (-s2[:K], u2[:K], v2[:K]), None
    init = (jnp.full((K,), -jnp.inf, jnp.float32), jnp.zeros((K,), jnp.int32), jnp.zeros((K,), jnp.int32))
    c, _ = jax.lax.scan(body, init, (tes[:-1], tes[1:], tss[:-1]))
    # scalar digest: forces everything, ~4B transfer
    return c[0][0] + c[0][K//2] + c[1].sum().astype(jnp.float32)

t0=time.perf_counter()
v = float(jax.device_get(f(jnp.float32(0.0), *base)))
print(f"first (compile+exec): {time.perf_counter()-t0:.1f}s, digest={v}")
for i in range(3):
    t0=time.perf_counter()
    v = float(jax.device_get(f(jnp.float32((i+1)*1e-6), *base)))
    print(f"call {i}: {(time.perf_counter()-t0)*1e3:.1f} ms, digest={v}")
