import sys, time, numpy as np, jax, jax.numpy as jnp
from linkpred_tpu.ops.segment import cummax, run_boundaries, segment_run_totals
d = np.load('/tmp/bench18.npz')
i32 = jnp.int32
N = 16
which = sys.argv[1]
key = jax.random.PRNGKey(0)
K = 1 << 20
big = jnp.asarray(np.arange(1<<23, dtype=np.int32))
idx = jax.random.randint(key, (K,), 0, 1<<23, dtype=i32)
pk = jax.random.randint(key, (K,), 0, 1<<30, dtype=i32)
ones = jnp.ones((K,), i32)
onesf = jnp.ones((K,), jnp.float32)

# dep(c): int32 >=0 runtime value -> 0, unprovable by compiler
def D(c):
    return (c.astype(i32) >> 31)

def make(which):
    @jax.jit
    def f(seed):
        def body(c, _):
            z = D(c)
            if which == "noop":
                return c + 1.0, None
            if which == "gather":
                return c + big[idx + z][-1].astype(jnp.float32), None
            if which == "gather_sum":
                return c + big[idx + z].sum().astype(jnp.float32), None
            if which == "dynslice":
                s = jax.lax.dynamic_slice(big, (z,), (K,))
                return c + s.sum().astype(jnp.float32), None
            if which == "cumsum":
                return c + jnp.cumsum(ones + z)[-1].astype(jnp.float32), None
            if which == "cummax":
                return c + cummax(idx + z)[-1].astype(jnp.float32), None
            if which == "sort1":
                return c + jax.lax.sort(pk + z)[-1].astype(jnp.float32), None
            if which == "sort2":
                k2, c2 = jax.lax.sort((pk + z, ones), num_keys=1)
                return c + (k2[-1] + c2[-1]).astype(jnp.float32), None
            if which == "segscan":
                s, e = run_boundaries(pk + z, pk + z)
                return c + segment_run_totals(s, ones)[-1].astype(jnp.float32), None
            if which == "topk":
                return c + jax.lax.top_k((idx + z).astype(jnp.float32), 1<<15)[0][0], None
            if which == "sortmerge":
                s2, u2 = jax.lax.sort((-(idx + z).astype(jnp.float32), ones), num_keys=1)
                return c + s2[0], None
        r, _ = jax.lax.scan(body, seed, None, length=N)
        return r
    return f

f = make(which)
v = float(jax.device_get(f(jnp.float32(0.0))))
t0=time.perf_counter(); v = float(jax.device_get(f(jnp.float32(1.0)))); t=(time.perf_counter()-t0)
print(f"{which}: {t*1e3/N:.2f} ms/op (raw {t*1e3:.0f}ms)", flush=True)
