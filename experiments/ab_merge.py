import time, numpy as np, jax, jax.numpy as jnp
cap = 1 << 20
K = 4096
rng = np.random.default_rng(0)
# realistic per-tile scores: ~40% valid, jaccard-like ties (small rationals), rest -inf
nv = int(0.4 * cap)
den = rng.integers(1, 60, nv)
num = rng.integers(1, den + 1)
scores = np.full(cap, -np.inf, np.float32)
idx = rng.choice(cap, nv, replace=False)
scores[idx] = (num / den).astype(np.float32)
sj = jnp.asarray(scores)
cu = jnp.zeros((K,), jnp.int32); cs = jnp.full((K,), -jnp.inf, jnp.float32)
u = jnp.arange(cap, dtype=jnp.int32); v = u + 1
i32 = jnp.int32
N = 16

@jax.jit
def raw(seed, sj, u, v, cs, cu):
    def body(c, _):
        z = c.astype(i32) >> 31
        s2 = jnp.concatenate([cs, sj + z.astype(jnp.float32)])
        u2 = jnp.concatenate([cu, u + z]); v2 = jnp.concatenate([cu, v + z])
        ns, u2, v2 = jax.lax.sort((-s2, u2, v2), num_keys=1)
        return c + (-ns[0]) + u2[0].astype(jnp.float32), None
    r, _ = jax.lax.scan(body, seed, None, length=N)
    return r

def enc(x, iota):
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    t = b ^ jnp.where(x >= 0, jnp.uint32(0x80000000), jnp.uint32(0xFFFFFFFF))
    skey = ~t
    return jnp.where(jnp.isfinite(x), skey, jnp.uint32(0xFF800000) | iota)

def dec(skey):
    t = ~skey
    b = t ^ jnp.where((t & jnp.uint32(0x80000000)) != 0,
                      jnp.uint32(0x80000000), jnp.uint32(0xFFFFFFFF))
    return jax.lax.bitcast_convert_type(b, jnp.float32)

@jax.jit
def encoded(seed, sj, u, v, cs, cu):
    iota = jax.lax.broadcasted_iota(jnp.uint32, (cap + K,), 0)
    def body(c, _):
        z = c.astype(i32) >> 31
        s2 = jnp.concatenate([cs, sj + z.astype(jnp.float32)])
        u2 = jnp.concatenate([cu, u + z]); v2 = jnp.concatenate([cu, v + z])
        k2 = enc(s2, iota)
        k2, u2, v2 = jax.lax.sort((k2, u2, v2), num_keys=1)
        return c + dec(k2[0]) + u2[0].astype(jnp.float32), None
    r, _ = jax.lax.scan(body, seed, None, length=N)
    return r

for name, f in (("raw float merge", raw), ("encoded u32 merge", encoded)):
    vv = float(jax.device_get(f(jnp.float32(0.0), sj, u, v, cs, cu)))
    t0=time.perf_counter(); vv = float(jax.device_get(f(jnp.float32(1.0), sj, u, v, cs, cu)))
    print(f"{name}: {(time.perf_counter()-t0)*1e3/N:.1f} ms/tile (digest {vv:.2f})", flush=True)
# sanity: encoded decode preserves ordering/top value
k = enc(sj, jax.lax.broadcasted_iota(jnp.uint32, (cap,), 0))
ks = jax.lax.sort(k)
top = float(dec(ks[0])); ref = float(jnp.max(sj))
print("top decode", top, "ref", ref, "match", abs(top-ref) < 1e-7)
