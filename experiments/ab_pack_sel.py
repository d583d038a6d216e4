"""Why does the ENGAGED pack selection lose end-to-end? (round 5)

The r5 campaign measured: pack ON loses 5.8% at s21 (63.1 vs 67.0 M edges/s)
and ~1.5% at s19, yet diag_pack shows the threshold/budget check passing
(ok=True) at both scales, and the radix probe puts the pack kernel itself at
0.066 ms per 2^21 lanes.  This probe times the selection PIPELINE and its
components in isolation at the exact s21 shape (142.6M lanes, kk=2.23M) with
an s21-like key distribution (finite mass ~20%, the rest the -inf spread
sentinel), in-jit iterated so dispatch cancels.

Run on the chip:  python experiments/ab_pack_sel.py
"""
import os
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from linkpred_tpu.utils.timing import measure_duration  # noqa: E402
from linkpred_tpu.predict import scoring  # noqa: E402
from linkpred_tpu.ops.compact import (PACK_CHUNK, PACK_RATIO,  # noqa: E402
                                      pack_survivors, sample_threshold)

N = int(os.environ.get("LANES", str(68 * (1 << 21))))
KK = int(os.environ.get("KK", "2234330"))
ITERS = int(os.environ.get("ITERS", "4"))
REPEAT = int(os.environ.get("REPEAT", "2"))
FRAC = float(os.environ.get("FINITE_FRAC", "0.2"))

rng = np.random.default_rng(0)
print(f"N={N} kk={KK} finite_frac={FRAC}", flush=True)

iota = np.arange(N, dtype=np.int64)
finite = rng.random(N) < FRAC
key_np = np.where(
    finite,
    rng.integers(0, 0x44000000, N, dtype=np.int64),
    0xFF800000 | (iota & 0x7FFFFE),
).astype(np.uint32)
key0 = jnp.asarray(key_np)
idx0 = jnp.asarray(iota.astype(np.int32))
# xor of LOW bits only: perturbs ties/payload order between iterations while
# preserving the macro distribution the threshold sampling sees
xors = jnp.asarray(rng.integers(1, 1 << 14, ITERS, dtype=np.int64)
                   .astype(np.uint32))


def bench(name, body):
    def make(iters):
        @jax.jit
        def run(key, idx):
            def step(c, x):
                out = body(key ^ x, idx)
                # data-dependence: fold a scalar of the result into nothing
                # (carry only), keeping iterations serialized
                return c + out, 0
            c, _ = jax.lax.scan(step, jnp.uint32(0), xors[:iters])
            return c
        return lambda: run(key0, idx0)

    t1, _ = measure_duration(make(1), repeat=REPEAT)
    tn, _ = measure_duration(make(ITERS), repeat=REPEAT)
    per = (tn - t1) / (ITERS - 1)
    print(f"{name:24s} {per:9.2f} ms  (t1 {t1:.1f}, t{ITERS} {tn:.1f})",
          flush=True)
    return per


# --- full pipelines ---------------------------------------------------------
def blocked_full(key, idx):
    sk, si = scoring._argselect_blocked(key, idx, KK)
    return sk[KK - 1] ^ si[KK - 1].astype(jnp.uint32)


def packed_full(key, idx):
    sk, si = scoring._argselect_packed(key, idx, KK)
    return sk[KK - 1] ^ si[KK - 1].astype(jnp.uint32)


# --- components -------------------------------------------------------------
def comp_sample(key, idx):
    thr, _ = sample_threshold(key, KK)
    return thr


def comp_pack(key, idx):
    thr = jnp.uint32(0x44000000 * FRAC * (KK / N / FRAC) * 1.3)  # static-ish
    pk, pidx, cnt = pack_survivors(key, thr)
    return pk[0] ^ cnt[0].astype(jnp.uint32)


def comp_cnt(key, idx):
    thr, _ = sample_threshold(key, KK)
    nch = N // PACK_CHUNK
    cnt = jnp.sum((key.reshape(nch, PACK_CHUNK) <= thr).astype(jnp.int32),
                  axis=1)
    return jnp.sum(cnt).astype(jnp.uint32) + jnp.max(cnt).astype(jnp.uint32)


def blocked_quarter(key, idx):
    q = N // PACK_RATIO
    sk, si = scoring._argselect_blocked(key[:q], idx[:q], KK)
    return sk[KK - 1] ^ si[KK - 1].astype(jnp.uint32)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    a = bench("blocked_full(142.6M)", blocked_full)
    b = bench("packed_full", packed_full)
    s = bench("sample_threshold", comp_sample)
    p = bench("pack_kernel+cnt", comp_pack)
    c = bench("sample+cnt(no kernel)", comp_cnt)
    q = bench("blocked(N/4)", blocked_quarter)
    print(f"\npacked pipeline modeled = sample {s:.1f} + pack+cnt {p:.1f} + "
          f"blocked(N/4) {q:.1f} = {s + p + q:.1f} ms vs measured "
          f"packed_full {b:.1f} vs blocked_full {a:.1f}", flush=True)
