"""Headline benchmark: LHub link-prediction rate (edges scored per second).

Mirrors the reference's headline metric — link-prediction rate in |E|/s on a skewed
web-scale graph (`/root/reference/README.md:9,17`: 38.1 M edges/s, LHub, sk-2005,
0.1|E| removed, 64 hub threshold is the best-F1 regime). With no network egress we
use an R-MAT graph with matching power-law skew; rate = |E_directed| / scoring time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
"value" is the MEDIAN of BENCH_SAMPLES in-process samples (post-compile) and
"rate_min"/"rate_max" carry the spread — single samples on this host sit in a
measured ±15% band, so cross-run deltas need the median to mean anything.
Env knobs: BENCH_SCALE (default 19), BENCH_METRIC (jaccard_coefficient),
BENCH_DEG (64), BENCH_REPEAT (5), BENCH_SAMPLES (3), BENCH_WAIT_S (max
seconds to wait for the TPU to come back after a relay outage, default 2400).

Scale default: RMAT-19.  Larger R-MATs skew harder, so the LHub hub-skip
removes more of the expansion — exactly the regime the reference's sk-2005
headline measures (web-crawl skew, best-F1 threshold).  Full scale sensitivity
is tabled in STATUS.md (round-5 engine: s19 220.2M, s20 151.3M, s21 129.3M
edges/s, medians of 3); set BENCH_SCALE to reproduce any row.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _device_ready(timeout_s: int = 90) -> bool:
    """Probe the TPU in a SUBPROCESS (a failed backend init poisons the jax
    process that attempted it; after a relay fault even jnp.sum hangs —
    measured minutes-long recoveries)."""
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.arange(8.0))))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except Exception:
        return False


def main() -> int:
    if os.environ.get("BENCH_INNER") == "1":
        return _run()
    # Outer harness: wait out relay outages, then run the bench in a fresh
    # subprocess (so a mid-run device fault never poisons the retry).
    deadline = time.monotonic() + int(os.environ.get("BENCH_WAIT_S", "2400"))
    attempts = 0
    while True:
        while not _device_ready():
            if time.monotonic() > deadline:
                print("bench: TPU unavailable past BENCH_WAIT_S", file=sys.stderr)
                return 1
            print("bench: TPU not ready; waiting 120s", file=sys.stderr)
            time.sleep(120)
        env = dict(os.environ, BENCH_INNER="1")
        # key64 (the u64-key tile sort) is the library default engine —
        # measured on v5e: s19 136.5 -> 149.9M, s21 55.8 -> 58.9M edges/s vs
        # the u32 engine — and no longer needs the process-global x64 flag.
        # Override with BENCH_KEY64=0 to bench the u32 mode.  The emitted
        # JSON labels the mode in the "engine" field.
        if os.environ.get("BENCH_KEY64", "1") != "1":
            env.setdefault("LINKPRED_KEY64", "0")
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        if r.returncode == 0:
            return 0
        attempts += 1
        if attempts >= 3 or time.monotonic() > deadline:
            return r.returncode
        # After a device fault the TPU needs minutes to come back (a plain
        # jnp.sum times out meanwhile — measured); the probe loop above
        # re-gates the retry.
        print(f"bench attempt {attempts} failed; re-probing device",
              file=sys.stderr)
        time.sleep(180)


def _run() -> int:
    scale = int(os.environ.get("BENCH_SCALE", "19"))
    metric = os.environ.get("BENCH_METRIC", "jaccard_coefficient")
    deg = int(os.environ.get("BENCH_DEG", "64"))
    # repeat=5 matches the reference's REPEAT_METHOD=5 (`main.cxx:26-33`) and
    # amortizes the one-time relay sync round-trip (~30 ms) further.
    repeat = int(os.environ.get("BENCH_REPEAT", "5"))
    # cap: unset/0 => adaptive (plan targets ~32 full tiles, the measured v5e
    # sweet spot: RMAT-19 123.5M @2^20 -> 134.5M @2^21 edges/s; see plan.py)
    cap = int(os.environ.get("BENCH_CAP", "0")) or None
    baseline_edges_per_s = 38.1e6  # README.md:9 (LHub, sk-2005, 32 threads)

    import numpy as np

    from linkpred_tpu import PredictOptions, predict_links

    # Host setup (R-MAT synthesis + batch removal: ~50s at scale 19 on this
    # 1-vCPU host) is deterministic in (scale, seed); cache the post-batch
    # graph so retries and repeat invocations skip straight to scoring.
    cache_dir = os.environ.get("BENCH_CACHE_DIR", "/tmp/linkpred_bench_cache")
    cache = os.path.join(cache_dir, f"rmat{scale}_e16_s42_f0.1.npz")
    y = deletions = None
    if os.path.exists(cache):
        try:
            from linkpred_tpu.graph import CSRGraph
            with np.load(cache) as d:
                y = CSRGraph(offsets=d["offsets"], indices=d["indices"],
                             degrees=d["degrees"], weights=None,
                             n=int(d["n"]), m=int(d["m"]))
                deletions = d["deletions"]
        except Exception:
            y = deletions = None
    if y is None:
        from linkpred_tpu.bench.synth import rmat_graph
        from linkpred_tpu.ops.batch import (apply_batch,
                                            generate_edge_deletions,
                                            tidy_batch)

        g = rmat_graph(scale, edge_factor=16, seed=42)
        # Reference protocol: remove 0.1|E| edges, predict that many back.
        rng = np.random.default_rng(0)
        deletions = generate_edge_deletions(rng, g, int(0.1 * g.size / 2),
                                            undirected=True)
        deletions, insertions = tidy_batch(
            deletions, np.empty((0, 2), np.int64), g)
        y = apply_batch(g, deletions, insertions)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            np.savez(cache, offsets=np.asarray(y.offsets),
                     indices=np.asarray(y.indices),
                     degrees=np.asarray(y.degrees),
                     n=np.int64(y.n), m=np.int64(y.m), deletions=deletions)
        except Exception:
            pass

    from linkpred_tpu.predict.plan import build_plan
    plan = build_plan(y, deg, cap=cap)
    # Statistical headline (round-4 verdict #4): the single-sample headline sat
    # inside a measured ±15% run-to-run band, making every cross-round delta a
    # coin flip.  One process now takes BENCH_SAMPLES (>=3) timed samples after
    # the shared compile (each sample itself averages BENCH_REPEAT executions,
    # reference REPEAT_METHOD protocol) and reports the MEDIAN with min/max.
    samples = max(int(os.environ.get("BENCH_SAMPLES", "3")), 1)
    opts = PredictOptions(repeat=repeat,
                          max_edges=max(deletions.shape[0] // 2, 1))
    rates = []
    for _ in range(samples):
        res = predict_links(y, metric=metric, min_degree1=deg,
                            options=opts, cap=cap, plan=plan)
        rates.append(y.size / max(res.scoring_ms / 1e3, 1e-9))
    rates.sort()
    rate = rates[len(rates) // 2] if samples % 2 else \
        (rates[samples // 2 - 1] + rates[samples // 2]) / 2
    from linkpred_tpu.predict.scoring import default_key64
    row = {
        "metric": f"lhub_{metric}_deg{deg}_rmat{scale}_rate",
        "value": round(rate, 1),
        "unit": "edges/s",
        "vs_baseline": round(rate / baseline_edges_per_s, 4),
        # engine-mode label (advisor r3): which tile-sort engine produced
        # this number — "key64" (u64 keys; bench default) or "u32"
        "engine": "key64" if default_key64() else "u32",
        "samples": samples,
        "rate_min": round(rates[0], 1),
        "rate_max": round(rates[-1], 1),
    }
    # Auditable roofline (round-3 verdict): the pass priced at its MINIMUM
    # HBM traffic vs measured device time and the chip's peak bandwidth —
    # frac_of_peak is an upper bound on how close this engine can be to
    # speed-of-light (see linkpred_tpu/utils/roofline.py for the byte model).
    # Priced at the RESOLVED run config (advisor r4: metric weighting and the
    # fused/pack engine toggles change the byte model).
    if plan.packed:
        from linkpred_tpu.ops.fused_tail import fused_tail_enabled
        from linkpred_tpu.predict.metrics import get_metric
        from linkpred_tpu.predict.scoring import _sel_pack_enabled
        from linkpred_tpu.utils.roofline import (packed_pass_min_bytes,
                                                 roofline_report)
        total_slots = int(plan.tile_slot_start[-1])
        spec = get_metric(metric)
        mb = packed_pass_min_bytes(
            total_slots, num_metrics=1,
            weighted=int(spec.needs_weight),
            key64=default_key64(), deg16=plan.deg16,
            fused=fused_tail_enabled(), sel_pack=_sel_pack_enabled())
        median_ms = y.size / rate * 1e3
        row.update(roofline_report(mb, median_ms))
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    sys.exit(main())
