"""Round-5 measurement campaign (round-4 verdict items 1, 2, 4).

Serially measures, at HEAD, everything the round-4 verdict flagged as
unrecorded: the s19-s23 scale table (median of >=3 in-process samples per
row, via bench.py's BENCH_SAMPLES), on/off A/Bs for the round-4 kernels
(LINKPRED_FUSED_TAIL, LINKPRED_SEL_PACK) at s19 and s21, the pack-engagement
diagnostics (diag_pack.py), and the radix feasibility probe (radix_probe.py).

One chip, one process at a time (concurrent device work pollutes timings —
experiments/README.md rule 4).  Results append to
experiments/results_r5.jsonl (bench rows) and results_r5_logs/ (probe
stdout); both are meant to be committed.

Run: python experiments/campaign_r5.py [step ...]   (default: all steps)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "experiments", "results_r5.jsonl")
LOGDIR = os.path.join(REPO, "experiments", "results_r5_logs")

BENCH_STEPS = [
    # (name, env overrides)
    ("s19_default", {"BENCH_SCALE": "19"}),
    ("s19_fused0", {"BENCH_SCALE": "19", "LINKPRED_FUSED_TAIL": "0"}),
    ("s19_pack0", {"BENCH_SCALE": "19", "LINKPRED_SEL_PACK": "0"}),
    ("s21_default", {"BENCH_SCALE": "21"}),
    ("s21_fused0", {"BENCH_SCALE": "21", "LINKPRED_FUSED_TAIL": "0"}),
    ("s21_pack0", {"BENCH_SCALE": "21", "LINKPRED_SEL_PACK": "0"}),
    ("s20_default", {"BENCH_SCALE": "20"}),
    ("s22_default", {"BENCH_SCALE": "22"}),
    ("s22_pack0", {"BENCH_SCALE": "22", "LINKPRED_SEL_PACK": "0"}),
    ("s23_default", {"BENCH_SCALE": "23"}),
    ("s23_pack0", {"BENCH_SCALE": "23", "LINKPRED_SEL_PACK": "0"}),
    ("s18_default", {"BENCH_SCALE": "18"}),
]

PROBE_STEPS = [
    ("diag_pack_s19", [sys.executable, "experiments/diag_pack.py"],
     {"BENCH_SCALE": "19"}),
    ("diag_pack_s21", [sys.executable, "experiments/diag_pack.py"],
     {"BENCH_SCALE": "21"}),
    ("radix_probe", [sys.executable, "experiments/radix_probe.py"], {}),
]


def run_bench(name, env_over):
    env = dict(os.environ, **env_over)
    t0 = time.time()
    r = subprocess.run([sys.executable, "bench.py"], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=5400)
    wall = time.time() - t0
    row = {"step": name, "env": env_over, "wall_s": round(wall, 1),
           "rc": r.returncode}
    line = (r.stdout.strip().splitlines() or [""])[-1]
    try:
        row["bench"] = json.loads(line)
    except Exception:
        row["stdout_tail"] = r.stdout[-500:]
        row["stderr_tail"] = r.stderr[-500:]
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run_probe(name, cmd, env_over):
    env = dict(os.environ, **env_over)
    t0 = time.time()
    r = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                       text=True, timeout=5400)
    wall = time.time() - t0
    os.makedirs(LOGDIR, exist_ok=True)
    with open(os.path.join(LOGDIR, f"{name}.log"), "w") as f:
        f.write(f"# cmd: {' '.join(cmd)} env: {env_over} rc={r.returncode} "
                f"wall={wall:.1f}s\n")
        f.write(r.stdout)
        if r.returncode != 0:
            f.write("\n# --- stderr ---\n" + r.stderr[-3000:])
    row = {"step": name, "rc": r.returncode, "wall_s": round(wall, 1),
           "stdout_tail": r.stdout.strip()[-400:]}
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def main():
    want = set(sys.argv[1:])
    for name, env_over in BENCH_STEPS:
        if want and name not in want:
            continue
        run_bench(name, env_over)
    for name, cmd, env_over in PROBE_STEPS:
        if want and name not in want:
            continue
        run_probe(name, cmd, env_over)


if __name__ == "__main__":
    main()
