"""Regenerate the STATUS.md scale-sensitivity table: one bench row per scale.

    python scripts/bench_table.py [scales...]    # default 18 19 20

Each row runs the same protocol as `python bench.py` (LHub jaccard, deg 64,
0.1|E| removed, adaptive cap, repeat 5) and reuses its host-setup cache; rows
print as they finish so a relay fault mid-table loses nothing.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
BENCH = os.path.join(HERE, "..", "bench.py")


def main() -> int:
    scales = [int(s) for s in sys.argv[1:]] or [18, 19, 20, 21, 22]
    rows = []
    for s in scales:
        # zero env knobs: the slot budget auto-sizes from device HBM
        # (utils/device.py), so s23+ rides the packed path unconfigured
        env = dict(os.environ, BENCH_SCALE=str(s))
        r = subprocess.run([sys.executable, BENCH], env=env,
                           capture_output=True, text=True)
        line = (r.stdout.strip().splitlines() or [""])[-1]
        if r.returncode != 0 or not line.startswith("{"):
            print(f"s{s}: FAILED rc={r.returncode} {r.stderr.strip()[-200:]}",
                  flush=True)
            continue
        d = json.loads(line)
        rows.append((s, d))
        print(f"s{s}: {d['value']/1e6:.1f}M edges/s "
              f"(vs_baseline {d['vs_baseline']:.2f})", flush=True)
    if rows:
        print("\n| graph | rate | vs reference headline |")
        print("|---|---|---|")
        for s, d in rows:
            print(f"| RMAT-{s} | {d['value']/1e6:.1f}M edges/s | "
                  f"{d['vs_baseline']:.2f}x |")
    return 0 if len(rows) == len(scales) else 1


if __name__ == "__main__":
    sys.exit(main())
