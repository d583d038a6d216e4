"""Generate the process.js parity fixture (run once; outputs are committed).

Produces, under tests/fixtures/:

* ``fixture_graph.mtx`` — a small deterministic directed graph;
* ``reference_run.log`` — the stdout of the REFERENCE'S OWN compiled
  ``main.cxx`` (g++ -O3 -fopenmp, REPEAT=1, one 0.1 batch fraction) run on
  that graph — a real log in the exact grammar ``process.js`` consumes;
* ``reference_run.csv`` — the CSV ``process.js csv`` would emit for that
  log, produced by `_processjs_transliteration` below: a deliberate
  line-by-line transliteration of `/root/reference/process.js:46-126`
  (regexes, parseFloat, JS object key order, JS number->string rules),
  INDEPENDENT of `linkpred_tpu/bench/process.py`.

`tests/test_harness.py::test_processjs_fixture_byte_parity` then asserts our
parser + CSV writer reproduce ``reference_run.csv`` byte-for-byte — pinning
the parity claim in environments without node.  Where node IS available,
``node process.js csv reference_run.log out.csv`` must equal the fixture too
(the live cross-test covers that).
"""
from __future__ import annotations

import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = os.environ.get("LINKPRED_REFERENCE", "/root/reference")
FIXDIR = os.path.join(REPO, "tests", "fixtures")


def make_graph(path: str) -> None:
    """Cycle over all n vertices + random chords on a small subset.

    The shape is deliberate: the reference's k-way merge has UB whenever a
    row's true prediction count drops below maxEdges (`predict.hxx:424-459`:
    the heap is seeded with T zero-initialized entries; exhausting a real
    list pops an empty vector).  ~300 pure-cycle vertices keep degree exactly
    2, so even the strictest LHub threshold (deg=2) has ~300 valid
    second-order pairs >> maxEdges = 0.1|E|/2 ~= 55, for every metric row.
    """
    rng = np.random.default_rng(1234)
    n, chords = 400, 150
    u = list(range(n))
    v = [(i + 1) % n for i in range(n)]
    cu = rng.integers(0, 100, chords)
    cv = rng.integers(0, 100, chords)
    keep = cu != cv
    pairs = sorted(set(zip(u, v)) | set(zip(cu[keep].tolist(),
                                            cv[keep].tolist())))
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write(f"{n} {n} {len(pairs)}\n")
        for a, b in pairs:
            f.write(f"{a + 1} {b + 1}\n")


def run_reference(mtx: str, log_path: str) -> None:
    binp = os.path.join(FIXDIR, "a.out")
    # the BATCH_* guard in main.cxx is grouped — define the full set, like
    # main.sh:29-42 does
    cmd = ["g++", "-std=c++17", "-O3", "-fopenmp",
           "-DTYPE=float", "-DMAX_THREADS=4",
           "-DREPEAT_BATCH=1", "-DREPEAT_METHOD=1",
           '-DBATCH_UNIT="%"', "-DBATCH_LENGTH=1",
           "-DBATCH_DELETIONS_BEGIN=0.1", "-DBATCH_DELETIONS_END=0.1",
           "-DBATCH_DELETIONS_STEP=*=10",
           "-DBATCH_INSERTIONS_BEGIN=0", "-DBATCH_INSERTIONS_END=0",
           "-DBATCH_INSERTIONS_STEP=+=10",
           f"-I{REF}", os.path.join(REF, "main.cxx"), "-o", binp]
    subprocess.run(cmd, check=True)
    r = subprocess.run([binp, mtx, "0", "0"], capture_output=True, text=True,
                       check=True, timeout=600)
    os.remove(binp)
    # strip the absolute fixture path (machine-specific) down to a stable one
    out = r.stdout.replace(os.path.dirname(mtx), "~/Data")
    with open(log_path, "w") as f:
        f.write(out)


# --- transliteration of process.js (readLog + writeCsv + processCsv) --------

ROMPTH = re.compile(r"^OMP_NUM_THREADS=(\d+)")
RGRAPH = re.compile(r"^Loading graph .*/(.*?)\.mtx \.\.\.")
RORDER = re.compile(r"^order: (\d+) size: (\d+) (?:\[\w+\] )?\{\}")
RPREDT = re.compile(r"^\{\-(.+?)/\+(.+?) batchf, (.+?) threads\} -> "
                    r"\{(.+?)ms, (.+?) scoring, (.+?) precision, (.+?) "
                    r"recall\} (.+)")


_FLOAT_PREFIX = re.compile(r"^[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


def _js_num(s: str):
    # JS parseFloat: longest numeric PREFIX, trailing junk ignored — the
    # scoring group of RPREDT lazily captures "0000001.8ms" INCLUDING the
    # "ms" (process.js:8), and parseFloat silently strips it.
    m = _FLOAT_PREFIX.match(s.strip())
    if not m:
        return float("nan")
    return float(m.group(0))


def _js_str(v) -> str:
    """JS template `${v}` per ECMA-262 Number::toString, built from Decimal
    normalization (deliberately a different construction than
    bench/process.py's repr-splitting _js_repr, so the fixture pins both)."""
    if not isinstance(v, float):
        return str(v)
    from decimal import Decimal

    if v.is_integer() and abs(v) < 1e21:
        return str(int(v))
    d = Decimal(repr(v)).normalize()
    sign, digits, exp = d.as_tuple()
    k = len(digits)
    n = k + exp  # decimal point position (spec's n)
    ds = "".join(map(str, digits))
    s = "-" if sign else ""
    if -6 < n <= 21:
        if n >= k:
            return s + ds + "0" * (n - k)
        if n > 0:
            return s + ds[:n] + "." + ds[n:]
        return s + "0." + "0" * (-n) + ds
    mant = ds[0] + ("." + ds[1:] if k > 1 else "")
    e = n - 1
    return f"{s}{mant}e{'+' if e >= 0 else '-'}{abs(e)}"


def _processjs_transliteration(log_path: str):
    data: dict[str, list] = {}
    state: dict = {}
    with open(log_path) as f:
        text = f.read().replace("\r\n", "\n")
    for ln in text.split("\n"):
        ln = re.sub(r"^\d+-\d+-\d+ \d+:\d+:\d+ ", "", ln)
        if m := ROMPTH.match(ln):
            state["omp_num_threads"] = _js_num(m.group(1))
        elif m := RGRAPH.match(ln):
            data.setdefault(m.group(1), [])
            state["graph"] = m.group(1)
        elif m := RORDER.match(ln):
            state["order"] = _js_num(m.group(1))
            state["size"] = _js_num(m.group(2))
        elif m := RPREDT.match(ln):
            row = dict(state)
            row.update(
                batch_deletions_fraction=_js_num(m.group(1)),
                batch_insertions_fraction=_js_num(m.group(2)),
                num_threads=_js_num(m.group(3)),
                total_time=_js_num(m.group(4)),
                scoring_time=_js_num(m.group(5)),
                precision=_js_num(m.group(6)),
                recall=_js_num(m.group(7)),
                technique=m.group(8),
            )
            data[state["graph"]].append(row)
    rows = [row for rws in data.values() for row in rws]
    cols = list(rows[0].keys())
    out = ",".join(cols) + "\n"
    for row in rows:
        out += ",".join(f'"{_js_str(v)}"' for v in row.values()) + "\n"
    return out


def main() -> int:
    os.makedirs(FIXDIR, exist_ok=True)
    mtx = os.path.join(FIXDIR, "fixture_graph.mtx")
    log = os.path.join(FIXDIR, "reference_run.log")
    csv = os.path.join(FIXDIR, "reference_run.csv")
    make_graph(mtx)
    run_reference(mtx, log)
    with open(csv, "w") as f:
        f.write(_processjs_transliteration(log))
    nrows = sum(1 for _ in open(csv)) - 1
    print(f"fixtures written: {log} ({nrows} result rows), {csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
