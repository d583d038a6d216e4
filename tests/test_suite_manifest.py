"""The reference's 17-graph SuiteSparse protocol as a runnable manifest
(`/root/reference/main.sh:46-62`) — VERDICT r3 item 4."""
import json
import os

import numpy as np
import pytest


def test_manifest_matches_main_sh():
    """17 graphs, reference run order, per-graph symmetric flags exactly as
    main.sh passes them (web/soc/indochina: 0; coAuthors/coPapers/_osm: 1)."""
    from linkpred_tpu.bench.suite import HEADLINE_GRAPH, REFERENCE_SUITE

    names = [g.name for g in REFERENCE_SUITE]
    assert names == [
        "web-Stanford", "web-BerkStan", "web-Google", "web-NotreDame",
        "soc-Slashdot0811", "soc-Slashdot0902", "soc-Epinions1",
        "coAuthorsDBLP", "coAuthorsCiteseer", "soc-LiveJournal1",
        "coPapersCiteseer", "coPapersDBLP", "indochina-2004",
        "italy_osm", "great-britain_osm", "germany_osm", "asia_osm",
    ]
    for g in REFERENCE_SUITE:
        expect_sym = (g.name.startswith(("coAuthors", "coPapers"))
                      or g.name.endswith("_osm"))
        assert g.symmetric == expect_sym, g.name
        assert not g.weighted  # main.sh always passes weighted=0
        assert g.name in g.url and g.group in g.url
    assert HEADLINE_GRAPH.name == "sk-2005" and not HEADLINE_GRAPH.symmetric


def test_resolve_and_missing_report(tmp_path):
    from linkpred_tpu.bench.suite import missing_report, resolve_suite

    (tmp_path / "web-Google.mtx").write_text("%%MatrixMarket stub\n")
    present, missing = resolve_suite(str(tmp_path))
    assert [g.name for _, g in present] == ["web-Google"]
    assert len(missing) == 16
    rep = missing_report(missing)
    assert "asia_osm" in rep and "https://" in rep and "symmetric=1" in rep


def test_f1_report_brackets():
    from linkpred_tpu.bench.suite import f1_report, f1_score

    assert f1_score(0.0, 0.0) == 0.0
    assert np.isclose(f1_score(0.5, 0.5), 0.5)
    # rows whose F1 lands exactly on the published averages -> all ok
    rows = []
    for frac, ihub, lhub in ((1e-2, 1.8e-2, 3.2e-2), (1e-1, 1.1e-1, 9.8e-2)):
        rows.append(dict(technique="predictLinksJaccardCoefficientOmp0",
                         batch_insertions_fraction=frac, precision=ihub, recall=ihub))
        rows.append(dict(technique="predictLinksJaccardCoefficientOmp64",
                         batch_insertions_fraction=frac, precision=lhub, recall=lhub))
    rep = f1_report(rows)
    assert set(rep) == {("ihub", 1e-2), ("ihub", 1e-1),
                        ("lhub", 1e-2), ("lhub", 1e-1)}
    assert all(v["ok"] for v in rep.values())
    # an order-of-magnitude miss is flagged
    bad = f1_report([dict(technique="x0", batch_insertions_fraction=1e-2,
                          precision=0.9, recall=0.9)])
    assert not bad[("ihub", 1e-2)]["ok"]


def test_suite_sweep_end_to_end(tmp_path):
    """`--suite reference --allow-missing` runs the present subset with the
    manifest's per-graph symmetric flag and writes the F1 report."""
    from linkpred_tpu.bench import sweep

    # a tiny already-symmetric graph masquerading as coAuthorsDBLP
    # (manifest symmetric=1: the sweep must NOT symmetrize it again)
    rng = np.random.default_rng(3)
    n, m = 60, 240
    u = rng.integers(0, n, m)
    v = rng.integers(0, n, m)
    keep = u != v
    u, v = u[keep], v[keep]
    lines = [f"{a + 1} {b + 1}" for a, b in
             sorted(set(map(tuple, np.concatenate(
                 [np.stack([u, v], 1), np.stack([v, u], 1)]))))]
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    (data_dir / "coAuthorsDBLP.mtx").write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        f"{n} {n} {len(lines)}\n" + "\n".join(lines) + "\n")

    out = tmp_path / "results"
    rc = sweep.main([
        "--suite", "reference", "--data-dir", str(data_dir),
        "--allow-missing", "--out-dir", str(out),
        "--metrics", "jaccard_coefficient", "--degrees", "0,8",
        "--repeat-batch", "1", "--repeat-method", "1",
        "--deletions-begin", "0.1", "--deletions-end", "0.1",
        "--cap", "2048",
    ])
    assert rc == 0
    log = (out / "sweep.log").read_text()
    assert "coAuthorsDBLP" in log
    assert "(symmetrize)" not in log  # the per-graph flag was honored
    rep = json.loads((out / "f1_report.json").read_text())
    # only the 0.1 fraction ran; both approaches have published bounds there
    assert set(rep) == {"ihub@0.1", "lhub@0.1"}
    for v in rep.values():
        assert {"measured", "published", "ok"} <= set(v)


def test_suite_sweep_errors_on_missing(tmp_path):
    from linkpred_tpu.bench import sweep

    with pytest.raises(SystemExit):
        sweep.main(["--suite", "reference", "--data-dir", str(tmp_path),
                    "--out-dir", str(tmp_path / "r")])
