"""End-to-end CLI test: gen -> drill(resume) -> get-ids -> stack -> knn
(CLI-level coverage parity with reference tests/test_main.py:39-62)."""

import json
import subprocess
import sys


def _run(args):
    r = subprocess.run([sys.executable, "-m", "dea_conflux_spark",
                        "--cpus", "4", *args],
                       capture_output=True, text=True, timeout=420,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def test_cli_end_to_end(tmp_path):
    data = str(tmp_path / "data")
    out = str(tmp_path / "out")
    stack = str(tmp_path / "stack")

    o = _run(["gen", "--g", "3", "--t", "2", "--out", data])
    meta = json.loads(o.strip().splitlines()[-1])
    assert meta["tiles"] == 18

    o = _run(["drill", "--g", "3", "--t", "2", "--tiles", data,
              "--out", out, "--resume-ledger", str(tmp_path / "ledger")])
    res = json.loads(o.strip().splitlines()[-1])
    assert res["drilled"] == 18 and res["rows"] > 0

    # resume: nothing left to drill, same rows
    o = _run(["drill", "--g", "3", "--t", "2", "--tiles", data,
              "--out", out, "--resume-ledger", str(tmp_path / "ledger")])
    res2 = json.loads(o.strip().splitlines()[-1])
    assert res2["drilled"] == 0 and res2["rows"] == res["rows"]

    o = _run(["get-ids", "--g", "3", "--t", "2", "--tiles", data,
              "--screen"])
    ids = [ln for ln in o.splitlines() if ln.startswith("t")]
    assert 0 < len(ids) <= 18

    o = _run(["stack", "--g", "3", "--t", "2", "--drill", out,
              "--out", stack])
    obs = json.loads(o.strip().splitlines()[-1])
    assert obs["observations"] > 0

    pts = tmp_path / "pts.csv"
    pts.write_text("qid,qx,qy\nq1,101000,101000\nq2,105000,105000\n")
    o = _run(["knn", "--g", "3", "--t", "2", "--tiles", data,
              "--points", str(pts), "--k", "2"])
    lines = [ln for ln in o.splitlines() if ln.startswith("q")]
    assert len(lines) == 4
