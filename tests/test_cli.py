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


def test_spark_submit_py_files(tmp_path):
    """North-rule launch path: spark-submit --py-files <zip> runs the
    drill with imports resolved from the packaged zip only."""
    out = subprocess.run([sys.executable, "/root/repo/tools/package.py"],
                         capture_output=True, text=True, timeout=60)
    zip_path = out.stdout.strip().splitlines()[-1]
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, "/root/repo/tools/submit_drill.py",
         "--g", "3", "--t", "2"],
        capture_output=True, text=True, timeout=400, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith("RESULT_JSON")][0]
    res = json.loads(line.split(" ", 1)[1])
    assert res["rows"] > 0
