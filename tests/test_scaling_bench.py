"""CI sanity for the scaling-efficiency harness (benchmarks/scaling_bench.py).

Runs the harness as a subprocess (it must configure the backend before
importing jax, so in-process import is not representative) on tiny sizes
and asserts the JSON contract the docs and BASELINE.md point at: one row
per (task, n_devices) plus one efficiency summary per task.
"""

import json
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_scaling_bench_emits_rows_and_efficiency():
    proc = subprocess.run(
        [
            sys.executable,
            str(ROOT / "benchmarks" / "scaling_bench.py"),
            "--devices", "1,2",
            "--iters", "1",
            "--frames-per-device", "1",
            "--height", "64", "--width", "96",
            "--landmarks-per-device", "64",
            "--cameras", "6",
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    for task in ("extract", "ba"):
        thr = [r for r in rows if r.get("task") == task and "throughput" in r]
        assert {r["n_devices"] for r in thr} == {1, 2}
        assert all(r["throughput"] > 0 for r in thr)
        eff = [
            r for r in rows if r.get("task") == task and "efficiency_vs_1dev" in r
        ]
        assert len(eff) == 1 and set(eff[0]["efficiency_vs_1dev"]) == {"1", "2"}
