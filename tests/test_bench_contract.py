"""The driver-facing bench contract (round-4 VERDICT #1): bench.py must
print exactly one parseable JSON line and exit 0 NO MATTER WHAT — a
phase failure (bad input dir) or a scaling-protocol overrun (budget
smaller than engine spin-up, the synthetic stand-in for the round-4
child-timeout crash) becomes an "errors"/"truncated" field, never a
traceback."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_json_survives_phase_failure_and_scaling_overrun():
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/nonexistent/sfX",  # queries phase fails
            "SPARK_GRAFT_CPUS": "8",
            "SASSY_BENCH_PAGES": "200",
            "SASSY_BENCH_F1": "0",
            # skip the sf0.001 query warmup: not under test here
            "SASSY_BENCH_WARMUP": "0",
            "SASSY_BENCH_ORACLE_SUITE": "0",
            "SASSY_BENCH_SCALING": "0",
            "SASSY_BENCH_SPARK_SCALING": "1",
            "SASSY_BENCH_SPARK_PAIRS": "2048",
            "SASSY_BENCH_SPARK_REPEATS": "1",
            # budget far below JVM spin-up: the protocol MUST truncate,
            # not raise (the failure mode that destroyed BENCH_r04)
            "SASSY_SCALING_BUDGET_SEC": "6",
            "SASSY_SCALING_MAX_QUIET_WAIT": "2",
        }
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # last stdout line is the JSON record
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    # the failed queries phase is recorded, not fatal
    assert "queries" in out["errors"]
    # the ER phase still produced numbers (it does not depend on SF_DIR)
    assert out["queries"].get("er_pipeline", 0) > 0
    assert out["er_candidate_pairs_scored"] > 0
    # the scaling overrun is disclosed as truncation, with no crash
    assert out["spark_scaling"]["truncated"] is True
    assert out["bench_wall_sec"] > 0
    # zero live clean reps -> the committed-reference fallback attaches
    # the newest clean BENCH/spark_scaling_*.json, clearly labeled as
    # pre-measured (this repo has such records committed)
    if not out["spark_scaling"]["samples"]:
        ref = out["spark_scaling"].get("committed_reference")
        assert ref is not None
        assert ref["file"].startswith("BENCH/spark_scaling_")
        assert ref["samples"], ref
        assert "NOT a live measurement" in ref["note"]


def test_bench_json_survives_sigterm():
    """A supervisor soft-kill (SIGTERM) mid-run must still yield one
    parseable JSON line and rc=0 — completed blocks survive, the
    truncation is recorded under errors.terminated."""
    import signal
    import time

    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_CPUS": "8",
            "SASSY_BENCH_PAGES": "200",
            "SASSY_BENCH_WARMUP": "0",
            "SASSY_BENCH_F1": "0",
            "SASSY_BENCH_ORACLE_SUITE": "0",
            "SASSY_BENCH_SCALING": "0",
            "SASSY_BENCH_SPARK_SCALING": "0",
        }
    )
    proc = subprocess.Popen(
        [sys.executable, "bench.py"],
        cwd=REPO,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    time.sleep(20)  # inside the queries phase (JVM up, work running)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, f"rc={proc.returncode}"
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, out
    rec = json.loads(lines[0])
    assert rec["errors"]["terminated"].startswith("SIGTERM")
    assert "bench_wall_sec" in rec
