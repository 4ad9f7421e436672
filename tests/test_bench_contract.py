"""bench.py is the driver's performance contract: it must print exactly
one parseable JSON line with the declared keys, and report zero failed
queries. Run as a real subprocess (own JVM) at the smallest SF."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_emits_one_json_line_with_zero_errors(tmp_path):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        # pin reps: an externally set SPARK_GRAFT_BENCH_REPS would leak in
        # through os.environ and make the d["reps"] == 2 assert fail spuriously
        SPARK_GRAFT_BENCH_REPS="2",
        # write the full map to a temp file: the committed BENCH_LOCAL.json
        # is the sf0.1 sweep and must survive suite runs unmodified
        SPARK_GRAFT_BENCH_OUT=str(tmp_path / "bench_local.json"),
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, f"expected ONE JSON line, got {len(json_lines)}"
    # the driver records only the last 2000 bytes of stdout and parses that
    # capture — the printed line must survive it whole
    assert len(json_lines[0]) <= 2000, "stdout JSON line exceeds the driver's capture window"
    d = json.loads(json_lines[0])
    assert d["metric"] == "declared_query_suite_wall"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert d["value"] > 0
    # min-of-2-reps harness (VERDICT r8 §wrong#1): the headline number
    # is warm-plan time; the single-rep cold total rides alongside
    assert d["reps"] == 2
    assert d["cold_total_sec"] >= d["total_sec"]
    assert d["n_failed"] == 0, f"bench reported failed queries: {d['failed']}"
    failed = [k for k, v in d["queries"].items() if v < 0]
    assert not failed, f"bench reported failed queries: {failed}"
    # full per-query map (stdout line may be trimmed to fit the capture)
    with open(tmp_path / "bench_local.json") as f:
        full = json.loads(f.read())
    assert len(full["queries"]) >= 150
    assert not [k for k, v in full["queries"].items() if v < 0]
    # BENCH_LOCAL.json is gitignored driver output as of r14 (VERDICT r13
    # §next#7) — but if one exists on disk it must NOT have been touched
    # by this smoke run (the driver's sf0.1 sweep is the official record)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    local = os.path.join(repo, "BENCH_LOCAL.json")
    if os.path.exists(local):
        with open(local) as f:
            committed = json.loads(f.read())
        assert committed["sf"] == 0.1, "driver BENCH_LOCAL.json clobbered by a smoke run"
