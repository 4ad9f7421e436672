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
def test_bench_emits_one_json_line_with_zero_errors():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
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
    d = json.loads(json_lines[0])
    assert d["metric"] == "declared_query_suite_wall"
    assert d["unit"] == "sec"
    assert d["sf"] == 0.001
    assert d["value"] > 0
    failed = [k for k, v in d["queries"].items() if v < 0]
    assert not failed, f"bench reported failed queries: {failed}"
    assert len(d["queries"]) >= 150
