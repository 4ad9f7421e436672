"""Driver-faithful pre-flight: sweep the _FIRST50 correctness window (or
any subset) in a VANILLA SparkSession against the DuckDB oracles, exactly
the way the driver will.

Why vanilla + why /tmp-safe: the driver does NOT apply
domanda_etl_spark.session's configs, and Python workers inherit the
driver process's cwd — running from inside the repo can mask
missing-module failures in shipped UDF closures (see
.claude/skills/verify/SKILL.md). This script chdirs to a temp dir before
creating the session so closures must survive on sys.path alone.

Usage:
  python tools/window_sweep.py                 # all 50 window queries @ sf0.01
  python tools/window_sweep.py name1 name2 ... # just these queries
  SWEEP_SF_DIR=/root/testdata/sf0.001 python tools/window_sweep.py

Exit code 0 iff every swept query matches its oracle (and entry() runs).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    os.chdir(tempfile.mkdtemp(prefix="window_sweep_"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SWEEP_CPUS', '8')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as ent
    from tests.oracle_utils import compare, duckdb_run

    sf_dir = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.01")
    qs, osql = ent.queries(), ent.oracle_sql()
    n_entry = len(ent.entry(spark).collect())
    print(f"entry rows: {n_entry}")
    names = sys.argv[1:] or list(qs)[:50]
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    failures: list[tuple[str, str]] = []
    for name in names:
        t0 = time.time()
        try:
            if name in osql:
                ok, msg = compare(qs[name](spark, sf_dir), duckdb_run(osql[name], sf_dir))
            else:  # rows-only query: the driver's weaker check
                ok, msg = qs[name](spark, sf_dir).count() >= 0, "rows-only"
        except Exception as exc:  # sweep everything; report at the end
            ok, msg = False, repr(exc)[:300]
        status = "OK" if ok else f"FAIL {msg}"
        print(f"{name}: {status} ({time.time() - t0:.1f}s)", flush=True)
        if not ok:
            failures.append((name, str(msg)))
    print(f"swept {len(names)}, failures: {failures}")
    return 1 if failures or n_entry <= 0 else 0


if __name__ == "__main__":
    raise SystemExit(main())
