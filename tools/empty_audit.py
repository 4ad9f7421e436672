"""Empty-batch audit (round 12): run EVERY registered query against a
0-row copy of all ten tables and report crashes.

Why this matters in production: an empty batch is a routine event ("no
data arrived today"), and a query that crashes on it — an ANSI
DIVIDE_BY_ZERO in a ratio, a VOID-typed literal array built from zero
collected centroids, a schema-inference failure reading back an empty
partitioned write — takes the whole pipeline down instead of publishing
an empty (or NULL-metric) result. The round-12 audit found 13 such
crashes across the 375-query registry and fixed them all; the fixed
queries are pinned forever in tests/test_empty_corpus.py, and this
script re-runs the FULL registry sweep (~7 min on local[8]).

Usage: python tools/empty_audit.py            # 0-row corpus sweep
       python tools/empty_audit.py --one-row  # 1-row corpus sweep (the
       round-12 second audit: n-1 divisors, constant groups, self-pair
       degeneracies)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EMPTY_DIR = "/tmp/sf_empty"
ONEROW_DIR = "/tmp/sf_onerow"


def build_corpus(n_rows: int, src: str = "/root/testdata/sf0.001") -> str:
    import pyarrow.parquet as pq

    out = EMPTY_DIR if n_rows == 0 else ONEROW_DIR
    os.makedirs(out, exist_ok=True)
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(src, f)).slice(0, n_rows)
            pq.write_table(t, os.path.join(out, f))
    return out


def build_empty_corpus(src: str = "/root/testdata/sf0.001") -> str:
    return build_corpus(0, src)


def main() -> int:
    n_rows = 1 if "--one-row" in sys.argv else 0
    sweep_dir = build_corpus(n_rows)
    os.chdir("/tmp")  # vanilla-session discipline (see window_sweep.py)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as ent

    qs = ent.queries()
    errs: dict[str, str] = {}
    for i, (name, fn) in enumerate(qs.items()):
        try:
            fn(spark, sweep_dir).collect()
        except Exception as e:  # noqa: BLE001 — audit wants every failure
            errs[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
        if (i + 1) % 50 == 0:
            print(f"...{i + 1}/{len(qs)} swept, {len(errs)} crashes", flush=True)
    tag = "1-row" if n_rows == 1 else "empty"
    print(f"TOTAL {len(qs)} queries, {len(errs)} crashes on the {tag} corpus")
    for n, m in sorted(errs.items()):
        print(f"ERR {n}: {m}")
    return 1 if errs else 0


if __name__ == "__main__":
    sys.exit(main())
