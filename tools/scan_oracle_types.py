"""Scan every registered oracle SQL for output columns whose DuckDB
logical type cannot round-trip through pandas to the same dtype Spark
produces — chiefly HUGEINT (int128, from integer sum()/`//`), which
pandas materializes as float64 while the Spark side returns bigint
(VERDICT r6 §wrong#1).  DuckDB-only, so it runs in seconds without a
SparkSession.

Usage: python tools/scan_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entrymod  # noqa: E402

SUSPECT = {"HUGEINT", "UHUGEINT", "UBIGINT"}

def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    n_bad = 0
    mapping: dict[str, list[str]] = {}
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols = list(zip(rel.columns, [str(t) for t in rel.types]))
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        bad = [(c, t) for c, t in cols
               if t in SUSPECT or t.startswith("DECIMAL")]
        if bad:
            n_bad += 1
            mapping[name] = [c for c, _ in bad]
            print(f"BAD  {name}: {bad}")
    print(f"-- scanned {len(oracles)} oracles, {n_bad} suspect")
    if mapping and "--emit-dict" in sys.argv:
        print("_ORACLE_BIGINT_CASTS: dict[str, tuple[str, ...]] = {")
        for name, cols in sorted(mapping.items()):
            print(f"    {name!r}: {tuple(cols)!r},")
        print("}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
