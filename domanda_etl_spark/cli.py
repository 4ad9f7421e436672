"""Engine CLI — the reference's standalone entry points re-expressed.

  python -m domanda_etl_spark.cli sql "SELECT ..." --sf-dir DIR
      ad-hoc SQL over the lake (reference fetch_data_as_dataframe,
      etl/extractor.py:42-58 / SURVEY.md §3.2)

  python -m domanda_etl_spark.cli load SRC_PARQUET TABLE_PATH
      standalone load harness: read a checkpointed frame, versioned
      overwrite (reference `python etl/loader.py`, etl/loader.py:350-356 /
      SURVEY.md §3.3)

  python -m domanda_etl_spark.cli restore TABLE_PATH [--version N]
  python -m domanda_etl_spark.cli history TABLE_PATH
  python -m domanda_etl_spark.cli merge SRC_PARQUET TABLE_PATH --keys k1,k2
      MERGE INTO (upsert by key) as a new atomic version
  python -m domanda_etl_spark.cli compact TABLE_PATH [--partitions N]
      bin-pack the current version's segments (post-append OPTIMIZE)

  python -m domanda_etl_spark.cli pmerge SRC_PARQUET TABLE_PATH \\
      --keys k1,k2 --partition-col COL
      partition-scoped MERGE: only partitions present in SRC rewrite
"""

from __future__ import annotations

import argparse
import json

from .session import get_spark
from .sinks import VersionedTable
from .sources import register_views


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    """`stop_session=False` lets in-process callers (tests) reuse their
    SparkSession — getOrCreate returns the shared one, and stopping it
    here would tear down the caller's session."""
    p = argparse.ArgumentParser(prog="domanda-etl-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_sql = sub.add_parser("sql")
    p_sql.add_argument("query")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_sql.add_argument("--limit", type=int, default=20)

    p_load = sub.add_parser("load")
    p_load.add_argument("src")
    p_load.add_argument("table")

    p_restore = sub.add_parser("restore")
    p_restore.add_argument("table")
    p_restore.add_argument("--version", type=int, default=None)

    p_hist = sub.add_parser("history")
    p_hist.add_argument("table")

    p_merge = sub.add_parser("merge")
    p_merge.add_argument("src")
    p_merge.add_argument("table")
    p_merge.add_argument("--keys", required=True, help="comma-separated key columns")

    p_compact = sub.add_parser("compact")
    p_compact.add_argument("table")
    p_compact.add_argument("--partitions", type=int, default=None)

    p_pmerge = sub.add_parser("pmerge")
    p_pmerge.add_argument("src")
    p_pmerge.add_argument("table")
    p_pmerge.add_argument("--keys", required=True, help="comma-separated key columns")
    p_pmerge.add_argument("--partition-col", required=True)

    args = p.parse_args(argv)
    spark = get_spark(app_name=f"domanda-cli-{args.cmd}")

    if args.cmd == "sql":
        register_views(spark, args.sf_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
    elif args.cmd == "load":
        df = spark.read.parquet(args.src)
        v = VersionedTable(args.table).overwrite(df)
        print(json.dumps({"op": "load", "rows": df.count(), "version": v}))
    elif args.cmd == "restore":
        v = VersionedTable(args.table).restore(spark, version=args.version)
        print(json.dumps({"op": "restore", "version": v}))
    elif args.cmd == "history":
        print(json.dumps(VersionedTable(args.table).history()))
    elif args.cmd == "merge":
        df = spark.read.parquet(args.src)
        v = VersionedTable(args.table).merge_upsert(spark, df, args.keys.split(","))
        print(json.dumps({"op": "merge", "version": v}))
    elif args.cmd == "compact":
        v = VersionedTable(args.table).compact(spark, target_partitions=args.partitions)
        print(json.dumps({"op": "compact", "version": v}))
    elif args.cmd == "pmerge":
        from .sinks import PartitionedVersionedTable

        df = spark.read.parquet(args.src)
        table = PartitionedVersionedTable(args.table, args.partition_col)
        v = table.merge_upsert(spark, df, args.keys.split(","))
        print(json.dumps({"op": "pmerge", "version": v}))
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
