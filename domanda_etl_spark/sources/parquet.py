"""Parquet sources.

The reference's sources are BigQuery SQL scans with filter + DISTINCT pushed
into the source text (reference etl/extractor.py:42-121). Spark-first this is
simply `spark.read.parquet(...)` + declarative `.filter/.distinct` — Catalyst
pushes predicates and column pruning into the parquet scan, which is the same
"compute at the source" rewrite done by hand in the reference (S1/S2 in
SURVEY.md §2.1).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_read_schema(sf_dir: str, name: str):
    """(spark_schema, ns_cols) for a table — ns-timestamp columns declared
    LONG so the schema is legal for spark.read AND spark.readStream (the
    file-stream source hits the same TIMESTAMP(NANOS) rejection as batch).
    Callers convert ns_cols with timestamp_micros(col div 1000)."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import from_arrow_schema

    path = os.path.join(sf_dir, f"{name}.parquet")
    file_schema = pq.read_schema(path)
    ns_cols = [f.name for f in file_schema if str(f.type) == "timestamp[ns]"]
    as_long = pa.schema(
        [
            pa.field(f.name, pa.int64()) if str(f.type) == "timestamp[ns]" else f
            for f in file_schema
        ]
    )
    return from_arrow_schema(as_long), ns_cols


# (appId, path, mtime_ns, size) -> DataFrame. A DataFrame is an immutable
# lazy plan, so handing the same object to every caller is safe; the
# mtime/size key invalidates on rewrite, and the appId key scopes the
# entry to one SparkSession. Why: each uncached load_table costs ~70 ms
# (Python footer read + JVM DataFrameReader listing/schema) and the bench
# calls it 1-3x per query x 300+ queries — tens of seconds of pure
# re-listing of files that never change.
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Filters/projections applied by the caller reach the
    scan via Catalyst pushdown — check `.explain` for PushedFilters.

    Spark's parquet reader rejects TIMESTAMP(NANOS) columns; those are read
    as nano-longs (`nanosAsLong`) and converted to microsecond timestamps —
    the same ns -> us truncation DuckDB applies, keeping oracle parity.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        st = os.stat(path)
        key = (spark.sparkContext.applicationId, path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    if key is not None and key in _TABLE_CACHE:
        return _TABLE_CACHE[key]
    # Explicit read schema (ns columns declared as long) instead of the
    # session-wide `spark.sql.legacy.parquet.nanosAsLong` flag — a global
    # flag would silently change how OTHER parquet reads in the same
    # session surface ns timestamps.
    schema, ns_cols = table_read_schema(sf_dir, name)
    if ns_cols:
        df = spark.read.schema(schema).parquet(path)
    else:
        df = spark.read.parquet(path)
    for c in ns_cols:
        # `div` = integer division on longs (a double division would lose
        # precision on 63-bit nano values)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    df = _ntz_to_ltz(df)
    if key is not None:
        # Evict superseded entries for the same file (old mtime/size) so a
        # rewrite-heavy process doesn't accumulate dead plans, and so no
        # other cache may safely alias a stale DataFrame object for this
        # path (e.g. by object identity).
        stale = [k for k in _TABLE_CACHE if k[:2] == key[:2] and k != key]
        for k in stale:
            del _TABLE_CACHE[k]
        _TABLE_CACHE[key] = df
    return df


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Normalize TIMESTAMP_NTZ columns to TIMESTAMP (LTZ).

    Parquet written by pandas/pyarrow defaults carries naive timestamps
    (`timestamp[us]`, isAdjustedToUTC=false), which Spark >= 3.4 infers as
    TIMESTAMP_NTZ — and every event-time expression built for TIMESTAMP
    (`unix_micros`, watermarks, window()) then fails to analyze. With the
    session timezone pinned to UTC (session.py:46) the NTZ->LTZ cast
    preserves the wall-clock value exactly, matching DuckDB's naive
    semantics, so downstream operators see ONE timestamp type regardless of
    which writer produced the file. Done here, at the single shared scan
    entry point, so no operator needs its own defense."""
    from pyspark.sql.types import TimestampNTZType

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> None:
    """Register temp views so `spark.sql(...)` (the reference's ad-hoc SQL
    entry point, etl/extractor.py:42-58) works against the lake."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
