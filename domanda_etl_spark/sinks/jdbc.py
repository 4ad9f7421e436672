"""JDBC sink/source — the reference's Postgres load path re-expressed as
Spark's native JDBC writer.

The reference row-loops INSERTs through SQLAlchemy (etl/loader.py:15-96) and
hand-rolls TRUNCATE for full refreshes (etl/loader.py:197-238). Spark-first
this is `df.write.jdbc`: executors write partitions in parallel batches
(one connection per partition, `batchsize` rows per round trip), and
overwrite-with-truncate keeps the table's DDL/indexes like the reference's
TRUNCATE does.

Scale notes: `num_partitions` bounds the writer's connection count — a
1000-partition DataFrame must NOT open 1000 database connections; coalesce
to what the database can absorb. Reads push predicates down and can
parallelize on a numeric `partition_column`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    truncate: bool = True,
) -> None:
    """S4 (mode='append') / S5 (mode='overwrite') against any JDBC database.
    `truncate=True` makes overwrite TRUNCATE-and-load (keeps DDL/indexes,
    the reference's semantics) instead of drop-and-recreate."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", str(truncate).lower())
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """S9 verification read / general JDBC scan. With a numeric
    `partition_column` + bounds the scan fans out over `num_partitions`
    range-sliced queries instead of one single-connection read."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach Spark as the literal "None" and die at
            # load time with an opaque NumberFormatException
            raise ValueError(
                "read_jdbc: partition_column requires explicit lower_bound "
                "and upper_bound (got "
                f"lower_bound={lower_bound!r}, upper_bound={upper_bound!r})"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 4))
        )
    return reader.load()
