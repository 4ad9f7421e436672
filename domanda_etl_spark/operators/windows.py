"""Window operators (reference W1/A2/O1-O3, SURVEY.md §2.5-2.6)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int = 1,
    rank_col: str | None = None,
) -> DataFrame:
    """row_number() <= k per group. One shuffle on the partition keys; no
    global sort. Pass deterministic `order_by` (include a tiebreaker)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return out.withColumnRenamed("__rn", rank_col)
    return out.drop("__rn")


def latest_wins(
    df: DataFrame,
    version_col: str,
    key_cols: list[str] | None = None,
    tiebreakers: list[Column] | None = None,
) -> DataFrame:
    """A2/W1 — per group of `key_cols` (default: every column except
    `version_col`) keep the row with the greatest `version_col`.

    The reference realizes this as a GLOBAL sort + drop_duplicates
    (reference etl/pipeline.py:56); at 100 TB a total sort is the wrong
    plan — a partitioned window (single hash shuffle, map-side combinable
    by AQE) computes the same result. The group key covers ~93 columns in
    the domanda pipeline, so the shuffle key is pre-hashed to one 64-bit
    column to keep shuffle rows narrow.
    """
    keys = key_cols if key_cols is not None else [c for c in df.columns if c != version_col]
    order = [F.col(version_col).desc()] + (tiebreakers or [])
    if len(keys) > 4:
        # Shuffle/sort on two independent 64-bit hashes (~128-bit key)
        # instead of a 90+-column tuple: same shuffle volume (full rows move
        # either way) but a radically cheaper sort comparator; collision
        # probability is negligible even at 100 TB row counts, unlike a
        # single xxhash64.
        #
        # Spark hash expressions SKIP null inputs (the hash state is left
        # unchanged), so ('a', NULL) and (NULL, 'a') would collide. A
        # null-position bitmask prepended to the hash input makes null
        # placement part of the key: same mask => same null positions, and
        # the non-null values are then consumed in identical column order.
        # Composed as SQL strings (one F.expr each) rather than nested
        # Column calls: the Column form costs ~5 py4j round-trips per key
        # column × 90+ keys of pure plan-construction latency; the parse
        # happens JVM-side in one call. Equivalence is covered by the
        # latest-wins golden tests.
        q = ["`" + k.replace("`", "``") + "`" for k in keys]
        null_mask = (
            "concat_ws(''"
            + "".join(f", CAST(CAST(({c} IS NULL) AS INT) AS STRING)" for c in q)
            + ")"
        )
        cols = ", ".join(q)
        hashed = df.withColumns(
            {
                "__gk1": F.expr(f"xxhash64({null_mask}, {cols})"),
                "__gk2": F.expr(f"xxhash64('salt', {null_mask}, {cols})"),
            }
        )
        w = Window.partitionBy("__gk1", "__gk2").orderBy(*order)
        return (
            hashed.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__gk1", "__gk2")
        )
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
