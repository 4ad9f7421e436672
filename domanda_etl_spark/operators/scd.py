"""Slowly-changing-dimension (type 2) history building.

The reference keeps full table history as backup copies per load
(etl/loader.py:15-96 semantics, S6/S7 in SURVEY.md §2.1); SCD2 is the
warehouse-native generalization: instead of snapshot copies, each key
carries its attribute history as [valid_from, valid_to) intervals. This
module derives that history directly from a change log (CDC-style event
stream) with two window functions — no self-join, no snapshot diffing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tiebreakers: list[Column] | None = None,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Keeps only rows where `attr_col` actually changed versus the previous
    row of the same key (run-length compression via lag), then closes each
    surviving version with the next version's start (lead). The final
    version per key has valid_to = NULL and is_current = true.

    Scale: both window functions share ONE partitioning (the key columns),
    so the whole operator is a single shuffle; per-key state is two rows
    of look-around, never the full history in memory. At 100 TB this is
    the plan you want for CDC compaction — partition by key, sort by time
    within partition, stream through.
    """
    order = [F.col(ts_col).asc()] + list(tiebreakers or [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev_attr = F.lag(F.col(attr_col)).over(w)
    # lag of a constant distinguishes "first row of the key" from
    # "previous attribute was NULL" — attr comparisons are null-safe, so
    # NULL runs compress like any other run
    is_first = F.lag(F.lit(True)).over(w).isNull()
    changed = df.withColumn(
        "__changed",
        is_first | (~F.col(attr_col).eqNullSafe(prev_attr)),
    ).filter(F.col("__changed"))
    valid_to = F.lead(F.col(ts_col)).over(w)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", valid_to)
        .withColumn("is_current", valid_to.isNull())
        .drop("__changed")
    )
