"""Join operators (reference J1/J2/J3, SURVEY.md §2.3).

The reference's flagship join: spine table left-joined against 5 supplier
tables on a 14-column canonicalized composite key (reference
unified_transformer.py:175-288). Spark-first design decisions:

- Supplier sides are small after the incremental filter -> `broadcast()`
  hints; AQE converts to broadcast anyway if stats allow, the hint makes it
  deterministic. 5 broadcast joins = zero shuffles of the spine.
- Keys are canonicalized to NON-NULL strings ('' for missing) before the
  join — placeholder keys must match each other (reference behavior,
  SURVEY.md Q1). Plain equi-join, never null-safe equality.
- Each right side is pre-projected to key + payload columns, which removes
  the reference's duplicate-suffix artifacts (SURVEY.md Q2) and keeps the
  broadcast small.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import scalars


def normalize_join_keys(
    df: DataFrame,
    keys: list[str],
    strip_ws_keys: list[str] | None = None,
    date_keys: list[str] | None = None,
) -> DataFrame:
    """J2 — canonicalize every join-key column in place: stringify, trim,
    collapse whitespace, placeholders -> '', uppercase; `strip_ws_keys`
    (flight numbers / cabin classes) drop ALL whitespace; `date_keys` are
    further normalized to MM/DD with unparseable values kept verbatim
    (reference unified_transformer.py:216-258)."""
    strip_ws = set(strip_ws_keys or [])
    dates = set(date_keys or [])
    out = {}
    for k in keys:
        col = scalars.normalize_join_key(k, strip_all_whitespace=k in strip_ws)
        if k in dates:
            col = scalars.normalize_join_date(col)
        out[k] = col
    return df.withColumns(out)


def enrich_left_join(
    spine: DataFrame,
    sides: dict[str, tuple[DataFrame, list[str]]],
    keys: list[str],
    broadcast_sides: bool = True,
) -> DataFrame:
    """J1 — successive left equi-joins of `spine` against each named side.

    sides: {name: (df, payload_cols)} — each side is pre-projected to
    keys+payload (Q2 fix) and deduplicated is NOT applied (many-to-many
    fan-out is intentional reference semantics, SURVEY.md Q3).
    """
    def prep(side: DataFrame, payload: list[str]) -> DataFrame:
        side = side.select(*keys, *payload)
        return F.broadcast(side) if broadcast_sides else side

    return reduce(
        lambda acc, item: acc.join(prep(*item[1]), on=keys, how="left"),
        sides.items(),
        spine,
    )


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """EXISTS — rows of left with at least one match in right."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """NOT EXISTS — rows of left with no match in right (the idiomatic form
    of the reference's row-removal filters P4/P5)."""
    return left.join(right, on=on, how="left_anti")
