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
from . import conform


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
    (reference unified_transformer.py:216-258).

    The date keys are computed in THREE stages separated by one-evaluation
    barriers (conform.one_eval_barrier). A single-expression date normalize
    repeats its regex subtree ~70x (CASE branches re-expand their input),
    and the enrich join then pushes inferred join-key predicates into each
    side with that expression inlined — at 14 keys the fused supplier-side
    projection overflowed janino's hard 64 KB generated-method limit and
    the whole stage fell back to interpreted execution (flagship measured
    2.4x slower, r13). Staging keeps every expression over plain
    attributes: linear regex chains, compiled codegen, one evaluation per
    row."""
    strip_ws = set(strip_ws_keys or [])
    dates = set(date_keys or [])
    out = {}
    for k in keys:
        # SQL-string twins: ONE py4j call per key instead of ~30 (the
        # Column builders cross py4j per expression node; at 84 keys per
        # pipeline build the difference is ~2 s of pure plan construction).
        # Twin/Column equivalence is asserted in tests/test_scalars.py.
        sql = scalars.normalize_join_key_sql(k, strip_all_whitespace=k in strip_ws)
        out[k] = F.expr(sql)
    df = df.withColumns(out)
    if dates:
        qi = scalars._sql_ident
        df = conform.one_eval_barrier(df)
        df = df.withColumns(
            {k: F.expr(scalars.normalize_join_date_stage1_sql(qi(k))) for k in dates}
        )
        df = conform.one_eval_barrier(df)
        df = df.withColumns(
            {k: F.expr(scalars.normalize_join_date_stage2_sql(qi(k))) for k in dates}
        )
    return df


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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreaker: str | None = None,
) -> DataFrame:
    """As-of (backward) join: for each left row, the right row with the
    greatest right_ts <= left_ts within the same key group; unmatched left
    rows keep NULL payload.

    Spark has no native as-of join; the scalable plan is the union-window
    form — ONE shuffle on the key, no range-condition join that would
    degenerate to a broadcast-nested-loop at scale:
      union(left tagged 1, right tagged 0)
      -> window per key ordered by (ts, tag[, tiebreaker])
      -> last(non-null payload struct) carried forward
      -> keep left rows.
    Right rows sort before left rows at equal ts, so `<=` semantics match
    e.g. DuckDB's ASOF JOIN. Pass `tiebreaker` when (key, right_ts) is not
    unique to make the winning right row deterministic.
    """
    from pyspark.sql import Window

    lcols = [c for c in left.columns if c not in on]
    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{p}:{dict(right.dtypes)[p]}" for p in payload) + ">"
        ).alias("__p"),
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreaker).cast("long") if tiebreaker else F.lit(0)).alias("__tb"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(*[F.col(p) for p in payload]).alias("__p"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).withColumn(
        "__pf", F.last("__p", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l.{c}").alias(c) for c in lcols if c != left_ts],
        *[F.col(f"__pf.{p}").alias(p) for p in payload],
    )
    return out


def range_join(
    left: DataFrame,
    right_small: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Band/range join: left.value in [right.lo, right.hi). The small side
    is broadcast so the non-equi condition never becomes a shuffled
    nested-loop — the only plan shape that survives a 100 TB left side."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return left.join(F.broadcast(right_small), cond, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-buster equi-join: left rows get a deterministic salt in
    [0, salt), the right side is replicated `salt` times, and the join runs
    on key+salt — a hot key's rows spread over `salt` reducers instead of
    one straggler. Result set is IDENTICAL to the plain join (verified by
    the salted_join_skew oracle). AQE's skew-join split is the automatic
    alternative; explicit salting also covers aggregations and older
    runtimes.

    Only inner/left/left_semi are result-identical under salting: the
    right side is replicated `salt` times, so a right/full outer join
    would emit `salt` null-extended copies of every unmatched right row.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe (right side is "
            "replicated); use 'inner', 'left', or 'left_semi'"
        )
    lsalt = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    rrep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalt.join(rrep, on + ["__salt"], how)
    return out.drop("__salt")


def semi_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """EXISTS — rows of left with at least one match in right."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """NOT EXISTS — rows of left with no match in right (the idiomatic form
    of the reference's row-removal filters P4/P5)."""
    return left.join(right, on=on, how="left_anti")


def key_bitset_prefilter(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    n_bits: int = 65536,
) -> DataFrame:
    """Bloom-style broadcast prefilter: hash the build side's keys into an
    `n_bits`-bit bitset (n_bits/64 longs, collected once — bounded driver
    state independent of build-side row count), then drop probe rows whose
    key bucket is empty BEFORE any shuffle. May pass false positives
    (hash-bucket collisions) but never drops a true match, so
    `semi_join(key_bitset_prefilter(p, k, b, bk), b, ...)` is
    result-identical to the plain semi join while shuffling only the
    surviving rows — the explicit, engine-portable form of Spark's runtime
    bloom-filter join (spark.sql.optimizer.runtime.bloomFilter.*)."""
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    words_n = n_bits // 64
    bkt = F.pmod(F.xxhash64(build_key), F.lit(n_bits))
    rows = (
        build.select(bkt.alias("__bkt"))
        .distinct()
        .select(
            (F.col("__bkt") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(__bkt % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    words = [0] * words_n
    for r in rows:
        words[r["w"]] = r["bits"]
    h = F.pmod(F.xxhash64(probe_key), F.lit(n_bits))
    word = F.element_at(
        F.lit(words).cast("array<bigint>"), (F.col("__h") / 64).cast("int") + 1
    )
    mask = F.expr("shiftleft(1L, CAST(__h % 64 AS INT))")
    return (
        probe.withColumn("__h", h)
        .filter(word.bitwiseAND(mask) != 0)
        .drop("__h")
    )
