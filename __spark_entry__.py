"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship query (multi-join revenue rollup) at sf0.001.
`queries()` — one entry per implemented operator from SURVEY.md §2, each a
(spark, sf_dir) -> DataFrame callable built on the domanda_etl_spark engine.
`oracle_sql()` — ANSI-SQL equivalents DuckDB runs on the same parquet.

Cross-engine determinism conventions used throughout:
- SUM over doubles goes through DECIMAL (exact, order-insensitive) and is
  cast back to DOUBLE: identical float64 on both sides.
- Row-level double arithmetic (a*b, 1-x) is IEEE-deterministic — safe.
- Ratios/cosines are rounded to 6 digits on both sides; rankings order by
  the ROUNDED value with an id tiebreaker.
- All hashes are md5 (identical in Spark and DuckDB).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from domanda_etl_spark.functions import scalars as S
from domanda_etl_spark.functions import text as T
from domanda_etl_spark.operators import conform, dedup, joins, similarity, windows
from domanda_etl_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _dec_sum(col, scale: int = 2, alias: str | None = None):
    """Order-insensitive exact sum of a double column: via decimal, back to
    double (identical float64 in Spark and DuckDB)."""
    e = F.sum(col.cast(f"decimal(30,{scale})")).cast("double")
    return e.alias(alias) if alias else e


# --------------------------------------------------------------------------
# Flagship: revenue rollup across the full join tree (S2+J1+A-agg shape).
# --------------------------------------------------------------------------
def flagship_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    # dims are small: broadcast keeps the lineitem scan shuffle-free until
    # the final group-by
    joined = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    revenue = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(30,8)"
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


FLAGSHIP_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_regional_revenue(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# Query registry: name -> (builder, oracle_sql | None)
# --------------------------------------------------------------------------
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


_REGISTRY["flagship_regional_revenue"] = (flagship_regional_revenue, FLAGSHIP_SQL)


# ---- S2/A1/P1: scan with filter + distinct pushed to the source ----------
@q(
    "scan_filter_distinct",
    """
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipmode
    FROM (SELECT l_returnflag, l_linestatus,
                 CASE WHEN l_quantity > 25 THEN 'BULK' ELSE 'SMALL' END AS l_shipmode
          FROM lineitem
          WHERE l_quantity IS NOT NULL AND l_shipdate > TIMESTAMP '1995-06-01')
    """,
)
def scan_filter_distinct(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return dedup.distinct_rows(
        li.filter(F.col("l_quantity").isNotNull() & (F.col("l_shipdate") > F.lit("1995-06-01").cast("timestamp")))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.when(F.col("l_quantity") > 25, "BULK").otherwise("SMALL").alias("l_shipmode"),
        )
    )


# ---- P2: cast-then-compare predicate -------------------------------------
@q(
    "cast_compare_filter",
    """
    SELECT event_id, user_id, event_type,
           CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) AS k
    FROM events
    WHERE CAST(regexp_extract(props, '(\\d+)', 1) AS BIGINT) > 50
    """,
)
def cast_compare_filter(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r"(\d+)", 1).cast("bigint")
    return ev.select("event_id", "user_id", "event_type", k.alias("k")).filter(F.col("k") > 50)


# ---- P3: equality predicate splitting one table into logical sources -----
@q(
    "predicate_split_source",
    """
    SELECT event_id, user_id, value FROM events
    WHERE event_type = 'purchase' AND value > 50.0
    """,
)
def predicate_split_source(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 50.0)).select(
        "event_id", "user_id", "value"
    )


# ---- P4: regex row-validity filter (flight-number rule) ------------------
@q(
    "regex_validity_filter",
    """
    WITH coded AS (
      SELECT l_orderkey, l_linenumber,
             upper(l_returnflag || l_linestatus || CAST(l_orderkey % 100000 AS VARCHAR)) AS code
      FROM lineitem)
    SELECT l_orderkey, l_linenumber, code
    FROM coded
    WHERE code = '' OR regexp_matches(code, '^[A-Z0-9]{2}\\d{3,4}$')
    """,
)
def regex_validity_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    code = F.upper(
        F.concat(F.col("l_returnflag"), F.col("l_linestatus"), (F.col("l_orderkey") % 100000).cast("string"))
    )
    coded = li.select("l_orderkey", "l_linenumber", code.alias("code"))
    return coded.filter(~S.invalid_flight_row(["code"]))


# ---- P5: any-of-not-null filter ------------------------------------------
@q(
    "any_notnull_filter",
    """
    SELECT l_orderkey, l_linenumber,
           nullif(l_returnflag, 'N') AS t1,
           nullif(l_linestatus, 'O') AS t2
    FROM lineitem
    WHERE nullif(l_returnflag, 'N') IS NOT NULL OR nullif(l_linestatus, 'O') IS NOT NULL
    """,
)
def any_notnull_filter(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    t1 = F.nullif(F.col("l_returnflag"), F.lit("N"))
    t2 = F.nullif(F.col("l_linestatus"), F.lit("O"))
    return li.select("l_orderkey", "l_linenumber", t1.alias("t1"), t2.alias("t2")).filter(
        F.col("t1").isNotNull() | F.col("t2").isNotNull()
    )


# ---- P7: wide projection (flagship projection node) ----------------------
@q(
    "wide_projection",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS disc_price,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
           upper(l_returnflag || '/' || l_linestatus) AS flags,
           CAST(trunc(l_quantity) AS BIGINT) AS qty_int,
           year(l_shipdate) AS ship_year,
           month(l_shipdate) AS ship_month,
           substr(CAST(l_shipdate AS VARCHAR), 1, 10) AS ship_day,
           CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band,
           l_quantity / 10.0 AS qty_frac,
           length(l_returnflag) + length(l_linestatus) AS flag_len
    FROM lineitem
    """,
)
def wide_projection(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return conform.select_aliased(
        li,
        {
            "l_orderkey": F.col("l_orderkey"),
            "l_linenumber": F.col("l_linenumber"),
            "disc_price": F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
            "charge": F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax")),
            "flags": F.upper(F.concat_ws("/", "l_returnflag", "l_linestatus")),
            "qty_int": S.guarded_to_long(F.col("l_quantity")),
            "ship_year": F.year("l_shipdate").cast("bigint"),
            "ship_month": F.month("l_shipdate").cast("bigint"),
            "ship_day": F.substring(F.col("l_shipdate").cast("string"), 1, 10),
            "disc_band": F.when(F.col("l_discount") > 0.05, "HIGH").otherwise("LOW"),
            "qty_frac": F.col("l_quantity") / 10.0,
            "flag_len": (F.length("l_returnflag") + F.length("l_linestatus")).cast("bigint"),
        },
    )


# ---- P9: ensure-columns conformance --------------------------------------
@q(
    "ensure_columns",
    """
    SELECT doc_id, lang,
           CAST(NULL AS VARCHAR) AS missing_str,
           CAST(NULL AS DOUBLE) AS missing_num
    FROM documents
    """,
)
def ensure_columns_q(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return conform.ensure_columns(docs, {"missing_str": "string", "missing_num": "double"})


# ---- P11: blank strings -> NULL ------------------------------------------
@q(
    "blank_to_null",
    """
    SELECT doc_id,
           CASE WHEN trim(padded) = '' THEN NULL ELSE padded END AS cleaned
    FROM (SELECT doc_id,
                 CASE doc_id % 3 WHEN 0 THEN '   ' WHEN 1 THEN '' ELSE source END AS padded
          FROM documents)
    """,
)
def blank_to_null(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    padded = (
        F.when(F.col("doc_id") % 3 == 0, "   ")
        .when(F.col("doc_id") % 3 == 1, "")
        .otherwise(F.col("source"))
    )
    staged = docs.select("doc_id", padded.alias("cleaned"))
    return conform.blank_strings_to_null(staged, ["cleaned"])


# ---- J1: multi-way left join ---------------------------------------------
@q(
    "multiway_left_join",
    """
    SELECT o_orderkey, o_totalprice, c_name, n_name, r_name
    FROM orders
    LEFT JOIN customer ON o_custkey = c_custkey
    LEFT JOIN nation   ON c_nationkey = n_nationkey
    LEFT JOIN region   ON n_regionkey = r_regionkey
    """,
)
def multiway_left_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    out = (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
    )
    return out.select("o_orderkey", "o_totalprice", "c_name", "n_name", "r_name")


# ---- J2: canonicalized string-key join -----------------------------------
@q(
    "normalized_key_join",
    """
    WITH o AS (SELECT o_orderkey, upper(trim(regexp_replace('  ' || CAST(o_custkey AS VARCHAR) || '  ', '\\s+', ' ', 'g'))) AS k
               FROM orders),
         c AS (SELECT c_name, CAST(c_custkey AS VARCHAR) AS k FROM customer)
    SELECT o_orderkey, c_name
    FROM o JOIN c ON o.k = c.k
    """,
)
def normalized_key_join(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    o = orders.select(
        "o_orderkey",
        F.concat(F.lit("  "), F.col("o_custkey").cast("string"), F.lit("  ")).alias("k"),
    )
    o = joins.normalize_join_keys(o, ["k"])
    c = customer.select(F.col("c_name"), F.col("c_custkey").cast("string").alias("k"))
    return o.join(F.broadcast(c), on="k").select("o_orderkey", "c_name")


# ---- A2/W1: latest-wins dedup --------------------------------------------
@q(
    "latest_wins_dedup",
    """
    SELECT user_id, event_type, event_id, value, epoch_us(ts) AS ts_us
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1
    """,
)
def latest_wins_dedup(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = windows.latest_wins(
        ev, "ts", key_cols=["user_id", "event_type"], tiebreakers=[F.col("event_id").desc()]
    )
    return out.select("user_id", "event_type", "event_id", "value", F.unix_micros("ts").alias("ts_us"))


# ---- W1: top-k per group --------------------------------------------------
@q(
    "window_topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
          FROM orders)
    WHERE rnk <= 3
    """,
)
def window_topk_per_group(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    out = windows.top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
        rank_col="rnk",
    )
    return out.select("o_custkey", "o_orderkey", "o_totalprice", F.col("rnk").cast("bigint").alias("rnk"))


# ---- analytic window suite: lag/lead/running frames ----------------------
@q(
    "window_analytics",
    """
    SELECT event_id, user_id, epoch_us(ts) AS ts_us,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_analytics(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wrank = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.sum(F.col("value").cast("decimal(30,2)")).over(wrun).cast("double").alias("running_value"),
        F.rank().over(wrank).cast("bigint").alias("value_rank"),
    )


# ---- O2/O3: global sort + limit/offset -----------------------------------
@q(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit_topk(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).select(
        "o_orderkey", "o_totalprice"
    ).limit(10)


@q(
    "sort_offset",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5
    """,
)
def sort_offset(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(5)
        .limit(10)
    )


# ---- A-agg surface: group-by aggregations (TPC-H Q1 shape) ---------------
@q(
    "group_agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS sum_disc_price,
           MIN(l_quantity) AS min_qty,
           MAX(l_extendedprice) AS max_price,
           COUNT(DISTINCT l_suppkey) AS nd_supp,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def group_agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), 2, "sum_qty"),
        _dec_sum(F.col("l_extendedprice"), 2, "sum_base_price"),
        _dec_sum(disc_price, 8, "sum_disc_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
        F.countDistinct("l_suppkey").alias("nd_supp"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---- rollup / cube / grouping sets ---------------------------------------
@q(
    "rollup_revenue",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_balance,
           COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_revenue(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        _dec_sum(F.col("c_acctbal"), 2, "total_balance"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@q(
    "cube_counts",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity"), 2, "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@q(
    "grouping_sets_sql",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_sql(spark, sf_dir):
    # SQL passthrough surface (reference entry 3.2): spark.sql over views
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        "SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
    )


# ---- set operations -------------------------------------------------------
@q(
    "set_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@q(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@q(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)  # EXCEPT (set semantics, not exceptAll's bag)


@q(
    "union_by_name",
    """
    SELECT name, acctbal, kind, segment FROM (
      SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind, c_mktsegment AS segment FROM customer
      UNION ALL BY NAME
      SELECT 'supplier' AS kind, s_acctbal AS acctbal, s_name AS name, CAST(NULL AS VARCHAR) AS segment FROM supplier)
    """,
)
def union_by_name(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
        F.col("c_mktsegment").alias("segment"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
        F.col("s_name").alias("name"),
    )
    return c.unionByName(s, allowMissingColumns=True).select("name", "acctbal", "kind", "segment")


# ---- semi / anti joins ----------------------------------------------------
@q(
    "semi_join_big_spenders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
    """,
)
def semi_join_big_spenders(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    big = orders.select(F.col("o_custkey").alias("c_custkey"))
    return joins.semi_join(customer, big, ["c_custkey"]).select("c_custkey", "c_name")


@q(
    "anti_join_no_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_no_orders(spark, sf_dir):
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.anti_join(customer, orders, ["c_custkey"]).select("c_custkey", "c_name")


# ---- A4: horizontal non-null count ---------------------------------------
@q(
    "horizontal_nonnull_count",
    """
    SELECT l_orderkey, l_linenumber,
           greatest(0, (CASE WHEN nullif(l_returnflag,'N') IS NOT NULL THEN 1 ELSE 0 END)
                     + (CASE WHEN nullif(l_linestatus,'F') IS NOT NULL THEN 1 ELSE 0 END)
                     + (CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) - 1) AS transfer_count
    FROM lineitem
    """,
)
def horizontal_nonnull_count(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    legs = [
        F.nullif(F.col("l_returnflag"), F.lit("N")),
        F.nullif(F.col("l_linestatus"), F.lit("F")),
        F.when(F.col("l_quantity") > 25, F.lit("X")),
    ]
    nn = sum((l.isNotNull().cast("int") for l in legs), F.lit(0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest(F.lit(0), nn - 1).cast("int").alias("transfer_count"),
    )


# --------------------------------------------------------------------------
# Driver API
# --------------------------------------------------------------------------
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _REGISTRY.items() if sql is not None}
