"""Known-answer tests for the round-13 operators on tiny handcrafted
inputs — the independent layer that catches what oracle parity cannot
(both engines sharing a wrong derivation)."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402

QS = ent.queries()


# ---------------------------------------------------------------- text fns


def test_flesch_known_values(spark):
    """'The cat sat.' -> 3 words, 1 sentence, 3 vowel-group syllables:
    206.835 - 1.015*3 - 84.6*1 = 119.19."""
    from domanda_etl_spark.functions import text as T

    df = spark.createDataFrame([("The cat sat.",), ("",)], "text STRING")
    rows = df.select(
        T.token_count("text").alias("w"),
        T.sentence_count("text").alias("s"),
        T.syllable_count("text").alias("sy"),
        T.flesch_reading_ease("text").alias("f"),
    ).collect()
    assert (rows[0]["w"], rows[0]["s"], rows[0]["sy"]) == (3, 1, 3)
    assert abs(rows[0]["f"] - 119.19) < 1e-9
    # empty text: 0 words -> NULL score (nullif guard), sentence floor 1
    assert rows[1]["w"] == 0 and rows[1]["s"] == 1 and rows[1]["f"] is None


def test_strip_markup_known_values(spark):
    from domanda_etl_spark.functions import text as T
    from pyspark.sql import functions as F

    cases = [
        ("<p>hello <b>world</b></p>", "hello world"),
        # single-pass entity semantics: &amp;lt; is the LITERAL &lt;
        ("a &amp;lt; b &amp; c &lt;tag&gt;", "a &lt; b & c <tag>"),
        ("no markup at   all", "no markup at all"),
        ('<div class="x"><span>nested</span> <i>tags</i></div>', "nested tags"),
    ]
    df = spark.createDataFrame(cases, "raw STRING, want STRING")
    bad = df.filter(T.strip_markup(F.col("raw")) != F.col("want")).collect()
    assert bad == [], [(r["raw"], r["want"]) for r in bad]


def test_html_strip_roundtrip_all_true(spark):
    """The registered query's self-check: every sf0.001 document survives
    the escape -> wrap -> strip round-trip byte-exactly."""
    out = QS["html_strip_clean"](spark, "/root/testdata/sf0.001").collect()
    assert out and all(r["roundtrip_ok"] for r in out)
    assert all(r["n_tags"] >= 3 for r in out)  # div + at least one p pair


# ---------------------------------------------------------------- MI / PMI


def test_mutual_information_known_values(spark, tmp_path):
    """2x2 perfectly dependent table: x=A <=> y=1994 (2 rows each cell on
    the diagonal, none off it). PMI(A,1994) = lg2(2) + lg2(4) - lg2(2)
    - lg2(2) = 1 bit = 1e6 micro-bits exactly (inputs are powers of two,
    so the truncated log is exact)."""
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_custkey": pa.array([1, 1, 1, 1], pa.int64()),
            "o_orderstatus": pa.array(["A", "A", "B", "B"]),
            "o_totalprice": pa.array([1.0, 1.0, 1.0, 1.0]),
            "o_orderdate": pa.array(
                [10957, 10957, 11323, 11323], pa.date32()
            ),  # 2000-01-01, 2001-01-01
            "o_orderpriority": pa.array(["1-URGENT"] * 4),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    rows = {
        (r["x"], r["y"]): r
        for r in QS["mutual_information_cells"](spark, str(tmp_path)).collect()
    }
    assert set(rows) == {("A", 2000), ("B", 2001)}
    for r in rows.values():
        assert r["n_xy"] == 2
        assert r["pmi_micro_bits"] == 1_000_000  # exactly 1 bit
        assert r["mi_num_micro"] == 2_000_000


# ---------------------------------------------------------------- jaccard LP


def test_jaccard_linkpred_known_values(spark, tmp_path):
    """Path graph 1-2-3 (baskets {1,2} and {2,3}): the only candidate is
    (1,3) with 1 common neighbor; deg(1)=deg(3)=1, wait — degrees come
    from the co-purchase edge set: edges {1-2, 2-3} give deg 1,2,1, so
    J(1,3) = 1 / (1 + 1 - 1) = 1.0 -> 1_000_000 ppm."""
    li = pa.table(
        {
            "l_orderkey": pa.array([10, 10, 20, 20], pa.int64()),
            "l_partkey": pa.array([1, 2, 2, 3], pa.int64()),
            "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_quantity": pa.array([1.0] * 4),
            "l_extendedprice": pa.array([1.0] * 4),
            "l_discount": pa.array([0.0] * 4),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": pa.array(["N"] * 4),
            "l_linestatus": pa.array(["O"] * 4),
            "l_shipdate": pa.array([10957] * 4, pa.date32()),
            "l_linenumber": pa.array([1, 2, 1, 2], pa.int32()),
        }
    )
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    rows = QS["jaccard_linkpred"](spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["x"], r["y"], r["n_common"], r["jaccard_ppm"]) == (1, 3, 1, 1_000_000)


# ---------------------------------------------------------------- kv / regex


def test_kv_pair_parse_shape(spark):
    out = QS["kv_pair_parse"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    n_orders = len({r["o_orderkey"] for r in rows})
    assert len(rows) == 3 * n_orders  # exactly three kv pairs per order
    assert {r["kv_key"] for r in rows} == {"status", "prio", "cust"}
    # values never contain the separators they were parsed from
    assert all("&" not in r["kv_value"] and "=" not in r["kv_value"] for r in rows)


def test_regexp_extract_all_known_values(spark, tmp_path):
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "a1 b22 c22 and 1234567890123 overflow-guarded",
                    "no digits here",
                    "7",
                ]
            ),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([10, 10, 1], pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in QS["regexp_extract_all_stats"](spark, str(tmp_path)).collect()}
    # doc 1: numbers 1, 22, 22, 1234567890123 -> n=4, distinct=3,
    # sum skips the 13-digit value: 1+22+22 = 45
    assert (rows[1]["n_numbers"], rows[1]["n_distinct_numbers"], rows[1]["num_sum"]) == (4, 3, 45)
    assert (rows[2]["n_numbers"], rows[2]["num_sum"]) == (0, 0)
    assert (rows[3]["n_numbers"], rows[3]["num_sum"]) == (1, 7)


# ---------------------------------------------------------------- audit


def test_approx_percentile_bound_holds(spark):
    rows = QS["approx_percentile_bound_audit"](spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["p50_within_bound"] for r in rows)
