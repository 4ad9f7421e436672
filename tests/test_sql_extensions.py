"""Spark 4 SQL-level extension surfaces beyond oracle parity:

- python_udtf_chunks (Python UDTF via LATERAL): structural invariants a
  value-hash can't articulate — lossless coverage (per-doc chunk lengths
  sum to the text length), exact boundary discipline (every non-final
  chunk is full width), and contiguous indexing.
- sql_udf_suite (scalar SQL UDF + SQL table function): the inlining
  claim is asserted on the PLAN — the TVF's threshold predicate must
  reach the parquet scan as a pushed filter and no Python eval node may
  exist (SQL UDFs are Catalyst-inlined, not black boxes).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR


def test_udtf_chunks_cover_text_losslessly(spark):
    out = entrymod.queries()["python_udtf_chunks"](spark, SF_DIR)
    per_doc = out.groupBy("doc_id").agg(
        F.sum("chunk_len").alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.min("chunk_idx").alias("min_idx"),
        F.max("chunk_idx").alias("max_idx"),
        # every chunk except the highest-index one must be exactly 256 wide
        F.sum(
            F.when(F.col("chunk_len") != 256, 1).otherwise(0)
        ).alias("n_partial"),
    )
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", F.length("text").alias("n"))
        .filter(F.col("n") > 0)
    )
    joined = per_doc.join(docs, "doc_id", "full").collect()
    assert joined, "fixture produced no documents"
    for r in joined:
        assert r["covered"] is not None and r["n"] is not None, r
        assert r["covered"] == r["n"], r  # lossless coverage
        assert r["n_chunks"] == math.ceil(r["n"] / 256), r
        assert (r["min_idx"], r["max_idx"]) == (0, r["n_chunks"] - 1), r
        # at most the final chunk may be partial
        assert r["n_partial"] <= 1, r
        if r["n"] % 256 == 0:
            assert r["n_partial"] == 0, r


def test_collated_groupby_pools_case_variants(spark):
    """UNICODE_CI grouping must pool ALL deliberately-synthesized case
    variants: at fixture scale every source tag has ≥ 3 docs spread over
    the three doc_id%3 casing arms, so every CI group must report exactly
    3 binary-distinct spellings — and the group total must equal the
    plain per-source count (nothing dropped or double-counted)."""
    out = entrymod.queries()["collated_group_counts"](spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    expected = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["source_lc"] for r in out} == set(expected)
    for r in out:
        assert r["n"] == expected[r["source_lc"]], r
        assert r["n_case_variants"] == 3, r


def test_sql_udf_inlines_into_scan(spark):
    df = entrymod.queries()["sql_udf_suite"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the SQL TVF's `o_totalprice >= thresh` body predicate must be
    # pushed to the parquet scan — proof the function was inlined
    assert "GreaterThanOrEqual(o_totalprice,150000.0)" in plan, plan
    # and no Python evaluation anywhere: SQL UDFs are not UDF black boxes
    assert "EvalPython" not in plan
    rows = {r["band"]: r for r in df.collect()}
    assert set(rows) <= {"mid", "high", "top"}
    for r in rows.values():
        # fee is 7% of the price sum, modulo per-row double rounding and
        # the final round-to-cents — relative tolerance is generous
        assert abs(r["fee_total"] - 0.07 * r["sum_price"]) <= max(
            1e-6 * r["sum_price"], 0.01
        ), r
