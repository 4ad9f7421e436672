"""Spark 4 Python DataSource API (sources/pydatasource.py): split
planning, Arrow batch emission, filter pushdown, and value fidelity vs a
Python recompute of the shared generation rule."""

from __future__ import annotations

from pyspark.sql import functions as F

from domanda_etl_spark.sources.pydatasource import (
    SyntheticEventsDataSource,
    row_at,
)


def _load(spark, n: int, parts: int):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)
    return (
        spark.read.format("synthetic_events")
        .option("n", n)
        .option("parts", parts)
        .load()
    )


def test_values_match_generation_rule(spark):
    rows = sorted(_load(spark, 500, 3).collect())
    assert len(rows) == 500
    for r in rows:
        assert tuple(r) == row_at(r["i"])


def test_split_planning_honors_parts(spark):
    df = _load(spark, 10_000, 7)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 10_000


def test_filter_pushdown_consumed_at_source(spark):
    df = _load(spark, 10_000, 4).filter(F.col("kind") == "b")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the equality predicate is consumed by pushFilters -> only the
    # isnotnull guard remains post-scan
    assert "= b)" not in plan, plan
    assert "BatchScan synthetic_events" in plan
    # and the source-side filtering is CORRECT, not just claimed
    expect = sum(1 for i in range(10_000) if "abc"[i % 3] == "b")
    assert df.count() == expect


def test_unsupported_filter_stays_post_scan(spark):
    df = _load(spark, 10_000, 4).filter(F.col("cents") > 5000)
    expect = sum(1 for i in range(10_000) if (i * i) % 10000 > 5000)
    assert df.count() == expect


def test_zero_rows_yields_empty_frame(spark):
    # n=0 must plan a single empty split, not raise range(0, 0, 0)
    assert _load(spark, 0, 4).count() == 0


def _write(spark, df, path, mode="append"):
    from domanda_etl_spark.sources.pydatasource import ArrowParquetSinkDataSource

    spark.dataSource.register(ArrowParquetSinkDataSource)
    df.write.format("arrow_parquet_sink").option("path", str(path)).mode(mode).save()


def test_arrow_sink_roundtrip_exact(spark, tmp_path):
    import json

    src = _load(spark, 1000, 4).select("i", "user_id", "kind")
    _write(spark, src, tmp_path / "out")
    back = spark.read.parquet(str(tmp_path / "out"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    marker = json.load(open(tmp_path / "out" / "_SUCCESS"))
    assert marker["rows"] == 1000


def test_arrow_sink_overwrite_replaces(spark, tmp_path):
    out = tmp_path / "out"
    _write(spark, _load(spark, 100, 2).select("i"), out)
    _write(spark, _load(spark, 30, 2).select("i"), out, mode="overwrite")
    assert spark.read.parquet(str(out)).count() == 30


def test_arrow_sink_no_temp_litter_after_commit(spark, tmp_path):
    out = tmp_path / "out"
    _write(spark, _load(spark, 100, 3).select("i", "cents"), out)
    leftovers = [p.name for p in out.iterdir() if p.name.startswith("_tmp-")]
    assert leftovers == []


def test_arrow_sink_requires_path(spark):
    import pytest as _pytest

    from domanda_etl_spark.sources.pydatasource import ArrowParquetSinkDataSource

    spark.dataSource.register(ArrowParquetSinkDataSource)
    with _pytest.raises(Exception, match="path"):
        _load(spark, 10, 1).write.format("arrow_parquet_sink").mode("append").save()
