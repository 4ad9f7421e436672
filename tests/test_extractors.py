"""Named per-supplier extractor surface (reference etl/extractor.py:19-121):
filter + DISTINCT semantics, the eztravel domestic/foreign split, and the
injected cutoff clock."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from domanda_etl_spark.sources import Extractor

CUTOFF = 1_700_000_000


@pytest.fixture
def lake(spark, tmp_path):
    base = str(tmp_path / "lake")
    cola = spark.createDataFrame(
        [
            (100.0, CUTOFF + 10.0),
            (100.0, CUTOFF + 10.0),   # duplicate -> DISTINCT collapses
            (None, CUTOFF + 10.0),    # null price -> dropped
            (50.0, CUTOFF - 10.0),    # before cutoff -> dropped
        ],
        "`總售價` double, `建立時間` double",
    )
    cola.write.parquet(f"{base}/New_cola_air_tickets_price.parquet")
    ez = spark.createDataFrame(
        [
            (10.0, str(CUTOFF + 5), False),
            (11.0, str(CUTOFF + 5), True),
            (12.0, str(CUTOFF - 5), False),  # stale -> dropped
            (None, str(CUTOFF + 5), False),  # null price -> dropped
        ],
        "`票面價格` double, crawl_time string, `海外供應商` boolean",
    )
    ez.write.parquet(f"{base}/New_Eztravel_air_tickets_price.parquet")
    for t in ("New_settour_air_tickets_price", "New_Lion_air_tickets_price",
              "New_richmond_air_tickets_price"):
        spark.createDataFrame(
            [(1.0, str(CUTOFF + 1)), (1.0, str(CUTOFF + 1))],
            "`票面價格` double, crawl_time string",
        ).write.parquet(f"{base}/{t}.parquet")
    return base


def test_cola_filter_distinct_and_cutoff(spark, lake):
    ex = Extractor(spark, lake, CUTOFF)
    rows = ex.extract_cola_data().collect()
    assert len(rows) == 1 and rows[0]["總售價"] == 100.0


def test_eztravel_domestic_foreign_split(spark, lake):
    ex = Extractor(spark, lake, CUTOFF)
    dom = ex.extract_eztravel_data().collect()
    foreign = ex.extract_foreign_supplier_eztravel_data().collect()
    assert [r["票面價格"] for r in dom] == [10.0]
    assert [r["票面價格"] for r in foreign] == [11.0]


def test_supplier_distinct_and_sql_passthrough(spark, lake):
    ex = Extractor(spark, lake, CUTOFF)
    assert ex.extract_set_data().count() == 1
    assert ex.extract_lion_data().count() == 1
    assert ex.extract_rich_data().count() == 1
    spark.range(3).createOrReplaceTempView("tiny")
    assert ex.fetch_data_as_dataframe("SELECT COUNT(*) AS n FROM tiny").first()["n"] == 3
    with pytest.raises(TypeError):
        ex.fetch_data_as_dataframe(123)


def test_filters_reach_the_scan(spark, lake):
    ex = Extractor(spark, lake, CUTOFF)
    plan = ex.extract_set_data()._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull" in plan


def test_table_cache_evicts_superseded_entries(spark, tmp_path):
    """A rewritten file must replace (not accumulate beside) its old cache
    entry, so the cache size is bounded by live files and no stale plan
    object stays pinned."""
    import pandas as pd

    from domanda_etl_spark.sources import parquet as pq_mod

    p = tmp_path / "t.parquet"
    pd.DataFrame({"a": [1, 2]}).to_parquet(p)
    pq_mod.load_table(spark, str(tmp_path), "t")
    n0 = sum(1 for k in pq_mod._TABLE_CACHE if k[1] == str(p))
    assert n0 == 1
    import os as _os

    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(p)
    _os.utime(p, ns=(1, 1))  # force a distinct mtime_ns deterministically
    df2 = pq_mod.load_table(spark, str(tmp_path), "t")
    assert sum(1 for k in pq_mod._TABLE_CACHE if k[1] == str(p)) == 1
    assert df2.count() == 3
