"""Lake-layout operations that matter at 100 TB: bucketed co-located joins
(no exchange at join time) and schema-evolution reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from domanda_etl_spark.sources import load_table


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Pre-bucketing both sides of a recurring join key removes the
    per-query shuffle entirely — THE amortization for a join that runs
    daily against 100 TB. Assert the joined plan contains no Exchange."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    import shutil

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    # a previously-crashed run can leave an orphaned managed location the
    # catalog no longer tracks — saveAsTable refuses to reuse it
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "customer_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (
        orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        customer.withColumn("o_custkey", F.col("c_custkey"))
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("customer_b")
    )
    # disable broadcast so the join exercises the shuffle path bucketing is
    # meant to eliminate (at 100 TB neither side broadcasts anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        assert "SortMergeJoin" in plan
        assert joined.count() == orders.count()  # FK: every order has a customer
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_schema_evolution_merge(spark, tmp_path):
    """Parquet dirs written at different schema generations read as one
    table with mergeSchema — columns absent in old files become nulls
    (the lake-native form of the reference's ensure-columns tolerance)."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(f"{p}/gen=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.parquet(f"{p}/gen=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5
    assert set(df.columns) >= {"id", "name", "score", "gen"}
