"""Physical-plan quality gates: the claims in README's scale posture,
asserted against the actual executed plans so they can't silently rot."""

from __future__ import annotations

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR

QS = entrymod.queries()


def plan_of(spark, name):
    return QS[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()


def test_flagship_all_dims_broadcast(spark):
    p = plan_of(spark, "flagship_regional_revenue")
    assert p.count("BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in p


def test_scan_filters_pushed_to_parquet(spark):
    p = plan_of(spark, "scan_filter_distinct")
    assert "PushedFilters: [IsNotNull" in p
    # column pruning: the scan must not read the full lineitem schema
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "l_extendedprice" not in read_schema


def test_latest_wins_is_single_shuffle(spark):
    p = plan_of(spark, "latest_wins_dedup")
    assert p.count("Exchange") == 1


def test_enrich_join_broadcasts_supplier_sides(spark):
    p = plan_of(spark, "domanda_unify_mini")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_range_join_is_broadcast_not_shuffled_nested_loop(spark):
    p = plan_of(spark, "range_join_value_bands")
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_no_python_udfs_in_scalar_queries(spark):
    # every scalar function must stay JVM-side (no BatchEvalPython /
    # ArrowEvalPython nodes anywhere in the scalar suite)
    for name in [
        "scalar_airline_code",
        "scalar_duration_minutes",
        "scalar_luggage",
        "scalar_time_hhmm",
        "scalar_join_date_normalize",
    ]:
        p = plan_of(spark, name)
        assert "EvalPython" not in p, name


def test_pipeline_loader_stage(spark, tmp_path):
    from domanda_etl_spark.plans import domanda
    from domanda_etl_spark.sinks import VersionedTable
    from tests.flight_fixtures import NOW, build_frames

    out = domanda.run_pipeline(*build_frames(spark), now_epoch=NOW)
    table = VersionedTable(str(tmp_path / "flight_compare"))
    version, metrics = domanda.load_output(
        out, table, verify_row={"departure_flight_number_1": "CI073", "final_price": 6200}
    )
    assert version == 0
    assert metrics["rows_in"] == table.read(spark).count() + metrics["removed_null_gds"]
