"""Focused tests for operators/checkpoint.py::keyed_checkpoint — the
round-16 partition-preserving localCheckpoint that the iterative graph /
CC / BFS loops build on.

The mechanism under test: `Dataset.localCheckpoint` records the physical
plan's outputPartitioning into the LogicalRDD it leaves behind, but
under AQE the physical plan is an AdaptiveSparkPlanExec whose reported
partitioning is UnknownPartitioning — so every downstream join/groupBy
on the checkpoint key pays a fresh Exchange.  keyed_checkpoint scopes
AQE off for just the materialization so the HashPartitioning survives.
These tests pin (a) the planner-visible partitioning itself, (b) the
downstream exchange elision that is the whole point, (c) conf
restoration, and (d) value equality with the plain form.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from domanda_etl_spark.operators.checkpoint import keyed_checkpoint  # noqa: E402

_AQE = "spark.sql.adaptive.enabled"


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(plan: str) -> int:
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "ReusedExchange" not in ln
    )


def test_keyed_checkpoint_preserves_hash_partitioning(spark):
    base = spark.range(500).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    kc = keyed_checkpoint(base.repartition("k"))
    plain = base.repartition("k").localCheckpoint(eager=True)
    # the LogicalRDD must re-enter the planner as hashpartitioning(k);
    # the plain (AQE-wrapped) checkpoint loses it to UnknownPartitioning
    part = lambda df: str(  # noqa: E731
        df._jdf.queryExecution().executedPlan().outputPartitioning()
    )
    assert "hashpartitioning(k" in part(kc), part(kc)
    assert "UnknownPartitioning" in part(plain), part(plain)


def test_downstream_groupby_on_key_is_exchange_free(spark):
    base = spark.range(500).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    kc = keyed_checkpoint(base.repartition("k"))
    plain = base.repartition("k").localCheckpoint(eager=True)
    agg_kc = kc.groupBy("k").agg(F.sum("v").alias("s"))
    agg_plain = plain.groupBy("k").agg(F.sum("v").alias("s"))
    # the point of the operator: the keyed form reuses the preserved
    # partitioning (0 exchanges); the plain form re-exchanges
    assert _n_exchanges(_executed_plan(agg_kc)) == 0, _executed_plan(agg_kc)
    assert _n_exchanges(_executed_plan(agg_plain)) >= 1
    # and a co-located join on the preserved key is exchange-free on the
    # checkpointed side (the other side pays its own one exchange)
    other = spark.range(7).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    j = kc.join(other.hint("shuffle_hash"), "k")
    plan = _executed_plan(j)
    assert _n_exchanges(plan) == 1, plan  # only the `other` side


def test_aqe_conf_restored_even_on_error(spark):
    assert spark.conf.get(_AQE) == "true"
    base = spark.range(10).select(F.col("id").alias("k"))
    keyed_checkpoint(base.repartition("k"))
    assert spark.conf.get(_AQE) == "true"

    # a failing materialization must still restore the conf (assert_true
    # is evaluated per row at runtime — not foldable away)
    bad = base.select(F.expr("assert_true(k < 0)").alias("x"), "k")
    with pytest.raises(Exception):
        keyed_checkpoint(bad.repartition("k"))
    assert spark.conf.get(_AQE) == "true"


def test_values_identical_to_plain_checkpoint(spark):
    base = spark.range(300).select(
        (F.col("id") % 11).alias("k"), (F.col("id") * 3).alias("v")
    )
    kc = keyed_checkpoint(base.repartition("k"))
    plain = base.localCheckpoint(eager=True)
    assert sorted(map(tuple, kc.collect())) == sorted(
        map(tuple, plain.collect())
    )
