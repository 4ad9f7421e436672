"""Executed-plan gates for the ITERATIVE graph family (VERDICT r11
§next#3): these queries run jobs at build time (localCheckpoint lineage
control), so the registry-wide plan gates in test_plans_quality.py skip
them — and their returned DataFrames are checkpoint-truncated, hiding
the loop bodies. The r11 judge found exactly one scale hazard hiding in
that exemption: HITS's max-normalization funneled ALL node rows through
an `Exchange SinglePartition` window twice per iteration
(operators/graph.py, pre-fix). These tests inspect the REAL loop-body
plans via the operators' `plan_probe` hook and pin:

- no CartesianProduct and no row-level Python anywhere in a loop body;
- no node-scale rows through a SinglePartition exchange: pagerank / PPR
  / LPA loop bodies have ZERO SinglePartition exchanges (fully keyed),
  and HITS above its size gate routes normalization through a 1-row
  partial-agg max + broadcast join (the only SinglePartition is the
  bounded partial->final max reduction);
- the size gate itself: window form only at-or-below
  `window_norm_max_nodes`, and both forms compute identical integers.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from domanda_etl_spark.operators.dedup import connected_components  # noqa: E402
from domanda_etl_spark.operators.graph import (  # noqa: E402
    hits_integer,
    kcore,
    lpa_labels,
    pagerank_integer,
    ppr_integer,
)


def _edges(spark, n=120, chords=(1, 2, 7)):
    """Small deterministic directed graph: ring + chords over n nodes."""
    base = spark.range(n).select(F.col("id").alias("src"))
    e = None
    for d in chords:
        part = base.select("src", ((F.col("src") + d) % n).alias("dst"))
        e = part if e is None else e.unionByName(part)
    return e


def _assert_no_rowscale_single_partition(tag, plan):
    """Every `Exchange SinglePartition` must be fed by a partial/merge
    aggregate (one pre-combined row per map task) — the bounded shape.
    A grouped (per-node) aggregate or raw rows feeding one is the
    unbounded shape this gate exists to catch."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        feeder = lines[i + 1] if i + 1 < len(lines) else ""
        assert "partial_" in feeder or "merge_" in feeder, (
            f"{tag}: node-scale SinglePartition exchange:\n"
            f"{line.strip()}\n{feeder.strip()}"
        )


def _assert_loop_body_clean(probes, allow_single_partition=False):
    assert probes, "plan_probe collected nothing"
    for tag, plan in probes:
        assert "CartesianProduct" not in plan, tag
        assert "EvalPython" not in plan, tag
        if allow_single_partition:
            _assert_no_rowscale_single_partition(tag, plan)
        else:
            assert "Exchange SinglePartition" not in plan, (
                f"{tag}: loop body should be fully keyed"
            )


def test_pagerank_loop_body_fully_keyed(spark):
    probes = []
    pagerank_integer(_edges(spark), iterations=2, plan_probe=probes)
    assert len(probes) == 2
    _assert_loop_body_clean(probes)


def test_ppr_loop_body_fully_keyed(spark):
    seeds = spark.range(5).select(F.col("id").alias("node"))
    probes = []
    ppr_integer(_edges(spark), seeds, iterations=2, plan_probe=probes)
    assert len(probes) == 2
    _assert_loop_body_clean(probes)


def test_lpa_loop_body_fully_keyed(spark):
    ed = _edges(spark).selectExpr("src AS a", "dst AS b")
    e = ed.unionByName(ed.selectExpr("b AS a", "a AS b")).localCheckpoint(
        eager=True
    )
    probes = []
    lpa_labels(e, rounds=2, plan_probe=probes)
    assert len(probes) == 2
    _assert_loop_body_clean(probes)


def test_connected_components_loop_body_fully_keyed(spark):
    e = _edges(spark, n=40, chords=(1,)).selectExpr(
        "src AS id_a", "dst AS id_b"
    )
    probes = []
    connected_components(e, plan_probe=probes)
    assert len(probes) >= 2  # a 40-ring needs several doubling rounds
    _assert_loop_body_clean(probes)


def test_kcore_loop_body_fully_keyed(spark):
    # plain ring (every vertex degree 2): the k=3 peel removes the whole
    # graph, so both the degree-filter and the semi-join-prune probes fire
    e = _edges(spark, n=30, chords=(1,))
    probes = []
    kcore(e, k=3, a="src", b="dst", plan_probe=probes)
    assert {t for t, _ in probes} >= {"kcore_peel", "kcore_prune"}
    _assert_loop_body_clean(probes)


def test_hits_scale_form_has_no_nodescale_single_partition(spark):
    """THE test that would have caught VERDICT r11 §wrong#1 before ship:
    force the above-threshold path (window_norm_max_nodes=0) and require
    that no half-step plan normalizes through a node-scale
    SinglePartition window — only the bounded partial->final 1-row max
    reduction may use one."""
    probes = []
    hits_integer(
        _edges(spark), iterations=2, window_norm_max_nodes=0, plan_probe=probes
    )
    assert len(probes) == 4  # 2 half-steps x 2 iterations
    for tag, plan in probes:
        assert "Window" not in plan, (
            f"{tag}: node-scale window normalization above the size gate"
        )
    _assert_loop_body_clean(probes, allow_single_partition=True)


def test_hits_window_form_only_below_gate(spark):
    """At-or-below the gate the one-pass window form is used (the sf0.1
    winner: 10.3 -> 6.7 s warm, VERDICT r10 A/B) — pin that the fast
    path still exists and is the default for this 120-node graph."""
    probes = []
    hits_integer(_edges(spark), iterations=1, plan_probe=probes)
    assert any("Window" in plan for _, plan in probes)


def test_hits_window_form_hubs_checkpoint_is_keyed(spark):
    """r16 opt: the window form's round-carrying hubs checkpoint is
    PARTITION-PRESERVING (keyed_checkpoint at the loop width), so the
    next auth half-step's scores side joins exchange-free instead of
    re-exchanging from UnknownPartitioning. Pin the planner-visible
    hashpartitioning(node) on the hub scan of the returned plan (the
    final-round checkpoint uses the same code path as the in-loop one)."""
    out = hits_integer(_edges(spark), iterations=2)
    plan = spark._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning(node" in plan, (
        "hubs checkpoint lost its hash(node) partitioning:\n" + plan
    )


def test_hits_both_norm_forms_identical(spark):
    """The gate is PHYSICAL only: both normalization forms are the same
    exact-integer math (s * ppm div max(s)), so scores must be
    bit-identical across the threshold."""
    e = _edges(spark, n=90, chords=(1, 3, 11))
    small = hits_integer(e, iterations=3).collect()
    big = hits_integer(e, iterations=3, window_norm_max_nodes=0).collect()
    key = lambda r: (r["side"], r["node"])  # noqa: E731
    assert sorted(map(tuple, small)) == sorted(map(tuple, big))
    assert {key(r): r["score_ppm"] for r in small} == {
        key(r): r["score_ppm"] for r in big
    }
