"""Dump the ITERATIVE operators' loop-body physical plans to
plans/r17/loopbody_<op>_<tag>.txt — the before/after evidence for the
round-16 partition-preserving checkpoint rework.  Query-level
`.explain` output for these queries is checkpoint-truncated (the
returned DataFrame is one Scan ExistingRDD), so the honest plan
evidence is the per-round plan collected through the operators'
`plan_probe` hook — the same hook tests/test_graph_plan_gates.py gates
on.

The graph operators run on the deterministic ring+chords graph the
plan-gate tests use (plan SHAPE is input-independent: the same joins,
aggregates and exchanges appear for any edge table); BFS has no
operator-level hook, so its level body is reconstructed inline from the
entry-file code on the real sf0.1 purchase graph and labeled as such.

Usage: python tools/loopbody_r17.py <tag>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from domanda_etl_spark.operators.dedup import connected_components
from domanda_etl_spark.operators.graph import (
    hits_integer,
    kcore,
    lpa_labels,
    pagerank_integer,
    ppr_integer,
)
from domanda_etl_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
)


def _edges(spark, n=120, chords=(1, 2, 7)):
    base = spark.range(n).select(F.col("id").alias("src"))
    e = None
    for d in chords:
        part = base.select("src", ((F.col("src") + d) % n).alias("dst"))
        e = part if e is None else e.unionByName(part)
    return e


def _dump(name: str, tag: str, probes: list) -> None:
    path = os.path.join(OUT, f"loopbody_{name}_{tag}.txt")
    with open(path, "w") as f:
        for i, (ptag, plan) in enumerate(probes):
            f.write(f"==== probe {i}: {ptag} ====\n{plan}\n")
    n_ex = sum(
        p.count("Exchange") - p.count("ReusedExchange") for _, p in probes
    )
    print(f"wrote {path} ({len(probes)} probes, {n_ex} Exchange nodes)")


def main() -> None:
    tag = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="loopbody-r17")

    probes: list = []
    pagerank_integer(_edges(spark), iterations=2, plan_probe=probes)
    _dump("pagerank", tag, probes)

    probes = []
    seeds = spark.range(5).select(F.col("id").alias("node"))
    ppr_integer(_edges(spark), seeds, iterations=2, plan_probe=probes)
    _dump("ppr", tag, probes)

    probes = []
    hits_integer(_edges(spark), iterations=2, plan_probe=probes)
    _dump("hits_window_form", tag, probes)

    probes = []
    hits_integer(
        _edges(spark), iterations=2, window_norm_max_nodes=0, plan_probe=probes
    )
    _dump("hits_scale_form", tag, probes)

    probes = []
    ed = _edges(spark).selectExpr("src AS a", "dst AS b")
    e2 = ed.unionByName(ed.selectExpr("b AS a", "a AS b")).localCheckpoint(
        eager=True
    )
    lpa_labels(e2, rounds=2, plan_probe=probes)
    _dump("lpa", tag, probes)

    probes = []
    kcore(_edges(spark, n=30, chords=(1,)), k=3, a="src", b="dst", plan_probe=probes)
    _dump("kcore", tag, probes)

    probes = []
    cc_e = _edges(spark, n=40, chords=(1,)).selectExpr("src AS id_a", "dst AS id_b")
    connected_components(cc_e, plan_probe=probes)
    _dump("connected_components", tag, probes)

    # BFS level body, reconstructed from the entry-file loop on the real
    # sf0.1 purchase graph (the entry function has no probe hook); the
    # captured plan is level 1's `nxt` exactly as bfs_reachability_levels
    # builds it.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod

    orders = entrymod._t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = entrymod._t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    und_plain = (
        edges.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(edges.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    )
    try:
        from domanda_etl_spark.operators.checkpoint import (
            keyed_checkpoint,
            loop_partitions,
        )

        und0 = und_plain.localCheckpoint(eager=True)
        parts = loop_partitions(und0)
        und = keyed_checkpoint(und0.repartition(parts, "src"), parts)
        pinned = True
    except ImportError:  # before-tree: no checkpoint module
        und = und_plain.localCheckpoint(eager=True)
        pinned = False
    seed = (
        und.filter(F.col("src") % 2 == 0)
        .agg(F.min("src").alias("node"))
        .filter(F.col("node").isNotNull())
    )
    visited = seed.withColumn("hops", F.lit(0)).localCheckpoint(eager=True)
    frontier = visited.select("node")
    if pinned:
        nxt = (
            frontier.hint("shuffle_hash")
            .join(und, frontier["node"] == und["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(
                visited.select("node").hint("shuffle_hash"),
                "node",
                "left_anti",
            )
        )
        # the entry wraps this level in keyed_checkpoint(..., parts):
        # plan it under the SAME conf scope (AQE off, loop width) so the
        # captured plan is the one that actually materializes, without
        # checkpoint-truncating the capture itself
        _aqe = spark.conf.get("spark.sql.adaptive.enabled")
        _shuf = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            plan_txt = nxt._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", _aqe)
            spark.conf.set("spark.sql.shuffle.partitions", _shuf)
        _dump("bfs_level", tag, [("bfs_level1_nxt", plan_txt)])
        spark.stop()
        return
    else:
        nxt = (
            frontier.join(und, frontier["node"] == und["src"])
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
    _dump(
        "bfs_level",
        tag,
        [("bfs_level1_nxt", nxt._jdf.queryExecution().executedPlan().toString())],
    )

    spark.stop()


if __name__ == "__main__":
    main()
