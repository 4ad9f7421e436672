"""Distributed graph algorithms beyond connected components.

PageRank here is EXACT-ARITHMETIC: ranks live in integer micro-units and
every step (out-degree division, damping) is bigint floor arithmetic, so
two engines iterating the same graph agree bit-for-bit — the same
determinism move as tfidf's rational idf and gini's integer sums. At
production scale you would switch the contribution math to doubles and
accept approximate ranks; the distributed shape (edge join + partial-agg
groupBy per iteration, checkpointed lineage) is identical either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore(
    edges: DataFrame,
    k: int,
    a: str = "a",
    b: str = "b",
    max_rounds: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling over an undirected edge
    list (each edge given once, either orientation): repeatedly drop
    every vertex whose degree among SURVIVING vertices is < k, until a
    fixpoint. The result is the maximal subgraph with min-degree >= k —
    the standard graph-cleaning primitive (spam/bot subgraph trimming,
    community-core extraction) the rest of the graph family
    (pagerank / triangles / k-hop) doesn't cover.

    Distributed shape: per round ONE partial-agg degree groupBy plus two
    semi-joins of the edge list against the survivor set — all keyed
    shuffles, no broadcast of anything vertex-scale. The edge list is
    localCheckpoint-ed each round so the plan stays O(1) deep (the
    connected-components lineage-control move), and convergence is
    detected by survivor COUNT (one scalar per round, never a collect of
    vertices). Rounds are bounded by the peeling depth of the graph —
    O(log n) on heavy-tailed graphs in practice — with a hard
    `max_rounds` guard that raises instead of silently returning a
    non-core.

    If `stats` is given, writes {"rounds": <peel rounds executed>} into
    it — tests use this to prove the unrolled-CTE oracle's depth covers
    the real peeling depth.

    Returns (v, core_degree) for every vertex of the k-core.
    """
    und = (
        edges.selectExpr(f"{a} AS v", f"{b} AS u")
        .union(edges.selectExpr(f"{b} AS v", f"{a} AS u"))
        .localCheckpoint(eager=True)
    )
    alive = und
    n_prev = alive.select("v").distinct().count()
    rounds = 0
    while True:
        keep = (
            alive.groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= k)
            .select("v")
            .localCheckpoint(eager=True)
        )
        n_keep = keep.count()
        if n_keep == n_prev:
            break
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"kcore: no fixpoint after {max_rounds} peel rounds "
                f"({n_prev} -> {n_keep} survivors); raise max_rounds"
            )
        alive = (
            alive.join(keep, "v", "leftsemi")
            .join(keep.withColumnRenamed("v", "u"), "u", "leftsemi")
            .localCheckpoint(eager=True)
        )
        n_prev = n_keep
    if stats is not None:
        stats["rounds"] = rounds
    return alive.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 8,
    damping_milli: int = 850,
    init_micro: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list, in exact
    integer arithmetic: every node starts at `init_micro`; each round
    r'(v) = (1000 - damping_milli) * init_micro // 1000
          + damping_milli * SUM_{u->v}(r(u) // outdeg(u)) // 1000.

    Per iteration: one edge⋈rank join (shuffle on src — or co-located if
    the edge list is bucketed by src), one partial-agg groupBy(dst), one
    map. The rank table is localCheckpoint-ed each round so the plan stays
    O(1) deep (same lineage-control as connected_components); the edge
    set is checkpointed once up front so upstream edge derivation never
    re-executes. Dangling nodes (no out-edges) still RECEIVE rank; their
    outbound mass is dropped, which matches the unrolled-CTE oracle.

    Returns (node, rank_micro).
    """
    e = edges.selectExpr(f"{src} AS src", f"{dst} AS dst").localCheckpoint(
        eager=True
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # outdeg is loop-INVARIANT: fold it into the edge table once (and
    # checkpoint the result) instead of re-joining it every iteration —
    # one join per round saved, and the per-round join keys on src only.
    e = (
        e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")), "src")
        .localCheckpoint(eager=True)
    )
    base = (1000 - damping_milli) * init_micro // 1000
    ranks = nodes.select("node", F.lit(init_micro).cast("long").alias("r"))
    for it in range(iterations):
        contrib = e.join(ranks, e.src == ranks.node).select(
            F.col("dst"), F.expr("r div outdeg").alias("c")
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(incoming, nodes.node == incoming.dst, "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{damping_milli} * coalesce(s, 0L) div 1000")
            ).cast("long").alias("r"),
        )
        # checkpoint every OTHER round: lineage stays O(1) deep (2 rounds
        # of join+agg unroll fine through codegen) while the number of
        # eager materialization jobs — the fixed per-round cost — halves
        if it % 2 == 1 or it == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_micro"))
