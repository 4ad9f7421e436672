"""Partition-preserving localCheckpoint for iterative operators.

`Dataset.localCheckpoint` records the physical plan's outputPartitioning
into the LogicalRDD it leaves behind — but under AQE the physical plan
is an AdaptiveSparkPlanExec whose reported partitioning is unknown, so
every checkpointed table re-enters the planner as UnknownPartitioning
and every loop-body join / groupBy on the checkpoint key pays a fresh
Exchange on BOTH sides (measured on pagerank at sf0.1: 3-4 exchanges
per iteration on a loop whose only fundamental shuffle is the one
partial-agg groupBy — guide §2.4).

`keyed_checkpoint` scopes AQE off for JUST the materialization, so the
LogicalRDD keeps its HashPartitioning and downstream joins/groupBys on
the same key reuse it (verified: pagerank's 2-round loop subplan drops
from 7 exchanges to 2 — exactly the one partial-agg exchange per round
— with every join a ShuffledHashJoin over the preserved partitioning).
This is the bucketed-table posture for loop-invariant tables: establish
the partitioning once, then every iteration is co-located.

THE PARTITION-COUNT TRADE (measured, r16): with AQE off, nothing
coalesces the materialized subplan's exchanges, so a naive form runs
every tiny loop stage at the session's full `spark.sql.shuffle.partitions`
— at sf0.1 that is 32 tasks per stage on kilobyte partitions, and the
task-scheduling overhead made kcore/LPA/BFS 1.7-2.1x SLOWER than the
AQE-coalesced plain-checkpoint form they replaced.  The fix is the
`partitions` argument: callers derive it ONCE per operator call from
the materialized parent's RDD partition count (`df.rdd.getNumPartitions()`
of an eager localCheckpoint IS AQE's size-based coalescing decision —
bytes/advisoryPartitionSize, capped by the session shuffle-partition
conf), and keyed_checkpoint scopes `spark.sql.shuffle.partitions` to it
for the materialization so EVERY exchange in the loop body — the
preserved key partitioning and the per-round aggregates alike — runs at
that size-proportional count.  Small input -> few tasks (what AQE would
have done); 100 TB input -> the conf-capped full width.  Nothing here
is local-mode-specific: the cap is SPARK_SHUFFLE_PARTITIONS, sized like
a bucket count on a cluster.

The remaining trades, stated for call sites:

- The materialized subplan is STATICALLY planned (no AQE skew-split
  inside that one job). Keep the subplan shallow — one repartition /
  window / agg over an already-materialized input — and PIN join
  strategies inside it (`hint("shuffle_hash")`): the static planner's
  LogicalRDD size estimates are unusable (defaultSizeInBytes), which is
  the r15 static-broadcast bug class.
- Joins that reuse the preserved partitioning cannot be skew-split by
  AQE (no fresh shuffle to split) — identical to the bucketed-join
  trade.  `keyed_posture_ok` below is the gate (r17, VERDICT r16
  §wrong#2): every iterative operator probes its loop-invariant edge
  table's hottest key ONCE before adopting the keyed posture, and a
  hot-key graph falls back to plain localCheckpoints, where every loop
  join replans under AQE with runtime skew-splitting.

ONE-OFF (non-loop) keyed checkpoints — the linkpred-trio / deg-rollup
posture: when a table is materialized once and its consumers join or
aggregate on the key its OWN last exchange already established (a
distinct, groupBy or rank window), `keyed_checkpoint` with the default
width merely keeps that partitioning planner-visible — no loop, no
repeated-width contract, so the CC kilobyte-task trap does not apply
and the `partitions` pin is optional (pass one when a vanilla
200-partition session materializing the subplan statically would
otherwise run kilobyte tasks).  The gain is the consumers' build/stream
side re-exchange of the materialized table — bytes-moved at corpus
scale even where the sf0.1 wall is neutral.

CONCURRENCY CONTRACT (r17, VERDICT r16 §wrong#3): keyed_checkpoint
toggles SESSION-GLOBAL conf (AQE + shuffle width) around the
materialization.  The engine's driver/bench/test paths are all
single-threaded per SparkSession, and the try/finally restores the conf
even on error — but a future concurrent query sharing the session could
be planned with AQE off during the window.  If concurrency is ever
introduced, materialize through a cloned session
(`spark.newSession()`-style conf isolation) instead of relaxing this.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AQE_KEY = "spark.sql.adaptive.enabled"
_SHUFFLE_KEY = "spark.sql.shuffle.partitions"

# Hot-key gate for the keyed loop posture (guide §2.5).  A single join
# key owning more rows than BOTH bounds means the preserved-partitioning
# loop would pin that key's rows into ONE task every round with no
# runtime rescue (the loop subplans materialize statically inside the
# AQE-off scope, so skew-split never sees them).  SKEW_FACTOR = 8 sits
# above AQE's skewedPartitionFactor = 5 so the gate does not flap on
# benign imbalance; SKEW_MIN_ROWS approximates AQE's 256 MB
# skewedPartitionThresholdInBytes at ~64 B per slim shuffled edge row —
# a few-million-row task is comfortable at any scale, so fixture-scale
# inputs always stay keyed and the measured fast posture is unchanged.
# Module-level (not parameters) so tests can monkeypatch the gate.
SKEW_FACTOR = 8.0
SKEW_MIN_ROWS = 4_000_000


def loop_partitions(df: DataFrame) -> int:
    """Size-adaptive partition count for an iterative operator's loop,
    read off a MATERIALIZED (localCheckpoint-ed) DataFrame: the RDD's
    partition count is the AQE coalescing decision for the
    materializing shuffle — proportional to bytes, capped by the
    session's shuffle-partition conf."""
    return max(1, df.rdd.getNumPartitions())


def keyed_checkpoint_counted(
    df: DataFrame, partitions: int | None = None
) -> tuple[DataFrame, int]:
    """`keyed_checkpoint` that also returns the materialized ROW COUNT,
    observed on the checkpoint job itself (CollectMetrics — zero extra
    jobs; the node passes the child's partitioning through, so the
    preserved hash layout is unchanged).  The count feeds
    `keyed_posture_ok`'s free small-table path: when the whole table is
    under SKEW_MIN_ROWS no partition can exceed the floor, so the
    histogram probe job is skipped entirely — the skew gate costs
    NOTHING at bench/fixture scale and one cheap in-memory scan at
    corpus scale."""
    from pyspark.sql import Observation

    obs = Observation()
    out = keyed_checkpoint(
        df.observe(obs, F.count(F.lit(1)).alias("n")), partitions
    )
    return out, obs.get["n"]


def keyed_posture_ok(df: DataFrame, total_rows: int | None = None) -> bool:
    """True when no partition of the MATERIALIZED keyed edge table
    concentrates more rows than max(SKEW_FACTOR x mean, SKEW_MIN_ROWS)
    (guide §2.5).  `df` must be the keyed checkpoint itself, so the
    probe is one cheap scan of the in-memory checkpoint blocks — a
    count per spark_partition_id whose readout is <= numPartitions rows
    (the same bounded-readout legitimacy class as hits_integer's
    node-count probe; an exact per-KEY groupBy histogram was measured
    ~10x dearer on the CC family at sf0.1 and the partition level is
    what task sizing actually experiences, hash collisions included).

    Iterative operators run this ONCE per call on the loop-invariant
    edge table after keying it; the per-round tables need no probe
    (their aggregates leave <= 1 row per vertex, which cannot
    concentrate).  False means: discard the keyed posture for this run
    — use the plain-checkpoint loop, where every round's joins replan
    under AQE and runtime skew-splitting bounds the hot key's task (the
    pre-r16 posture; values are identical either way, only the physical
    plan changes).  The one-off keyed materialization that fed the
    probe is wasted in that rare case — one straggler task once,
    instead of one per round.

    `total_rows` (from keyed_checkpoint_counted's free Observation)
    short-circuits the probe: a table wholly under SKEW_MIN_ROWS cannot
    have a partition over the floor, so no histogram job runs at all.
    """
    if total_rows is not None and total_rows <= SKEW_MIN_ROWS:
        return True
    hist = [
        r["c"]
        for r in df.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    ]
    nparts = max(df.rdd.getNumPartitions(), 1)
    if not hist or nparts <= 1:
        return True
    # mean over ALL partitions (empty ones produce no histogram row —
    # a single hot partition among empties must still trip the gate)
    mean = sum(hist) / nparts
    return max(hist) <= max(SKEW_FACTOR * mean, float(SKEW_MIN_ROWS))


def loop_checkpointer(keyed: bool, partitions: int):
    """The per-round checkpoint function for an iterative operator,
    selected ONCE per call from the `keyed_posture_ok` probe: the keyed
    (partition-preserving, exchange-eliding) form on uniform keys, the
    plain AQE-planned form when a hot key needs runtime skew-splitting.
    """
    if keyed:
        return lambda df: keyed_checkpoint(df, partitions)
    return lambda df: df.localCheckpoint(eager=True)


def keyed_checkpoint(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Eager localCheckpoint whose hash partitioning stays visible to the
    planner (see module docstring). The caller arranges the partitioning
    (a trailing repartition(key) / window / keyed aggregate) and passes
    the loop's `partitions` (from loop_partitions) so the materialized
    subplan's exchanges all run at the size-adaptive count."""
    spark = df.sparkSession
    old_aqe = spark.conf.get(_AQE_KEY)
    old_shuffle = spark.conf.get(_SHUFFLE_KEY)
    spark.conf.set(_AQE_KEY, "false")
    if partitions is not None:
        spark.conf.set(_SHUFFLE_KEY, str(partitions))
    try:
        return df.localCheckpoint(eager=True)
    finally:
        spark.conf.set(_AQE_KEY, old_aqe)
        spark.conf.set(_SHUFFLE_KEY, old_shuffle)
