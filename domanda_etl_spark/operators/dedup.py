"""Deduplication operators — exact and near-duplicate.

Exact dedup mirrors the reference (A1 source DISTINCT, A2 latest-wins);
the near-dup family (MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine) is the training-data-pipeline surface the reference lacks.

Scale notes (100 TB design point):
- MinHash/LSH: per-doc signatures are computed in one pass (explode
  shingles -> groupBy doc), candidate generation joins docs only within an
  LSH band bucket — no all-pairs shuffle ever materializes. Band hash
  cardinality grows with corpus size, so bucket joins stay balanced;
  mega-buckets (boilerplate docs) are capped by `max_bucket_size` (the
  B(B-1)/2 pair-blowup guard — exact dedup upstream owns those families),
  and residual in-cap skew is handled by AQE skew-join splitting.
- All hashes are md5-based => bit-identical in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def distinct_rows(df: DataFrame) -> DataFrame:
    """A1 — full-row DISTINCT (reference pushes this into each source scan,
    etl/extractor.py:67-120; Catalyst plans a partial-agg before shuffle)."""
    return df.distinct()


def first_per_key(df: DataFrame, key: str, id_col: str) -> DataFrame:
    """Exact dedup: keep min(id) per duplicate-key group — a groupBy (not a
    window) so the partial aggregation halves shuffle volume."""
    return df.groupBy(key).agg(F.min(id_col).alias(id_col))


def shingle_docs(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) pairs — distinct k-char shingles per doc."""
    return df.select(id_col, F.explode(T.char_shingles(text_col, k)).alias("shingle"))


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per doc: for seed i, min over shingles of
    md5('i:'||shingle). One explode + one groupBy — linear, no joins."""
    sh = shingle_docs(df, id_col, text_col, k)
    aggs = [
        F.min(T.minhash_element(F.col("shingle"), i)).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Near-dup candidate pairs (a < b) sharing at least one LSH band.

    bands × rows_per_band = num_hashes; docs agreeing on ALL minhashes of
    one band collide. The pair join happens per band-bucket — the classic
    shuffle-bounded LSH plan that survives web-scale corpora.

    `max_bucket_size` is the quadratic-blowup guard: a bucket with B
    members emits B(B-1)/2 pairs, so ONE boilerplate bucket (identical
    headers/footers, template pages) can dominate the whole job at corpus
    scale. Buckets above the cap are dropped from candidate generation —
    they are (near-)exact duplicate families that exact hash-dedup
    upstream handles in linear time, which is also the production
    ordering: exact dedup FIRST, then LSH for the fuzzy tail. The size
    count partitions by the same bucket key as the pair join, so the
    guard adds no new shuffle key. Fixture-scale buckets sit far below
    the default cap, so the DuckDB oracles (which compute uncapped pairs)
    remain exact at every test SF; pass None to disable."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{i}") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(F.md5(F.concat_ws("|", *parts)).alias(f"band{b}"))
    banded = sig.select(id_col, *band_cols)
    melted = banded.select(
        id_col,
        F.explode(
            F.array(*[F.concat(F.lit(f"{b}:"), F.col(f"band{b}")) for b in range(bands)])
        ).alias("bucket"),
    )
    if max_bucket_size is not None:
        # groupBy + anti-join, NOT count-over-window: the hot bucket this
        # guard exists for would gather into a single window task, while
        # the groupBy collapses it map-side (partial agg) and the
        # oversized-bucket list is tiny by construction (<= corpus/cap
        # entries, realistically a handful of boilerplate families) —
        # AQE picks broadcast for the anti-join when it fits.
        hot = (
            melted.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") > max_bucket_size)
            .select("bucket")
        )
        melted = melted.join(hot, "bucket", "left_anti")
    left = melted.alias("l")
    right = melted.alias("r")
    pairs = (
        left.join(right, on="bucket")
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return pairs


def jaccard_expr(text_a: Column | str, text_b: Column | str, k: int = 3) -> Column:
    """Jaccard over k-char shingles as a single expression (rounded to 6
    digits for oracle determinism)."""
    a = T.char_shingles(text_a, k)
    b = T.char_shingles(text_b, k)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, F.round(inter / union, 6))


def connected_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_iterations: int = 20
) -> DataFrame:
    """Connected components over near-dup pairs -> (id, component) where
    component = min id in the component. This is the step that turns
    pairwise candidates into dedup clusters ("keep one doc per component").

    Algorithm: min-label propagation with a pointer-doubling shortcut —
    each round every node adopts the smallest of (its label, its
    neighbors' labels, its label's label). The label-of-label hop halves
    the remaining distance to the component minimum each round, so
    convergence is O(log diameter) rounds rather than O(diameter): a
    chain of 1000 near-dup docs converges in ~10 rounds, not 1000. Each
    round is two joins + one groupBy — shuffle-bounded, no driver-side
    graph. Labels are checkpointed via localCheckpoint each round to keep
    the lineage (and thus the plan) from growing exponentially.

    Raises RuntimeError if the label set is still changing after
    `max_iterations` rounds — a silently split component is a correctness
    bug (docs in one dup-cluster would get different cluster ids), so
    non-convergence must be loud.
    """
    # materialize the edge set ONCE — without this every label-propagation
    # round would re-execute the (possibly expensive) upstream candidate
    # generation, e.g. the whole MinHash/LSH pipeline
    sym = (
        edges.selectExpr(f"{src} AS a", f"{dst} AS b")
        .union(edges.selectExpr(f"{dst} AS a", f"{src} AS b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    from pyspark.sql import Observation

    converged = False
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym.b == labels.id)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        staged = labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
        terms = [F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))]
        if i > 0:
            # pointer-doubling hop: the label of my current label (labels
            # are always node ids, so the lookup always hits). Skipped in
            # round 0 where labels are still the identity map.
            shortcut = labels.select(
                F.col("id").alias("s_id"), F.col("component").alias("s_comp")
            )
            staged = staged.join(shortcut, labels.component == F.col("s_id"), "left")
            terms.append(F.coalesce(F.col("s_comp"), F.col("component")))
        new_component = F.least(*terms) if len(terms) > 1 else terms[0]
        # convergence metric rides the SAME job that materializes the new
        # labels (Observation), instead of costing a second action per round
        obs = Observation(f"cc_round_{i}")
        staged = staged.select(
            "id",
            new_component.alias("component"),
            (new_component != F.col("component")).cast("long").alias("__chg"),
        ).observe(obs, F.sum("__chg").alias("n_changed"))
        labels = staged.drop("__chg").localCheckpoint(eager=True)
        if not obs.get["n_changed"]:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds; "
            "components would be silently split. Raise max_iterations."
        )
    return labels


def simhash_bits(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """SimHash per doc as a `bits`-length bitstring column `simhash`.

    Token t contributes +1/-1 to each bit position depending on bit b of
    md5(t); the sign of the per-position sum is the fingerprint bit. The
    whole computation is explode + groupBy (linear, shuffle on doc id), and
    md5-nibble arithmetic keeps it portable to the DuckDB oracle.
    """
    toks = df.select(id_col, F.explode(F.array_distinct(T.tokens(text_col))).alias("tok"))
    per_bit = toks.select(
        id_col,
        F.md5(F.col("tok")).alias("h"),
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    )
    # bit b of the 128-bit md5 (MSB-first): nibble = hexdigit b//4,
    # mask = 2^(3 - b%4); vote +1 when set, -1 when clear
    nibble = F.conv(F.substring(F.col("h"), (F.col("b") / 4).cast("int") + 1, 1), 16, 10).cast("int")
    mask = F.pow(F.lit(2), F.lit(3) - F.col("b") % 4).cast("int")
    vote = F.when(nibble.bitwiseAND(mask) > 0, 1).otherwise(-1)
    agg = per_bit.select(id_col, "b", vote.alias("vote")).groupBy(id_col, "b").agg(
        F.sum("vote").alias("s")
    )
    bit_ch = F.when(F.col("s") > 0, F.lit("1")).otherwise(F.lit("0"))
    return (
        agg.groupBy(id_col)
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("b", bit_ch.alias("c")))), lambda x: x["c"])
            ).alias("simhash")
        )
    )
