"""Similarity search over embedding columns (array<float>).

Two plans for top-k cosine neighbors:

- `cosine_topk_bruteforce`: exact; queries × corpus expressed as a
  broadcast join (queries are the small side by construction) + a
  per-query row_number window. At 100 TB corpus scale this is one full
  scan per batch of queries — the right baseline, and still
  shuffle-light because only (query_id, neighbor_id, sim) rows move.

- `cosine_topk_lsh`: approximate; both sides are bucketed by a
  signed-random-projection code, candidates are corpus vectors sharing a
  bucket with the query (multi-probe = exact-code only here), then exact
  cosine re-ranking. The scan is pruned to matching buckets — the scale
  path when queries are many.

Cosine is computed with sequential zip_with/aggregate folds (deterministic
accumulation order) and rounded to 6 digits so the DuckDB oracle matches.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def _sim(qcol: str, ccol: str):
    return F.round(V.cosine(F.col(qcol), F.col(ccol)), 6)


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k: returns (query_id, neighbor_id, sim, rank); self-matches
    excluded when ids share a domain. Deterministic tie-break on neighbor id."""
    q = F.broadcast(
        queries.select(F.col(query_id).alias("q_id"), F.col(query_vec).alias("q_vec"))
    )
    c = corpus.select(F.col(corpus_id).alias("n_id"), F.col(corpus_vec).alias("n_vec"))
    scored = (
        c.join(q, F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", _sim("q_vec", "n_vec").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )


def random_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes; components rounded to 6 decimals so the
    exact same constants can be baked into an oracle SQL text."""
    rng = random.Random(seed)
    return [[round(rng.gauss(0.0, 1.0), 6) for _ in range(dim)] for _ in range(n_planes)]


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    dim: int,
    query_vec: str = "embedding",
    corpus_vec: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP-bucketed candidate generation + exact
    re-ranking inside buckets. Recall < 1 by design; the bucket join is the
    only shuffle and scales with bucket balance (2^n_planes buckets)."""
    planes = random_planes(dim, n_planes, seed)
    q = queries.select(
        F.col(query_id).alias("q_id"),
        F.col(query_vec).alias("q_vec"),
        V.srp_bits(query_vec, planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("n_id"),
        F.col(corpus_vec).alias("n_vec"),
        V.srp_bits(corpus_vec, planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", _sim("q_vec", "n_vec").alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "sim", "rank")
    )
