"""Empty-batch behavior pins (round 12): `tools/empty_audit.py` swept
all 375 registered queries against a 0-row corpus and found 13 crashes —
an ANSI DIVIDE_BY_ZERO ratio (content_defined_chunking — the
wasserstein_drift_exact class from the zero-cell audit), VOID-typed
literal arrays built from zero collected centroids (kmeans_assign,
semdedup_cluster_prune, similarity_topk_ivf), None-scalar arithmetic
from 1-row bounds probes (zorder_clustered_scan,
streaming_watermark_late_drop, versioned_sink_roundtrip's point-verify
key), schema-inference failures reading back empty partitioned writes
(incremental_lookback_pruned, partitioned_write_prune,
python_datasource_write_roundtrip — fixed with explicit-schema reads,
the production lake-reader pattern), empty partitioned-table reads
(partitioned_delete/merge_roundtrip), and a fragmentation self-check
(small_file_compaction).

An empty batch is a routine production event; each fixed query must
publish an empty (or NULL-metric) result instead of crashing. This file
pins all 13 forever. (wasserstein/kendall's empty cases are pinned in
test_zero_cell_audit.py.)"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402
from tools.empty_audit import build_empty_corpus  # noqa: E402

QS = ent.queries()

ZERO_ROW_QUERIES = [
    "incremental_lookback_pruned",
    "kmeans_assign",
    "partitioned_delete_roundtrip",
    "partitioned_merge_roundtrip",
    "partitioned_write_prune",
    "python_datasource_write_roundtrip",
    "semdedup_cluster_prune",
    "similarity_topk_ivf",
    "small_file_compaction",
    "streaming_watermark_late_drop",
    "versioned_sink_roundtrip",
    "zorder_clustered_scan",
]


@pytest.fixture(scope="module")
def empty_dir():
    return build_empty_corpus()


@pytest.mark.parametrize("name", ZERO_ROW_QUERIES)
def test_zero_rows_not_a_crash(spark, empty_dir, name):
    rows = QS[name](spark, empty_dir).collect()
    assert rows == []


def test_chunking_empty_corpus_null_ratios(spark, empty_dir):
    """The dedup/mean ratios are undefined over zero chunks: one row,
    explicit zero counts, NULL ratios — not DIVIDE_BY_ZERO."""
    [r] = QS["content_defined_chunking"](spark, empty_dir).collect()
    assert (r["n_docs"], r["n_chunks"], r["n_distinct_chunks"]) == (0, 0, 0)
    assert r["dedup_saving_ppm"] is None
    assert r["mean_chunk_len_milli"] is None


# --- single-row corpus (r12 second sweep): 23 more crashes found and
# fixed — 20 statistical queries whose divisors are 0 for a 1-row or
# constant group (sample-variance n-1, IQR, pooled-class de,
# normal-equation determinants, AUC 2PN, half-arm counts, bootstrap
# replicate weights, cumulative control counts) now publish NULL for the
# undefined statistic; 3 structural demos (fragmentation, watermark
# engagement, delete-the-only-partition) degrade gracefully. Full
# registry re-swept 375/375 clean (tools/empty_audit.py pattern on
# 1-row tables).

ONE_ROW_FIXED = [
    "ab_power_mde",
    "attribution_time_decay",
    "cramers_v_association",
    "exact_auc_ranksum",
    "groupwise_ols_regression",
    "higher_moment_stats",
    "kfold_metric_stability",
    "krippendorff_alpha_nominal",
    "ks_drift_exact",
    "leadlag_crosscorrelation",
    "neyman_allocation_sample",
    "phonetic_blocking_audit",
    "poisson_bootstrap_ci",
    "quantile_transform_uniform",
    "robust_scaler_groups",
    "score_decile_lift",
    "small_file_compaction",
    "streaming_watermark_late_drop",
    "target_encoding_kfold",
    "partitioned_delete_roundtrip",
    "uplift_qini_points",
    "variance_stats",
    "zscore_normalize",
]


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_one")
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            pq.write_table(
                pq.read_table(os.path.join(src, f)).slice(0, 1),
                str(dst / f),
            )
    return str(dst)


@pytest.mark.parametrize("name", ONE_ROW_FIXED)
def test_single_row_not_a_crash(spark, one_row_dir, name):
    QS[name](spark, one_row_dir).collect()  # must not raise


def test_variance_of_one_row_is_null(spark, one_row_dir):
    """The canonical n-1 case: a 1-row group's sample variance is NULL."""
    rows = QS["variance_stats"](spark, one_row_dir).collect()
    assert rows and all(r["var_samp_q"] is None for r in rows if r["n"] == 1)


def test_delete_only_partition_reads_back_typed_empty(spark, tmp_path):
    """PartitionedVersionedTable now persists its schema in the manifest
    (Delta-log style): deleting every partition leaves a readable TYPED
    empty table, and restore still rewinds to the pre-delete version."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    from domanda_etl_spark.sinks import PartitionedVersionedTable

    df = spark.range(4).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    t = PartitionedVersionedTable(str(tmp_path / "t"), "p")
    v0 = t.overwrite(df)
    t.delete_keys(spark, df.select("k", "p"), ["k"])
    out = t.read(spark)
    assert out.count() == 0
    assert set(out.columns) == {"k", "p", "v"}
    assert dict(out.dtypes)["v"] == "bigint"
    assert t.read(spark, version=v0).count() == 4
