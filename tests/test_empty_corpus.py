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
