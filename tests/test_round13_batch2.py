"""Known-answer tests for the round-13 batch-2 additions (registry-sweep
gap fills) on tiny handcrafted corpora — the independent layer that
catches what oracle parity cannot (both engines sharing a wrong
derivation): BFS levels, Spearman with tie-averaged ranks, ACF on a
linear series, PMI lift, quantile normalization, and the quantized
embedding-dimension covariance."""

from __future__ import annotations

import datetime
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402

QS = ent.queries()

D = datetime.date


def test_bfs_levels_hand_graph(spark, tmp_path):
    """Path graph c1 -s1- c2 -s2- c3 (plus an order with no lineitem):
    BFS from c1 discovers one node per level, alternating parity."""
    orders = pa.table(
        {"o_orderkey": [10, 20, 21, 30, 99], "o_custkey": [1, 2, 2, 3, 7]}
    )
    li = pa.table(
        {"l_orderkey": [10, 20, 21, 30], "l_suppkey": [1, 1, 2, 2]}
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    got = {
        r["hops"]: (r["n_nodes"], r["n_suppliers"])
        for r in QS["bfs_reachability_levels"](spark, str(tmp_path)).collect()
    }
    # c1(2)@0 -> s1(3)@1 -> c2(4)@2 -> s2(5)@3 -> c3(6)@4; c7 unreachable
    assert got == {0: (1, 0), 1: (1, 1), 2: (1, 0), 3: (1, 1), 4: (1, 0)}


def test_spearman_monotone_and_degenerate(spark, tmp_path):
    """Segment A: spend strictly increasing with balance -> rho = 1;
    segment B: strictly decreasing -> rho = -1; segment C: single
    customer -> NULL (variance-0 guard, not NaN)."""
    cust = pa.table(
        {
            "c_custkey": [1, 2, 3, 4, 5, 6, 7, 8],
            "c_mktsegment": ["A", "A", "A", "A", "B", "B", "B", "C"],
            "c_acctbal": [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 9.0],
        }
    )
    orders = pa.table(
        {
            "o_custkey": [1, 2, 3, 4, 5, 6, 7, 8],
            "o_totalprice": [10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0, 5.0],
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = {
        r["c_mktsegment"]: (r["n"], r["spearman_rho"])
        for r in QS["spearman_by_segment"](spark, str(tmp_path)).collect()
    }
    assert got == {"A": (4, 1.0), "B": (3, -1.0), "C": (1, None)}


def test_spearman_tie_averaged_ranks(spark, tmp_path):
    """Two customers tied on balance: 2*avg_rank = 2*rank + ties - 1
    must give both the value 2*1.5 = 3 (rank 1, 2 ties). With spends
    10 < 20 < 30 and balances (1, 1, 2): rx = (3, 3, 5)/2, ry =
    (1, 2, 3). Hand Pearson on 2r: rho = 3/(2*sqrt(3)) = 0.866025."""
    cust = pa.table(
        {
            "c_custkey": [1, 2, 3],
            "c_mktsegment": ["T", "T", "T"],
            "c_acctbal": [1.0, 1.0, 2.0],
        }
    )
    orders = pa.table(
        {"o_custkey": [1, 2, 3], "o_totalprice": [10.0, 20.0, 30.0]}
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    [r] = QS["spearman_by_segment"](spark, str(tmp_path)).collect()
    assert r["n"] == 3
    assert abs(r["spearman_rho"] - 0.866025) < 1e-6


def test_acf_linear_series(spark, tmp_path):
    """Daily revenue 1,2,3,4,5: every lagged slice of a linear series is
    perfectly correlated -> acf = 1.0 at lags 1-3; lag 4 has one pair
    (zero variance) -> NULL; lags 5-7 have no pairs -> no rows."""
    orders = pa.table(
        {
            "o_orderdate": [D(2020, 1, i) for i in range(1, 6)],
            "o_totalprice": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = {
        r["lag"]: (r["n"], r["acf"])
        for r in QS["acf_daily_revenue"](spark, str(tmp_path)).collect()
    }
    assert got == {1: (4, 1.0), 2: (3, 1.0), 3: (2, 1.0), 4: (1, None)}


def test_pmi_lift_hand_counts(spark, tmp_path):
    """10 docs; 'alpha beta' co-occur in 6, alpha df=8, beta df=7:
    lift_ppm = 1e6*10*6 // (8*7) = 1071428. The gamma/delta pair
    co-occurs once only -> filtered by c_xy >= 3. Duplicate tokens in
    one doc count once (doc-grain distinct)."""
    texts = (
        ["alpha beta alpha"] * 6
        + ["alpha only here"] * 2
        + ["beta solo"]
        + ["gamma delta"]
    )
    docs = pa.table({"doc_id": list(range(10)), "text": texts})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    rows = QS["pmi_vocab_pairs"](spark, str(tmp_path)).collect()
    assert [
        (r["tok_x"], r["tok_y"], r["c_xy"], r["c_x"], r["c_y"], r["lift_ppm"])
        for r in rows
    ] == [("alpha", "beta", 6, 8, 7, 1071428)]


def test_quantile_normalize_hand_ranks(spark, tmp_path):
    """Sources A[100,300], B[200,400], C[500]: rank-1 mean over three
    sources = 800/3 -> 266666 milli; rank-2 mean over the two sources
    that reach rank 2 = 350000 milli."""
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "source": ["A", "A", "B", "B", "C"],
            "n_chars": [100, 300, 200, 400, 500],
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["rnk"], r["qn_milli"])
        for r in QS["quantile_normalize_lengths"](spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (1, 266666),
        2: (2, 350000),
        3: (1, 266666),
        4: (2, 350000),
        5: (1, 266666),
    }


def test_embedding_covariance_hand_vectors(spark, tmp_path):
    """Two 3-dim vectors on the exact float grid (q = x*1000):
    q1 = [500, 1000, 2000], q2 = [1000, 3000, -1000]. Population
    covariance by hand for each pair of dimensions."""
    emb = pa.table(
        {
            "vec_id": [1, 2],
            "embedding": pa.array(
                [[0.5, 1.0, 2.0], [1.0, 3.0, -1.0]],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    got = {
        (r["i"], r["j"]): (r["n"], r["sxy"], r["sx"], r["sy"], r["cov_q"])
        for r in QS["embedding_dim_covariance"](spark, str(tmp_path)).collect()
    }
    assert got == {
        (1, 2): (2, 3500000, 1500, 4000, 250000.0),
        (1, 3): (2, 0, 1500, 1000, -375000.0),
        (2, 3): (2, -1000000, 4000, 1000, -1500000.0),
    }
