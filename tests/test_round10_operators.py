"""Known-answer tests for the six round-10 operators on tiny handcrafted
tables.  Oracle parity (tests/test_oracle_parity.py) proves Spark and
DuckDB AGREE; these pin the agreed-on values to independently
hand-derived answers, guarding against both engines sharing a wrong
derivation (the failure mode parity cannot see)."""

from __future__ import annotations

import datetime
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402

QS = ent.queries()


def _write(tmp_path, name: str, table: pa.Table) -> str:
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def test_wilson_lower_bound_known_values(spark, tmp_path):
    """480/500 must OUTRANK 5/5 under the Wilson lower bound (the
    small-sample inversion the operator exists to fix), with both bounds
    matching the hand-computed z=2 formula exactly."""
    rows = [(1, 1, "N")] * 5  # part 1: 5/5
    rows += [(2, 2, "N")] * 480 + [(2, 2, "R")] * 20  # part 2: 480/500
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    sf = _write(tmp_path, "lineitem", t)
    got = {
        r["l_partkey"]: r
        for r in (
            row.asDict() for row in QS["wilson_lower_bound_ranking"](spark, sf).collect()
        )
    }
    # part 1: ((5+2)*5e6 - 2e6*sqrt(25)) div 45 = 25e6 div 45
    assert got[1]["naive_rate_ppm"] == 1_000_000
    assert got[1]["wilson_lb_ppm"] == 555_555
    # part 2: radicand 480*20*500 + 500^2 = 5_050_000, floor sqrt = 2247;
    # (482*500e6 - 2e6*2247) div (500*504) = 236_506_000_000 div 252_000
    assert got[2]["naive_rate_ppm"] == 960_000
    assert got[2]["wilson_lb_ppm"] == 938_515
    assert got[2]["wilson_lb_ppm"] > got[1]["wilson_lb_ppm"]


def test_chao1_known_values(spark, tmp_path):
    """counts a=3,b=c=d=e=1 -> D=5, f1=4, f2=0, N=7:
    chao1 = 5 + 4*3 div 2 = 11; unseen = 4e6 div 7 = 571428."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a b c d", "a e"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["s", "s"], pa.string()),
            "n_chars": pa.array([9, 3], pa.int64()),
        }
    )
    sf = _write(tmp_path, "documents", t)
    [r] = QS["chao1_unseen_vocab"](spark, sf).collect()
    assert r["n_tokens"] == 7
    assert r["vocab_observed"] == 5
    assert r["f1_singletons"] == 4
    assert r["f2_doubletons"] == 0
    assert r["chao1_richness"] == 11
    assert r["unseen_mass_ppm"] == 571_428


def _log2_micro_py(c: int) -> int:
    """Python re-derivation of the shared fixed-point log2 macro — an
    independent implementation path for pinning the SQL transcription."""
    b = c.bit_length() - 1
    z = (c * 1048576) // (1 << b) - 1048576
    x2 = (z * z) // 1048576
    x3 = (x2 * z) // 1048576
    x4 = (x3 * z) // 1048576
    poly = z - (x2 // 2) + (x3 // 3) - (x4 // 4)
    return b * 1000000 + (poly * 1000000) // 726817


def test_psi_known_values(spark, tmp_path):
    """Two types swap 300/100 <-> 100/300 between periods (big positive
    terms, exactly the fixed-point formula); a third type with equal
    counts contributes exactly 0."""
    day0 = datetime.datetime(2024, 1, 1)
    day20 = datetime.datetime(2024, 1, 21)
    rows = (
        [("x", day0)] * 300
        + [("y", day0)] * 100
        + [("z", day0)] * 50
        + [("x", day20)] * 100
        + [("y", day20)] * 300
        + [("z", day20)] * 50
    )
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    sf = _write(tmp_path, "events", t)
    got = {
        r["event_type"]: r
        for r in (row.asDict() for row in QS["psi_drift_bins"](spark, sf).collect())
    }
    na, nb, k = 450, 450, 3
    for ty, ca, cb in [("x", 300, 100), ("y", 100, 300), ("z", 50, 50)]:
        pa_ppm = max(1, (ca + 1) * 1_000_000 // (na + k))
        pb_ppm = max(1, (cb + 1) * 1_000_000 // (nb + k))
        want = (
            (pa_ppm - pb_ppm)
            * (_log2_micro_py(pa_ppm) - _log2_micro_py(pb_ppm))
        ) // 1_000_000
        assert got[ty]["c_a"] == ca and got[ty]["c_b"] == cb
        assert got[ty]["p_a_ppm"] == pa_ppm and got[ty]["p_b_ppm"] == pb_ppm
        assert got[ty]["psi_term_micro_bits"] == want
    assert got["z"]["psi_term_micro_bits"] == 0
    assert got["x"]["psi_term_micro_bits"] > 0
    assert got["y"]["psi_term_micro_bits"] > 0


def test_ipw_ate_known_values(spark, tmp_path):
    """5 strata of one control (20k 'view' events @ 1.0) + one treated
    (14 purchases + 20k-13 views @ 1.0): p = 1/2 exactly (no clipping),
    weights double each side, ATE = y_t - y_c = -13e6 micro in EVERY
    stratum — fully hand-derivable."""
    rows = []
    for k in range(1, 6):
        control, treated = 2 * k - 1, 2 * k
        rows += [(control, "view", 1.0)] * (20 * k)
        rows += [(treated, "purchase", 0.0)] * 14
        rows += [(treated, "view", 1.0)] * (20 * k - 13)
    day = datetime.datetime(2024, 1, 1)
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([day] * len(rows), pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    sf = _write(tmp_path, "events", t)
    out = sorted(
        (r.asDict() for r in QS["ipw_ate_estimate"](spark, sf).collect()),
        key=lambda r: r["stratum"],
    )
    assert len(out) == 5
    for r in out:
        assert r["n_users"] == 2
        assert r["n_treated"] == 1
        assert r["p_ppm"] == 500_000
        assert r["ate_micro"] == -13_000_000


def test_lpa_communities_respect_blocks(spark, tmp_path):
    """Edges never cross 20-id blocks, so no converged community may
    span blocks; every edged vertex (1..39 of 1..40 — vertex 40 is
    isolated) lands in exactly one community."""
    t = pa.table(
        {
            "c_custkey": pa.array(range(1, 41), pa.int64()),
            "c_name": pa.array([f"c{i}" for i in range(1, 41)], pa.string()),
            "c_nationkey": pa.array([0] * 40, pa.int32()),
            "c_acctbal": pa.array([0.0] * 40, pa.float64()),
            "c_mktsegment": pa.array(["A"] * 40, pa.string()),
        }
    )
    sf = _write(tmp_path, "customer", t)
    rows = [r.asDict() for r in QS["label_propagation_communities"](spark, sf).collect()]
    assert sum(r["n_members"] for r in rows) == 39
    for r in rows:
        assert r["min_v"] // 20 == r["max_v"] // 20, f"community spans blocks: {r}"
    assert max(r["n_members"] for r in rows) >= 2


def test_ra_linkpred_known_graph(spark, tmp_path):
    """Baskets (1,2,3) and (1,2,4): the only non-edge wedge pair is
    (3,4) via z in {1,2}, both degree 3 -> RA = 2 * (1e6 div 3)."""
    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 4)]
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    sf = _write(tmp_path, "lineitem", t)
    out = [r.asDict() for r in QS["resource_allocation_linkpred"](spark, sf).collect()]
    assert out == [
        {"x": 3, "y": 4, "n_common": 2, "ra_score_micro": 666_666}
    ]
