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


# ---- batch 2 (nine more round-10 operators) -------------------------------


def test_lsh_s_curve_known_values(spark, tmp_path):
    """Hand-computed p(s=0.5) for all three 16-hash configs (integer
    exponent-by-squaring, floor at each step)."""
    rows = {
        (r["bands"], r["rows_per_band"], r["s_ppm"]): r["p_detect_ppm"]
        for r in (
            row.asDict() for row in QS["lsh_s_curve_audit"](spark, str(tmp_path)).collect()
        )
    }
    assert rows[(8, 2, 500000)] == 899_888
    assert rows[(16, 1, 500000)] == 999_985
    assert rows[(4, 4, 500000)] == 227_525
    assert len(rows) == 57
    # more rows per band => sharper curve: below threshold (s=0.2) the
    # (4,4) config admits far fewer candidates than (16,1)
    assert rows[(4, 4, 200000)] < rows[(8, 2, 200000)] < rows[(16, 1, 200000)]


def _events_table(rows):
    import datetime

    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def test_srm_audit_known_values(spark, tmp_path):
    """day1: 2v1 arms -> chi2 = 1e6/3; day3: 8v0 -> 8e6, flagged."""
    import datetime

    d1, d3 = datetime.datetime(2024, 1, 1), datetime.datetime(2024, 1, 3)
    rows = [(d1, u, "view", 1.0) for u in (2, 4, 1)]
    rows += [(d3, u, "view", 1.0) for u in (2, 4, 6, 8, 10, 12, 14, 16)]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = {r["day"]: r.asDict() for r in QS["srm_audit"](spark, sf).collect()}
    assert got["2024-01-01"]["srm_chi2_micro"] == 333_333
    assert got["2024-01-01"]["flagged"] == 0
    assert got["2024-01-03"]["n_a"] == 8 and got["2024-01-03"]["n_b"] == 0
    assert got["2024-01-03"]["srm_chi2_micro"] == 8_000_000
    assert got["2024-01-03"]["flagged"] == 1


def test_fano_factor_known_values(spark, tmp_path):
    """constant hourly counts -> F=0; counts [1,7] -> F=2.25."""
    import datetime

    rows = []
    for h in range(4):  # type 'flat': 2 events in each of 4 hours
        ts = datetime.datetime(2024, 1, 1, h)
        rows += [(ts, 1, "flat", 1.0)] * 2
    rows += [(datetime.datetime(2024, 1, 1, 0), 1, "bursty", 1.0)] * 1
    rows += [(datetime.datetime(2024, 1, 1, 1), 1, "bursty", 1.0)] * 7
    sf = _write(tmp_path, "events", _events_table(rows))
    got = {
        r["event_type"]: r.asDict()
        for r in QS["fano_factor_dispersion"](spark, sf).collect()
    }
    assert got["flat"]["fano_micro"] == 0
    assert got["flat"]["verdict"] == "underdispersed"
    # H=2, sum=8, sum_sq=50: (2*50-64)*1e6 // (2*8) = 2_250_000
    assert got["bursty"]["fano_micro"] == 2_250_000
    assert got["bursty"]["verdict"] == "overdispersed"


def test_regression_discontinuity_exact_linear(spark, tmp_path):
    """Perfectly linear sides: left y = 10e6 + 2e6*x, right y = 50e6 +
    1e6*x -> intercepts recovered exactly, jump = 40e6."""
    import datetime

    day = datetime.datetime(2024, 1, 1)
    rows = []
    uid = 0
    for x, slope, icept in [(-3, 2, 10), (-2, 2, 10), (-1, 2, 10),
                            (0, 1, 50), (1, 1, 50), (2, 1, 50)]:
        uid += 1
        y = icept + slope * x  # whole currency units -> micro exact
        rows += [(day, uid, "purchase", float(y))]
        rows += [(day, uid, "view", 0.0)] * (60 + x - 1)  # total = 60 + x
    sf = _write(tmp_path, "events", _events_table(rows))
    [r] = QS["regression_discontinuity"](spark, sf).collect()
    assert r["n_left"] == 3 and r["n_right"] == 3
    assert r["intercept_left_micro"] == 10_000_000.0
    assert r["intercept_right_micro"] == 50_000_000.0
    assert r["rd_jump_micro"] == 40_000_000.0
    assert r["slope_left"] == 2_000_000.0 and r["slope_right"] == 1_000_000.0


def test_ab_power_mde_known_values(spark, tmp_path):
    """4 users: all 'view' (p=1 -> MDE 0); 2 of 4 'click' (p=0.5,
    n_arm=2 -> inner=2*5e5*5e5/2, sqrt=500000, *14 div 5 = 1.4e6)."""
    import datetime

    day = datetime.datetime(2024, 1, 1)
    rows = [(day, u, "view", 1.0) for u in (1, 2, 3, 4)]
    rows += [(day, u, "click", 1.0) for u in (1, 2)]
    sf = _write(tmp_path, "events", _events_table(rows))
    got = {
        r["event_type"]: r.asDict() for r in QS["ab_power_mde"](spark, sf).collect()
    }
    assert got["view"]["p_ppm"] == 1_000_000
    assert got["view"]["mde_abs_ppm"] == 0
    assert got["click"]["p_ppm"] == 500_000
    assert got["click"]["n_per_arm"] == 2
    assert got["click"]["mde_abs_ppm"] == 1_400_000


def test_survivorship_conflict_known_values(spark, tmp_path):
    """Two token-set-identical docs disagreeing on lang + one singleton:
    1 multi group, 1 lang conflict, conflict_ppm = 1e6."""
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["alpha beta gamma", "beta  gamma alpha", "something else"],
                pa.string(),
            ),
            "lang": pa.array(["en", "de", "en"], pa.string()),
            "source": pa.array(["s1", "s1", "s2"], pa.string()),
            "n_chars": pa.array([16, 17, 14], pa.int64()),
        }
    )
    sf = _write(tmp_path, "documents", t)
    [r] = QS["survivorship_conflict_audit"](spark, sf).collect()
    assert r["n_groups"] == 2
    assert r["n_multi_groups"] == 1
    assert r["n_docs_dropped"] == 1
    assert r["lang_conflict_groups"] == 1
    assert r["source_conflict_groups"] == 0
    assert r["nchars_conflict_groups"] == 1  # 16 vs 17 chars
    assert r["conflict_ppm"] == 1_000_000


def _embeddings_table(vecs, labels):
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )


def test_information_gain_perfect_and_null_dims(spark, tmp_path):
    """dim 1 sign == label -> IG = 1 bit exactly; a constant dim -> 0."""
    vecs = []
    for lbl in (0, 0, 1, 1):
        v = [0.5] * 64  # constant positive dims: IG 0
        v[0] = 1.0 if lbl == 1 else -1.0  # dim 1 separates perfectly
        vecs.append(v)
    sf = _write(tmp_path, "embeddings", _embeddings_table(vecs, [0, 0, 1, 1]))
    rows = {r["dim"]: r["ig_micro_bits"] for r in QS["information_gain_features"](spark, sf).collect()}
    assert rows[1] == 1_000_000  # exactly one bit (powers of two are exact)
    assert all(v == 0 for d, v in rows.items() if d != 1)


def test_centroid_silhouette_perfect_clusters(spark, tmp_path):
    """Points identical to their centroid: a=0 -> s = 1 for every point."""
    v0, v1 = [0.0] * 64, [0.0] * 64
    v1[0] = 1.0
    sf = _write(
        tmp_path, "embeddings", _embeddings_table([v0, v0, v1, v1], [0, 0, 1, 1])
    )
    got = {
        r["label"]: r.asDict()
        for r in QS["centroid_silhouette_audit"](spark, sf).collect()
    }
    for lbl in (0, 1):
        assert got[lbl]["n_points"] == 2
        assert got[lbl]["mean_silhouette_micro"] == 1_000_000
        assert got[lbl]["n_negative"] == 0


def test_cramers_v_perfect_association(spark, tmp_path):
    """Each activity quartile does exactly one event type -> V = 1
    (floored ppm within 1 of 1e6)."""
    import datetime

    day = datetime.datetime(2024, 1, 1)
    rows = []
    uid = 0
    # 4 users with strictly increasing activity -> ntile(4) puts each in
    # its own bucket; each does a distinct event type
    for k, ty in enumerate(["a", "b", "c", "d"]):
        uid += 1
        rows += [(day, uid, ty, 1.0)] * (10 + k)
    sf = _write(tmp_path, "events", _events_table(rows))
    [r] = QS["cramers_v_association"](spark, sf).collect()
    assert r["n_rows"] == 4 and r["n_cols"] == 4
    assert r["cramers_v_ppm"] >= 999_000  # 1.0 minus integer flooring
