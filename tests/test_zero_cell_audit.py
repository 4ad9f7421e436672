"""Zero-cell audit (VERDICT r10 §next#5): the Cramér's-V round-10 bug —
a groupBy-only grid silently drops structurally-empty cells and BOTH
engines share the flaw, so oracle parity is blind to it — threatens
every operator that builds a categorical grid.  One known-answer test
per audited operator, each with a structurally-empty cell in the
fixture, asserting the hand-derived value.

Audit conclusions pinned here:
- chi2_contingency: WAS vulnerable (cells came straight off groupBy);
  fixed round 11 with the same observed-types × observed-weekdays grid
  completion as cramers_v_association.
- srm_audit: NOT vulnerable — arms are conditional distinct-counts
  inside each day row, so a one-arm day still yields the other arm as 0.
- psi_drift_bins: NOT vulnerable — categories come from a groupBy over
  the UNION of both periods with conditional period sums, and add-one
  smoothing keeps the log defined when one period's count is 0.
- hellinger_drift_exact: NOT vulnerable — a (type, bin) with mass in
  only one period keeps its row (p·q = 0 contributes exactly 0 to the
  Bhattacharyya coefficient, the mathematically-correct term); a bin
  empty in BOTH periods contributes 0 whether present or not.
- krippendorff_alpha_nominal: NOT vulnerable — class counts are a fixed
  conditional-sum enumeration over the 3-class schema, so an unused
  class is an explicit 0, not a dropped row.

Round-12 extension (VERDICT r11 §next#5) — the distribution/ranking
comparators:
- wasserstein_drift_exact: per-bin zero cells NOT vulnerable — the
  histogram is ONE conditional-sum groupBy over the union of both
  distributions, so a bin with mass on only one side keeps its row with
  an explicit 0, and bins empty in BOTH sides integrate to the same
  area via the gap multiplier (the CDF is piecewise-constant between
  observed bins). But a side ENTIRELY empty WAS a hard DIVIDE_BY_ZERO
  crash under ANSI mode (the audit's find); fixed round 12 with a
  nullif guard in both engines — w1_micro NULL, zero count visible.
- kendall_tau_rankers: WAS vulnerable — a query whose two top-20s share
  <2 items has zero rank pairs and the bare groupBy silently dropped its
  row (the one ranker-pair that disagreed COMPLETELY vanished from the
  audit). Fixed round 12: left-join from the query list, emitting
  n_pairs=0 / tau_ppm NULL.
- lpa_modularity_audit: NOT vulnerable — a community with zero internal
  edges is absent from the edge⋈label⋈label rollup but survives via the
  degree-side LEFT JOIN with coalesce(m_c, 0), so its -(d_c/|E|)^2 term
  still enters Q (and every labeled vertex has degree, so the degree
  side covers all communities).
"""

from __future__ import annotations

import datetime
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402

QS = ent.queries()

UTC = datetime.timezone.utc


def _log2_micro_py(c: int) -> int:
    """Python re-derivation of the shared fixed-point log2 macro (same
    reference implementation as tests/test_log2_micro_properties.py)."""
    b = c.bit_length() - 1
    z = (c * 1048576) // (1 << b) - 1048576
    x2 = (z * z) // 1048576
    x3 = (x2 * z) // 1048576
    x4 = (x3 * z) // 1048576
    poly = z - (x2 // 2) + (x3 // 3) - (x4 // 4)
    return b * 1000000 + (poly * 1000000) // 726817


def _events(tmp_path, rows) -> str:
    """rows: list of (ts, user_id, event_type, value)."""
    t = pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_chi2_contingency_zero_cell_completed(spark, tmp_path):
    """type 'b' never occurs on Tuesday: the completed grid must still
    emit the (b, 2) cell with observed=0 and expected 4*2*1e6//12."""
    mon = datetime.datetime(2024, 1, 1, 12, tzinfo=UTC)  # isodow 1
    tue = datetime.datetime(2024, 1, 2, 12, tzinfo=UTC)  # isodow 2
    rows = [(mon, 1, "a", 1.0)] * 6 + [(tue, 1, "a", 1.0)] * 2
    rows += [(mon, 1, "b", 1.0)] * 4  # 'b' on Tuesday: EMPTY cell
    sf = _events(tmp_path, rows)
    got = {
        (r["event_type"], r["dow"]): r
        for r in (x.asDict() for x in QS["chi2_contingency"](spark, sf).collect())
    }
    assert set(got) == {("a", 1), ("a", 2), ("b", 1), ("b", 2)}
    # grand=12, row_tots a=8 b=4, col_tots mon=10 tue=2
    assert got[("a", 1)]["observed"] == 6
    assert got[("a", 1)]["expected_micro"] == 8 * 10 * 1_000_000 // 12
    assert got[("a", 2)]["observed"] == 2
    assert got[("a", 2)]["expected_micro"] == 8 * 2 * 1_000_000 // 12
    assert got[("b", 1)]["observed"] == 4
    assert got[("b", 1)]["expected_micro"] == 4 * 10 * 1_000_000 // 12
    # the structurally-empty cell: present, observed 0, expected > 0
    assert got[("b", 2)]["observed"] == 0
    assert got[("b", 2)]["expected_micro"] == 4 * 2 * 1_000_000 // 12


def test_srm_audit_one_arm_day(spark, tmp_path):
    """A day whose traffic is 100% arm A (all even user_ids) must still
    report n_b=0 and flag: chi2 = (4-0)^2*1e6//4 = 4e6 > 3841459."""
    d1 = datetime.datetime(2024, 1, 1, 9, tzinfo=UTC)
    d2 = datetime.datetime(2024, 1, 2, 9, tzinfo=UTC)
    rows = [(d1, u, "view", 1.0) for u in (2, 4, 6, 8)]  # arm B empty
    rows += [(d2, 1, "view", 1.0), (d2, 2, "view", 1.0)]  # balanced day
    sf = _events(tmp_path, rows)
    got = {
        r["day"]: r
        for r in (x.asDict() for x in QS["srm_audit"](spark, sf).collect())
    }
    assert got["2024-01-01"]["n_a"] == 4
    assert got["2024-01-01"]["n_b"] == 0
    assert got["2024-01-01"]["srm_chi2_micro"] == 4_000_000
    assert got["2024-01-01"]["flagged"] == 1
    assert got["2024-01-02"]["n_a"] == 1
    assert got["2024-01-02"]["n_b"] == 1
    assert got["2024-01-02"]["srm_chi2_micro"] == 0
    assert got["2024-01-02"]["flagged"] == 0


def test_psi_drift_one_period_category(spark, tmp_path):
    """Category 'x' has ZERO events after the 15-day cut: add-one
    smoothing must keep its PSI term finite and exactly reproducible
    with the fixed-point log2 reference."""
    a_ts = datetime.datetime(2024, 1, 2, tzinfo=UTC)  # period A
    b_ts = datetime.datetime(2024, 2, 1, tzinfo=UTC)  # period B
    min_ts = datetime.datetime(2024, 1, 1, tzinfo=UTC)  # pins the cut
    rows = [(min_ts, 1, "y", 1.0)]
    rows += [(a_ts, 1, "x", 1.0)] * 3  # x: A only (zero cell in B)
    rows += [(b_ts, 1, "y", 1.0)] * 4
    sf = _events(tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in (x.asDict() for x in QS["psi_drift_bins"](spark, sf).collect())
    }
    # na=4, nb=4, k=2 -> denominators 6
    x = got["x"]
    assert (x["c_a"], x["c_b"]) == (3, 0)
    assert x["p_a_ppm"] == (3 + 1) * 1_000_000 // 6  # 666666
    assert x["p_b_ppm"] == (0 + 1) * 1_000_000 // 6  # 166666
    exp_x = (
        (666666 - 166666)
        * (_log2_micro_py(666666) - _log2_micro_py(166666))
        // 1_000_000
    )
    assert x["psi_term_micro_bits"] == exp_x
    y = got["y"]
    assert (y["c_a"], y["c_b"]) == (1, 4)
    assert y["p_a_ppm"] == 333333 and y["p_b_ppm"] == 833333
    exp_y = (
        (333333 - 833333)
        * (_log2_micro_py(333333) - _log2_micro_py(833333))
        // 1_000_000
    )
    assert y["psi_term_micro_bits"] == exp_y
    assert exp_x > 0 and exp_y > 0  # terms are always non-negative


def test_hellinger_one_period_bin(spark, tmp_path):
    """A (type, bin) cell with mass in only one period contributes
    exactly 0 to the Bhattacharyya coefficient (p*q = 0) — and a type
    entirely absent 'after' yields BC=0, H^2=1e6, drifted."""
    before = datetime.datetime(2024, 1, 10, tzinfo=UTC)
    after = datetime.datetime(2024, 1, 20, tzinfo=UTC)
    rows = []
    # type 'a': bin0 (v<50) before-only; bin1 (50<=v<100) in both
    rows += [(before, 1, "a", 10.0), (before, 1, "a", 20.0)]
    rows += [(before, 1, "a", 60.0), (before, 1, "a", 70.0)]
    rows += [(after, 1, "a", 80.0), (after, 1, "a", 90.0)]
    # type 'b': before-only entirely
    rows += [(before, 1, "b", 10.0)] * 3
    sf = _events(tmp_path, rows)
    got = {
        r["event_type"]: r
        for r in (
            x.asDict() for x in QS["hellinger_drift_exact"](spark, sf).collect()
        )
    }
    a = got["a"]
    assert (a["n_before"], a["n_after"]) == (4, 2)
    # bin0: p=500000, q=0 -> 0; bin1: floor(sqrt(500000*1000000)) = 707106
    assert a["bc_micro"] == 707106
    assert a["hellinger_sq_micro"] == 292894
    assert bool(a["drifted"]) is True
    b = got["b"]
    assert (b["n_before"], b["n_after"]) == (3, 0)
    assert b["bc_micro"] == 0
    assert b["hellinger_sq_micro"] == 1_000_000
    assert bool(b["drifted"]) is True


def test_wasserstein_one_sided_bins(spark, tmp_path):
    """Every bin has mass on only ONE side (disjoint supports), plus an
    interior empty bin (3): the conditional-sum histogram must keep the
    one-sided rows and the gap multiplier must integrate across the
    hole. Hand derivation: bins 1,2 view-only, bin 4 purchase-only;
    na=2, nb=1; W1 = (|1*1-0*2|*1 + |2*1-0*2|*2) * 1000 // (2*1) =
    2500."""
    ts = datetime.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [(ts, 1, "view", 0.001), (ts, 1, "view", 0.002),
            (ts, 1, "purchase", 0.004)]
    [r] = QS["wasserstein_drift_exact"](spark, _events(tmp_path, rows)).collect()
    assert (r["n_view"], r["n_purchase"], r["w1_micro"]) == (2, 1, 2500)


def test_wasserstein_empty_side(spark, tmp_path):
    """One distribution ENTIRELY empty: the row still reports the zero
    count honestly and W1 is NULL (0 div 0 — undefined, not fabricated)."""
    ts = datetime.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [(ts, 1, "view", 0.001), (ts, 1, "view", 0.002)]
    [r] = QS["wasserstein_drift_exact"](spark, _events(tmp_path, rows)).collect()
    assert (r["n_view"], r["n_purchase"]) == (2, 0)
    assert r["w1_micro"] is None


def test_kendall_empty_ranking_intersection(spark, tmp_path):
    """The two rankers disagree COMPLETELY: 20 candidates at cosine 1.0
    but magnitude 0.003 (int8-quantize to the zero vector -> dot 0) vs
    20 candidates at cosine ~0.707 with magnitude 0.5 (int8 dot 8128) —
    exact top-20 is group A, int8 top-20 is group B, intersection empty,
    zero rank pairs. The query row must STILL appear: n_pairs=0 and tau
    NULL (undefined), not a silent drop."""
    vecs = [(0, [1.0, 0.0])]  # the query (vec_id < 8)
    vecs += [(10 + i, [0.003, 0.0]) for i in range(20)]  # A: cosine winners
    vecs += [(30 + i, [0.5, 0.5]) for i in range(20)]    # B: int8 winners
    t = pa.table(
        {
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array(
                [v[1] for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    [r] = QS["kendall_tau_rankers"](spark, str(tmp_path)).collect()
    assert r["q_id"] == 0
    assert (r["n_pairs"], r["concordant"], r["discordant"]) == (0, 0, 0)
    assert r["tau_ppm"] is None


def test_lpa_modularity_all_communities_empty(spark, tmp_path):
    """2-customer graph {1-2}: 3 LPA rounds leave the labels SWAPPED
    (each vertex's only neighbor carries the other label), so BOTH
    communities have zero internal edges — mc is entirely empty and Q is
    built purely from the coalesce(m_c, 0) left-join branch.
    Hand derivation: |E|=2 (directed-double), d_c=1 per community,
    q_num = 2 * (0*2 - 1) = -2, Q = -((2*10^6) // 4) = -500000."""
    t = pa.table({"c_custkey": pa.array([1, 2], pa.int64())})
    pq.write_table(t, str(tmp_path / "customer.parquet"))
    [r] = QS["lpa_modularity_audit"](spark, str(tmp_path)).collect()
    assert r["n_edges_directed"] == 2
    assert r["n_communities"] == 2
    assert r["internal_edges_directed"] == 0
    assert r["q_modularity_ppm"] == -500_000


def test_krippendorff_empty_class(spark, tmp_path):
    """Class 2 is used by NEITHER coder: its pooled count must be an
    explicit 0 and alpha must match the hand-derivation on the 2-class
    sub-table: de=32, alpha = (32-28)*1e6/32 = 125000 ppm."""
    word = lambda n: " ".join(["w"] * n)  # noqa: E731
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            # tokens: 10,10,40,40 -> b = 0,0,1,1 (never >=60 -> no class 2)
            "text": pa.array([word(10), word(10), word(40), word(40)], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["s"] * 4, pa.string()),
            # n_chars: a = 0,1,1,0 (never >=400 -> no class 2)
            "n_chars": pa.array([100, 300, 300, 100], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    [r] = QS["krippendorff_alpha_nominal"](spark, str(tmp_path)).collect()
    assert r["n_units"] == 4
    assert r["n_disagree"] == 2  # docs 2 and 4
    assert (r["n_c0"], r["n_c1"], r["n_c2"]) == (4, 4, 0)
    assert r["de_sum"] == 8 * 8 - (16 + 16 + 0)  # 32
    assert r["alpha_ppm"] == 125_000
