"""Known-answer tests for the round-12 additions: Kaplan-Meier
product-limit survival (the first NEGATIVE-exponent composition of
_log2_micro/_exp2_micro) and Adamic-Adar link prediction (the 1/log-deg
weight made integer-exact). Expected values are derived with Python
mirrors of the shared fixed-point macros, same reference style as
tests/test_zero_cell_audit.py."""

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
    b = c.bit_length() - 1
    z = (c * 1048576) // (1 << b) - 1048576
    x2 = (z * z) // 1048576
    x3 = (x2 * z) // 1048576
    x4 = (x3 * z) // 1048576
    poly = z - (x2 // 2) + (x3 // 3) - (x4 // 4)
    return b * 1000000 + (poly * 1000000) // 726817


def _exp2_micro_py(p: int, f20: int) -> int:
    """Python mirror of the _exp2_micro SQL macro: fold the 20 fraction
    bits over the hardcoded round(2^(2^-i)*1e6) constants."""
    acc = 1000000
    for i in range(1, 21):
        c = round(2 ** (2 ** -i) * 1_000_000)
        bit = (f20 // (1 << (20 - i))) % 2
        acc = acc * (c if bit == 1 else 1000000) // 1000000
    return acc * (1 << min(40, p))


def _km_s_ppm(steps: list[tuple[int, int]]) -> int:
    """Expected survival ppm after (n_risk, d) product-limit steps."""
    m = -sum(
        _log2_micro_py(n - d) - _log2_micro_py(n) for n, d in steps
    )
    return 1000000000000 // _exp2_micro_py(m // 1000000,
                                           ((m % 1000000) * 1048576) // 1000000)


def _orders(tmp_path, rows):
    """rows: list of (custkey, orderdate)."""
    t = pa.table(
        {
            "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_orderdate": pa.array([r[1] for r in rows], pa.date32()),
        }
    )
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    return str(tmp_path)


D = datetime.date


def test_km_hand_lifetable(spark, tmp_path):
    """4 customers: deaths at buckets 0/2/4, one long censored customer
    pinning the study end. Risk sets 4/3/2 by hand; S steps 3/4, 2/3,
    1/2 through the fixed-point mirrors."""
    rows = [
        (1, D(2020, 1, 1)),                      # A: dur 0, churned
        (2, D(2020, 1, 1)), (2, D(2020, 3, 1)),  # B: 60d -> t=2, churned
        (3, D(2020, 1, 1)), (3, D(2020, 5, 1)),  # C: 121d -> t=4, churned
        (4, D(2020, 1, 1)), (4, D(2024, 12, 31)),  # D: censored, t=60
    ]
    got = {
        r["t_months"]: r
        for r in QS["kaplan_meier_survival"](spark, _orders(tmp_path, rows)).collect()
    }
    assert set(got) == {0, 2, 4}  # censored-only bucket 60 has no row
    assert (got[0]["n_risk"], got[0]["n_deaths"], got[0]["n_censored"]) == (4, 1, 0)
    assert (got[2]["n_risk"], got[2]["n_deaths"]) == (3, 1)
    assert (got[4]["n_risk"], got[4]["n_deaths"]) == (2, 1)
    assert got[0]["survival_ppm"] == _km_s_ppm([(4, 1)])
    assert got[2]["survival_ppm"] == _km_s_ppm([(4, 1), (3, 1)])
    assert got[4]["survival_ppm"] == _km_s_ppm([(4, 1), (3, 1), (2, 1)])
    # the log terms TELESCOPE (lg3-lg4 + lg2-lg3 + lg1-lg2 = -lg4 =
    # exactly -2e6 micro-bits), so the fixed-point 1/4 is exact here
    assert got[4]["survival_ppm"] == 250_000


def test_km_risk_set_extinction(spark, tmp_path):
    """A churned customer whose lifetime exceeds every censored one:
    the last death extinguishes the risk set (n=d) and S collapses to
    exactly 0 — no log-of-zero, no division error."""
    rows = [
        (1, D(2016, 1, 1)),                      # t=0, churned
        (2, D(2024, 1, 1)), (2, D(2024, 12, 31)),  # t=12, censored (end)
        (3, D(2015, 1, 1)), (3, D(2020, 1, 1)),  # t=60, churned, n=d=1
    ]
    got = {
        r["t_months"]: r
        for r in QS["kaplan_meier_survival"](spark, _orders(tmp_path, rows)).collect()
    }
    assert set(got) == {0, 60}
    assert (got[0]["n_risk"], got[0]["n_deaths"]) == (3, 1)
    assert got[0]["survival_ppm"] == _km_s_ppm([(3, 1)])
    assert (got[60]["n_risk"], got[60]["n_deaths"]) == (1, 1)
    assert got[60]["survival_ppm"] == 0


def test_isotonic_pav_pools_violators(spark, tmp_path):
    """Raw band rates [1/2, 0, 1] violate monotonicity: the minimax
    closed form must pool the first two bands to 1/4 and leave the last
    at 1 — the textbook PAV answer."""
    ts = datetime.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        (ts, 1, "purchase", 1.0), (ts, 1, "view", 2.0),   # band 0: 1/2
        (ts, 1, "view", 6.0), (ts, 1, "view", 7.0),       # band 1: 0
        (ts, 1, "purchase", 11.0), (ts, 1, "purchase", 12.0),  # band 2: 1
    ]
    t = pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {
        r["bucket"]: r
        for r in QS["isotonic_calibration_pav"](spark, str(tmp_path)).collect()
    }
    assert set(got) == {0, 1, 2}
    assert [got[b]["raw_rate_ppm"] for b in (0, 1, 2)] == [500000, 0, 1000000]
    assert [got[b]["iso_rate_ppm"] for b in (0, 1, 2)] == [250000, 250000, 1000000]


def test_isotonic_pav_fit_is_monotone(spark):
    """On real data the fitted curve must be non-decreasing in the score
    band — the defining isotonic property."""
    rows = sorted(
        QS["isotonic_calibration_pav"](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["bucket"],
    )
    iso = [r["iso_rate_ppm"] for r in rows]
    assert all(a <= b for a, b in zip(iso, iso[1:]))
    # and it stays between the band-rate extremes
    raw = [r["raw_rate_ppm"] for r in rows]
    assert min(raw) <= iso[0] and iso[-1] <= max(raw)


def test_adamic_adar_hand_graph(spark, tmp_path):
    """5-item basket graph with edges {12,23,34,25,35}: the four
    non-edges reachable through one common neighbor of degree 3 each
    score exactly 1e12 // lg2_micro(3); existing edges are anti-joined
    away."""
    baskets = [(1, [1, 2]), (2, [2, 3]), (3, [3, 4]), (4, [2, 5]), (5, [3, 5])]
    ok, pk = [], []
    for o, parts in baskets:
        for p in parts:
            ok.append(o)
            pk.append(p)
    t = pa.table(
        {
            "l_orderkey": pa.array(ok, pa.int64()),
            "l_partkey": pa.array(pk, pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    rows = QS["adamic_adar_linkpred"](spark, str(tmp_path)).collect()
    w3 = 1000000000000 // _log2_micro_py(3)
    got = {(r["x"], r["y"]): (r["n_common"], r["aa_score_micro"]) for r in rows}
    assert got == {
        (1, 3): (1, w3),   # via z=2 (deg 3)
        (1, 5): (1, w3),   # via z=2
        (2, 4): (1, w3),   # via z=3 (deg 3)
        (4, 5): (1, w3),   # via z=3
    }
