"""Property pins for the shared fixed-point log2 macro (_log2_micro) —
the integer-exact transform every information-theoretic query (entropy,
surprisal, Zipf slope, PSI) rides.  Three claims, none previously
test-pinned:

1. TRANSCRIPTION: the DuckDB SQL text computes exactly the same BIGINT
   as an independent Python re-derivation, across the documented input
   domain 1..2^43-1 (the Spark twin is covered by every oracle-parity
   query that embeds both texts).  Writing this test found the domain's
   true upper bound: c = 2^43 stages 2^63 and overflows BIGINT — the
   macro docstring used to claim 2^43 inclusive.
2. MONOTONICITY: non-decreasing in c — the property ordering-dependent
   consumers (ranking by entropy, Zipf slope fit) actually rely on.
   The 4-term series is monotone because d/dz(z - z^2/2 + z^3/3 - z^4/4)
   = (1-z)(1+z^2) >= 0 on [0,1].
3. BOUNDED ERROR: |fixed/1e6 - log2(c)| <= 0.17 bits everywhere (the
   alternating series truncated at 4 terms loses at most ~0.159 bits as
   the mantissa approaches 2) — documents the approximation quality the
   cross-engine determinism is bought with.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import _log2_micro  # noqa: E402


def _log2_micro_py(c: int) -> int:
    b = c.bit_length() - 1
    z = (c * 1048576) // (1 << b) - 1048576
    x2 = (z * z) // 1048576
    x3 = (x2 * z) // 1048576
    x4 = (x3 * z) // 1048576
    poly = z - (x2 // 2) + (x3 // 3) - (x4 // 4)
    return b * 1000000 + (poly * 1000000) // 726817


def _duck_eval(cs: list[int]) -> list[int]:
    con = duckdb.connect()
    try:
        expr = _log2_micro("c", "duckdb")
        # stage as BIGINT: the macro's contract is a BIGINT column (every
        # production caller stages one); raw unnest() yields INT32 here
        rows = con.execute(
            f"SELECT CAST({expr} AS BIGINT) FROM "
            "(SELECT CAST(unnest(?) AS BIGINT) AS c)",
            [[int(c) for c in cs]],
        ).fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=1, max_value=2**43 - 1), min_size=1, max_size=50
    )
)
def test_duckdb_text_matches_python_rederivation(cs):
    assert _duck_eval(cs) == [_log2_micro_py(c) for c in cs]


def test_domain_boundary_exact():
    # 2^43 - 1 is the largest legal input; 2^43 overflows the mantissa
    # staging in both engines by construction (2^43 * 2^20 = 2^63)
    top = 2**43 - 1
    assert _duck_eval([top]) == [_log2_micro_py(top)]


def test_monotone_including_every_power_of_two_boundary():
    # exhaustive near the band boundaries (where the mantissa resets) plus
    # a dense low range; monotonicity failures would cluster exactly there
    pts = set(range(1, 4100))
    for k in range(2, 43):
        pts.update({2**k - 2, 2**k - 1, 2**k, 2**k + 1, 2**k + 2})
    pts = sorted(pts)
    vals = [_log2_micro_py(c) for c in pts]
    for (c1, v1), (c2, v2) in zip(zip(pts, vals), zip(pts[1:], vals[1:])):
        assert v1 <= v2, f"non-monotone: f({c1})={v1} > f({c2})={v2}"


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=1, max_value=2**43 - 1))
def test_error_bounded_in_bits(c):
    got = _log2_micro_py(c) / 1e6
    assert abs(got - math.log2(c)) <= 0.17
