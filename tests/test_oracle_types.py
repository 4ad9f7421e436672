"""Oracle output-type gate (round 7): no oracle SQL may produce a column
whose DuckDB logical type cannot round-trip through pandas to the dtype
the Spark side produces.

Root cause being gated (VERDICT r6 §wrong#1): DuckDB types integer
``sum()`` / ``//`` products as HUGEINT (int128); ``.df()`` materializes
HUGEINT as float64 while Spark returns bigint, so the driver's hasher
sees ``93000.0`` vs ``93000`` and fails the query even when every value
is exact.  ``oracle_sql()`` normalizes known offenders via
``_ORACLE_BIGINT_CASTS``; this test proves the normalized registry is
clean, so a NEW oracle with an uncast integer aggregate fails here
before it ever rotates into a driver window.

DuckDB-only (no SparkSession) — runs in seconds at sf0.001.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types that pandas cannot materialize as the dtype Spark produces.
FORBIDDEN = {"HUGEINT", "UHUGEINT", "UBIGINT"}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_no_hugeint_oracle_outputs(con):
    offenders = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        bad = [
            (c, str(t))
            for c, t in zip(rel.columns, rel.types)
            if str(t) in FORBIDDEN or str(t).startswith("DECIMAL")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emit pandas-unrepresentable integer types (add them to "
        f"_ORACLE_BIGINT_CASTS or cast in the SQL): {offenders}"
    )


def test_bigint_cast_map_is_live(con):
    """Every _ORACLE_BIGINT_CASTS entry must name a registered oracle and
    real output columns — a stale entry means the oracle changed without
    regenerating the map (tools/scan_oracle_types.py --emit-dict)."""
    oracles = entrymod.oracle_sql()
    for name, cols in entrymod._ORACLE_BIGINT_CASTS.items():
        assert name in oracles, f"stale cast entry: {name} not registered"
        out_cols = set(con.sql(oracles[name]).columns)
        missing = [c for c in cols if c not in out_cols]
        assert not missing, f"{name}: cast map names absent columns {missing}"
