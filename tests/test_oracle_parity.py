"""Differential test: every registered query vs its DuckDB oracle at the
driver's correctness scale (sf0.01) — the local mirror of
CORRECTNESS_r{N}.json."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import ORACLE_SF_DIR
from tests.oracle_utils import compare, duckdb_run

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_vs_oracle(spark, name):
    sdf = QUERIES[name](spark, ORACLE_SF_DIR)
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert sdf.count() >= 0
        return
    oracle = duckdb_run(ORACLES[name], ORACLE_SF_DIR)
    ok, msg = compare(sdf, oracle)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
