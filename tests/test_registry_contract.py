"""Registry/window contract guards (VERDICT r9 ask #6).

The import-time raise in q() covers duplicate REGISTRATION; these cover
the _FIRST50 driver-window list itself, so a window typo becomes a test
failure instead of a silently shorter CORRECTNESS file.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402


def test_first50_names_all_registered():
    missing = [n for n in ent._FIRST50 if n not in ent._REGISTRY]
    assert not missing, f"_FIRST50 references unregistered queries: {missing}"


def test_first50_no_duplicates_and_within_window():
    assert len(ent._FIRST50) <= 50, "driver window is 50 entries"
    dupes = {n for n in ent._FIRST50 if ent._FIRST50.count(n) > 1}
    assert not dupes, f"duplicate window entries: {dupes}"


def test_flagship_leads_every_window():
    # the standing regression guard over the whole ETL surface
    assert ent._FIRST50[0] == "domanda_pipeline_full"


def test_queries_order_is_window_then_rest_covering_registry():
    names = list(ent.queries())
    assert names[: len(ent._FIRST50)] == ent._FIRST50
    assert len(names) == len(set(names)) == len(ent._REGISTRY)


def test_every_query_has_oracle_or_is_known_rows_only():
    # all current queries carry a DuckDB oracle; a new rows-only query must
    # be added to the allowlist here CONSCIOUSLY, not by omission
    rows_only_allowlist: set[str] = set()
    missing = [
        n
        for n, (_, sql) in ent._REGISTRY.items()
        if sql is None and n not in rows_only_allowlist
    ]
    assert not missing, f"queries without oracle SQL: {missing}"
