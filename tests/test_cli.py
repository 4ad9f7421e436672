"""CLI surface (S10 standalone harness, SURVEY.md §3.3): every subcommand
driven in-process against real parquet, with the JSON lines it prints
parsed back."""

from __future__ import annotations

import json

from domanda_etl_spark.cli import main
from domanda_etl_spark.sinks import PartitionedVersionedTable, VersionedTable


def _run(capsys, *argv: str) -> list[dict]:
    assert main(list(argv), stop_session=False) == 0
    out = capsys.readouterr().out.strip().splitlines()
    lines = []
    for ln in out:
        try:
            lines.append(json.loads(ln))
        except json.JSONDecodeError:
            pass
    return lines


def test_cli_load_merge_history_restore(spark, tmp_path, capsys):
    src1 = str(tmp_path / "src1")
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id INT, g STRING, v DOUBLE"
    ).write.parquet(src1)
    spark.createDataFrame(
        [(2, "b", 99.0), (3, "c", 30.0)], "id INT, g STRING, v DOUBLE"
    ).write.parquet(src2)
    table = str(tmp_path / "t")

    (load,) = _run(capsys, "load", src1, table)
    assert load == {"op": "load", "rows": 2, "version": 0}

    (merge,) = _run(capsys, "merge", src2, table, "--keys", "id")
    assert merge["version"] == 1
    got = {r["id"]: r["v"] for r in VersionedTable(table).read(spark).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0}

    (hist,) = _run(capsys, "history", table)
    assert [e["id"] for e in hist] == [1, 0]

    (restore,) = _run(capsys, "restore", table)
    assert restore == {"op": "restore", "version": 0}
    assert VersionedTable(table).read(spark).count() == 2


def test_cli_pmerge_rewrites_only_affected_partition(spark, tmp_path, capsys):
    base = str(tmp_path / "base")
    upd = str(tmp_path / "upd")
    spark.createDataFrame(
        [(1, "d0", 1.0), (2, "d1", 2.0), (3, "d1", 3.0)], "id INT, day STRING, v DOUBLE"
    ).write.parquet(base)
    spark.createDataFrame([(2, "d1", 99.0)], "id INT, day STRING, v DOUBLE").write.parquet(upd)
    table = str(tmp_path / "pt")

    _run(capsys, "pmerge", base, table, "--keys", "id", "--partition-col", "day")
    _run(capsys, "pmerge", upd, table, "--keys", "id", "--partition-col", "day")

    t = PartitionedVersionedTable(table, "day")
    m = t._read_manifest()
    v0, v1 = sorted(e["id"] for e in m["versions"])
    assert t._entry(m, v1)["parts"]["d0"] == t._entry(m, v0)["parts"]["d0"]
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got == {1: 1.0, 2: 99.0, 3: 3.0}


def test_cli_sql_runs_against_lake(spark, sf_dir, capsys):
    assert (
        main(
            ["sql", "SELECT COUNT(*) AS n FROM region", "--sf-dir", sf_dir],
            stop_session=False,
        )
        == 0
    )
    assert "5" in capsys.readouterr().out
