"""Order-insensitive Spark-vs-DuckDB result comparison, mirroring the
driver's correctness gate (row-count + schema + value-hash on
name-sorted columns)."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _canon(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"
    if v is pd.NaT:
        return "∅"
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        # STRICT (round-7): the driver's hasher distinguishes 93000.0 from
        # 93000 (VERDICT r6 §wrong#1) — a float stays a float here so any
        # int-vs-float oracle typing slip fails locally before it fails in
        # a driver window.  repr() of a float is round-trip exact.
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _canon(v.item())
    return str(v)


# numpy dtype.kind letters collapsed to comparability classes: signed and
# unsigned ints are one class; float is its own class (so bigint-vs-float64
# — the HUGEINT materialization bug — is a dtype error, not a value error).
_KIND_CLASS = {"i": "int", "u": "int", "f": "float", "b": "bool",
               "M": "ts", "m": "td", "O": "obj", "S": "obj", "U": "obj"}


def dtype_mismatches(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Per-column dtype-class comparison (driver-strict).  A Spark int64
    column vs an oracle float64 column is exactly how DuckDB HUGEINT
    (int128) slips through: pandas materializes it as float64 and the
    driver hashes 93000.0 apart from 93000."""
    bad = []
    for c in sorted(spark_pdf.columns):
        ks = _KIND_CLASS.get(spark_pdf[c].dtype.kind, "obj")
        ko = _KIND_CLASS.get(oracle_pdf[c].dtype.kind, "obj")
        # a column that is entirely NULL on both sides may legitimately
        # materialize as object-vs-float; only flag when values exist
        if ks != ko and not (spark_pdf[c].isna().all() and oracle_pdf[c].isna().all()):
            bad.append(f"{c}: spark={spark_pdf[c].dtype} oracle={oracle_pdf[c].dtype}")
    return bad


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> tuple[bool, str]:
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return False, f"schema mismatch: {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    if len(spark_pdf) != len(oracle_pdf):
        return False, f"row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    bad = dtype_mismatches(spark_pdf, oracle_pdf)
    if bad:
        return False, f"dtype mismatch (driver-strict): {bad}"
    a, b = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, "ok"
