"""Golden-vector unit tests for the scalar expression library (F1-F17).

Vectors come from the reference's docstring examples (FIXTURES.md A.7) plus
edge cases pinned in SURVEY.md §2.8/§8.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from domanda_etl_spark.functions import scalars as S


def run1(spark, expr_builder, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr_builder("v").alias("out")).collect()[0]["out"]


# ---- F1 airline code
@pytest.mark.parametrize(
    "inp,out",
    [("HX261", "HX"), (None, ""), ("CI073", "CI"), ("073", ""), ("", ""), ("ci73", "CI")],
)
def test_airline_code(spark, inp, out):
    assert run1(spark, S.airline_code, inp) == out


# ---- F2 to_time_hhmm
@pytest.mark.parametrize(
    "inp,out",
    [
        ("2025-11-05 19:20:00", "19:20"),
        ("0 days 19:20:00", "19:20"),
        ("19:05", "19:05"),
        ("9:05", "09:05"),
        ("2025/11/05 07:45", "07:45"),
        ("2025-11-05 07:45", "07:45"),
        ("junk", ""),
        (None, ""),
        ("", ""),
    ],
)
def test_to_time_hhmm(spark, inp, out):
    assert run1(spark, S.to_time_hhmm, inp) == out


# ---- F3 duration_to_minutes
@pytest.mark.parametrize(
    "inp,out",
    [
        ("0 days 02:05:00", 125),
        ("01:30:30", 91),
        ("01:30:29", 90),
        ("95", 95),
        ("2 days 01:00", 2940),
        ("junk", None),
        (None, None),
        ("", None),
    ],
)
def test_duration_to_minutes(spark, inp, out):
    assert run1(spark, S.duration_to_minutes, inp) == out


# ---- F4 luggage split
@pytest.mark.parametrize(
    "inp,val,unit",
    [
        ("1件", 1.0, "件"),
        ("25 公斤", 25.0, "公斤"),
        ("30kg", 30.0, "公斤"),
        ("無", None, ""),
        (None, None, ""),
        ("2 件", 2.0, "件"),
        ("23.5公斤", 23.5, "公斤"),
    ],
)
def test_split_luggage(spark, inp, val, unit):
    assert run1(spark, S.luggage_value, inp) == val
    assert run1(spark, S.luggage_unit, inp) == unit


# ---- F5 luggage reassembly
@pytest.mark.parametrize(
    "inp,out",
    [("1件", "1件"), ("25 公斤", "25公斤"), ("23.5 kg", "23.5公斤"), ("無", ""), (None, "")],
)
def test_luggage_reassemble(spark, inp, out):
    assert run1(spark, S.luggage_reassemble, inp) == out


# ---- F6 to YYYY/MM/DD
@pytest.mark.parametrize(
    "inp,out",
    [
        ("2025-11-05 19:20:00", "2025/11/05"),
        ("2025-11-05", "2025/11/05"),
        ("2025/11/05 19:20", "2025/11/05"),
        ("2025/11/05", "2025/11/05"),
        ("garbage", ""),
        (None, ""),
    ],
)
def test_to_date(spark, inp, out):
    assert run1(spark, S.to_date_yyyy_mm_dd, inp) == out


# ---- F7 MM/DD slice
@pytest.mark.parametrize(
    "inp,out",
    [("2025-11-05 19:20:00", "11/05"), ("2025-11-05", "11/05"), ("abc", ""), (None, None)],
)
def test_date_slice(spark, inp, out):
    assert run1(spark, S.date_to_mm_dd_slice, inp) == out


# ---- F8/F9 year handling
def test_year_prefix_attach(spark):
    assert run1(spark, S.year_prefix, "2025-11-05 19:20:00") == "2025"
    assert run1(spark, S.year_prefix, "2025/11/05") == "2025/11/05"  # Q9 quirk
    df = spark.createDataFrame([("2025", "11/05"), (None, "11/05")], "y string, d string")
    rows = df.select(S.attach_year("y", "d").alias("out")).collect()
    assert rows[0]["out"] == "2025/11/05"
    assert rows[1]["out"] is None  # null-propagating like pandas NaN + str


# ---- F10 flight canonicalization + P4 validity
@pytest.mark.parametrize(
    "inp,out",
    [
        ("CI73", "CI073"),
        ("CI7", "CI007"),
        (" ci 73 ", "CI073"),
        ("CI0731", "CI0731"),
        ("73123", "73123"),
        (None, ""),
        ("", ""),
    ],
)
def test_canonical_flight_number(spark, inp, out):
    assert run1(spark, S.canonical_flight_number, inp) == out


def test_invalid_flight_row(spark):
    df = spark.createDataFrame(
        [("CI073", "BR0012"), ("CI073", "BAD!"), ("", ""), ("C7", "")],
        "a string, b string",
    )
    out = df.filter(~S.invalid_flight_row(["a", "b"])).collect()
    assert [(r["a"], r["b"]) for r in out] == [("CI073", "BR0012"), ("", "")]


# ---- F12 first token
@pytest.mark.parametrize(
    "inp,out", [("TPE 桃園機場", "TPE"), ("  TPE  X", "TPE"), (None, ""), ("", "")]
)
def test_first_token(spark, inp, out):
    assert run1(spark, S.first_token, inp) == out


# ---- F13 split flight+class
def test_split_flight_and_class(spark):
    df = spark.createDataFrame([("CI073 K",), ("BR16",)], "v string")
    fl, cl = S.split_flight_and_class("v")
    rows = df.select(fl.alias("f"), cl.alias("c")).collect()
    assert (rows[0]["f"], rows[0]["c"]) == ("CI073", "K")
    assert (rows[1]["f"], rows[1]["c"]) == ("BR16", None)


# ---- F14 guarded long
def test_guarded_to_long(spark):
    df = spark.createDataFrame(
        [(1.0,), (2.7,), (-2.7,), (None,), (float("nan",),), (float("inf"),)], "v double"
    )
    out = [r["out"] for r in df.select(S.guarded_to_long("v").alias("out")).collect()]
    assert out == [1, 2, -2, None, None, None]


# ---- F15/F16 placeholders + whitespace
@pytest.mark.parametrize(
    "inp,out",
    [("NaN", ""), ("<NA>", ""), ("null", ""), ("NaT", ""), ("ok", "ok"), (None, "")],
)
def test_placeholder(spark, inp, out):
    assert run1(spark, S.placeholder_to_empty, inp) == out


# ---- F17 join-date normalization
@pytest.mark.parametrize(
    "inp,out",
    [
        ("2025-11-05", "11/05"),
        ("2025.11.05", "11/05"),
        ("11-5", "11/05"),
        ("1/5", "01/05"),
        ("11/05/2025", "11/05"),
        ("13/45", "13/45"),  # unparseable -> keep (padded) original
        ("TBD", "TBD"),
        ("", ""),
    ],
)
def test_normalize_join_date(spark, inp, out):
    assert run1(spark, S.normalize_join_date, inp) == out


# ---- J2 full key normalization
@pytest.mark.parametrize(
    "inp,strip,out",
    [
        (" cx  450 ", True, "CX450"),
        (" cx  450 ", False, "CX 450"),
        ("nan", True, ""),
        (None, True, ""),
        ("<NA>", False, ""),
        ("經濟艙 K", True, "經濟艙K"),
    ],
)
def test_normalize_join_key(spark, inp, strip, out):
    assert run1(spark, lambda c: S.normalize_join_key(c, strip_all_whitespace=strip), inp) == out
