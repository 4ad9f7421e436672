"""Round-16 registry additions (VERDICT r15 §next#7 — the two named
absent classes), each proven against an INDEPENDENT Python reference
that recomputes the result by direct scan, not by re-running either SQL
engine:

- stratified_sample_audit: the per-stratum hash-rank sample is recomputed
  with hashlib.md5 + sort in plain Python — count contract AND membership
  checksum must match exactly;
- tokenizer_fertility_profile: bytes / words / 4-char-chunk subwords are
  refolded per doc in plain Python (exact integer arithmetic, same
  floor-division ppm/milli).
"""

from __future__ import annotations

import hashlib

import duckdb

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
QS = entrymod.queries()


def _docs(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    con.close()
    return rows


def _py_stratified(sf_dir: str):
    cap = entrymod._STRAT_SAMPLE_CAP
    by_lang: dict[str, list[tuple[str, int]]] = {}
    for doc_id, lang, _text in _docs(sf_dir):
        hx = hashlib.md5(f"strat:{doc_id}".encode()).hexdigest()
        by_lang.setdefault(lang, []).append((hx, doc_id))
    out = {}
    for lang, items in by_lang.items():
        items.sort()  # (md5 hex, doc_id) — the deterministic hash-rank order
        picked = [d for _, d in items[:cap]]
        out[lang] = (
            len(items),
            min(cap, len(items)),
            len(picked),
            sum(picked),
            len(picked) == min(cap, len(items)),
        )
    return out


def test_stratified_sample_matches_python_reference(spark):
    got = {
        r.stratum: (r.n_pop, r.n_target, r.n_sampled, r.sample_doc_sum, r.exact_contract)
        for r in QS["stratified_sample_audit"](spark, SF_DIR).collect()
    }
    assert got == _py_stratified(SF_DIR)
    assert all(v[4] for v in got.values()), "exact-count contract violated"


def test_stratified_sample_plan_has_window_group_limit(spark):
    """The scale claim in the docstring, plan-gated: the rk <= cap filter
    must rewrite into a WindowGroupLimit so each map task keeps only its
    local top-cap per stratum BEFORE the exchange — without it the rank
    pass shuffles the whole corpus."""
    p = (
        QS["stratified_sample_audit"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p


def _py_fertility(sf_dir: str):
    agg: dict[str, list[int]] = {}
    for _doc_id, lang, text in _docs(sf_dir):
        toks = [t for t in text.strip().lower().split() if t]
        n_bytes = len(text.encode("utf-8"))
        n_words = len(toks)
        n_sub = sum((len(t) + 3) // 4 for t in toks)
        d, b, w, s = agg.get(lang, [0, 0, 0, 0])
        agg[lang] = [d + 1, b + n_bytes, w + n_words, s + n_sub]
    return {
        lang: (
            d,
            b,
            w,
            s,
            s * 1_000_000 // w if w else None,
            b * 1000 // s if s else None,
        )
        for lang, (d, b, w, s) in sorted(agg.items())
    }


def test_fertility_profile_matches_python_reference(spark):
    got = {
        r.lang: (
            r.n_docs,
            r.total_bytes,
            r.total_words,
            r.total_subwords,
            r.fertility_ppm,
            r.bytes_per_subword_milli,
        )
        for r in QS["tokenizer_fertility_profile"](spark, SF_DIR).collect()
    }
    assert got == _py_fertility(SF_DIR)


def test_round16_adds_survive_degenerate_corpora(spark, tmp_path):
    """Standing rule (VERDICT r15 §next#8): both degenerate-input audits
    on every addition BEFORE it is windowed — 0-row and 1-row corpora
    must publish empty / single-stratum results, not crash."""
    from tools.empty_audit import build_corpus

    for n_rows in (0, 1):
        d = build_corpus(n_rows)
        for name in ("stratified_sample_audit", "tokenizer_fertility_profile"):
            rows = QS[name](spark, d).collect()
            assert len(rows) == n_rows, (name, n_rows, rows)
        # A lone event has no opponent, so BOTH degenerate corpora give
        # the preference query zero matchups -> empty result, not a crash.
        assert QS["pairwise_preference_copeland"](spark, d).collect() == []
        # Profile contract: 0-row orders profile nothing; a 1-row orders
        # table yields all four audited columns, every contract met.
        prof = QS["column_profile_contract"](spark, d).collect()
        assert len(prof) == 4 * n_rows
        assert all(r.contract_pass for r in prof)
        if n_rows == 1:
            [r] = QS["stratified_sample_audit"](spark, d).collect()
            assert (r.n_pop, r.n_target, r.n_sampled, r.exact_contract) == (
                1,
                1,
                1,
                True,
            )


# --- pairwise_preference_copeland -----------------------------------------


def _py_preference(sf_dir: str):
    """Independent reference: Decimal(repr(v)).quantize(6, HALF_UP) is
    exactly Spark's cast(round(double, 6) as decimal(38,6)) — both round
    HALF_UP on the shortest round-trip decimal representation."""
    from decimal import ROUND_HALF_UP, Decimal

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT user_id, event_type, value FROM '{sf_dir}/events.parquet'"
    ).fetchall()
    con.close()
    q6 = Decimal("0.000001")
    # A (judge, candidate) group whose engagement values are ALL NULL has
    # a NULL total in both engines (SUM skips nulls, all-null -> NULL);
    # its comparisons are then undecided — neither side wins, but the
    # matchup still counts (it lands in n_ties). Mirror that: the key
    # stays present with a None total.
    s: dict[tuple[int, str], Decimal | None] = {}
    for u, t, v in rows:
        prev = s.get((u, t))
        if v is None:
            s.setdefault((u, t), None)
        else:
            d = Decimal(repr(v)).quantize(q6, ROUND_HALF_UP)
            s[(u, t)] = d if prev is None else prev + d
    by_user: dict[int, list[tuple[str, Decimal]]] = {}
    for (u, t), sv in s.items():
        by_user.setdefault(u, []).append((t, sv))
    pair: dict[tuple[str, str], list[int]] = {}
    for items in by_user.values():
        items.sort()
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                (ta, sa), (tb, sb) = items[i], items[j]
                w, l, n = pair.get((ta, tb), [0, 0, 0])
                decided = sa is not None and sb is not None
                pair[(ta, tb)] = [
                    w + (decided and sa > sb),
                    l + (decided and sb > sa),
                    n + 1,
                ]
    agg: dict[str, list[int]] = {}
    for (ta, tb), (w, l, n) in pair.items():
        for m, mw, ml in ((ta, w, l), (tb, l, w)):
            o, nm, ws, ls, cp = agg.get(m, [0, 0, 0, 0, 0])
            cp += 2 if mw > ml else (1 if mw == ml else 0)
            agg[m] = [o + 1, nm + n, ws + mw, ls + ml, cp]
    return {
        m: (
            o,
            nm,
            w,
            l,
            nm - w - l,
            (w * 1_000_000 // (w + l)) if w + l else None,
            cp,
        )
        for m, (o, nm, w, l, cp) in sorted(agg.items())
    }


def test_pairwise_preference_matches_python_reference(spark):
    got = {
        r.model: (
            r.n_opponents,
            r.n_matches,
            r.n_wins,
            r.n_losses,
            r.n_ties,
            r.win_ppm,
            r.copeland_x2,
        )
        for r in QS["pairwise_preference_copeland"](spark, SF_DIR).collect()
    }
    assert got == _py_preference(SF_DIR)
    assert got  # non-degenerate corpus actually exercises the rollup


def test_pairwise_preference_tie_and_drawn_record(spark, tmp_path):
    """The tie and drawn-head-to-head branches never fire on the float
    corpus (sums tie with probability ~0), so pin them on a crafted
    corpus: x-vs-y is 1 win, 1 loss, 1 tie (drawn record -> 1 Copeland
    point each), z beats both on record (-> 4 points)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema("/root/testdata/sf0.001/events.parquet")
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, ts, 1, "x", 1.0, "{}"),
        (2, ts, 1, "y", 1.0, "{}"),  # user 1: x == y (tie), z above both
        (3, ts, 1, "z", 2.0, "{}"),
        (4, ts, 2, "x", 1.0, "{}"),
        (5, ts, 2, "y", 2.0, "{}"),  # user 2: y beats x
        (6, ts, 3, "x", 5.0, "{}"),
        (7, ts, 3, "y", 1.0, "{}"),  # user 3: x beats y
    ]
    tbl = pa.Table.from_pylist(
        [dict(zip([f.name for f in schema], r)) for r in rows], schema=schema
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/events.parquet")
    got = {
        r.model: (
            r.n_opponents,
            r.n_matches,
            r.n_wins,
            r.n_losses,
            r.n_ties,
            r.win_ppm,
            r.copeland_x2,
        )
        for r in QS["pairwise_preference_copeland"](spark, d).collect()
    }
    assert got == {
        "x": (2, 4, 1, 2, 1, 333333, 1),
        "y": (2, 4, 1, 2, 1, 333333, 1),
        "z": (2, 2, 2, 0, 0, 1000000, 4),
    }
    assert got == _py_preference(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    oracle = {
        m: (o, nm, w, l, t, ppm, cp)
        for m, o, nm, w, l, t, ppm, cp in con.execute(
            entrymod._PREF_COPELAND_ORACLE
        ).fetchall()
    }
    con.close()
    assert got == oracle


def test_pairwise_preference_null_engagement_is_undecided(spark, tmp_path):
    """An all-NULL engagement group totals NULL in both engines, so its
    matchups are undecided: counted, but won by neither side (they land
    in n_ties). Pin the three-way parity on a corpus that has one."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema("/root/testdata/sf0.001/events.parquet")
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, ts, 1, "x", None, "{}"),  # user 1: x is all-NULL -> undecided
        (2, ts, 1, "y", 1.0, "{}"),
        (3, ts, 2, "x", 2.0, "{}"),  # user 2: x beats y
        (4, ts, 2, "y", 1.0, "{}"),
    ]
    names = [f.name for f in schema]
    tbl = pa.Table.from_pylist(
        [dict(zip(names, r)) for r in rows], schema=schema
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/events.parquet")
    got = {
        r.model: (r.n_matches, r.n_wins, r.n_losses, r.n_ties, r.win_ppm, r.copeland_x2)
        for r in QS["pairwise_preference_copeland"](spark, d).collect()
    }
    assert got == {
        "x": (2, 1, 0, 1, 1000000, 2),
        "y": (2, 0, 1, 1, 0, 0),
    }
    assert got == {
        m: (v[1], v[2], v[3], v[4], v[5], v[6])
        for m, v in _py_preference(d).items()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    oracle = {
        m: (nm, w, l, t, ppm, cp)
        for m, _o, nm, w, l, t, ppm, cp in con.execute(
            entrymod._PREF_COPELAND_ORACLE
        ).fetchall()
    }
    con.close()
    assert got == oracle


# --- column_profile_contract ----------------------------------------------


def _py_profile(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetchall()
    con.close()
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    expect = {c: e for c, *e in entrymod._PROFILE_EXPECTATIONS}
    out = {}
    for i, c in enumerate(cols):
        vals = [None if r[i] is None else str(r[i]) for r in rows]
        if not vals:
            continue
        nn = [v for v in vals if v is not None]
        n_rows, n_null = len(vals), len(vals) - len(nn)
        null_ppm = n_null * 1_000_000 // n_rows
        n_distinct = len(set(nn))
        max_null_ppm, max_distinct, uniq = expect[c]
        ok = (
            null_ppm <= max_null_ppm
            and (max_distinct is None or n_distinct <= max_distinct)
            and (not uniq or n_distinct == n_rows - n_null)
        )
        out[c] = (
            n_rows,
            n_null,
            null_ppm,
            n_distinct,
            min(nn) if nn else None,
            max(nn) if nn else None,
            ok,
        )
    return out


def test_column_profile_matches_python_reference(spark):
    got = {
        r.col_name: (
            r.n_rows,
            r.n_null,
            r.null_ppm,
            r.n_distinct,
            r.min_val,
            r.max_val,
            r.contract_pass,
        )
        for r in QS["column_profile_contract"](spark, SF_DIR).collect()
    }
    assert got == _py_profile(SF_DIR)
    assert len(got) == 4
    assert all(v[6] for v in got.values()), "clean corpus must pass contract"


def test_column_profile_contract_violations(spark, tmp_path):
    """The violation branches never fire on the clean corpus, so pin them
    on a crafted one: a duplicated o_orderkey breaks the uniqueness
    expectation, a NULL o_custkey breaks its zero-null bound, and both
    string columns stay within domain (pass)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema("/root/testdata/sf0.001/orders.parquet")
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 10, "O", 5.0, ts, "1-URGENT"),
        (1, 20, "F", 6.0, ts, "2-HIGH"),  # duplicate o_orderkey
        (2, None, "O", 7.0, ts, "1-URGENT"),  # NULL o_custkey
    ]
    names = [f.name for f in schema]
    tbl = pa.Table.from_pylist(
        [dict(zip(names, r)) for r in rows], schema=schema
    )
    d = str(tmp_path)
    pq.write_table(tbl, f"{d}/orders.parquet")
    got = {
        r.col_name: (r.n_null, r.null_ppm, r.n_distinct, r.contract_pass)
        for r in QS["column_profile_contract"](spark, d).collect()
    }
    assert got == {
        "o_orderkey": (0, 0, 2, False),  # 2 distinct over 3 rows: not unique
        "o_custkey": (1, 333333, 2, False),  # null_ppm 333333 > 0
        "o_orderstatus": (0, 0, 2, True),
        "o_orderpriority": (0, 0, 2, True),
    }
    assert got == {
        k: (v[1], v[2], v[3], v[6]) for k, v in _py_profile(d).items()
    }


def test_column_profile_plan_single_scan(spark):
    """Scale claims, plan-gated: ONE FileScan (the stack unpivot profiles
    every audited column in a single pass), the expectations dim joins as
    a broadcast of a local literal (never a second scan), no cartesian."""
    p = (
        QS["column_profile_contract"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("FileScan") == 1
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_pairwise_preference_plan_single_pipeline(spark):
    """Scale claims, plan-gated: the matchup pipeline is planned ONCE
    (2 FileScans — the self-join's two sides; a union-based unpivot
    planned it twice, 4 scans), the direction flip is a map-side
    Generate, and the user-keyed self-join is never a cartesian."""
    p = (
        QS["pairwise_preference_copeland"](spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert p.count("FileScan") == 2
    assert "Generate" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
