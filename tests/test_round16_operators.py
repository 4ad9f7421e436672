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
        if n_rows == 1:
            [r] = QS["stratified_sample_audit"](spark, d).collect()
            assert (r.n_pop, r.n_target, r.n_sampled, r.exact_contract) == (
                1,
                1,
                1,
                True,
            )
