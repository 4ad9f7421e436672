"""Round-15 addition invariants (SURVEY §5 pattern: an independent
Python reference or closed-form guarantee next to the DuckDB oracle).

- quantile_sketch_merge_audit: the oracle proves Spark == DuckDB on the
  same arithmetic; these assert the arithmetic itself — mergeability
  (merged bins == single-pass bins) and the rank-bracket contract MUST
  hold, so `false` anywhere is a bug even if both engines agree on it.
- language_id_profile: the confusion rollup is recomputed by a direct
  Python scan over the raw parquet (profiles, argmax total order, ppm
  floor division) and compared row-for-row.
"""

from __future__ import annotations

import os

import duckdb

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
QS = entrymod.queries()


def test_quantile_sketch_contract_holds(spark):
    rows = QS["quantile_sketch_merge_audit"](spark, SF_DIR).collect()
    assert [r.q_pct for r in rows] == [50, 90, 99]
    for r in rows:
        # mergeability: sum-of-shard-histograms == single-pass histogram
        assert r.bins_match, r
        # rank bracket: the exact target rank falls inside the picked bin
        assert r.within_bound, r
        assert r.cum_below_lo < r.target_rank <= r.cum_at_hi, r
        # the bin edges are consistent with the fixed width
        assert r.bin_hi_cents - r.bin_lo_cents + 1 == entrymod._QSKETCH_BIN_CENTS
        # ceil-rank definition
        assert r.target_rank == (r.n * r.q_pct + 99) // 100


def _py_lang_confusion(sf_dir: str):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, lang, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    agg: dict[tuple[str, str], list[int]] = {}
    for _doc_id, lang, text in docs:
        toks = [t for t in text.strip().lower().split() if t]
        counts = {
            l: sum(1 for t in toks if t in set(marks))
            for l, marks in entrymod._LANG_PROFILES
        }
        m = max(counts.values())
        if m == 0:
            pred = "und"
        else:
            pred = next(
                l for l, _ in entrymod._LANG_PROFILES if counts[l] == m
            )
        key = (lang, pred)
        n, hits, tok = agg.get(key, [0, 0, 0])
        agg[key] = [n + 1, hits + m, tok + len(toks)]
    return {
        # hit_ppm is undefined over a group of only-empty docs (0 real
        # tokens) -> None, matching both engines' nullif guard
        k: (v[0], v[1], v[2], v[1] * 1_000_000 // v[2] if v[2] else None)
        for k, v in sorted(agg.items())
    }


def test_language_id_matches_python_reference(spark):
    got = {
        (r.labeled_lang, r.pred_lang): (
            r.n_docs,
            r.total_hits,
            r.total_tokens,
            r.hit_ppm,
        )
        for r in QS["language_id_profile"](spark, SF_DIR).collect()
    }
    assert got == _py_lang_confusion(SF_DIR)


def test_language_id_empty_text_parity(spark, tmp_path):
    """ADVICE r15 low: split of empty/whitespace-only text yields ['']
    in both Spark and DuckDB — a phantom token that inflated n_tok, and
    a (lang,pred) group made entirely of empty docs divided by zero
    (Spark `div` -> NULL vs Python ZeroDivisionError).  Both engines now
    filter empty tokens and nullif the ratio; prove three-way parity
    (Spark = DuckDB oracle = Python reference) on a corpus that actually
    CONTAINS empty and whitespace-only docs, including a label whose
    docs are ALL empty (the 0-token group)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_utils import compare, duckdb_run

    src = "/root/testdata/sf0.001"
    corp = tmp_path / "sf_lang"
    corp.mkdir()
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(src, f), corp / f)
    t = pq.read_table(corp / "documents.parquet")
    df = t.to_pandas()
    df.loc[df.index[0], "text"] = ""            # empty doc
    df.loc[df.index[1], "text"] = "  \t \n "   # whitespace-only doc
    # a label whose docs are ALL empty -> sum(n_tok)=0 group
    df.loc[df.index[0], "lang"] = "xx-empty"
    df.loc[df.index[1], "lang"] = "xx-empty"
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False), corp / "documents.parquet"
    )

    sdf = QS["language_id_profile"](spark, str(corp))
    oracle = duckdb_run(entrymod.oracle_sql()["language_id_profile"], str(corp))
    ok, msg = compare(sdf, oracle)
    assert ok, msg

    got = {
        (r.labeled_lang, r.pred_lang): (r.n_docs, r.total_hits, r.total_tokens, r.hit_ppm)
        for r in sdf.collect()
    }
    assert got == _py_lang_confusion(str(corp))
    assert got[("xx-empty", "und")] == (2, 0, 0, None)
