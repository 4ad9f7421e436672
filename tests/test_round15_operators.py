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
        k: (v[0], v[1], v[2], v[1] * 1_000_000 // v[2])
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
