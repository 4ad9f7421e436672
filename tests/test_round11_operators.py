"""Known-answer tests for the round-11 operators on tiny handcrafted
tables — the independent layer that catches what oracle parity cannot
(both engines sharing a wrong derivation; the round-10 zero-cell bug is
the precedent)."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402

QS = ent.queries()


def test_hits_known_values(spark, tmp_path):
    """Bipartite graph: customers {1,2,3}, suppliers {1,2}.
    Orders/lineitem wiring gives edges c1->{s1,s2}, c2->{s1}, c3->{s2}.

    Hand iteration (hub0 = 1e6 each):
      auth(s1) = h(c1)+h(c2) = 2e6 ; auth(s2) = h(c1)+h(c3) = 2e6
      -> max-normalized: both 1e6.
      hub(c1) = a(s1)+a(s2) = 2e6 ; hub(c2) = hub(c3) = 1e6
      -> normalized: c1 = 1e6, c2 = c3 = 500000.
    Round 2 onward is a FIXPOINT: auth sums become (1.5e6, 1.5e6) ->
    (1e6, 1e6); hubs reproduce (1e6, 5e5, 5e5). So after 4 rounds the
    scores must equal the round-1 values exactly."""
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 20, 30], pa.int64()),
            "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        }
    )
    # order 10 -> s1, order 11 -> s2 (both c1), order 20 -> s1 (c2),
    # order 30 -> s2 (c3)
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([10, 11, 20, 30], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1, 2], pa.int64()),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
    rows = QS["hits_purchase_graph"](spark, str(tmp_path)).collect()
    got = {(r["side"], r["node"]): r["score_ppm"] for r in rows}
    # node ids: cust*2, supp*2+1
    assert got[("hub", 2)] == 1_000_000  # c1: the two-basket power buyer
    assert got[("hub", 4)] == 500_000
    assert got[("hub", 6)] == 500_000
    assert got[("auth", 3)] == 1_000_000  # s1 and s2 symmetric
    assert got[("auth", 5)] == 1_000_000
    # rk is dense per side, score desc then node asc
    rks = {(r["side"], r["node"]): r["rk"] for r in rows}
    assert rks[("hub", 2)] == 1 and rks[("hub", 4)] == 2 and rks[("hub", 6)] == 3
    assert rks[("auth", 3)] == 1 and rks[("auth", 5)] == 2


def test_encoding_artifact_known_values(spark, tmp_path):
    """Hand-built mojibake corpus:
    d1 clean ASCII (20 chars), d2 Latin-1 artifact 'Ã©' twice,
    d3 smart-quote mojibake 'â€œ' + one U+FFFD + one control char 0x07,
    d4 clean but non-ASCII Greek (5 chars α)."""
    texts = [
        "clean ascii text 123",          # 20 chars, all printable ASCII
        "cafÃ© and piÃ±ata",              # 'Ã' twice -> 1 artifact doc
        "he said â€œhi �\x07",  # smartquote + nbsp + FFFD + BEL
        "ααααα",                          # 5 non-ascii chars, no artifacts
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en", "en", "en", "el"], pa.string()),
            "source": pa.array(["web", "web", "web", "wiki"], pa.string()),
            "n_chars": pa.array([len(s) for s in texts], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r.asDict()
        for r in QS["encoding_artifact_audit"](spark, str(tmp_path)).collect()
    }
    web = got["web"]
    assert web["n_docs"] == 3
    assert web["docs_latin1_artifact"] == 1          # only d2
    assert web["docs_smartquote_mojibake"] == 1      # only d3
    assert web["replacement_chars"] == 1             # d3's U+FFFD
    assert web["control_chars"] == 1                 # d3's BEL
    # d2 non-ascii: Ã, ©, Ã, ± = 4; d3: â, €, œ, nbsp, FFFD, BEL = 6
    assert web["non_ascii_chars"] == 10
    total_web = sum(len(s) for s in texts[:3])
    assert web["total_chars"] == total_web
    assert web["non_ascii_ppm"] == 10 * 1_000_000 // total_web
    wiki = got["wiki"]
    assert wiki["n_docs"] == 1
    assert wiki["docs_latin1_artifact"] == 0
    assert wiki["non_ascii_chars"] == 5
    assert wiki["non_ascii_ppm"] == 1_000_000  # every char non-ascii
