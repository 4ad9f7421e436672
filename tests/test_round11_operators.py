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


def _events_table(rows):
    """rows: (ts, user_id, event_type, value)."""
    import datetime

    return pa.table(
        {
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def test_group_sequential_obf_known_values(spark, tmp_path):
    """3 looks, hand-computed: day1 has arm B empty (z NULL), day2 is
    balanced-null-ish, day3 crosses the final-look 1.959964 boundary."""
    import datetime
    import math

    UTC = datetime.timezone.utc
    d1 = datetime.datetime(2024, 1, 1, 9, tzinfo=UTC)
    d2 = datetime.datetime(2024, 1, 2, 9, tzinfo=UTC)
    d3 = datetime.datetime(2024, 1, 3, 9, tzinfo=UTC)
    rows = []
    # day1: only arm A (even users): 2 events, 1 purchase -> z NULL
    rows += [(d1, 2, "purchase", 1.0), (d1, 4, "view", 1.0)]
    # day2: A += 2 events 0 purch (na=4, xa=1); B: 4 events 1 purch
    rows += [(d2, 2, "view", 1.0), (d2, 4, "view", 1.0)]
    rows += [(d2, 1, "purchase", 1.0), (d2, 3, "view", 1.0),
             (d2, 5, "view", 1.0), (d2, 7, "view", 1.0)]
    # day3: A += 6 views (na=10, xa=1); B += 6 all purchases (nb=10, xb=7)
    rows += [(d3, 2, "view", 1.0)] * 6
    rows += [(d3, 1, "purchase", 1.0), (d3, 3, "purchase", 1.0),
             (d3, 5, "purchase", 1.0), (d3, 7, "purchase", 1.0),
             (d3, 9, "purchase", 1.0), (d3, 11, "purchase", 1.0)]
    pq.write_table(_events_table(rows), str(tmp_path / "events.parquet"))
    got = {
        r["day"]: r.asDict()
        for r in QS["group_sequential_obf_audit"](spark, str(tmp_path)).collect()
    }
    l1 = got["2024-01-01"]
    assert (l1["na"], l1["xa"], l1["nb"], l1["xb"]) == (2, 1, 0, 0)
    assert l1["z_stat"] is None and l1["crossed"] is None
    l2 = got["2024-01-02"]
    assert (l2["na"], l2["xa"], l2["nb"], l2["xb"]) == (4, 1, 4, 1)
    # pa = pb -> z exactly 0; boundary = 1.959964/sqrt(8/20)
    assert l2["z_stat"] == 0.0
    assert l2["obf_boundary"] == round(1.959964 / math.sqrt(8 / 20), 6)
    assert bool(l2["crossed"]) is False
    l3 = got["2024-01-03"]
    assert (l3["na"], l3["xa"], l3["nb"], l3["xb"]) == (10, 1, 10, 7)
    p = 8 / 20
    z = (1 / 10 - 7 / 10) / math.sqrt(p * (1 - p) * (1 / 10 + 1 / 10))
    assert abs(l3["z_stat"] - round(z, 6)) < 2e-6
    assert l3["obf_boundary"] == 1.959964  # t = 1 at the final look
    assert bool(l3["crossed"]) is True  # |z| ~ 2.7386 > 1.959964


def test_bandit_replay_known_values(spark, tmp_path):
    """Greedy replay, hand-traced: day1 all arms unseen -> optimistic
    tie broken alphabetically; day2 exploits y's perfect day-1 rate and
    is charged y's actual (losing) day-2 log; day3 only x is logged so
    only x is matchable."""
    import datetime

    UTC = datetime.timezone.utc
    d1 = datetime.datetime(2024, 2, 1, tzinfo=UTC)
    d2 = datetime.datetime(2024, 2, 2, tzinfo=UTC)
    d3 = datetime.datetime(2024, 2, 3, tzinfo=UTC)
    WIN, LOSS = 250.0, 10.0
    rows = []
    rows += [(d1, 1, "x", LOSS), (d1, 2, "x", LOSS)]          # x: 0/2
    rows += [(d1, 3, "y", WIN), (d1, 4, "y", WIN)]            # y: 2/2
    rows += [(d2, 1, "x", WIN), (d2, 2, "x", LOSS), (d2, 3, "x", LOSS)]
    rows += [(d2, 4, "y", LOSS)]                               # y: 0/1
    rows += [(d3, 1, "x", WIN), (d3, 2, "x", WIN)]            # x only
    pq.write_table(_events_table(rows), str(tmp_path / "events.parquet"))
    got = {
        r["day"]: r.asDict()
        for r in QS["bandit_replay_eval"](spark, str(tmp_path)).collect()
    }
    g1 = got["2024-02-01"]
    assert g1["chosen_arm"] == "x"  # optimistic tie, alphabetical
    assert g1["prior_rate_ppm"] == 1_000_001
    assert (g1["matched_plays"], g1["matched_wins"]) == (2, 0)
    assert g1["day_reward_ppm"] == 0
    g2 = got["2024-02-02"]
    assert g2["chosen_arm"] == "y"  # prior 2/2 = 1e6 beats x's 0/2
    assert g2["prior_rate_ppm"] == 1_000_000
    assert (g2["matched_plays"], g2["matched_wins"]) == (1, 0)
    assert g2["day_reward_ppm"] == 0
    g3 = got["2024-02-03"]
    assert g3["chosen_arm"] == "x"  # y not logged on day3
    assert g3["prior_rate_ppm"] == 1 * 1_000_000 // 5  # x: 1 win / 5 plays
    assert (g3["matched_plays"], g3["matched_wins"]) == (2, 2)
    assert g3["day_reward_ppm"] == 1_000_000


def test_ppr_known_values(spark, tmp_path):
    """Seeds concentrate rank: same tiny bipartite graph as the HITS
    test plus customer 97 (a seed, custkey % 97 == 0) attached only to
    supplier 1. The expected ranks come from an independent Python
    re-derivation of the integer recurrence (exact bigint floor math,
    8 iterations) — and structurally, the seed must hold the top rank,
    its only neighbor s1 must outrank s2, and NON-seed customers get
    rank only via even-length paths from the seed."""
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 20, 30, 40], pa.int64()),
            "o_custkey": pa.array([1, 1, 2, 3, 97], pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([10, 11, 20, 30, 40], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1, 2, 1], pa.int64()),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))

    # independent re-derivation: undirected edges, node ids 2c / 2s+1
    pairs = {(2, 3), (2, 5), (4, 3), (6, 5), (194, 3)}
    edges = list(pairs) + [(b, a) for a, b in pairs]
    nodes = sorted({n for e in edges for n in e})
    outdeg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    seeds = {194}
    r = {n: 1_000_000 if n in seeds else 0 for n in nodes}
    for _ in range(8):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += r[s] // outdeg[s]
        r = {
            n: (150_000 if n in seeds else 0) + 850 * inc[n] // 1000
            for n in nodes
        }
    expect = sorted(nodes, key=lambda n: (-r[n], n))

    rows = QS["ppr_seeded_retrieval"](spark, str(tmp_path)).collect()
    got = {x["node"]: x for x in rows}
    assert [x["node"] for x in sorted(rows, key=lambda x: x["rk"])] == expect
    for n in nodes:
        assert got[n]["rank_micro"] == r[n], n
    # structure: the top two ranks are the seed's 1-hop neighbor s1
    # (degree 4, receives the seed's FULL outflow every round — the
    # seed's out-degree is 1) and the seed itself; s1 beats s2, which
    # has no seed edge
    assert set(expect[:2]) == {194, 3}
    assert r[3] > r[5]
    assert got[194]["side"] == "customer" and got[3]["side"] == "supplier"


def test_lpa_modularity_known_values(spark, tmp_path):
    """Planted 20-vertex blocks (custkeys 1..45 -> blocks {1..19},
    {20..39}, {40..45}): expected Q from an independent pure-Python
    re-derivation of the SAME deterministic LPA + modularity integer
    math; structurally Q must be solidly positive (planted structure)
    and every quantity exact."""
    custkeys = list(range(1, 46))
    t = pa.table({"c_custkey": pa.array(custkeys, pa.int64())})
    pq.write_table(t, str(tmp_path / "customer.parquet"))

    # independent re-derivation
    m = max(custkeys)
    ed = [
        (a, a + d)
        for a in custkeys
        for d in (1, 2, 3, 5, 8)
        if a + d <= m and a // 20 == (a + d) // 20
    ]
    e = ed + [(b, a) for a, b in ed]
    verts = sorted({v for p in e for v in p})
    lbl = {v: v for v in verts}
    for _ in range(3):
        cnt = {}
        for a, b in e:
            cnt.setdefault(a, {}).setdefault(lbl[b], 0)
            cnt[a][lbl[b]] += 1
        lbl = {
            v: min(
                (nl for nl in cnt[v] if cnt[v][nl] == max(cnt[v].values()))
            )
            for v in verts
        }
    ne = len(e)
    deg = {v: sum(1 for a, _ in e if a == v) for v in verts}
    comms = sorted(set(lbl.values()))
    m_c = {
        c: sum(1 for a, b in e if lbl[a] == c and lbl[b] == c) for c in comms
    }
    d_c = {c: sum(deg[v] for v in verts if lbl[v] == c) for c in comms}
    q_num = sum(m_c[c] * ne - d_c[c] * d_c[c] for c in comms)
    q_ppm = (
        q_num * 1_000_000 // (ne * ne)
        if q_num >= 0
        else -((-q_num) * 1_000_000 // (ne * ne))
    )

    [r] = QS["lpa_modularity_audit"](spark, str(tmp_path)).collect()
    assert r["n_edges_directed"] == ne
    assert r["n_communities"] == len(comms)
    assert r["internal_edges_directed"] == sum(m_c.values())
    assert r["q_modularity_ppm"] == q_ppm
    assert q_ppm > 200_000  # planted blocks -> solidly positive Q


def test_hill_diversity_known_values(spark, tmp_path):
    """Hand-exact Hill profile: tokens 'a a b c' per source 'web' ->
    counts (2,1,1), N=4, D0=3.  _log2_micro is EXACT on powers of two,
    so H = lg(4) - (2*lg2 + 0 + 0)/4 = 2e6 - 5e5 = 1.5e6 micro-bits
    exactly; D1 = 2^1.5: frac 0.5 scales to f20 = 524288 = bit 1 only,
    so the exp2 fold multiplies by the single hardcoded constant
    round(2^0.5 * 1e6) = 1414214 -> d1_micro = 2828428 -> 2828 milli.
    D2 = N^2*1000 // sum(c^2) = 16000 // 6 = 2666 milli."""
    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["a a b c"], pa.string()),
            "lang": pa.array(["en"], pa.string()),
            "source": pa.array(["web"], pa.string()),
            "n_chars": pa.array([7], pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    [r] = QS["hill_diversity_profile"](spark, str(tmp_path)).collect()
    assert r["n_tokens"] == 4
    assert r["hill_d0_vocab"] == 3
    assert r["h_micro_bits"] == 1_500_000
    assert r["hill_d1_milli"] == 2_828
    assert r["hill_d2_milli"] == 2_666


def test_exp2_micro_inverts_log2_micro():
    """The new fixed-point exp2 must invert the repo's log2 within their
    combined floor error: exp2(log2(x)) / x within ~120 ppm for x across
    five decades (both macros evaluated in DuckDB)."""
    import duckdb

    from __spark_entry__ import _exp2_micro, _log2_micro

    con = duckdb.connect()
    xs = [1, 2, 3, 7, 10, 97, 1000, 52431, 1_000_000, 87_654_321]
    rows = con.execute(
        f"""
        WITH xs AS (SELECT CAST(unnest({xs}) AS BIGINT) AS c),
        lg AS (SELECT c, {_log2_micro('c', 'duckdb')} AS h FROM xs),
        st AS (SELECT c, h, h // 1000000 AS p,
                      ((h % 1000000) * 1048576) // 1000000 AS f20
               FROM lg)
        SELECT c, {_exp2_micro('p', 'f20', 'duckdb')} AS y_micro FROM st
        """
    ).fetchall()
    for c, y_micro in rows:
        rel = y_micro / (c * 1_000_000)
        # the error budget is log2's, not exp2's: _log2_micro's own
        # property test documents up to 0.17 BITS of (always-downward)
        # truncation error as the mantissa approaches 2, and 2^-0.17 =
        # 0.889 — so the round-trip is bounded below by that envelope
        # and above by exact (both macros floor).  Observed worst on
        # these inputs: 0.9155 at c=1000 (mantissa 1.953).
        assert 0.889 <= rel <= 1.0001, (c, y_micro, rel)
