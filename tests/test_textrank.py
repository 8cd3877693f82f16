"""TextRank turn selection (operators/conversation.py:textrank_turns):
identical-recursion python twin (tokens -> jaccard graph -> the exact
pagerank update), isolated-turn convention, selection determinism."""

import pytest

from nlp_series_relation_extraction_spark.operators.conversation import (
    textrank_turns,
)

SCHEMA = "conv_id string, turn_idx int, text string"


def _turns(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _python_twin(rows, min_j_ppm=200_000, d=0.85, iters=12, top_k=2):
    toks = {
        (c, t): sorted({w for w in txt.lower().split(" ") if w})
        for c, t, txt in rows
    }
    edges = {}
    keys = sorted(toks)
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            if ka[0] != kb[0]:
                continue
            A, B = set(toks[ka]), set(toks[kb])
            uni = len(A | B)
            if uni > 0 and (len(A & B) * 1_000_000) // uni >= min_j_ppm:
                edges.setdefault(ka, set()).add(kb)
                edges.setdefault(kb, set()).add(ka)
    nodes = sorted(edges)
    n = len(nodes)
    ranks = {v: 1.0 / n for v in nodes} if n else {}
    for _ in range(iters):
        contribs = {v: 0.0 for v in nodes}
        for v in nodes:
            share = ranks[v] / len(edges[v])
            for w in edges[v]:
                contribs[w] += share
        ranks = {
            v: (1.0 - d) / n + d * contribs[v] for v in nodes
        }
    scored = {}
    for c, t, _ in rows:
        scored[(c, t)] = ranks.get((c, t), 0.0)
    out = {}
    for (c, t), s in scored.items():
        out.setdefault(c, []).append((s, t))
    sel = []
    for c, lst in out.items():
        lst.sort(key=lambda st: (-st[0], st[1]))
        for r, (s, t) in enumerate(lst[:top_k], start=1):
            sel.append((c, t, s, r))
    return sorted(sel)


ROWS = [
    ("c1", 0, "spark shuffles data across the cluster"),
    ("c1", 1, "spark shuffles data across executors"),
    ("c1", 2, "spark shuffles data across the cluster nodes"),
    ("c1", 3, "completely unrelated words here"),
    ("c2", 0, "alpha beta gamma"),
    ("c2", 1, "alpha beta gamma delta"),
    ("c2", 2, "zz yy xx"),
]


class TestTextrankTurns:
    def test_matches_python_twin(self, spark):
        got = sorted(
            (r.conv_id, r.turn_idx, r.score, r.rank)
            for r in textrank_turns(_turns(spark, ROWS)).collect()
        )
        want = _python_twin(ROWS)
        assert [(c, t, r) for c, t, s, r in got] == [
            (c, t, r) for c, t, s, r in want
        ]
        for (c, t, s, r), (_, _, ws, _) in zip(got, want):
            assert abs(s - ws) < 1e-9, (c, t, s, ws)

    def test_central_turn_ranks_first(self, spark):
        # c1 turn 2 shares tokens with both 0 and 1 -> most central
        got = {
            (r.conv_id, r.rank): r.turn_idx
            for r in textrank_turns(_turns(spark, ROWS)).collect()
        }
        assert got[("c1", 1)] in (0, 1, 2)
        # the disconnected turn 3 never enters c1's top-2
        assert got[("c1", 1)] != 3 and got[("c1", 2)] != 3

    def test_isolated_turns_score_zero_but_fill_short_convs(self, spark):
        rows = [("c9", 0, "aa bb"), ("c9", 1, "zz qq")]
        got = sorted(
            (r.turn_idx, r.score, r.rank)
            for r in textrank_turns(_turns(spark, rows)).collect()
        )
        # no edge: both isolated, scores 0, order by turn_idx
        assert got == [(0, 0.0, 1), (1, 0.0, 2)]

    def test_no_cross_conversation_edges(self, spark):
        # identical text in two conversations must not link them: each
        # conv's lone turn stays isolated (score 0)
        rows = [("a", 0, "same words here"), ("b", 0, "same words here")]
        got = textrank_turns(_turns(spark, rows)).collect()
        assert all(r.score == 0.0 for r in got)

    def test_partitioning_invariant(self, spark):
        df = _turns(spark, ROWS)
        a = sorted(
            (r.conv_id, r.turn_idx, r.rank)
            for r in textrank_turns(df.repartition(5)).collect()
        )
        b = sorted(
            (r.conv_id, r.turn_idx, r.rank)
            for r in textrank_turns(df.coalesce(1)).collect()
        )
        assert a == b

    def test_bad_top_k_rejected(self, spark):
        with pytest.raises(ValueError, match="top_k"):
            textrank_turns(_turns(spark, ROWS), top_k=0)
