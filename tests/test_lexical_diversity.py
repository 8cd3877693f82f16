"""lexical_diversity (functions/textstats.py): TTR / hapax / Yule's K
integer arithmetic and the empty-text contract."""

from nlp_series_relation_extraction_spark.functions.textstats import (
    lexical_diversity,
)

T = "doc_id long, text string"


def _rows(spark, rows):
    return {
        r.doc_id: r
        for r in lexical_diversity(spark.createDataFrame(rows, T)).collect()
    }


def test_known_counts(spark):
    out = _rows(spark, [(1, "a b a c a b")])
    r = out[1]
    # tokens: a×3 b×2 c×1 -> N=6, V=3, hapax=1, S2=9+4+1=14
    assert (r.n_tokens, r.n_types) == (6, 3)
    assert r.ttr_ppm == 500_000
    assert r.hapax_ppm == 333_333
    # K_centi = 1e6*(14-6) div 36 = 222222
    assert r.yule_k_centi == 222_222


def test_all_distinct_and_all_same(spark):
    out = _rows(spark, [(1, "w x y z"), (2, "q q q q")])
    assert out[1].ttr_ppm == 1_000_000 and out[1].hapax_ppm == 1_000_000
    assert out[1].yule_k_centi == 0  # S2 == N when every m == 1
    assert out[2].n_types == 1 and out[2].hapax_ppm == 0
    # one type, m=4: K_centi = 1e6*(16-4) div 16 = 750000
    assert out[2].yule_k_centi == 750_000


def test_empty_and_null_emit_no_row(spark):
    out = _rows(spark, [(1, ""), (2, None), (3, "  "), (4, "ok")])
    assert set(out) == {4}


def test_multiple_spaces_do_not_create_tokens(spark):
    out = _rows(spark, [(1, "a  b   a")])
    assert out[1].n_tokens == 3 and out[1].n_types == 2
