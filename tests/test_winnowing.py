"""winnowing_fingerprints (functions/textstats.py): exact equivalence
with a direct per-document reference implementation, the coverage
guarantee, and edge contracts."""

import hashlib

from nlp_series_relation_extraction_spark.functions.textstats import (
    winnowing_fingerprints,
)

T = "doc_id long, text string"


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:7], 16)


def _winnow_ref(text: str, k: int, w: int):
    """Straight-from-the-paper sequential winnowing (rightmost min)."""
    if text is None or len(text) < k:
        return set()
    hs = [_h(text[i : i + k]) for i in range(len(text) - k + 1)]
    n = len(hs)
    out = set()
    if n < w:
        m = min(hs)
        p = max(i for i, x in enumerate(hs) if x == m)
        return {(p + 1, m)}
    for start in range(0, n - w + 1):
        win = hs[start : start + w]
        m = min(win)
        p = start + max(i for i, x in enumerate(win) if x == m)
        out.add((p + 1, hs[p]))
    return out


def _spark_fps(spark, rows, k=8, w=4):
    got = winnowing_fingerprints(
        spark.createDataFrame(rows, T), k=k, w=w
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.hash))
    return by_doc


def test_matches_reference_implementation(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "abcabcabcabcabcabc"),
        (3, "a systematic winnowing of k-gram hashes into prints"),
        (4, "zzzzzzzzzzzzzzzzzzzz"),
    ]
    for k, w in [(8, 4), (5, 3), (3, 5)]:
        got = _spark_fps(spark, texts, k=k, w=w)
        for doc_id, text in texts:
            assert got.get(doc_id, set()) == _winnow_ref(text, k, w), (
                doc_id, k, w,
            )


def test_coverage_guarantee_shared_substring(spark):
    # docs sharing a substring of length >= k + w - 1 share a print
    shared = "unmistakable-shared-run-of-text"
    rows = [(1, "xxxx " + shared + " yyyy"), (2, "aa " + shared + " bb")]
    k, w = 8, 4
    assert len(shared) >= k + w - 1
    got = _spark_fps(spark, rows, k=k, w=w)
    h1 = {h for _, h in got[1]}
    h2 = {h for _, h in got[2]}
    assert h1 & h2


def test_short_docs(spark):
    rows = [(1, "abc"), (2, ""), (3, None), (4, "abcdefgh")]
    got = _spark_fps(spark, rows, k=8, w=4)
    # only doc 4 has >= k chars; exactly one k-gram -> one print at pos 1
    assert set(got) == {4}
    assert got[4] == {(1, _h("abcdefgh"))}


def test_bad_params_raise(spark):
    import pytest

    df = spark.createDataFrame([(1, "abc")], T)
    with pytest.raises(ValueError, match="bad k"):
        winnowing_fingerprints(df, k=0, w=4)
