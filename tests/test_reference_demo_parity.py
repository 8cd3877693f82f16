"""Parity on the reference's own demo data (data/duie_demon.json).

Planted-label extraction over the 4 demo sentences must recover EVERY gold
triple (recall 1.0) on all four heads. The span heads are also exact
(precision 1.0). The BIO head over-generates on sentence 0 — six 作者
triples share one predicate id, so decode's subject x object cross product
(reference utils/utils.py:221-229) emits 6x6 pairs plus 改编自 crosses;
that over-generation IS reference semantics and is pinned exactly.
"""

import json
import os

import pytest

from nlp_series_relation_extraction_spark.core.heads import HEADS, extract_row

DEMO = "/root/reference/data/duie_demon.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DEMO), reason="reference demo data not present"
)


def _canon(s):
    return (
        s["predicate"],
        s["subject"],
        json.dumps(s["object"], sort_keys=True, ensure_ascii=False),
    )


def _records():
    with open(DEMO, encoding="utf-8") as f:
        return [json.loads(line) for line in f]


@pytest.mark.parametrize("head", HEADS)
def test_recall_is_one_on_demo(head):
    for rec in _records():
        gold = rec.get("spo_list", [])
        pred = extract_row(
            head, rec["text"], gold_json=json.dumps(gold, ensure_ascii=False)
        )["spo_list"]
        pset = {_canon(s) for s in pred}
        missing = [g for g in map(_canon, gold) if g not in pset]
        assert not missing, (head, missing)


@pytest.mark.parametrize("head", ["mpn", "mhs", "biaffine"])
def test_span_heads_exact_on_demo(head):
    for rec in _records():
        gold = rec.get("spo_list", [])
        pred = extract_row(
            head, rec["text"], gold_json=json.dumps(gold, ensure_ascii=False)
        )["spo_list"]
        gset = sorted(_canon(s) for s in gold)
        assert sorted(_canon(s) for s in pred) == gset


def test_bio_cross_product_pinned_on_demo():
    recs = _records()
    counts = []
    for rec in recs:
        gold = rec.get("spo_list", [])
        pred = extract_row(
            "bio", rec["text"], gold_json=json.dumps(gold, ensure_ascii=False)
        )["spo_list"]
        counts.append(len(pred))
    # sentence 0: 58 = cross products over shared predicate ids;
    # sentences 1-3 are exact
    assert counts == [58, 1, 1, 2]
