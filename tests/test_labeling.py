"""Label-planting semantics: subsequence search, overlap forbidding, spans."""

from nlp_series_relation_extraction_spark.config import BAIDU_RELATION, PREDICATE2ID
from nlp_series_relation_extraction_spark.core.labeling import (
    bio_token_labels,
    search,
    search_spo_index,
    span_gold_spoes,
)


def test_search_first_match():
    assert search(["b", "c"], ["a", "b", "c", "b", "c"]) == 1
    assert search(["x"], ["a", "b"]) == -1
    assert search(["a"], []) == -1


def test_search_spo_index_longest_first_overlap_forbidden():
    # subject longer: located first; object must avoid its span
    tokens = ["[CLS]", "x", "y", "z", "x", "y", "[SEP]"]
    s, o = search_spo_index(tokens, ["x", "y", "z"], ["x", "y"])
    assert (s, o) == (1, 4)
    # object longer: symmetric
    s, o = search_spo_index(tokens, ["x", "y"], ["x", "y", "z"])
    assert (s, o) == (4, 1)
    # shorter not findable outside the longer's span -> -1
    tokens2 = ["[CLS]", "x", "y", "z", "[SEP]"]
    s, o = search_spo_index(tokens2, ["x", "y", "z"], ["x", "y"])
    assert (s, o) == (1, -1)


def test_worked_example_spoes():
    # reference dataset_mpn.py:110-123 golden fixture
    text = "《邪少兵王》是冰火未央写的网络小说连载于旗峰天下"
    gold = [
        {
            "predicate": "作者",
            "object_type": {"@value": "人物"},
            "subject_type": "图书作品",
            "object": {"@value": "冰火未央"},
            "subject": "邪少兵王",
        }
    ]
    enc = span_gold_spoes(text, gold)
    assert enc["spoes"] == {(2, 5): [(8, 11, BAIDU_RELATION["作者"])]}
    assert enc["sub_entity_list"] == ["邪少兵王"]


def test_nary_affiliated_slot_rerooted():
    # 获奖 inWork slot's "subject" becomes the @value object (award)
    text = "张三凭借《大江》于2001年1月2日获得金像奖"
    gold = [
        {
            "predicate": "获奖",
            "subject": "张三",
            "subject_type": "娱乐人物",
            "object": {"@value": "金像奖", "inWork": "大江", "onDate": "2001年1月2日"},
            "object_type": {"@value": "奖项", "inWork": "作品", "onDate": "Date"},
        }
    ]
    enc = span_gold_spoes(text, gold)
    award_spans = [
        s for s, olist in enc["spoes"].items()
        if any(p in (25, 26) for *_, p in olist)
    ]
    # the award span (金像奖) roots the inWork and onDate slot objects
    assert len(award_spans) == 1
    preds = sorted(p for *_, p in enc["spoes"][award_spans[0]])
    assert preds == [25, 26]
    # and 张三's own span roots the @value triple (获奖_@value = 24)
    main = [olist for s, olist in enc["spoes"].items() if s not in award_spans]
    assert any(p == 24 for olist in main for *_, p in olist)


def test_bio_labels_overlap_forbidding():
    # subject == object string: object (equal length -> planted first per
    # longest-first tie-break) takes the first occurrence, subject the second
    text = "《大江》改编自《大江》"
    gold = [
        {
            "predicate": "改编自",
            "subject": "大江",
            "subject_type": "影视作品",
            "object": {"@value": "大江"},
            "object_type": {"@value": "作品"},
        }
    ]
    enc = bio_token_labels(text, gold)
    k = PREDICATE2ID["改编自"]
    labels = enc["labels"]
    # tokens: [CLS] 《 大 江 》 改 编 自 《 大 江 》 [SEP]
    assert labels[2][k + 55] == 1  # first 大 -> object
    assert labels[9][k] == 1  # second 大 -> subject
    assert labels[3][1] == 1 and labels[10][1] == 1  # I continuations
    # untouched tokens carry O
    assert labels[5][0] == 1


def test_bio_labels_nary_slots_expand():
    text = "张三于2001年1月2日获得金像奖"
    gold = [
        {
            "predicate": "获奖",
            "subject": "张三",
            "subject_type": "娱乐人物",
            "object": {"@value": "金像奖", "onDate": "2001年1月2日"},
            "object_type": {"@value": "奖项", "onDate": "Date"},
        }
    ]
    enc = bio_token_labels(text, gold)
    labels = enc["labels"]
    k_val = PREDICATE2ID["获奖_@value"]
    k_date = PREDICATE2ID["获奖_onDate"]
    fired = {
        j for row in labels for j in range(len(row)) if row[j] == 1
    }
    assert {k_val, k_val + 55, k_date, k_date + 55} <= fired
