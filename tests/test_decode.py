"""Decode semantics unit tests: thresholds, pairing, guards, n-ary merge."""

import numpy as np

from nlp_series_relation_extraction_spark.config import BIO_NUM_LABELS, E_NUM, R_NUM
from nlp_series_relation_extraction_spark.core.decode_bio import (
    decode_bio_sentence,
    find_entities,
)
from nlp_series_relation_extraction_spark.core.decode_span import (
    convert_spoes_to_result,
    decode_pair_cube,
    decode_po_for_subject,
    decode_subject_spans,
    decode_typed_spans,
)


def _subject_probs(L, starts, ends):
    p = np.zeros((L, 2), dtype=np.float32)
    for i, v in starts:
        p[i, 0] = v
    for i, v in ends:
        p[i, 1] = v
    return p


def test_subject_thresholds_are_asymmetric_and_strict():
    # start must be > 0.6 (0.6 exactly fails), end > 0.5 (0.5 exactly fails)
    L = 8
    p = _subject_probs(L, [(2, 0.6)], [(3, 0.51)])
    assert decode_subject_spans(p, L) == []
    p = _subject_probs(L, [(2, 0.61)], [(3, 0.5)])
    assert decode_subject_spans(p, L) == []
    p = _subject_probs(L, [(2, 0.61)], [(3, 0.51)])
    assert decode_subject_spans(p, L) == [(2, 3)]


def test_subject_nearest_end_and_cls_sep_guards():
    L = 8
    # nearest end >= start wins
    p = _subject_probs(L, [(2, 0.9)], [(4, 0.9), (6, 0.9)])
    assert decode_subject_spans(p, L) == [(2, 4)]
    # no end >= start -> nothing
    p = _subject_probs(L, [(5, 0.9)], [(3, 0.9)])
    assert decode_subject_spans(p, L) == []
    # start at [CLS] (0) or beyond L-2 excluded
    p = _subject_probs(L, [(0, 0.9), (7, 0.9)], [(7, 0.9)])
    assert decode_subject_spans(p, L) == []
    # end at [SEP] (> L-2) excluded
    p = _subject_probs(L, [(5, 0.9)], [(7, 0.9)])
    assert decode_subject_spans(p, L) == []


def test_typed_span_type_agreement_uses_first_end():
    L = 6
    start = np.zeros((L, E_NUM + 1), dtype=np.float32)
    end = np.zeros((L, E_NUM + 1), dtype=np.float32)
    start[1, 3] = 0.9
    end[2, 5] = 0.9  # first following end has the WRONG type
    end[4, 3] = 0.9  # right type exists later but te[0] rules
    spans, end_list, _ = decode_typed_spans(start, end)
    assert spans == []
    # flip: first end matches -> span decoded
    end[2, 5] = 0.0
    end[2, 3] = 0.9
    spans, end_list, _ = decode_typed_spans(start, end)
    assert spans == [(1, 2)] and end_list == [2]


def test_po_decode_bounds_and_predicate_match():
    L, R = 8, R_NUM
    po = np.zeros((L, R, 2), dtype=np.float32)
    po[2, 7, 0] = 0.9  # start, predicate 7
    po[4, 7, 1] = 0.9  # end, same predicate
    po[5, 9, 1] = 0.9  # end, different predicate -> no pair with (2,7)
    out = decode_po_for_subject(po, L)
    assert out == [(2, 4, 7)]
    # start at 0 (CLS) ignored; end beyond L-2 ignored
    po2 = np.zeros((L, R, 2), dtype=np.float32)
    po2[0, 3, 0] = 0.9
    po2[2, 3, 1] = 0.9
    assert decode_po_for_subject(po2, L) == []
    po3 = np.zeros((L, R, 2), dtype=np.float32)
    po3[2, 3, 0] = 0.9
    po3[7, 3, 1] = 0.9  # L-1 > L-2
    assert decode_po_for_subject(po3, L) == []


def test_pair_cube_requires_known_ends():
    L = 6
    cube = np.zeros((L, L, R_NUM), dtype=np.float32)
    cube[2, 4, 10] = 0.9
    cube[3, 4, 10] = 0.9  # 3 is not a decoded end -> dropped
    spans = [(1, 2), (4, 4)]
    end_list = [2, 4]
    spoes = decode_pair_cube(cube, end_list, spans)
    assert spoes == {(1, 2): [(4, 4, 10)]}


def test_find_entities_span_growth_and_dedup():
    # tokens: a b c a -> labels: start id 5 at 0 and 3, I at 1
    L = 4
    m = np.zeros((L, BIO_NUM_LABELS), dtype=np.int8)
    m[0, 5] = 1
    m[1, 1] = 1
    m[3, 5] = 1
    offsets = [(0, 1), (1, 2), (2, 3), (3, 4)]
    text = "abca"
    ents = find_entities(text, 5, m, offsets)
    assert ents == sorted({"ab", "a"})


def test_bio_decode_requires_subject_and_object_twin():
    # a label k fires as relation only when k+55 also fired somewhere
    text = "甲乙丙丁"
    L = 6  # [CLS] + 4 + [SEP]
    probs = np.zeros((L, BIO_NUM_LABELS), dtype=np.float32)
    probs[1, 3] = 1.0  # subject id 3 (作者) on 甲
    res = decode_bio_sentence(text, probs, [(0, 0), (0, 1), (1, 2), (2, 3), (3, 4), (0, 0)])
    assert res["spo_list"] == []
    probs[3, 3 + 55] = 1.0  # object twin on 丙
    res = decode_bio_sentence(text, probs, [(0, 0), (0, 1), (1, 2), (2, 3), (3, 4), (0, 0)])
    assert res["spo_list"] == [
        {
            "predicate": "作者",
            "object": {"@value": "丙"},
            "object_type": {"@value": "人物"},
            "subject": "甲",
            "subject_type": "图书作品",
        }
    ]


def test_convert2result_nary_merge_and_nbsp_strip():
    # context chars: 0:张 1:三 2:\xa0 3:奖 4:品
    context = "张三\xa0奖品"
    tok_start = [0, 1, 2, 3, 4]
    tok_end = [0, 1, 2, 3, 4]
    # spans are [CLS]-framed (+1): subject 张三\xa0 = (1,3), award 奖 = (4,4),
    # inWork object 品 = (5,5)
    spoes = {
        (1, 3): [(4, 4, 24)],  # 获奖_@value
        (4, 4): [(5, 5, 25)],  # 获奖_inWork rooted at the award span
    }
    out = convert_spoes_to_result(context, spoes, tok_start, tok_end)
    # the affiliated row (predicate 25) must NOT emit its own triple
    assert len(out) == 1
    spo = out[0]
    assert spo["predicate"] == "获奖"
    assert spo["subject"] == "张三"  # \xa0 stripped
    assert spo["object"] == {"@value": "奖", "inWork": "品"}
    assert spo["object_type"] == {"@value": "奖项", "inWork": "作品"}


def test_convert2result_check_object_text_fallback():
    # object span (2,2) is not a subject key, but another span (4,4) has the
    # same mention text -> its po list provides the affiliated slot
    context = "甲乙丙乙丁"
    tok_start = [0, 1, 2, 3, 4]
    tok_end = [0, 1, 2, 3, 4]
    spoes = {
        (1, 1): [(3, 3, 6)],  # 上映时间_@value: object 乙 at (3,3)
        (5, 5): [],  # unrelated
        (4, 4): [(5, 5, 7)],  # span 乙 at (4,4) roots 上映时间_inArea
    }
    # (3,3) mention is 丙? chars: 1-indexed spans -> (3,3) = context[2]=丙.
    # make the fallback actually match: mention of (3,3) is 丙, of (4,4) is 乙
    # -> no match. Instead root the @value at (4,4)'s text twin (2,2)=乙? Use
    # direct construction: object span (2,2)=乙 not in spoes, (4,4)=乙 in spoes.
    spoes = {
        (1, 1): [(2, 2, 6)],  # object 乙 at (2,2)
        (4, 4): [(5, 5, 7)],  # 乙 at (4,4) carries the inArea slot
    }
    out = convert_spoes_to_result(context, spoes, tok_start, tok_end)
    main = [s for s in out if s["predicate"] == "上映时间"]
    assert len(main) == 1
    assert main[0]["object"] == {"@value": "乙", "inArea": "丁"}


def test_po_sorted_by_predicate_id():
    context = "甲乙丙丁戊"
    tok_start = [0, 1, 2, 3, 4]
    tok_end = [0, 1, 2, 3, 4]
    spoes = {(1, 1): [(3, 3, 40), (2, 2, 5)]}
    out = convert_spoes_to_result(context, spoes, tok_start, tok_end)
    assert [s["predicate"] for s in out] == ["主演", "董事长"]


def test_pair_subcube_path_equals_full_cube_path():
    """The hash-mode mhs/biaffine fast path (score only the span-end
    restriction of the pair cube) must decode EXACTLY like the full
    [L,L,R] cube — the restriction is a row subset of every op."""
    import json as _json

    from nlp_series_relation_extraction_spark.core.decode_span import (
        decode_pair_cube,
        decode_span_sentence,
        decode_typed_spans,
    )
    from nlp_series_relation_extraction_spark.core.heads import (
        _truncate,
        extract_mhs_row,
        get_hash_encoder,
    )
    from nlp_series_relation_extraction_spark.core.tokenization import (
        normalize_text,
        tokenize_framed,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import synth_pandas

    enc = get_hash_encoder(42)

    def full_cube_path(text, biaffine):
        text = normalize_text(text)
        tokens, ts, te = tokenize_framed(text)
        tokens = _truncate(tokens, 512)
        start, end = enc.typed_span_probs(tokens)
        cube = (
            enc.pair_cube_biaffine(tokens) if biaffine else enc.pair_cube(tokens)
        )
        spans, end_list, _ = decode_typed_spans(start, end, n_tokens=len(tokens))
        return decode_span_sentence(
            text, decode_pair_cube(cube, end_list, spans), ts, te, spans
        )

    for text in synth_pandas(60, seed=9)["text"]:
        for biaffine in (False, True):
            new = extract_mhs_row(text, None, 42, 512, biaffine=biaffine)
            old = full_cube_path(text, biaffine)
            assert _json.dumps(new, sort_keys=True) == _json.dumps(
                old, sort_keys=True
            )
