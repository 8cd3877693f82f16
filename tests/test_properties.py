"""Property-based invariants (hypothesis) for the tokenizer and search."""

from hypothesis import given, settings, strategies as st

from nlp_series_relation_extraction_spark.core.labeling import (
    search,
    search_spo_index,
)
from nlp_series_relation_extraction_spark.core.tokenization import (
    segment_units,
    tokenize_for_bio,
    tokenize_with_orig_index,
)

# mix of CJK, ASCII letters/digits, CJK+ASCII punctuation and whitespace noise
_alphabet = st.sampled_from(
    list("中文测试天地人王国演义abcXYZ0123456789 ，。《》()%～\xa0®◆")
)
texts = st.text(alphabet=_alphabet, min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_segmentation_partitions_text(text):
    # units concatenate back to the exact input (no char lost or duplicated)
    assert "".join(segment_units(text)) == text


@settings(max_examples=200, deadline=None)
@given(texts)
def test_offset_maps_are_valid_spans(text):
    t = tokenize_with_orig_index(text)
    assert len(t.tokens) == len(t.tok_to_orig_start) == len(t.tok_to_orig_end)
    prev_start = -1
    for s, e in zip(t.tok_to_orig_start, t.tok_to_orig_end):
        assert 0 <= s <= e < len(text)
        assert s >= prev_start  # non-decreasing starts
        prev_start = s
        # the token's unit text contains the token (modulo lowercasing)
        unit = text[s : e + 1]
        assert unit.lower() != "" and unit != ""


@settings(max_examples=200, deadline=None)
@given(texts)
def test_bio_offsets_frame_shape(text):
    tokens, offsets = tokenize_for_bio(text)
    assert tokens[0] == "[CLS]" and tokens[-1] == "[SEP]"
    assert offsets[0] == (0, 0) and offsets[-1] == (0, 0)
    for s, e in offsets[1:-1]:
        assert 0 <= s < e <= len(text)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=12),
    st.lists(st.sampled_from(list("abcde")), min_size=1, max_size=4),
)
def test_search_matches_naive(seq, pat):
    naive = -1
    for i in range(len(seq) - len(pat) + 1):
        if seq[i : i + len(pat)] == pat:
            naive = i
            break
    assert search(pat, seq) == naive


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.sampled_from(list("abc")), min_size=2, max_size=14),
    st.lists(st.sampled_from(list("abc")), min_size=1, max_size=3),
    st.lists(st.sampled_from(list("abc")), min_size=1, max_size=3),
)
def test_search_spo_index_invariants(tokens, subj, obj):
    s, o = search_spo_index(tokens, subj, obj)
    # returned indices really match the sequences
    if s != -1:
        assert tokens[s : s + len(subj)] == subj
    if o != -1:
        assert tokens[o : o + len(obj)] == obj
    # when both found, the shorter one's start avoids the longer one's span
    if s != -1 and o != -1:
        if len(subj) > len(obj):
            assert not (s <= o < s + len(subj))
        elif len(obj) > len(subj):
            assert not (o <= s < o + len(obj))


_weird = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",)  # no lone surrogates (invalid UTF-8)
    ),
    min_size=0,
    max_size=80,
)


@settings(max_examples=150, deadline=None)
@given(_weird)
def test_extraction_never_crashes_on_arbitrary_text(text):
    from nlp_series_relation_extraction_spark.core.heads import HEADS, extract_row

    for head in HEADS:
        res = extract_row(head, text, max_len=64)
        assert isinstance(res["spo_list"], list)
        assert isinstance(res["entity_list"], list)


_cjk_texts = st.text(
    alphabet=st.sampled_from(list("甲乙丙丁戊己庚辛壬癸《》，。abc123")),
    min_size=1,
    max_size=30,
)
_entities = st.text(
    alphabet=st.sampled_from(list("甲乙丙丁戊")), min_size=1, max_size=4
)


@settings(max_examples=150, deadline=None)
@given(_cjk_texts, _entities, _entities)
def test_bio_labels_shape_and_search_consistency(text, subj, obj):
    from nlp_series_relation_extraction_spark.config import (
        BIO_NUM_LABELS,
        PREDICATE2ID,
    )
    from nlp_series_relation_extraction_spark.core.labeling import (
        bio_token_labels,
    )

    gold = [{
        "predicate": "作者", "subject": subj, "subject_type": "图书作品",
        "object": {"@value": obj}, "object_type": {"@value": "人物"},
    }]
    enc = bio_token_labels(text, gold)
    labels = enc["labels"]
    assert len(labels) == len(enc["tokens"]) == len(enc["offset_mapping"])
    assert all(len(row) == BIO_NUM_LABELS for row in labels)
    # every token carries at least one label (O backfill)
    assert all(any(row) for row in labels)
    k = PREDICATE2ID["作者"]
    subj_planted = any(row[k] for row in labels)
    obj_planted = any(row[k + 55] for row in labels)
    # labels planted ONLY when the entity's tokens occur in the text tokens
    from nlp_series_relation_extraction_spark.core.labeling import search
    from nlp_series_relation_extraction_spark.core.tokenization import (
        tokenize_with_orig_index,
    )

    toks = enc["tokens"]
    if subj_planted:
        assert search(tokenize_with_orig_index(subj).tokens, toks) != -1
    if obj_planted:
        assert search(tokenize_with_orig_index(obj).tokens, toks) != -1


@settings(max_examples=150, deadline=None)
@given(_cjk_texts, _entities, _entities)
def test_span_gold_spoes_spans_match_tokens(text, subj, obj):
    from nlp_series_relation_extraction_spark.core.labeling import (
        span_gold_spoes,
    )
    from nlp_series_relation_extraction_spark.core.tokenization import (
        tokenize_with_orig_index,
    )

    gold = [{
        "predicate": "作者", "subject": subj, "subject_type": "图书作品",
        "object": {"@value": obj}, "object_type": {"@value": "人物"},
    }]
    enc = span_gold_spoes(text, gold)
    toks = enc["tokens"]
    subj_toks = tokenize_with_orig_index(subj).tokens
    for (s0, s1), olist in enc["spoes"].items():
        # the subject span really covers the subject's token run
        assert toks[s0 : s1 + 1] == subj_toks
        for o0, o1, p in olist:
            assert toks[o0 : o1 + 1] == tokenize_with_orig_index(obj).tokens
