"""Tokenizer parity with the reference's worked examples.

Golden fixtures (FIXTURES.md §4):
* dataset_mpn.py:110-123 — 《邪少兵王》…: identity offset maps, CLS/SEP frame.
* extract_chinese_and_punct.py:132 — mixed-script: CJK chars are separate
  units; digit runs and letter runs are units ("TGA90" -> "TGA","90").
"""

from nlp_series_relation_extraction_spark.core.tokenization import (
    is_cjk_or_punct,
    normalize_text,
    segment_units,
    tokenize_for_bio,
    tokenize_framed,
    tokenize_with_orig_index,
)

DEMO = "《邪少兵王》是冰火未央写的网络小说连载于旗峰天下"


def test_pure_cjk_identity_offsets():
    t = tokenize_with_orig_index(DEMO)
    n = len(DEMO)
    assert t.tokens == list(DEMO)
    assert t.tok_to_orig_start == list(range(n))
    assert t.tok_to_orig_end == list(range(n))


def test_framed_tokens_match_reference_worked_example():
    tokens, s, e = tokenize_framed(DEMO)
    assert tokens[0] == "[CLS]" and tokens[-1] == "[SEP]"
    assert tokens[1:-1] == list(DEMO)
    # reference worked example: tok_to_orig maps are 0..23 (24 chars)
    assert s == list(range(24)) and e == list(range(24))


def test_mixed_script_segmentation():
    # digit run flushed by letter->digit transition and by punctuation
    assert segment_units("TGA90%～95%，TPO") == [
        "TGA", "90", "%", "～", "95", "%", "，", "TPO",
    ]
    # digit->letter transition flushes the digit buffer
    assert segment_units("90abc12") == ["90", "abc", "12"]
    # CJK chars are individual units even when embedded
    assert segment_units("高滴度TGA90") == ["高", "滴", "度", "TGA", "90"]


def test_char_class_membership():
    assert is_cjk_or_punct("～")  # 0xFF5E in CN punct list
    assert is_cjk_or_punct("~")  # ASCII tilde 0x7E in EN punct range 0x7B-0x7E
    assert is_cjk_or_punct(" ")  # 0x0020 listed as CN punct
    assert is_cjk_or_punct("（") and is_cjk_or_punct("(")
    assert not is_cjk_or_punct("a") and not is_cjk_or_punct("9")


def test_space_produces_no_token_but_advances_offsets():
    t = tokenize_with_orig_index("冰 火")
    assert t.tokens == ["冰", "火"]
    assert t.tok_to_orig_start == [0, 2]
    assert t.tok_to_orig_end == [0, 2]


def test_offsets_span_units_for_runs():
    t = tokenize_with_orig_index("看TGA90次")
    # units: 看 TGA 90 次 -> tokens 看,tga,90,次
    assert t.tokens == ["看", "tga", "90", "次"]
    assert t.tok_to_orig_start == [0, 1, 4, 6]
    assert t.tok_to_orig_end == [0, 3, 5, 6]


def test_bio_offset_mapping_shape():
    tokens, offsets = tokenize_for_bio("看TGA90次")
    assert tokens[0] == "[CLS]" and offsets[0] == (0, 0)
    assert tokens[-1] == "[SEP]" and offsets[-1] == (0, 0)
    assert offsets[1:-1] == [(0, 1), (1, 4), (4, 6), (6, 7)]


def test_normalize_strips_marker_chars():
    assert normalize_text("检®测◆值") == "检测值"


def test_nbsp_kept_inside_letter_runs():
    # \xa0 inside a letter run stays in the unit (mention slices will carry
    # it until the decode-side strip); standalone \xa0 unit yields no token
    t = tokenize_with_orig_index("ab\xa0cd")
    assert t.tokens == ["ab\xa0c", "##d"]  # 5-char unit -> wordpiece split
    assert "".join(t.tokens).replace("##", "") == "ab\xa0cd"
    t2 = tokenize_with_orig_index("冰\xa0火")
    assert t2.tokens == ["冰", "火"]


def test_multi_subtoken_units_share_unit_char_span():
    """The reference's tokenizer.tokenize(unit) can emit several sub-tokens,
    ALL recording the unit's char span (data_utils.py:104-108). Long English
    words and digit runs must exercise that shape here too."""
    text = "看playing2008080812次"
    t = tokenize_with_orig_index(text)
    # units: 看 | playing | 2008080812 | 次
    assert t.tokens == [
        "看", "play", "##ing", "2008", "##0808", "##12", "次",
    ]
    # every sub-token of a unit carries the unit's full char span
    assert t.tok_to_orig_start == [0, 1, 1, 8, 8, 8, 18]
    assert t.tok_to_orig_end == [0, 7, 7, 17, 17, 17, 18]
    # an entity that is one of these units tokenizes to the same sub-token
    # run, so subsequence search still locates it
    ent = tokenize_with_orig_index("playing")
    assert ent.tokens == ["play", "##ing"]
    i = t.tokens.index(ent.tokens[0])
    assert t.tokens[i : i + len(ent.tokens)] == ent.tokens
