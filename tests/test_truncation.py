"""max_len truncation parity with the reference (>200-token turns).

Reference semantics replicated (and pinned here):
* tokens bounded at max_len — mpn/mhs via encode(truncation=True) which
  keeps the [SEP] frame (dataset_mpn.py:160-163); BIO via a plain
  collate-time slice (dataset_baseline.py:180-186);
* labels planted over the FULL token list, then spans whose (inclusive)
  end index falls past max_len-1 are dropped: subjects at
  dataset_mpn.py:165-168/173-174, objects at :177-180, the mhs per-end
  filters at dataset_mhs.py:164-175 (object typed labels plant even when
  the subject is out of bounds; the cube entry needs BOTH ends in).
"""

import json

import pytest

from nlp_series_relation_extraction_spark.core.encoders import PlantedEncoder
from nlp_series_relation_extraction_spark.core.heads import HEADS, extract_row
from nlp_series_relation_extraction_spark.core.labeling import bio_token_labels

# CJK filler from a codepoint range disjoint from every entity char below
_FILLER = "".join(chr(0x5500 + i) for i in range(280))

W1, P1 = "梦影歌", "李伟芳"
W2, P2 = "星河传", "王敏洋"


def _spo(pred, subj, stype, obj, otype):
    return {
        "predicate": pred,
        "subject": subj,
        "subject_type": stype,
        "object": {"@value": obj},
        "object_type": {"@value": otype},
    }


def _long_text():
    """Triple 1 inside the first 200 tokens, triple 2 entirely past them."""
    head = f"《{W1}》是{P1}写的网络小说"
    tail = f"《{W2}》是{P2}写的网络小说"
    return head + _FILLER + tail


GOLD = [
    _spo("作者", W1, "图书作品", P1, "人物"),
    _spo("作者", W2, "图书作品", P2, "人物"),
]


@pytest.mark.parametrize("head", HEADS)
def test_out_of_bounds_triples_dropped_in_bounds_kept(head):
    text = _long_text()
    res = extract_row(head, text, json.dumps(GOLD), max_len=200)
    subjects = {s["subject"] for s in res["spo_list"]}
    objects = {s["object"]["@value"] for s in res["spo_list"]}
    assert W1 in subjects and P1 in objects, f"{head}: in-bounds triple lost"
    assert W2 not in subjects and P2 not in objects, (
        f"{head}: triple past max_len leaked through truncation"
    )


@pytest.mark.parametrize("head", HEADS)
def test_no_truncation_when_max_len_large(head):
    text = _long_text()
    res = extract_row(head, text, json.dumps(GOLD), max_len=2000)
    subjects = {s["subject"] for s in res["spo_list"]}
    assert {W1, W2} <= subjects


def test_bio_planted_plain_slice():
    text = _long_text()
    enc_full = bio_token_labels(text, GOLD)
    enc = bio_token_labels(text, GOLD, max_len=200)
    assert len(enc["tokens"]) == 200
    assert len(enc["labels"]) == 200
    assert len(enc["offset_mapping"]) == 200
    # plain slice (reference collate): prefix of the full encoding, the
    # final token is NOT forced to [SEP]
    assert enc["tokens"] == enc_full["tokens"][:200]
    assert enc["labels"] == enc_full["labels"][:200]


def test_mpn_planted_subject_and_object_bounds():
    pe = PlantedEncoder()
    text = _long_text()
    sub, enc = pe.mpn_planted(text, GOLD, max_len=200)
    L = len(enc["tokens"])
    assert L == 200 and enc["tokens"][-1] == "[SEP]"  # frame-preserving
    assert sub.shape[0] == 200
    # exactly the in-bounds subject span is planted
    assert sub[:, 0].sum() == 1.0 and sub[:, 1].sum() == 1.0
    # in-bounds subject whose object fell out of bounds gets no po labels
    in_subj = [s for s in enc["spoes"] if s[1] <= L - 1]
    po = pe.mpn_po_probs(enc, in_subj)
    for k, s in enumerate(in_subj):
        golds = [o for o in enc["spoes"][s] if o[1] <= L - 1]
        assert po[k].sum() == 2.0 * len(golds)


def test_mhs_object_labels_plant_even_when_subject_out_of_bounds():
    pe = PlantedEncoder()
    # subject late (out of bounds), object early (in bounds): reference
    # plants the object's typed span labels but no cube entry
    text = f"{P1}所写的作品在之后公布" + _FILLER + f"《{W2}》是其代表作"
    gold = [_spo("作者", W2, "图书作品", P1, "人物")]
    start, end, cube, enc = pe.mhs_planted(text, gold, max_len=200)
    assert start.shape[0] == 200
    assert start.sum() > 0 and end.sum() > 0  # object typed labels planted
    assert cube.sum() == 0  # but no pair survives


def test_truncation_fuzz_spans_always_in_bounds():
    """Property fuzz: for random mixed-script texts and random max_len,
    every head decodes without error in BOTH hash and planted mode, and
    every decoded mention is a substring of the (normalized) text — no
    span may reference tokens past the truncation boundary."""
    from hypothesis import given, settings, strategies as st

    from nlp_series_relation_extraction_spark.core.tokenization import (
        normalize_text,
    )

    cjk_word = st.text(
        alphabet=[chr(0x4E00 + i) for i in range(80)], min_size=2, max_size=5
    )
    ascii_word = st.from_regex(r"[a-z]{1,9}", fullmatch=True)
    digits = st.from_regex(r"[0-9]{1,8}", fullmatch=True)
    piece = st.one_of(cjk_word, ascii_word, digits)

    @settings(max_examples=30, deadline=None)
    @given(
        pieces=st.lists(piece, min_size=4, max_size=40),
        max_len=st.integers(min_value=8, max_value=64),
        si=st.integers(min_value=0, max_value=10**6),
        oi=st.integers(min_value=0, max_value=10**6),
    )
    def check(pieces, max_len, si, oi):
        subj = pieces[si % len(pieces)]
        obj = pieces[oi % len(pieces)]
        text = "，".join(pieces)
        gold = [
            {
                "predicate": "作者",
                "subject": subj,
                "subject_type": "图书作品",
                "object": {"@value": obj},
                "object_type": {"@value": "人物"},
            }
        ]
        for head in HEADS:
            for gj in (None, json.dumps(gold, ensure_ascii=False)):
                res = extract_row(head, text, gj, max_len=max_len)
                norm = normalize_text(text)
                for s in res["spo_list"]:
                    assert s["subject"] in norm
                    for v in s["object"].values():
                        assert v in norm

    check()


def test_spark_truncation_matches_row_oracle(spark):
    """The Arrow-batched Spark path and the per-row oracle agree on long
    texts through the truncation boundary (all four heads)."""
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_turn_results,
    )

    texts = [
        _long_text(),
        f"《{W1}》是{P1}写的网络小说" + _FILLER,        # in-bounds only
        _FILLER + f"《{W2}》是{P2}写的网络小说",        # out-of-bounds only
        f"《{W1}》是{P1}写的网络小说",                   # short
    ]
    golds = [GOLD, GOLD[:1], GOLD[1:], GOLD[:1]]
    rows = [
        ("c0", i, "user", t, None, None, json.dumps(g, ensure_ascii=False))
        for i, (t, g) in enumerate(zip(texts, golds))
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp, gold_json string",
    )
    for head in HEADS:
        spark_triples = {
            (r.turn_idx, r.predicate, r.subject, r.object["@value"])
            for r in extract_turn_results(
                df, head=head, planted=True, max_len=200
            )
            .selectExpr("turn_idx", "explode(triples) as spo")
            .select("turn_idx", "spo.predicate", "spo.subject", "spo.object")
            .collect()
        }
        oracle_triples = set()
        for i, (t, g) in enumerate(zip(texts, golds)):
            for s in extract_row(head, t, json.dumps(g), max_len=200)["spo_list"]:
                oracle_triples.add(
                    (i, s["predicate"], s["subject"], s["object"]["@value"])
                )
        assert spark_triples == oracle_triples, head
