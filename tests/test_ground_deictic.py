"""ground_deictic (operators/conversation.py): first/second-person triple
subjects rewritten to speaker / addressee — hand-computed conversations."""

from nlp_series_relation_extraction_spark.operators.conversation import (
    ground_deictic,
)

TURNS = "conv_id string, turn_idx int, role string"
TRIPLES = "conv_id string, turn_idx int, subj string, pred string, obj string"


def _run(spark, turns, triples, **kw):
    out = ground_deictic(
        spark.createDataFrame(triples, TRIPLES),
        spark.createDataFrame(turns, TURNS),
        **kw,
    )
    return {
        (r.conv_id, r.turn_idx, r.subj): (r.grounded_subj, r.grounding)
        for r in out.collect()
    }


def test_first_person_binds_own_role(spark):
    turns = [("c", 0, "user"), ("c", 1, "assistant")]
    triples = [("c", 0, "i", "likes", "x"), ("c", 1, "I", "did", "y")]
    got = _run(spark, turns, triples)
    assert got[("c", 0, "i")] == ("user", "first")
    assert got[("c", 1, "I")] == ("assistant", "first")  # case-insensitive


def test_second_person_binds_preceding_different_role(spark):
    turns = [("c", 0, "user"), ("c", 1, "assistant"), ("c", 2, "user")]
    triples = [("c", 1, "you", "said", "x"), ("c", 2, "your", "p", "o")]
    got = _run(spark, turns, triples)
    assert got[("c", 1, "you")] == ("user", "second")
    assert got[("c", 2, "your")] == ("assistant", "second")


def test_conversation_initial_you_binds_following_role(spark):
    # same-role run at the start: addressee falls forward to the first
    # different role that appears later
    turns = [("c", 0, "user"), ("c", 1, "user"), ("c", 2, "assistant")]
    triples = [("c", 0, "you", "p", "o"), ("c", 1, "you", "p", "o")]
    got = _run(spark, turns, triples)
    assert got[("c", 0, "you")] == ("assistant", "second")
    assert got[("c", 1, "you")] == ("assistant", "second")


def test_same_role_run_keeps_last_real_addressee(spark):
    # u a a : the second assistant turn still addresses the user
    turns = [("c", 0, "user"), ("c", 1, "assistant"), ("c", 2, "assistant")]
    triples = [("c", 2, "you", "p", "o")]
    got = _run(spark, turns, triples)
    assert got[("c", 2, "you")] == ("user", "second")


def test_mono_role_conversation_is_unresolved(spark):
    turns = [("c", 0, "user"), ("c", 1, "user")]
    triples = [("c", 1, "you", "p", "o")]
    got = _run(spark, turns, triples)
    assert got[("c", 1, "you")] == ("you", "unresolved")


def test_non_deictic_passthrough_and_missing_turn(spark):
    turns = [("c", 0, "user")]
    triples = [
        ("c", 0, "alice", "knows", "bob"),
        ("c", 9, "i", "p", "o"),  # turn missing from turns table
    ]
    got = _run(spark, turns, triples)
    assert got[("c", 0, "alice")] == ("alice", "none")
    assert got[("c", 9, "i")] == ("i", "unresolved")


def test_conversations_isolated(spark):
    # addressee never leaks across conv_id
    turns = [("a", 0, "user"), ("b", 0, "tool"), ("b", 1, "assistant")]
    triples = [("a", 0, "you", "p", "o"), ("b", 1, "you", "p", "o")]
    got = _run(spark, turns, triples)
    assert got[("a", 0, "you")] == ("you", "unresolved")
    assert got[("b", 1, "you")] == ("tool", "second")


def test_custom_pronoun_sets(spark):
    turns = [("c", 0, "user"), ("c", 1, "assistant")]
    triples = [("c", 1, "我", "p", "o")]  # 我
    got = _run(spark, turns, triples, first_person=("我",))
    assert got[("c", 1, "我")] == ("assistant", "first")
