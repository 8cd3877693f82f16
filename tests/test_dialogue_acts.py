"""tag_dialogue_acts (operators/conversation.py): DAMSL-lite cue
cascade — rule precedence, fall-through, null handling."""

from nlp_series_relation_extraction_spark.operators.conversation import (
    tag_dialogue_acts,
)

T = "conv_id string, turn_idx int, role string, text string"


def _tag(spark, text):
    df = tag_dialogue_acts(
        spark.createDataFrame([("c", 0, "user", text)], T)
    )
    return df.collect()[0].dialogue_act


def test_question_forms(spark):
    assert _tag(spark, "What time is it?") == "question"
    assert _tag(spark, "is this correct") == "question"
    assert _tag(spark, "the plan works, right?") == "question"


def test_command_forms(spark):
    assert _tag(spark, "Deploy the service now") == "command"
    assert _tag(spark, "please restart the worker") == "command"


def test_agreement_and_rejection(spark):
    assert _tag(spark, "yes, that works") == "agreement"
    assert _tag(spark, "OK sounds good") == "agreement"
    assert _tag(spark, "no, that breaks prod") == "rejection"


def test_statement_fallthrough(spark):
    assert _tag(spark, "The deploy finished at noon.") == "statement"
    assert _tag(spark, "") == "statement"
    assert _tag(spark, None) == "statement"


def test_first_match_wins_question_over_command(spark):
    # starts with an interrogative AND ends with '?' -> question, and a
    # command-looking turn ending in '?' is a question (cascade order)
    assert _tag(spark, "run the tests?") == "question"


def test_case_and_whitespace_insensitive(spark):
    assert _tag(spark, "   YES   ") == "agreement"
    assert _tag(spark, "WHAT happened") == "question"


def test_dialogue_act_profile_shares(spark):
    from nlp_series_relation_extraction_spark.operators.conversation import (
        dialogue_act_profile,
    )

    rows = [
        ("c", 0, "user", "what is up?"),
        ("c", 1, "assistant", "All good."),
        ("c", 2, "user", "please deploy"),
        ("c", 3, "assistant", "Done."),
    ]
    out = {
        (r.role, r.dialogue_act): (r.n, r.share_ppm)
        for r in dialogue_act_profile(
            spark.createDataFrame(rows, T)
        ).collect()
    }
    assert out[("user", "question")] == (1, 500000)
    assert out[("user", "command")] == (1, 500000)
    assert out[("assistant", "statement")] == (2, 1000000)


def test_mine_sft_pairs_adjacency_and_floors(spark):
    from nlp_series_relation_extraction_spark.operators.conversation import (
        mine_sft_pairs,
    )

    rows = [
        # kept: question user turn -> assistant response
        ("a", 0, "user", "what does the flag do?"),
        ("a", 1, "assistant", "It enables verbose logging."),
        # dropped: statement user turn
        ("a", 2, "user", "the build finished okay today"),
        ("a", 3, "assistant", "Great, merging the branch now."),
        # dropped: next turn is not assistant
        ("b", 0, "user", "please restart the worker"),
        ("b", 1, "tool", "worker restarted pid 4242 ok"),
        # dropped: response under the 16-char floor
        ("b", 2, "user", "run the tests now please"),
        ("b", 3, "assistant", "done"),
        # dropped: instruction under the 8-char floor
        ("b", 4, "user", "go?"),
        ("b", 5, "assistant", "Started the deploy pipeline."),
    ]
    got = mine_sft_pairs(spark.createDataFrame(rows, T)).collect()
    assert len(got) == 1
    p = got[0]
    assert (p.conv_id, p.turn_idx, p.instruction_act) == ("a", 0, "question")
    assert p.instruction == "what does the flag do?"
    assert p.response == "It enables verbose logging."
