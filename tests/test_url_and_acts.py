"""url_domain_stats (functions/textstats.py) and
dialogue_act_transitions (operators/conversation.py)."""

from nlp_series_relation_extraction_spark.functions.textstats import (
    url_domain_stats,
)
from nlp_series_relation_extraction_spark.operators.conversation import (
    dialogue_act_transitions,
)

TD = "doc_id long, text string"
TT = "conv_id string, turn_idx int, role string, text string"


def test_url_extraction_and_domain_normalization(spark):
    rows = [
        (1, "see https://www.Example.COM/a/b and http://example.com/c"),
        (2, "https://docs.example.com:8080/x?q=1 plus junk http://"),
        (3, "no links here"),
    ]
    out = {
        r.domain: (r.n_urls, r.n_docs)
        for r in url_domain_stats(spark.createDataFrame(rows, TD)).collect()
    }
    assert out["example.com"] == (2, 1)  # www stripped, case folded
    assert out["docs.example.com"] == (1, 1)  # port cut from host
    assert len(out) == 2


def test_url_trailing_punctuation_excluded(spark):
    rows = [(1, "wrapped (https://a.example/x) and quoted \"https://b.example/y\"")]
    out = {
        r.domain for r in url_domain_stats(
            spark.createDataFrame(rows, TD)
        ).collect()
    }
    assert out == {"a.example", "b.example"}


def test_act_transition_matrix(spark):
    rows = [
        ("c", 0, "user", "what is up?"),        # question
        ("c", 1, "assistant", "All good."),     # statement
        ("c", 2, "user", "please deploy"),      # command
        ("c", 3, "assistant", "Done."),         # statement
        ("d", 0, "user", "run tests"),          # command
        ("d", 1, "assistant", "They pass."),    # statement
    ]
    out = {
        (r.from_act, r.to_act): (r.n, r.prob)
        for r in dialogue_act_transitions(
            spark.createDataFrame(rows, TT)
        ).collect()
    }
    assert out[("question", "statement")] == (1, 1.0)
    assert out[("command", "statement")] == (2, 1.0)
    assert out[("statement", "command")][0] == 1
    # transitions never cross conversations: no ('statement','command')
    # from c3 -> d0
    assert sum(n for n, _ in out.values()) == 4
