"""Two-stage (distributed subject fan-out) mpn == single-stage mpn."""

import json

from nlp_series_relation_extraction_spark.operators.extract import extract_triples
from nlp_series_relation_extraction_spark.operators.extract_mpn_twostage import (
    extract_triples_mpn_twostage,
)
from nlp_series_relation_extraction_spark.sources.synthetic import synth_transcripts


def _canon(rows):
    return sorted(
        (
            r.conv_id,
            r.turn_idx,
            r.predicate,
            r.subject,
            json.dumps(dict(r.object), sort_keys=True, ensure_ascii=False),
        )
        for r in rows
    )


def test_twostage_equals_singlestage(spark):
    t = synth_transcripts(spark, 150, seed=11, partitions=5)
    single = _canon(extract_triples(t, head="mpn", planted=False).collect())
    double = _canon(
        extract_triples_mpn_twostage(t, num_partitions=7).collect()
    )
    assert double == single and len(single) > 20
