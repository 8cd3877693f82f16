"""SKOS vocabulary quality assurance over published concept schemes.

Enterprise KGs organize entities under SKOS taxonomies
(https://www.w3.org/TR/skos-reference/), and the spec states integrity
conditions a publication pipeline must gate on. This module compiles
the checkable ones into one flat violation report — same
report-not-exception contract as ``operators/shacl.py`` and the
``ontology`` consistency rules.

Input is the parsed term-aware frame ``sources.rdf.parse_ntriples``
emits (``subj, predicate, obj, obj_kind, lang``) because the label
rules need language tags; hierarchy rules read only the IRI columns.

Rules (``(rule, subj, detail)`` rows):

- ``multi-pref-label`` — S14: at most one ``skos:prefLabel`` per
  language per concept. Detail = the duplicated tag.
- ``broader-cycle`` — the hierarchy must be acyclic (spec §8.6.3
  leaves cycles legal but flags them as modelling errors every
  published checker reports). A concept is in a cycle iff the
  ``skos:broader`` transitive closure contains both (a,b) and (b,a)
  — including a=b. Detail = the cycle partner.
- ``related-broader-clash`` — S27: ``skos:related`` is disjoint with
  ``skos:broaderTransitive``. Reported in the related pair's BOTH
  orientations that clash (related is symmetric per S23). Detail =
  the other concept.
- ``orphan-concept`` — a concept ``skos:inScheme`` a scheme with
  neither a ``skos:broader`` nor a ``skos:topConceptOf`` assertion:
  unreachable from the scheme's tree. Detail = the scheme.
- ``top-with-broader`` — a ``skos:topConceptOf`` concept that also
  asserts ``skos:broader`` (it is not a top). Detail = the scheme.

Scale shape: label rule = one hash aggregate keyed (concept, lang);
hierarchy closure reuses :func:`..ontology.owl_transitive_entailment`
(predicate-keyed doubling fixpoint — taxonomies are shallow, so a
handful of rounds); cycle/clash checks are equi-joins on the closure;
orphan/top checks are anti-joins/semi-joins on the concept set.
Nothing quadratic beyond the closure itself, whose size is bounded by
depth x edges, not edges^2, on tree-like data.
"""

from __future__ import annotations

from ..functions.smalldf import local_df

from pyspark.sql import DataFrame, functions as F

PREF_LABEL = "skos:prefLabel"
BROADER = "skos:broader"
RELATED = "skos:related"
IN_SCHEME = "skos:inScheme"
TOP_CONCEPT_OF = "skos:topConceptOf"


def skos_report(parsed: DataFrame) -> DataFrame:
    """Validate a SKOS graph (parsed term frame) — see module doc."""
    from .ontology import owl_transitive_entailment

    def flat(df: DataFrame, rule: str, detail) -> DataFrame:
        return df.select(
            F.lit(rule).alias("rule"),
            F.col("subj"),
            detail.cast("string").alias("detail"),
        )

    reports: list[DataFrame] = []

    # S14: one prefLabel per language per concept
    labels = parsed.where(
        F.col("predicate") == PREF_LABEL
    ).select("subj", "obj", "lang").distinct()
    dup = (
        labels.where(F.col("lang").isNotNull() & (F.col("lang") != ""))
        .groupBy("subj", "lang")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )
    reports.append(flat(dup, "multi-pref-label", F.col("lang")))

    # broader closure once, shared by the cycle and S27 checks
    broader = parsed.where(F.col("predicate") == BROADER).select(
        "subj", "predicate", "obj"
    )
    onto = local_df(
        parsed.sparkSession,
        [(BROADER, "transitiveProperty", BROADER)],
        "s string, p string, o string",
    )
    closure = owl_transitive_entailment(broader, onto).select(
        "subj", "obj"
    )
    rev = closure.select(
        F.col("obj").alias("subj"), F.col("subj").alias("obj")
    )
    cyc = closure.join(rev, ["subj", "obj"]).distinct()
    reports.append(flat(cyc, "broader-cycle", F.col("obj")))

    # S27: related x broaderTransitive disjointness, both orientations
    related = parsed.where(F.col("predicate") == RELATED).select(
        "subj", "obj"
    )
    sym = related.unionByName(
        related.select(F.col("obj").alias("subj"),
                       F.col("subj").alias("obj"))
    ).distinct()
    clash = sym.join(closure, ["subj", "obj"])
    reports.append(flat(clash, "related-broader-clash", F.col("obj")))

    # orphans and false tops
    in_scheme = parsed.where(F.col("predicate") == IN_SCHEME).select(
        "subj", F.col("obj").alias("scheme")
    ).distinct()
    tops = parsed.where(F.col("predicate") == TOP_CONCEPT_OF).select(
        "subj", F.col("obj").alias("scheme")
    ).distinct()
    has_broader = broader.select("subj").distinct()
    orphan = (
        in_scheme.join(has_broader, "subj", "left_anti")
        .join(tops.select("subj"), "subj", "left_anti")
    )
    reports.append(flat(orphan, "orphan-concept", F.col("scheme")))
    false_top = tops.join(has_broader, "subj", "left_semi")
    reports.append(flat(false_top, "top-with-broader", F.col("scheme")))

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.distinct()


def skos_report_python_twin(
    parsed: list[tuple],
) -> set[tuple[str, str, str]]:
    """Plain-Python oracle; rows (subj, predicate, obj, obj_kind,
    lang_or_None)."""
    rows = set(parsed)
    out: set[tuple[str, str, str]] = set()

    cnt: dict[tuple[str, str], set] = {}
    for s, p, o, _k, la in rows:
        if p == PREF_LABEL and la:
            cnt.setdefault((s, la), set()).add(o)
    for (s, la), vals in cnt.items():
        if len(vals) > 1:
            out.add(("multi-pref-label", s, la))

    broader = {(s, o) for s, p, o, _k, _la in rows if p == BROADER}
    closure = set(broader)
    while True:
        nxt = closure | {
            (a, d) for a, b in closure for c, d in broader if b == c
        }
        if nxt == closure:
            break
        closure = nxt
    for a, b in closure:
        if (b, a) in closure:
            out.add(("broader-cycle", a, b))

    related = {(s, o) for s, p, o, _k, _la in rows if p == RELATED}
    sym = related | {(o, s) for s, o in related}
    for a, b in sym:
        if (a, b) in closure:
            out.add(("related-broader-clash", a, b))

    has_broader = {s for s, _ in broader}
    tops = {(s, o) for s, p, o, _k, _la in rows if p == TOP_CONCEPT_OF}
    top_subj = {s for s, _ in tops}
    for s, p, o, _k, _la in rows:
        if p == IN_SCHEME and s not in has_broader and s not in top_subj:
            out.add(("orphan-concept", s, o))
    for s, sch in tops:
        if s in has_broader:
            out.add(("top-with-broader", s, sch))
    return out
