"""SHACL core validation over materialized KG triple tables.

The reference repo emits (subj, pred, obj) triples and scores them
against a gold standard (``evaluation/`` in this repo mirrors its
``utils/utils.py`` scorer); a production KG build additionally needs
DECLARATIVE quality gates on the merged graph — the W3C SHACL core
constraint components (https://www.w3.org/TR/shacl/). This module
validates a triple table against driver-declared node shapes and
returns a validation-report DataFrame (one row per violation, the
spec's ``sh:ValidationResult`` flattened to columns), never raising:
the report is something a pipeline gates on, exactly like
``ontology.different_from_violations``.

Supported constraint components (SHACL core §4):

- ``sh:minCount`` / ``sh:maxCount`` (§4.2) — cardinality per focus
  node and path, counting DISTINCT asserted values (the triple table
  is set-semantics; repeated extraction of one fact is one value).
- ``sh:class`` (§4.1.1) — every value must be an instance of the
  class per the ``types`` table.
- ``sh:hasValue`` (§4.5.2) — at least one value equals the constant.
- ``sh:in`` (§4.5.1) — every value drawn from an enumerated set.
- ``sh:pattern`` (§4.4.2) — every value matches a regex (Java/Spark
  syntax = DuckDB ``regexp_matches`` for the oracle-safe subset).
- ``sh:datatype`` (§4.1.2) — lexical-form conformance against the XSD
  lexical space (string triple store: datatype IS lexical form); the
  anchored regexes in ``_DATATYPE_LEXICAL`` are shared verbatim by
  the Spark plan, the SQL oracle, and the Python twin.
- ``sh:minLength`` / ``sh:maxLength`` (§4.4.1) — string length bounds.
- ``sh:minInclusive`` / ``sh:maxInclusive`` / ``sh:minExclusive`` /
  ``sh:maxExclusive`` (§4.3) — numeric range via SPARQL comparison;
  a value that does not parse as a number is "not comparable" and
  violates (try_cast NULL caught explicitly).
- ``sh:equals`` / ``sh:disjoint`` / ``sh:lessThan`` (§4.6) —
  property-pair constraints over the second path's focus-scoped value
  set: per-focus symmetric difference (two anti-joins), per-focus
  intersection (one equi-join), and the all-pairs comparison (a
  per-focus join — bounded by per-node fan-out, never data-sized).
- ``sh:closed`` + ``sh:ignoredProperties`` (§4.8.1, shape-level keys
  ``closed`` / ``ignored``) — any triple on a target focus outside the
  declared paths violates; one NOT-IN-filtered scan per shape.
- ``sh:nodeKind`` / ``sh:uniqueLang`` / ``sh:languageIn`` (§4.1.3 /
  §4.4.4 / §4.4.3) — these need term metadata a bare string store
  lacks, so they run in :func:`shacl_validate_terms` over the parsed
  frame ``sources.rdf.parse_ntriples`` emits (obj_kind + lang cols).

Shapes target instances of ``target_class`` (``sh:targetClass``).
Shapes are driver-side metadata (a real shapes graph is KB-sized, not
data-sized), so each property constraint COMPILES into a dedicated
narrow branch over the facts scan with the predicate pushed down;
violations union into one report.

Scale shape at 100 TB: one scan per (shape, path) branch with
``predicate = <path>`` pushed to parquet (predicate is the natural
partition column of an edge table, so these prune to one partition
each); cardinality branches aggregate (focus, path) counts —
map-side-combined, output bounded by #focus-nodes of that class;
value-test branches (in/pattern/hasValue-miss/class) are pure filters
plus, for ``sh:class``, one join against the types table keyed on the
value (broadcastable when the class's instance set is dimension-sized,
left as a hash join otherwise — Spark/AQE decides from stats). The
targets frame is computed once and reused across that shape's
branches. Nothing is quadratic; no windows over data-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_VALID_KEYS = {
    "path", "min_count", "max_count", "cls", "has_value", "in",
    "pattern", "datatype", "min_length", "max_length",
    "min_inclusive", "max_inclusive", "min_exclusive", "max_exclusive",
    "equals", "disjoint", "less_than",
}

# XSD 1.1 lexical spaces for sh:datatype (§4.1.2) on a string-typed
# triple store: datatype conformance IS lexical-form conformance.
# Anchored regexes shared verbatim by the Spark plan, the DuckDB
# oracle (regexp_matches) and the Python twin (re.search).
_DATATYPE_LEXICAL = {
    "xsd:integer": r"^[+-]?[0-9]+$",
    "xsd:decimal": r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$",
    "xsd:boolean": r"^(true|false|0|1)$",
    "xsd:date": r"^-?[0-9]{4}-[0-9]{2}-[0-9]{2}"
                r"(Z|[+-][0-9]{2}:[0-9]{2})?$",
    "xsd:dateTime": r"^-?[0-9]{4}-[0-9]{2}-[0-9]{2}"
                    r"T[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?"
                    r"(Z|[+-][0-9]{2}:[0-9]{2})?$",
}


def _validate_shapes(shapes: list[dict]) -> None:
    if not shapes:
        raise ValueError("shacl_validate: no shapes given")
    for sh in shapes:
        for req in ("shape", "target_class", "properties"):
            if req not in sh:
                raise ValueError(f"shape missing {req!r}: {sh!r}")
        unknown_shape = set(sh) - {
            "shape", "target_class", "properties", "closed", "ignored"
        }
        if unknown_shape:
            raise ValueError(
                f"shape {sh['shape']!r}: unsupported shape-level keys "
                f"{sorted(unknown_shape)}"
            )
        if "ignored" in sh and not sh.get("closed"):
            raise ValueError(
                f"shape {sh['shape']!r}: 'ignored' "
                "(sh:ignoredProperties) requires 'closed': True"
            )
        if not sh["properties"] and not sh.get("closed"):
            raise ValueError(
                f"shape {sh['shape']!r} declares no property constraints"
            )
        for prop in sh["properties"]:
            if "path" not in prop:
                raise ValueError(
                    f"shape {sh['shape']!r}: property constraint "
                    f"missing 'path': {prop!r}"
                )
            unknown = set(prop) - _VALID_KEYS
            if unknown:
                raise ValueError(
                    f"shape {sh['shape']!r} path {prop['path']!r}: "
                    f"unsupported constraint keys {sorted(unknown)}"
                )
            if len(prop) == 1:
                raise ValueError(
                    f"shape {sh['shape']!r} path {prop['path']!r}: "
                    "no constraint component given"
                )
            if "datatype" in prop and prop["datatype"] not in \
                    _DATATYPE_LEXICAL:
                raise ValueError(
                    f"shape {sh['shape']!r} path {prop['path']!r}: "
                    f"sh:datatype {prop['datatype']!r} not supported "
                    f"(have {sorted(_DATATYPE_LEXICAL)})"
                )


def shacl_validate(
    facts: DataFrame,
    types: DataFrame,
    shapes: list[dict],
) -> DataFrame:
    """Validate ``facts`` (subj, predicate, obj) + ``types`` (node, cls)
    against SHACL node shapes::

        {"shape": "CustomerShape",
         "target_class": "Customer",          # sh:targetClass
         "properties": [
             {"path": "hasName", "min_count": 1, "max_count": 1},
             {"path": "inNation", "cls": "Nation"},   # sh:class
             {"path": "inSegment",
              "in": ["seg/BUILDING", "seg/MACHINERY"]},  # sh:in
             {"path": "hasName", "pattern": "^Customer#"},  # sh:pattern
             {"path": "sourcedBy", "has_value": "tpch"},    # sh:hasValue
         ]}

    Returns the flattened validation report, one row per violation:
    ``(focus, shape, path, component, detail)`` where ``component``
    is the component name (``minCount`` / ``maxCount`` / ``class`` /
    ``in`` / ``pattern`` / ``hasValue``) and ``detail`` is the
    offending value (value-shaped components) or the observed distinct
    count as a string (cardinality components). Conforming data
    yields an empty frame — the report is the gate, never an
    exception."""
    _validate_shapes(shapes)
    reports: list[DataFrame] = []

    def report(df: DataFrame, shape: str, path: str, constraint: str,
               detail) -> DataFrame:
        return df.select(
            F.col("focus"),
            F.lit(shape).alias("shape"),
            F.lit(path).alias("path"),
            F.lit(constraint).alias("component"),
            detail.cast("string").alias("detail"),
        )

    for sh in shapes:
        name, cls = sh["shape"], sh["target_class"]
        targets = types.where(F.col("cls") == cls).select(
            F.col("node").alias("focus")
        ).distinct()
        for prop in sh["properties"]:
            path = prop["path"]
            # Focus-scoped distinct values of this path: one pushed-down
            # predicate filter, then the target semi-join keeps report
            # rows scoped to the shape's own focus nodes (SHACL only
            # validates targets, never the whole graph).
            vals = (
                facts.where(F.col("predicate") == path)
                .select(F.col("subj").alias("focus"),
                        F.col("obj").alias("value"))
                .distinct()
                .join(targets, "focus")
            )
            if "min_count" in prop or "max_count" in prop:
                counts = vals.groupBy("focus").agg(
                    F.count("*").cast("long").alias("n")
                )
                if "min_count" in prop:
                    mn = int(prop["min_count"])
                    # left join: a target with NO assertion has count 0
                    # (the common minCount violation is total absence).
                    under = (
                        targets.join(counts, "focus", "left")
                        .select(
                            "focus",
                            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
                        )
                        .where(F.col("n") < mn)
                    )
                    reports.append(
                        report(under, name, path, "minCount", F.col("n"))
                    )
                if "max_count" in prop:
                    mx = int(prop["max_count"])
                    over = counts.where(F.col("n") > mx)
                    reports.append(
                        report(over, name, path, "maxCount", F.col("n"))
                    )
            if "cls" in prop:
                inst = types.where(
                    F.col("cls") == prop["cls"]
                ).select(F.col("node").alias("value")).distinct()
                bad = vals.join(inst, "value", "left_anti")
                reports.append(
                    report(bad, name, path, "class", F.col("value"))
                )
            if "has_value" in prop:
                hv = str(prop["has_value"])
                holders = vals.where(F.col("value") == hv).select(
                    "focus"
                ).distinct()
                missing = targets.join(holders, "focus", "left_anti")
                reports.append(
                    report(missing, name, path, "hasValue", F.lit(hv))
                )
            if "in" in prop:
                allowed = [str(v) for v in prop["in"]]
                if not allowed:
                    raise ValueError(
                        f"shape {name!r} path {path!r}: sh:in needs a "
                        "non-empty value list"
                    )
                bad = vals.where(~F.col("value").isin(allowed))
                reports.append(
                    report(bad, name, path, "in", F.col("value"))
                )
            if "pattern" in prop:
                pat = str(prop["pattern"])
                bad = vals.where(~F.col("value").rlike(pat))
                reports.append(
                    report(bad, name, path, "pattern", F.col("value"))
                )
            if "datatype" in prop:
                # lexical-form check (§4.1.2): same anchored regex on
                # the Spark / DuckDB / Python sides
                rx = _DATATYPE_LEXICAL[prop["datatype"]]
                bad = vals.where(~F.col("value").rlike(rx))
                reports.append(
                    report(bad, name, path, "datatype", F.col("value"))
                )
            if "min_length" in prop:
                n = int(prop["min_length"])
                bad = vals.where(F.length("value") < n)
                reports.append(
                    report(bad, name, path, "minLength", F.col("value"))
                )
            if "max_length" in prop:
                n = int(prop["max_length"])
                bad = vals.where(F.length("value") > n)
                reports.append(
                    report(bad, name, path, "maxLength", F.col("value"))
                )
            # value-range components (§4.3): SPARQL comparison over the
            # numeric interpretation; a value that does not parse as a
            # number cannot satisfy the comparison -> violation (the
            # spec's "not comparable" case). try_cast keeps that NULL
            # under ANSI mode; NULL < x is NULL -> caught explicitly.
            num = F.col("value").try_cast("double")
            for key, comp, cname in (
                ("min_inclusive", lambda b: num < b, "minInclusive"),
                ("min_exclusive", lambda b: num <= b, "minExclusive"),
                ("max_inclusive", lambda b: num > b, "maxInclusive"),
                ("max_exclusive", lambda b: num >= b, "maxExclusive"),
            ):
                if key in prop:
                    bound = float(prop[key])
                    bad = vals.where(
                        num.isNull() | comp(F.lit(bound))
                    )
                    reports.append(
                        report(bad, name, path, cname, F.col("value"))
                    )
            # property-pair components (§4.6): the second path's
            # focus-scoped distinct values, computed like `vals`
            for pair_key in ("equals", "disjoint", "less_than"):
                if pair_key not in prop:
                    continue
                path2 = str(prop[pair_key])
                vals2 = (
                    facts.where(F.col("predicate") == path2)
                    .select(F.col("subj").alias("focus"),
                            F.col("obj").alias("value"))
                    .distinct()
                    .join(targets, "focus")
                )
                if pair_key == "equals":
                    # violation per value in the per-focus symmetric
                    # difference: two anti-joins on (focus, value)
                    only1 = vals.join(
                        vals2, ["focus", "value"], "left_anti"
                    )
                    only2 = vals2.join(
                        vals, ["focus", "value"], "left_anti"
                    )
                    bad = only1.unionByName(only2)
                    reports.append(
                        report(bad, name, path, "equals", F.col("value"))
                    )
                elif pair_key == "disjoint":
                    shared = vals.join(vals2, ["focus", "value"])
                    reports.append(
                        report(shared, name, path, "disjoint",
                               F.col("value"))
                    )
                else:  # less_than: every (v1, v2) pair must compare
                    pairs = vals.join(
                        vals2.withColumnRenamed("value", "value2"),
                        "focus",
                    )
                    v1 = F.col("value").try_cast("double")
                    v2 = F.col("value2").try_cast("double")
                    bad = pairs.where(
                        v1.isNull() | v2.isNull() | (v1 >= v2)
                    )
                    reports.append(
                        report(
                            bad, name, path, "lessThan",
                            F.concat(F.col("value"), F.lit("!<"),
                                     F.col("value2")),
                        )
                    )

        if sh.get("closed"):
            # sh:closed (§4.8.1): every triple on a target focus whose
            # predicate is neither a declared property path nor in
            # sh:ignoredProperties violates. ONE branch per shape: a
            # NOT-IN filter on the (small, compiled) allowed list, then
            # the target semi-join — the filter pushes to the scan, so
            # on a predicate-partitioned edge table this reads only
            # undeclared partitions.
            allowed = sorted(
                {str(p["path"]) for p in sh["properties"]}
                | {str(i) for i in sh.get("ignored", [])}
            )
            rogue = (
                facts.where(~F.col("predicate").isin(allowed))
                .select(
                    F.col("subj").alias("focus"),
                    F.col("predicate").alias("rogue_path"),
                    F.col("obj").alias("value"),
                )
                .distinct()
                .join(targets, "focus")
            )
            reports.append(
                rogue.select(
                    F.col("focus"),
                    F.lit(name).alias("shape"),
                    F.col("rogue_path").alias("path"),
                    F.lit("closed").alias("component"),
                    F.col("value").cast("string").alias("detail"),
                )
            )

    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


_NODE_KINDS = {
    "IRI": ("iri",),
    "Literal": ("literal",),
    "BlankNode": ("bnode",),
    "BlankNodeOrIRI": ("bnode", "iri"),
    "BlankNodeOrLiteral": ("bnode", "literal"),
    "IRIOrLiteral": ("iri", "literal"),
}

_TERM_KEYS = {"path", "node_kind", "unique_lang", "language_in"}


def shacl_validate_terms(
    parsed: DataFrame,
    types: DataFrame,
    shapes: list[dict],
) -> DataFrame:
    """SHACL components that need TERM metadata a bare string triple
    store lacks — run them over the parsed-RDF frame
    :func:`..sources.rdf.parse_ntriples` emits (``subj, predicate,
    obj, obj_kind, lang, ...`` with ``obj_kind`` in ``iri | bnode |
    literal`` and ``lang`` the literal's language tag or NULL):

    - ``sh:nodeKind`` (§4.1.3, key ``node_kind``): every value's kind
      must fall in the named class (all six spec members of
      ``_NODE_KINDS``). Detail = the offending value.
    - ``sh:uniqueLang`` (§4.4.4, key ``unique_lang: True``): no two
      values on one focus may share a language tag. Detail = the
      duplicated tag; untagged values never conflict.
    - ``sh:languageIn`` (§4.4.3, key ``language_in: [tags]``): every
      value must be a literal carrying one of the listed tags — an
      IRI, blank node, or untagged literal violates. Detail = value.

    Same shape dict / report contract as :func:`shacl_validate`
    (``target_class`` + per-property constraints, flat ``(focus,
    shape, path, component, detail)`` output). Plan shape: per (shape,
    path) one predicate-pushed scan; uniqueLang is one hash aggregate
    keyed (focus, lang) whose output is bounded by #tagged values —
    nothing quadratic, no windows."""
    if not shapes:
        raise ValueError("shacl_validate_terms: no shapes given")
    for sh in shapes:
        for req in ("shape", "target_class", "properties"):
            if req not in sh:
                raise ValueError(f"shape missing {req!r}: {sh!r}")
        if not sh["properties"]:
            raise ValueError(
                f"shape {sh['shape']!r} declares no property constraints"
            )
        for prop in sh["properties"]:
            if "path" not in prop:
                raise ValueError(
                    f"shape {sh['shape']!r}: property constraint "
                    f"missing 'path': {prop!r}"
                )
            unknown = set(prop) - _TERM_KEYS
            if unknown:
                raise ValueError(
                    f"shape {sh['shape']!r} path {prop['path']!r}: "
                    f"unsupported constraint keys {sorted(unknown)}"
                )
            if len(prop) == 1:
                raise ValueError(
                    f"shape {sh['shape']!r} path {prop['path']!r}: "
                    "no constraint component given"
                )
            if "node_kind" in prop and prop["node_kind"] not in \
                    _NODE_KINDS:
                raise ValueError(
                    f"shape {sh['shape']!r} path {prop['path']!r}: "
                    f"sh:nodeKind {prop['node_kind']!r} not one of "
                    f"{sorted(_NODE_KINDS)}"
                )
            if "language_in" in prop and not prop["language_in"]:
                raise ValueError(
                    f"shape {sh['shape']!r} path {prop['path']!r}: "
                    "sh:languageIn needs a non-empty tag list"
                )
    reports: list[DataFrame] = []
    for sh in shapes:
        name, cls = sh["shape"], sh["target_class"]
        targets = types.where(F.col("cls") == cls).select(
            F.col("node").alias("focus")
        ).distinct()
        for prop in sh["properties"]:
            path = prop["path"]
            vals = (
                parsed.where(F.col("predicate") == path)
                .select(
                    F.col("subj").alias("focus"),
                    F.col("obj").alias("value"),
                    F.col("obj_kind").alias("kind"),
                    F.col("lang"),
                )
                .distinct()
                .join(targets, "focus")
            )

            def report(df, constraint, detail):
                return df.select(
                    F.col("focus"),
                    F.lit(name).alias("shape"),
                    F.lit(path).alias("path"),
                    F.lit(constraint).alias("component"),
                    detail.cast("string").alias("detail"),
                )

            if "node_kind" in prop:
                ok = list(_NODE_KINDS[prop["node_kind"]])
                bad = vals.where(~F.col("kind").isin(ok))
                reports.append(report(bad, "nodeKind", F.col("value")))
            if prop.get("unique_lang"):
                dup = (
                    vals.where(
                        F.col("lang").isNotNull() & (F.col("lang") != "")
                    )
                    .groupBy("focus", "lang")
                    .agg(F.count("*").alias("n"))
                    .where(F.col("n") > 1)
                )
                reports.append(report(dup, "uniqueLang", F.col("lang")))
            if "language_in" in prop:
                tags = [str(t) for t in prop["language_in"]]
                bad = vals.where(
                    (F.col("kind") != "literal")
                    | F.col("lang").isNull()
                    | ~F.col("lang").isin(tags)
                )
                reports.append(report(bad, "languageIn", F.col("value")))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def shacl_terms_python_twin(
    parsed: list[tuple],
    types: list[tuple],
    shapes: list[dict],
) -> set[tuple]:
    """Plain-Python oracle for :func:`shacl_validate_terms`; parsed
    rows are (subj, predicate, obj, obj_kind, lang_or_None)."""
    tset = set(types)
    out: set[tuple] = set()
    for sh in shapes:
        name = sh["shape"]
        targets = {n for n, c in tset if c == sh["target_class"]}
        for prop in sh["properties"]:
            path = prop["path"]
            rows = {
                (s, o, k, la)
                for s, p, o, k, la in parsed
                if p == path and s in targets
            }
            if "node_kind" in prop:
                ok = set(_NODE_KINDS[prop["node_kind"]])
                for s, o, k, _ in rows:
                    if k not in ok:
                        out.add((s, name, path, "nodeKind", o))
            if prop.get("unique_lang"):
                cnt: dict[tuple, int] = {}
                for s, _o, _k, la in rows:
                    if la:
                        cnt[(s, la)] = cnt.get((s, la), 0) + 1
                for (s, la), n in cnt.items():
                    if n > 1:
                        out.add((s, name, path, "uniqueLang", la))
            if "language_in" in prop:
                tags = {str(t) for t in prop["language_in"]}
                for s, o, k, la in rows:
                    if k != "literal" or not la or la not in tags:
                        out.add((s, name, path, "languageIn", o))
    return out


def shacl_validate_python_twin(
    facts: list[tuple],
    types: list[tuple],
    shapes: list[dict],
) -> set[tuple]:
    """Plain-Python oracle for randomized twin tests: same inputs as
    :func:`shacl_validate` with facts as (subj, predicate, obj) tuples
    and types as (node, cls) tuples; returns the violation set."""
    import re

    _validate_shapes(shapes)
    tset = set(types)
    out: set[tuple] = set()
    for sh in shapes:
        name = sh["shape"]
        targets = {n for n, c in tset if c == sh["target_class"]}
        for prop in sh["properties"]:
            path = prop["path"]
            vals: dict[str, set] = {f: set() for f in targets}
            for s, p, o in facts:
                if p == path and s in targets:
                    vals[s].add(o)
            if "min_count" in prop:
                for f in targets:
                    if len(vals[f]) < int(prop["min_count"]):
                        out.add(
                            (f, name, path, "minCount", str(len(vals[f])))
                        )
            if "max_count" in prop:
                for f in targets:
                    if len(vals[f]) > int(prop["max_count"]):
                        out.add(
                            (f, name, path, "maxCount", str(len(vals[f])))
                        )
            if "cls" in prop:
                inst = {n for n, c in tset if c == prop["cls"]}
                for f in targets:
                    for v in vals[f] - inst:
                        out.add((f, name, path, "class", v))
            if "has_value" in prop:
                hv = str(prop["has_value"])
                for f in targets:
                    if hv not in vals[f]:
                        out.add((f, name, path, "hasValue", hv))
            if "in" in prop:
                allowed = {str(v) for v in prop["in"]}
                for f in targets:
                    for v in vals[f] - allowed:
                        out.add((f, name, path, "in", v))
            if "pattern" in prop:
                rx = re.compile(str(prop["pattern"]))
                for f in targets:
                    for v in vals[f]:
                        if not rx.search(v):
                            out.add((f, name, path, "pattern", v))
            if "datatype" in prop:
                rx = re.compile(_DATATYPE_LEXICAL[prop["datatype"]])
                for f in targets:
                    for v in vals[f]:
                        if not rx.search(v):
                            out.add((f, name, path, "datatype", v))
            if "min_length" in prop:
                n = int(prop["min_length"])
                for f in targets:
                    for v in vals[f]:
                        if len(v) < n:
                            out.add((f, name, path, "minLength", v))
            if "max_length" in prop:
                n = int(prop["max_length"])
                for f in targets:
                    for v in vals[f]:
                        if len(v) > n:
                            out.add((f, name, path, "maxLength", v))

            def _num(v):
                try:
                    return float(v)
                except ValueError:
                    return None

            for key, bad_cmp, cname in (
                ("min_inclusive", lambda x, b: x < b, "minInclusive"),
                ("min_exclusive", lambda x, b: x <= b, "minExclusive"),
                ("max_inclusive", lambda x, b: x > b, "maxInclusive"),
                ("max_exclusive", lambda x, b: x >= b, "maxExclusive"),
            ):
                if key in prop:
                    bound = float(prop[key])
                    for f in targets:
                        for v in vals[f]:
                            x = _num(v)
                            if x is None or bad_cmp(x, bound):
                                out.add((f, name, path, cname, v))
            for pair_key in ("equals", "disjoint", "less_than"):
                if pair_key not in prop:
                    continue
                path2 = str(prop[pair_key])
                vals2: dict[str, set] = {f: set() for f in targets}
                for s, p, o in facts:
                    if p == path2 and s in targets:
                        vals2[s].add(o)
                for f in targets:
                    if pair_key == "equals":
                        for v in vals[f] ^ vals2[f]:
                            out.add((f, name, path, "equals", v))
                    elif pair_key == "disjoint":
                        for v in vals[f] & vals2[f]:
                            out.add((f, name, path, "disjoint", v))
                    else:
                        for v1 in vals[f]:
                            for v2 in vals2[f]:
                                x1, x2 = _num(v1), _num(v2)
                                if x1 is None or x2 is None or x1 >= x2:
                                    out.add((
                                        f, name, path, "lessThan",
                                        f"{v1}!<{v2}",
                                    ))
        if sh.get("closed"):
            allowed = {str(p["path"]) for p in sh["properties"]} | {
                str(i) for i in sh.get("ignored", [])
            }
            for s, p, o in facts:
                if s in targets and p not in allowed:
                    out.add((s, name, p, "closed", o))
    return out


def induce_shapes(
    triples: DataFrame,
    types: DataFrame,
    min_support_ppm: int = 0,
) -> DataFrame:
    """Shape INDUCTION — mine the shapes shacl_validate gates on from
    the data itself (the sheXer / "Shape Induction from Knowledge
    Graphs" approach, Fernandez-Alvarez 2022): for every (class,
    predicate) pair observed on that class's instances, the empirical
    cardinality and object-class profile a maintainer turns into a
    declared shape.

    ``triples``: (subj, pred, obj); ``types``: (entity, class) — an
    entity may have several classes (each contributes independently,
    the spec's target-class semantics). Returns one row per
    (cls, pred) with support >= ``min_support_ppm``:

      (cls, pred, n_instances, n_subjects, support_ppm, min_count,
       max_count, modal_obj_class, modal_obj_share_ppm)

    * support_ppm  = 1e6 * n_subjects DIV n_instances (share of the
      class's instances asserting the predicate at all);
    * min_count    = 0 if support < 1e6 else the smallest per-subject
      DISTINCT-value count (the sh:minCount a validator could enforce
      today without violations); max_count = the largest (the
      candidate sh:maxCount);
    * modal_obj_class / modal_obj_share_ppm = the most common class of
      the object values (ties broken lexicographically — deterministic
      cross-engine) and its ppm share of typed object occurrences —
      the candidate sh:class constraint. NULL/0 when no object is
      typed (literal-only predicates).

    All ratios are truncating integer ppm — bit-exact vs the DuckDB
    twin.

    Plan shape (100 TB graph): one (subj, pred) distinct-count
    aggregate over the triple table; one join to ``types`` keyed on
    the subject (both corpus-sized — a plain hash join, AQE handles
    hot classes); one (cls, pred) aggregate; the object-class branch
    joins triples to ``types`` on obj then aggregates (cls, pred,
    obj_class) and window-picks the mode per (cls, pred) — window
    partitions are (class x predicate)-sized, never corpus-sized.
    Class instance counts are a class-keyed aggregate joined back
    (schema-sized, broadcast). No driver collect, no all-pairs."""
    spp = triples.groupBy("subj", "pred").agg(
        F.countDistinct("obj").cast("long").alias("nvals")
    )
    subj_typed = spp.join(
        types.select(F.col("entity").alias("subj"), "cls"), "subj"
    )
    class_n = types.groupBy("cls").agg(
        F.countDistinct("entity").cast("long").alias("n_instances")
    )
    per_cp = subj_typed.groupBy("cls", "pred").agg(
        F.count("*").cast("long").alias("n_subjects"),
        F.min("nvals").cast("long").alias("min_nvals"),
        F.max("nvals").cast("long").alias("max_count"),
    )
    base = per_cp.join(F.broadcast(class_n), "cls").select(
        "cls",
        "pred",
        "n_instances",
        "n_subjects",
        F.expr("(n_subjects * 1000000L) div n_instances").alias(
            "support_ppm"
        ),
        F.when(
            F.col("n_subjects") == F.col("n_instances"), F.col("min_nvals")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("min_count"),
        "max_count",
    )
    # object-class profile: typed object occurrences per (cls, pred)
    obj_typed = (
        triples.join(
            types.select(F.col("entity").alias("subj"), "cls"), "subj"
        )
        .join(
            types.select(
                F.col("entity").alias("obj"), F.col("cls").alias("ocls")
            ),
            "obj",
        )
        .groupBy("cls", "pred", "ocls")
        .agg(F.count("*").cast("long").alias("n_occ"))
    )
    wm = Window.partitionBy("cls", "pred").orderBy(
        F.desc("n_occ"), F.col("ocls")
    )
    tot = Window.partitionBy("cls", "pred")
    modal = (
        obj_typed.withColumn("rk", F.row_number().over(wm))
        .withColumn("n_tot", F.sum("n_occ").over(tot))
        .where(F.col("rk") == 1)
        .select(
            "cls",
            "pred",
            F.col("ocls").alias("modal_obj_class"),
            F.expr("(n_occ * 1000000L) div n_tot").alias(
                "modal_obj_share_ppm"
            ),
        )
    )
    out = base.join(modal, ["cls", "pred"], "left").select(
        "cls",
        "pred",
        "n_instances",
        "n_subjects",
        "support_ppm",
        "min_count",
        "max_count",
        "modal_obj_class",
        F.coalesce(F.col("modal_obj_share_ppm"), F.lit(0).cast("long")).alias(
            "modal_obj_share_ppm"
        ),
    )
    if min_support_ppm > 0:
        out = out.where(F.col("support_ppm") >= min_support_ppm)
    return out
