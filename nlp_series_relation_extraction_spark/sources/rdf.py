"""N-Triples (W3C RDF 1.1 N-Triples) export/import for the KG tables.

The interchange format a knowledge graph is PUBLISHED in: one triple
per line, `<subject-IRI> <predicate-IRI> (<object-IRI> | "literal") .`,
UTF-8, with ECHAR/UCHAR escape sequences inside literals. Spec:
https://www.w3.org/TR/n-triples/ (public W3C recommendation).

Design notes:

* Export stays JVM-side: lines are built with `concat`/`regexp_replace`
  chains (whole-stage codegen), so a 100-TB edge dump is a pure map
  stage writable with `df.write.text`. The only Python is a
  SCHEMA-SIZED predicate->IRI dimension (percent-encoding needs
  urllib; predicates are a bounded vocabulary — the reference schema
  has 55 — collected once and rejoined, never per row).
* Literal escaping follows the spec's canonical form: backslash first,
  then `"`, LF, CR (ECHAR); other characters ride as raw UTF-8, which
  N-Triples 1.1 permits.
* Import is a full spec parser (IRIs, literals with ECHAR + \\uXXXX /
  \\UXXXXXXXX numeric escapes, language tags, typed literals, blank
  nodes, comments/blank lines) run as an Arrow-batched `mapInPandas` —
  line-oriented, so it parallelizes over input splits with no shuffle.
  Malformed lines FAIL LOUD with the offending line echoed: silently
  dropping triples corrupts a graph in ways downstream joins can't see.
* `ntriples_to_edges` inverts `edges_to_ntriples` exactly (ids parsed
  from the IRI tail JVM-side, predicates decoded through the same
  bounded dimension), so export -> import roundtrips byte-stably.
"""

from __future__ import annotations

from ..functions.smalldf import local_df

import re
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, functions as F

DEFAULT_BASE = "http://kg.example/"


def _escape_literal(col):
    """Spec ECHAR escaping for STRING_LITERAL_QUOTE: backslash must be
    first or it would re-escape the others' output."""
    out = F.regexp_replace(col, r"\\", r"\\\\")
    out = F.regexp_replace(out, '"', r'\\"')
    out = F.regexp_replace(out, "\n", r"\\n")
    out = F.regexp_replace(out, "\r", r"\\r")
    return out


def predicate_iri_map(
    edges: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """(predicate, pred_iri) dimension: percent-encoded per RFC 3987
    (safe='' so even '/' encodes — one path segment per predicate).
    Bounded collect: predicate vocabularies are schema-sized."""
    preds = [
        r[0]
        for r in edges.select("predicate").distinct().orderBy("predicate").collect()
    ]
    spark = edges.sparkSession
    return local_df(spark, 
        [(p, f"{base}p/{quote(p, safe='')}") for p in preds],
        "predicate string, pred_iri string",
    )


def edges_to_ntriples(
    edges: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """Edge table -> one N-Triples line per edge (column ``line``).
    Entity IRIs are `<base>e/<id>`; the predicate dimension broadcasts.
    Pure map stage after the broadcast join — `.write.text` ready."""
    pm = predicate_iri_map(edges, base)
    return edges.join(F.broadcast(pm), "predicate").select(
        F.concat(
            F.lit(f"<{base}e/"),
            F.col("subj_entity_id").cast("string"),
            F.lit("> <"),
            F.col("pred_iri"),
            F.lit(f"> <{base}e/"),
            F.col("obj_entity_id").cast("string"),
            F.lit("> ."),
        ).alias("line")
    )


def labels_to_ntriples(
    nodes: DataFrame,
    id_col: str = "entity_id",
    label_col: str = "canonical_name",
    base: str = DEFAULT_BASE,
    lang: str | None = None,
) -> DataFrame:
    """Node labels -> `<e/id> <rdfs:label> "escaped" [@lang] .` lines —
    the literal-bearing half of a KG dump, all JVM-side."""
    tag = F.lit(f"@{lang}" if lang else "")
    return nodes.select(
        F.concat(
            F.lit(f"<{base}e/"),
            F.col(id_col).cast("string"),
            F.lit("> <http://www.w3.org/2000/01/rdf-schema#label> \""),
            _escape_literal(F.col(label_col)),
            F.lit('"'),
            tag,
            F.lit(" ."),
        ).alias("line")
    )


def edges_to_reified_ntriples(
    edges: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """Edge table -> W3C standard reification (RDF 1.1 Semantics §B?;
    vocabulary rdf:Statement / rdf:subject / rdf:predicate /
    rdf:object) with statement-level PROVENANCE qualifiers — the
    interchange form for triple metadata when the consumer cannot read
    N-Quads graphs: each edge becomes 4 core reification lines plus
    one ``kg:nEvidence`` typed-literal line (and one ``kg:firstSeenIn``
    IRI line when ``first_conv_id`` is present).

    The statement node is a SKOLEM IRI `<base>s/md5(s|p|o)` — a pure
    function of the triple, so re-exporting after a merge never mints
    a second node for the same fact (the same md5-determinism contract
    as skolemize()); DuckDB replays it bit-exact. Pure map stage after
    the broadcast predicate join: 5-6 output rows per edge, no joins
    between statement lines."""
    pm = predicate_iri_map(edges, base)
    has_conv = "first_conv_id" in edges.columns
    e = edges.join(F.broadcast(pm), "predicate").select(
        F.concat(
            F.lit(f"<{base}s/"),
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("subj_entity_id").cast("string"),
                    F.col("predicate"),
                    F.col("obj_entity_id").cast("string"),
                )
            ),
            F.lit(">"),
        ).alias("stmt"),
        F.concat(
            F.lit(f"<{base}e/"),
            F.col("subj_entity_id").cast("string"),
            F.lit(">"),
        ).alias("s_iri"),
        F.concat(F.lit("<"), F.col("pred_iri"), F.lit(">")).alias("p_iri"),
        F.concat(
            F.lit(f"<{base}e/"),
            F.col("obj_entity_id").cast("string"),
            F.lit(">"),
        ).alias("o_iri"),
        *(
            [F.col("n_evidence").cast("string").alias("nev")]
            if "n_evidence" in edges.columns
            else []
        ),
        *([F.col("first_conv_id").alias("conv")] if has_conv else []),
    )
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    parts = [
        F.concat(
            F.col("stmt"),
            F.lit(f" <{rdf}type> <{rdf}Statement> ."),
        ),
        F.concat(
            F.col("stmt"), F.lit(f" <{rdf}subject> "), F.col("s_iri"),
            F.lit(" ."),
        ),
        F.concat(
            F.col("stmt"), F.lit(f" <{rdf}predicate> "), F.col("p_iri"),
            F.lit(" ."),
        ),
        F.concat(
            F.col("stmt"), F.lit(f" <{rdf}object> "), F.col("o_iri"),
            F.lit(" ."),
        ),
    ]
    if "n_evidence" in edges.columns:
        parts.append(
            F.concat(
                F.col("stmt"),
                F.lit(f' <{base}p/nEvidence> "'),
                F.col("nev"),
                F.lit(
                    '"^^<http://www.w3.org/2001/XMLSchema#integer> .'
                ),
            )
        )
    if has_conv:
        parts.append(
            F.concat(
                F.col("stmt"),
                F.lit(f" <{base}p/firstSeenIn> <{base}g/"),
                F.col("conv"),
                F.lit("> ."),
            )
        )
    return e.select(
        F.explode(F.array(*[p.alias("x") for p in parts])).alias("line")
    )


# --- import -------------------------------------------------------------

_TERM = (
    r"(?:<(?P<iri{n}>[^<>\"{{}}|^`\\\x00-\x20]*)>"
    r"|_:(?P<bnode{n}>\S+)"
    r"|\"(?P<lit{n}>(?:[^\"\\\n\r]|\\.)*)\""
    r"(?:@(?P<lang{n}>[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)"
    r"|\^\^<(?P<dtype{n}>[^<>\"{{}}|^`\\\x00-\x20]*)>)?)"
)
_LINE_RE = re.compile(
    r"^\s*"
    + _TERM.format(n=1)
    + r"\s+"
    + _TERM.format(n=2)
    + r"\s+"
    + _TERM.format(n=3)
    + r"\s*\.\s*(?:#.*)?$"
)
_ECHAR = {
    "t": "\t",
    "b": "\b",
    "n": "\n",
    "r": "\r",
    "f": "\f",
    '"': '"',
    "'": "'",
    "\\": "\\",
}
_UNESCAPE_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        e = m.group(1)
        if e[0] in "uU":
            return chr(int(e[1:], 16))
        if e in _ECHAR:
            return _ECHAR[e]
        raise ValueError(f"invalid escape \\{e}")

    return _UNESCAPE_RE.sub(sub, s)


_PARSED_SCHEMA = (
    "subj string, subj_kind string, pred string,"
    " obj string, obj_kind string, lang string, dtype string"
)


def parse_ntriples(lines: DataFrame, col: str = "line") -> DataFrame:
    """Full N-Triples parse -> (subj, subj_kind, pred, obj, obj_kind,
    lang, dtype); kinds are 'iri' | 'bnode' | 'literal'. Comment-only
    and blank lines are skipped (the spec allows them); anything else
    that fails the grammar raises with the line echoed."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for line in pdf[col]:
                if line is None or not line.strip() or line.lstrip().startswith("#"):
                    continue
                m = _LINE_RE.match(line)
                if not m:
                    raise ValueError(f"malformed N-Triples line: {line!r}")
                g = m.groupdict()
                if g["lit1"] is not None or g["lit2"] is not None:
                    raise ValueError(
                        f"literal in subject/predicate position: {line!r}"
                    )
                if g["bnode2"] is not None:
                    raise ValueError(f"blank-node predicate: {line!r}")
                out = []
                for n in (1, 2, 3):
                    if g[f"iri{n}"] is not None:
                        out += [_unescape(g[f"iri{n}"]), "iri"]
                    elif g[f"bnode{n}"] is not None:
                        out += [g[f"bnode{n}"], "bnode"]
                    else:
                        out += [_unescape(g[f"lit{n}"]), "literal"]
                rows.append(
                    (
                        out[0],
                        out[1],
                        out[2],
                        out[4],
                        out[5],
                        g["lang3"],
                        g["dtype3"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "subj",
                    "subj_kind",
                    "pred",
                    "obj",
                    "obj_kind",
                    "lang",
                    "dtype",
                ],
            )

    return lines.mapInPandas(run, _PARSED_SCHEMA)


def skolemize(
    parsed: DataFrame,
    base: str = "https://example.org",
) -> DataFrame:
    """RDF 1.1 skolemization (§3.5,
    https://www.w3.org/TR/rdf11-concepts/#section-skolemization):
    replace every blank node in a parsed frame with the spec's
    well-known genid IRI ``<base>/.well-known/genid/<sha256(label)>``
    and flip its kind to ``iri`` — after which the graph can be
    merged, diffed, and deduplicated by plain string equality (the
    whole point: blank nodes make graph comparison NP-hard, skolem
    IRIs make it a join).

    Determinism contract: the IRI is a pure function of the LABEL, so
    two dumps reusing a label would collide — skolemize one document
    at a time (labels are document-scoped by the N-Triples grammar)
    or pre-suffix labels with a document id. Plan: one narrow
    projection over the scan — two conditional concat+sha2 columns,
    no shuffle, no UDF."""
    pref = F.lit(base + "/.well-known/genid/")

    def term(col, kind):
        return F.when(
            F.col(kind) == "bnode", F.concat(pref, F.sha2(F.col(col), 256))
        ).otherwise(F.col(col))

    def kind(col):
        return F.when(
            F.col(col) == "bnode", F.lit("iri")
        ).otherwise(F.col(col))

    return parsed.select(
        term("subj", "subj_kind").alias("subj"),
        kind("subj_kind").alias("subj_kind"),
        F.col("pred"),
        term("obj", "obj_kind").alias("obj"),
        kind("obj_kind").alias("obj_kind"),
        F.col("lang"),
        F.col("dtype"),
    )


def ntriples_to_edges(
    lines: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """Inverse of edges_to_ntriples: lines whose three terms are entity/
    predicate IRIs under ``base`` -> (subj_entity_id, predicate,
    obj_entity_id). Ids split off JVM-side; predicate IRIs decode
    through a bounded distinct->unquote dimension (schema-sized, same
    shape as export). Lines that aren't base-entity edge triples (e.g.
    rdfs:label literals) are filtered, not errors — a dump interleaves
    them."""
    parsed = parse_ntriples(lines)
    e_pref = f"{base}e/"
    p_pref = f"{base}p/"
    edges = parsed.where(
        (F.col("subj_kind") == "iri")
        & (F.col("obj_kind") == "iri")
        & F.col("subj").startswith(e_pref)
        & F.col("obj").startswith(e_pref)
        & F.col("pred").startswith(p_pref)
    ).select(
        F.substring(F.col("subj"), len(e_pref) + 1, 2_000_000)
        .cast("long")
        .alias("subj_entity_id"),
        F.substring(F.col("pred"), len(p_pref) + 1, 2_000_000).alias(
            "pred_enc"
        ),
        F.substring(F.col("obj"), len(e_pref) + 1, 2_000_000)
        .cast("long")
        .alias("obj_entity_id"),
    )
    encs = [
        r[0] for r in edges.select("pred_enc").distinct().collect()
    ]
    spark = lines.sparkSession
    dim = local_df(spark, 
        [(e, unquote(e)) for e in encs], "pred_enc string, predicate string"
    )
    return edges.join(F.broadcast(dim), "pred_enc").select(
        "subj_entity_id", "predicate", "obj_entity_id"
    )


# --- N-Quads (provenance-bearing dump; W3C N-Quads 1.1) ------------------

_QLINE_RE = re.compile(
    r"^\s*"
    + _TERM.format(n=1)
    + r"\s+"
    + _TERM.format(n=2)
    + r"\s+"
    + _TERM.format(n=3)
    # graph label: IRI or blank node only (N-Quads grammar `graphLabel`)
    + r"(?:\s+(?:<(?P<giri>[^<>\"{}|^`\\\x00-\x20]*)>|_:(?P<gbnode>\S+)))?"
    + r"\s*\.\s*(?:#.*)?$"
)

_PARSED_Q_SCHEMA = _PARSED_SCHEMA + ", graph string, graph_kind string"


def _graph_iri(col, base: str):
    """Canonical percent-encoding of a graph id, JVM-side: url_encode
    form-encodes (space -> '+', '+' -> '%2B'), then '+' -> '%20'
    restores RFC-style percent encoding — unambiguous both ways, no
    Python in the plan."""
    return F.concat(
        F.lit(f"{base}g/"),
        F.regexp_replace(F.url_encode(col.cast("string")), r"\+", "%20"),
    )


def edges_to_nquads(
    edges: DataFrame,
    base: str = DEFAULT_BASE,
    graph_col: str = "first_conv_id",
) -> DataFrame:
    """Edge table -> one N-Quads line per edge: the triple plus a named
    graph carrying its PROVENANCE — `<base>g/<conv_id>`, the
    conversation the edge was first extracted from (edge_table's
    first_conv_id). The standard way to keep triple-level lineage in an
    RDF interchange dump without reification blow-up; a consumer can
    dereference any fact back to its source transcript. Same plan shape
    as edges_to_ntriples: broadcast predicate dimension + pure JVM
    concat map stage."""
    pm = predicate_iri_map(edges, base)
    return edges.join(F.broadcast(pm), "predicate").select(
        F.concat(
            F.lit(f"<{base}e/"),
            F.col("subj_entity_id").cast("string"),
            F.lit("> <"),
            F.col("pred_iri"),
            F.lit(f"> <{base}e/"),
            F.col("obj_entity_id").cast("string"),
            F.lit("> <"),
            _graph_iri(F.col(graph_col), base),
            F.lit("> ."),
        ).alias("line")
    )


def parse_nquads(lines: DataFrame, col: str = "line") -> DataFrame:
    """N-Quads parse: parse_ntriples' columns plus (graph, graph_kind) —
    NULL graph = the default graph (a plain N-Triples line is valid
    N-Quads, per spec §2). Malformed lines raise with the line echoed;
    a literal in graph position never matches the grammar."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for line in pdf[col]:
                if (
                    line is None
                    or not line.strip()
                    or line.lstrip().startswith("#")
                ):
                    continue
                m = _QLINE_RE.match(line)
                if not m:
                    raise ValueError(f"malformed N-Quads line: {line!r}")
                g = m.groupdict()
                if g["lit1"] is not None or g["lit2"] is not None:
                    raise ValueError(
                        f"literal in subject/predicate position: {line!r}"
                    )
                if g["bnode2"] is not None:
                    raise ValueError(f"blank-node predicate: {line!r}")
                out = []
                for n in (1, 2, 3):
                    if g[f"iri{n}"] is not None:
                        out += [_unescape(g[f"iri{n}"]), "iri"]
                    elif g[f"bnode{n}"] is not None:
                        out += [g[f"bnode{n}"], "bnode"]
                    else:
                        out += [_unescape(g[f"lit{n}"]), "literal"]
                if g["giri"] is not None:
                    graph, gkind = _unescape(g["giri"]), "iri"
                elif g["gbnode"] is not None:
                    graph, gkind = g["gbnode"], "bnode"
                else:
                    graph, gkind = None, None
                rows.append(
                    (
                        out[0], out[1], out[2], out[4], out[5],
                        g["lang3"], g["dtype3"], graph, gkind,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "subj", "subj_kind", "pred", "obj", "obj_kind",
                    "lang", "dtype", "graph", "graph_kind",
                ],
            )

    return lines.mapInPandas(run, _PARSED_Q_SCHEMA)


def nquads_to_edges(
    lines: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """Inverse of edges_to_nquads: base-entity quad lines ->
    (subj_entity_id, predicate, obj_entity_id, conv_id) with the
    provenance conversation decoded from the graph IRI. Non-edge lines
    (labels, foreign IRIs, default-graph triples) are filtered, not
    errors."""
    parsed = parse_nquads(lines)
    e_pref, p_pref, g_pref = f"{base}e/", f"{base}p/", f"{base}g/"
    quads = parsed.where(
        (F.col("subj_kind") == "iri")
        & (F.col("obj_kind") == "iri")
        & (F.col("graph_kind") == "iri")
        & F.col("subj").startswith(e_pref)
        & F.col("obj").startswith(e_pref)
        & F.col("pred").startswith(p_pref)
        & F.col("graph").startswith(g_pref)
    ).select(
        F.substring(F.col("subj"), len(e_pref) + 1, 2_000_000)
        .cast("long")
        .alias("subj_entity_id"),
        F.substring(F.col("pred"), len(p_pref) + 1, 2_000_000).alias(
            "pred_enc"
        ),
        F.substring(F.col("obj"), len(e_pref) + 1, 2_000_000)
        .cast("long")
        .alias("obj_entity_id"),
        F.substring(F.col("graph"), len(g_pref) + 1, 2_000_000).alias(
            "graph_enc"
        ),
    )
    # predicate IRIs decode through a bounded distinct dimension
    # (schema-sized); graph ids decode JVM-side with url_decode (the
    # export's '+'->'%20' rewrite makes form-decode == percent-decode)
    encs = [r[0] for r in quads.select("pred_enc").distinct().collect()]
    spark = lines.sparkSession
    dim = local_df(spark, 
        [(e, unquote(e)) for e in encs],
        "pred_enc string, predicate string",
    )
    return quads.join(F.broadcast(dim), "pred_enc").select(
        "subj_entity_id",
        "predicate",
        "obj_entity_id",
        F.url_decode(F.col("graph_enc")).alias("conv_id"),
    )


def edges_to_jsonld(
    edges: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """Edge table -> newline-delimited JSON-LD, one FLATTENED node
    object per subject (column ``line``) in expanded form (JSON-LD 1.1
    §8/§9: every property value an array of node objects, no @context
    needed — the interchange shape json-ld processors emit after
    expand+flatten, and what a streaming loader wants: one self-
    contained JSON value per line):

      {"@id":"<base>e/7","<pred_iri>":[{"@id":"<base>e/9"}, ...], ...}

    Deterministic bytes: predicates sort lexicographically by IRI
    inside each node, objects sort numerically inside each predicate
    array — re-export of the same graph is byte-identical (same
    contract as the N-Triples/Turtle exporters; diffable dumps).

    Plan shape: the predicate-IRI dimension broadcasts (schema-sized),
    then TWO hash aggregations — (subj, pred) collects the object
    array, subj collects the predicate blocks — both map-side
    combinable; line assembly is JVM concat over sorted arrays (no
    UDFs, no JSON library on the hot path: the grammar here is closed,
    ids are numeric and predicate IRIs are percent-encoded, so no
    JSON-escaping case exists by construction)."""
    pm = predicate_iri_map(edges, base)
    e = edges.join(F.broadcast(pm), "predicate").select(
        F.col("subj_entity_id").cast("long").alias("s"),
        "pred_iri",
        F.col("obj_entity_id").cast("long").alias("o"),
    )
    per_pred = (
        e.groupBy("s", "pred_iri")
        .agg(F.sort_array(F.collect_set("o")).alias("objs"))
        .select(
            "s",
            "pred_iri",
            F.concat(
                F.lit('"'),
                F.col("pred_iri"),
                F.lit('":['),
                F.array_join(
                    F.transform(
                        "objs",
                        lambda o: F.concat(
                            F.lit('{"@id":"' + base + "e/"),
                            o.cast("string"),
                            F.lit('"}'),
                        ),
                    ),
                    ",",
                ),
                F.lit("]"),
            ).alias("block"),
        )
    )
    return (
        per_pred.groupBy("s")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("pred_iri", "block"))
                    ),
                    lambda st: st["block"],
                ),
                ",",
            ).alias("props")
        )
        .select(
            F.concat(
                F.lit('{"@id":"' + base + "e/"),
                F.col("s").cast("string"),
                F.lit('",'),
                F.col("props"),
                F.lit("}"),
            ).alias("line")
        )
    )


# --- RDF-star (quoted triples) ------------------------------------------


def edges_to_ntriples_star(
    edges: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """Edge table -> N-Triples-star (RDF-star / RDF 1.2 quoted
    triples): every edge emits its ASSERTED triple plus
    ``<< s p o >> <qualifier> value .`` lines carrying the statement
    metadata — ``kg:nEvidence`` as an xsd:integer literal and (when
    present) ``kg:firstSeenIn`` as a graph IRI. The modern
    alternative to edges_to_reified_ntriples: 1 + q lines per edge
    instead of 4 + q, no skolem statement node to join back, and the
    quoted term IS the fact (SPARQL-star consumers match it
    directly).

    Same determinism contract as every exporter here: pure column
    concat after the broadcast predicate-IRI join, byte-stable, so
    the DuckDB twin replays it exactly."""
    pm = predicate_iri_map(edges, base)
    has_conv = "first_conv_id" in edges.columns
    has_ev = "n_evidence" in edges.columns
    e = edges.join(F.broadcast(pm), "predicate").select(
        F.concat(
            F.lit(f"<{base}e/"),
            F.col("subj_entity_id").cast("string"),
            F.lit("> <"),
            F.col("pred_iri"),
            F.lit(f"> <{base}e/"),
            F.col("obj_entity_id").cast("string"),
            F.lit(">"),
        ).alias("triple"),
        *(
            [F.col("n_evidence").cast("string").alias("nev")]
            if has_ev
            else []
        ),
        *([F.col("first_conv_id").alias("conv")] if has_conv else []),
    )
    parts = [F.concat(F.col("triple"), F.lit(" ."))]
    if has_ev:
        parts.append(
            F.concat(
                F.lit("<< "),
                F.col("triple"),
                F.lit(f' >> <{base}p/nEvidence> "'),
                F.col("nev"),
                F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer> .'),
            )
        )
    if has_conv:
        parts.append(
            F.concat(
                F.lit("<< "),
                F.col("triple"),
                F.lit(f" >> <{base}p/firstSeenIn> <{base}g/"),
                F.col("conv"),
                F.lit("> ."),
            )
        )
    return e.select(
        F.explode(F.array(*[p.alias("x") for p in parts])).alias("line")
    ).where(F.col("line").isNotNull())  # NULL first_conv_id: no line


_STAR_LINE = (
    r"^\s*<<\s*<([^<>\s]*)>\s+<([^<>\s]*)>\s+<([^<>\s]*)>\s*>>"
    r"\s+<([^<>\s]*)>\s+(.*?)\s*\.\s*$"
)
_STAR_IRI_VAL = r"^<([^<>\s]*)>$"
_STAR_LIT_VAL = r'^"((?:[^"\\]|\\.)*)"(?:\^\^<([^<>\s]*)>)?$'


def parse_ntriples_star(
    lines: DataFrame, col: str = "line"
) -> DataFrame:
    """Parse ``<< s p o >> q v .`` quoted-triple annotation lines
    (IRI-term quoted triples — the shape edges_to_ntriples_star
    emits). Returns (subj_iri, pred_iri, obj_iri, qual_iri,
    value_iri, value_lit, value_dtype) — exactly one of value_iri /
    value_lit is non-NULL. Plain (non-star) triple lines and
    malformed input yield no row: feed those to parse_ntriples.
    Pure JVM regexes, one projection."""
    c = F.col(col)
    m = lines.where(c.rlike(_STAR_LINE)).select(
        F.regexp_extract(c, _STAR_LINE, 1).alias("subj_iri"),
        F.regexp_extract(c, _STAR_LINE, 2).alias("pred_iri"),
        F.regexp_extract(c, _STAR_LINE, 3).alias("obj_iri"),
        F.regexp_extract(c, _STAR_LINE, 4).alias("qual_iri"),
        F.regexp_extract(c, _STAR_LINE, 5).alias("_v"),
    )
    v = F.col("_v")
    return m.select(
        "subj_iri",
        "pred_iri",
        "obj_iri",
        "qual_iri",
        F.when(
            v.rlike(_STAR_IRI_VAL), F.regexp_extract(v, _STAR_IRI_VAL, 1)
        ).alias("value_iri"),
        F.when(
            v.rlike(_STAR_LIT_VAL), F.regexp_extract(v, _STAR_LIT_VAL, 1)
        ).alias("value_lit"),
        F.when(
            v.rlike(_STAR_LIT_VAL)
            & (F.regexp_extract(v, _STAR_LIT_VAL, 2) != ""),
            F.regexp_extract(v, _STAR_LIT_VAL, 2),
        ).alias("value_dtype"),
    )


def ntriples_star_to_edges(
    lines: DataFrame, base: str = DEFAULT_BASE, col: str = "line"
) -> DataFrame:
    """Reassemble an evidence-bearing edge table from an N-Triples-star
    dump (the inverse of edges_to_ntriples_star for this package's IRI
    scheme): asserted lines provide the triples, ``kg:nEvidence``
    quoted-triple annotations provide the counts (edges missing an
    annotation default to 1), ``kg:firstSeenIn`` provides
    first_conv_id (NULL when absent). One co-keyed left join of
    asserted triples against the annotation stream."""
    ep = f"{base}e/"
    # parse_ntriples raises on quoted-triple lines by design (strict
    # grammar); route only the plain asserted lines through it
    plain = lines.where(~F.col(col).rlike(r"^\s*<<"))
    asserted = parse_ntriples(plain, col).select(
        F.expr(f"cast(substring(subj, {len(ep) + 1}) as bigint)").alias(
            "subj_entity_id"
        ),
        F.regexp_extract(F.col("pred"), r"^.*/([^/]+)$", 1).alias(
            "predicate"
        ),
        F.expr(f"cast(substring(obj, {len(ep) + 1}) as bigint)").alias(
            "obj_entity_id"
        ),
    )
    ann = parse_ntriples_star(lines, col).select(
        F.expr(f"cast(substring(subj_iri, {len(ep) + 1}) as bigint)").alias(
            "subj_entity_id"
        ),
        F.regexp_extract(
            F.col("pred_iri"), r"^.*/([^/]+)$", 1
        ).alias("predicate"),
        F.expr(f"cast(substring(obj_iri, {len(ep) + 1}) as bigint)").alias(
            "obj_entity_id"
        ),
        F.regexp_extract(F.col("qual_iri"), r"^.*/([^/]+)$", 1).alias(
            "qual"
        ),
        "value_iri",
        "value_lit",
    )
    keys = ["subj_entity_id", "predicate", "obj_entity_id"]
    ev = ann.where(F.col("qual") == "nEvidence").select(
        *keys, F.col("value_lit").cast("long").alias("n_evidence")
    )
    conv = ann.where(F.col("qual") == "firstSeenIn").select(
        *keys,
        F.regexp_extract(F.col("value_iri"), r"^.*/g/(.*)$", 1).alias(
            "first_conv_id"
        ),
    )
    return (
        asserted.join(ev, keys, "left")
        .join(conv, keys, "left")
        .select(
            *keys,
            F.coalesce(F.col("n_evidence"), F.lit(1).cast("long")).alias(
                "n_evidence"
            ),
            "first_conv_id",
        )
    )
