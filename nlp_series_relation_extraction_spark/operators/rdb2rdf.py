"""Relational-to-RDF construction: the W3C Direct Mapping
(https://www.w3.org/TR/rdb-direct-mapping/) re-expressed as a pure
Catalyst projection — the missing front door of a KG-construction
engine whose extraction side mines triples from text (reference scope:
zhoujx4/NLP-Series-relation-extraction run_*.py produce spo_list
triples from transcripts; enterprise KGs bootstrap the same triple
store from relational systems of record, and this operator is that
bootstrap).

Scale shape: each table contributes ONE parquet scan; every row
explodes into its triples inside the same narrow stage (an
``explode`` over a per-row array built with column expressions — no
shuffle, no UDF, no join, not even for foreign keys: the Direct
Mapping derives the referenced subject IRI from the FK VALUE, so a
reference triple is a string concat, never a lookup). Output
partitioning inherits the scan, so a 100-TB relational dump maps at
full read bandwidth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRIPLE_SCHEMA = "subj string, predicate string, obj string"


def _subject_expr(table: str, pk_cols: list[str], base: str):
    """Row-node IRI per the Direct Mapping: ``<base><table>/<pk>=<val>``
    with ``;``-joined pairs for composite keys (spec §2.1 example
    shape). NULL in any key column yields NULL (the row then maps to
    no subject — the spec's unique-key assumption; callers wanting
    blank-node semantics for keyless tables pass a synthetic key)."""
    parts = [F.lit(base + table + "/")]
    for i, c in enumerate(pk_cols):
        if i:
            parts.append(F.lit(";"))
        parts.append(F.lit(c + "="))
        parts.append(F.col(c).cast("string"))
    return F.concat(*parts)


def direct_mapping(
    tables: dict[str, DataFrame],
    primary_keys: dict[str, str | list[str]],
    foreign_keys: dict[str, list[tuple[str, str]]] | None = None,
    base: str = "",
    type_predicate: str = "rdf:type",
) -> DataFrame:
    """Map relational tables to a ``(subj, predicate, obj)`` triple set
    per the W3C Direct Mapping:

    - one *type* triple per row: ``(row_iri, rdf:type, <table>)``;
    - one *literal* triple per non-NULL column:
      ``(row_iri, <table>#<col>, lexical value)`` (SQL NULL produces
      no triple — spec §2.2);
    - one *reference* triple per non-NULL foreign-key column
      ``(col, ref_table)``: ``(row_iri, <table>#ref-<col>,
      referenced_row_iri)``, where the referenced IRI is computed from
      the key VALUE under the referenced table's primary key — no join
      against the referenced table is ever needed.

    ``foreign_keys`` maps table name -> list of (fk_column,
    referenced_table). FK columns still emit their literal triple too
    (the spec keeps both). Returns the distinct-free union — the
    mapping is injective per row, so no dedup pass is spent; callers
    layering onto user-supplied duplicate rows dedup downstream.
    """
    fks = foreign_keys or {}
    spark: SparkSession | None = None
    parts: list[DataFrame] = []
    for table, df in sorted(tables.items()):
        spark = spark or df.sparkSession
        pk = primary_keys[table]
        pk_cols = [pk] if isinstance(pk, str) else list(pk)
        missing = [c for c in pk_cols if c not in df.columns]
        if missing:
            raise ValueError(
                f"direct_mapping: {table} primary key column(s) "
                f"{missing} not in {df.columns}"
            )
        pairs = [
            F.struct(
                F.lit(type_predicate).alias("p"),
                F.lit(base + table).alias("o"),
            )
        ]
        for c in df.columns:
            pairs.append(
                F.struct(
                    F.lit(base + table + "#" + c).alias("p"),
                    F.col(c).cast("string").alias("o"),
                )
            )
        for fk_col, ref_table in fks.get(table, []):
            if fk_col not in df.columns:
                raise ValueError(
                    f"direct_mapping: {table} foreign key {fk_col} "
                    f"not in {df.columns}"
                )
            ref_pk = primary_keys[ref_table]
            if not isinstance(ref_pk, str):
                raise ValueError(
                    "direct_mapping: composite-key references need "
                    "matching column lists; single-column refs only "
                    f"(got {ref_table} pk {ref_pk})"
                )
            pairs.append(
                F.struct(
                    F.lit(base + table + "#ref-" + fk_col).alias("p"),
                    F.concat(
                        F.lit(base + ref_table + "/" + ref_pk + "="),
                        F.col(fk_col).cast("string"),
                    ).alias("o"),
                )
            )
        exploded = (
            df.select(
                _subject_expr(table, pk_cols, base).alias("subj"),
                F.explode(F.array(*pairs)).alias("po"),
            )
            .where(F.col("subj").isNotNull() & F.col("po.o").isNotNull())
            .select(
                "subj",
                F.col("po.p").alias("predicate"),
                F.col("po.o").alias("obj"),
            )
        )
        parts.append(exploded)
    if not parts:
        raise ValueError("direct_mapping: no tables given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _template_expr(template: str, columns: list[str], resolve=None):
    """Compile an R2RML string template (``rr:template``,
    https://www.w3.org/TR/r2rml/#from-template) — literal text with
    ``{column}`` references — into one concat expression. Any
    referenced column being NULL makes the whole term NULL (the spec's
    term-generation rule: no RDF term, hence no triple). Unbalanced or
    unknown references fail loudly at compile time, not per-row.
    ``resolve`` maps a logical column name to its physical name
    (referencing object maps rename parent columns to avoid child
    collisions); validation always runs against the LOGICAL names."""
    resolve = resolve or (lambda c: c)
    out = []
    i = 0
    while i < len(template):
        j = template.find("{", i)
        if j < 0:
            out.append(F.lit(template[i:]))
            break
        if j > i:
            out.append(F.lit(template[i:j]))
        k = template.find("}", j)
        if k < 0:
            raise ValueError(f"r2rml template {template!r}: unclosed '{{'")
        col = template[j + 1:k]
        if col not in columns:
            raise ValueError(
                f"r2rml template {template!r}: column {col!r} not in "
                f"{columns}"
            )
        out.append(F.col(resolve(col)).cast("string"))
        i = k + 1
    if not out:
        raise ValueError("r2rml template is empty")
    return F.concat(*out)  # concat is NULL if ANY part is NULL


def _term_expr(term, columns: list[str], resolve=None):
    """One R2RML term map: ``{"template": ...}`` / ``{"column": c}`` /
    ``{"constant": v}`` (rr:template / rr:column / rr:constant), or a
    bare string as template shorthand."""
    resolve = resolve or (lambda c: c)
    if isinstance(term, str):
        return _template_expr(term, columns, resolve)
    if not isinstance(term, dict) or len(term) != 1:
        raise ValueError(f"r2rml term map must be str or 1-key dict: {term!r}")
    (kind, v), = term.items()
    if kind == "template":
        return _template_expr(v, columns, resolve)
    if kind == "column":
        if v not in columns:
            raise ValueError(f"r2rml column {v!r} not in {columns}")
        return F.col(resolve(v)).cast("string")
    if kind == "constant":
        return F.lit(str(v))
    raise ValueError(f"r2rml term map kind {kind!r} not supported")


_TERM_META_KEYS = {"term_type", "language", "datatype"}
_TERM_TYPES = {"IRI": "iri", "Literal": "literal", "BlankNode": "bnode"}


def _object_term_parts(term, columns: list[str], resolve=None):
    """One R2RML OBJECT term map with term metadata
    (https://www.w3.org/TR/r2rml/#termtype, #language, #datatype) —
    returns ``(lexical_expr, kind, lang, dtype)`` where kind is the
    ``iri | literal | bnode`` vocabulary of
    ``sources.rdf.parse_ntriples`` and lang/dtype are per-map
    CONSTANTS (R2RML term maps carry one rr:language / rr:datatype
    each, so these never become row expressions).

    Defaults per spec §7.4.4: column-based maps and any map carrying
    rr:language / rr:datatype are Literals; template / constant maps
    in object position are IRIs. rr:language with rr:datatype is
    ill-formed, as is either on a non-Literal term type."""
    if isinstance(term, str):
        return _template_expr(term, columns, resolve), "iri", None, None
    if not isinstance(term, dict) or not term:
        raise ValueError(
            f"r2rml term map must be str or dict: {term!r}"
        )
    meta = {k: term[k] for k in _TERM_META_KEYS if k in term}
    core = {k: v for k, v in term.items() if k not in _TERM_META_KEYS}
    if len(core) != 1:
        raise ValueError(
            "r2rml term map needs exactly one of template/column/"
            f"constant (plus optional {sorted(_TERM_META_KEYS)}): "
            f"{term!r}"
        )
    expr = _term_expr(core, columns, resolve)
    lang = meta.get("language")
    dtype = meta.get("datatype")
    if lang is not None and dtype is not None:
        raise ValueError(
            f"r2rml term map {term!r}: rr:language and rr:datatype "
            "are mutually exclusive"
        )
    tt = meta.get("term_type")
    if tt is None:
        kind_key = next(iter(core))
        tt = (
            "Literal"
            if kind_key == "column" or lang is not None
            or dtype is not None
            else "IRI"
        )
    if tt not in _TERM_TYPES:
        raise ValueError(
            f"r2rml term_type {tt!r} not one of {sorted(_TERM_TYPES)}"
        )
    if tt != "Literal" and (lang is not None or dtype is not None):
        raise ValueError(
            f"r2rml term map {term!r}: rr:language / rr:datatype "
            "require term type Literal"
        )
    return expr, _TERM_TYPES[tt], lang, dtype


def _referenced_columns(term) -> set[str]:
    """Column names a term map reads (for pre-join column pruning)."""
    if isinstance(term, dict):
        if "column" in term:
            return {term["column"]}
        if "constant" in term:
            return set()
        term = term.get("template", "")
    refs = set()
    i = 0
    while True:
        j = term.find("{", i)
        if j < 0:
            return refs
        k = term.find("}", j)
        if k < 0:
            return refs  # unclosed brace: _template_expr raises later
        refs.add(term[j + 1:k])
        i = k + 1


def _referencing_part(
    tables: dict[str, DataFrame],
    triples_maps: list[dict],
    child: DataFrame,
    child_subject,
    pred: str,
    spec: dict,
    graph_expr=None,
) -> DataFrame:
    """One R2RML referencing object map (rr:parentTriplesMap +
    rr:joinCondition, https://www.w3.org/TR/r2rml/#foreign-key):
    ``{"ref": {"table": parent, "join": [(child_col, parent_col), ...],
    "subject": optional override, "broadcast": bool}}``. This is the
    path for parent keys a template CANNOT address (the parent subject
    is built from columns other than the join key), so the engine pays
    the spec's joint query: an inner equi-join — NULL join keys drop per
    SQL semantics, which is the spec's behavior. The parent side is
    projected to (join cols + subject-template cols) BEFORE the join so
    only the needed columns shuffle; ``broadcast=True`` pins a broadcast
    hash join for dimension-sized parents (else stats/AQE decide)."""
    for req in ("table", "join"):
        if req not in spec:
            raise ValueError(f"r2rml ref map missing {req!r}: {spec!r}")
    parent_name = spec["table"]
    if parent_name not in tables:
        raise ValueError(
            f"r2rml ref parent table {parent_name!r} not in "
            f"{sorted(tables)}"
        )
    join = list(spec["join"])
    if not join:
        raise ValueError("r2rml ref map needs >=1 join condition")
    if "subject" in spec:
        parent_subject = spec["subject"]
    else:
        cands = [m for m in triples_maps if m["table"] == parent_name]
        if len(cands) != 1:
            raise ValueError(
                f"r2rml ref to {parent_name!r}: {len(cands)} triples maps "
                "declare that table — give the ref an explicit 'subject'"
            )
        parent_subject = cands[0]["subject"]
    parent = tables[parent_name]
    pcols = parent.columns
    ccols = child.columns
    for cc, pc in join:
        if cc not in ccols:
            raise ValueError(f"r2rml ref join child column {cc!r} not in "
                             f"{ccols}")
        if pc not in pcols:
            raise ValueError(f"r2rml ref join parent column {pc!r} not in "
                             f"{pcols}")
    prefix = "__r2rml_parent_"
    obj = _term_expr(parent_subject, pcols, resolve=lambda c: prefix + c)
    # prune the parent to join keys + subject columns before the join
    needed = {pc for _, pc in join} | _referenced_columns(parent_subject)
    renamed = parent.select(
        *[F.col(c).alias(prefix + c) for c in pcols if c in needed]
    )
    if spec.get("broadcast"):
        renamed = F.broadcast(renamed)
    cond = None
    for cc, pc in join:
        c = F.col(cc) == F.col(prefix + pc)
        cond = c if cond is None else (cond & c)
    return (
        child.join(renamed, cond)
        .select(
            (graph_expr if graph_expr is not None else F.lit(""))
            .alias("graph"),
            child_subject.alias("subj"),
            F.lit(pred).alias("predicate"),
            obj.alias("obj"),
            F.lit("iri").alias("obj_kind"),  # a parent subject is an IRI
            F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("string").alias("dtype"),
        )
        .where(
            F.col("subj").isNotNull() & F.col("obj").isNotNull()
            & F.col("graph").isNotNull()
        )
    )


_R2RML_OUTPUTS = ("triples", "terms", "quads")


def r2rml_mapping(
    tables: dict[str, DataFrame],
    triples_maps: list[dict],
    type_predicate: str = "rdf:type",
    output: str = "triples",
) -> DataFrame:
    """Customizable relational->RDF mapping: the R2RML triples-map
    core (https://www.w3.org/TR/r2rml/) with rr:template /
    rr:column / rr:constant term maps. Each triples map is::

        {"table": "customer",                      # logical table
         "subject": "cust/{c_custkey}",            # subject map
         "class": "Customer",                      # optional rr:class
         "predicate_objects": [                    # predicate-object maps
             ("hasName",   {"column": "c_name"}),
             ("inNation",  "nation/{c_nationkey}"),  # template shorthand
             ("sourcedBy", {"constant": "tpch"}),
         ]}

    Cross-table references keep the Direct Mapping's zero-join
    property where a template can address the parent: an object
    template over the FK column VALUE is the referenced subject IRI,
    so R2RML's join is redundant and this engine never pays it. When
    the parent subject is built from columns the child does NOT hold
    (the case rr:parentTriplesMap + rr:joinCondition exists for), a
    referencing object map ``("pred", {"ref": {"table": parent,
    "join": [(child_col, parent_col), ...]}})`` pays the spec's joint
    query as one pruned equi-join — see :func:`_referencing_part`.
    NULL handling per spec: a NULL in any referenced column suppresses
    that one triple; a NULL subject suppresses the row; NULL join keys
    never match. Plan: one scan per triples map with the row fan-out
    exploded in the same narrow stage (no shuffle), plus one join per
    referencing map over a column-pruned (broadcastable) parent.

    ``output`` selects the projection — the plan is identical, columns
    beyond the requested set are pruned by Catalyst before the scan:

    - ``"triples"`` (default): ``(subj, predicate, obj)``.
    - ``"terms"``: + ``obj_kind`` / ``lang`` / ``dtype`` carrying each
      object map's rr:termType / rr:language / rr:datatype (see
      :func:`_object_term_parts`) in the vocabulary of
      ``sources.rdf.parse_ntriples`` — feed it straight to
      ``operators.shacl.shacl_validate_terms``.
    - ``"quads"``: + leading ``graph`` column from the triples map's
      ``"graph"`` term map (rr:graphMap — template/column/constant
      over the SAME logical row, so a per-row graph costs nothing);
      maps without one emit ``""``, the default graph. A NULL graph
      term suppresses the quad (spec term-generation rule)."""
    if output not in _R2RML_OUTPUTS:
        raise ValueError(
            f"r2rml_mapping: output {output!r} not in {_R2RML_OUTPUTS}"
        )
    parts: list[DataFrame] = []
    for tm in triples_maps:
        df = tables[tm["table"]]
        cols = df.columns
        subj_expr = _term_expr(tm["subject"], cols)
        graph_expr = (
            _term_expr(tm["graph"], cols) if "graph" in tm else None
        )
        pairs = []
        refs = []
        if "class" in tm:
            pairs.append(
                F.struct(
                    F.lit(type_predicate).alias("p"),
                    F.lit(tm["class"]).alias("o"),
                    F.lit("iri").alias("k"),
                    F.lit(None).cast("string").alias("la"),
                    F.lit(None).cast("string").alias("dt"),
                )
            )
        for pred, term in tm.get("predicate_objects", []):
            if isinstance(term, dict) and "ref" in term:
                if len(term) != 1:
                    raise ValueError(
                        f"r2rml ref term map must be exactly "
                        f"{{'ref': ...}}: {term!r}"
                    )
                refs.append((pred, term["ref"]))
                continue
            o_expr, kind, lang, dtype = _object_term_parts(term, cols)
            pairs.append(
                F.struct(
                    F.lit(pred).alias("p"),
                    o_expr.alias("o"),
                    F.lit(kind).alias("k"),
                    F.lit(lang).cast("string").alias("la"),
                    F.lit(dtype).cast("string").alias("dt"),
                )
            )
        if not pairs and not refs:
            raise ValueError(
                f"triples map for {tm['table']!r} emits nothing: give it "
                "a class or at least one predicate-object map"
            )
        if pairs:
            parts.append(
                df.select(
                    (graph_expr if graph_expr is not None else F.lit(""))
                    .alias("graph"),
                    subj_expr.alias("subj"),
                    F.explode(F.array(*pairs)).alias("po"),
                )
                .where(
                    F.col("subj").isNotNull() & F.col("po.o").isNotNull()
                    & F.col("graph").isNotNull()
                )
                .select(
                    "graph",
                    "subj",
                    F.col("po.p").alias("predicate"),
                    F.col("po.o").alias("obj"),
                    F.col("po.k").alias("obj_kind"),
                    F.col("po.la").alias("lang"),
                    F.col("po.dt").alias("dtype"),
                )
            )
        for pred, spec in refs:
            parts.append(
                _referencing_part(
                    tables, triples_maps, df, subj_expr, pred, spec,
                    graph_expr=graph_expr,
                )
            )
    if not parts:
        raise ValueError("r2rml_mapping: no triples maps given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if output == "triples":
        return out.select("subj", "predicate", "obj")
    if output == "terms":
        return out.select(
            "subj", "predicate", "obj", "obj_kind", "lang", "dtype"
        )
    return out


def direct_mapping_python_twin(
    tables: dict[str, list[dict]],
    primary_keys: dict[str, str | list[str]],
    foreign_keys: dict[str, list[tuple[str, str]]] | None = None,
    base: str = "",
    type_predicate: str = "rdf:type",
) -> list[tuple[str, str, str]]:
    """Independent plain-Python Direct Mapping (rows as dicts) for
    exactness tests — same spec, zero Spark."""
    fks = foreign_keys or {}
    out: list[tuple[str, str, str]] = []
    for table, rows in sorted(tables.items()):
        pk = primary_keys[table]
        pk_cols = [pk] if isinstance(pk, str) else list(pk)
        for row in rows:
            if any(row.get(c) is None for c in pk_cols):
                continue
            subj = base + table + "/" + ";".join(
                f"{c}={row[c]}" for c in pk_cols
            )
            out.append((subj, type_predicate, base + table))
            for c, v in row.items():
                if v is not None:
                    out.append((subj, base + table + "#" + c, str(v)))
            for fk_col, ref_table in fks.get(table, []):
                v = row.get(fk_col)
                if v is not None:
                    ref_pk = primary_keys[ref_table]
                    out.append(
                        (
                            subj,
                            base + table + "#ref-" + fk_col,
                            f"{base}{ref_table}/{ref_pk}={v}",
                        )
                    )
    return out
