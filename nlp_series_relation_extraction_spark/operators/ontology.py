"""RDFS + linear-OWL-RL entailment materialization (rules rdfs2/rdfs3/
rdfs7/rdfs9 plus prp-inv/prp-symp) over a large fact table.

The ontology — ``rdfs:subClassOf`` / ``rdfs:subPropertyOf`` /
``rdfs:domain`` / ``rdfs:range`` statements — is SCHEMA-sized metadata
(thousands of rows even for the largest public KGs), so its transitive
closures are computed driver-side from a bounded collect (same contract
as tokenizer vocabularies and ANN codebooks: model/schema artifacts may
visit the driver, data never does).

The four rules are then COMPILED into per-predicate / per-class lookup
tables embedded as ``map<string, array<string>>`` literal columns:

- ``fwd[p]``  — predicates q with a same-orientation derivation from p
  (rdfs7 chains, possibly through an EVEN number of inverse flips);
- ``rev[p]``  — predicates q derived with flipped orientation (an odd
  number of prp-inv / prp-symp flips): fact (s,p,o) emits (o,q,s);
- ``subj_types[p]`` / ``obj_types[p]`` — class-closure of the domains/
  ranges contributed by EVERY derived orientation (rdfs2/3 composed
  with rdfs9 and the flips, so a domain declared on a superproperty —
  or on the inverse's superproperty — fires for the asserted fact);
- ``cls[c]``  — strict superclasses of c (rdfs9).

The FACT table is scanned exactly ONCE: each row ``explode``s its own
entailments via ``transform`` over the map lookups — the executed plan
contains no join at all, and the final ``distinct`` is the plan's only
exchange. At 100 TB this is a single scan, map-side fan-out bounded by
the closure depth, and one shuffle on the output key (droppable when
the result feeds the existing dedup/merge stages).

The reference repo has no ontology layer — this belongs to the
beyond-reference KG-construction surface (canonicalized triples ->
typed, schema-closed triples). Semantics follow the public W3C RDF
Schema 1.1 entailment rules.
"""

from __future__ import annotations

from ..functions.smalldf import local_df

from collections import defaultdict

from pyspark.sql import DataFrame, functions as F
from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats
from ..functions.partitioning import checkpoint_with_metrics as _ckpt_metrics

TYPE_PREDICATE = "type"


def transitive_closure(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Strict transitive closure of a small relation, cycle-safe
    (BFS from every mentioned node; a node inside a cycle reaches
    itself, which the entailment union/distinct tolerates)."""
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
    out: list[tuple[str, str]] = []
    for n in sorted(adj):
        seen: set[str] = set()
        stack = list(adj[n])
        while stack:
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            stack.extend(adj.get(c, ()))
        out.extend((n, m) for m in sorted(seen))
    return out


def _map_of_lists(d: dict[str, list[str]]):
    """A ``map<string, array<string>>`` literal column from a driver-side
    dict. Returns None for an empty dict (lookup sites substitute an
    empty array)."""
    if not d:
        return None
    keys = sorted(d)
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.array(*[F.lit(v) for v in d[k]]) for k in keys]),
    )


def _lookup(m, key_col):
    """``m[key]`` with a missing-key/empty-map default of array<string>()."""
    empty = F.array().cast("array<string>")
    if m is None:
        return empty
    return F.coalesce(m[key_col], empty)


def rdfs_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """Materialize the RDFS closure of ``facts`` under ``ontology``.

    ``facts``: columns ``(subj string, predicate string, obj string)``;
    rows with ``predicate == type_predicate`` are asserted class
    memberships (``obj`` is a class name), every other row a plain
    triple. ``ontology``: columns ``(s, p, o)`` with ``p`` in
    ``{subClassOf, subPropertyOf, equivalentClass, equivalentProperty,
    domain, range, inverseOf, symmetricProperty}`` (equivalences are
    the OWL 2 RL rules cax-eqc1/2 and prp-eqp1/2, compiled as mutual
    subsumption; inverseOf/symmetricProperty are the linear property
    rules prp-inv / prp-symp; for symmetricProperty the object column
    is ignored); must stay under ``max_ontology_rows`` (it is schema,
    not data).

    Returns the distinct union of the input facts and every triple the
    compiled rule set entails, same three columns. owl:TransitiveProperty
    is deliberately NOT here: its rule has two fact premises, so it
    needs recursion over the data — that is :func:`graph.forward_chain`
    / :func:`graph.match_path`'s job.
    """
    onto = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    comp = _compile_rules([tuple(r) for r in onto])

    m_gen = _map_of_lists(comp["fwd"])
    m_rev = _map_of_lists(comp["rev"])
    m_subj = _map_of_lists(comp["subj_types"])
    m_obj = _map_of_lists(comp["obj_types"])
    m_cls = _map_of_lists(comp["cls"])

    s, p, o = F.col("subj"), F.col("predicate"), F.col("obj")
    tp = F.lit(type_predicate)
    trip = lambda su, pr, ob: F.struct(  # noqa: E731
        su.alias("subj"), pr.alias("predicate"), ob.alias("obj")
    )
    fanout = F.when(
        p == tp,
        F.concat(
            F.array(trip(s, tp, o)),
            F.transform(_lookup(m_cls, o), lambda c: trip(s, tp, c)),
        ),
    ).otherwise(
        F.concat(
            F.array(trip(s, p, o)),
            F.transform(_lookup(m_gen, p), lambda q: trip(s, q, o)),
            F.transform(_lookup(m_rev, p), lambda q: trip(o, q, s)),
            F.transform(_lookup(m_subj, p), lambda c: trip(s, tp, c)),
            F.transform(_lookup(m_obj, p), lambda c: trip(o, tp, c)),
        )
    )
    return (
        facts.select(F.explode(fanout).alias("t"))
        .select("t.subj", "t.predicate", "t.obj")
        .distinct()
    )


def _compile_rules(onto: list[tuple[str, str, str]]) -> dict:
    """Driver-side rule compiler shared by :func:`rdfs_entailment` and
    its python twin: compose rdfs2/3/7/9 plus the LINEAR OWL-RL
    property rules prp-inv (``inverseOf``) and prp-symp
    (``symmetricProperty``) into per-predicate lookup tables.

    The derivation space for a fact with predicate p is a fixpoint over
    (orientation, predicate) states: ``fwd q`` emits (s, q, o), ``rev
    q`` emits (o, q, s); subPropertyOf preserves orientation, inverseOf
    flips it (and symmetricProperty is self-inverse). The fixpoint is
    over the SCHEMA (≤ 2·|props| states), never the data — the output
    maps keep the fact-table plan zero-join, and every added rule stays
    one-fact-premise, so incremental maintenance stays exact."""
    by_kind: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for s, k, o in onto:
        by_kind[k].append((s, o))
    # OWL 2 RL equivalence axioms are exactly mutual subsumption
    # (W3C owl2-profiles §4.3: cax-eqc1/cax-eqc2 are the two subClassOf
    # directions of equivalentClass; prp-eqp1/prp-eqp2 likewise for
    # equivalentProperty) — expanding them here makes every downstream
    # consumer (rdfs9/rdfs7 lookups, domain/range typing, the state
    # fixpoint, incremental maintenance) inherit the rules for free,
    # and keeps the fact-table plan zero-join.
    subp_pairs = list(by_kind.get("subPropertyOf", []))
    for a, b in by_kind.get("equivalentProperty", []):
        subp_pairs += [(a, b), (b, a)]
    subc_pairs = list(by_kind.get("subClassOf", []))
    for a, b in by_kind.get("equivalentClass", []):
        subc_pairs += [(a, b), (b, a)]
    subp = dict_of_sets(subp_pairs)
    subc = dict_of_sets(transitive_closure(subc_pairs))
    dom = dict_of_sets(by_kind.get("domain", []))
    rng = dict_of_sets(by_kind.get("range", []))
    inv = dict_of_sets(by_kind.get("inverseOf", []))
    for a, b in by_kind.get("inverseOf", []):  # inverseOf is symmetric
        inv[b].add(a)
    for p_sym, _ in by_kind.get("symmetricProperty", []):
        inv[p_sym].add(p_sym)  # prp-symp == self-inverse

    def _cls_full(cs: set[str]) -> list[str]:
        out = set(cs)
        for c in cs:
            out |= subc.get(c, set())
        return sorted(out)

    props = set(subp) | set(dom) | set(rng) | set(inv)
    fwd: dict[str, list[str]] = {}
    rev: dict[str, list[str]] = {}
    subj_types: dict[str, list[str]] = {}
    obj_types: dict[str, list[str]] = {}
    for p in props:
        states = {("f", p)}
        stack = [("f", p)]
        while stack:
            orient, q = stack.pop()
            flip = "r" if orient == "f" else "f"
            for r in subp.get(q, ()):  # rdfs7 preserves orientation
                if (orient, r) not in states:
                    states.add((orient, r))
                    stack.append((orient, r))
            for r in inv.get(q, ()):  # prp-inv / prp-symp flip it
                if (flip, r) not in states:
                    states.add((flip, r))
                    stack.append((flip, r))
        fwd[p] = sorted(q for ori, q in states if ori == "f" and q != p)
        rev[p] = sorted(q for ori, q in states if ori == "r")
        # rdfs2/3 over every derived orientation: a fwd q types s by
        # domain(q) / o by range(q); a rev q types o by domain(q) / s
        # by range(q) (the derived fact's subject IS the original obj)
        st = set().union(
            *(dom.get(q, set()) for ori, q in states if ori == "f"),
            *(rng.get(q, set()) for ori, q in states if ori == "r"),
        )
        ot = set().union(
            *(rng.get(q, set()) for ori, q in states if ori == "f"),
            *(dom.get(q, set()) for ori, q in states if ori == "r"),
        )
        subj_types[p] = _cls_full(st)
        obj_types[p] = _cls_full(ot)
    return {
        "fwd": {k: v for k, v in fwd.items() if v},
        "rev": {k: v for k, v in rev.items() if v},
        "subj_types": {k: v for k, v in subj_types.items() if v},
        "obj_types": {k: v for k, v in obj_types.items() if v},
        "cls": {
            k: sorted(v - {k}) for k, v in subc.items() if v - {k}
        },
    }


def rdfs_entailment_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Pure-python twin of :func:`rdfs_entailment`: the SAME compiled
    maps (shared :func:`_compile_rules`), applied per fact row exactly
    as the Spark fanout does — for exactness tests."""
    comp = _compile_rules(list(ontology))
    out: set[tuple[str, str, str]] = set()
    for s, p, o in facts:
        out.add((s, p, o))
        if p == type_predicate:
            for c in comp["cls"].get(o, ()):
                out.add((s, type_predicate, c))
            continue
        for q in comp["fwd"].get(p, ()):
            out.add((s, q, o))
        for q in comp["rev"].get(p, ()):
            out.add((o, q, s))
        for c in comp["subj_types"].get(p, ()):
            out.add((s, type_predicate, c))
        for c in comp["obj_types"].get(p, ()):
            out.add((o, type_predicate, c))
    return out


def dict_of_sets(pairs: list[tuple[str, str]]) -> dict[str, set[str]]:
    d: dict[str, set[str]] = defaultdict(set)
    for a, b in pairs:
        d[a].add(b)
    return d


def _transitive_pairs(onto: list[tuple[str, str, str]]) -> list[str]:
    """Predicates declared ``owl:TransitiveProperty`` in an ontology
    row list (object column ignored, same convention as prp-symp)."""
    return sorted({s for s, k, _ in onto if k == "transitiveProperty"})


def _transitive_fixpoint(
    acc: DataFrame, delta: DataFrame, max_rounds: int
) -> DataFrame:
    """Predicate-keyed transitive fixpoint shared by the batch and
    incremental prp-trp operators. ``acc``/``delta`` have columns
    ``(subj, predicate, obj)``; ``delta ⊆ acc`` and every pair of the
    true closure missing from ``acc`` must use at least one ``delta``
    pair (batch seeds acc = delta = the asserted edges; the increment
    seeds acc = existing ∪ new, delta = new).

    Semi-naive DOUBLING: each round composes the previous round's
    delta with the FULL accumulated set on BOTH sides —
    ``new = (delta ∘ acc) ∪ (acc ∘ delta)`` keyed on
    (predicate, join vertex) — then anti-joins what is already known.
    Reachable chain length doubles per round, so ``max_rounds`` = 20
    covers 10^6-hop chains; the anti-join makes cyclic graphs
    terminate. The price of the log-round count is that a composition
    may re-derive pairs the anti-join then drops — on deep-and-narrow
    hierarchies a linear ``delta ∘ base`` loop (graph.match_path's
    shape) does strictly less join work per pair but needs
    diameter-many rounds; doubling is the right default when the
    driver pays per-round job-launch latency, i.e. everywhere short
    of thousand-hop chains.

    Each round's delta is localCheckpointed (flat lineage) and the
    empty-delta check is the round's one action. Join keys are
    (predicate, vertex) — the vertex component keeps hub predicates
    from collapsing onto single tasks; AQE's skew handling covers hub
    VERTICES, the same contract as the linking join."""
    acc = acc.transform(_ckpt_nostats)
    delta = delta.transform(_ckpt_nostats)
    for _ in range(max_rounds):
        left = delta.select(
            "subj", "predicate", F.col("obj").alias("mid")
        ).join(
            acc.select(
                F.col("subj").alias("mid"), "predicate", "obj"
            ),
            ["predicate", "mid"],
        )
        right = acc.select(
            "subj", "predicate", F.col("obj").alias("mid")
        ).join(
            delta.select(
                F.col("subj").alias("mid"), "predicate", "obj"
            ),
            ["predicate", "mid"],
        )
        delta, _m = _ckpt_metrics(
            left.unionByName(right)
            .select("subj", "predicate", "obj")
            .distinct()
            .join(acc, ["subj", "predicate", "obj"], "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _m["n"]:
            break
        acc = acc.unionByName(delta).transform(_ckpt_nostats)
    return acc


def owl_transitive_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    max_rounds: int = 20,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """OWL-RL rule prp-trp: materialize the transitive closure of every
    predicate the ontology declares ``owl:TransitiveProperty``, in ONE
    predicate-keyed plan (no per-predicate driver loop).

    This is the rule :func:`rdfs_entailment` deliberately excludes —
    two fact premises, so it cannot compile into per-row map lookups
    and must recurse over the data. Facts on undeclared predicates
    pass through untouched. Returns the distinct union
    (subj, predicate, obj), same contract as the linear operator.

    ``max_rounds`` caps the doubling loop (2^20-hop chains at the
    default); like match_path/forward_chain, hitting the cap returns
    the partial closure. Cycles are safe: the anti-join starves the
    frontier once every reachable pair is known."""
    onto = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    trans = _transitive_pairs([tuple(r) for r in onto])
    base = facts.select("subj", "predicate", "obj").distinct()
    if not trans:
        return base
    tfacts = base.where(F.col("predicate").isin(trans))
    closed = _transitive_fixpoint(tfacts, tfacts, max_rounds)
    return base.unionByName(closed).distinct()


def owl_transitive_increment(
    existing: DataFrame,
    new_facts: DataFrame,
    ontology: DataFrame,
    max_rounds: int = 20,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """The DELTA a new batch of facts adds to an existing prp-trp
    closure — the transitive counterpart of
    :func:`rdfs_entailment_increment`, but NOT a single-pass rewrite:
    prp-trp has two fact premises, so the increment must join against
    the existing closure. Every new closure pair is an alternation of
    existing-closure segments and new edges, and the doubling loop
    absorbs one alternation level per round — per-batch cost tracks
    (new edges × touched closure region), never the full table.

    ``existing`` must already be transitively closed (the previous
    output); the result is disjoint from it by construction, so
    appending through the bucket-pruned streaming sink reproduces the
    batch closure exactly."""
    onto = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    trans = _transitive_pairs([tuple(r) for r in onto])
    cols = ["subj", "predicate", "obj"]
    new = new_facts.select(*cols).distinct().join(
        existing.select(*cols), cols, "left_anti"
    )
    if not trans:
        return new
    new = new.transform(_ckpt_nostats)
    tdelta = new.where(F.col("predicate").isin(trans))
    tacc = (
        existing.select(*cols)
        .where(F.col("predicate").isin(trans))
        .unionByName(tdelta)
    )
    closed = _transitive_fixpoint(tacc, tdelta, max_rounds)
    return (
        new.unionByName(closed)
        .distinct()
        .join(existing.select(*cols), cols, "left_anti")
    )


def owl_rl_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    max_rounds: int = 20,
    max_outer: int = 6,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """The full supported OWL-RL subset to FIXPOINT: alternate the
    compiled linear pass (rdfs2/3/7/9 + prp-inv/prp-symp,
    :func:`rdfs_entailment`) with prp-trp closure
    (:func:`owl_transitive_entailment`) until neither derives anything
    new.

    The alternation is required, not cosmetic: a subproperty can FEED
    a transitive predicate (its pairs must exist before the closure
    runs), and closure-derived pairs TRIGGER linear rules again
    (domain/range typing of endpoints only reachable transitively,
    superproperties of the transitive predicate). Each direction of
    feeding costs one outer round; real ontologies converge in 2-3
    (the loop exits the first time the transitive delta is empty).
    The linear re-pass runs on the transitive DELTA only
    (:func:`rdfs_entailment_increment` — exact because the linear
    rules are one-fact-premise), so outer rounds never rescan the
    accumulated closure.

    ``owl:propertyChainAxiom`` declarations (prp-spo2,
    :func:`owl_chain_entailment`) join the same fixpoint: when chains
    are present the non-linear pass runs the generalized
    :func:`_step_fixpoint` over a persistent WORKSET that keeps the
    reserved-prefix decomposition intermediates alive across outer
    rounds — dropping aux pairs between rounds would lose compositions
    whose left prefix is old and whose tail edge arrives from a later
    linear delta. Aux pairs never enter the returned closure."""
    onto_rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto_rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    rows = [tuple(r) for r in onto_rows]
    trans = _transitive_pairs(rows)
    chains = _chain_axioms(rows)
    closure = rdfs_entailment(
        facts, ontology, type_predicate, max_ontology_rows
    ).transform(_ckpt_nostats)
    if not trans and not chains:
        return closure
    cols = ["subj", "predicate", "obj"]
    if chains:
        return _owl_rl_with_chains(
            closure, ontology, chains, trans, max_rounds, max_outer,
            type_predicate, max_ontology_rows,
        )
    # frontier = pairs not yet seen by a transitive pass; round 1 is the
    # whole linear closure (the batch case), later rounds the linear
    # delta only — every still-missing pair must use one of them.
    frontier = closure
    for _ in range(max_outer):
        tpairs = closure.where(F.col("predicate").isin(trans))
        closed = _transitive_fixpoint(
            tpairs,
            frontier.where(F.col("predicate").isin(trans)),
            max_rounds,
        )
        tdelta, _tm = _ckpt_metrics(
            closed.join(closure.select(*cols), cols, "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _tm["n"]:
            break
        ldelta = rdfs_entailment_increment(
            closure, tdelta, ontology, type_predicate, max_ontology_rows
        ).transform(_ckpt_nostats)
        closure = closure.unionByName(ldelta).transform(_ckpt_nostats)
        frontier = ldelta
    return closure


def _owl_rl_with_chains(
    closure: DataFrame,
    ontology: DataFrame,
    chains: list[tuple[str, list[str]]],
    trans: list[str],
    max_rounds: int,
    max_outer: int,
    type_predicate: str,
    max_ontology_rows: int,
) -> DataFrame:
    """The chain-bearing body of :func:`owl_rl_entailment`: alternate
    the linear pass with the generalized step fixpoint. ``work`` is the
    accumulated step-closed set INCLUDING aux intermediates (kept
    across outer rounds so prefixes survive); each outer round feeds
    only the linear delta's involved pairs back in as the semi-naive
    frontier."""
    cols = ["subj", "predicate", "obj"]
    if not closure.where(
        F.col("predicate").startswith(_CHAIN_AUX_PREFIX)
    ).isEmpty():
        raise ValueError(
            f"facts use the reserved predicate prefix "
            f"{_CHAIN_AUX_PREFIX!r}"
        )
    steps = _chain_steps(chains, trans)
    involved = _step_input_preds(steps)
    work = closure.where(F.col("predicate").isin(involved))
    frontier = work
    for _ in range(max_outer):
        work = _step_fixpoint(work, frontier, steps, max_rounds)
        derived = work.where(
            ~F.col("predicate").startswith(_CHAIN_AUX_PREFIX)
        )
        sdelta, _sm = _ckpt_metrics(
            derived.join(closure.select(*cols), cols, "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _sm["n"]:
            break
        ldelta = rdfs_entailment_increment(
            closure, sdelta, ontology, type_predicate, max_ontology_rows
        ).transform(_ckpt_nostats)
        closure = closure.unionByName(ldelta).transform(_ckpt_nostats)
        # only linear-delta pairs the step plan can consume, and not
        # already in the workset (sdelta pairs re-entered via ldelta)
        frontier, _fm = _ckpt_metrics(
            ldelta.where(F.col("predicate").isin(involved))
            .join(work, cols, "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _fm["n"]:
            break
        work = work.unionByName(frontier).transform(_ckpt_nostats)
    return closure


def owl_transitive_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
) -> set[tuple[str, str, str]]:
    """Naive-fixpoint python twin of :func:`owl_transitive_entailment`
    (independent algorithm: per-predicate BFS, not doubling)."""
    trans = set(_transitive_pairs(list(ontology)))
    out = set(facts)
    adj: dict[tuple[str, str], set[str]] = defaultdict(set)
    for s, p, o in facts:
        if p in trans:
            adj[(p, s)].add(o)
    for p, s in list(adj):
        seen: set[str] = set()
        stack = list(adj[(p, s)])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get((p, n), ()))
        out |= {(s, p, n) for n in seen}
    return out


def owl_rl_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Naive outer fixpoint of linear-pass ∘ non-linear-pass — the
    independent oracle for :func:`owl_rl_entailment` (the non-linear
    pass is the chain twin, whose transitive handling is the (p,p)
    special case, so declarations of either kind are covered)."""
    out = rdfs_entailment_python_twin(
        list(facts), list(ontology), type_predicate
    )
    while True:
        grown = owl_chain_python_twin(sorted(out), list(ontology))
        grown = rdfs_entailment_python_twin(
            sorted(grown), list(ontology), type_predicate
        )
        if grown == out:
            return out
        out = grown


_CHAIN_AUX_PREFIX = "__chain__"


def _chain_axioms(
    onto: list[tuple[str, str, str]],
) -> list[tuple[str, list[str]]]:
    """``owl:propertyChainAxiom`` declarations from an ontology row
    list. Convention: row ``(q, "propertyChain", "p1/p2/.../pn")``
    declares p1 ∘ p2 ∘ ... ∘ pn ⊑ q (OWL 2 RL rule prp-spo2; the '/'
    separator mirrors the property-path syntax in graph.match_path).
    Transitivity is the special case q = "p/p" with q == p — declare
    that via ``transitiveProperty`` instead (handled by prp-trp)."""
    out: list[tuple[str, list[str]]] = []
    for s, k, o in onto:
        if k != "propertyChain":
            continue
        parts = str(o).split("/")
        if len(parts) < 2 or any(not p for p in parts):
            raise ValueError(
                f"propertyChain for {s!r} must list >=2 '/'-separated "
                f"non-empty predicates, got {o!r}"
            )
        if any(
            p.startswith(_CHAIN_AUX_PREFIX) for p in parts + [s]
        ):
            raise ValueError(
                f"predicate prefix {_CHAIN_AUX_PREFIX!r} is reserved "
                "for chain decomposition intermediates"
            )
        out.append((s, parts))
    return sorted(out)


def _chain_steps(
    chains: list[tuple[str, list[str]]], trans: list[str]
) -> list[tuple[str, str, str]]:
    """Decompose chain axioms (plus transitive declarations) into
    BINARY composition steps ``(left_pred, right_pred, out_pred)``.
    A length-n chain left-folds through n-2 reserved-prefix
    intermediate predicates (p1∘p2 ⊑ aux1, aux1∘p3 ⊑ aux2, ...,
    aux∘pn ⊑ q) — the standard OWL 2 structural transformation — so
    ONE generic binary-composition plan serves every axiom length.
    A transitive declaration is exactly the step (p, p, p)."""
    steps: list[tuple[str, str, str]] = [(p, p, p) for p in trans]
    for i, (q, parts) in enumerate(chains):
        prev = parts[0]
        for j in range(1, len(parts)):
            out = q if j == len(parts) - 1 else (
                f"{_CHAIN_AUX_PREFIX}{i}_{j}"
            )
            steps.append((prev, parts[j], out))
            prev = out
    return steps


def _step_fixpoint(
    acc: DataFrame,
    delta: DataFrame,
    steps: list[tuple[str, str, str]],
    max_rounds: int,
) -> DataFrame:
    """Generalization of :func:`_transitive_fixpoint` from the single
    step (p, p, p) to an arbitrary rule table of binary composition
    steps: each round derives ``(s, op, o)`` from ``(s, lp, m)`` +
    ``(m, rp, o)`` for every step ``(lp, rp, op)``, composing the
    previous delta with the full accumulated set on BOTH sides, then
    anti-joins what is already known.

    The step table is schema-sized, so it rides along as a BROADCAST
    join pinned to each side's predicate column; the data join stays
    keyed on (vertex, predicate) — identical shuffle contract to the
    transitive loop. Semi-naive soundness needs the same invariant:
    any true-closure pair missing from ``acc`` must use >=1 ``delta``
    premise (pairs derivable purely from old facts were derived when
    those facts were themselves the delta). Cyclic rule tables
    (q ⊑ p∘q, mutual recursion) terminate via the anti-join exactly
    like transitive cycles; ``max_rounds`` caps pathological depth and
    hitting it returns the partial closure, same contract as
    match_path/forward_chain."""
    spark = acc.sparkSession
    steps_df = local_df(
        spark, steps, "lp string, rp string, op string"
    )
    acc = acc.transform(_ckpt_nostats)
    delta = delta.transform(_ckpt_nostats)
    for _ in range(max_rounds):
        delta, _dm = _ckpt_metrics(
            _step_compose(acc, delta, steps_df)
            .join(acc, ["subj", "predicate", "obj"], "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _dm["n"]:
            break
        acc = acc.unionByName(delta).transform(_ckpt_nostats)
    return acc


def _step_compose(
    acc: DataFrame, delta: DataFrame, steps_df: DataFrame
) -> DataFrame:
    """One :func:`_step_fixpoint` round's derivation (lazy — also the
    plan-pin surface): delta composed with acc on both sides through
    the broadcast step table."""
    left = (
        delta.join(
            F.broadcast(steps_df),
            delta["predicate"] == steps_df["lp"],
        )
        .select("subj", F.col("obj").alias("mid"), "rp", "op")
        .join(
            acc.select(
                F.col("subj").alias("mid"),
                F.col("predicate").alias("rp"),
                "obj",
            ),
            ["mid", "rp"],
        )
    )
    right = (
        acc.join(
            F.broadcast(steps_df),
            acc["predicate"] == steps_df["lp"],
        )
        .select("subj", F.col("obj").alias("mid"), "rp", "op")
        .join(
            delta.select(
                F.col("subj").alias("mid"),
                F.col("predicate").alias("rp"),
                "obj",
            ),
            ["mid", "rp"],
        )
    )
    return (
        left.unionByName(right)
        .select("subj", F.col("op").alias("predicate"), "obj")
        .distinct()
    )


def _step_input_preds(steps: list[tuple[str, str, str]]) -> list[str]:
    """Every predicate a step plan can CONSUME — left/right inputs plus
    outputs (an output can feed a later step: cascading axioms)."""
    return sorted(
        {lp for lp, _, _ in steps}
        | {rp for _, rp, _ in steps}
        | {op for _, _, op in steps}
    )


def owl_chain_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    max_rounds: int = 20,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """OWL-RL rule prp-spo2 (``owl:propertyChainAxiom``), with prp-trp
    as its built-in special case: materialize every chain-derived fact
    (u0 p1 u1, ..., u_{n-1} pn un ⟹ u0 q un) for every declared axiom,
    to fixpoint — axioms may CASCADE (one axiom's output predicate is
    another's input) and may be cyclically recursive (q ⊑ p∘q
    generalizes transitivity), both closed by the same semi-naive
    doubling loop.

    One generic plan serves all axioms: chains decompose into binary
    steps (:func:`_chain_steps`), the step table broadcasts, and
    :func:`_step_fixpoint` iterates composition rounds keyed on
    (vertex, predicate). Reserved-prefix intermediates never appear in
    the output. Facts on unmentioned predicates pass through
    untouched; no declarations means plain distinct.

    Input facts using the reserved ``__chain__`` predicate prefix are
    rejected loudly rather than silently swallowed by the final
    aux-filter."""
    onto = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    rows = [tuple(r) for r in onto]
    chains = _chain_axioms(rows)
    trans = _transitive_pairs(rows)
    base = facts.select("subj", "predicate", "obj").distinct()
    if not chains and not trans:
        return base
    if not base.where(
        F.col("predicate").startswith(_CHAIN_AUX_PREFIX)
    ).isEmpty():
        raise ValueError(
            f"facts use the reserved predicate prefix "
            f"{_CHAIN_AUX_PREFIX!r}"
        )
    steps = _chain_steps(chains, trans)
    involved = _step_input_preds(steps)
    work = base.where(F.col("predicate").isin(involved))
    closed = _step_fixpoint(work, work, steps, max_rounds).where(
        ~F.col("predicate").startswith(_CHAIN_AUX_PREFIX)
    )
    return base.unionByName(closed).distinct()


def owl_chain_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
) -> set[tuple[str, str, str]]:
    """Naive-fixpoint python twin of :func:`owl_chain_entailment` —
    independent algorithm: each axiom is applied as one n-way relational
    compose per round (no binary decomposition, no aux predicates,
    no semi-naive delta), looped until nothing new."""
    chains = _chain_axioms(list(ontology))
    chains += [(p, [p, p]) for p in _transitive_pairs(list(ontology))]
    out = set(facts)
    while True:
        new: set[tuple[str, str, str]] = set()
        for q, parts in chains:
            cur = {(s, o) for s, p, o in out if p == parts[0]}
            for pr in parts[1:]:
                nxt: dict[str, set[str]] = defaultdict(set)
                for s, p, o in out:
                    if p == pr:
                        nxt[s].add(o)
                cur = {
                    (s, o2) for s, o in cur for o2 in nxt.get(o, ())
                }
            new |= {(s, q, o) for s, o in cur}
        new -= out
        if not new:
            return out
        out |= new


_RESTRICTION_KINDS = ("hasValue", "someValuesFrom", "allValuesFrom")


def _class_restrictions(
    onto: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> dict[str, list[tuple[str, str, str]]]:
    """OWL class-restriction declarations from an ontology row list:
    row ``(C, kind, "p/filler")`` declares the restriction class C over
    property p with value/class filler (kind in hasValue /
    someValuesFrom / allValuesFrom; the '/' convention matches
    propertyChain — p must not contain '/', the filler may). Returns
    {kind: [(cls, prop, filler), ...]}. Restrictions on the type
    predicate itself are rejected — the rule pass distinguishes type
    facts from property facts by that predicate."""
    out: dict[str, list[tuple[str, str, str]]] = {
        k: [] for k in _RESTRICTION_KINDS
    }
    for s, k, o in onto:
        if k not in _RESTRICTION_KINDS:
            continue
        prop, sep, filler = str(o).partition("/")
        if not sep or not prop or not filler:
            raise ValueError(
                f"{k} for {s!r} must be 'property/filler', got {o!r}"
            )
        if prop == type_predicate:
            raise ValueError(
                f"{k} for {s!r} restricts the type predicate "
                f"{type_predicate!r} itself"
            )
        out[k].append((s, prop, filler))
    return {k: sorted(v) for k, v in out.items()}


def _class_rule_pass(
    acc: DataFrame,
    delta: DataFrame,
    hv: DataFrame,
    svf: DataFrame,
    avf: DataFrame,
    type_predicate: str,
) -> DataFrame:
    """One semi-naive round of the OWL 2 RL class rules (cls-hv1,
    cls-hv2, cls-svf1, cls-avf): every derivation with >=1 premise in
    ``delta``. The one-premise hasValue rules read the delta alone; the
    two-premise rules run BOTH delta-bound variants against ``acc``
    (``delta ⊆ acc``, so delta x delta pairs are covered). Restriction
    tables are schema-sized broadcasts; the two-premise joins key on
    (entity, property) — the same shuffle contract as the transitive
    fixpoint."""
    tp = F.lit(type_predicate)
    d_types = delta.where(F.col("predicate") == type_predicate)
    a_types = acc.where(F.col("predicate") == type_predicate).select(
        F.col("subj").alias("y"), F.col("obj").alias("filler")
    )
    a_edges = acc.where(F.col("predicate") != type_predicate).select(
        F.col("subj").alias("x"),
        F.col("predicate").alias("prop"),
        F.col("obj").alias("y"),
    )

    def triple(su, ob):
        return [su.alias("subj"), tp.alias("predicate"), ob.alias("obj")]

    # cls-hv1: (x type C) => (x p v)
    hv1 = d_types.join(F.broadcast(hv), d_types["obj"] == hv["cls"]).select(
        F.col("subj"),
        F.col("prop").alias("predicate"),
        F.col("filler").alias("obj"),
    )
    # cls-hv2: (x p v) => (x type C)
    hv2 = delta.join(
        F.broadcast(hv),
        (delta["predicate"] == hv["prop"]) & (delta["obj"] == hv["filler"]),
    ).select(*triple(delta["subj"], F.col("cls")))
    # cls-svf1: (x p y) + (y type D) => (x type C)
    svf_a = (
        delta.join(F.broadcast(svf), delta["predicate"] == svf["prop"])
        .select(
            delta["subj"].alias("x"),
            delta["obj"].alias("y"),
            "cls",
            "filler",
        )
        .join(a_types, ["y", "filler"])
        .select(*triple(F.col("x"), F.col("cls")))
    )
    svf_b = (
        d_types.join(F.broadcast(svf), d_types["obj"] == svf["filler"])
        .select(d_types["subj"].alias("y"), "prop", "cls")
        .join(a_edges, ["y", "prop"])
        .select(*triple(F.col("x"), F.col("cls")))
    )
    # cls-avf: (x type C) + (x p y) => (y type D)
    avf_a = (
        d_types.join(F.broadcast(avf), d_types["obj"] == avf["cls"])
        .select(d_types["subj"].alias("x"), "prop", "filler")
        .join(a_edges, ["x", "prop"])
        .select(*triple(F.col("y"), F.col("filler")))
    )
    avf_b = (
        delta.join(F.broadcast(avf), delta["predicate"] == avf["prop"])
        .select(
            delta["subj"].alias("x"),
            delta["obj"].alias("yy"),
            "cls",
            "filler",
        )
        .join(
            a_types.select(
                F.col("y").alias("x"), F.col("filler").alias("cls")
            ),
            ["x", "cls"],
        )
        .select(*triple(F.col("yy"), F.col("filler")))
    )
    out = hv1
    for part in (hv2, svf_a, svf_b, avf_a, avf_b):
        out = out.unionByName(part)
    return out


def owl_class_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_rounds: int = 20,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """OWL 2 RL CLASS rules (W3C OWL 2 Profiles section 4.3, the cls-*
    table) interleaved with the linear RDFS/property pass: hasValue in
    both directions (cls-hv1 derives the property fact from the type,
    cls-hv2 the type from the property fact), someValuesFrom
    (cls-svf1) and allValuesFrom (cls-avf), to fixpoint.

    The alternation mirrors :func:`owl_rl_entailment`: seed with the
    full linear closure, then each outer round (a) applies the class
    rules semi-naively (>=1 premise from the previous round's delta),
    (b) anti-joins what is known, and (c) pushes the genuinely new
    triples through :func:`rdfs_entailment_increment` so subclass /
    subproperty / domain / range consequences land before the next
    class pass — a derived type must climb the class hierarchy before
    a hasValue or allValuesFrom restriction on the SUPERCLASS can see
    it. Outer rounds are bounded by the restriction cascade depth
    (schema-shaped, small); each round's two-premise joins track the
    delta, never rescan the closure."""
    onto_rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto_rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    rows = [tuple(r) for r in onto_rows]
    res = _class_restrictions(rows, type_predicate)
    closure = rdfs_entailment(
        facts, ontology, type_predicate, max_ontology_rows
    ).transform(_ckpt_nostats)
    if not any(res.values()):
        return closure
    spark = facts.sparkSession
    schema = "cls string, prop string, filler string"
    hv = local_df(spark, res["hasValue"], schema)
    svf = local_df(spark, res["someValuesFrom"], schema)
    avf = local_df(spark, res["allValuesFrom"], schema)
    cols = ["subj", "predicate", "obj"]
    delta = closure
    for _ in range(max_rounds):
        derived = _class_rule_pass(
            closure, delta, hv, svf, avf, type_predicate
        )
        new, _nm = _ckpt_metrics(
            derived.distinct().join(closure, cols, "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _nm["n"]:
            break
        ldelta = rdfs_entailment_increment(
            closure, new, ontology, type_predicate, max_ontology_rows
        ).transform(_ckpt_nostats)
        closure = closure.unionByName(ldelta).transform(_ckpt_nostats)
        delta = ldelta
    return closure


def owl_class_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Naive-fixpoint python twin of :func:`owl_class_entailment` —
    independent algorithm: every class rule applied against the FULL
    set each round (no deltas, no broadcast tables), alternated with
    the linear twin, until nothing new."""
    res = _class_restrictions(list(ontology), type_predicate)
    out = rdfs_entailment_python_twin(
        list(facts), list(ontology), type_predicate
    )
    while True:
        new: set[tuple[str, str, str]] = set()
        for cls, prop, val in res["hasValue"]:
            for s, p, o in out:
                if p == type_predicate and o == cls:
                    new.add((s, prop, val))
                if p == prop and o == val:
                    new.add((s, type_predicate, cls))
        for cls, prop, fil in res["someValuesFrom"]:
            typed = {
                s for s, p, o in out if p == type_predicate and o == fil
            }
            new |= {
                (s, type_predicate, cls)
                for s, p, o in out
                if p == prop and o in typed
            }
        for cls, prop, fil in res["allValuesFrom"]:
            typed = {
                s for s, p, o in out if p == type_predicate and o == cls
            }
            new |= {
                (o, type_predicate, fil)
                for s, p, o in out
                if p == prop and s in typed
            }
        grown = rdfs_entailment_python_twin(
            sorted(out | new), list(ontology), type_predicate
        )
        if grown == out:
            return out
        out = grown


def disjoint_violations(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
    kind: str = "disjointWith",
) -> DataFrame:
    """OWL 2 RL consistency rule cax-dw (``owl:disjointWith``): report
    every entity typed by BOTH classes of a declared-disjoint pair —
    rows ``(subj, cls_a, cls_b)``, one per violated declaration in its
    declared orientation. Unlike the entailment operators this derives
    nothing: disjointness violations mean the DATA is inconsistent, and
    at KG-publication scale the right move is a report the pipeline
    gates on, not an exception mid-job. Run it on the materialized
    closure (violations through inferred types are the ones asserted
    typing misses). Plan: the type scan joined twice against the
    broadcast declaration table, keyed on (entity) — one shuffle.

    ``kind="complementOf"`` gives rule **cls-com** (table 7): in OWL 2
    RL, ``owl:complementOf`` is checkable only as the same
    both-classes-asserted falsehood — the profile derives no negative
    types, so the plan is identical and only the declaration keyword
    differs."""
    onto_rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto_rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    pairs = sorted(
        (s, str(o))
        for s, k, o in (tuple(r) for r in onto_rows)
        if k == kind
    )
    spark = facts.sparkSession
    dw = local_df(spark, pairs, "cls_a string, cls_b string")
    types = facts.where(F.col("predicate") == type_predicate).select(
        "subj", F.col("obj").alias("cls_a")
    )
    return (
        types.join(F.broadcast(dw), "cls_a")
        .join(
            facts.where(F.col("predicate") == type_predicate).select(
                "subj", F.col("obj").alias("cls_b")
            ),
            ["subj", "cls_b"],
        )
        .select("subj", "cls_a", "cls_b")
        .distinct()
    )


def negative_assertion_violations(
    facts: DataFrame,
    negatives: DataFrame,
) -> DataFrame:
    """OWL 2 RL consistency rules prp-npa1/prp-npa2
    (``owl:NegativePropertyAssertion``,
    https://www.w3.org/TR/owl2-profiles/#OWL_2_RL table 4): a negative
    assertion states ``(source, property, target)`` must NOT hold;
    both the object- and data-property rules reduce to the same check
    on a string triple store — report every negative assertion whose
    triple is asserted anyway. ``negatives`` rows are ``(subj,
    predicate, obj)`` like the facts themselves.

    Negative assertions are DATA-sized (one per flagged statement, a
    crowdsourced KG can carry millions), so this is a plain
    distributed equi-join on all three columns — no broadcast
    assumption, no windows, output bounded by |negatives|. Run it on
    the materialized closure so derived facts violate too."""
    return (
        negatives.select("subj", "predicate", "obj")
        .distinct()
        .join(
            facts.select("subj", "predicate", "obj").distinct(),
            ["subj", "predicate", "obj"],
        )
    )


def negative_assertion_python_twin(
    facts: list[tuple[str, str, str]],
    negatives: list[tuple[str, str, str]],
) -> set[tuple[str, str, str]]:
    """Plain-Python oracle for :func:`negative_assertion_violations`."""
    return set(facts) & set(negatives)


def different_from_violations(
    facts: DataFrame,
    entailed: DataFrame,
    same_as_predicate: str = "sameAs",
    different_predicate: str = "differentFrom",
) -> DataFrame:
    """OWL 2 RL consistency rule eq-diff1 (``owl:differentFrom``):
    report every asserted differentFrom pair whose two entities the
    equality entailment merged anyway — rows ``(subj, obj, canon)`` in
    the asserted orientation, ``canon`` the offending component's
    representative. Like :func:`disjoint_violations` this derives
    nothing: sameAs ∧ differentFrom means the DATA is inconsistent,
    and at publication scale the right move is a report the pipeline
    gates on, not an exception mid-job.

    ``facts`` carries the ORIGINAL assertions (eq-rep inside
    ``entailed`` rewrites differentFrom triples like any other fact,
    collapsing a violated pair to a self-loop — correct entailment,
    useless report); ``entailed`` carries the ``(x, sameAs,
    canonical)`` lineage rows :func:`owl_equality_entailment` returns.
    differentFrom pairs are DATA-sized, so both canonicalization joins
    are plain shuffles keyed on the id — no broadcast assumption,
    the same contract as eq-rep itself."""
    mapping = entailed.where(
        F.col("predicate") == same_as_predicate
    ).select(F.col("subj").alias("m_id"), F.col("obj").alias("m_canon"))
    diff = facts.where(
        F.col("predicate") == different_predicate
    ).select("subj", "obj").distinct()
    return (
        diff.join(mapping, diff["subj"] == mapping["m_id"], "left")
        .select(
            "subj", "obj",
            F.coalesce("m_canon", "subj").alias("canon_a"),
        )
        .join(mapping, F.col("obj") == mapping["m_id"], "left")
        .select(
            "subj", "obj", "canon_a",
            F.coalesce("m_canon", "obj").alias("canon_b"),
        )
        .where(F.col("canon_a") == F.col("canon_b"))
        .select("subj", "obj", F.col("canon_a").alias("canon"))
    )


def all_different_violations(
    ontology: DataFrame,
    entailed: DataFrame,
    same_as_predicate: str = "sameAs",
    members_predicate: str = "allDifferentMembers",
) -> DataFrame:
    """OWL 2 RL consistency rules eq-diff2/eq-diff3
    (``owl:AllDifferent`` with ``owl:members`` /
    ``owl:distinctMembers``): an axiom lists entities that must be
    pairwise distinct; the equality entailment merging ANY two of them
    is a contradiction. Axioms arrive the way OWL actually serializes
    them — ``(axiom, allDifferentMembers, list_head)`` rows in
    ``ontology`` alongside the list's own rdf:first/rdf:rest cons
    rows; :func:`..rdf_lists.flatten_rdf_lists` recovers the members
    (the spec's n-ary lists are exactly why that operator exists).
    ``entailed`` carries the ``(x, sameAs, canonical)`` lineage rows of
    :func:`owl_equality_entailment`, same contract as
    :func:`different_from_violations`.

    Output: ``(axiom, canon, member)`` — one row per member of every
    group of >=2 members sharing a canonical id within one axiom.

    Plan: NEVER the spec's quadratic pairwise differentFrom expansion —
    members map to canonicals (one join; unmapped = own canonical) and
    collide via ONE hash aggregate keyed (axiom, canon); the per-group
    member set is axiom-sized, so collect_set + explode is bounded."""
    from .rdf_lists import flatten_rdf_lists

    heads = ontology.where(
        F.col("p") == members_predicate
    ).select(F.col("s").alias("axiom"), F.col("o").alias("head"))
    members = (
        flatten_rdf_lists(
            ontology.select(
                F.col("s").alias("subj"),
                F.col("p").alias("predicate"),
                F.col("o").alias("obj"),
            )
        )
        .join(heads, "head")
        .select("axiom", "member")
    )
    mapping = entailed.where(
        F.col("predicate") == same_as_predicate
    ).select(F.col("subj").alias("m_id"), F.col("obj").alias("m_canon"))
    canon = (
        members.join(mapping, members["member"] == mapping["m_id"], "left")
        .select(
            "axiom", "member",
            F.coalesce("m_canon", "member").alias("canon"),
        )
    )
    return (
        canon.groupBy("axiom", "canon")
        .agg(F.sort_array(F.collect_set("member")).alias("ms"))
        .where(F.size("ms") > 1)
        .select("axiom", "canon", F.explode("ms").alias("member"))
    )


def all_disjoint_classes_violations(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    members_predicate: str = "allDisjointMembers",
) -> DataFrame:
    """OWL 2 RL consistency rule cax-adc (``owl:AllDisjointClasses``):
    an axiom lists classes that must be pairwise disjoint; any entity
    typed by >=2 of them violates. Axiom encoding and list recovery as
    in :func:`all_different_violations`; run over the materialized
    closure so inferred types count.

    Output: ``(axiom, subj, cls)`` — one row per held class of every
    entity typed by >=2 member classes of one axiom.

    Plan: the type scan joins the (schema-sized, broadcast) member
    table on the class, then ONE hash aggregate keyed (axiom, subj) —
    cax-adc's n*(n-1)/2 pairwise cax-dw expansion never materializes;
    per-entity held-class sets are bounded by the axiom width."""
    from .rdf_lists import flatten_rdf_lists

    heads = ontology.where(
        F.col("p") == members_predicate
    ).select(F.col("s").alias("axiom"), F.col("o").alias("head"))
    members = (
        flatten_rdf_lists(
            ontology.select(
                F.col("s").alias("subj"),
                F.col("p").alias("predicate"),
                F.col("o").alias("obj"),
            )
        )
        .join(heads, "head")
        .select("axiom", F.col("member").alias("cls"))
    )
    types = facts.where(F.col("predicate") == type_predicate).select(
        "subj", F.col("obj").alias("cls")
    ).distinct()
    return (
        types.join(F.broadcast(members), "cls")
        .groupBy("axiom", "subj")
        .agg(F.sort_array(F.collect_set("cls")).alias("cs"))
        .where(F.size("cs") > 1)
        .select("axiom", "subj", F.explode("cs").alias("cls"))
    )


def _declared(onto: list[tuple[str, str, str]], kind: str) -> list[str]:
    return sorted({s for s, k, _ in onto if k == kind})


def _adjacent_value_pairs(
    facts: DataFrame, key_cols: list[str], val_col: str,
    star: bool = False,
) -> DataFrame:
    """(a_id, b_id) sameAs candidates: for every key group holding >1
    distinct value, CHAIN-ADJACENT pairs over the sorted value set —
    (v1,v2),(v2,v3),... — never the quadratic all-pairs. Chains are
    enough because the pairs only seed a connected-components closure:
    a chain and a clique have the same components. Output size is
    linear in the number of colliding values, so a hub key (one email
    shared by a million accounts) costs a million rows, not 10^12.

    ``star=True`` emits (min value -> every other) STAR pairs instead:
    same size, same connected components, but component diameter 2
    instead of group size, so the downstream min-label CC settles in
    O(1) rounds instead of O(log group) — each CC round is several
    driver-paid jobs (round-6 measurement), and hub stars are already
    covered by the CC's salted propagation join. Chains stay the
    default because :func:`max_cardinality_same_as` EXPOSES its pairs
    (oracle-pinned query output); the equality fixpoint, which only
    feeds CC, opts into stars."""
    g = (
        facts.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_set(val_col)).alias("vals"))
        .where(F.size("vals") > 1)
    )
    pair_expr = (
        "transform(slice(vals, 2, size(vals)-1),"
        " v -> struct(vals[0] as a_id, v as b_id))"
        if star
        else "transform(slice(vals, 1, size(vals)-1),"
        " (v, i) -> struct(v as a_id, vals[i+1] as b_id))"
    )
    return g.select(
        F.explode(F.expr(pair_expr)).alias("pr")
    ).select("pr.a_id", "pr.b_id")


def same_as_pairs(
    facts: DataFrame,
    functional: list[str],
    inverse_functional: list[str],
) -> DataFrame:
    """OWL-RL prp-fp / prp-ifp: the owl:sameAs pairs one round of the
    equality rules derives from ``facts``.

    prp-fp  (functional p):         (s,p,o1) ∧ (s,p,o2) → o1 sameAs o2
    prp-ifp (inverse-functional p): (s1,p,o) ∧ (s2,p,o) → s1 sameAs s2

    Each is one predicate-pruned scan + one hash aggregate keyed on
    (subject, predicate) / (predicate, object); collisions come back as
    linear STAR pairs (see :func:`_adjacent_value_pairs` — these pairs
    only seed the equality CC, so the diameter-2 shape halves its
    rounds; components, and therefore the entailment, are unchanged)."""
    parts = []
    if functional:
        parts.append(
            _adjacent_value_pairs(
                facts.where(F.col("predicate").isin(functional)),
                ["subj", "predicate"],
                "obj",
                star=True,
            )
        )
    if inverse_functional:
        parts.append(
            _adjacent_value_pairs(
                facts.where(F.col("predicate").isin(inverse_functional)),
                ["obj", "predicate"],
                "subj",
                star=True,
            )
        )
    if not parts:
        return local_df(
            facts.sparkSession, [], "a_id string, b_id string"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _has_key_axioms(
    onto: list[tuple[str, str, str]],
) -> list[tuple[str, tuple[str, ...]]]:
    """``owl:hasKey`` declarations from an ontology row list.
    Convention: row ``(C, "hasKey", "p1|p2|...|pn")`` declares that
    p1..pn jointly key class C (OWL 2 RL rule prp-key; '|' separates
    because '/' already means composition in propertyChain rows).
    Order the properties MOST-SELECTIVE FIRST: the first property is
    the blocking key (see :func:`has_key_pairs`)."""
    out: list[tuple[str, tuple[str, ...]]] = []
    for s, k, o in onto:
        if k != "hasKey":
            continue
        parts = tuple(str(o).split("|"))
        if any(not p for p in parts):
            raise ValueError(
                f"hasKey for {s!r} must list '|'-separated non-empty "
                f"properties, got {o!r}"
            )
        out.append((s, parts))
    return sorted(out)


def has_key_pairs(
    facts: DataFrame,
    axioms: list[tuple[str, tuple[str, ...]]],
    type_predicate: str = TYPE_PREDICATE,
    max_block: int = 100_000,
) -> DataFrame:
    """OWL 2 RL prp-key: the ``(a_id, b_id)`` owl:sameAs candidate
    pairs one round derives from ``facts`` under ``axioms`` (each
    ``(C, (p1..pn))``): x sameAs y when both are typed C and for EVERY
    key property pi some value is asserted for both.

    Plan per axiom — FULL-SIGNATURE blocking (round-6 rewrite):

    1. *Restrict* to class C via a semi-join on the typed-entity set,
       prune to the key predicates, distinct.
    2. *Signatures*: x sameAs y iff for EVERY pi they share some value
       — equivalently, iff they share at least one full value tuple
       (v1..vn) with vi drawn per property, so joining the per-property
       value tables on the entity (multi-valued rows fan out into the
       cross product of value choices) yields an array-typed signature
       column whose equality IS the prp-key condition. One hash
       aggregate keyed on the signature groups candidates exactly; no
       verify joins remain.
    3. *Pairs*: all-pairs WITHIN each signature group (sorted
       collect_set + nested transform), bounded by ``max_block`` (a
       signature shared by more entities than that is not a key; the
       guard raises with the offending count rather than silently
       spending a quadratic join). The round-5 plan blocked on p1
       alone and verified p2..pn with joins — on a low-selectivity p1
       that materialized the p1-group quadratic (measured: two 8.5 s
       single-task pair-expansion stages on kg_haskey_sameas at sf0.1,
       25 nation-keyed groups of ~600 -> 4.5M candidates for 105k true
       pairs); signature groups are the true collision groups, so the
       quadratic is bounded by actual key collisions.

    Pairs come back canonicalized a < b, distinct. Multi-valued key
    properties fan signatures out multiplicatively (an entity with m
    values on each of n props carries m^n signature rows) — real keys
    are near-single-valued; the all-different guard still bounds any
    one group."""
    spark = facts.sparkSession
    empty = local_df(spark, [], "a_id string, b_id string")
    parts: list[DataFrame] = []
    for cls, props in axioms:
        typed = (
            facts.where(
                (F.col("predicate") == type_predicate)
                & (F.col("obj") == cls)
            )
            .select(F.col("subj").alias("ent"))
            .distinct()
        )
        kv = (
            facts.where(F.col("predicate").isin(list(props)))
            .select("subj", "predicate", "obj")
            .join(typed, F.col("subj") == F.col("ent"), "left_semi")
            .distinct()
        )
        sig = kv.where(F.col("predicate") == props[0]).select(
            "subj", F.array("obj").alias("sig")
        )
        for p in props[1:]:
            nxt = kv.where(F.col("predicate") == p).select(
                "subj", F.col("obj").alias("_v")
            )
            sig = sig.join(nxt, "subj").select(
                "subj",
                F.concat("sig", F.array("_v")).alias("sig"),
            )
        blocks = (
            sig.groupBy("sig")
            .agg(F.sort_array(F.collect_set("subj")).alias("ents"))
            .where(F.size("ents") > 1)
        )
        oversize = blocks.where(F.size("ents") > max_block).select(
            F.max(F.size("ents")).alias("mx")
        ).first()
        if oversize and oversize["mx"] is not None:
            raise ValueError(
                f"hasKey signature group for ({cls}, {props[0]}) holds "
                f"{oversize['mx']} entities (> max_block={max_block}) "
                "- that value does not behave like a key; clean the "
                "data or reorder the key properties"
            )
        pairs = blocks.select(
            F.explode(
                F.expr(
                    "flatten(transform(slice(ents, 1, size(ents)-1),"
                    " (a, i) -> transform("
                    "   slice(ents, i + 2, size(ents)),"
                    "   b -> struct(a as a_id, b as b_id))))"
                )
            ).alias("pr")
        ).select("pr.a_id", "pr.b_id").distinct()
        parts.append(pairs)
    if not parts:
        return empty
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def owl_equality_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    max_outer: int = 8,
    same_as_predicate: str = "sameAs",
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """OWL-RL equality rules to FIXPOINT: prp-fp / prp-ifp derive
    owl:sameAs pairs, eq-sym/eq-trans close them into components
    (min-label canonical representative — the entity-linking CC
    machinery), and eq-rep rewrites every fact's subject and object to
    its representative. Rewriting CASCADES: merging two subjects can
    put two objects under one functional key, deriving new sameAs
    pairs one level up — the classic equality chain (shared email
    merges accounts → merged account's functional 'primary city'
    merges cities → merged city's functional region merges regions).
    Each outer round pays one derive + one CC + two mapping joins;
    the loop exits the first time no new pair appears, after at most
    chain-depth productive rounds.

    ``ontology`` rows: (p, 'functionalProperty', _) /
    (p, 'inverseFunctionalProperty', _) /
    (C, 'hasKey', 'p1|p2|...') — schema-sized, like every ontology
    input here. prp-key pairs (:func:`has_key_pairs`) join the same
    fixpoint and cascade identically: a key-merged subject can pull
    two objects under one functional property a round later.

    Returns the REWRITTEN fact table (distinct) UNIONed with one
    ``(x, sameAs, canonical(x))`` triple per merged non-canonical id —
    the materialized form a downstream query engine wants: facts speak
    canonical ids only, the sameAs rows preserve the merge lineage.
    The mapping joins are plain shuffles on the id (the mapping can be
    table-sized in adversarial inputs, so no broadcast assumption);
    canonical ids are the component's lexicographic MIN, so the result
    is deterministic and independent of partitioning."""
    from .linking import connected_components

    onto = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    rows = [tuple(r) for r in onto]
    fp = _declared(rows, "functionalProperty")
    ifp = _declared(rows, "inverseFunctionalProperty")
    hk = _has_key_axioms(rows)

    # _ckpt_nostats throughout the cascade: each outer round joins
    # frames that are themselves products of previous rounds' joins, so
    # plain localCheckpoint's preserved origin stats compound
    # geometrically — the measured >600s BigInteger stall (see
    # functions/partitioning.py:checkpoint_nostats).
    cols = ["subj", "predicate", "obj"]
    cur = _ckpt_nostats(facts.select(*cols).distinct())
    spark = facts.sparkSession
    mapping = local_df(spark, [], "orig string, canon string")
    for _ in range(max_outer):
        pairs = same_as_pairs(cur, fp, ifp)
        if hk:
            pairs = pairs.unionByName(has_key_pairs(cur, hk))
        pairs, _pm = _ckpt_metrics(pairs, F.count(F.lit(1)).alias("n"))
        if not _pm["n"]:
            break
        verts = (
            pairs.select(F.col("a_id").alias("mention_id"))
            .unionByName(pairs.select(F.col("b_id").alias("mention_id")))
            .distinct()
        )
        m2 = _ckpt_nostats(
            connected_components(verts, pairs)
            .where(F.col("component_id") != F.col("mention_id"))
            .select(
                F.col("mention_id").alias("m_id"),
                F.col("component_id").alias("m_canon"),
            )
        )
        cur = _ckpt_nostats(
            cur.join(m2, cur["subj"] == m2["m_id"], "left")
            .select(
                F.coalesce("m_canon", "subj").alias("subj"),
                "predicate",
                "obj",
            )
            .join(m2, F.col("obj") == m2["m_id"], "left")
            .select(
                "subj",
                "predicate",
                F.coalesce("m_canon", "obj").alias("obj"),
            )
            .distinct()
        )
        # compose the cumulative orig->canonical mapping: existing
        # targets re-route through m2; m2's own keys (previous-round
        # canonicals or fresh ids) join in as new orig entries.
        mapping = _ckpt_nostats(
            mapping.join(m2, mapping["canon"] == m2["m_id"], "left")
            .select(
                "orig", F.coalesce("m_canon", "canon").alias("canon")
            )
            .unionByName(
                m2.select(
                    F.col("m_id").alias("orig"),
                    F.col("m_canon").alias("canon"),
                )
            )
        )
    same_rows = mapping.select(
        F.col("orig").alias("subj"),
        F.lit(same_as_predicate).alias("predicate"),
        F.col("canon").alias("obj"),
    )
    return cur.unionByName(same_rows).distinct()


def owl_equality_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    same_as_predicate: str = "sameAs",
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Independent naive fixpoint (union-find, all-pairs derivation —
    not chains, not block-and-verify, not min-label-propagation) for
    :func:`owl_equality_entailment` exactness tests."""
    fp = set(_declared(list(ontology), "functionalProperty"))
    ifp = set(_declared(list(ontology), "inverseFunctionalProperty"))
    hk = _has_key_axioms(list(ontology))
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = min(ra, rb), max(ra, rb)  # lexicographic canonical
        parent[hi] = lo

    cur = {tuple(f) for f in facts}
    while True:
        groups: dict[tuple, set[str]] = defaultdict(set)
        for s, p, o in cur:
            if p in fp:
                groups[("fp", s, p)].add(o)
            if p in ifp:
                groups[("ifp", p, o)].add(s)
        changed = False
        for vals in groups.values():
            vs = sorted(vals)
            for a, b in zip(vs, vs[1:]):
                if find(a) != find(b):
                    union(a, b)
                    changed = True
        # prp-key, exact pairwise: x,y typed C sharing SOME value on
        # EVERY key property
        for cls, props in hk:
            typed = sorted(
                {s for s, p, o in cur
                 if p == type_predicate and o == cls}
            )
            vals_of: dict[tuple[str, str], set[str]] = defaultdict(set)
            for s, p, o in cur:
                if p in set(props):
                    vals_of[(s, p)].add(o)
            for i, x in enumerate(typed):
                for y in typed[i + 1:]:
                    if all(
                        vals_of[(x, p)] & vals_of[(y, p)] for p in props
                    ) and find(x) != find(y):
                        union(x, y)
                        changed = True
        if not changed:
            break
        cur = {(find(s), p, find(o)) for s, p, o in cur}
    out = set(cur)
    for x in list(parent):
        if find(x) != x:
            out.add((x, same_as_predicate, find(x)))
    return out


def rdfs_entailment_increment(
    existing: DataFrame,
    new_facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """The entailment DELTA a new batch of facts adds to an existing
    materialized closure — the streaming-maintenance form of
    :func:`rdfs_entailment`.

    This is EXACT, not an approximation, because the RDFS rule set is
    LINEAR in the fact table: every rule (rdfs2/3/7/9) has exactly one
    fact premise — all other premises are ontology (schema) rows — so
    ``entail(A ∪ B) = entail(A) ∪ entail(B)`` and maintaining the
    closure under inserts needs no semi-naive recursion over the
    existing data. (Contrast rule sets with two fact premises, e.g.
    transitive properties, where an increment must join against the
    full closure — that remains :func:`graph.forward_chain`'s job.)

    Plan shape: one single-scan entailment pass over the INCREMENT
    (zero joins, same compiled-map plan as the batch operator) and one
    anti-join against the existing closure keyed on the output triple —
    per-batch cost tracks the increment, never the table. The result is
    disjoint from ``existing`` by construction; appending it (e.g.
    through the streaming KG sink's bucket-pruned upsert) reproduces
    the batch closure exactly, which the stream==batch test pins."""
    inc = rdfs_entailment(
        new_facts, ontology, type_predicate, max_ontology_rows
    )
    return inc.join(
        existing.select("subj", "predicate", "obj"),
        ["subj", "predicate", "obj"],
        "left_anti",
    )


def property_axiom_violations(
    facts: DataFrame,
    ontology: DataFrame,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """OWL 2 RL property-axiom consistency rules — the three the
    profile states as false-constraints over asserted pairs
    (https://www.w3.org/TR/owl2-profiles/#OWL_2_RL, table 9):

    - **prp-irp** (``owl:IrreflexiveProperty``): ``(x, p, x)`` holds.
    - **prp-asyp** (``owl:AsymmetricProperty``): ``(x, p, y)`` and
      ``(y, p, x)`` both hold (a reflexive loop violates once).
    - **prp-pdw** (``owl:propertyDisjointWith``): ``(x, p, y)`` and
      ``(x, q, y)`` both hold for a declared-disjoint ``(p, q)``.

    Ontology rows: ``(p, "irreflexive", "")``, ``(p, "asymmetric",
    "")``, ``(p, "propertyDisjointWith", q)``. Like
    :func:`disjoint_violations` this derives nothing — it returns the
    flat report ``(rule, subj, pred_a, pred_b, obj)`` the pipeline
    gates on (``pred_b = pred_a`` except for prp-pdw, which reports in
    declared orientation; prp-asyp reports each offending ordered
    assertion, so a violated pair yields both orientations).

    Plan: predicate pushdown scopes each branch to its declared
    predicates (on a predicate-partitioned edge table these prune to
    the named partitions); prp-irp is a pure filter, prp-asyp one
    self-equi-join on ``(pred, subj, obj)``=``(pred, obj, subj)``,
    prp-pdw a broadcast of the declaration pairs then one equi-join
    on ``(subj, obj)`` — nothing quadratic, no windows."""
    onto_rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto_rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    onto = [(s, k, str(o)) for s, k, o in (tuple(r) for r in onto_rows)]
    irp = _declared(onto, "irreflexive")
    asyp = _declared(onto, "asymmetric")
    pdw = sorted(
        (s, o) for s, k, o in onto if k == "propertyDisjointWith"
    )
    spark = facts.sparkSession
    reports: list[DataFrame] = []

    def flat(df: DataFrame, rule: str, pred_b=None) -> DataFrame:
        return df.select(
            F.lit(rule).alias("rule"),
            F.col("subj"),
            F.col("predicate").alias("pred_a"),
            (pred_b if pred_b is not None
             else F.col("predicate")).alias("pred_b"),
            F.col("obj"),
        )

    if irp:
        loops = facts.where(
            F.col("predicate").isin(irp) & (F.col("subj") == F.col("obj"))
        ).distinct()
        reports.append(flat(loops, "prp-irp"))
    if asyp:
        fwd = facts.where(F.col("predicate").isin(asyp)).distinct()
        rev = fwd.select(
            F.col("predicate"),
            F.col("obj").alias("subj"),
            F.col("subj").alias("obj"),
        )
        reports.append(
            flat(fwd.join(rev, ["predicate", "subj", "obj"]), "prp-asyp")
        )
    if pdw:
        decl = local_df(spark, pdw, "pred_a string, pred_b string")
        pa = facts.where(
            F.col("predicate").isin(sorted({p for p, _ in pdw}))
        ).select(
            "subj", F.col("predicate").alias("pred_a"), "obj"
        ).distinct()
        pb = facts.where(
            F.col("predicate").isin(sorted({q for _, q in pdw}))
        ).select(
            "subj", F.col("predicate").alias("pred_b"), "obj"
        ).distinct()
        both = (
            pa.join(F.broadcast(decl), "pred_a")
            .join(pb, ["subj", "pred_b", "obj"])
        )
        reports.append(
            both.select(
                F.lit("prp-pdw").alias("rule"),
                "subj", "pred_a", "pred_b", "obj",
            )
        )
    if not reports:
        raise ValueError(
            "property_axiom_violations: ontology declares no "
            "irreflexive / asymmetric / propertyDisjointWith axioms"
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def _cardinality_axioms(
    onto: list[tuple[str, str, str]], kind: str
) -> list[tuple[str, str, str]]:
    """``(cls, path, filler)`` rows for one cardinality kind.
    Conventions: ``(C, "maxCardinality0", p)`` / ``(C,
    "maxCardinality1", p)`` for the unqualified rules, ``(C,
    "maxQualifiedCardinality0", "p|D")`` / ``...1`` for the qualified
    ones ('|' separates path from filler class, same convention as
    hasKey). Unqualified rows get filler ``""``."""
    out: list[tuple[str, str, str]] = []
    for s, k, o in onto:
        if k != kind:
            continue
        o = str(o)
        if kind.startswith("maxQualified"):
            parts = o.split("|")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"{kind} for {s!r} must be 'path|FillerClass', "
                    f"got {o!r}"
                )
            out.append((s, parts[0], parts[1]))
        else:
            if not o:
                raise ValueError(f"{kind} for {s!r} names no property")
            out.append((s, o, ""))
    return sorted(out)


def _typed_subjects(
    facts: DataFrame, type_predicate: str
) -> DataFrame:
    return facts.where(F.col("predicate") == type_predicate).select(
        F.col("subj").alias("t_node"), F.col("obj").alias("t_cls")
    ).distinct()


def max_cardinality_violations(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """OWL 2 RL max-0 cardinality consistency rules
    (https://www.w3.org/TR/owl2-profiles/#OWL_2_RL, table 6):

    - **cls-maxc1** (``owl:maxCardinality 0`` on p over class C):
      ``x type C`` and ``(x, p, y)`` hold → violation.
    - **cls-maxqc1** (``owl:maxQualifiedCardinality 0`` on p with
      filler D): ``x type C``, ``(x, p, y)`` and ``y type D`` →
      violation. (cls-maxqc2's owl:Thing filler is the unqualified
      row.)

    Ontology row conventions in :func:`_cardinality_axioms`. Output:
    one ``(rule, subj, cls, path, obj)`` row per offending assertion —
    like :func:`disjoint_violations` this derives nothing; max-0
    violations mean the data is inconsistent and the pipeline gates on
    the report. Run it over the materialized closure so inferred types
    count.

    Plan: facts pruned to the declared paths, one broadcast join onto
    the declaration table (schema-sized), one equi-join onto the typed
    subjects keyed ``(subj, cls)``; the qualified branch adds one more
    typed join on the object. No windows, nothing quadratic."""
    onto_rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto_rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    onto = [(s, k, str(o)) for s, k, o in (tuple(r) for r in onto_rows)]
    unq = _cardinality_axioms(onto, "maxCardinality0")
    qual = _cardinality_axioms(onto, "maxQualifiedCardinality0")
    if not unq and not qual:
        raise ValueError(
            "max_cardinality_violations: ontology declares no "
            "maxCardinality0 / maxQualifiedCardinality0 restrictions"
        )
    spark = facts.sparkSession
    types = _typed_subjects(facts, type_predicate)
    reports: list[DataFrame] = []

    def assertions(axioms: list[tuple[str, str, str]]) -> DataFrame:
        decl = local_df(
            spark, axioms, "r_cls string, predicate string, filler string"
        )
        return (
            facts.where(
                F.col("predicate").isin(sorted({p for _, p, _ in axioms}))
            )
            .select("subj", "predicate", "obj")
            .distinct()
            .join(F.broadcast(decl), "predicate")
            .join(
                types,
                (F.col("subj") == F.col("t_node"))
                & (F.col("r_cls") == F.col("t_cls")),
            )
        )

    def flat(df: DataFrame, rule: str) -> DataFrame:
        return df.select(
            F.lit(rule).alias("rule"),
            F.col("subj"),
            F.col("r_cls").alias("cls"),
            F.col("predicate").alias("path"),
            F.col("obj"),
        )

    if unq:
        reports.append(flat(assertions(unq), "cls-maxc1"))
    if qual:
        base = assertions(qual)
        obj_types = types.select(
            F.col("t_node").alias("o_node"), F.col("t_cls").alias("o_cls")
        )
        typed = base.join(
            obj_types,
            (F.col("obj") == F.col("o_node"))
            & (F.col("filler") == F.col("o_cls")),
        )
        reports.append(flat(typed, "cls-maxqc1"))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.distinct()


def max_cardinality_same_as(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """OWL 2 RL max-1 cardinality derivation rules — ``owl:sameAs``
    pairs, feed them to :func:`owl_equality_entailment`'s closure:

    - **cls-maxc2** (``owl:maxCardinality 1`` on p over class C):
      ``x type C``, ``(x, p, y1)``, ``(x, p, y2)`` → y1 sameAs y2.
    - **cls-maxqc3** (``owl:maxQualifiedCardinality 1`` with filler
      D): only values additionally typed D merge. (cls-maxqc4's
      owl:Thing filler is the unqualified row.)

    This is prp-fp scoped to a class: per restricted focus the
    distinct value set comes back as CHAIN-ADJACENT pairs, never the
    quadratic all-pairs (see :func:`_adjacent_value_pairs` — a chain
    and a clique seed the same connected components). Output
    ``(a_id, b_id)``, the :func:`same_as_pairs` contract.

    Plan: facts pruned to declared paths + broadcast declaration join
    + one typed-subject equi-join (qualified adds the object-type
    join), then ONE hash aggregate keyed (subj, cls, path) — a hub
    focus with a million values costs a million output rows, not
    10^12."""
    onto_rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto_rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    onto = [(s, k, str(o)) for s, k, o in (tuple(r) for r in onto_rows)]
    unq = _cardinality_axioms(onto, "maxCardinality1")
    qual = _cardinality_axioms(onto, "maxQualifiedCardinality1")
    if not unq and not qual:
        raise ValueError(
            "max_cardinality_same_as: ontology declares no "
            "maxCardinality1 / maxQualifiedCardinality1 restrictions"
        )
    spark = facts.sparkSession
    types = _typed_subjects(facts, type_predicate)
    parts: list[DataFrame] = []

    def scoped(axioms: list[tuple[str, str, str]]) -> DataFrame:
        decl = local_df(
            spark, axioms, "r_cls string, predicate string, filler string"
        )
        return (
            facts.where(
                F.col("predicate").isin(sorted({p for _, p, _ in axioms}))
            )
            .select("subj", "predicate", "obj")
            .join(F.broadcast(decl), "predicate")
            .join(
                types,
                (F.col("subj") == F.col("t_node"))
                & (F.col("r_cls") == F.col("t_cls")),
            )
        )

    if unq:
        parts.append(
            _adjacent_value_pairs(
                scoped(unq), ["subj", "r_cls", "predicate"], "obj"
            )
        )
    if qual:
        obj_types = types.select(
            F.col("t_node").alias("o_node"), F.col("t_cls").alias("o_cls")
        )
        typed = scoped(qual).join(
            obj_types,
            (F.col("obj") == F.col("o_node"))
            & (F.col("filler") == F.col("o_cls")),
        )
        parts.append(
            _adjacent_value_pairs(
                typed, ["subj", "r_cls", "predicate"], "obj"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def max_cardinality_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> tuple[set[tuple], set[tuple[str, str]]]:
    """Plain-Python oracle: (violation rows, sameAs ADJACENT pairs)."""
    fset = set(facts)
    types = {(s, o) for s, p, o in fset if p == type_predicate}
    viols: set[tuple] = set()
    pairs: set[tuple[str, str]] = set()
    # the unqualified and qualified max-1 rules chain INDEPENDENTLY
    # (the Spark plan unions two separate adjacency passes), so keep
    # one group table per rule
    groups_u: dict[tuple[str, str, str], set[str]] = {}
    groups_q: dict[tuple[str, str, str], set[str]] = {}

    def axioms(kind):
        return _cardinality_axioms(
            [(s, k, o) for s, k, o in ontology if k == kind], kind
        )

    for s, p, o in fset:
        if p == type_predicate:
            continue
        for cls, path, _ in axioms("maxCardinality0"):
            if p == path and (s, cls) in types:
                viols.add(("cls-maxc1", s, cls, p, o))
        for cls, path, filler in axioms("maxQualifiedCardinality0"):
            if p == path and (s, cls) in types and (o, filler) in types:
                viols.add(("cls-maxqc1", s, cls, p, o))
        for cls, path, _ in axioms("maxCardinality1"):
            if p == path and (s, cls) in types:
                groups_u.setdefault((s, cls, p), set()).add(o)
        for cls, path, filler in axioms("maxQualifiedCardinality1"):
            if p == path and (s, cls) in types and (o, filler) in types:
                groups_q.setdefault((s, cls, p), set()).add(o)
    for groups in (groups_u, groups_q):
        for vals in groups.values():
            sv = sorted(vals)
            for a, b in zip(sv, sv[1:]):
                pairs.add((a, b))
    return viols, pairs


def property_axiom_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
) -> set[tuple]:
    """Plain-Python oracle for :func:`property_axiom_violations`."""
    fset = set(facts)
    irp = {s for s, k, _ in ontology if k == "irreflexive"}
    asyp = {s for s, k, _ in ontology if k == "asymmetric"}
    pdw = {(s, str(o)) for s, k, o in ontology
           if k == "propertyDisjointWith"}
    out: set[tuple] = set()
    for s, p, o in fset:
        if p in irp and s == o:
            out.add(("prp-irp", s, p, p, o))
        if p in asyp and (o, p, s) in fset:
            out.add(("prp-asyp", s, p, p, o))
        for pa, pb in pdw:
            if p == pa and (s, pb, o) in fset:
                out.add(("prp-pdw", s, pa, pb, o))
    return out


# --- scm-* schema (TBox) closure ----------------------------------------

_SCM_THING = "owl:Thing"
_SCM_NOTHING = "owl:Nothing"


def schema_closure_python(
    ontology: list[tuple[str, str, str]],
) -> set[tuple[str, str, str]]:
    """OWL 2 RL *schema-vocabulary* closure (the scm-* rules, W3C
    owl2-profiles §4.3 Table 9) of a TBox given as ``(s, kind, o)``
    rows — the closure OF THE ONTOLOGY ITSELF, as opposed to the
    instance-level rules the entailment operators run over facts.

    Supported rules — the class/property-hierarchy subset (the
    restriction-schema rules scm-hv/svf/avf/int/uni belong to the
    runtime machinery in boolean_classes.py / owl_class_entailment and
    are intentionally out of scope here):

    * scm-cls   c type Class -> c subClassOf c, c equivalentClass c,
                c subClassOf owl:Thing, owl:Nothing subClassOf c
    * scm-op/dp p type ObjectProperty|DatatypeProperty ->
                p subPropertyOf p, p equivalentProperty p
    * scm-sco   subClassOf transitivity
    * scm-eqc1  equivalentClass -> subClassOf both ways
    * scm-eqc2  mutual subClassOf -> equivalentClass
    * scm-spo   subPropertyOf transitivity
    * scm-eqp1  equivalentProperty -> subPropertyOf both ways
    * scm-eqp2  mutual subPropertyOf -> equivalentProperty
    * scm-dom1  domain(p,c1), subClassOf(c1,c2) -> domain(p,c2)
    * scm-dom2  domain(p2,c), subPropertyOf(p1,p2) -> domain(p1,c)
    * scm-rng1  range(p,c1),  subClassOf(c1,c2) -> range(p,c2)
    * scm-rng2  range(p2,c),  subPropertyOf(p1,p2) -> range(p1,c)

    Pure driver-side set fixpoint: a TBox is schema-sized (KBs at any
    corpus scale — rdfs_entailment enforces max_ontology_rows on the
    same tables), so closing it distributed would only add shuffles.
    The closed schema is what the compiled instance rules should be fed
    so one linear pass covers deep hierarchies.
    """
    out: set[tuple[str, str, str]] = set(ontology)
    changed = True
    while changed:
        changed = False
        sco = {(s, o) for s, k, o in out if k == "subClassOf"}
        spo = {(s, o) for s, k, o in out if k == "subPropertyOf"}
        new: set[tuple[str, str, str]] = set()
        for s, k, o in list(out):
            if k == TYPE_PREDICATE and o == "Class":
                new |= {
                    (s, "subClassOf", s),
                    (s, "equivalentClass", s),
                    (s, "subClassOf", _SCM_THING),
                    (_SCM_NOTHING, "subClassOf", s),
                }
            if k == TYPE_PREDICATE and o in (
                "ObjectProperty",
                "DatatypeProperty",
            ):
                new |= {
                    (s, "subPropertyOf", s),
                    (s, "equivalentProperty", s),
                }
            if k == "equivalentClass":  # scm-eqc1
                new |= {(s, "subClassOf", o), (o, "subClassOf", s)}
            if k == "equivalentProperty":  # scm-eqp1
                new |= {(s, "subPropertyOf", o), (o, "subPropertyOf", s)}
            if k == "subClassOf":
                if (o, s) in sco:  # scm-eqc2
                    new.add((s, "equivalentClass", o))
                for a, b in sco:  # scm-sco
                    if a == o:
                        new.add((s, "subClassOf", b))
            if k == "subPropertyOf":
                if (o, s) in spo:  # scm-eqp2
                    new.add((s, "equivalentProperty", o))
                for a, b in spo:  # scm-spo
                    if a == o:
                        new.add((s, "subPropertyOf", b))
            if k in ("domain", "range"):
                for a, b in sco:  # scm-dom1 / scm-rng1
                    if a == o:
                        new.add((s, k, b))
                for a, b in spo:  # scm-dom2 / scm-rng2
                    if b == s:
                        new.add((a, k, o))
        if not new <= out:
            out |= new
            changed = True
    return out


def schema_closure(
    ontology: DataFrame, max_ontology_rows: int = 100_000
) -> DataFrame:
    """DataFrame wrapper of :func:`schema_closure_python`: collect the
    (schema-sized, bounded) TBox, close it on the driver, return the
    closed ``(s, p, o)`` table. See the twin for the rule inventory."""
    rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    closed = sorted(schema_closure_python([tuple(r) for r in rows]))
    return local_df(
        ontology.sparkSession, closed, "s string, p string, o string"
    )


def all_disjoint_properties_violations(
    facts: DataFrame,
    ontology: DataFrame,
    members_predicate: str = "allDisjointPropertyMembers",
) -> DataFrame:
    """OWL 2 RL consistency rule prp-adp (``owl:AllDisjointProperties``):
    an axiom lists properties that must be pairwise disjoint; any
    (subj, obj) pair asserted under >=2 of them violates. Axiom
    encoding and RDF-list recovery exactly as
    :func:`all_disjoint_classes_violations` (its property-axis mirror
    — prp-adp generalizes prp-pdw the way cax-adc generalizes cax-dw).

    Output: ``(axiom, subj, obj, predicate)`` — one row per held member
    property of every (subj, obj) pair asserted under >=2 member
    properties of one axiom.

    Plan: the fact scan joins the (schema-sized, broadcast) member
    table on the predicate, then ONE hash aggregate keyed (axiom, subj,
    obj) — the spec's n*(n-1)/2 pairwise prp-pdw expansion never
    materializes; per-pair held-property sets are bounded by the axiom
    width."""
    from .rdf_lists import flatten_rdf_lists

    heads = ontology.where(
        F.col("p") == members_predicate
    ).select(F.col("s").alias("axiom"), F.col("o").alias("head"))
    members = (
        flatten_rdf_lists(
            ontology.select(
                F.col("s").alias("subj"),
                F.col("p").alias("predicate"),
                F.col("o").alias("obj"),
            )
        )
        .join(heads, "head")
        .select("axiom", F.col("member").alias("predicate"))
    )
    pairs = facts.select("subj", "predicate", "obj").distinct()
    return (
        pairs.join(F.broadcast(members), "predicate")
        .groupBy("axiom", "subj", "obj")
        .agg(F.sort_array(F.collect_set("predicate")).alias("ps"))
        .where(F.size("ps") > 1)
        .select("axiom", "subj", "obj", F.explode("ps").alias("predicate"))
    )
