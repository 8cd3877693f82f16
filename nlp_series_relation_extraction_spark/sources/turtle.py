"""Turtle (W3C RDF 1.1 Turtle, https://www.w3.org/TR/turtle/) export
and import for the KG tables — the human-facing RDF interchange format
next to the line-oriented N-Triples/N-Quads pair (sources/rdf.py).

Export (``edges_to_turtle``) stays JVM-side like the N-Triples dump:
subject-grouped blocks with ``;`` predicate lists are built from ONE
groupBy(subject) + sort_array + concat_ws — whole-stage codegen, and
the group shuffle is the only exchange. Prefix directives come from
``turtle_header`` (two driver-side lines).

Import (``parse_turtle``) is a full recursive-descent parser for the
Turtle grammar run per DOCUMENT inside ``mapInPandas`` (Turtle is not
line-oriented — ``;``/``,`` continuations and bracketed blank nodes
span lines, so the document is the parallel unit; a 100-TB crawl of
TTL files parallelizes over files with no shuffle). Supported grammar:
@prefix/@base + SPARQL-style PREFIX/BASE, prefixed names with PN_LOCAL
escapes and %-encoding, 'a', object lists, predicate lists, anonymous
blank nodes ``[...]`` with nested property lists, collections
``( ... )`` (expanded to rdf:first/rdf:rest/rdf:nil), all four string
literal quote forms, language tags, typed literals, and the
integer/decimal/double/boolean abbreviations (typed per spec §2.5.2).
Relative IRIs resolve against the in-scope base via RFC 3986
(urllib.parse.urljoin). Malformed input FAILS LOUD with position
context — silently dropped triples corrupt a graph invisibly.

Output is the same parsed frame as parse_ntriples (subj, subj_kind,
pred, obj, obj_kind, lang, dtype), so skolemize / ntriples_to_edges /
the SHACL term machinery compose unchanged.
"""

from __future__ import annotations

from ..functions.smalldf import local_df

import re
from urllib.parse import quote, urljoin

from pyspark.sql import DataFrame, functions as F

from .rdf import DEFAULT_BASE

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"

_PARSED_SCHEMA = (
    "subj string, subj_kind string, pred string, obj string,"
    " obj_kind string, lang string, dtype string"
)


# --- export ---------------------------------------------------------------


def turtle_header(base: str = DEFAULT_BASE) -> list[str]:
    """The @prefix directives matching edges_to_turtle's output."""
    return [
        f"@prefix e: <{base}e/> .",
        f"@prefix p: <{base}p/> .",
    ]


def _pn_local_escape(local: str) -> str:
    """Make a percent-quoted local part PN_LOCAL-legal: '~' is an
    unreserved URI char quote() keeps raw but Turtle only admits it
    backslash-escaped; '-' and '.' may not LEAD, '.' may not TRAIL
    (all three are in the PN_LOCAL_ESC set)."""
    out = local.replace("~", "\\~")
    if out and out[0] in "-.":
        out = "\\" + out
    if out.endswith(".") and not out.endswith("\\."):
        out = out[:-1] + "\\."
    return out


def edges_to_turtle(
    edges: DataFrame, base: str = DEFAULT_BASE
) -> DataFrame:
    """Edge table -> one Turtle block per SUBJECT (column ``line``;
    embedded newlines make the ``;`` predicate list — ``.write.text``
    emits them as physical lines). Predicates ride the same bounded
    percent-encoded dimension as the N-Triples dump, as prefixed names
    (PN_LOCAL's PLX production permits %-encoding; the few unreserved
    chars quote() keeps raw that PN_LOCAL rejects are backslash-escaped
    by _pn_local_escape). Deterministic: blocks ordered by subject id,
    (predicate, object) pairs sorted within a block."""
    preds = [
        r[0]
        for r in edges.select("predicate")
        .distinct()
        .orderBy("predicate")
        .collect()
    ]
    pm = local_df(edges.sparkSession, 
        [
            (p, "p:" + _pn_local_escape(quote(p, safe="")))
            for p in preds
        ],
        "predicate string, pname string",
    )
    po = F.concat(F.col("pname"), F.lit(" e:"),
                  F.col("obj_entity_id").cast("string"))
    return (
        edges.join(F.broadcast(pm), "predicate")
        .select(F.col("subj_entity_id").alias("s"), po.alias("po"))
        .groupBy("s")
        .agg(F.sort_array(F.collect_set("po")).alias("pos"))
        .orderBy("s")
        .select(
            F.concat(
                F.lit("e:"),
                F.col("s").cast("string"),
                F.lit(" "),
                F.concat_ws(" ;\n    ", F.col("pos")),
                F.lit(" ."),
            ).alias("line")
        )
    )


# --- import: recursive-descent Turtle parser -------------------------------

_ECHAR = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}
_PN_LOCAL_ESC = set("_~.-!$&'()*+,;=/?#@%")
_NUM_RE = re.compile(
    r"[+-]?(?:\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
    r"|\d+(?:[eE][+-]?\d+)?|\d*\.?\d+[eE][+-]?\d+)"
)
_A_KEYWORD = RDF_NS + "type"


class _TurtleError(ValueError):
    pass


class _Parser:
    """One Turtle document -> list of 7-tuples (the parsed frame).
    Plain recursive descent over a char cursor; error messages carry
    the byte offset and a context window."""

    def __init__(self, text: str):
        self.t = text
        self.i = 0
        self.n = len(text)
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.rows: list[tuple] = []
        self.genid = 0

    # -- low-level ---------------------------------------------------------

    def err(self, msg: str):
        ctx = self.t[max(0, self.i - 20): self.i + 20].replace("\n", "\\n")
        raise _TurtleError(
            f"malformed Turtle at offset {self.i}: {msg} (near {ctx!r})"
        )

    def ws(self):
        while self.i < self.n:
            c = self.t[self.i]
            if c in " \t\r\n":
                self.i += 1
            elif c == "#":
                while self.i < self.n and self.t[self.i] != "\n":
                    self.i += 1
            else:
                return

    def peek(self) -> str:
        return self.t[self.i] if self.i < self.n else ""

    def expect(self, s: str):
        if not self.t.startswith(s, self.i):
            self.err(f"expected {s!r}")
        self.i += len(s)

    def word_is(self, w: str) -> bool:
        """Case-insensitive keyword at cursor followed by a boundary."""
        if self.t[self.i: self.i + len(w)].lower() != w:
            return False
        j = self.i + len(w)
        return j >= self.n or not (self.t[j].isalnum() or self.t[j] == "_")

    # -- escapes -------------------------------------------------------------

    def _string_body(self, quote_ch: str, long: bool) -> str:
        out = []
        end = quote_ch * 3 if long else quote_ch
        while True:
            if self.i >= self.n:
                self.err("unterminated string")
            if self.t.startswith(end, self.i):
                self.i += len(end)
                return "".join(out)
            c = self.t[self.i]
            if c == "\\":
                self.i += 1
                e = self.peek()
                if e == "u":
                    h = self.t[self.i + 1: self.i + 5]
                    out.append(chr(int(h, 16)))
                    self.i += 5
                elif e == "U":
                    h = self.t[self.i + 1: self.i + 9]
                    out.append(chr(int(h, 16)))
                    self.i += 9
                elif e in _ECHAR:
                    out.append(_ECHAR[e])
                    self.i += 1
                else:
                    self.err(f"bad escape \\{e}")
            else:
                if not long and c in "\n\r":
                    self.err("newline in short string")
                out.append(c)
                self.i += 1

    def _iriref(self) -> str:
        self.expect("<")
        out = []
        while True:
            if self.i >= self.n:
                self.err("unterminated IRI")
            c = self.t[self.i]
            if c == ">":
                self.i += 1
                break
            if c == "\\":
                e = self.t[self.i + 1]
                if e == "u":
                    out.append(chr(int(self.t[self.i + 2: self.i + 6], 16)))
                    self.i += 6
                elif e == "U":
                    out.append(chr(int(self.t[self.i + 2: self.i + 10], 16)))
                    self.i += 10
                else:
                    self.err("bad IRI escape")
            elif c in ' "{}|^`' or ord(c) <= 0x20:
                self.err("bad IRI char")
            else:
                out.append(c)
                self.i += 1
        iri = "".join(out)
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return urljoin(self.base, iri)
        return iri

    def _pname(self) -> str:
        j = self.i
        while j < self.n and (
            self.t[j].isalnum() or self.t[j] in "_.-"
        ):
            j += 1
        pfx = self.t[self.i: j]
        if j >= self.n or self.t[j] != ":":
            self.err("expected prefixed name")
        if pfx.endswith("."):
            self.err("prefix ends with dot")
        if pfx not in self.prefixes:
            self.err(f"undeclared prefix {pfx!r}")
        self.i = j + 1
        # PN_LOCAL: alnum/_/./-/:/%XX/backslash-escaped punctuation
        out = []
        while self.i < self.n:
            c = self.t[self.i]
            if c.isalnum() or c in "_-:":
                out.append(c)
                self.i += 1
            elif c == "%":
                out.append(self.t[self.i: self.i + 3])
                self.i += 3
            elif c == "\\":
                e = self.t[self.i + 1]
                if e not in _PN_LOCAL_ESC:
                    self.err(f"bad local escape \\{e}")
                out.append(e)
                self.i += 2
            elif c == "." and self.i + 1 < self.n and (
                self.t[self.i + 1].isalnum()
                or self.t[self.i + 1] in "_-:%.\\"
            ):
                out.append(c)  # dots are legal INSIDE a local name
                self.i += 1
            else:
                break
        return self.prefixes[pfx] + "".join(out)

    def _fresh_bnode(self) -> str:
        self.genid += 1
        return f"genid{self.genid}"

    # -- terms ---------------------------------------------------------------

    def _literal(self):
        c = self.peek()
        q = c
        if self.t.startswith(q * 3, self.i):
            self.i += 3
            val = self._string_body(q, long=True)
        else:
            self.i += 1
            val = self._string_body(q, long=False)
        lang = None
        dtype = None
        if self.peek() == "@":
            self.i += 1
            j = self.i
            while j < self.n and (self.t[j].isalnum() or self.t[j] == "-"):
                j += 1
            lang = self.t[self.i: j]
            if not lang:
                self.err("empty language tag")
            self.i = j
        elif self.t.startswith("^^", self.i):
            self.i += 2
            dtype = (
                self._iriref() if self.peek() == "<" else self._pname()
            )
        return (val, "literal", lang, dtype)

    def _numeric_or_bool(self):
        if self.word_is("true") or self.word_is("false"):
            v = "true" if self.word_is("true") else "false"
            self.i += len(v)
            return (v, "literal", None, XSD_NS + "boolean")
        m = _NUM_RE.match(self.t, self.i)
        if not m:
            self.err("expected term")
        v = m.group(0)
        self.i = m.end()
        if "e" in v.lower():
            dt = "double"
        elif "." in v:
            dt = "decimal"
        else:
            dt = "integer"
        return (v, "literal", None, XSD_NS + dt)

    def _object(self):
        self.ws()
        c = self.peek()
        if c == "<":
            return (self._iriref(), "iri", None, None)
        if c == '"' or c == "'":
            return self._literal()
        if self.t.startswith("_:", self.i):
            self.i += 2
            j = self.i
            while j < self.n and (self.t[j].isalnum() or self.t[j] in "_-"):
                j += 1
            label = self.t[self.i: j]
            if not label:
                self.err("empty blank node label")
            if re.fullmatch(r"genid\d+", label):
                self.err(
                    "blank node label collides with generated genidN"
                )
            self.i = j
            return (label, "bnode", None, None)
        if c == "[":
            self.i += 1
            b = self._fresh_bnode()
            self.ws()
            if self.peek() != "]":
                self._predicate_object_list((b, "bnode"))
                self.ws()
            self.expect("]")
            return (b, "bnode", None, None)
        if c == "(":
            self.i += 1
            items = []
            while True:
                self.ws()
                if self.peek() == ")":
                    self.i += 1
                    break
                items.append(self._object())
            if not items:
                return (RDF_NS + "nil", "iri", None, None)
            head = self._fresh_bnode()
            cur = head
            for k, (v, kind, lang, dt) in enumerate(items):
                self.rows.append(
                    (cur, "bnode", RDF_NS + "first", v, kind, lang, dt)
                )
                if k + 1 < len(items):
                    nxt = self._fresh_bnode()
                    self.rows.append(
                        (cur, "bnode", RDF_NS + "rest", nxt, "bnode",
                         None, None)
                    )
                    cur = nxt
                else:
                    self.rows.append(
                        (cur, "bnode", RDF_NS + "rest", RDF_NS + "nil",
                         "iri", None, None)
                    )
            return (head, "bnode", None, None)
        if self.word_is("true") or self.word_is("false"):
            return self._numeric_or_bool()
        if c and (c.isdigit() or c in "+-."):
            return self._numeric_or_bool()
        return (self._pname(), "iri", None, None)

    def _predicate(self) -> str:
        self.ws()
        if self.word_is("a"):
            self.i += 1
            return _A_KEYWORD
        if self.peek() == "<":
            return self._iriref()
        return self._pname()

    def _predicate_object_list(self, subj: tuple[str, str]):
        s, sk = subj
        while True:
            p = self._predicate()
            while True:
                v, kind, lang, dt = self._object()
                self.rows.append((s, sk, p, v, kind, lang, dt))
                self.ws()
                if self.peek() == ",":
                    self.i += 1
                    continue
                break
            self.ws()
            if self.peek() == ";":
                while self.peek() == ";":  # runs of ';' are legal
                    self.i += 1
                    self.ws()
                if self.peek() in ".]" or self.i >= self.n:
                    return  # trailing ';' before '.' or ']'
                continue
            return

    # -- statements ------------------------------------------------------------

    def _directive(self) -> bool:
        self.ws()
        if self.t.startswith("@prefix", self.i) or self.word_is("prefix"):
            self.i += len("@prefix") if self.peek() == "@" else len(
                "prefix"
            )
            self.ws()
            j = self.i
            while j < self.n and self.t[j] != ":":
                j += 1
            pfx = self.t[self.i: j].strip()
            self.i = j + 1
            self.ws()
            iri = self._iriref()
            self.prefixes[pfx] = iri
            self.ws()
            if self.peek() == ".":
                self.i += 1
            return True
        if self.t.startswith("@base", self.i) or self.word_is("base"):
            self.i += len("@base") if self.peek() == "@" else len("base")
            self.ws()
            self.base = self._iriref()
            self.ws()
            if self.peek() == ".":
                self.i += 1
            return True
        return False

    def parse(self) -> list[tuple]:
        while True:
            self.ws()
            if self.i >= self.n:
                return self.rows
            if self.peek() == "@" or self.word_is("prefix") or self.word_is(
                "base"
            ):
                if self._directive():
                    continue
            # subject
            c = self.peek()
            if c == "[":
                self.i += 1
                b = self._fresh_bnode()
                self.ws()
                if self.peek() != "]":
                    self._predicate_object_list((b, "bnode"))
                    self.ws()
                self.expect("]")
                subj = (b, "bnode")
                self.ws()
                if self.peek() == ".":  # bare bnode property list
                    self.i += 1
                    continue
            elif c == "(":
                v, kind, _, _ = self._object()
                subj = (v, kind)
            elif self.t.startswith("_:", self.i):
                v, kind, _, _ = self._object()
                subj = (v, kind)
            elif c == "<":
                subj = (self._iriref(), "iri")
            else:
                subj = (self._pname(), "iri")
            self._predicate_object_list(subj)
            self.ws()
            self.expect(".")


def parse_turtle_document(text: str) -> list[tuple]:
    """One Turtle document -> parsed-frame 7-tuples. The python twin
    of parse_turtle's per-row work; fails loud with offset context."""
    return _Parser(text).parse()


def parse_turtle(docs: DataFrame, col: str = "doc") -> DataFrame:
    """Turtle documents (one per row — the file is the parallel unit)
    -> the shared parsed frame (subj, subj_kind, pred, obj, obj_kind,
    lang, dtype). Blank-node labels are DOCUMENT-scoped per the
    grammar; skolemize (sources/rdf.py) per document before merging
    dumps."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for text in pdf[col]:
                if text is None or not text.strip():
                    continue
                rows.extend(parse_turtle_document(text))
            yield pd.DataFrame(
                rows,
                columns=[
                    "subj", "subj_kind", "pred", "obj", "obj_kind",
                    "lang", "dtype",
                ],
            )

    return docs.mapInPandas(run, _PARSED_SCHEMA)
