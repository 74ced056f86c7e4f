"""Minimal SPARQL-BGP evaluation for the ``select:`` workflow op.

The reference hands ``where:`` clauses to rdflib's full SPARQL engine for
local graphs, or to a Stardog HTTP endpoint (text_to_turtle_processor.py
:168-327). Per-row HTTP is banned at 10^12-document scale, so the engine
replaces both with a *broadcast reference graph*: the ontology is loaded
once on the driver, broadcast, and ``select:`` becomes an in-UDF lookup
against it (the relational equivalent: an equi-join against a broadcast
dimension table).

Supported query subset (sufficient for workflow-style lookups):

* ``PREFIX pfx: <iri>`` headers
* ``SELECT ?a ?b WHERE { triple-patterns }``
* triple patterns ``s p o .`` with terms: ``?var``, ``<iri>``,
  ``pfx:name``, ``"literal"`` / ``"literal"@lang``
* conjunctive patterns joined on shared variables

No FILTER / OPTIONAL / property paths — workflows needing those should
pre-materialize the lookup as mapping pairs instead.
"""

from __future__ import annotations

import re
from typing import Dict, Iterable, List, Optional, Tuple

from ..core.errors import ProcessorException
from ..core.terms import IriNode, LitNode

# A graph row: (subj, pred, obj_kind, obj_lexical, obj_lang)
GraphRow = Tuple[str, str, str, str, Optional[str]]

_PREFIX_DECL = re.compile(r"(?im)^\s*PREFIX\s+([A-Za-z][\w-]*)\s*:\s*<([^>]*)>")
_SELECT_WHERE = re.compile(r"(?is)SELECT\s+(.+?)\s+WHERE\s*\{(.*)\}")
_TERM = re.compile(
    r"""\s*(\?[A-Za-z_][\w-]*|<[^>]*>|"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+)?|[A-Za-z][\w-]*:[\w./#-]+|a)\s*""",
)


def _parse_term(tok: str, prefixes: Dict[str, str]):
    if tok.startswith("?"):
        return ("var", tok[1:])
    if tok == "a":
        return ("iri", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    if tok.startswith("<"):
        return ("iri", tok[1:-1])
    if tok.startswith('"'):
        m = re.match(r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z-]+))?$', tok)
        if not m:
            raise ProcessorException(f"Bad literal token in where clause: {tok}")
        lex = m.group(1).replace('\\"', '"').replace("\\\\", "\\")
        return ("lit", lex, m.group(2))
    if ":" in tok:
        pfx, member = tok.split(":", 1)
        ns = prefixes.get(pfx)
        if ns is None:
            raise ProcessorException(f"Unknown prefix in where clause: {pfx}")
        return ("iri", ns + member)
    raise ProcessorException(f"Cannot parse where-clause term: {tok}")


def parse_query(where_clause: str) -> Tuple[List[str], List[tuple]]:
    """Parse a SELECT query into (selected vars, triple patterns)."""
    prefixes = {m.group(1): m.group(2) for m in _PREFIX_DECL.finditer(where_clause)}
    body = _PREFIX_DECL.sub("", where_clause)
    m = _SELECT_WHERE.search(body)
    if m is None:
        raise ProcessorException(f"Unsupported query (need SELECT..WHERE{{..}}): {where_clause}")
    sel = [v.lstrip("?") for v in re.split(r"\s+", m.group(1).strip()) if v]
    # Tokenize term-wise instead of splitting on '.' — IRIs and prefixed
    # names legitimately contain dots; the statement separator is any
    # bare '.' left between term matches.
    toks = []
    for t in _TERM.findall(m.group(2)):
        # a prefixed name glued to its statement-separator dot
        if not t.startswith(("<", '"', "?")) and t.endswith("."):
            t = t[:-1]
        if t:
            toks.append(t)
    if len(toks) % 3 != 0:
        raise ProcessorException(
            f"Bad where clause (expected triples of terms): {where_clause!r}"
        )
    patterns = [
        tuple(_parse_term(t, prefixes) for t in toks[i : i + 3])
        for i in range(0, len(toks), 3)
    ]
    return sel, patterns


class MiniGraph:
    """An in-memory triple set with conjunctive BGP evaluation.

    Small by construction (it is broadcast), so evaluation is a simple
    binding-propagating nested-loop join with a predicate index.
    """

    def __init__(self, rows: Iterable[GraphRow]) -> None:
        self.rows: List[GraphRow] = list(rows)
        self._by_pred: Dict[str, List[GraphRow]] = {}
        for r in self.rows:
            self._by_pred.setdefault(r[1], []).append(r)

    def __len__(self) -> int:
        return len(self.rows)

    @staticmethod
    def _term_of(row: GraphRow, pos: int):
        if pos == 0:
            return IriNode(row[0])
        if pos == 1:
            return IriNode(row[1])
        if row[2] == "iri":
            return IriNode(row[3])
        return LitNode(row[3], lang=row[4])

    @staticmethod
    def _matches(term_spec, term) -> bool:
        kind = term_spec[0]
        if kind == "iri":
            return isinstance(term, IriNode) and term.value == term_spec[1]
        if kind == "lit":
            return (
                isinstance(term, LitNode)
                and term.lexical == term_spec[1]
                and (term_spec[2] is None or term.lang == term_spec[2])
            )
        return True  # var

    def query(self, where_clause: str) -> List[Dict[str, object]]:
        selected, patterns = parse_query(where_clause)
        bindings: List[Dict[str, object]] = [{}]
        for pat in patterns:
            new_bindings: List[Dict[str, object]] = []
            # Narrow the scan through the predicate index when bound.
            cand = self._by_pred.get(pat[1][1], []) if pat[1][0] == "iri" else self.rows
            for b in bindings:
                for row in cand:
                    nb = dict(b)
                    ok = True
                    for pos in range(3):
                        spec = pat[pos]
                        term = self._term_of(row, pos)
                        if spec[0] == "var":
                            prev = nb.get(spec[1])
                            if prev is None:
                                nb[spec[1]] = term
                            elif prev != term:
                                ok = False
                                break
                        elif not self._matches(spec, term):
                            ok = False
                            break
                    if ok:
                        new_bindings.append(nb)
            bindings = new_bindings
            if not bindings:
                break
        return [{v: b.get(v) for v in selected} for b in bindings]


# ---------------------------------------------------------------------------
# TTL-lite parsing (fixture ontologies)

_TTL_PREFIX = re.compile(r"@prefix\s+([A-Za-z][\w-]*)\s*:\s*<([^>]*)>\s*\.")
_TTL_STMT = re.compile(
    r"(<[^>]*>|[A-Za-z][\w-]*:[\w./#-]+)\s+"
    r"(<[^>]*>|a|[A-Za-z][\w-]*:[\w./#-]+)\s+"
    r'(<[^>]*>|"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+)?|[A-Za-z][\w-]*:[\w./#-]+|[-+]?\d+(?:\.\d+)?)\s*\.'
)


def parse_ttl(text: str) -> List[GraphRow]:
    """Parse a simple Turtle subset: @prefix decls + one-triple statements."""
    prefixes = {m.group(1): m.group(2) for m in _TTL_PREFIX.finditer(text)}

    def iri_of(tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        if tok == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        pfx, member = tok.split(":", 1)
        if pfx not in prefixes:
            raise ProcessorException(f"Unknown TTL prefix: {pfx}")
        return prefixes[pfx] + member

    rows: List[GraphRow] = []
    body = _TTL_PREFIX.sub("", text)
    for m in _TTL_STMT.finditer(body):
        s = iri_of(m.group(1))
        p = iri_of(m.group(2))
        otok = m.group(3)
        if otok.startswith('"'):
            lm = re.match(r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z-]+))?$', otok)
            rows.append((s, p, "literal", lm.group(1).replace('\\"', '"'), lm.group(2)))
        elif otok[0].isdigit() or otok[0] in "+-":
            rows.append((s, p, "literal", otok, None))
        else:
            rows.append((s, p, "iri", iri_of(otok), None))
    return rows


def make_query_fn(graphs: Dict[str, MiniGraph]):
    """Build the interpreter's query_fn over named broadcast graphs."""

    def query_fn(select_vars: List[str], from_graph: str, where_clause: str):
        g = graphs.get(from_graph)
        if g is None:
            raise ProcessorException(f"Unknown graph for select: {from_graph!r}")
        rows = g.query(where_clause)
        return [{v: r.get(v) for v in select_vars} for r in rows]

    return query_fn
