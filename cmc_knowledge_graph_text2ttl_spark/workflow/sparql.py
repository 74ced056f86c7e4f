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
* ``OPTIONAL { triple-patterns }`` — single level, SPARQL left-join
  semantics (all extensions if any; otherwise the binding survives with
  the optional vars unbound)
* ``FILTER ( expr )`` — comparisons ``= != < <= > >=`` (numeric when
  both sides parse as numbers, lexical otherwise), ``regex(?v, "pat")``
  / ``regex(?v, "pat", "i")``, combined with ``&&``, ``||``, ``!`` and
  parentheses; an unbound variable makes the filter false (SPARQL error
  semantics). Filters apply after the group's patterns and OPTIONALs,
  matching SPARQL's end-of-group filter scope.

No property paths / UNION / subqueries — workflows needing those should
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


def _parse_patterns(body: str, prefixes: Dict[str, str], where_clause: str) -> List[tuple]:
    """Tokenize a pattern block term-wise (IRIs and prefixed names
    legitimately contain dots; the statement separator is any bare '.'
    left between term matches). Anything the tokenizer cannot match —
    other than whitespace and separator dots — is an error, never
    silently dropped."""
    toks = []
    pos = 0
    for m in _TERM.finditer(body):
        gap = body[pos : m.start()]
        if gap.strip(" \t\r\n."):
            raise ProcessorException(
                f"Unparseable where-clause content {gap.strip()!r} in: {where_clause!r}"
            )
        pos = m.end()
        t = m.group(1)
        # a prefixed name glued to its statement-separator dot
        if not t.startswith(("<", '"', "?")) and t.endswith("."):
            t = t[:-1]
        if t:
            toks.append(t)
    tail = body[pos:]
    if tail.strip(" \t\r\n."):
        raise ProcessorException(
            f"Unparseable where-clause content {tail.strip()!r} in: {where_clause!r}"
        )
    if len(toks) % 3 != 0:
        raise ProcessorException(
            f"Bad where clause (expected triples of terms): {where_clause!r}"
        )
    return [
        tuple(_parse_term(t, prefixes) for t in toks[i : i + 3])
        for i in range(0, len(toks), 3)
    ]


_OPTIONAL_KW = re.compile(r"(?i)\bOPTIONAL\s*\{")
_FILTER_KW = re.compile(r"(?i)\bFILTER\s*\(")


def _extract_blocks(body: str) -> Tuple[str, List[str], List[str]]:
    """Split a WHERE body into (required-pattern text, optional bodies,
    filter expression strings). OPTIONAL groups are single-level (no
    nested braces); FILTER parens are balanced-counted so regex("...")
    calls nest fine."""
    optionals: List[str] = []
    filters: List[str] = []

    def take_optionals(s: str) -> str:
        out = []
        pos = 0
        while True:
            m = _OPTIONAL_KW.search(s, pos)
            if m is None:
                out.append(s[pos:])
                return "".join(out)
            out.append(s[pos : m.start()])
            close = s.find("}", m.end())
            if close < 0:
                raise ProcessorException(f"Unterminated OPTIONAL group in: {s!r}")
            optionals.append(s[m.end() : close])
            pos = close + 1

    def take_filters(s: str) -> str:
        out = []
        pos = 0
        while True:
            m = _FILTER_KW.search(s, pos)
            if m is None:
                out.append(s[pos:])
                return "".join(out)
            out.append(s[pos : m.start()])
            depth, i = 1, m.end()
            in_str = False
            while i < len(s) and depth:
                ch = s[i]
                if in_str:
                    if ch == "\\":
                        i += 1
                    elif ch == '"':
                        in_str = False
                elif ch == '"':
                    in_str = True
                elif ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                i += 1
            if depth:
                raise ProcessorException(f"Unterminated FILTER in: {s!r}")
            filters.append(s[m.end() : i - 1])
            pos = i

    required = take_filters(take_optionals(body))
    return required, optionals, filters


def parse_query(where_clause: str):
    """Parse a SELECT query → (selected vars, required patterns,
    optional pattern groups, compiled filter expressions)."""
    prefixes = {m.group(1): m.group(2) for m in _PREFIX_DECL.finditer(where_clause)}
    body = _PREFIX_DECL.sub("", where_clause)
    m = _SELECT_WHERE.search(body)
    if m is None:
        raise ProcessorException(f"Unsupported query (need SELECT..WHERE{{..}}): {where_clause}")
    sel = [v.lstrip("?") for v in re.split(r"\s+", m.group(1).strip()) if v]
    required, opt_bodies, filter_srcs = _extract_blocks(m.group(2))
    patterns = _parse_patterns(required, prefixes, where_clause)
    for ob in opt_bodies:
        # the pattern tokenizer skips unknown words, so an unsupported
        # construct inside OPTIONAL must fail loudly, not vanish
        if re.search(r"(?i)\b(FILTER|OPTIONAL|UNION)\b", ob):
            raise ProcessorException(
                "FILTER/OPTIONAL/UNION inside an OPTIONAL group is not "
                f"supported by the mini evaluator: {ob!r}"
            )
    optionals = [_parse_patterns(ob, prefixes, where_clause) for ob in opt_bodies]
    filters = [_parse_filter(fs, prefixes) for fs in filter_srcs]
    return sel, patterns, optionals, filters


# ---------------------------------------------------------------------------
# FILTER expressions: recursive-descent over a small token stream

_FILTER_TOKEN = re.compile(
    # IRI first (no whitespace inside an IRI, so "<= 5" can't match it),
    # then two-char operators before their one-char prefixes
    r"""\s*(<[^<>\s]*>|\|\||&&|!=|<=|>=|[=<>!()]|,|regex\b|"""
    r"""\?[A-Za-z_][\w-]*|"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+)?|"""
    r"""[-+]?\d+(?:\.\d+)?|[A-Za-z][\w-]*:[\w./#-]+)\s*""",
    re.IGNORECASE,
)


def _parse_filter(src: str, prefixes: Dict[str, str]):
    toks: List[str] = []
    pos = 0
    while pos < len(src):
        m = _FILTER_TOKEN.match(src, pos)
        if m is None:
            raise ProcessorException(f"Bad FILTER expression near: {src[pos:]!r}")
        toks.append(m.group(1))
        pos = m.end()
    idx = [0]

    def peek():
        return toks[idx[0]] if idx[0] < len(toks) else None

    def take(expected=None):
        t = peek()
        if t is None or (expected is not None and t != expected):
            raise ProcessorException(
                f"FILTER parse error: expected {expected!r}, got {t!r} in {src!r}"
            )
        idx[0] += 1
        return t

    def parse_or():
        node = parse_and()
        while peek() == "||":
            take()
            node = ("or", node, parse_and())
        return node

    def parse_and():
        node = parse_unary()
        while peek() == "&&":
            take()
            node = ("and", node, parse_unary())
        return node

    def parse_unary():
        if peek() == "!":
            take()
            return ("not", parse_unary())
        return parse_primary()

    def parse_operand():
        t = take()
        if t.startswith("?"):
            return ("var", t[1:])
        if re.fullmatch(r"[-+]?\d+(?:\.\d+)?", t):
            return ("num", float(t))
        return _parse_term(t, prefixes)

    def parse_primary():
        t = peek()
        if t == "(":
            take()
            node = parse_or()
            take(")")
            return node
        if t is not None and t.lower() == "regex":
            take()
            take("(")
            operand = parse_operand()
            take(",")
            pat_tok = take()
            pat = re.match(r'"((?:[^"\\]|\\.)*)"', pat_tok).group(1)
            flags = 0
            if peek() == ",":
                take()
                if "i" in take().lower():
                    flags = re.IGNORECASE
            take(")")
            return ("regex", operand, re.compile(pat, flags))
        left = parse_operand()
        op = take()
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise ProcessorException(f"Unsupported FILTER operator {op!r} in {src!r}")
        right = parse_operand()
        return ("cmp", op, left, right)

    node = parse_or()
    if peek() is not None:
        raise ProcessorException(f"Trailing tokens in FILTER: {src!r}")
    return node


class _FilterUnbound(Exception):
    """SPARQL error semantics: an unbound var poisons the expression."""


def _operand_value(spec, binding):
    kind = spec[0]
    if kind == "var":
        term = binding.get(spec[1])
        if term is None:
            raise _FilterUnbound(spec[1])
        return term
    if kind == "num":
        return spec[1]
    if kind == "iri":
        return IriNode(spec[1])
    return LitNode(spec[1], lang=spec[2])  # lit


def _as_comparable(value):
    """(numeric?, value) — numbers compare numerically, rest lexically."""
    if isinstance(value, (int, float)):
        return (True, float(value))
    lex = value.value if isinstance(value, IriNode) else value.lexical
    try:
        return (True, float(lex))
    except (TypeError, ValueError):
        return (False, lex)


def _eval_filter(node, binding) -> bool:
    op = node[0]
    if op == "or":
        # SPARQL logical-or: error || true is true; evaluate both arms
        lhs = _try_eval(node[1], binding)
        rhs = _try_eval(node[2], binding)
        if lhs is None and rhs is None:
            raise _FilterUnbound("both arms")
        return bool(lhs) or bool(rhs)
    if op == "and":
        return _eval_filter(node[1], binding) and _eval_filter(node[2], binding)
    if op == "not":
        return not _eval_filter(node[1], binding)
    if op == "regex":
        v = _operand_value(node[1], binding)
        lex = v.value if isinstance(v, IriNode) else (
            v.lexical if isinstance(v, LitNode) else str(v)
        )
        return node[2].search(lex) is not None
    # cmp
    _, cmp_op, lspec, rspec = node
    lv = _operand_value(lspec, binding)
    rv = _operand_value(rspec, binding)
    ln, lval = _as_comparable(lv)
    rn, rval = _as_comparable(rv)
    if ln and rn:
        a, b = lval, rval
    else:
        a, b = str(lval), str(rval)
    if cmp_op == "=":
        return a == b
    if cmp_op == "!=":
        return a != b
    if cmp_op == "<":
        return a < b
    if cmp_op == "<=":
        return a <= b
    if cmp_op == ">":
        return a > b
    return a >= b


def _try_eval(node, binding):
    try:
        return _eval_filter(node, binding)
    except _FilterUnbound:
        return None


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

    def _eval_bgp(
        self, patterns: List[tuple], bindings: List[Dict[str, object]]
    ) -> List[Dict[str, object]]:
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
        return bindings

    def query(self, where_clause: str) -> List[Dict[str, object]]:
        selected, patterns, optionals, filters = parse_query(where_clause)
        bindings = self._eval_bgp(patterns, [{}])
        # OPTIONAL = left join: every extension if any, else the binding
        # survives with the optional vars unbound.
        for opt in optionals:
            extended: List[Dict[str, object]] = []
            for b in bindings:
                ext = self._eval_bgp(opt, [b])
                extended.extend(ext if ext else [b])
            bindings = extended
        # FILTERs scope over the whole group (post-OPTIONAL); an unbound
        # var in a filter is a SPARQL error → binding dropped.
        for f in filters:
            bindings = [b for b in bindings if _try_eval(f, b)]
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
