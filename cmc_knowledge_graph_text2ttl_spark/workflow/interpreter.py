"""Per-document workflow interpreter.

Executes a compiled :class:`~..workflow.compile.WorkflowProgram` against one
document's text, producing flattened triple rows + stats. This is pure
Python with zero Spark dependencies: the same class is

* the kernel that runs inside Arrow-batched ``mapInPandas`` on executors
  (one instance per (document, workflow), amortized over a batch), and
* the single-process oracle used by the test suite and golden generation.

Semantic parity notes — the behaviors below reproduce the reference
(`/root/reference/kg_text_to_ttl/text_to_turtle_processor.py`) including
its quirks, because triple-set agreement (P/R >= 0.95) is the gate:

* dispatch picks the FIRST keyword of ``KEYWORDS`` present in a step
  (processor.py:711-718);
* match ops default to ``re.DOTALL`` and ``flags:`` *adds* to that
  default rather than replacing it (processor.py:1228, 2743-2760);
* template expansion (processor.py:2599-2669): innermost-first iterative
  rewrite; ``@{?...}`` yields ``""`` only for undefined *named-match*
  refs; an undefined variable expands to the literal string ``"None"``
  because the reference stringifies before its None-check
  (processor.py:2644) — replicated for byte parity;
* the literal coercion cascade incl. the ``^`` string-escape, the
  empty-float→``nan`` rule, the falsy-value table for ``bool:``, and the
  fall-through (error) behavior of ``date: today`` / ``datetime: now``
  (processor.py:2370-2524);
* stats: ``score += 1 - 1/max(1, match_len)`` per successful match;
  ``no_triples`` counts every add including inverses and duplicates
  (processor.py:2713-2725); the emitted triple *set* is deduplicated
  (rdflib graph set semantics, processor.py:2319).

Documented deviations (reference bugs not worth reproducing because no
valid workflow can rely on them):

* ``select:`` with a ``do:`` body crashes in the reference on the first
  result row (``no_rows += 1`` without ``nonlocal``, processor.py:2184);
  here it works: per-row variable binding + body execution.
* template expansion is capped at 100k rewrites (the reference loops
  forever on self-reproducing expansions).
"""

from __future__ import annotations

import html as _html
import importlib
import re
from dataclasses import dataclass, field
from datetime import date, datetime
from functools import lru_cache
from typing import Any, Callable, Dict, List, Optional, Tuple

from ..core.errors import ProcessorException
from ..core.terms import IriNode, LitNode, XSD, node_to_row
from .compile import KEYWORDS, WorkflowProgram

# ---------------------------------------------------------------------------
# Regex helpers

_FLAG_BY_NAME = {
    "I": re.IGNORECASE,
    "IGNORECASE": re.IGNORECASE,
    "L": re.LOCALE,
    "LOCALE": re.LOCALE,
    "A": re.ASCII,
    "ASCII": re.ASCII,
    "M": re.MULTILINE,
    "MULTILINE": re.MULTILINE,
    "S": re.DOTALL,
    "DOTALL": re.DOTALL,
    "X": re.VERBOSE,
    "VERBOSE": re.VERBOSE,
}

# Template reference: @{?name.group:func} (processor.py:2624).
_TEMPLATE_REF = re.compile(
    r"@\{\??(([a-zA-Z0-9_-]+)\.)?((\d+)|([a-zA-Z][a-zA-Z0-9_-]*))(\:[a-zA-Z]+)?\}"
)

# prefix:member node reference (processor.py:2347).
_PREFIX_REF = re.compile(r"\s*([a-zA-Z][a-zA-Z0-9]*)\:([a-zA-Z][a-zA-Z0-9_\.\-/#]*)\s*")

_IFDEF_MATCH_REF = re.compile(r"(\w+)\.(\d+)")

_MAX_TEMPLATE_REWRITES = 100_000

_KEYWORD_PRIORITY = {kw: i for i, kw in enumerate(KEYWORDS)}

# Prepared-attribute cache key. Step dicts come from a broadcast program
# and are never mutated by execution, so each handler extracts/validates
# its attributes ONCE per process and stashes the tuple in the step dict
# itself under this reserved key (invisible to dispatch — not a keyword —
# and to the do-*-* scans). Python workers are single-threaded per
# process, so the in-place stash is race-free.
_PREP = "\x00prep"


@lru_cache(maxsize=65536)
def _parse_template(template: str):
    """Segment a template into (None, literal) and
    (True, raw, optional, match_id, group, func) parts; None if no ref."""
    parts = []
    pos = 0
    found = False
    for m in _TEMPLATE_REF.finditer(template):
        found = True
        if m.start(0) > pos:
            parts.append((None, template[pos : m.start(0)]))
        gn: Any = int(m.group(4)) if m.group(4) else m.group(5)
        func = m.group(6)[1:] if m.group(6) is not None else None
        parts.append(
            (True, m.group(0), m.group(0).startswith("@{?"), m.group(2), gn, func)
        )
        pos = m.end(0)
    if not found:
        return None
    if pos < len(template):
        parts.append((None, template[pos:]))
    return tuple(parts)


@lru_cache(maxsize=4096)
def _rx(pattern: str, flags: int) -> re.Pattern:
    """Process-wide compiled-regex cache (amortizes across a whole Arrow
    batch of documents on an executor)."""
    return re.compile(pattern, flags)


def resolve_flags(flags_src: Optional[str], init: int = 0) -> int:
    """Build an ``re`` flag bit-vector from a whitespace-separated name list.

    NOTE: the result is OR-ed onto ``init`` — match ops keep their DOTALL
    default even when ``flags:`` is given (processor.py:2754-2760).
    """
    if flags_src is None:
        return init
    flags = init
    for name in re.split(r"\s+", flags_src):
        v = _FLAG_BY_NAME.get(name)
        if v is None:
            raise ProcessorException(f"unrecognized regex flag name {name!r}")
        flags |= v
    return flags


# ---------------------------------------------------------------------------
# Result containers


@dataclass
class DocResult:
    """Everything one (document, workflow) run produces."""

    triples: List[tuple] = field(default_factory=list)  # deduped, in order
    no_matches: int = 0
    no_triples: int = 0  # raw adds incl. inverse + duplicates
    total_match_len: int = 0
    score: float = 0.0
    texts: Dict[str, str] = field(default_factory=dict)  # dump: file outputs
    saved_as: List[str] = field(default_factory=list)  # save-as: requests
    log: List[str] = field(default_factory=list)
    error: Optional[str] = None


QueryFn = Callable[[List[str], str, str], List[Dict[str, Any]]]


class DocInterpreter:
    """Interprets one workflow against one document text.

    :param text: the document's (extracted) text.
    :param query_fn: handler for ``select:`` ops —
        ``(selected_vars, from_graph, where_clause) -> [ {var: term} ]``
        where terms are :class:`IriNode` / :class:`LitNode` / ``str``.
    :param collect_log: keep echo/info lines (off by default at scale).
    """

    def __init__(
        self,
        text: str = "",
        query_fn: Optional[QueryFn] = None,
        collect_log: bool = False,
        initial_vars: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.result = DocResult()
        self._text = text
        self._vars: Dict[str, Any] = dict(initial_vars or {})
        self._matches: Dict[str, re.Match] = {}
        self._latest_match: Optional[re.Match] = None
        self._prefixes: Dict[str, str] = {}
        self._mappings: Dict[str, Tuple[dict, list, int]] = {}
        self._procedures: Dict[str, list] = {}
        self._imports: Dict[str, bool] = {}
        self._seen_triples: set = set()
        self._dim_tags_stack: List[list] = []
        self._break_dimension = False
        self._collect_log = collect_log
        self._query_fn = query_fn

    # -- public API ---------------------------------------------------------

    def set_var(self, name: str, value: Any) -> None:
        self._vars[name] = value

    def run(self, program: WorkflowProgram) -> DocResult:
        self.execute_plan(program.plan)
        return self.result

    def execute_plan(self, plan: list) -> None:
        for step in plan:
            self._dispatch(step)

    # -- dispatch -----------------------------------------------------------

    def _dispatch(self, step: Any, **triple_kwargs) -> Tuple[bool, Any]:
        if not isinstance(step, dict):
            raise ProcessorException(f"workflow step must be a mapping, got {step!r}")
        # Dispatch = FIRST keyword (in KEYWORDS order) present in the step
        # (processor.py:711-718). Scanning the step's own keys (few) and
        # picking the minimum priority is equivalent and ~6x cheaper than
        # scanning all 34 keywords per step.
        kw = None
        best = len(KEYWORDS)
        for k in step:
            idx = _KEYWORD_PRIORITY.get(k)
            if idx is not None and idx < best:
                best = idx
                kw = k
        if kw is None:
            raise ProcessorException(f"step has no recognizable operation keyword: {step!r}")
        handler = self._HANDLERS[kw]
        if kw in ("subject", "predicate", "object"):
            return handler(self, step, **triple_kwargs)
        if triple_kwargs:
            # A non-triple step nested under predicates:/objects: is a
            # workflow authoring error: the reference passes the implied
            # subject/predicate kwargs to every handler and crashes with a
            # TypeError (processor.py:711-718). Raise the engine's typed
            # error instead of silently dropping the implied terms.
            raise ProcessorException(
                f"Step {kw!r} is not a triple op but appears inside a "
                f"predicates:/objects: scope"
            )
        return handler(self, step)

    def _seq(
        self,
        plan: list,
        return_first_success: bool = False,
        stop_on_failure: bool = False,
    ) -> Tuple[bool, Any]:
        """Run a sub-op sequence; result is the last op's (success, value).

        An empty sequence is an error, as in the reference (which hits an
        UnboundLocalError at processor.py:2564).
        """
        success: Optional[bool] = None
        value: Any = None
        for step in plan:
            reply = self._dispatch(step)
            if isinstance(reply, tuple):
                success, value = reply
            else:
                success, value = True, reply
            if success and return_first_success:
                return (True, value)
            if not success and stop_on_failure:
                return (False, value)
        if success is None:
            raise ProcessorException("cannot execute an empty step sequence")
        return (success, value)

    # -- attribute access ----------------------------------------------------

    @staticmethod
    def _attr(step: dict, name: str, expected_type=None, optional: bool = False):
        val = step.get(name)
        if val is None:
            if optional:
                return None
            raise ProcessorException(f"step is missing its required {name!r} attribute")
        if expected_type is not None and not isinstance(val, expected_type):
            raise ProcessorException(
                f"Step attribute '{name}' has invalid type; expected {expected_type}"
            )
        return val

    # -- logging --------------------------------------------------------------

    def _log(self, prefix: str, message: str) -> None:
        if self._collect_log:
            self.result.log.append(f"{prefix}{message}")

    # -- stats ----------------------------------------------------------------

    def _stat_match(self, match_len: int) -> None:
        self.result.no_matches += 1
        self.result.score += 1.0 - (1.0 / max(1, match_len))
        self.result.total_match_len += match_len

    # -- template expansion (processor.py:2599-2669) --------------------------
    #
    # Strategy: templates are program constants, so their (literal, ref)
    # segmentation is parsed ONCE (module lru_cache) and refs evaluate
    # left-to-right in a single pass. If any substitution re-introduces
    # reference syntax (nesting like @{material-@{row}.1}, or values that
    # contain "@{"), the joined result is expanded again — converging to
    # exactly the reference's rewrite-until-no-refs fixpoint
    # (processor.py:2622-2666) without its per-ref string rebuilding.

    def expand(self, template: str) -> str:
        # fast path: no reference syntax at all (common for fixed IRIs)
        if isinstance(template, str) and "@{" not in template:
            return template
        original = template
        try:
            for _ in range(_MAX_TEMPLATE_REWRITES):
                parts = _parse_template(template)
                if parts is None:  # contains "@{" but no valid ref
                    return template
                out = []
                for part in parts:
                    if part[0] is None:
                        out.append(part[1])
                        continue
                    _, raw, optional, match_id, gn, func = part
                    try:
                        if match_id:
                            if match_id in self._matches:
                                ext = self._matches[match_id].group(gn)
                            else:
                                if not optional:
                                    raise ProcessorException(
                                        f"no stored match has id {match_id} while "
                                        f"looking at template {template}"
                                    )
                                ext = ""
                        else:
                            # Reference quirk (processor.py:2644): the variable
                            # is stringified BEFORE the None-check, so an
                            # undefined variable expands to the literal string
                            # "None"; the latest-match fallback is unreachable.
                            ext = str(self._vars.get(gn))
                    except IndexError:
                        raise ProcessorException(
                            f"template references undefined group/variable {raw}"
                        )
                    if func is not None:
                        if func == "iri":
                            ext = re.sub(r"[^a-zA-Z0-9_-]", "_", ext.strip())
                        elif func == "trim":
                            ext = ext.strip()
                        elif func == "norm":
                            ext = _html.unescape(
                                re.sub(r"[\n\t\r]+", " ", ext.strip())
                            )
                    out.append(ext or "")
                result = "".join(out)
                if "@{" not in result:
                    return result
                if result == template:
                    return result  # no ref made progress; fixpoint
                template = result
            raise ProcessorException("template expansion did not converge (rewrite limit hit)")
        except Exception as ex:
            raise ProcessorException(f"template expansion failed for: {original}") from ex

    # -- node / literal parsing (processor.py:2349-2524) ----------------------

    def _parse_node(self, n: Any):
        n = self.expand(n)
        m = _PREFIX_REF.match(n)
        if m:
            ns = self._prefixes.get(m.group(1))
            if ns is None:
                raise ProcessorException(f"no prefix declaration in scope for {m.group(1)!r}")
            return IriNode(ns + m.group(2))
        return IriNode(n)

    def _parse_literal(self, l: Any):
        if isinstance(l, (IriNode, LitNode)):
            return l
        if isinstance(l, dict):
            return self._parse_structured_literal(l)
        if isinstance(l, list):
            success, value = self._seq(l, return_first_success=True)
            if not success:
                raise ProcessorException(f"object spec {l!r} produced no usable value during expansion")
            if isinstance(value, (IriNode, LitNode)):
                return value
            if not isinstance(value, str):
                # The reference returns raw Python values here (which later
                # crash rdflib); we coerce them to typed literals instead.
                if isinstance(value, bool):
                    return LitNode("true" if value else "false", datatype=XSD.boolean)
                if isinstance(value, int):
                    return LitNode(str(value), datatype=XSD.integer)
                if isinstance(value, float):
                    return LitNode(str(value), datatype=XSD.float)
                return LitNode(str(value))
            l = value
        # Plain string: auto-coercion cascade (processor.py:2504-2524).
        l = self.expand(l)
        try:
            return LitNode(str(int(l)), datatype=XSD.integer)
        except ValueError:
            pass
        try:
            return LitNode(str(float(l)), datatype=XSD.float)
        except ValueError:
            pass
        sl = l.strip()
        if sl in ("true", "True", "TRUE"):
            return LitNode("true", datatype=XSD.boolean)
        if sl in ("false", "False", "FALSE"):
            return LitNode("false", datatype=XSD.boolean)
        if l.startswith("^"):
            l = l[1:]
        return LitNode(l)

    def _parse_structured_literal(self, l: dict):
        prep = l.get(_PREP)
        if prep is None:
            prep = (
                self._attr(l, "text", str, optional=True),
                self._attr(l, "iri", str, optional=True),
                self._attr(l, "lang", str, optional=True),
                self._attr(l, "integer", str, optional=True),
                self._attr(l, "float", str, optional=True),
                self._attr(l, "bool", str, optional=True),
                self._attr(l, "date", str, optional=True),
                self._attr(l, "datetime", str, optional=True),
                self._attr(l, "format", str, optional=True),
                self._attr(l, "apply", str, optional=True),
            )
            l[_PREP] = prep
        (text, iri, lang, vint, vfloat, vbool, vdate, vdtime, fmt,
         apply_map) = prep

        ndef = [a for v, a in (
            (text, "text"), (iri, "iri"), (vint, "integer"),
            (vfloat, "float"), (vbool, "bool"),
        ) if v is not None]
        if len(ndef) > 1:
            raise ProcessorException(
                f"object spec {l!r} defines more than one value attribute ({', '.join(ndef)})"
            )
        if len(ndef) < 1:
            raise ProcessorException(
                f"object spec {l!r} lacks a value attribute "
                "(expected one of text:, iri:, integer:, float:, bool:)"
            )
        # NOTE: truthiness checks (not is-not-None) reproduce the reference:
        # an empty-string integer: falls through to the next branches.
        if vint:
            v = self.expand(vint)
            try:
                return LitNode(str(int(v)), datatype=XSD.integer)
            except ValueError:
                raise ProcessorException(f"integer object: {v!r} does not parse as an int literal")
        if vfloat:
            v = self.expand(vfloat)
            if v.strip() == "":
                v = "nan"
            try:
                return LitNode(str(float(v)), datatype=XSD.float)
            except ValueError:
                raise ProcessorException(f"float object: {v!r} does not parse as a float literal")
        if vbool:
            v = self.expand(vbool)
            if v.strip() == "":
                v = "False"
            b = str(v).lower().strip() not in ("false", "0", "0.0", "", "none")
            return LitNode("true" if b else "false", datatype=XSD.boolean)
        if vdate:
            v = self.expand(vdate)
            if v.strip().lower() == "today":
                # Reference quirk: computes date.today() but falls through
                # without returning (processor.py:2422-2423) → ends in an
                # expansion error. Reproduced as an explicit error.
                raise ProcessorException(
                    "date: today yields no value (reference semantics fall "
                    "through without returning)"
                )
            if fmt:
                try:
                    d = datetime.strptime(v, fmt).date()
                    return LitNode(d.isoformat(), datatype=XSD.date)
                except ValueError:
                    raise ProcessorException(
                        f"date object: {v!r} does not match format {fmt}"
                    )
            try:
                d = date.fromisoformat(v)
                return LitNode(d.isoformat(), datatype=XSD.date)
            except ValueError:
                raise ProcessorException(
                    f"date object: {v!r} is not ISO-format"
                )
        if vdtime:
            v = self.expand(vdtime)
            if v.strip().lower() == "now":
                raise ProcessorException(
                    "Failed: datetime: now falls through in reference semantics"
                )
            if not fmt:
                # Reference calls strptime(v, None) → TypeError (processor.py:2450).
                raise ProcessorException(
                    "Object datetime: requires a format: attribute"
                )
            try:
                d = datetime.strptime(v, fmt)
                return LitNode(d.isoformat(), datatype=XSD.dateTime)
            except ValueError:
                raise ProcessorException(
                    f"datetime object: {v!r} does not match format {fmt}"
                )
        if iri:
            iri = self.expand(iri)
            m = _PREFIX_REF.match(iri)
            if m:
                ns = self._prefixes.get(m.group(1))
                if ns is None:
                    raise ProcessorException(f"no prefix declaration in scope for {m.group(1)!r}")
                return IriNode(ns + m.group(2))
            return IriNode(iri)
        if text is not None:
            t = self.expand(text)
            if lang:
                return LitNode(t, lang=lang)
            return LitNode(t)
        # Only reachable with text=None; the reference then crashes on
        # expand(None) (processor.py:2473/2486). NOTE: apply: next to text:
        # is silently IGNORED in the reference — the text: branch returns
        # first. We reproduce the error here.
        raise ProcessorException(f"object spec {l!r} yields no usable value")

    # -- triple emission (processor.py:2226-2332) ------------------------------

    def _emit(self, subj, pred, obj, inverse=None) -> None:
        s = self._parse_node(subj)
        p = self._parse_node(pred)
        o = self._parse_literal(obj)
        self._add(s, p, o)
        if inverse:
            i = self._parse_node(inverse)
            self._add(o, i, s)

    def _add(self, s, p, o) -> None:
        row = node_to_row(s, p, o)
        self.result.no_triples += 1  # raw count incl. duplicates
        if row not in self._seen_triples:  # graph set semantics
            self._seen_triples.add(row)
            self.result.triples.append(row)

    def _op_triple(self, op: dict, implied_subject=None, implied_predicate=None,
                   implied_inverse=None) -> Tuple[bool, Any]:
        prep = op.get(_PREP)
        if prep is None:
            prep = (
                self._attr(op, "subject", str, optional=True),
                self._attr(op, "predicate", str, optional=True),
                self._attr(op, "object", optional=True),
                self._attr(op, "predicates", list, optional=True),
                self._attr(op, "objects", list, optional=True),
                self._attr(op, "inverse", str, optional=True),
            )
            op[_PREP] = prep
        subject, predicate, obj, predicates, objects, inverse = prep

        if subject:
            if implied_subject:
                raise ProcessorException(f"subject already set to {implied_subject}; nested redefinition is not allowed")
        elif not implied_subject:
            raise ProcessorException(f"triple emission without a subject in scope: {op!r}")

        if predicate or predicates:
            if not (subject or implied_subject):
                raise ProcessorException(
                    f"predicate {predicate or predicates!r} given before any subject"
                )
            if implied_predicate:
                raise ProcessorException(f"predicate already set to {implied_predicate}; nested redefinition is not allowed")
        elif not implied_predicate:
            raise ProcessorException(f"triple emission without a predicate in scope: {op!r}")

        if obj or objects:
            if not (subject or implied_subject):
                raise ProcessorException(f"object given but no subject is in scope: {op!r}")
            if not (predicate or implied_predicate):
                raise ProcessorException(f"object given but no predicate is in scope: {op!r}")
            if obj and objects:
                raise ProcessorException(
                    f"both a single object and an object list given in {op!r}"
                )
            if predicates:
                raise ProcessorException(
                    f"Trying to define object for multiple predicates at the same level in {op!r}"
                )
        if inverse and not predicate:
            raise ProcessorException(f"inverse: must accompany a predicate definition: {op!r}")

        if predicates:
            for sub in predicates:
                self._dispatch(sub, implied_subject=subject)
        elif objects:
            for sub in objects:
                self._dispatch(
                    sub,
                    implied_subject=(subject or implied_subject),
                    implied_predicate=predicate,
                    implied_inverse=inverse,
                )
        elif obj:
            self._emit(
                subject or implied_subject,
                predicate or implied_predicate,
                obj,
                inverse=(inverse or implied_inverse),
            )
        return (True, None)

    # -- infrastructure ops -----------------------------------------------------

    def _op_pass(self, op: dict) -> Tuple[bool, Any]:
        return (True, None)

    def _op_desc(self, op: dict) -> Tuple[bool, Any]:
        desc = self._attr(op, "desc", str)
        self._log("DESC: ", desc)
        return (True, desc)

    def _op_echo(self, op: dict) -> Tuple[bool, Any]:
        message = self.expand(self._attr(op, "echo", str))
        self._log("ECHO: ", message)
        return (True, message)

    def _op_dump(self, op: dict) -> Tuple[bool, Any]:
        what = self._attr(op, "dump", str)
        fname = self._attr(op, "file", str, optional=True)
        t = self._text if what.strip() in ("_", "*", "ct", "current-text") else self.expand(what)
        if fname is not None:
            fname = self.expand(fname)
            self.result.texts[fname] = t
        else:
            self._log("DUMP", t)
        return (True, fname)

    def _op_any_of(self, op: dict) -> Tuple[bool, Any]:
        return self._seq(self._attr(op, "any-of", list), return_first_success=True)

    def _op_save_as(self, op: dict) -> Tuple[bool, Any]:
        target = self._attr(op, "save-as")
        if isinstance(target, dict):
            f_name = self._attr(target, "file", str, optional=True)
            b_name = self._attr(target, "bucket", str, optional=True)
            if f_name is None and b_name is None:
                raise ProcessorException(
                    "save-as needs a 'file' or 'bucket' attribute"
                )
            f_name = f_name or b_name
        else:
            f_name = target
        f_name = self.expand(f_name)
        self.result.saved_as.append(f_name)
        return (True, f_name)

    # -- variables ---------------------------------------------------------------

    def _op_set(self, op: dict) -> Tuple[bool, Any]:
        var = self._attr(op, "set", str)
        value = self._attr(op, "to", optional=True)
        expr = self._attr(op, "eval", str, optional=True)
        imps = self._attr(op, "import", str, optional=True)
        if value is None and expr is None:
            raise ProcessorException(
                f"set {var}: needs a to: or eval: attribute"
            )
        if value is not None and expr is not None:
            raise ProcessorException(
                f"set {var}: to: and eval: are mutually exclusive"
            )
        var = self.expand(var)  # dynamic variable names
        if expr:
            if imps is not None:
                for mod in re.split(r"\s+", imps):
                    if mod not in self._imports:
                        self._imports[mod] = importlib.import_module(mod)
            expr = self.expand(expr)
            # DEVIATION: the reference imports the module but does not put
            # it in eval's globals (processor.py:849-856), so `import: math`
            # + `eval: math.floor(x)` raises NameError there; exposing the
            # imported names makes the documented feature actually usable.
            env = {"vars": self._vars, "matches": self._matches, **self._imports}
            try:
                value = eval(expr, env)
            except Exception as ex:
                raise ProcessorException(
                    f"set {var}: eval: expression raised {ex}"
                ) from ex
        elif isinstance(value, str):
            value = self.expand(value)
        self._vars[var] = value
        return (True, value)

    def _op_clear(self, op: dict) -> Tuple[bool, Any]:
        var = self.expand(self._attr(op, "clear", str))
        self._vars[var] = None
        return (True, None)

    def _op_append(self, op: dict) -> Tuple[bool, Any]:
        var = self.expand(self._attr(op, "append", str))
        value = self._attr(op, "element")
        lst = self._vars.get(var)
        if lst is None or lst == "":
            lst = []
        elif not isinstance(lst, list):
            lst = [lst]
        lst.append(self.expand(value))
        self._vars[var] = lst
        return (True, value)

    def _op_for_each(self, op: dict) -> Tuple[bool, Any]:
        list_var = self._attr(op, "for-each")
        ident = self._attr(op, "as", str, optional=True)
        body = self._attr(op, "do", list)
        elems = self._vars.get(list_var)
        if elems is None or elems == "":
            return (False, None)
        if not isinstance(elems, list):
            raise ProcessorException(f"for-each: variable {list_var} does not hold a list")
        count = 1
        for elem in elems:
            if ident is not None:
                self._vars[ident] = elem
                self._vars[f"{ident}_count"] = count
            self._seq(body)
            count += 1
        return (count > 1, None)

    def _op_exec(self, op: dict) -> Tuple[bool, Any]:
        code = self._attr(op, "exec", str)
        env = {"vars": self._vars, "matches": self._matches}
        try:
            exec(code, env)  # trusted-workflow escape hatch (processor.py:970)
        except Exception as ex:
            raise ProcessorException(
                f"exec: embedded Python raised {ex}"
            ) from ex
        return (True, None)

    # -- conditionals -------------------------------------------------------------

    def _op_if(self, op: dict) -> Tuple[bool, Any]:
        condition = self._attr(op, "if")
        body = self._attr(op, "do", list)
        local_env = dict(self._vars)
        local_env["matches"] = self._matches
        try:
            condition = self.expand(condition)
            result = eval(str(condition), {}, local_env)
        except Exception as ex:
            raise ProcessorException(f"if: condition does not evaluate: {condition}") from ex
        if result:
            return self._seq(body)
        return (False, None)

    def _cond_def(self, op: dict, op_name: str, negate: bool) -> Tuple[bool, Any]:
        condition = self.expand(self._attr(op, op_name))
        body = self._attr(op, "do", list)
        defined = False
        m = _IFDEF_MATCH_REF.match(condition)
        if m:
            saved = self._matches.get(m.group(1))
            if saved is not None:
                g = saved.group(int(m.group(2)))
                defined = g is not None and g.strip() != ""
        else:
            v = self._vars.get(condition)
            defined = v is not None and str(v).strip() != ""
        if defined != negate:
            return self._seq(body)
        return (False, None)

    def _op_ifdef(self, op: dict) -> Tuple[bool, Any]:
        return self._cond_def(op, "ifdef", False)

    def _op_ifndef(self, op: dict) -> Tuple[bool, Any]:
        return self._cond_def(op, "ifndef", True)

    # -- procedures ----------------------------------------------------------------

    def _op_procedure(self, op: dict) -> Tuple[bool, Any]:
        name = self._attr(op, "procedure", str)
        self._procedures[name] = self._attr(op, "do", list)
        return (True, None)

    def _op_call(self, op: dict) -> Tuple[bool, Any]:
        name = self._attr(op, "call")
        args = self._attr(op, "with", dict, optional=True)
        rtnv = self._attr(op, "return", dict, optional=True)
        body = self._procedures.get(name)
        if body is None:
            raise ProcessorException(f"call: no procedure named {name} is defined")
        outer_vars, outer_matches, outer_latest = (
            self._vars,
            self._matches,
            self._latest_match,
        )
        try:
            self._vars = dict(self._vars)
            self._matches = dict(self._matches)
            if args is not None:
                for arg_name, arg_value in args.items():
                    if arg_value.startswith("~"):
                        # pass-a-match convention (processor.py:1164-1169)
                        match_name = arg_name[1:]
                        if self._matches.get(match_name) is None:
                            raise ProcessorException(f"replace: no stored match named {match_name}")
                    else:
                        self._vars[arg_name] = self.expand(arg_value)
            s, v = self._seq(body)
            if rtnv is not None:
                for proc_var, caller_var in rtnv.items():
                    outer_vars[caller_var] = self._vars[proc_var]
            return (s, v)
        finally:
            self._vars = outer_vars
            self._matches = outer_matches
            self._latest_match = outer_latest

    # -- matching ------------------------------------------------------------------

    def _search_any(self, pattern, flags: int) -> Optional[re.Match]:
        """search with a single pattern or first-matching of a pattern list."""
        if isinstance(pattern, str):
            return _rx(pattern, flags).search(self._text)
        if isinstance(pattern, list):
            for p in pattern:
                if not isinstance(p, str):
                    raise ProcessorException(f"match: list element {p!r} must be a pattern string")
                m = _rx(p, flags).search(self._text)
                if m is not None:
                    return m
            return None
        raise ProcessorException(
            f"match value {pattern!r} is neither a string (single RE) nor a list"
        )

    def _op_replace(self, op: dict) -> Tuple[bool, Any]:
        pattern = self._attr(op, "replace", str)
        replacement = self._attr(op, "with", str)
        self._text = _rx(pattern, re.DOTALL).sub(replacement, self._text)
        return (True, None)

    def _op_match(self, op: dict) -> Tuple[bool, Any]:
        prep = op.get(_PREP)
        if prep is None:
            prep = (
                self._attr(op, "match"),
                self._attr(op, "as", str, optional=True),
                resolve_flags(self._attr(op, "flags", str, optional=True), re.DOTALL),
                self._attr(op, "do", list),
            )
            op[_PREP] = prep
        pattern, ident, flags, body = prep
        m = self._search_any(pattern, flags)
        if m is not None:
            self._latest_match = m
            if ident is not None:
                self._matches[ident] = m
            self._stat_match(len(m.group(0)))
            return self._seq(body)
        return (False, None)

    def _op_match_every(self, op: dict) -> Tuple[bool, Any]:
        prep = op.get(_PREP)
        if prep is None:
            pattern = self._attr(op, "match-every")
            flags = resolve_flags(self._attr(op, "flags", str, optional=True), re.DOTALL)
            prep = (
                _rx(pattern, flags),
                self._attr(op, "as", str, optional=True),
                self._attr(op, "do", list),
                self._attr(op, "first", list, optional=True),
            )
            op[_PREP] = prep
        rx, ident, body, do_first = prep
        count = 1
        for m in rx.finditer(self._text):
            self._latest_match = m
            self._stat_match(len(m.group(0)))
            if ident is not None:
                self._matches[ident] = m
                self._vars[f"{ident}_count"] = count
            if count == 1 and do_first is not None:
                self._seq(do_first)
            else:
                self._seq(body)
            count += 1
        return (count > 1, None)

    def _op_within(self, op: dict) -> Tuple[bool, Any]:
        prep = op.get(_PREP)
        if prep is None:
            prep = (
                self._attr(op, "within"),
                self._attr(op, "group", int, optional=True) or 1,
                resolve_flags(self._attr(op, "flags", str, optional=True), re.DOTALL),
                self._attr(op, "do", list),
                self._attr(op, "as", str, optional=True),
            )
            op[_PREP] = prep
        pattern, group_index, flags, body, ident = prep
        m = self._search_any(pattern, flags)
        if m is not None:
            t = m.group(group_index)
            if t:
                self._stat_match(len(m.group(0)))
                if ident is not None:
                    self._matches[ident] = m
                saved = self._text
                try:
                    self._text = t
                    self._seq(body)
                finally:
                    self._text = saved
                return (True, t)
        return (False, None)

    def _op_within_every(self, op: dict) -> Tuple[bool, Any]:
        prep = op.get(_PREP)
        if prep is None:
            pattern = self._attr(op, "within-every")
            flags = resolve_flags(self._attr(op, "flags", str, optional=True), re.DOTALL)
            prep = (
                _rx(pattern, flags),
                self._attr(op, "group", int, optional=True) or 1,
                self._attr(op, "do", list),
                self._attr(op, "as", str, optional=True),
                self._attr(op, "first", list, optional=True),
            )
            op[_PREP] = prep
        rx, group_index, body, ident, do_first = prep
        count = 1
        for m in rx.finditer(self._text):
            self._latest_match = m
            self._stat_match(len(m.group(0)))
            t = m.group(group_index)
            saved = self._text
            try:
                if ident is not None:
                    self._matches[ident] = m
                    self._vars[f"{ident}_count"] = count
                self._text = t
                if count == 1 and do_first is not None:
                    self._seq(do_first)
                else:
                    self._seq(body)
                count += 1
            finally:
                self._text = saved
        return (count > 1, None)

    def _op_with(self, op: dict) -> Tuple[bool, Any]:
        text = self.expand(self._attr(op, "with"))
        body = self._attr(op, "do", list)
        if text is not None:
            saved = self._text
            try:
                self._text = text
                ok, result = self._seq(body)
            finally:
                self._text = saved
            return (ok, result)
        return (False, None)

    # -- sequence-of (processor.py:1456-1618) -----------------------------------

    def _op_sequence_of(self, op: dict) -> Tuple[bool, Any]:
        seq_id = self._attr(op, "sequence-of") or "<unnamed>"
        alternatives = self._attr(op, "alternatives", list, optional=True)
        steps = self._attr(op, "steps", list, optional=True)
        if alternatives is None and steps is None:
            raise ProcessorException(
                f"sequence-of {seq_id}: needs an 'alternatives' or 'steps' argument"
            )
        if alternatives is not None and steps is not None:
            raise ProcessorException(
                f"sequence-of {seq_id}: 'alternatives' and 'steps' are mutually exclusive"
            )
        compiled_alts = []
        fire_counts: Dict[str, int] = {}
        for alt in alternatives or steps:
            pattern = self._attr(alt, "match")
            flags = resolve_flags(self._attr(alt, "flags", str, optional=True), re.DOTALL)
            ident = self._attr(alt, "as", str, optional=True)
            if ident is not None:
                fire_counts[ident] = 0
            if isinstance(pattern, list):
                rx = [_rx(p, flags) for p in pattern]
            else:
                rx = _rx(pattern, flags)
            compiled_alts.append({
                "rx": rx,
                "id": ident,
                "group": self._attr(alt, "within-group", int, optional=True),
                "body": self._attr(alt, "do", list),
            })

        def search(rx, start):
            if isinstance(rx, list):
                for r in rx:
                    m = r.search(self._text, start)
                    if m:
                        return m
                return None
            return rx.search(self._text, start)

        def fire(spec, m):
            self._latest_match = m
            self._stat_match(len(m.group(0)))
            if spec["id"] is not None:
                self._matches[spec["id"]] = m
                fire_counts[spec["id"]] += 1
                self._vars[f"{spec['id']}_count"] = fire_counts[spec["id"]]
            if spec["group"] is not None:
                saved = self._text
                try:
                    self._text = m.group(spec["group"])
                    self._seq(spec["body"])
                finally:
                    self._text = saved
            else:
                self._seq(spec["body"])

        count = 0
        start = 0
        if alternatives is not None:
            # Lexer loop: repeatedly take the earliest-starting match among
            # all alternatives, advance the cursor past it.
            while True:
                earliest = None
                earliest_spec = None
                for spec in compiled_alts:
                    m = search(spec["rx"], start)
                    if m is not None and (earliest is None or m.start(0) < earliest.start(0)):
                        earliest, earliest_spec = m, spec
                if earliest is None:
                    break
                start = earliest.end(0)
                count += 1
                fire(earliest_spec, earliest)
        else:
            # Strict ordered steps: stop at the first non-matching step.
            for spec in compiled_alts:
                m = search(spec["rx"], start)
                if m is None:
                    break
                start = m.end(0)
                count += 1
                # steps mode does not track per-id counters in the reference
                self._latest_match = m
                self._stat_match(len(m.group(0)))
                if spec["id"] is not None:
                    self._matches[spec["id"]] = m
                if spec["group"] is not None:
                    saved = self._text
                    try:
                        self._text = m.group(spec["group"])
                        self._seq(spec["body"])
                    finally:
                        self._text = saved
                else:
                    self._seq(spec["body"])
        return (count >= 1, None)

    # -- 2-D table matcher (DEPRECATED in reference; processor.py:1622-1707) -----

    def _op_match_1(self, op: dict) -> Tuple[bool, Any]:
        pattern_1 = self._attr(op, "match-1")
        pattern_2 = self._attr(op, "match-2")
        group_1 = self._attr(op, "group-1", int, optional=True) or 1
        id_1 = self._attr(op, "as-1", str, optional=True)
        id_2 = self._attr(op, "as-2", str, optional=True)
        id_header = self._attr(op, "header-as", str, optional=True)
        id_leading = self._attr(op, "leading-as", str, optional=True)
        flags = resolve_flags(self._attr(op, "flags", str, optional=True), re.DOTALL)
        body = self._attr(op, "do", list)
        do_first = self._attr(op, "first", list, optional=True)
        do_leading = self._attr(op, "leading", list, optional=True)
        rx1, rx2 = _rx(pattern_1, flags), _rx(pattern_2, flags)

        header_matches: List[re.Match] = []
        count_1 = 1
        for m1 in rx1.finditer(self._text):
            t = m1.group(group_1)
            saved = self._text
            try:
                self._latest_match = m1
                if id_1 is not None:
                    self._matches[id_1] = m1
                    self._vars[f"{id_1}_count"] = count_1
                self._text = t
                count_2 = 1
                for m2 in rx2.finditer(self._text):
                    self._latest_match = m2
                    if id_2 is not None:
                        self._matches[id_2] = m2
                        self._vars[f"{id_2}_count"] = count_2
                    if count_1 == 1:
                        header_matches.append(m2)
                    if id_header is not None:
                        self._matches[id_header] = header_matches[count_2 - 1]
                        self._vars[f"{id_header}_count"] = count_2
                    if count_2 == 1 and id_leading is not None:
                        self._matches[id_leading] = m2
                        self._vars[f"{id_leading}_count"] = count_1
                    if count_1 == 1 and do_first is not None:
                        self._seq(do_first)
                    elif count_2 == 1 and do_leading is not None:
                        self._seq(do_leading)
                    else:
                        self._seq(body)
                    count_2 += 1
                count_1 += 1
            finally:
                self._text = saved
        return (count_1 > 1, None)

    # -- N-dimensional matcher (processor.py:1711-1933) ---------------------------

    def _op_match_dimensions(self, op: dict) -> Tuple[bool, Any]:
        patterns = self._attr(op, "match-dimensions", list)
        cell_id = self._attr(op, "as", str, optional=True)
        dimensions = self._attr(op, "dimensions", list, optional=True)
        flags = resolve_flags(self._attr(op, "flags", str, optional=True), re.DOTALL)
        body = self._attr(op, "do", list)
        pre_steps = self._attr(op, "pre", list, optional=True)
        loc_steps = {
            name: val
            for name, val in op.items()
            if re.match(r"do-(\*|[0-9A-Za-z_]+)-(\*|[0-9A-Za-z_]+)", name)
        }
        rxs = [_rx(p, flags) for p in patterns]
        if dimensions is not None and len(dimensions) != len(rxs):
            raise ProcessorException(
                "match-dimensions: the dimension-name list length must equal the pattern count"
            )
        counts: List[Optional[int]] = [None] * len(patterns)
        prev_matches = self.result.no_matches
        if pre_steps is not None:
            self._dim_tags_stack.append([None] * len(dimensions))
            try:
                dim_matches = self._prescan_dim(0, rxs, counts, dimensions, cell_id)
                self._seq(pre_steps)
                self._walk_dim(0, dim_matches, counts, dimensions, cell_id, body, loc_steps)
            finally:
                self._dim_tags_stack.pop()
        else:
            self._match_dim(0, rxs, counts, dimensions, cell_id, body, loc_steps)
        return (self.result.no_matches > prev_matches, None)

    def _prescan_dim(self, dim, rxs, counts, dimensions, cell_id) -> list:
        dim_matches = []
        count = 1
        for m in rxs[dim].finditer(self._text):
            counts[dim] = count
            if dimensions:
                self._vars[dimensions[dim]] = count
            if dim < len(rxs) - 1:
                saved = self._text
                try:
                    self._text = m.group(1)
                    dim_matches.append(self._prescan_dim(dim + 1, rxs, counts, dimensions, cell_id))
                finally:
                    self._text = saved
            else:
                if cell_id:
                    # pre-scan saves only the indexed key (processor.py:1789-1793)
                    self._matches[f"{cell_id}-" + "-".join(str(i) for i in counts)] = m
                dim_matches.append(m)
            count += 1
        return dim_matches

    def _walk_dim(self, dim, dim_matches, counts, dimensions, cell_id, body, loc_steps):
        count = 1
        for m in dim_matches:
            counts[dim] = count
            if dimensions:
                self._vars[dimensions[dim]] = count
            if dim < len(counts) - 1:
                self._walk_dim(dim + 1, m, counts, dimensions, cell_id, body, loc_steps)
                self._break_dimension = False
            else:
                if self._break_dimension:
                    break
                self._run_cell(m, counts, cell_id, body, loc_steps)
            count += 1

    def _match_dim(self, dim, rxs, counts, dimensions, cell_id, body, loc_steps):
        count = 1
        for m in rxs[dim].finditer(self._text):
            counts[dim] = count
            if dimensions:
                self._vars[dimensions[dim]] = count
            if dim < len(rxs) - 1:
                saved = self._text
                try:
                    self._text = m.group(1)
                    self._match_dim(dim + 1, rxs, counts, dimensions, cell_id, body, loc_steps)
                finally:
                    self._text = saved
            else:
                self._run_cell(m, counts, cell_id, body, loc_steps)
            count += 1

    def _run_cell(self, m, counts, cell_id, body, loc_steps):
        """Final-dimension cell: stats, match save, most-specific body."""
        self._stat_match(len(m.group(0)))
        if cell_id:
            self._matches[f"{cell_id}-" + "-".join(str(i) for i in counts)] = m
            self._matches[cell_id] = m
        ops = self._find_cell_ops(0, counts, [], loc_steps)
        if ops is None:
            ops = body
        saved = self._text
        try:
            self._text = m.group(1)
            self._seq(ops)
        finally:
            self._text = saved

    def _find_cell_ops(self, dim, counts, indexes, loc_steps):
        """Most-specific do-<i>-<j> selection with tag and '*' wildcard
        fallback, depth-first per dimension (processor.py:1903-1933)."""
        if dim == len(counts):
            return loc_steps.get("do-" + "-".join(str(i) for i in indexes))
        if self._dim_tags_stack:
            tags = self._dim_tags_stack[-1][dim]
            if tags is not None:
                tag = tags.get(counts[dim])
                if tag is not None:
                    indexes.append(tag)
                    ops = self._find_cell_ops(dim + 1, counts, indexes, loc_steps)
                    if ops:
                        return ops
                    indexes.pop()
        indexes.append(counts[dim])
        ops = self._find_cell_ops(dim + 1, counts, indexes, loc_steps)
        if ops:
            return ops
        indexes[-1] = "*"
        ops = self._find_cell_ops(dim + 1, counts, indexes, loc_steps)
        if ops:
            return ops
        indexes.pop()
        return None

    def _op_tag_dimension(self, op: dict) -> Tuple[bool, Any]:
        dim_no = int(self.expand(str(self._attr(op, "tag-dimension"))))
        at_index = int(self.expand(str(self._attr(op, "at"))))
        tag_name = self._attr(op, "as", str)
        if not self._dim_tags_stack:
            raise ProcessorException(
                "tag-dimension is only valid inside a match-dimensions pre: scope"
            )
        dim_tags = self._dim_tags_stack[-1]
        if dim_no < 1 or dim_no > len(dim_tags):
            raise ProcessorException(
                f"tag-dimension {dim_no} out of range 1..{len(dim_tags)}"
            )
        if at_index < 1:
            raise ProcessorException(
                f"tag-dimension at: index {at_index} must be >= 1"
            )
        if dim_tags[dim_no - 1] is None:
            dim_tags[dim_no - 1] = {}
        dim_tags[dim_no - 1][at_index] = tag_name
        return (True, None)

    def _op_break(self, op: dict) -> Tuple[bool, Any]:
        self._break_dimension = True
        return (True, None)

    # -- mappings (the entity-linking dictionary; processor.py:1992-2104) --------

    def _op_mapping(self, op: dict) -> Tuple[bool, Any]:
        name = self._attr(op, "mapping", str)
        pairs = self._attr(op, "pairs", list)
        flags = resolve_flags(self._attr(op, "flags", str, optional=True))
        ignore_case = bool(flags & re.IGNORECASE)
        exact: dict = {}
        rx_pairs: list = []
        for p in pairs:
            if not isinstance(p, dict):
                raise ProcessorException(f"mapping: element {p!r} must be a mapping of match/to")
            f_text, f_re, f_to = p.get("from"), p.get("re"), p.get("to")
            if f_to is None:
                raise ProcessorException(f"Mapping element {p!r} has no 'to' attribute")
            if f_text:
                if f_re:
                    raise ProcessorException(
                        f"Mapping element {p!r} has both a 'from' and a 're' attribute"
                    )
                exact[f_text] = f_to
                if ignore_case:
                    exact[f_text.lower()] = f_to
            elif f_re:
                rx_pairs.append((f_re, f_to))
            else:
                raise ProcessorException(
                    f"Mapping element {p!r} has neither a 'from' nor a 're' attribute"
                )
        self._mappings[name] = (exact, rx_pairs, flags)
        return (True, name)

    def _op_map(self, op: dict) -> Tuple[bool, Any]:
        value = self.expand(self._attr(op, "map", str))
        mapping = self._attr(op, "apply", str)
        var = self._attr(op, "to", optional=True)
        mapped = self.apply_mapping(mapping, value)
        if var is not None:
            self._vars[var] = mapped
        return (True, mapped)

    def apply_mapping(self, name: str, value: str) -> str:
        """Exact-dict hit first, then ordered regex pairs, else identity.

        The mapping-regex match becomes the latest match during replacement
        expansion so ``@{N}`` refers to its groups (processor.py:2098-2101).
        Regex pairs are matched with ``re.match`` and NO flags — the
        mapping's flags only affect the exact dict's lowercased copy.
        """
        mapping = self._mappings.get(name)
        if mapping is None:
            raise ProcessorException(f"map: no mapping named {name} is defined")
        exact, rx_pairs, flags = mapping
        repl = exact.get(value)
        if repl is not None:
            return self.expand(str(repl))
        if flags & re.IGNORECASE:
            repl = exact.get(value.lower())
            if repl is not None:
                return self.expand(repl)
        saved_latest = self._latest_match
        try:
            for pat, repl in rx_pairs:
                m = re.match(pat, value)
                if m:
                    self._latest_match = m
                    return self.expand(repl)
        finally:
            self._latest_match = saved_latest
        return value

    # -- graph lookup (select:) ----------------------------------------------------

    def _op_select(self, op: dict) -> Tuple[bool, Any]:
        selection = self._attr(op, "select", str)
        graph_id = self._attr(op, "from", str)
        where_clause = self.expand(self._attr(op, "where", str))
        var_ids = self._attr(op, "as", str, optional=True) or selection
        else_steps = self._attr(op, "else", list, optional=True)
        row_steps = self._attr(op, "do", list, optional=True)
        select_vars = re.split(r"\s+", selection)
        stored_vars = re.split(r"\s+", var_ids)
        if self._query_fn is None:
            raise ProcessorException(
                f"No query handler configured for select: from {graph_id}"
            )
        rows = self._query_fn(select_vars, graph_id, where_clause)
        if not rows:
            if else_steps:
                return self._seq(else_steps)
            return (False, None)
        if row_steps is None:
            for var, alias in zip(select_vars, stored_vars):
                self._vars[alias] = rows[0].get(var)
            return (True, rows[0].get(select_vars[0]))
        # DEVIATION: the reference's do:-mode crashes on the first row
        # (processor.py:2184); implemented working per-row binding instead.
        for row in rows:
            for var, alias in zip(select_vars, stored_vars):
                self._vars[alias] = row.get(var)
            self._seq(row_steps)
        return (True, None)

    # -- prefixes --------------------------------------------------------------------

    def _op_prefix(self, op: dict) -> Tuple[bool, Any]:
        prefix = self._attr(op, "prefix", str)
        iri = self._attr(op, "iri", str)
        self._prefixes[prefix] = iri
        return (True, prefix)

    @property
    def prefixes(self) -> Dict[str, str]:
        return self._prefixes

    # -- handler table -----------------------------------------------------------------

    _HANDLERS: Dict[str, Callable] = {}


DocInterpreter._HANDLERS = {
    "pass": DocInterpreter._op_pass,
    "any-of": DocInterpreter._op_any_of,
    "set": DocInterpreter._op_set,
    "clear": DocInterpreter._op_clear,
    "append": DocInterpreter._op_append,
    "for-each": DocInterpreter._op_for_each,
    "exec": DocInterpreter._op_exec,
    "if": DocInterpreter._op_if,
    "ifdef": DocInterpreter._op_ifdef,
    "ifndef": DocInterpreter._op_ifndef,
    "save-as": DocInterpreter._op_save_as,
    "procedure": DocInterpreter._op_procedure,
    "call": DocInterpreter._op_call,
    "replace": DocInterpreter._op_replace,
    "match": DocInterpreter._op_match,
    "match-every": DocInterpreter._op_match_every,
    "within": DocInterpreter._op_within,
    "within-every": DocInterpreter._op_within_every,
    "with": DocInterpreter._op_with,
    "sequence-of": DocInterpreter._op_sequence_of,
    "match-1": DocInterpreter._op_match_1,
    "match-dimensions": DocInterpreter._op_match_dimensions,
    "tag-dimension": DocInterpreter._op_tag_dimension,
    "break": DocInterpreter._op_break,
    "prefix": DocInterpreter._op_prefix,
    "mapping": DocInterpreter._op_mapping,
    "map": DocInterpreter._op_map,
    "select": DocInterpreter._op_select,
    "subject": DocInterpreter._op_triple,
    "predicate": DocInterpreter._op_triple,
    "object": DocInterpreter._op_triple,
    "echo": DocInterpreter._op_echo,
    "desc": DocInterpreter._op_desc,
    "dump": DocInterpreter._op_dump,
}


def run_document(
    text: str,
    program: WorkflowProgram,
    doc_vars: Optional[Dict[str, Any]] = None,
    query_fn: Optional[QueryFn] = None,
    collect_log: bool = False,
) -> DocResult:
    """Run one workflow on one document, capturing errors per document.

    Mirrors the runner loop body (runner.py:341-396): seed ``doc``/
    ``docname`` style variables, execute, and on a ProcessorException keep
    an error record instead of failing the batch.
    """
    interp = DocInterpreter(
        text=text, query_fn=query_fn, collect_log=collect_log, initial_vars=doc_vars
    )
    try:
        interp.run(program)
    except ProcessorException as ex:
        interp.result.error = str(ex)
    except Exception as ex:  # non-Processor failures also stay per-doc
        interp.result.error = f"{type(ex).__name__}: {ex}"
    return interp.result
