"""Unit tests: interpreter semantics vs the reference's documented behavior.

Table-driven per SURVEY.md §5.1 — template expansion quirks, literal
coercion cascade, sequence-of ordering, match-dimensions body selection,
procedure scoping, stats formulas. Reference line numbers cited per case.
"""

import math

import pytest

from cmc_knowledge_graph_text2ttl_spark.core import ProcessorException, XSD
from cmc_knowledge_graph_text2ttl_spark.workflow import run_document
from cmc_knowledge_graph_text2ttl_spark.workflow.interpreter import DocInterpreter

from conftest import wf


def run(src, text="", doc_vars=None, **kw):
    res = run_document(text, wf(src), doc_vars=doc_vars, **kw)
    return res


def triples(src, text="", **kw):
    res = run(src, text, **kw)
    assert res.error is None, res.error
    return res.triples


S = "- subject: http://e/s\n  predicate: http://e/p\n  object: {obj}\n"


# ---------------------------------------------------------------------------
# Template expansion (processor.py:2599-2669)


class TestTemplates:
    def _expand(self, template, vars=None, text="", setup=""):
        interp = DocInterpreter(text=text, initial_vars=vars or {})
        if setup:
            import yaml

            interp.execute_plan(yaml.safe_load(setup))
        return interp.expand(template)

    def test_variable_expansion(self):
        assert self._expand("v=@{x}", {"x": "1"}) == "v=1"

    def test_undefined_variable_is_literal_None(self):
        # quirk at processor.py:2644: str() before the None check
        assert self._expand("v=@{nope}") == "v=None"

    def test_optional_undefined_variable_still_None(self):
        # @{?} only affects the named-match path (processor.py:2627-2649)
        assert self._expand("v=@{?nope}") == "v=None"

    def test_optional_undefined_match_is_empty(self):
        assert self._expand("v=@{?m.1}") == "v="

    def test_undefined_match_raises(self):
        with pytest.raises(ProcessorException):
            self._expand("@{m.1}")

    def test_match_group_by_number_and_name(self):
        setup = "- match: '(?P<word>ab)(c)'\n  as: m\n  do: [{pass: x}]\n"
        interp = DocInterpreter(text="abc")
        import yaml

        interp.execute_plan(yaml.safe_load(setup))
        assert interp.expand("@{m.1}/@{m.2}/@{m.word}") == "ab/c/ab"

    def test_unknown_group_raises(self):
        import yaml

        interp = DocInterpreter(text="abc")
        interp.execute_plan(yaml.safe_load("- match: 'a'\n  as: m\n  do: [{pass: x}]"))
        with pytest.raises(ProcessorException):
            interp.expand("@{m.7}")

    def test_nested_innermost_first(self):
        # @{material-@{row}.1} style nesting (docstring processor.py:2609)
        import yaml

        interp = DocInterpreter(text="x=43", initial_vars={"row": "3"})
        interp.execute_plan(
            yaml.safe_load("- match: 'x=(\\d+)'\n  as: material-3\n  do: [{pass: x}]")
        )
        assert interp.expand("@{material-@{row}.1}") == "43"

    def test_formatters(self):
        v = {"a": "  Hello, World!  ", "b": "x\n\ty&amp;z "}
        assert self._expand("@{a:trim}", v) == "Hello, World!"
        assert self._expand("@{a:iri}", v) == "Hello__World_"
        assert self._expand("@{b:norm}", v) == "x y&z"

    def test_none_group_becomes_empty(self):
        # `ext or ""` at processor.py:2666
        import yaml

        interp = DocInterpreter(text="ab")
        interp.execute_plan(
            yaml.safe_load("- match: 'a(x)?(b)'\n  as: m\n  do: [{pass: x}]")
        )
        assert interp.expand("[@{m.1}]") == "[]"


# ---------------------------------------------------------------------------
# Literal coercion cascade (processor.py:2370-2524)


class TestLiterals:
    def obj(self, obj_yaml, text=""):
        src = f"- subject: http://e/s\n  predicate: http://e/p\n  object: {obj_yaml}\n"
        t = triples(src, text)
        assert len(t) == 1
        return t[0]

    def test_auto_integer(self):
        row = self.obj("' 42 '")
        assert (row[3], row[5]) == ("42", XSD.integer)

    def test_auto_integer_plus_normalized(self):
        assert self.obj("'+5'")[3] == "5"

    def test_auto_float(self):
        row = self.obj("'2.50'")
        assert (row[3], row[5]) == ("2.5", XSD.float)

    def test_auto_bool_true_variants(self):
        for v in ("true", "True", "TRUE", " TRUE "):
            row = self.obj(f"'{v}'")
            assert (row[3], row[5]) == ("true", XSD.boolean), v

    def test_caret_escape_forces_string(self):
        row = self.obj("'^TRUE'")
        assert (row[3], row[5]) == ("TRUE", None)
        row = self.obj("'^123'")
        # NOTE: int('^123') fails first, so ^ only matters for bool-likes
        assert (row[3], row[5]) == ("123", None)

    def test_plain_string(self):
        row = self.obj("hello world")
        assert (row[2], row[3], row[5]) == ("literal", "hello world", None)

    def test_structured_integer(self):
        row = self.obj("{integer: '7'}")
        assert (row[3], row[5]) == ("7", XSD.integer)

    def test_structured_integer_invalid_raises(self):
        res = run(S.format(obj="{integer: 'abc'}"))
        assert "does not parse as an int literal" in res.error

    def test_structured_float_empty_is_nan(self):
        # processor.py:2404-2405
        row = self.obj("{float: ' '}")
        assert row[3] == "nan" and row[5] == XSD.float

    def test_structured_bool_falsy_table(self):
        # processor.py:2416
        for v, expect in [
            ("false", "false"), ("0", "false"), ("0.0", "false"),
            ("none", "false"), ("NONE", "false"), (" ", "false"),
            ("yes", "true"), ("1", "true"), ("anything", "true"),
        ]:
            row = self.obj(f"{{bool: '{v}'}}")
            assert row[3] == expect, v

    # QUIRK (processor.py:2388-2394): the value-attribute arity check only
    # counts text/iri/integer/float/bool — date:/datetime: alone fail it, so
    # a date object needs a dummy text: sibling (date: wins, text: ignored).
    def test_structured_date_alone_fails_arity_check(self):
        res = run(S.format(obj="{date: '2024-03-02'}"))
        assert "lacks a value attribute" in res.error

    def test_structured_date_with_format(self):
        row = self.obj("{text: '', date: '02.03.2024', format: '%d.%m.%Y'}")
        assert (row[3], row[5]) == ("2024-03-02", XSD.date)

    def test_structured_date_iso(self):
        row = self.obj("{text: '', date: '2024-03-02'}")
        assert (row[3], row[5]) == ("2024-03-02", XSD.date)

    def test_date_today_falls_through_to_error(self):
        # reference quirk processor.py:2422-2423
        assert run(S.format(obj="{text: 'x', date: today}")).error is not None

    def test_datetime_with_format(self):
        row = self.obj("{text: '', datetime: '2024-03-02 04:05', format: '%Y-%m-%d %H:%M'}")
        assert (row[3], row[5]) == ("2024-03-02T04:05:00", XSD.dateTime)

    def test_datetime_without_format_errors(self):
        # strptime(v, None) TypeError in reference (processor.py:2450)
        assert run(S.format(obj="{text: '', datetime: '2024-03-02'}")).error is not None

    def test_lang_literal(self):
        row = self.obj("{text: 'hi', lang: en}")
        assert (row[3], row[4], row[5]) == ("hi", "en", None)

    def test_empty_integer_falls_through(self):
        # truthiness check: integer: '' skips the int branch entirely
        res = run(S.format(obj="{integer: ''}"))
        assert res.error is not None  # nothing else defined → no value attr? No:
        # ndef counts integer as present (is not None) → passes the arity
        # check, then every branch is falsy → ends in the no-usable-value error

    def test_iri_object(self):
        src = (
            "- prefix: ex\n  iri: http://x/\n"
            + S.format(obj="{iri: 'ex:thing'}")
        )
        t = triples(src)
        assert t[0][2] == "iri" and t[0][3] == "http://x/thing"

    def test_iri_unknown_prefix_raises(self):
        res = run(S.format(obj="{iri: 'nope:thing'}"))
        assert "no prefix declaration in scope" in res.error

    def test_multiple_value_attrs_raise(self):
        res = run(S.format(obj="{integer: '1', float: '2'}"))
        assert "more than one value attribute" in res.error

    def test_object_list_first_success(self):
        src = """
- prefix: ex
  iri: http://x/
- subject: http://e/s
  predicate: http://e/p
  object:
    - match: 'nope-(\\d+)'
      do: [{echo: 'no'}]
    - echo: fallback-value
"""
        t = triples(src, "text without the pattern")
        assert t[0][3] == "fallback-value"


# ---------------------------------------------------------------------------
# Node parsing (processor.py:2347-2367)


class TestNodes:
    def test_prefixed_subject(self):
        t = triples("- prefix: ex\n  iri: http://x/\n" + S.format(obj="'1'").replace("http://e/s", "ex:s1"))
        assert t[0][0] == "http://x/s1"

    def test_http_url_not_prefix(self):
        t = triples(S.format(obj="'1'"))
        assert t[0][0] == "http://e/s"

    def test_unknown_prefix_in_subject(self):
        res = run(S.format(obj="'1'").replace("http://e/s", "zz:s1"))
        assert "no prefix declaration in scope" in res.error


# ---------------------------------------------------------------------------
# Triple fan-out + inverse (processor.py:2226-2332)


class TestTripleEmission:
    def test_predicates_objects_fanout(self):
        src = """
- prefix: ex
  iri: http://x/
- subject: ex:s
  predicates:
    - predicate: ex:p1
      object: '1'
    - predicate: ex:p2
      objects:
        - object: '2'
        - object: '3'
"""
        t = triples(src)
        assert [(r[1], r[3]) for r in t] == [
            ("http://x/p1", "1"), ("http://x/p2", "2"), ("http://x/p2", "3"),
        ]

    def test_inverse_emits_reversed(self):
        src = """
- prefix: ex
  iri: http://x/
- subject: ex:a
  predicate: ex:partOf
  inverse: ex:hasPart
  object: {iri: 'ex:b'}
"""
        t = triples(src)
        assert (t[0][0], t[0][1], t[0][3]) == ("http://x/a", "http://x/partOf", "http://x/b")
        assert (t[1][0], t[1][1], t[1][3]) == ("http://x/b", "http://x/hasPart", "http://x/a")

    def test_graph_set_dedup_and_raw_count(self):
        # rdflib set semantics vs no_triples raw count (processor.py:2319-2320)
        src = """
- prefix: ex
  iri: http://x/
- match-every: 'x'
  do:
    - subject: ex:s
      predicate: ex:p
      object: same
"""
        res = run(src, "xxx")
        assert res.error is None
        assert len(res.triples) == 1
        assert res.no_triples == 3

    def test_subject_redefinition_raises(self):
        src = """
- prefix: ex
  iri: http://x/
- subject: ex:s
  predicates:
    - subject: ex:other
      predicate: ex:p
      object: '1'
"""
        assert "subject already set" in run(src).error


# ---------------------------------------------------------------------------
# Control flow, vars, procedures


class TestControlFlow:
    def test_any_of_first_success(self):
        src = """
- prefix: ex
  iri: http://x/
- any-of:
    - match: 'zebra'
      do: [{subject: 'ex:s', predicate: 'ex:p', object: zebra}]
    - match: 'cat'
      do: [{subject: 'ex:s', predicate: 'ex:p', object: cat}]
    - match: 'dog'
      do: [{subject: 'ex:s', predicate: 'ex:p', object: dog}]
"""
        t = triples(src, "cat dog")
        assert len(t) == 1 and t[0][3] == "cat"

    def test_if_python_truth(self):
        src = """
- set: n
  to: '3'
- if: int(n) > 2
  do: [{subject: 'http://e/s', predicate: 'http://e/p', object: big}]
- if: int(n) > 5
  do: [{subject: 'http://e/s', predicate: 'http://e/p', object: bigger}]
"""
        t = triples(src)
        assert [r[3] for r in t] == ["big"]

    def test_ifdef_variable_and_match_group(self):
        src = """
- set: v
  to: 'x'
- ifdef: v
  do: [{subject: 'http://e/s', predicate: 'http://e/p', object: hasv}]
- ifdef: w
  do: [{subject: 'http://e/s', predicate: 'http://e/p', object: hasw}]
- match: 'a(x)?(b)'
  as: m
  do:
    - ifdef: m.2
      do: [{subject: 'http://e/s', predicate: 'http://e/p', object: g2}]
    - ifndef: m.1
      do: [{subject: 'http://e/s', predicate: 'http://e/p', object: nog1}]
"""
        t = triples(src, "ab")
        assert [r[3] for r in t] == ["hasv", "g2", "nog1"]

    def test_set_eval_and_exec(self):
        src = """
- set: n
  eval: 1 + 2
- exec: "vars['m'] = vars['n'] * 10"
- subject: http://e/s
  predicate: http://e/p
  object: "@{m}"
"""
        t = triples(src)
        assert (t[0][3], t[0][5]) == ("30", XSD.integer)

    def test_set_dynamic_name(self):
        src = """
- set: idx
  to: '2'
- set: slot-@{idx}
  to: 'val2'
- subject: http://e/s
  predicate: http://e/p
  object: "^@{slot-2}"
"""
        assert triples(src)[0][3] == "val2"

    def test_append_and_for_each(self):
        src = """
- append: lst
  element: a
- append: lst
  element: b
- for-each: lst
  as: e
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^@{e}-@{e_count}"
"""
        t = triples(src)
        assert [r[3] for r in t] == ["a-1", "b-2"]

    def test_for_each_missing_list_is_failure_not_error(self):
        src = """
- for-each: nolist
  as: e
  do: [{pass: x}]
- subject: http://e/s
  predicate: http://e/p
  object: after
"""
        t = triples(src)
        assert [r[3] for r in t] == ["after"]

    def test_procedure_call_scoping(self):
        # copy-in/copy-out + state restore (processor.py:1153-1186)
        src = """
- procedure: emit
  do:
    - set: inner
      to: "got-@{arg}"
    - set: leaked
      to: 'should-not-escape'
- set: leaked
  to: 'outer'
- call: emit
  with:
    arg: hello
  return:
    inner: result
- subject: http://e/s
  predicate: http://e/p
  object: "^@{result}|@{leaked}"
"""
        t = triples(src)
        assert t[0][3] == "got-hello|outer"

    def test_call_unknown_procedure(self):
        assert "no procedure named" in run("- call: nope\n").error

    def test_clear(self):
        src = """
- set: v
  to: 'x'
- clear: v
- ifndef: v
  do: [{subject: 'http://e/s', predicate: 'http://e/p', object: cleared}]
"""
        assert triples(src)[0][3] == "cleared"


# ---------------------------------------------------------------------------
# Matching ops


class TestMatching:
    def test_match_pattern_list_first_matching(self):
        src = """
- match:
    - 'zebra (\\d+)'
    - 'cat (\\d+)'
  as: m
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "@{m.1}"
"""
        assert triples(src, "cat 7")[0][3] == "7"

    def test_match_every_first_body_replaces(self):
        src = """
- match-every: 'n=(\\d+)'
  as: m
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^rest-@{m.1}"
  first:
    - subject: http://e/s
      predicate: http://e/p
      object: "^first-@{m.1}"
"""
        t = triples(src, "n=1 n=2 n=3")
        assert [r[3] for r in t] == ["first-1", "rest-2", "rest-3"]

    def test_replace_mutates_current_text(self):
        src = """
- replace: 'secret'
  with: 'XXX'
- match: 'XXX (\\d+)'
  as: m
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "@{m.1}"
"""
        assert triples(src, "secret 5")[0][3] == "5"

    def test_within_scoping_and_restore(self):
        src = """
- within: 'BEGIN(.*?)END'
  do:
    - match-every: '(\\w+)'
      as: w
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "^in-@{w.1}"
- match: '(outer)'
  as: o
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^@{o.1}"
"""
        t = triples(src, "outer BEGIN a b END outer")
        assert [r[3] for r in t] == ["in-a", "in-b", "outer"]

    def test_within_empty_group_fails(self):
        src = """
- within: 'BEGIN()END'
  do: [{pass: x}]
- subject: http://e/s
  predicate: http://e/p
  object: after
"""
        res = run(src, "BEGINEND")
        assert res.no_matches == 0  # empty group → no match counted

    def test_with_computed_text(self):
        src = """
- set: v
  to: 'a-b-c'
- with: "@{v}"
  do:
    - match-every: '(\\w)'
      as: c
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "^c@{c.1}"
"""
        assert [r[3] for r in triples(src)] == ["ca", "cb", "cc"]

    def test_flags_add_to_dotall(self):
        # flags: I keeps DOTALL (processor.py:2754 OR-semantics)
        src = """
- match: 'a.(B)'
  flags: I
  as: m
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "@{m.1}"
"""
        assert triples(src, "a\nb")[0][3] == "b"


class TestSequenceOf:
    def test_alternatives_earliest_match_order(self):
        src = """
- sequence-of: scan
  alternatives:
    - match: 'B(\\d)'
      as: b
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "^B@{b.1}@{b_count}"
    - match: 'A(\\d)'
      as: a
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "^A@{a.1}@{a_count}"
"""
        # text order wins, not alternative order
        t = triples(src, "A1 .. B2 .. A3")
        assert [r[3] for r in t] == ["A11", "B21", "A32"]

    def test_steps_stop_at_first_failure(self):
        src = """
- sequence-of: steps
  steps:
    - match: 'one'
      do: [{subject: 'http://e/s', predicate: 'http://e/p', object: s1}]
    - match: 'two'
      do: [{subject: 'http://e/s', predicate: 'http://e/p', object: s2}]
    - match: 'three'
      do: [{subject: 'http://e/s', predicate: 'http://e/p', object: s3}]
"""
        t = triples(src, "one ... three")  # 'two' missing → stop before three
        assert [r[3] for r in t] == ["s1"]

    def test_steps_cursor_strictly_forward(self):
        src = """
- sequence-of: steps
  steps:
    - match: 'two'
      do: [{subject: 'http://e/s', predicate: 'http://e/p', object: s1}]
    - match: 'one'
      do: [{subject: 'http://e/s', predicate: 'http://e/p', object: s2}]
"""
        t = triples(src, "one two")  # 'one' occurs before cursor → no s2
        assert [r[3] for r in t] == ["s1"]

    def test_within_group_scoping(self):
        src = """
- sequence-of: scan
  alternatives:
    - match: '\\[(\\w+)\\]'
      within-group: 1
      do:
        - match: '(\\w+)'
          as: inner
          do:
            - subject: http://e/s
              predicate: http://e/p
              object: "^got-@{inner.1}"
"""
        assert [r[3] for r in triples(src, "[abc] [de]")] == ["got-abc", "got-de"]


class TestMatchDimensions:
    TABLE = "<tr><td>h1</td><td>h2</td></tr><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr>"

    def test_cell_walk_and_indexed_bodies(self):
        src = """
- match-dimensions:
    - '<tr>(.*?)</tr>'
    - '<td>(.*?)</td>'
  dimensions: [row, col]
  as: cell
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^c-@{row}-@{col}-@{cell.1}"
  do-1-*:
    - subject: http://e/s
      predicate: http://e/p
      object: "^hdr-@{col}-@{cell.1}"
"""
        t = triples(src, self.TABLE)
        assert [r[3] for r in t] == [
            "hdr-1-h1", "hdr-2-h2",
            "c-2-1-a", "c-2-2-b", "c-3-1-c", "c-3-2-d",
        ]

    def test_pre_tag_dimension_and_tag_bodies(self):
        src = """
- match-dimensions:
    - '<tr>(.*?)</tr>'
    - '<td>(.*?)</td>'
  dimensions: [row, col]
  as: cell
  pre:
    - tag-dimension: 2
      at: 2
      as: val
  do: [{pass: x}]
  do-*-val:
    - subject: http://e/s
      predicate: http://e/p
      object: "^v-@{cell.1}"
  do-1-*:
    - pass: header
"""
        t = triples(src, self.TABLE)
        # tag match has priority over numeric/wildcard; header row excluded
        # only for col bodies that don't match tags... do-1-* applies to row 1.
        assert [r[3] for r in t] == ["v-b", "v-d"]

    def test_break_aborts_final_dimension(self):
        src = """
- match-dimensions:
    - '<tr>(.*?)</tr>'
    - '<td>(.*?)</td>'
  dimensions: [row, col]
  as: cell
  pre: [{pass: x}]
  do:
    - if: "'@{cell.1}' == 'b'"
      do: [{break: now}]
    - ifndef: stop
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "^k-@{cell.1}"
"""
        t = triples(src, self.TABLE)
        vals = [r[3] for r in t]
        # row 2: 'a' emitted, then 'b' breaks → 'b' body may run but break
        # happens before the emit for subsequent cells of that row; row 3 resumes
        assert "k-a" in vals and "k-c" in vals and "k-d" in vals

    def test_match1_deprecated_header_rebinding(self):
        src = """
- match-1: '<tr>(.*?)</tr>'
  match-2: '<td>(.*?)</td>'
  as-1: row
  as-2: cell
  header-as: hdr
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^@{hdr.1}=@{cell.1}"
  first: [{pass: header-row}]
"""
        t = triples(src, self.TABLE)
        assert [r[3] for r in t] == ["h1=a", "h2=b", "h1=c", "h2=d"]


# ---------------------------------------------------------------------------
# Mappings (processor.py:1992-2104)


class TestMappings:
    SRC = """
- mapping: m
  flags: I
  pairs:
    - from: Aspirin
      to: ASPIRIN-IRI
    - re: 'salt of (\\w+)'
      to: 'SALT:@{1}'
- map: "{value}"
  apply: m
  to: out
- subject: http://e/s
  predicate: http://e/p
  object: "^@{out}"
"""

    def _map(self, value):
        return triples(self.SRC.replace("{value}", value))[0][3]

    def test_exact_hit(self):
        assert self._map("Aspirin") == "ASPIRIN-IRI"

    def test_ignorecase_exact_hit(self):
        assert self._map("aspirin") == "ASPIRIN-IRI"

    def test_regex_hit_with_group_template(self):
        # QUIRK: the reference intends @{1} to reference the mapping-regex
        # groups (processor.py:2098-2101), but its expansion stringifies
        # the variable lookup BEFORE the None-check (processor.py:2644), so
        # the latest-match fallback is unreachable and @{1} expands to the
        # literal "None". Replicated for byte parity.
        assert self._map("salt of sodium") == "SALT:None"

    def test_identity_fallback(self):
        assert self._map("unknown") == "unknown"

    def test_unknown_mapping_raises(self):
        assert "no mapping named" in run("- map: x\n  apply: nope\n").error


# ---------------------------------------------------------------------------
# Stats & scoring (processor.py:2713-2725)


class TestStats:
    def test_score_formula(self):
        src = "- match: '(abcd)'\n  do: [{pass: x}]\n- match: 'z'\n  do: [{pass: x}]\n"
        res = run(src, "abcd z")
        assert res.no_matches == 2
        assert res.total_match_len == 5
        assert math.isclose(res.score, (1 - 1 / 4) + (1 - 1 / 1))

    def test_match1_does_not_count_stats(self):
        src = "- match-1: '<tr>(.*?)</tr>'\n  match-2: '<td>(.*?)</td>'\n  do: [{pass: x}]\n"
        res = run(src, "<tr><td>a</td></tr>")
        assert res.no_matches == 0  # commented out in reference (:1658,1675)

    def test_inverse_counts_two_triples(self):
        src = """
- prefix: ex
  iri: http://x/
- subject: ex:a
  predicate: ex:p
  inverse: ex:q
  object: {iri: 'ex:b'}
"""
        assert run(src).no_triples == 2


# ---------------------------------------------------------------------------
# echo/desc/dump/save-as


class TestDiagnostics:
    def test_echo_desc_log(self):
        res = run("- desc: docstring\n- echo: 'v=@{x}'\n", doc_vars={"x": 1}, collect_log=True)
        assert res.log == ["DESC: docstring", "ECHO: v=1"]

    def test_dump_current_text_to_file(self):
        res = run("- dump: _\n  file: snap\n", text="the text")
        assert res.texts == {"snap": "the text"}

    def test_save_as(self):
        res = run("- save-as: out-@{doc}.ttl\n", doc_vars={"doc": "d1"})
        assert res.saved_as == ["out-d1.ttl"]


class TestRemainingOpSurface:
    def test_set_with_import(self):
        src = """
- set: v
  eval: math.floor(3.7)
  import: math
- subject: http://e/s
  predicate: http://e/p
  object: "@{v}"
"""
        assert triples(src)[0][3] == "3"

    def test_call_tilde_match_assertion(self):
        # with: {key: value}: a value starting with '~' asserts the match
        # named key[1:] exists (processor.py:1164-1169)
        src = """
- procedure: p
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "@{m.1}"
- match: '(xyz)'
  as: m
  do:
    - call: p
      with:
        "~m": "~"
"""
        assert triples(src, "xyz")[0][3] == "xyz"

    def test_call_tilde_missing_match_raises(self):
        src = """
- procedure: p
  do: [{pass: x}]
- call: p
  with:
    "~nope": "~"
"""
        assert "no stored match named" in run(src).error

    def test_within_explicit_group(self):
        src = """
- within: '(A)(B+)(C)'
  group: 2
  do:
    - match-every: 'B'
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "^b@{?n}"
"""
        res = run(src, "xABBBCx")
        # 3 B's matched inside group 2 scope + the within match itself
        assert res.no_matches == 4

    def test_sequence_of_pattern_list_alternative(self):
        # an alternative's match: may be a LIST of patterns (first match
        # wins within the list; processor.py:1517-1518, _try_res)
        src = """
- sequence-of: s
  alternatives:
    - match:
        - 'zebra(\\d)'
        - 'cat(\\d)'
      as: m
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "^got@{m.1}"
"""
        assert [r[3] for r in triples(src, "cat1 cat2")] == ["got1", "got2"]

    def test_match_dimensions_three_levels(self):
        text = (
            "[sec (r: <a><b>) (r: <c>)]"
            "[sec (r: <d>)]"
        )
        src = """
- match-dimensions:
    - '\\[sec (.*?)\\]'
    - '\\(r: (.*?)\\)'
    - '<(.*?)>'
  dimensions: [s, r, c]
  as: cell
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^@{s}.@{r}.@{c}=@{cell.1}"
"""
        t = triples(src, text)
        assert [r[3] for r in t] == [
            "1.1.1=a", "1.1.2=b", "1.2.1=c", "2.1.1=d",
        ]

    def test_select_as_aliasing(self):
        from cmc_knowledge_graph_text2ttl_spark.workflow.interpreter import DocInterpreter
        from cmc_knowledge_graph_text2ttl_spark.workflow.sparql import MiniGraph, make_query_fn
        from cmc_knowledge_graph_text2ttl_spark.workflow import run_document as rd

        graph = MiniGraph([("http://x/a", "http://x/p", "literal", "val", None)])
        src = """
- select: o
  from: g
  where: "SELECT ?o WHERE { <http://x/a> <http://x/p> ?o . }"
  as: renamed
- subject: http://e/s
  predicate: http://e/p
  object: "^@{renamed}"
"""
        res = rd("", wf(src), query_fn=make_query_fn({"g": graph}))
        assert res.error is None
        assert res.triples[0][3] == "val"

    def test_select_no_rows_is_failure(self):
        from cmc_knowledge_graph_text2ttl_spark.workflow.sparql import MiniGraph, make_query_fn
        from cmc_knowledge_graph_text2ttl_spark.workflow import run_document as rd

        graph = MiniGraph([])
        src = """
- any-of:
    - select: o
      from: g
      where: "SELECT ?o WHERE { <http://x/a> <http://x/p> ?o . }"
    - subject: http://e/s
      predicate: http://e/p
      object: fallback
"""
        res = rd("", wf(src), query_fn=make_query_fn({"g": graph}))
        assert res.error is None and res.triples[0][3] == "fallback"


class TestMatch1Extras:
    TABLE = "<tr><td>h1</td><td>h2</td></tr><tr><td>a</td><td>b</td></tr>"

    def test_leading_body_and_leading_as(self):
        src = """
- match-1: '<tr>(.*?)</tr>'
  match-2: '<td>(.*?)</td>'
  as-1: row
  as-2: cell
  leading-as: lead
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^cell-@{cell.1}-lead-@{lead.1}"
  first: [{pass: header}]
  leading:
    - subject: http://e/s
      predicate: http://e/p
      object: "^leading-@{cell.1}"
"""
        t = triples(src, self.TABLE)
        # row 2: first cell runs leading:, second runs do: with lead bound
        assert [r[3] for r in t] == ["leading-a", "cell-b-lead-a"]


class TestDumpAndSaveAsVariants:
    def test_dump_expanded_string(self):
        res = run("- set: v\n  to: 'xyz'\n- dump: 'val=@{v}'\n  file: out\n")
        assert res.texts == {"out": "val=xyz"}

    def test_save_as_dict_form(self):
        res = run("- save-as:\n    file: graph-@{doc}.ttl\n", doc_vars={"doc": "d"})
        assert res.saved_as == ["graph-d.ttl"]

    def test_within_pattern_list(self):
        src = """
- within:
    - 'AAA(.*?)ZZZ'
    - 'BBB(.*?)YYY'
  do:
    - match: '(inner)'
      as: m
      do:
        - subject: http://e/s
          predicate: http://e/p
          object: "@{m.1}"
"""
        assert triples(src, "BBB inner YYY")[0][3] == "inner"


class TestSmallGaps:
    def test_append_auto_wraps_scalar(self):
        src = """
- set: lst
  to: 'first'
- append: lst
  element: second
- for-each: lst
  as: e
  do:
    - subject: http://e/s
      predicate: http://e/p
      object: "^@{e}"
"""
        assert [r[3] for r in triples(src)] == ["first", "second"]

    def test_for_each_non_list_raises(self):
        src = "- set: v\n  to: 'scalar'\n- for-each: v\n  as: e\n  do: [{pass: x}]\n"
        assert "does not hold a list" in run(src).error

    def test_mapping_without_flags_is_case_sensitive(self):
        src = """
- mapping: m
  pairs:
    - from: Abc
      to: HIT
- map: 'abc'
  apply: m
  to: out
- subject: http://e/s
  predicate: http://e/p
  object: "^@{out}"
"""
        assert triples(src)[0][3] == "abc"  # identity: no IGNORECASE copy

    def test_echo_with_match_groups(self):
        src = "- match: '(a)(b)'\n  as: m\n  do:\n    - echo: '@{m.2}@{m.1}'\n"
        res = run(src, "ab", collect_log=True)
        assert res.log == ["ECHO: ba"]

    def test_sparql_a_keyword(self):
        from cmc_knowledge_graph_text2ttl_spark.workflow.sparql import MiniGraph

        g = MiniGraph([
            ("http://x/e1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
             "iri", "http://x/T", None),
        ])
        out = g.query("SELECT ?s WHERE { ?s a <http://x/T> . }")
        assert [str(r["s"]) for r in out] == ["http://x/e1"]
