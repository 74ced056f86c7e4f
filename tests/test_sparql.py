"""Mini-SPARQL evaluator: FILTER + OPTIONAL coverage (workflow/sparql.py).

The reference evaluates ``where:`` with rdflib's full SPARQL engine
(text_to_turtle_processor.py:2107-2202); the engine supports the subset
workflow-style lookups actually use — BGP + single-level OPTIONAL +
FILTER with comparisons / regex / boolean composition.
"""

import pytest

from cmc_knowledge_graph_text2ttl_spark.core.errors import ProcessorException
from cmc_knowledge_graph_text2ttl_spark.workflow.sparql import (
    MiniGraph,
    make_query_fn,
)

P = "http://x/p"
NAME = "http://x/name"
AGE = "http://x/age"
NICK = "http://x/nick"

GRAPH = MiniGraph(
    [
        ("http://x/alice", NAME, "literal", "Alice", None),
        ("http://x/alice", AGE, "literal", "34", None),
        ("http://x/alice", NICK, "literal", "Al", None),
        ("http://x/bob", NAME, "literal", "Bob", None),
        ("http://x/bob", AGE, "literal", "7", None),
        ("http://x/carol", NAME, "literal", "carol", None),
        ("http://x/carol", AGE, "literal", "19", None),
        ("http://x/carol", P, "iri", "http://x/alice", None),
    ]
)


def names(rows):
    return sorted(str(r["n"]) for r in rows)


class TestFilter:
    def test_eq_literal(self):
        out = GRAPH.query(
            'SELECT ?s WHERE { ?s <http://x/name> ?n . FILTER (?n = "Bob") }'
        )
        assert [str(r["s"]) for r in out] == ["http://x/bob"]

    def test_neq(self):
        out = GRAPH.query(
            'SELECT ?n WHERE { ?s <http://x/name> ?n . FILTER (?n != "Bob") }'
        )
        assert names(out) == ["Alice", "carol"]

    def test_numeric_comparison_not_lexicographic(self):
        # "7" < "19" numerically but not lexically — must compare as numbers
        out = GRAPH.query(
            "SELECT ?n WHERE { ?s <http://x/age> ?a . ?s <http://x/name> ?n . "
            "FILTER (?a < 20) }"
        )
        assert names(out) == ["Bob", "carol"]

    def test_regex_and_case_flag(self):
        out = GRAPH.query(
            'SELECT ?n WHERE { ?s <http://x/name> ?n . FILTER (regex(?n, "^ca")) }'
        )
        assert names(out) == ["carol"]
        out = GRAPH.query(
            'SELECT ?n WHERE { ?s <http://x/name> ?n . FILTER (regex(?n, "^AL", "i")) }'
        )
        assert names(out) == ["Alice"]

    def test_boolean_composition(self):
        out = GRAPH.query(
            "SELECT ?n WHERE { ?s <http://x/age> ?a . ?s <http://x/name> ?n . "
            'FILTER (?a >= 19 && !regex(?n, "^A")) }'
        )
        assert names(out) == ["carol"]
        out = GRAPH.query(
            "SELECT ?n WHERE { ?s <http://x/age> ?a . ?s <http://x/name> ?n . "
            'FILTER ((?a > 30) || (?n = "Bob")) }'
        )
        assert names(out) == ["Alice", "Bob"]

    def test_iri_comparison(self):
        out = GRAPH.query(
            "SELECT ?s WHERE { ?s <http://x/p> ?o . FILTER (?o = <http://x/alice>) }"
        )
        assert [str(r["s"]) for r in out] == ["http://x/carol"]

    def test_unbound_var_in_filter_drops_binding(self):
        out = GRAPH.query(
            "SELECT ?n WHERE { ?s <http://x/name> ?n . "
            "OPTIONAL { ?s <http://x/nick> ?k } FILTER (?k = \"Al\") }"
        )
        # only alice has a nick; bob/carol have ?k unbound → filter errors → dropped
        assert names(out) == ["Alice"]

    def test_bad_filter_raises(self):
        with pytest.raises(ProcessorException):
            GRAPH.query("SELECT ?s WHERE { ?s <http://x/name> ?n . FILTER (?n ~ 3) }")

    def test_filter_inside_optional_raises_not_silently_ignored(self):
        with pytest.raises(ProcessorException, match="inside an OPTIONAL"):
            GRAPH.query(
                "SELECT ?s WHERE { ?s <http://x/name> ?n . "
                'OPTIONAL { ?s <http://x/nick> ?k FILTER (?k = "Al") } }'
            )


class TestOptional:
    def test_left_join_keeps_unmatched(self):
        out = GRAPH.query(
            "SELECT ?n ?k WHERE { ?s <http://x/name> ?n . "
            "OPTIONAL { ?s <http://x/nick> ?k } }"
        )
        got = {str(r["n"]): (None if r["k"] is None else str(r["k"])) for r in out}
        assert got == {"Alice": "Al", "Bob": None, "carol": None}

    def test_optional_joins_on_shared_var(self):
        # the optional pattern must bind through ?s, not cross-join
        out = GRAPH.query(
            "SELECT ?n ?k WHERE { ?s <http://x/name> ?n . "
            'OPTIONAL { ?s <http://x/nick> ?k } FILTER (?n = "Bob") }'
        )
        assert len(out) == 1 and out[0]["k"] is None

    def test_two_optionals(self):
        out = GRAPH.query(
            "SELECT ?n ?k ?a WHERE { ?s <http://x/name> ?n . "
            "OPTIONAL { ?s <http://x/nick> ?k } "
            "OPTIONAL { ?s <http://x/age> ?a } }"
        )
        by_name = {str(r["n"]): r for r in out}
        assert str(by_name["Bob"]["a"]) == "7" and by_name["Bob"]["k"] is None


class TestWorkflowSelectWithFilter:
    def test_select_filter_in_workflow(self):
        from cmc_knowledge_graph_text2ttl_spark.workflow import run_document as rd
        from cmc_knowledge_graph_text2ttl_spark.workflow.compile import compile_workflow

        src = """
- select: n
  from: g
  where: 'SELECT ?n WHERE { ?s <http://x/age> ?a . ?s <http://x/name> ?n . FILTER (?a > 30) }'
- subject: http://e/s
  predicate: http://e/p
  object: "^@{n}"
"""
        res = rd(
            "",
            compile_workflow(src, "wf_filter"),
            query_fn=make_query_fn({"g": GRAPH}),
        )
        assert res.error is None
        assert res.triples[0][3] == "Alice"
