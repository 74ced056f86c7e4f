"""Remote-graph select: batch prefetch (workflow/remote.py) and the
exporter's OAuth-style refresh/backoff retry loop (sinks/exporter.py).

Reference parity targets: URL-shape dispatch
(text_to_turtle_processor.py:156-164), Stardog HTTP select
(processor.py:233-327) — replaced by driver-side batch prefetch +
broadcast — and the Azure-OAuth retry loop (runner.py:434-477) — as an
injectable token_provider with refresh-on-401.
"""

import pytest

from cmc_knowledge_graph_text2ttl_spark.core.errors import ProcessorException
from cmc_knowledge_graph_text2ttl_spark.workflow.remote import (
    fetch_remote_graph,
    is_remote_graph,
    resolve_graphs,
)
from cmc_knowledge_graph_text2ttl_spark.workflow.sparql import MiniGraph, make_query_fn


def _bindings(rows):
    out = []
    for s, p, kind, lex, lang in rows:
        o = (
            {"type": "uri", "value": lex}
            if kind == "iri"
            else {"type": "literal", "value": lex, **({"xml:lang": lang} if lang else {})}
        )
        out.append({"s": {"type": "uri", "value": s}, "p": {"type": "uri", "value": p}, "o": o})
    return out


ROWS = [
    ("http://x/a", "http://x/name", "literal", "Alice", "en"),
    ("http://x/a", "http://x/knows", "iri", "http://x/b", None),
    ("http://x/b", "http://x/name", "literal", "Bob", None),
]


class FakeEndpoint:
    """SPARQL endpoint double with LIMIT/OFFSET paging."""

    def __init__(self, rows):
        self.rows = rows
        self.queries = []

    def __call__(self, url, query):
        import re

        self.queries.append((url, query))
        limit = int(re.search(r"LIMIT (\d+)", query).group(1))
        offset = int(re.search(r"OFFSET (\d+)", query).group(1))
        page = self.rows[offset : offset + limit]
        return {"results": {"bindings": _bindings(page)}}


class TestDispatch:
    def test_url_shape(self):
        assert is_remote_graph("http://stardog:5820/db/query")
        assert is_remote_graph("HTTPS://host/sparql")
        assert not is_remote_graph("ontology")
        assert not is_remote_graph("file:///x.ttl")
        assert not is_remote_graph("")


class TestPrefetch:
    def test_fetch_all_rows(self):
        ep = FakeEndpoint(ROWS)
        got = fetch_remote_graph("http://e/q", transport=ep, page_size=10)
        assert got == ROWS
        assert len(ep.queries) == 1  # one page was enough

    def test_paging(self):
        ep = FakeEndpoint(ROWS * 40)  # 120 rows
        got = fetch_remote_graph("http://e/q", transport=ep, page_size=50)
        assert len(got) == 120
        # 50 + 50 + 20 → 3 pages (last short page terminates)
        assert len(ep.queries) == 3

    def test_max_rows_guard(self):
        ep = FakeEndpoint(ROWS * 40)
        with pytest.raises(ProcessorException, match="too big"):
            fetch_remote_graph("http://e/q", transport=ep, page_size=50, max_rows=60)

    def test_resolve_graphs_dispatch(self):
        ep = FakeEndpoint(ROWS)
        ttl = '@prefix x: <http://x/> . x:a x:p "v" .'
        out = resolve_graphs(
            {"dim": "http://e/q", "onto": ttl, "raw": ROWS[:1]},
            transport=ep,
        )
        assert out["dim"] == ROWS
        assert out["onto"] == [("http://x/a", "http://x/p", "literal", "v", None)]
        assert out["raw"] == ROWS[:1]

    def test_prefetched_graph_answers_select(self):
        """End-to-end: remote graph → prefetch → MiniGraph → select with
        FILTER works per-document without any further HTTP."""
        ep = FakeEndpoint(ROWS)
        rows = fetch_remote_graph("http://e/q", transport=ep)
        qfn = make_query_fn({"http://e/q": MiniGraph(rows)})
        out = qfn(
            ["n"],
            "http://e/q",
            'SELECT ?n WHERE { ?s <http://x/name> ?n . FILTER (regex(?n, "^A")) }',
        )
        assert [str(r["n"]) for r in out] == ["Alice"]
        assert len(ep.queries) == 1  # prefetch only — no per-select HTTP


class TestExporterRetry:
    def _df(self, spark):
        return spark.createDataFrame(
            [("http://s", "http://p", "iri", "http://o", None, None)],
            "subj string, pred string, obj_kind string, obj_lexical string,"
            " obj_lang string, obj_datatype string",
        )

    def test_token_refresh_on_401(self, spark):
        # closures are pickled per task, so assertions go through OUTCOMES:
        # first token is rejected with 401; success proves a refresh + retry
        # happened executor-side (without refresh this would raise).
        from cmc_knowledge_graph_text2ttl_spark.sinks.exporter import export_to_endpoint

        def transport(url, body, headers):
            return 401 if headers.get("Authorization") == "Bearer t0" else 201

        tokens = iter(["t0", "t1", "t2"])
        n = export_to_endpoint(
            self._df(spark),
            "http://e/db",
            transport=transport,
            token_provider=lambda: next(tokens),
        )
        assert n == 1

    def test_401_without_provider_raises(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.sinks.exporter import export_to_endpoint

        with pytest.raises(Exception, match="returned 401"):
            export_to_endpoint(
                self._df(spark), "http://e/db", transport=lambda u, b, h: 401
            )

    def test_5xx_backoff_then_success(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.sinks.exporter import export_to_endpoint

        statuses = iter([503, 500, 201])

        def transport(url, body, headers):
            return next(statuses)

        n = export_to_endpoint(
            self._df(spark), "http://e/db", transport=transport, backoff_s=0.01
        )
        assert n == 1

    def test_persistent_failure_raises(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.sinks.exporter import export_to_endpoint

        with pytest.raises(Exception, match="returned 500"):
            export_to_endpoint(
                self._df(spark),
                "http://e/db",
                transport=lambda u, b, h: 500,
                backoff_s=0.01,
                max_retries=2,
            )
