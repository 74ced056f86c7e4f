"""Link-graph operators (operators/links.py): href extraction +
integer-scaled PageRank."""

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.operators import links as lk


class TestExtractLinks:
    HTML = (
        '<html><body><a href="http://x/a">First <b>bold</b> link</a>'
        "<p>noise</p>"
        '<A HREF="http://x/b" class="z">second</A>'
        '<a href="/relative">rel</a>'
        '<a href="https://x/c"></a></body></html>'
    )

    def _df(self, spark, binary=False):
        blob = self.HTML.encode() if binary else self.HTML
        schema = "url string, html " + ("binary" if binary else "string")
        return spark.createDataFrame([("doc://1", blob)], schema)

    def test_extraction_case_and_inner_markup(self, spark):
        rows = sorted(
            (r.src, r.dst, r.anchor)
            for r in lk.extract_links(self._df(spark)).collect()
        )
        assert rows == [
            ("doc://1", "http://x/a", "First bold link"),
            ("doc://1", "http://x/b", "second"),
            ("doc://1", "https://x/c", ""),
        ]

    def test_relative_links_dropped(self, spark):
        dsts = {r.dst for r in lk.extract_links(self._df(spark)).collect()}
        assert "/relative" not in dsts

    def test_binary_html_column(self, spark):
        a = sorted(map(tuple, lk.extract_links(self._df(spark)).collect()))
        b = sorted(
            map(tuple, lk.extract_links(self._df(spark, binary=True)).collect())
        )
        assert a == b

    def test_no_links_no_rows(self, spark):
        df = spark.createDataFrame(
            [("u", "<html><p>plain</p></html>")], "url string, html string"
        )
        assert lk.extract_links(df).count() == 0


class TestAnchorSummaries:
    def test_topk_counts_and_tiebreak(self, spark):
        rows = [
            ("s1", "http://t/a", "alpha"),
            ("s2", "http://t/a", "alpha"),
            ("s2", "http://t/a", "beta"),
            ("s3", "http://t/a", "gamma"),
            ("s1", "http://t/b", ""),
            ("s1", "http://t/b", "only"),
        ]
        df = spark.createDataFrame(rows, "src string, dst string, anchor string")
        got = {
            (r.dst, r.anchor): (r.n_links, r.n_sources, r.rank_in_dst)
            for r in lk.anchor_summaries(df, k=2).collect()
        }
        # alpha: 2 links from 2 sources; beta/gamma tie at 1 → beta wins
        assert got == {
            ("http://t/a", "alpha"): (2, 2, 1),
            ("http://t/a", "beta"): (1, 1, 2),
            ("http://t/b", "only"): (1, 1, 1),
        }

    def test_bad_k_raises(self, spark):
        df = spark.createDataFrame([], "src string, dst string, anchor string")
        with pytest.raises(ValueError):
            lk.anchor_summaries(df, k=0)


class TestPageRank:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src string, dst string")

    def test_hand_computed_two_iterations(self, spark):
        # a→b, a→c, b→a; c dangling. scale=100, damping=85, teleport=15.
        # iter1: a=15+85=100, b=c=15+(85*50)div100=57
        # iter2: a=15+(85*57)div100=63, b=c=15+(85*(100 div 2))div100=57
        e = self._edges(spark, [("a", "b"), ("a", "c"), ("b", "a")])
        got = {
            r.node: r.rank
            for r in lk.pagerank(e, iterations=2, scale=100).collect()
        }
        assert got == {"a": 63, "b": 57, "c": 57}

    def test_partitioning_invariant(self, spark):
        rows = [
            (f"n{i}", f"n{(i * 7 + j * 13) % 40}")
            for i in range(40)
            for j in range(1, i % 3 + 2)
        ]
        a = sorted(
            map(tuple, lk.pagerank(
                self._edges(spark, rows).repartition(1), iterations=4
            ).collect())
        )
        b = sorted(
            map(tuple, lk.pagerank(
                self._edges(spark, rows).repartition(13), iterations=4
            ).collect())
        )
        assert a == b and len(a) > 0

    def test_hub_outranks_leaves(self, spark):
        # everyone links to h; h links to one leaf
        e = self._edges(
            spark, [(f"l{i}", "h") for i in range(5)] + [("h", "l0")]
        )
        got = {r.node: r.rank for r in lk.pagerank(e, iterations=5).collect()}
        assert got["h"] > got["l0"] > got["l1"]
        assert got["l1"] == got["l2"] == got["l3"] == got["l4"]

    def test_bad_params_raise(self, spark):
        e = self._edges(spark, [("a", "b")])
        with pytest.raises(ValueError):
            lk.pagerank(e, iterations=0)
        with pytest.raises(ValueError):
            lk.pagerank(e, damping_pct=101)


class TestRelativeResolution:
    def _df(self, spark, html, url="http://site.example/dir/page.html"):
        return spark.createDataFrame([(url, html)], "url string, html string")

    def _dsts(self, spark, html, **kw):
        return sorted(
            r.dst for r in lk.extract_links(self._df(spark, html), **kw).collect()
        )

    def test_relative_rooted_dotted_protocol(self, spark):
        html = (
            '<html><body>'
            '<a href="other.html">a</a>'
            '<a href="/rooted/x">b</a>'
            '<a href="../up">c</a>'
            '<a href="//cdn.example/asset">d</a>'
            '<a href="http://abs.example/p">e</a>'
            "</body></html>"
        )
        assert self._dsts(spark, html) == [
            "http://abs.example/p",
            "http://cdn.example/asset",
            "http://site.example/dir/other.html",
            "http://site.example/rooted/x",
            "http://site.example/up",
        ]

    def test_base_href_wins_and_is_itself_resolved(self, spark):
        html = (
            '<html><head><base href="/bd/"></head><body>'
            '<a href="rel.html">a</a></body></html>'
        )
        assert self._dsts(spark, html) == ["http://site.example/bd/rel.html"]
        html2 = (
            '<html><head><base href="https://b.example/bd/sub/"></head>'
            '<body><a href="../x">a</a></body></html>'
        )
        assert self._dsts(spark, html2) == ["https://b.example/bd/x"]

    def test_fragment_empty_and_nonhttp_dropped(self, spark):
        html = (
            '<html><body><a href="#top">t</a><a href="">e</a>'
            '<a href="mailto:x@y">m</a><a href="javascript:void(0)">j</a>'
            '<a href="p#frag">keep</a></body></html>'
        )
        assert self._dsts(spark, html) == ["http://site.example/dir/p"]

    def test_resolve_relative_false_restores_absolute_only(self, spark):
        html = (
            '<html><body><a href="other.html">a</a>'
            '<a href="http://abs.example/p">e</a></body></html>'
        )
        assert self._dsts(spark, html, resolve_relative=False) == [
            "http://abs.example/p"
        ]


class TestHits:
    """Integer-scaled HITS (operators/links.hits)."""

    def _model(self, edges, iters=5, scale=1_000_000):
        nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
        h = {n: scale for n in nodes}
        a = {n: 0 for n in nodes}
        for _ in range(iters):
            raw = {n: 0 for n in nodes}
            for u, v in edges:
                raw[v] += h[u]
            d = max(1, max(raw.values()) // scale) if raw else 1
            a = {n: raw[n] // d for n in nodes}
            raw = {n: 0 for n in nodes}
            for u, v in edges:
                raw[u] += a[v]
            d = max(1, max(raw.values()) // scale) if raw else 1
            h = {n: raw[n] // d for n in nodes}
        return h, a

    def test_matches_python_model(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import hits

        edges = [(0, 1), (0, 2), (0, 3), (4, 1), (4, 2), (1, 3), (2, 3)]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.node: (r.hub, r.authority) for r in hits(df).collect()}
        h, a = self._model(edges)
        assert got == {n: (h[n], a[n]) for n in h}

    def test_hub_and_authority_separate(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import hits

        # 0 is a pure directory (links to everything), 9 a pure
        # authority (linked by everything else)
        edges = [(0, v) for v in range(1, 10)] + [
            (u, 9) for u in range(1, 9)
        ]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r.node: r for r in hits(df).collect()}
        best_hub = max(got.values(), key=lambda r: (r.hub, -r.node)).node
        best_auth = max(
            got.values(), key=lambda r: (r.authority, -r.node)
        ).node
        assert best_hub == 0 and best_auth == 9
        assert got[9].hub == 0          # 9 has no out-links
        assert got[0].authority == 0    # 0 has no in-links

    def test_partition_invariance(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import hits

        edges = [(i, (i * 3 + 1) % 40) for i in range(40)] + [
            (i, (i * 7 + 2) % 40) for i in range(0, 40, 2)
        ]
        df = spark.createDataFrame(edges, ["src", "dst"])
        one = sorted(map(tuple, hits(df).collect()))
        many = sorted(map(tuple, hits(df.repartition(11)).collect()))
        assert one == many

    def test_bad_iterations(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import hits

        with pytest.raises(ValueError, match="iterations"):
            hits(spark.createDataFrame([(1, 2)], ["src", "dst"]),
                 iterations=0)


class TestLabelPropagation:
    def _run(self, spark, edges, **kw):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import (
            label_propagation,
        )

        df = spark.createDataFrame(edges, ["src", "dst"])
        return {r.node: r.label for r in
                label_propagation(df, **kw).collect()}

    def test_two_cliques_with_bridge(self, spark):
        # clique {1,2,3}, clique {10,11,12}, one bridge 3-10
        tri = lambda a, b, c: [(a, b), (b, c), (a, c)]  # noqa: E731
        got = self._run(spark, tri(1, 2, 3) + tri(10, 11, 12) + [(3, 10)])
        assert got[1] == got[2] == got[3] == 1
        assert got[10] == got[11] == got[12]
        # the second clique converges to its own min-dominated label
        assert got[10] != got[1]

    def test_star_adopts_center_neighbors_min(self, spark):
        # star: center 5 with leaves 1..4; leaves see only label(5),
        # center sees leaf labels -> min tie-break picks 1
        got = self._run(spark, [(5, k) for k in (1, 2, 3, 4)], iterations=1)
        assert got[5] == 1
        assert got[1] == got[2] == got[3] == got[4] == 5

    def test_deterministic_vs_partitioning(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import (
            label_propagation,
        )

        edges = [(i, (i * 7 + 13) % 50) for i in range(50) if i != (i * 7 + 13) % 50]
        df = spark.createDataFrame(edges, ["src", "dst"])
        a = sorted(map(tuple, label_propagation(df).collect()))
        b = sorted(map(tuple,
                       label_propagation(df.repartition(17)).collect()))
        assert a == b

    def test_bad_iterations_raise(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import (
            label_propagation,
        )

        with pytest.raises(ValueError, match="iterations"):
            label_propagation(
                spark.createDataFrame([(1, 2)], ["src", "dst"]), iterations=0)
