"""RFC 3986 reference resolution (operators/urls.resolve_url_col) —
the full §5.4 normal + abnormal example table, plus the link-graph
integration (<base href>, relative/rooted/dotted/protocol-relative)."""

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.operators.urls import resolve_url_col

BASE = "http://a/b/c/d;p?q"

# RFC 3986 §5.4.1 (normal) + §5.4.2 (abnormal), strict parser
VECTORS = [
    ("g:h", "g:h"),
    ("g", "http://a/b/c/g"),
    ("./g", "http://a/b/c/g"),
    ("g/", "http://a/b/c/g/"),
    ("/g", "http://a/g"),
    ("//g", "http://g"),
    ("?y", "http://a/b/c/d;p?y"),
    ("g?y", "http://a/b/c/g?y"),
    ("#s", "http://a/b/c/d;p?q#s"),
    ("g#s", "http://a/b/c/g#s"),
    ("g?y#s", "http://a/b/c/g?y#s"),
    (";x", "http://a/b/c/;x"),
    ("g;x", "http://a/b/c/g;x"),
    ("g;x?y#s", "http://a/b/c/g;x?y#s"),
    ("", "http://a/b/c/d;p?q"),
    (".", "http://a/b/c/"),
    ("./", "http://a/b/c/"),
    ("..", "http://a/b/"),
    ("../", "http://a/b/"),
    ("../g", "http://a/b/g"),
    ("../..", "http://a/"),
    ("../../", "http://a/"),
    ("../../g", "http://a/g"),
    # abnormal
    ("../../../g", "http://a/g"),
    ("../../../../g", "http://a/g"),
    ("/./g", "http://a/g"),
    ("/../g", "http://a/g"),
    ("g.", "http://a/b/c/g."),
    (".g", "http://a/b/c/.g"),
    ("g..", "http://a/b/c/g.."),
    ("..g", "http://a/b/c/..g"),
    ("./../g", "http://a/b/g"),
    ("./g/.", "http://a/b/c/g/"),
    ("g/./h", "http://a/b/c/g/h"),
    ("g/../h", "http://a/b/c/h"),
    ("g;x=1/./y", "http://a/b/c/g;x=1/y"),
    ("g;x=1/../y", "http://a/b/c/y"),
    ("g?y/./x", "http://a/b/c/g?y/./x"),
    ("g?y/../x", "http://a/b/c/g?y/../x"),
    ("g#s/./x", "http://a/b/c/g#s/./x"),
    ("g#s/../x", "http://a/b/c/g#s/../x"),
    ("http:g", "http:g"),  # strict parser
]


class TestRfc3986Vectors:
    def test_full_section_5_4_table(self, spark):
        df = spark.createDataFrame(
            [(BASE, r, want) for r, want in VECTORS], "base string, ref string, want string"
        )
        rows = df.withColumn(
            "got", resolve_url_col(F.col("base"), F.col("ref"))
        ).collect()
        bad = [(r.ref, r.got, r.want) for r in rows if r.got != r.want]
        assert bad == []

    def test_empty_base_path(self, spark):
        df = spark.createDataFrame(
            [("http://host", "g"), ("http://host?q", "g")], "base string, ref string"
        )
        got = [
            r.got
            for r in df.withColumn(
                "got", resolve_url_col(F.col("base"), F.col("ref"))
            ).collect()
        ]
        assert got == ["http://host/g", "http://host/g"]

    def test_protocol_relative_keeps_base_scheme(self, spark):
        df = spark.createDataFrame(
            [("https://a/b", "//cdn.x/y?z")], "base string, ref string"
        )
        r = df.withColumn("got", resolve_url_col(F.col("base"), F.col("ref"))).collect()[0]
        assert r.got == "https://cdn.x/y?z"


class TestBlocklist:
    """Domain-suffix blocklist filtering (urls.filter_blocked_domains)."""

    def test_suffix_exact_and_near_miss(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.urls import (
            filter_blocked_domains,
        )

        docs = spark.createDataFrame([
            ("http://ads.example.com/x", 1),
            ("https://example.com/y", 2),
            ("http://example.org/z", 3),
            ("http://good.net/a", 4),
            ("http://notexample.com/b", 5),   # suffix must be dot-anchored
            ("http://deep.a.b.example.org/c", 6),
        ], ["url", "v"])
        bl = spark.createDataFrame(
            [("example.com",), ("EXAMPLE.ORG ",)], ["domain"])
        got = sorted(r.v for r in filter_blocked_domains(docs, bl).collect())
        assert got == [4, 5]

    def test_empty_blocklist_keeps_everything(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.urls import (
            filter_blocked_domains,
        )
        from pyspark.sql.types import StringType, StructField, StructType

        docs = spark.createDataFrame([("http://a.b/x", 1)], ["url", "v"])
        bl = spark.createDataFrame(
            [], StructType([StructField("domain", StringType())]))
        assert filter_blocked_domains(docs, bl).count() == 1


class TestUrlQuality:
    """FineWeb-style URL-level quality verdict (urls.url_quality)."""

    ROWS = [
        (1, "https://good.example.com/articles/cooking"),
        (2, "http://free-viagra.biz/pills"),                       # badword
        (3, "http://10.1.2.3/admin"),                              # ip host
        (4, "http://shop.example/p?" + "&".join(
            f"f{i}=v{i}" for i in range(12))),                     # param trap
        (5, "http://cal.example/" + "/".join(
            f"d{i}" for i in range(20))),                          # deep path
        (6, "http://x.example/" + "a" * 3000),                     # too long
        (7, "http://h123456.example/ok"),                          # digits host
    ]

    def _run(self, spark, **kw):
        from cmc_knowledge_graph_text2ttl_spark.operators.urls import url_quality

        df = spark.createDataFrame(self.ROWS, ["doc_id", "url"])
        return {r.id: r for r in url_quality(df, **kw).collect()}

    def test_verdicts_and_reasons(self, spark):
        got = self._run(spark)
        assert got[1].keep and got[1].reasons == []
        assert not got[2].keep and got[2].reasons == ["badword"]
        assert not got[3].keep and got[3].reasons == ["ip_host"]
        assert not got[4].keep and got[4].reasons == ["param_trap"]
        assert not got[5].keep and got[5].reasons == ["deep_path"]
        assert not got[6].keep and got[6].reasons == ["too_long"]
        assert got[7].keep  # digit share reported, not a keep criterion

    def test_signal_columns(self, spark):
        got = self._run(spark)
        assert got[1].host == "good.example.com"
        assert got[1].n_params == 0 and got[1].path_depth == 2
        assert got[4].n_params == 12
        assert got[5].path_depth == 20
        assert got[3].is_ip_host and not got[1].is_ip_host
        # h123456.example -> 6 digits / 15 chars = 40%
        assert got[7].host_digit_pct == 40

    def test_thresholds_are_parameters(self, spark):
        got = self._run(spark, max_params=20, max_depth=25, max_len=5000,
                        badwords=("nonexistentword",))
        assert all(got[i].keep for i in (1, 2, 4, 5, 6, 7))
        assert not got[3].keep  # ip_host is not threshold-gated


    def test_badwords_with_metachars_are_escaped(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.urls import url_quality

        df = spark.createDataFrame(
            [(1, "http://sex.com/x"), (2, "http://sexXcom.example/y"),
             (3, "http://ok.example/(paren)")],
            ["doc_id", "url"])
        got = {r.id: r for r in url_quality(
            df, badwords=("sex.com", "bad(")).collect()}
        assert got[1].has_badword
        assert not got[2].has_badword     # '.' must not match 'X'
        assert not got[3].has_badword     # '(' entry must not crash


class TestHostStats:
    def test_per_host_aggregates(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.urls import host_stats

        df = spark.createDataFrame([
            (1, "http://a.example/one"),          # len 20
            (2, "http://a.example/two/three"),    # len 26, depth 2
            (3, "http://a.example/casino/x"),     # badword, len 25
            (4, "http://b.example/y"),
        ], ["doc_id", "url"])
        got = {r.host: r for r in host_stats(df).collect()}
        a = got["a.example"]
        assert (a.n_docs, a.n_kept, a.n_badword) == (3, 2, 1)
        assert a.mean_url_len == (20 + 26 + 25) // 3
        assert a.max_path_depth == 2
        b = got["b.example"]
        assert (b.n_docs, b.n_kept, b.n_badword) == (1, 1, 0)

    def test_partition_invariance(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.urls import host_stats

        rows = [(i, f"http://h{i % 7}.example/p{i}/" + "x" * (i % 13))
                for i in range(200)]
        df = spark.createDataFrame(rows, ["doc_id", "url"])
        a = sorted(map(tuple, host_stats(df).collect()))
        b = sorted(map(tuple, host_stats(df.repartition(17)).collect()))
        assert a == b
