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
