"""Page-metadata extraction (operators/pagemeta.py)."""

from cmc_knowledge_graph_text2ttl_spark.operators import pagemeta as pm

HTML = """<!DOCTYPE html><HTML lang="en-GB"><head>
<TITLE> My Page </TITLE>
<meta content="A fine page" name="description">
<META NAME="robots" CONTENT="NOINDEX, nofollow">
<link href='http://x/canon' rel='canonical'>
</head><body></body></html>"""


def _df(spark, html=HTML, binary=False):
    blob = html.encode() if binary else html
    schema = "url string, html " + ("binary" if binary else "string")
    return spark.createDataFrame([("http://pg", blob)], schema)


class TestExtractPageMeta:
    def test_all_fields_mixed_case_and_attr_order(self, spark):
        r = pm.extract_page_meta(_df(spark)).collect()[0]
        assert r.title == "My Page"
        # content= BEFORE name= — reversed attribute order
        assert r.description == "A fine page"
        assert r.canonical == "http://x/canon"  # href before rel, single quotes
        assert r.noindex is True and r.nofollow is True
        assert r.lang == "en-GB"

    def test_missing_fields_are_null_and_flags_false(self, spark):
        r = pm.extract_page_meta(
            _df(spark, "<html><body>bare</body></html>")
        ).collect()[0]
        assert r.title is None and r.description is None
        assert r.canonical is None and r.lang is None
        assert r.noindex is False and r.nofollow is False

    def test_binary_html(self, spark):
        a = pm.extract_page_meta(_df(spark)).collect()
        b = pm.extract_page_meta(_df(spark, binary=True)).collect()
        assert a == b

    def test_apostrophe_inside_double_quoted_value(self, spark):
        html = ('<html><head>'
                '<meta name="description" content="Bob\'s fine page">'
                '</head></html>')
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.description == "Bob's fine page"

    def test_unquoted_values_and_lang(self, spark):
        html = '<html lang=en><head><meta name=description content=cheap></head></html>'
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.lang == "en" and r.description == "cheap"

    def test_prefixed_attrs_and_metadata_tag_excluded(self, spark):
        html = ('<html xml:lang="fr"><head>'
                '<meta data-name="description" content="evil">'
                '<metadata name="description" content="also evil">'
                '</head></html>')
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.description is None and r.lang is None

    def test_robots_none_implies_both(self, spark):
        html = '<html><head><meta name="robots" content="none"></head></html>'
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.noindex is True and r.nofollow is True

    def test_forward_attr_order_also_matches(self, spark):
        html = ('<html><head><meta name="description" content="fwd order">'
                '<link rel="canonical" href="http://x/c2"></head></html>')
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.description == "fwd order"
        assert r.canonical == "http://x/c2"


class TestExtractOgMeta:
    def test_multivalued_and_both_orders(self, spark):
        html = ('<html><head>'
                '<meta property="og:title" content="The Title">'
                '<meta content="http://x/a.png" property="og:image">'
                '<meta property="og:image" content="http://x/b.png">'
                '<meta property="twitter:card" content="ignored">'
                '<meta name="og:fake" content="not a property attr">'
                '</head></html>')
        df = spark.createDataFrame([("u", html)], "url string, html string")
        got = sorted(
            (r.og_property, r.og_content)
            for r in pm.extract_og_meta(df).collect()
        )
        assert got == [
            ("og:image", "http://x/a.png"),
            ("og:image", "http://x/b.png"),
            ("og:title", "The Title"),
        ]

    def test_no_og_tags_no_rows(self, spark):
        df = spark.createDataFrame(
            [("u", "<html><head><title>x</title></head></html>")],
            "url string, html string",
        )
        assert pm.extract_og_meta(df).count() == 0


class TestNoCrossTagMatching:
    def test_reversed_pattern_cannot_span_tags(self, spark):
        # regression: a content= in one tag must not pair with the
        # name="description" of the NEXT tag
        html = ('<html><head>'
                '<meta content="evil" name="author">'
                '<meta name="description" content="good">'
                '</head></html>')
        df = spark.createDataFrame([("u", html)], "url string, html string")
        r = pm.extract_page_meta(df).collect()[0]
        assert r.description == "good"


class TestQuotedValuesWithGt:
    # regression (round-4 ADVICE): quoted values are quote-negated, not
    # '>'-negated, so a legal '>' inside the value no longer nulls the field
    def test_description_with_gt(self, spark):
        html = ('<html><head>'
                '<meta name="description" content="a > b, honest">'
                '</head></html>')
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.description == "a > b, honest"

    def test_reversed_order_with_gt(self, spark):
        html = ('<html><head>'
                '<meta content="x > y" name="description">'
                '</head></html>')
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.description == "x > y"

    def test_lang_and_og_with_gt(self, spark):
        html = ('<html lang="en>weird"><head>'
                '<meta property="og:title" content="1 > 0">'
                '</head></html>')
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.lang == "en>weird"
        og = pm.extract_og_meta(_df(spark, html)).collect()
        assert [(x.og_property, x.og_content) for x in og] == [("og:title", "1 > 0")]

    def test_cross_tag_pairing_still_impossible(self, spark):
        # the '>'-tolerant value class must not reintroduce the round-3
        # cross-tag bug: content= of tag A + name= of tag B
        html = ('<html><head>'
                '<meta content="orphan value">'
                '<meta name="description">'
                '</head></html>')
        r = pm.extract_page_meta(_df(spark, html)).collect()[0]
        assert r.description is None


class TestMetaRefresh:
    def _run(self, spark, rows):
        from cmc_knowledge_graph_text2ttl_spark.operators.pagemeta import (
            extract_meta_refresh,
        )

        df = spark.createDataFrame(rows, ["url", "html"])
        return {r.url: r for r in extract_meta_refresh(df).collect()}

    def test_forms_and_resolution(self, spark):
        got = self._run(spark, [
            ("http://a/x",
             '<html><meta http-equiv="refresh" content="5;url=/new/p">'),
            ("http://b/y",
             "<META content='0; URL=http://t.example/' http-equiv=refresh>"),
            ("http://c/z", "<meta name='other' content='5;url=/no'>"),
            ("http://d/w", '<meta http-equiv="refresh" content="30">'),
        ])
        assert (got["http://a/x"].refresh_delay_s,
                got["http://a/x"].refresh_url) == (5, "http://a/new/p")
        assert (got["http://b/y"].refresh_delay_s,
                got["http://b/y"].refresh_url) == (0, "http://t.example/")
        assert got["http://c/z"].refresh_url is None
        assert (got["http://d/w"].refresh_delay_s,
                got["http://d/w"].refresh_url) == (30, None)

    def test_relative_with_dot_segments(self, spark):
        got = self._run(spark, [
            ("http://a/dir/page",
             '<meta http-equiv=refresh content="1;url=../other">'),
        ])
        assert got["http://a/dir/page"].refresh_url == "http://a/other"


class TestRobotsSitemaps:
    def test_declarations_extracted(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.robots import (
            robots_sitemaps,
        )

        df = spark.createDataFrame([
            ("a", "User-agent: *\nDisallow: /x\n"
                  "Sitemap: https://a/s1.xml\nsitemap: https://a/s2.xml"),
            ("b", "User-agent: *\nAllow: /"),
            ("c", "  SITEMAP:\thttps://c/map.xml"),
        ], ["host", "robots_txt"])
        got = sorted((r.host, r.sitemap_url)
                     for r in robots_sitemaps(df).collect())
        assert got == [("a", "https://a/s1.xml"), ("a", "https://a/s2.xml"),
                       ("c", "https://c/map.xml")]
