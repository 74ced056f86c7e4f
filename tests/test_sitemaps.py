"""Sitemap parsing (operators/sitemaps.py)."""

from cmc_knowledge_graph_text2ttl_spark.operators import sitemaps as sm

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://x/a?p=1&amp;q=2</loc><lastmod>2024-01-02</lastmod></url>
  <url>
    <loc> http://x/b </loc>
  </url>
  <url><lastmod>2024-01-03</lastmod></url>
</urlset>"""

IDX = """<sitemapindex>
  <sitemap><loc>http://x/sitemap1.xml</loc><lastmod>2024-02-01</lastmod></sitemap>
  <sitemap><loc>http://x/sitemap2.xml</loc></sitemap>
</sitemapindex>"""


def _df(spark, xml, binary=False):
    blob = xml.encode() if binary else xml
    schema = "sitemap_url string, sitemap_xml " + ("binary" if binary else "string")
    return spark.createDataFrame([("http://x/sitemap.xml", blob)], schema)


class TestParseSitemaps:
    def test_urlset_entries(self, spark):
        rows = sorted(
            (r.kind, r.loc, r.lastmod)
            for r in sm.parse_sitemaps(_df(spark, XML)).collect()
        )
        # the loc-less entry is dropped; &amp; unescaped; loc trimmed
        assert rows == [
            ("url", "http://x/a?p=1&q=2", "2024-01-02"),
            ("url", "http://x/b", None),
        ]

    def test_index_entries_marked_sitemap(self, spark):
        rows = sorted(
            (r.kind, r.loc, r.lastmod)
            for r in sm.parse_sitemaps(_df(spark, IDX)).collect()
        )
        assert rows == [
            ("sitemap", "http://x/sitemap1.xml", "2024-02-01"),
            ("sitemap", "http://x/sitemap2.xml", None),
        ]

    def test_all_xml_entities_unescaped(self, spark):
        xml = ("<urlset><url><loc>http://x/o&apos;brien?a=1&amp;b=&quot;q&quot;"
               "&amp;lt;</loc></url></urlset>")
        rows = sm.parse_sitemaps(_df(spark, xml)).collect()
        # &amp;lt; is a double escape for the literal text &lt;
        assert rows[0].loc == 'http://x/o\'brien?a=1&b="q"&lt;'

    def test_binary_column(self, spark):
        a = sorted(map(tuple, sm.parse_sitemaps(_df(spark, XML)).collect()))
        b = sorted(
            map(tuple, sm.parse_sitemaps(_df(spark, XML, binary=True)).collect())
        )
        assert a == b

    def test_no_entries(self, spark):
        assert sm.parse_sitemaps(_df(spark, "<urlset></urlset>")).count() == 0
