"""RSS/Atom feed parsing (operators/feeds.py)."""

from cmc_knowledge_graph_text2ttl_spark.operators import feeds as fd

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
<title>Chan</title><link>http://site/</link>
<item><title>First &amp; best</title><link>http://site/a</link>
  <pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>
<item><link> http://site/b </link></item>
<item><title>No link</title></item>
</channel></rss>"""

ATOM = """<feed xmlns="http://www.w3.org/2005/Atom">
<title>AFeed</title>
<entry><title>E1</title>
  <link rel="alternate" href="http://site/e1"/>
  <updated>2024-02-01T00:00:00Z</updated></entry>
<entry><title>E2</title><link href='http://site/e2'/>
  <published>2024-02-02T00:00:00Z</published></entry>
</feed>"""


def _df(spark, xml, binary=False):
    blob = xml.encode() if binary else xml
    schema = "feed_url string, feed_xml " + ("binary" if binary else "string")
    return spark.createDataFrame([("http://site/feed", blob)], schema)


class TestParseFeeds:
    def test_rss_items(self, spark):
        rows = sorted(
            ((r.kind, r.title, r.link, r.published)
             for r in fd.parse_feeds(_df(spark, RSS)).collect()),
            key=lambda t: tuple("" if v is None else v for v in t),
        )
        # channel-level <link> is outside <item>; link-less item dropped;
        # entity unescaped; whitespace trimmed
        assert rows == [
            ("rss", None, "http://site/b", None),
            ("rss", "First & best", "http://site/a",
             "Mon, 01 Jan 2024 00:00:00 GMT"),
        ]

    def test_atom_entries(self, spark):
        rows = sorted(
            (r.kind, r.title, r.link, r.published)
            for r in fd.parse_feeds(_df(spark, ATOM)).collect()
        )
        assert rows == [
            ("atom", "E1", "http://site/e1", "2024-02-01T00:00:00Z"),
            ("atom", "E2", "http://site/e2", "2024-02-02T00:00:00Z"),
        ]

    def test_binary_and_empty(self, spark):
        key = lambda t: tuple("" if v is None else str(v) for v in t)
        a = sorted(map(tuple, fd.parse_feeds(_df(spark, RSS)).collect()), key=key)
        b = sorted(
            map(tuple, fd.parse_feeds(_df(spark, RSS, binary=True)).collect()),
            key=key,
        )
        assert a == b
        assert fd.parse_feeds(_df(spark, "<rss><channel></channel></rss>")).count() == 0
