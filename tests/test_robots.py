"""robots.txt policy evaluation (operators/robots.py)."""

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.operators import robots as R

ROBOTS = """
# comment line
User-agent: specialbot
Disallow: /secret

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
Disallow: /wild*card
Crawl-delay: 10
"""


class TestParse:
    def test_star_group_rules(self):
        rules = R.parse_robots(ROBOTS)
        # empty Disallow and the wildcard rule are dropped
        assert rules == [(False, "/private"), (True, "/private/ok")]

    def test_exact_agent_group_wins(self):
        assert R.parse_robots(ROBOTS, agent="SpecialBot") == [(False, "/secret")]

    def test_unknown_agent_falls_back_to_star(self):
        assert R.parse_robots(ROBOTS, agent="otherbot") == [
            (False, "/private"),
            (True, "/private/ok"),
        ]

    def test_no_groups_allows_everything(self):
        assert R.parse_robots("Sitemap: http://x/map.xml") == []

    def test_multi_agent_run_shares_rules(self):
        txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert R.parse_robots(txt, agent="b") == [(False, "/x")]


class TestDecision:
    @pytest.fixture()
    def rules(self, spark):
        robots = spark.createDataFrame(
            [("h1", ROBOTS), ("h2", "User-agent: *\nDisallow: /\n")],
            "host string, robots_txt string",
        )
        return R.robots_rules(robots)

    def test_longest_rule_and_allow_tiebreak(self, spark, rules):
        urls = spark.createDataFrame(
            [
                ("http://h1/public/page",),
                ("http://h1/private/page",),
                ("http://h1/private/ok/page",),
                ("http://h1/",),
                ("http://h2/anything",),
                ("http://unknown-host/x",),
            ],
            "url string",
        )
        got = {r.url: r.allowed for r in R.robots_allowed(urls, rules).collect()}
        assert got == {
            "http://h1/public/page": True,
            "http://h1/private/page": False,
            "http://h1/private/ok/page": True,   # longer Allow wins
            "http://h1/": True,
            "http://h2/anything": False,          # Disallow: / blocks all
            "http://unknown-host/x": True,        # no policy → allowed
        }

    def test_url_without_path_gets_root(self, spark, rules):
        urls = spark.createDataFrame([("http://h2",)], "url string")
        got = R.robots_allowed(urls, rules).collect()[0]
        assert got.allowed is False  # "/" matches Disallow: /

    def test_host_and_scheme_case_insensitive(self, spark, rules):
        # regression: 'HTTP://H2/x' used to bypass the Disallow: / rule
        urls = spark.createDataFrame(
            [("HTTP://H2/anything",), ("http://H1/private/page",)], "url string"
        )
        got = {r.url: r.allowed for r in R.robots_allowed(urls, rules).collect()}
        assert got == {
            "HTTP://H2/anything": False,
            "http://H1/private/page": False,
        }

    def test_every_url_appears_once(self, spark, rules):
        urls = spark.createDataFrame(
            [(f"http://h1/p{i}",) for i in range(20)], "url string"
        ).repartition(7)
        out = R.robots_allowed(urls, rules)
        assert out.count() == 20
        assert out.select("url").distinct().count() == 20


class TestAuthorityNormalization:
    @pytest.fixture()
    def rules(self, spark):
        robots = spark.createDataFrame(
            [("example.com", "User-agent: *\nDisallow: /secret\n")],
            "host string, robots_txt string",
        )
        return R.robots_rules(robots)

    def test_port_and_userinfo_stripped(self, spark, rules):
        # regression (round-4 ADVICE): ':port' / 'user@' in the authority
        # used to miss the bare-hostname rule key → false 'allowed'
        urls = spark.createDataFrame(
            [
                ("http://example.com:8080/secret",),
                ("http://alice@example.com/secret",),
                ("http://alice:pw@example.com:8443/secret",),
                ("http://example.com/secret",),
                ("http://example.com:8080/open",),
            ],
            "url string",
        )
        got = {r.url: r.allowed for r in R.robots_allowed(urls, rules).collect()}
        assert got == {
            "http://example.com:8080/secret": False,
            "http://alice@example.com/secret": False,
            "http://alice:pw@example.com:8443/secret": False,
            "http://example.com/secret": False,
            "http://example.com:8080/open": True,
        }
