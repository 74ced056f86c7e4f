"""Recrawl operators (operators/recrawl.py)."""

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.operators import recrawl as rc


class TestCrawlDelta:
    def test_all_four_statuses(self, spark):
        old = spark.createDataFrame(
            [("u1", "same"), ("u2", "before"), ("u3", "bye")],
            "url string, content string",
        )
        new = spark.createDataFrame(
            [("u1", "same"), ("u2", "after"), ("u4", "hello")],
            "url string, content string",
        )
        got = {r.url: r.status for r in rc.crawl_delta(old, new).collect()}
        assert got == {
            "u1": "unchanged",
            "u2": "changed",
            "u3": "gone",
            "u4": "new",
        }

    def test_null_content_is_presence_not_absence(self, spark):
        # regression: md5(NULL) is NULL, which used to read as "row
        # absent" — a live URL with a failed fetch was tombstoned
        old = spark.createDataFrame(
            [("u1", None), ("u2", "x"), ("u3", None)],
            "url string, content string",
        )
        new = spark.createDataFrame(
            [("u1", "now"), ("u2", None), ("u3", None)],
            "url string, content string",
        )
        got = {r.url: r.status for r in rc.crawl_delta(old, new).collect()}
        assert got == {"u1": "changed", "u2": "changed", "u3": "unchanged"}

    def test_binary_content_column(self, spark):
        old = spark.createDataFrame(
            [("u", bytearray(b"\x00\xffbin"))], "url string, content binary"
        )
        new = spark.createDataFrame(
            [("u", bytearray(b"\x00\xffbin"))], "url string, content binary"
        )
        assert rc.crawl_delta(old, new).collect()[0].status == "unchanged"


class TestFetchBatches:
    def _urls(self, spark, n=100, hosts=4):
        return spark.createDataFrame(
            [(f"http://h{i % hosts}/p{i}", f"h{i % hosts}") for i in range(n)],
            "url string, host string",
        )

    def test_batch_sizes_and_positions(self, spark):
        out = rc.fetch_batches(self._urls(spark), batch_size=7).collect()
        per = {}
        for r in out:
            per.setdefault((r.host, r.batch_id), []).append(r.pos_in_batch)
        for (host, bid), positions in per.items():
            assert sorted(positions) == list(range(len(positions)))
            assert len(positions) <= 7
        # 25 urls per host → batches 0..3 with the last holding 4
        sizes = sorted(len(v) for k, v in per.items() if k[0] == "h0")
        assert sizes == [4, 7, 7, 7]

    def test_partitioning_invariant(self, spark):
        urls = self._urls(spark)
        a = sorted(map(tuple, rc.fetch_batches(urls.repartition(1), 5).collect()))
        b = sorted(map(tuple, rc.fetch_batches(urls.repartition(13), 5).collect()))
        assert a == b

    def test_bad_batch_size_raises(self, spark):
        with pytest.raises(ValueError):
            rc.fetch_batches(self._urls(spark, 5), 0)


class TestCrawlFrontier:
    def _frontier(self, spark, **kw):
        from cmc_knowledge_graph_text2ttl_spark.operators.recrawl import (
            crawl_frontier,
        )

        delta = spark.createDataFrame([
            ("u1", "new"), ("u2", "changed"), ("u3", "unchanged"),
            ("u4", "gone"), ("u5", "changed"),
        ], ["url", "status"])
        ranks = spark.createDataFrame([
            ("u2", 2_000_000), ("u3", 5_000_000), ("u4", 9_000_000),
            ("u5", 500_000),
        ], ["url", "rank"])
        return {r.url: r for r in crawl_frontier(delta, ranks, **kw).collect()}

    def test_priorities_and_gone_excluded(self, spark):
        got = self._frontier(spark)
        assert "u4" not in got                      # gone -> tombstone path
        assert got["u1"].rank == 1_000_000          # default for unranked new
        assert got["u1"].priority == 3 * 1_000_000
        assert got["u2"].priority == 2 * 2_000_000
        assert got["u3"].priority == 1 * 5_000_000
        assert got["u5"].priority == 2 * 500_000

    def test_custom_weights_drop_unlisted(self, spark):
        got = self._frontier(spark, weights={"changed": 10})
        assert set(got) == {"u2", "u5"}
        assert got["u2"].priority == 10 * 2_000_000

    def test_empty_weights_raise(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.recrawl import (
            crawl_frontier,
        )

        df = spark.createDataFrame([("u", "new")], ["url", "status"])
        with pytest.raises(ValueError, match="weights"):
            crawl_frontier(df, df.select("url", F.lit(1).alias("rank")),
                           weights={})


class TestChangeRates:
    def _run(self, spark, rows, **kw):
        from cmc_knowledge_graph_text2ttl_spark.operators.recrawl import (
            change_rates,
        )

        df = spark.createDataFrame(rows, ["url", "gen", "digest"])
        return {r.url: r for r in change_rates(df, **kw).collect()}

    def test_rates_and_buckets(self, spark):
        rows = [
            # u1: 4 gens, changes at g1 and g3 -> 2/3 = 66% hot
            ("u1", 0, "a"), ("u1", 1, "b"), ("u1", 2, "b"), ("u1", 3, "c"),
            # u2: 4 gens, never changes -> 0% cold
            ("u2", 0, "x"), ("u2", 1, "x"), ("u2", 2, "x"), ("u2", 3, "x"),
            # u3: 5 gens, 1 change -> 25% warm
            ("u3", 0, "p"), ("u3", 1, "p"), ("u3", 2, "q"),
            ("u3", 3, "q"), ("u3", 4, "q"),
            # u4: single generation -> rate 0, cold
            ("u4", 7, "z"),
        ]
        got = self._run(spark, rows)
        assert (got["u1"].n_changes, got["u1"].change_rate_pct,
                got["u1"].crawl_bucket) == (2, 66, "hot")
        assert (got["u2"].change_rate_pct, got["u2"].crawl_bucket) == (
            0, "cold")
        assert (got["u3"].change_rate_pct, got["u3"].crawl_bucket) == (
            25, "warm")
        assert (got["u4"].n_gens, got["u4"].change_rate_pct,
                got["u4"].crawl_bucket) == (1, 0, "cold")

    def test_custom_column_names_and_thresholds(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.recrawl import (
            change_rates,
        )

        df = spark.createDataFrame(
            [("u", 0, "a"), ("u", 1, "b")], ["link", "generation", "h"])
        got = change_rates(df, url_col="link", gen_col="generation",
                           digest_col="h", hot_pct=100, warm_pct=0).collect()
        assert got[0].change_rate_pct == 100 and got[0].crawl_bucket == "hot"

    def test_bad_thresholds_raise(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.recrawl import (
            change_rates,
        )

        df = spark.createDataFrame([("u", 0, "a")], ["url", "gen", "digest"])
        with pytest.raises(ValueError, match="warm_pct"):
            change_rates(df, hot_pct=10, warm_pct=50)

    def test_partition_invariance(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.recrawl import (
            change_rates,
        )

        rows = [(f"u{i % 40}", g, f"d{(i * 7 + g * g) % 5}")
                for i in range(40) for g in range(6)]
        df = spark.createDataFrame(rows, ["url", "gen", "digest"])
        a = sorted(map(tuple, change_rates(df).collect()))
        b = sorted(map(tuple, change_rates(df.repartition(17)).collect()))
        assert a == b


class TestPoliteSchedule:
    def test_delays_join_and_not_before(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.recrawl import (
            polite_schedule,
        )

        urls = spark.createDataFrame(
            [(f"http://h{i % 2}/p{i}", f"h{i % 2}") for i in range(8)],
            ["url", "host"])
        delays = spark.createDataFrame(
            [("h0", 5000)], ["host", "delay_ms"])  # h1 falls back to default
        got = {r.url: r for r in
               polite_schedule(urls, 2, delays, default_ms=750).collect()}
        for r in got.values():
            expect = 5000 if r.host == "h0" else 750
            assert r.delay_ms == expect
            assert r.not_before_ms == r.batch_id * expect
        # 4 urls per host, batch_size 2 -> batches 0 and 1
        assert {r.batch_id for r in got.values()} == {0, 1}

    def test_crawl_delay_agent_groups(self):
        from cmc_knowledge_graph_text2ttl_spark.operators.robots import (
            parse_crawl_delay,
        )

        txt = ("User-agent: fastbot\nCrawl-delay: 0.1\n\n"
               "User-agent: *\nCrawl-delay: 4\nDisallow: /private\n")
        assert parse_crawl_delay(txt, "fastbot") == 100
        assert parse_crawl_delay(txt, "otherbot") == 4000
        assert parse_crawl_delay("no directives here") is None

    def test_crawl_delays_dimension(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.robots import (
            crawl_delays,
        )

        df = spark.createDataFrame([
            ("a.example", "User-agent: *\nCrawl-delay: 2.5"),
            ("b.example", "User-agent: *\nDisallow: /"),
            ("c.example", None),
        ], ["host", "robots_txt"])
        got = {r.host: r.delay_ms for r in crawl_delays(df).collect()}
        assert got == {"a.example": 2500, "b.example": 1000,
                       "c.example": 1000}


class TestHostGraph:
    def test_aggregation_and_internal_flag(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import (
            host_graph,
        )

        edges = spark.createDataFrame([
            ("http://a.com/1", "http://b.com/x"),
            ("http://a.com/1", "http://b.com/y"),
            ("http://a.com/2", "http://b.com/x"),
            ("http://a.com/1", "http://a.com/2"),   # internal
            ("http://c.com/p", "http://b.com/x"),
        ], ["src", "dst"])
        got = {(r.src_host, r.dst_host): r for r in
               host_graph(edges).collect()}
        ab = got[("a.com", "b.com")]
        assert (ab.n_links, ab.n_src_pages, ab.is_internal) == (3, 2, False)
        aa = got[("a.com", "a.com")]
        assert (aa.n_links, aa.n_src_pages, aa.is_internal) == (1, 1, True)
        assert got[("c.com", "b.com")].n_links == 1

    def test_partition_invariance(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.links import (
            host_graph,
        )

        rows = [(f"http://h{i % 5}.x/p{i}", f"http://h{(i * 3) % 7}.x/q{i}")
                for i in range(300)]
        df = spark.createDataFrame(rows, ["src", "dst"])
        a = sorted(map(tuple, host_graph(df).collect()))
        b = sorted(map(tuple, host_graph(df.repartition(13)).collect()))
        assert a == b
