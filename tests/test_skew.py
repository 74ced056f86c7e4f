"""Skew handling: AQE skew-join splitting evidence + the salted
two-phase collect (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.operators import skew as sk


class TestSaltedCollect:
    def test_equals_direct_collect(self, spark):
        df = spark.createDataFrame(
            [(i % 7, f"v{i:03d}") for i in range(500)], "k int, v string"
        ).repartition(11)
        got = {
            r.key: list(r.values)
            for r in sk.salted_collect_list(df, "k", "v", n_salts=8).collect()
        }
        direct = {
            r.k: sorted(r.vs)
            for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
        }
        assert got == direct

    def test_hot_key_spreads_phase_one(self, spark):
        # one key carries 99% of rows; phase 1 must produce multiple
        # partial groups for it (bounded buffers), phase 2 one row
        rows = [(0, f"h{i}") for i in range(2000)] + [(1, "x")]
        df = spark.createDataFrame(rows, "k int, v string")
        partial = (
            df.withColumn(
                "_salt",
                F.conv(F.substring(F.md5(F.col("v")), 1, 8), 16, 10).cast(
                    "bigint"
                ) % 16,
            )
            .groupBy("k", "_salt")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        hot_groups = partial.where("k = 0").count()
        assert hot_groups > 8  # spread over most of the 16 salts
        out = sk.salted_collect_list(df, "k", "v", n_salts=16).collect()
        sizes = {r.key: len(r.values) for r in out}
        assert sizes == {0: 2000, 1: 1}

    def test_deterministic_across_salt_counts(self, spark):
        df = spark.createDataFrame(
            [(i % 3, i) for i in range(300)], "k int, v int"
        )
        a = sorted(
            (r.key, tuple(r.values))
            for r in sk.salted_collect_list(df, "k", "v", n_salts=2).collect()
        )
        b = sorted(
            (r.key, tuple(r.values))
            for r in sk.salted_collect_list(df, "k", "v", n_salts=32).collect()
        )
        assert a == b

    def test_value_column_named_differently(self, spark):
        # regression: the salt used to reference the ORIGINAL value
        # column name after the rename, so any value_col != "v" failed
        df = spark.createDataFrame(
            [("en", 3), ("en", 1), ("de", 2)], "lang string, doc_id int"
        )
        got = {
            r.key: list(r.values)
            for r in sk.salted_collect_list(df, "lang", "doc_id").collect()
        }
        assert got == {"en": [1, 3], "de": [2]}

    def test_bad_salts_raise(self, spark):
        df = spark.createDataFrame([(1, 1)], "k int, v int")
        with pytest.raises(ValueError):
            sk.salted_collect_list(df, "k", "v", n_salts=0)


class TestAqeSkewJoin:
    def test_skewed_join_is_split_by_aqe(self, spark):
        """A hot join key big enough to trip the (lowered) skew
        thresholds must show ``skew=true`` in the final adaptive plan —
        the runtime half of the engine's skew story (the static half is
        salting, above and in the CC loop)."""
        confs = {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
        }
        prev = {k: spark.conf.get(k) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            pad = "x" * 256
            fact = spark.range(0, 60_000).select(
                F.when(F.col("id") % 10 < 9, 0)
                .otherwise(F.col("id") % 97)
                .alias("k"),
                F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload"),
            )
            dim = spark.range(0, 97).select(
                F.col("id").alias("k"), F.col("id").alias("attr")
            )
            joined = fact.join(dim, "k")
            # materialize THIS DataFrame's own query execution: count()
            # would plan separately and leave this one un-finalized
            assert len(joined.collect()) == 60_000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "isFinalPlan=true" in plan
            assert "skew=true" in plan, plan[:2000]
        finally:
            for k, v in prev.items():
                spark.conf.set(k, v)


class TestSaltedCollectTopk:
    def _df(self, spark):
        rows = [("hot", (i * 31 + 7) % 1000) for i in range(400)]
        rows += [("cold", v) for v in (5, 3, 9)]
        return spark.createDataFrame(rows, "k string, v long").repartition(7)

    def test_matches_sort_and_slice(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.skew import (
            salted_collect_topk,
        )

        df = self._df(spark)
        got = {
            r.key: r.values
            for r in salted_collect_topk(df, "k", "v", k=10).collect()
        }
        want = {}
        for r in df.collect():
            want.setdefault(r.k, []).append(r.v)
        for key, vals in want.items():
            assert got[key] == sorted(vals)[:10], key

    def test_descending(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.skew import (
            salted_collect_topk,
        )

        df = self._df(spark)
        got = {
            r.key: r.values
            for r in salted_collect_topk(
                df, "k", "v", k=5, ascending=False
            ).collect()
        }
        want = {}
        for r in df.collect():
            want.setdefault(r.k, []).append(r.v)
        for key, vals in want.items():
            assert got[key] == sorted(vals, reverse=True)[:5], key

    def test_partitioning_invariance(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.skew import (
            salted_collect_topk,
        )

        df = self._df(spark)
        a = sorted(
            map(tuple, salted_collect_topk(df, "k", "v", k=7).collect())
        )
        b = sorted(
            map(
                tuple,
                salted_collect_topk(
                    df.repartition(31), "k", "v", k=7, n_salts=3
                ).collect(),
            )
        )
        assert a == b

    def test_k_validation(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.skew import (
            salted_collect_topk,
        )

        with pytest.raises(ValueError):
            salted_collect_topk(self._df(spark), "k", "v", k=0)
