"""Bucketed-table storage (sources/bucketed.py): the write-time shuffle
that makes doc-keyed joins and aggregations exchange-free."""

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.sources import bucketed as bk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    stats = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_words")
    )
    bk.write_bucketed(
        docs.select("doc_id", "lang", "source"),
        "t_docs_b", "doc_id", 8, path=str(root / "docs"),
        sort_cols=["doc_id"],
    )
    bk.write_bucketed(
        stats, "t_stats_b", "doc_id", 8, path=str(root / "stats"),
        sort_cols=["doc_id"],
    )
    yield "t_docs_b", "t_stats_b"
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_stats_b")


def _no_broadcast(spark):
    return spark.conf.get("spark.sql.autoBroadcastJoinThreshold")


class TestBucketedJoin:
    def test_join_has_zero_exchanges(self, spark, tables):
        t1, t2 = tables
        prev = _no_broadcast(spark)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bk.read_bucketed(spark, t1).join(
                bk.read_bucketed(spark, t2), "doc_id"
            )
            assert bk.bucketed_exchange_count(joined) == 0
            # the same join over plain parquet shuffles BOTH sides
            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            plain = docs.select("doc_id", "lang").join(
                docs.select("doc_id", F.length("text").alias("n")), "doc_id"
            )
            assert bk.bucketed_exchange_count(plain) >= 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_join_results_match_plain_join(self, spark, tables):
        t1, t2 = tables
        got = sorted(
            (r.doc_id, r.lang, r.n_words)
            for r in bk.read_bucketed(spark, t1)
            .join(bk.read_bucketed(spark, t2), "doc_id")
            .select("doc_id", "lang", "n_words")
            .collect()
        )
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        expected = sorted(
            (r.doc_id, r.lang, r.n_words)
            for r in docs.select(
                "doc_id", "lang",
                F.size(F.split(F.trim("text"), r"\s+")).alias("n_words"),
            ).collect()
        )
        assert got == expected

    def test_groupby_on_bucket_key_has_zero_exchanges(self, spark, tables):
        t1, _ = tables
        agg = bk.read_bucketed(spark, t1).groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert bk.bucketed_exchange_count(agg) == 0

    def test_groupby_on_other_key_still_shuffles(self, spark, tables):
        t1, _ = tables
        agg = bk.read_bucketed(spark, t1).groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        )
        assert bk.bucketed_exchange_count(agg) == 1

    def test_exchange_count_sees_single_partition_shuffle(self, spark):
        # regression: a global-aggregate Exchange SinglePartition was
        # not counted, certifying a shuffling plan as exchange-free
        from pyspark.sql import functions as FF

        df = spark.read.parquet(f"{SF_DIR}/documents.parquet").agg(
            FF.sum("n_chars")
        )
        assert bk.bucketed_exchange_count(df) >= 1

    def test_bad_bucket_count_raises(self, spark):
        df = spark.range(3)
        with pytest.raises(ValueError):
            bk.write_bucketed(df, "t_x", "id", 0)


class TestCompaction:
    def test_file_count_rows_and_uniformity(self, spark, tmp_path):
        from cmc_knowledge_graph_text2ttl_spark.sources.compaction import (
            compact_parquet,
            read_compacted,
        )

        # skewed input: one host owns half the rows, written as many
        # tiny fragments (the incremental-writer pathology)
        rows = [(f"http://hot.example/p{i}" if i % 2 == 0
                 else f"http://h{i % 37}.example/p{i}", i)
                for i in range(4000)]
        df = spark.createDataFrame(rows, ["url", "v"]).repartition(64)
        src = str(tmp_path / "frag")
        df.write.parquet(src)
        frag = spark.read.parquet(src)

        out = str(tmp_path / "compact")
        n = compact_parquet(frag, out, target_rows_per_file=500)
        assert n == 8

        import glob
        files = glob.glob(out + "/part-*.parquet")
        assert len(files) == n
        back = read_compacted(spark, out)
        assert back.count() == 4000
        assert sorted(r.v for r in back.collect()) == list(range(4000))
        # uniformity: despite the hot-host skew, md5-range partitioning
        # keeps every file within 2x of the target
        import pyarrow.parquet as pq
        sizes = sorted(pq.ParquetFile(f).metadata.num_rows for f in files)
        assert sizes[0] > 0 and sizes[-1] <= 1000

    def test_explicit_n_files_and_validation(self, spark, tmp_path):
        from cmc_knowledge_graph_text2ttl_spark.sources.compaction import (
            compact_parquet,
        )

        df = spark.createDataFrame([("u1", 1), ("u2", 2)], ["url", "v"])
        out = str(tmp_path / "two")
        assert compact_parquet(df, out, n_files=2) == 2
        with pytest.raises(ValueError, match="target_rows_per_file"):
            compact_parquet(df, out, target_rows_per_file=0)
