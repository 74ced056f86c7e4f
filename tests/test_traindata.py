"""Training-sample construction ops (operators/traindata.py): sliding
chunking, deterministic split/sample, corpus vocabulary."""

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.operators import traindata as td

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def _chunks(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    out = td.chunk_documents(df, **kw).orderBy("id", "chunk_id").collect()
    return [(r.id, r.chunk_id, r.n_words, r.chunk_text) for r in out]


class TestChunkDocuments:
    def test_short_doc_single_chunk(self, spark):
        got = _chunks(spark, ["a b c"], window=5, stride=2)
        assert got == [(0, 0, 3, "a b c")]

    def test_exact_window_single_chunk(self, spark):
        got = _chunks(spark, ["a b c d e"], window=5, stride=2)
        assert got == [(0, 0, 5, "a b c d e")]

    def test_sliding_overlap_and_short_tail(self, spark):
        # 7 words, window 4 stride 2 → starts 0,2,4 (ceil((7-4)/2)=2)
        got = _chunks(spark, ["w0 w1 w2 w3 w4 w5 w6"], window=4, stride=2)
        assert got == [
            (0, 0, 4, "w0 w1 w2 w3"),
            (0, 1, 4, "w2 w3 w4 w5"),
            (0, 2, 3, "w4 w5 w6"),
        ]

    def test_window_plus_one_adds_tail_chunk(self, spark):
        got = _chunks(spark, ["a b c d e f"], window=5, stride=5)
        assert got == [(0, 0, 5, "a b c d e"), (0, 1, 1, "f")]

    def test_empty_doc_yields_no_chunks(self, spark):
        got = _chunks(spark, ["", "   ", "x"], window=4, stride=2)
        assert got == [(2, 0, 1, "x")]

    def test_every_word_covered_and_stride_spacing(self, spark, docs):
        out = td.chunk_documents(docs, window=32, stride=16)
        joined = (
            out.groupBy("id")
            .agg(
                F.sum("n_words").alias("sum_words"),
                F.max("chunk_id").alias("max_chunk"),
                F.count(F.lit(1)).alias("n_chunks"),
            )
            .join(
                docs.select(
                    F.col("doc_id").alias("id"),
                    F.size(F.split(F.trim("text"), r"\s+")).alias("n"),
                ),
                "id",
            )
        )
        bad = joined.where(
            (F.col("max_chunk") + 1 != F.col("n_chunks"))
            | (
                F.col("sum_words")
                != F.col("n") + 16 * F.greatest(F.lit(0), F.col("max_chunk"))
            )
        )
        # overlap accounting: each chunk after the first re-reads
        # window-stride=16 words, except nothing is re-read past the end
        # — with stride 16 and full windows the double-counted words are
        # exactly 16 per extra chunk
        assert bad.count() == 0

    def test_bad_params_raise(self, spark, docs):
        with pytest.raises(ValueError):
            td.chunk_documents(docs, window=0)
        with pytest.raises(ValueError):
            td.chunk_documents(docs, stride=0)


class TestAssignSplit:
    def test_partition_is_total_and_stable(self, spark, docs):
        out = td.assign_split(docs).cache()
        assert out.where(F.col("split").isNull()).count() == 0
        # pure function of the id: re-running yields identical assignment
        a = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
        b = {
            r.doc_id: r.split
            for r in td.assign_split(docs).select("doc_id", "split").collect()
        }
        assert a == b
        out.unpersist()

    def test_weights_roughly_respected(self, spark, docs):
        out = td.assign_split(docs, weights={"train": 80, "val": 10, "test": 10})
        counts = {r.split: r.cnt for r in out.groupBy("split").agg(
            F.count(F.lit(1)).alias("cnt")).collect()}
        n = sum(counts.values())
        assert set(counts) == {"train", "val", "test"}
        assert 0.7 < counts["train"] / n < 0.9

    def test_split_membership_survives_corpus_growth(self, spark, docs):
        # assignment of a doc must not depend on which other docs exist
        half = docs.where(F.col("doc_id") % 2 == 0)
        full_map = {
            r.doc_id: r.split
            for r in td.assign_split(docs).select("doc_id", "split").collect()
        }
        for r in td.assign_split(half).select("doc_id", "split").collect():
            assert full_map[r.doc_id] == r.split

    def test_bad_weights_raise(self, spark, docs):
        with pytest.raises(ValueError):
            td.assign_split(docs, weights={"train": 50, "val": 10})


class TestDeterministicSample:
    def test_rate_and_reproducibility(self, spark, docs):
        s1 = sorted(r.doc_id for r in td.deterministic_sample(docs, 2_500).collect())
        s2 = sorted(r.doc_id for r in td.deterministic_sample(docs, 2_500).collect())
        assert s1 == s2
        n = docs.count()
        assert 0.15 * n < len(s1) < 0.35 * n

    def test_nested_rates(self, spark, docs):
        # a smaller sample is a subset of a bigger one (same hash order)
        small = {r.doc_id for r in td.deterministic_sample(docs, 1_000).collect()}
        big = {r.doc_id for r in td.deterministic_sample(docs, 5_000).collect()}
        assert small <= big

    def test_bounds(self, spark, docs):
        assert td.deterministic_sample(docs, 0).count() == 0
        assert td.deterministic_sample(docs, 10_000).count() == docs.count()
        with pytest.raises(ValueError):
            td.deterministic_sample(docs, 10_001)


class TestPackChunks:
    def _toy(self, spark):
        rows = [
            (0, 0, 6), (0, 1, 6), (1, 0, 3), (2, 0, 5), (2, 1, 2),
        ]
        return spark.createDataFrame(
            rows, "id int, chunk_id int, n_words int"
        )

    def test_hand_computed_bins(self, spark):
        out = {
            (r.id, r.chunk_id): (r.bin_id, r.offset_in_bin)
            for r in td.pack_chunks(self._toy(spark), capacity=8).collect()
        }
        # prefix sums: 0,6,12,15,20 → bins 0,0,1,1,2 offsets 0,6,4,7,4
        assert out == {
            (0, 0): (0, 0),
            (0, 1): (0, 6),
            (1, 0): (1, 4),
            (2, 0): (1, 7),
            (2, 1): (2, 4),
        }

    def test_parallelism_invariant(self, spark, docs):
        chunks = td.chunk_documents(docs, window=16, stride=16)
        a = sorted(
            (r.id, r.chunk_id, r.bin_id, r.offset_in_bin)
            for r in td.pack_chunks(chunks, 1024, n_parts=1).collect()
        )
        b = sorted(
            (r.id, r.chunk_id, r.bin_id, r.offset_in_bin)
            for r in td.pack_chunks(chunks, 1024, n_parts=16).collect()
        )
        assert a == b and len(a) > 0

    def test_total_token_conservation(self, spark, docs):
        # the last chunk's prev + weight equals the total token count
        chunks = td.chunk_documents(docs, window=16, stride=16)
        packed = td.pack_chunks(chunks, 512)
        total = chunks.agg(F.sum("n_words")).collect()[0][0]
        last = (
            packed.orderBy(F.desc("bin_id"), F.desc("offset_in_bin"))
            .limit(1)
            .collect()[0]
        )
        assert last.bin_id * 512 + last.offset_in_bin + last.n_words == total

    def test_empty_input(self, spark):
        empty = spark.createDataFrame([], "id int, chunk_id int, n_words int")
        assert td.pack_chunks(empty, 8).count() == 0

    def test_bad_capacity_raises(self, spark):
        with pytest.raises(ValueError):
            td.pack_chunks(self._toy(spark), 0)


class TestPackChunksProperty:
    def test_random_streams_match_naive_cumsum(self, spark):
        """Distributed prefix-sum == single-process cumulative sum on a
        batch of random chunk streams (one Spark job for the whole
        batch; hypothesis-style coverage without per-example jobs)."""
        import random

        rng = random.Random(20260816)
        cases = []
        for case in range(25):
            n_chunks = rng.randint(0, 40)
            cases.append(
                [
                    (case, i, rng.randint(1, 50))
                    for i in range(n_chunks)
                ]
            )
        flat = [row for case in cases for row in case]
        if not flat:
            return
        cap = 17
        df = spark.createDataFrame(
            flat, "stream int, chunk_id int, n_words int"
        ).repartition(7)
        got = {
            (r.stream, r.chunk_id): (r.bin_id, r.offset_in_bin)
            for r in td.pack_chunks(
                df, cap, id_col="stream", n_parts=5
            ).collect()
        }
        # naive: one global cumsum in (stream, chunk_id) order
        prev = 0
        expected = {}
        for stream, chunk_id, w in sorted(flat):
            expected[(stream, chunk_id)] = (prev // cap, prev % cap)
            prev += w
        assert got == expected


class TestBinManifests:
    def test_manifest_contents(self, spark):
        rows = [(0, 0, 6), (0, 1, 6), (1, 0, 3), (2, 0, 5), (2, 1, 2)]
        chunks = spark.createDataFrame(rows, "id int, chunk_id int, n_words int")
        packed = td.pack_chunks(chunks, capacity=8)
        got = {
            r.bin_id: (r.n_chunks, r.n_tokens, list(r.spans))
            for r in td.bin_manifests(packed, capacity=8).collect()
        }
        # prefix sums 0,6,12,15,20 → bins 0,0,1,1,2 offsets 0,6,4,7,4
        assert got == {
            0: (2, 12, ["0:0@0", "0:1@6"]),
            1: (2, 8, ["1:0@4", "2:0@7"]),
            2: (1, 2, ["2:1@4"]),
        }

    def test_token_totals_conserved(self, spark, docs):
        chunks = td.chunk_documents(docs, window=16, stride=16)
        packed = td.pack_chunks(chunks, 256)
        manifests = td.bin_manifests(packed, 256)
        total_chunks = chunks.count()
        total_tokens = chunks.agg(F.sum("n_words")).collect()[0][0]
        agg = manifests.agg(
            F.sum("n_chunks").alias("c"), F.sum("n_tokens").alias("t")
        ).collect()[0]
        assert (agg.c, agg.t) == (total_chunks, total_tokens)

    def test_bad_capacity_raises(self, spark):
        empty = spark.createDataFrame(
            [], "id int, chunk_id int, n_words int, bin_id long, offset_in_bin int"
        )
        with pytest.raises(ValueError):
            td.bin_manifests(empty, 0)


class TestStratifiedSample:
    def test_per_stratum_cap_and_determinism(self, spark, docs):
        out = td.stratified_sample(docs, "lang", k=20)
        sizes = {r.lang: r.n for r in out.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        full = {r.lang: r.n for r in docs.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        for lang, n in sizes.items():
            assert n == min(20, full[lang])
        again = td.stratified_sample(docs, "lang", k=20)
        assert sorted(r.doc_id for r in out.collect()) == sorted(
            r.doc_id for r in again.collect()
        )

    def test_partitioning_invariant(self, spark, docs):
        a = sorted(
            r.doc_id
            for r in td.stratified_sample(docs.repartition(1), "source", 5).collect()
        )
        b = sorted(
            r.doc_id
            for r in td.stratified_sample(docs.repartition(13), "source", 5).collect()
        )
        assert a == b

    def test_bad_k_raises(self, spark, docs):
        with pytest.raises(ValueError):
            td.stratified_sample(docs, "lang", 0)


class TestUnigramSurprisal:
    def test_hand_computed(self, spark):
        # corpus: "a a b" + "a c" → T=5, tf: a=3 b=1 c=1
        # surprisal(scale=10): a=(50 div 3)=16, b=50, c=50
        # doc0: (2*16 + 1*50) div 3 = 82 div 3 = 27 ; doc1: (16+50) div 2 = 33
        df = spark.createDataFrame(
            [(0, "a a b"), (1, "a c")], "doc_id int, text string"
        )
        got = {
            r.id: (r.n_tokens, r.surprisal_scaled)
            for r in td.unigram_surprisal(df, scale=10).collect()
        }
        assert got == {0: (3, 27), 1: (2, 33)}

    def test_rare_token_doc_scores_higher(self, spark, docs):
        from pyspark.sql import Row

        planted = docs.select("doc_id", "text").union(
            docs.sparkSession.createDataFrame(
                [Row(doc_id=999_999, text="zzqx vvwk qqjy xxzv wwvv")]
            )
        )
        out = td.unigram_surprisal(planted).cache()
        gibberish = out.where(F.col("id") == 999_999).collect()[0]
        mean_rest = out.where(F.col("id") != 999_999).agg(
            F.avg("surprisal_scaled")
        ).collect()[0][0]
        assert gibberish.surprisal_scaled > 10 * mean_rest
        out.unpersist()

    def test_broadcast_variant_equal(self, spark, docs):
        a = sorted(map(tuple, td.unigram_surprisal(docs).collect()))
        b = sorted(
            map(tuple, td.unigram_surprisal(docs, broadcast_vocab=True).collect())
        )
        assert a == b


class TestEmbedDocuments:
    def test_hand_computed_against_python(self, spark):
        import hashlib

        def md5i(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        texts = ["alpha beta alpha", "gamma"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
        )
        got = {
            r.id: list(r.embedding)
            for r in td.embed_documents(df, dim=8).collect()
        }
        for i, t in enumerate(texts):
            exp = [0] * 8
            for tok in t.split():
                b = md5i(tok) % 8
                s = 1 if md5i("s" + tok) % 2 == 0 else -1
                exp[b] += s
            assert got[i] == exp, (i, got[i], exp)

    def test_partitioning_invariant_and_dim(self, spark, docs):
        e1 = sorted(
            (r.id, tuple(r.embedding))
            for r in td.embed_documents(docs.repartition(1), dim=16).collect()
        )
        e2 = sorted(
            (r.id, tuple(r.embedding))
            for r in td.embed_documents(docs.repartition(9), dim=16).collect()
        )
        assert e1 == e2
        assert all(len(v) == 16 for _, v in e1)

    def test_feeds_cosine_topk(self, spark, docs):
        from cmc_knowledge_graph_text2ttl_spark.operators import similarity as sim

        emb = td.embed_documents(docs, dim=16).select(
            F.col("id").alias("vec_id"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
        q = [float(x) for x in emb.first().embedding]
        top = sim.cosine_topk(emb, q, k=3).collect()
        assert len(top) == 3

    def test_bad_dim_raises(self, spark, docs):
        with pytest.raises(ValueError):
            td.embed_documents(docs, dim=0)


class TestCorpusVocabulary:
    def test_counts_against_python(self, spark):
        df = spark.createDataFrame(
            [(0, "a b a"), (1, "b c"), (2, "a")], "doc_id int, text string"
        )
        got = {
            r.token: (r.doc_freq, r.term_freq)
            for r in td.corpus_vocabulary(df, top_k=10).collect()
        }
        assert got == {"a": (2, 3), "b": (2, 2), "c": (1, 1)}

    def test_topk_order_and_tiebreak(self, spark):
        df = spark.createDataFrame(
            [(0, "x y z z"), (1, "y x")], "doc_id int, text string"
        )
        rows = td.corpus_vocabulary(df, top_k=2).collect()
        # x/y/z all have tf 2 → tie broken by token ascending
        assert [r.token for r in rows] == ["x", "y"]

    def test_topk_plan_is_take_ordered(self, spark, docs):
        plan = td.corpus_vocabulary(docs, top_k=50)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestShardManifest:
    def test_deterministic_and_complete(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.traindata import (
            shard_manifest,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        m1 = {r.shard: (r.n_docs, r.total_chars, r.id_digest)
              for r in shard_manifest(docs, 4).collect()}
        m2 = {r.shard: (r.n_docs, r.total_chars, r.id_digest)
              for r in shard_manifest(docs.repartition(13), 4).collect()}
        assert m1 == m2  # partition-independent
        assert sum(v[0] for v in m1.values()) == docs.count()
        assert len(m1) <= 4 and all(0 <= s < 4 for s in m1)

    def test_digest_tracks_membership(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.traindata import (
            shard_manifest,
        )

        a = spark.createDataFrame([(1, "x"), (2, "yy")], ["doc_id", "text"])
        b = spark.createDataFrame([(1, "x"), (3, "zzz")], ["doc_id", "text"])
        da = {r.shard: r.id_digest for r in shard_manifest(a, 1).collect()}
        db = {r.shard: r.id_digest for r in shard_manifest(b, 1).collect()}
        assert da != db

    def test_two_level_matches_python_model(self, spark):
        # the two-level digest is exactly md5 over the sub-bucket md5s
        # (sub order), each over its own sorted comma-joined ids
        import hashlib

        from cmc_knowledge_graph_text2ttl_spark.operators.traindata import (
            shard_manifest,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = docs.select("doc_id", "text").collect()

        def h32(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        model = {}
        for r in rows:
            i = str(r.doc_id)
            model.setdefault(h32(i) % 4, {}).setdefault(
                h32("sub" + i) % 8, []
            ).append(i)
        expect = {}
        for shard, subs in model.items():
            subd = [
                hashlib.md5(",".join(sorted(ids)).encode()).hexdigest()
                for _, ids in sorted(subs.items())
            ]
            expect[shard] = hashlib.md5(",".join(subd).encode()).hexdigest()
        got = {r.shard: r.id_digest
               for r in shard_manifest(docs, 4, sub_buckets=8).collect()}
        assert got == expect

    def test_hot_shard_buffers_bounded(self, spark):
        # n_shards=1 routes EVERYTHING to one shard — the flat digest's
        # worst case. With sub_buckets the level-1 aggregation must
        # spread the ids over (shard, sub) keys, and the result must be
        # partition-independent and equal regardless of sub_buckets
        # count... for n_docs/total_chars; digests differ by scheme but
        # each must be internally stable.
        from cmc_knowledge_graph_text2ttl_spark.operators.traindata import (
            shard_manifest,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        one = shard_manifest(docs, 1, sub_buckets=32)
        m1 = {r.shard: (r.n_docs, r.total_chars, r.id_digest)
              for r in one.collect()}
        m2 = {r.shard: (r.n_docs, r.total_chars, r.id_digest)
              for r in shard_manifest(
                  docs.repartition(17), 1, sub_buckets=32).collect()}
        assert m1 == m2 and m1[0][0] == docs.count()
        # the level-1 plan aggregates on (shard, sub), not shard alone
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "sub" in plan

    def test_flat_option_preserved(self, spark):
        import hashlib

        from cmc_knowledge_graph_text2ttl_spark.operators.traindata import (
            shard_manifest,
        )

        a = spark.createDataFrame(
            [(1, "x"), (2, "yy"), (3, "z")], ["doc_id", "text"])
        got = shard_manifest(a, 1, sub_buckets=None).collect()[0]
        assert got.id_digest == hashlib.md5(b"1,2,3").hexdigest()


class TestPerplexityBuckets:
    def test_value_level_cut_hand_computed(self, spark):
        # one lang, scores force the histogram cut: 6 docs, scale=10
        # corpus "a"x4 + "b"x2 → T=6, surprisal: a=(60 div 4)=15, b=30
        # docs: 4x "a" (score 15), 2x "b" (score 30)
        # n_below for score 15 = 0 → bucket 1+0*3//6 = 1 (head)
        # n_below for score 30 = 4 → bucket 1+4*3//6 = 3 (tail)
        df = spark.createDataFrame(
            [(i, "a", "en") for i in range(4)]
            + [(i + 4, "b", "en") for i in range(2)],
            "doc_id int, text string, lang string",
        )
        out = {
            r.id: (r.bucket, r.label)
            for r in td.perplexity_buckets(df, scale=10).collect()
        }
        assert all(out[i] == (1, "head") for i in range(4))
        assert all(out[i] == (3, "tail") for i in (4, 5))

    def test_ties_share_bucket_and_masses_near_equal(self, spark, docs):
        out = td.perplexity_buckets(docs).cache()
        # value ties never straddle buckets
        assert (
            out.groupBy("lang", "surprisal_scaled")
            .agg(F.countDistinct("bucket").alias("nb"))
            .where("nb > 1")
            .count()
            == 0
        )
        # per-lang masses within one value-run of each other
        sizes = out.groupBy("lang", "bucket").count().collect()
        per_lang = {}
        for r in sizes:
            per_lang.setdefault(r.lang, {})[r.bucket] = r["count"]
        for lang, b in per_lang.items():
            assert set(b) == {1, 2, 3}
            n = sum(b.values())
            for k in b.values():
                assert abs(k - n / 3) <= max(3, n * 0.2)
        out.unpersist()

    def test_partition_invariant(self, spark, docs):
        a = sorted(map(tuple, td.perplexity_buckets(docs).collect()))
        b = sorted(
            map(tuple, td.perplexity_buckets(docs.repartition(7)).collect())
        )
        assert a == b

    def test_bad_n_buckets(self, spark, docs):
        with pytest.raises(ValueError):
            td.perplexity_buckets(docs, n_buckets=0)


class TestMixtureSample:
    def _naive(self, rows, weights, total):
        # reference rule: md5 order, keep while exclusive prefix < budget
        import hashlib

        denom = sum(weights.values())
        out = []
        for dom, w in weights.items():
            budget = total * w // denom
            docs = [r for r in rows if r[1] == dom]
            docs.sort(
                key=lambda r: (
                    int(hashlib.md5(str(r[0]).encode()).hexdigest()[:8], 16),
                    r[0],
                )
            )
            prev = 0
            for doc_id, _, n_tok in docs:
                if prev < budget:
                    out.append((doc_id, dom, n_tok))
                prev += n_tok
        return sorted(out)

    def _rows(self, docs):
        return [
            (r.doc_id, r.source, len(r.text.split()) if r.text.strip() else 0)
            for r in docs.select("doc_id", "source", "text").collect()
        ]

    def test_matches_naive_rule(self, spark, docs):
        weights = {"src0": 3, "src1": 1, "src2": 1}
        got = sorted(
            (r.id, r.domain, r.n_tok)
            for r in td.mixture_sample(docs, weights, 1500).collect()
        )
        assert got == self._naive(self._rows(docs), weights, 1500)

    def test_two_level_equals_single_bucket(self, spark, docs):
        # n_coarse=1 puts EVERY doc through the fine boundary window —
        # the coarse path must change nothing
        weights = {"src0": 1, "src3": 2}
        a = sorted(
            map(tuple, td.mixture_sample(docs, weights, 900).collect())
        )
        b = sorted(
            map(
                tuple,
                td.mixture_sample(docs, weights, 900, n_coarse=1).collect(),
            )
        )
        assert a == b

    def test_unlisted_domains_dropped_and_crossing_doc_included(
        self, spark, docs
    ):
        out = td.mixture_sample(docs, {"src0": 1}, 100).collect()
        assert {r.domain for r in out} == {"src0"}
        total = sum(r.n_tok for r in out)
        # crossing doc included: total reaches the budget (src0 has
        # far more than 100 tokens at sf0.001) but removing the last
        # md5-ordered doc drops it below
        assert total >= 100
        rows = self._rows(docs)
        naive = self._naive(rows, {"src0": 1}, 100)
        assert sorted((r.id, r.domain, r.n_tok) for r in out) == naive

    def test_zero_budget_and_validation(self, spark, docs):
        assert td.mixture_sample(docs, {"src0": 1}, 0).count() == 0
        with pytest.raises(ValueError):
            td.mixture_sample(docs, {}, 10)
        with pytest.raises(ValueError):
            td.mixture_sample(docs, {"a": -1}, 10)
        with pytest.raises(ValueError):
            td.mixture_sample(docs, {"a": 1}, -5)

    def test_partition_invariant(self, spark, docs):
        weights = {"src0": 2, "src1": 1}
        a = sorted(
            map(tuple, td.mixture_sample(docs, weights, 700).collect())
        )
        b = sorted(
            map(
                tuple,
                td.mixture_sample(docs.repartition(9), weights, 700).collect(),
            )
        )
        assert a == b
