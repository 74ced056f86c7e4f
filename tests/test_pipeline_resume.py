"""Checkpoint/lineage/resume tests (north_rule resumability clause).

Simulated interruption: run the pipeline on a PARTIAL corpus slice (as if
the job died after some buckets committed), then resume with the full
corpus under the same run_scope. Asserts: no duplicate lineage completions,
skipped buckets are not reprocessed, and the final triples equal a clean
uninterrupted run.
"""

import os

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.plans import KgPipeline
from cmc_knowledge_graph_text2ttl_spark.sinks import triples_to_nt_lines
from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df

N = 120


def nt(df):
    rows = [
        (r.subj, r.pred, r.obj_kind, r.obj_lexical, r.obj_lang, r.obj_datatype)
        for r in df.collect()
    ]
    return triples_to_nt_lines(rows)


@pytest.fixture()
def pages(spark):
    return synth_pages_df(spark, N, slices=4)


def test_full_run_and_lineage(spark, fixture_programs, pages, tmp_path):
    pipe = KgPipeline(
        spark, str(tmp_path / "wd"), fixture_programs, run_scope="r1", n_buckets=8
    )
    out = pipe.run(pages)
    assert out["triples"].count() > 0
    lin = pipe.lineage()
    stages = {r.stage for r in lin.collect()}
    assert stages == {"extract", "results", "triples", "canonical"}
    # exactly one completion per (stage, bucket)
    dupes = (
        lin.groupBy("run_scope", "stage", "bucket", "input_token").count().filter("count > 1").count()
    )
    assert dupes == 0
    # lineage carries url ranges and counts
    row = lin.filter("stage = 'results'").first()
    assert row.n_rows > 0 and row.url_min is not None and row.latency_ms >= 0


def test_interrupted_resume_idempotent(spark, fixture_programs, pages, tmp_path):
    wd = str(tmp_path / "wd")
    # Clean reference run in a separate workdir.
    ref = KgPipeline(
        spark, str(tmp_path / "ref"), fixture_programs, run_scope="r", n_buckets=8
    ).run(pages)
    ref_nt = nt(ref["canonical"])

    # "Interrupted" run: only half the corpus reaches the pipeline before
    # the crash (some buckets complete, some never start).
    partial = pages.filter(F.xxhash64("url") % 2 == 0)
    pipe1 = KgPipeline(spark, wd, fixture_programs, run_scope="r", n_buckets=8)
    pipe1.run(partial)
    lin1 = {
        (r.stage, r.bucket) for r in pipe1.lineage().filter("status='done'").collect()
    }
    assert lin1  # something committed before the "crash"

    # Resume with the full corpus under the same scope.
    pipe2 = KgPipeline(spark, wd, fixture_programs, run_scope="r", n_buckets=8)
    out2 = pipe2.run(pages)

    lin2 = pipe2.lineage().filter("status='done'")
    dupes = (
        lin2.groupBy("run_scope", "stage", "bucket", "input_token").count().filter("count > 1").count()
    )
    assert dupes == 0, "resume must not duplicate lineage completions"
    # NOTE: resume semantics are bucket-level (a bucket is the unit of
    # work). The url-hash filter above splits INSIDE buckets, so run-1's
    # completed buckets legitimately keep their partial rows; the
    # bucket-boundary test below checks exact output equality. Here:
    # everything the resumed run produced must be valid clean-run output.
    assert set(nt(out2["triples"])) <= set(nt(ref["triples"]))


def test_bucket_complete_interrupt_resume_equals_clean_run(
    spark, fixture_programs, pages, tmp_path
):
    wd = str(tmp_path / "wd")
    ref = KgPipeline(
        spark, str(tmp_path / "ref"), fixture_programs, run_scope="r", n_buckets=8
    ).run(pages)
    ref_nt = nt(ref["canonical"])

    # Interrupt at a bucket boundary: buckets 0-3 fully processed, then crash.
    pipe1 = KgPipeline(spark, wd, fixture_programs, run_scope="r", n_buckets=8)
    half = pipe1.add_bucket(pages).filter("bucket < 4").drop("bucket")
    pipe1.run(half)
    done_before = pipe1.lineage().filter("stage='extract'").count()
    assert done_before <= 4

    pipe2 = KgPipeline(spark, wd, fixture_programs, run_scope="r", n_buckets=8)
    out2 = pipe2.run(pages)
    # Completed buckets were skipped: their extract lineage rows unchanged.
    lin = pipe2.lineage().filter("stage='extract' and status='done'")
    assert lin.count() == 8
    dupes = lin.groupBy("bucket").count().filter("count > 1").count()
    assert dupes == 0
    assert nt(out2["canonical"]) == ref_nt


def test_different_scope_reprocesses(spark, fixture_programs, pages, tmp_path):
    wd = str(tmp_path / "wd")
    KgPipeline(spark, wd, fixture_programs, run_scope="a", n_buckets=4).run(pages)
    pipe_b = KgPipeline(spark, wd, fixture_programs, run_scope="b", n_buckets=4)
    out = pipe_b.run(pages)
    assert out["triples"].count() > 0
    assert pipe_b.lineage().filter("run_scope='b'").count() > 0


def test_bucket_layout_enables_partition_pruning(spark, fixture_programs, pages, tmp_path):
    """Reading one bucket from a stage checkpoint must prune to that
    partition directory (PartitionFilters in the scan, not a full scan)."""
    pipe = KgPipeline(
        spark, str(tmp_path / "wd"), fixture_programs, run_scope="r", n_buckets=8,
        canonicalize=False,
    )
    pipe.run(pages)
    tri = spark.read.parquet(str(tmp_path / "wd" / "triples")).filter("bucket = 3")
    plan = tri._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan.replace("#", " #").replace(
        "bucket #", "bucket#"
    ) or "PartitionFilters: [isnotnull(bucket" in plan
    # and the data actually comes back bucket-pure
    assert {r.bucket for r in tri.select("bucket").distinct().collect()} == {3}
