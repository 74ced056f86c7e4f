"""Structured Streaming ingest: the same KG pipeline over a pages stream.

The reference is strictly batch (one process per document list); the
engine's streaming mode reuses the identical kernels — the fused
extract+workflows+best stage is a stateless ``mapInPandas``, which
Structured Streaming runs per micro-batch unchanged. On top of that:

* ``stream_triples``       — pages stream → winner triples sink
  (append mode; exactly-once via the sink checkpoint).
* ``stream_hourly_stats``  — windowed aggregation with a watermark on
  ``warc_ts`` (late pages beyond the watermark are dropped, the
  standard late-data policy).
* ``stream_dedup_pages``   — streaming exact-dedup: first-seen url wins
  within the watermark horizon (``dropDuplicates`` with watermark —
  state is bounded by the horizon, required at web scale).

In production the source is Kafka/Iceberg CDC; here the file source
with ``availableNow`` triggers exercises identical plans.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.run import explode_triples, extract_and_run_workflows
from ..sources.pages import PAGES_SCHEMA
from ..workflow.compile import WorkflowProgram


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: Optional[int] = None
) -> DataFrame:
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_triples(
    pages_stream: DataFrame,
    programs: List[WorkflowProgram],
    out_path: str,
    checkpoint: str,
    graphs: Optional[dict] = None,
    available_now: bool = True,
):
    """pages stream → winner triples parquet sink (append, exactly-once)."""
    ranked = extract_and_run_workflows(
        pages_stream, programs, graphs=graphs, select_best=True
    )
    triples = explode_triples(ranked, winners_only=True)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_page_counts(
    pages_stream: DataFrame,
    checkpoint: str,
    out_path: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    available_now: bool = True,
):
    """Watermarked tumbling-window page counts per host (append mode:
    a window emits exactly once, after the watermark passes it)."""
    host = F.regexp_extract("url", r"https?://([^/]+)/", 1)
    agg = (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), host.alias("host"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "host",
            "n_pages",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_pages(
    pages_stream: DataFrame,
    out_path: str,
    checkpoint: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming exact dedup: first-seen url wins inside the watermark
    horizon. State size is bounded by the horizon — the web-scale
    requirement (unbounded dropDuplicates state would OOM)."""
    deduped = (
        pages_stream.withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
