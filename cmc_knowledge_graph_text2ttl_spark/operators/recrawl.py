"""Recrawl operators: generation deltas and polite fetch scheduling.

A production crawl is incremental: each generation is diffed against
the last to decide what changed (re-extract), what vanished (tombstone
the triples), and what is new — and the next fetch round is scheduled
politely, a bounded batch per host at a time. Both are pure DataFrame
ops: the delta is one full-outer join on the URL with digest
comparison; batching is a per-host window over an md5-derived order
(deterministic — no crawl-order bias, no random seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_int

__all__ = ["crawl_delta", "fetch_batches"]


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    url_col: str = "url",
    content_col: str = "content",
) -> DataFrame:
    """(url, status) across two crawl generations: ``new`` (absent
    before), ``gone`` (absent now), ``unchanged`` / ``changed`` by
    content digest.

    One full-outer join keyed on the URL; contents never ship through
    the shuffle — each side is reduced to (url, md5) first, so the
    join payload is 32 bytes per row regardless of page size. Re-crawl
    pipelines feed ``changed`` + ``new`` into extraction and ``gone``
    into triple tombstoning.
    """
    # presence is tracked SEPARATELY from the digest: md5(NULL) is NULL,
    # so keying 'new'/'gone' off digest nullability would misclassify a
    # URL whose fetch produced NULL content (failed fetch) as absent —
    # and a recrawl pipeline would wrongly tombstone a live URL
    o = old.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(content_col).cast("binary")).alias("_old"),
        F.lit(True).alias("_has_old"),
    )
    n = new.select(
        F.col(url_col).alias("url"),
        F.md5(F.col(content_col).cast("binary")).alias("_new"),
        F.lit(True).alias("_has_new"),
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("_has_old").isNull(), "new")
        .when(F.col("_has_new").isNull(), "gone")
        .when(F.col("_old").eqNullSafe(F.col("_new")), "unchanged")
        .otherwise("changed")
    )
    return j.select("url", status.alias("status"))


def fetch_batches(
    urls: DataFrame,
    batch_size: int,
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Polite fetch schedule → (url, host, batch_id, pos_in_batch):
    each host's URLs are split into batches of at most ``batch_size``,
    ordered by the md5 of the URL (uniform, seed-free, stable across
    runs and partitionings — a crawl-order sort would bias every batch
    toward old pages).

    One shuffle (the per-host window); batch ``b`` of every host can be
    fetched concurrently while respecting per-host concurrency 1.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    w = Window.partitionBy(host_col).orderBy(
        md5_int(F.col(url_col)), F.col(url_col)
    )
    rn = F.row_number().over(w) - 1
    return urls.select(
        F.col(url_col).alias("url"),
        F.col(host_col).alias("host"),
        (rn / batch_size).cast("int").alias("batch_id"),
        (rn % batch_size).cast("int").alias("pos_in_batch"),
    )
