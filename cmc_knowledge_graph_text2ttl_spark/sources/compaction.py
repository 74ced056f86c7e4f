"""Table compaction — the maintenance pass every long-lived
Iceberg/Parquet checkpoint table needs: streaming/incremental writers
leave thousands of small files and no useful ordering; compaction
rewrites the table into ~equal-row files RANGE-ORDERED by the key hash,
so downstream scans get (a) sane file sizes, (b) partition pruning on
the hash range, and (c) stable co-location for hash-keyed joins.

repartitionByRange on the md5-derived key is the whole trick: the range
exchange samples the hash distribution, so files come out uniform even
when the raw keys are skewed (one hot host's URLs spread over the hash
space). Deterministic content per file set (the hash is md5, no seed).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import md5_int


def compact_parquet(
    df: DataFrame,
    out_path: str,
    key_col: str = "url",
    target_rows_per_file: int = 1_000_000,
    n_files: Optional[int] = None,
) -> int:
    """Rewrite ``df`` at ``out_path`` as up to ``n_files`` parquet
    files range-partitioned by ``md5(key)``; returns the REQUESTED
    partition count (the range sampler may materialize fewer files
    when there are fewer distinct keys than partitions — validate a
    manifest against the directory listing, not this number).

    ``n_files`` defaults to ``ceil(rows / target_rows_per_file)`` —
    the one count() action is the price of sizing (Iceberg keeps row
    counts in metadata; plain parquet must scan footers, which the
    count over a parquet scan is).
    """
    if target_rows_per_file < 1:
        raise ValueError("target_rows_per_file must be >= 1")
    if n_files is None:
        n_files = max(1, math.ceil(df.count() / target_rows_per_file))
    # pick a key name that cannot shadow (and then silently drop) a
    # real data column
    k = "_k"
    while k in df.columns:
        k += "_"
    (
        df.withColumn(k, md5_int(F.col(key_col).cast("string")))
        .repartitionByRange(n_files, k)
        .sortWithinPartitions(k)
        .drop(k)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_files


def read_compacted(spark: SparkSession, path: str) -> DataFrame:
    """Plain reader counterpart (the layout is an optimization, not a
    format: any parquet reader works)."""
    return spark.read.parquet(path)
