"""Skew handling: salted two-phase aggregation for holistic aggregates.

Algebraic aggregates (sum/count/min) are already skew-resistant — Spark
partial-aggregates map-side, so a hot key ships one partial per
partition. Holistic aggregates (collect_list/collect_set) are not: every
row of a hot key lands in ONE reducer's buffer, and at web scale a
boilerplate host or empty-page hash turns that into a straggler or an
OOM. AQE's skew-join splitting does not help — it applies to joins, not
aggregations.

The standard fix is salting: phase 1 groups on (key, salt) so a hot
key's rows spread over ``n_salts`` reducers with bounded buffers; phase
2 merges the ``n_salts`` partial arrays per key — a shuffle of
pre-aggregated arrays, not rows. The output is sorted per key so the
result is deterministic regardless of salt routing and partitioning
(reference for the pattern: the salted two-phase min in
canonicalize.py's CC loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_int

__all__ = ["salted_collect_list"]


def salted_collect_list(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_salts: int = 16,
    sort: bool = True,
) -> DataFrame:
    """(key, values array) with bounded per-reducer buffers →
    equivalent to ``groupBy(key).agg(collect_list(value))`` + sort,
    but a key with a billion rows never funnels through one buffer in
    phase 1.

    The salt is md5-derived from the VALUE (not random): deterministic,
    so re-runs and retried tasks route identically. ``sort=True``
    (default) sorts each final array — the only way the output is
    engine- and partition-independent; pass False only when the caller
    re-aggregates anyway.
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    # salt over the RENAMED column — value_col no longer exists after
    # the select (regression: only surfaced when value_col != "v");
    # md5_int is the canonical oracle-parity hash helper
    salt = md5_int(F.col("v").cast("string")) % n_salts
    partial = (
        df.select(F.col(key_col).alias("key"), F.col(value_col).alias("v"))
        .withColumn("_salt", salt)
        .groupBy("key", "_salt")
        .agg(F.collect_list("v").alias("vs"))
    )
    merged = partial.groupBy("key").agg(
        F.flatten(F.collect_list("vs")).alias("values")
    )
    if sort:
        merged = merged.select("key", F.array_sort("values").alias("values"))
    return merged
