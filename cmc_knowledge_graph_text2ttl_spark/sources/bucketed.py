"""Bucketed-table storage: pre-shuffled parquet for co-located joins.

At the 100-TB design point the dominant cost of every doc-keyed join
(documents ⋈ stats ⋈ dedup verdicts ⋈ link features) is the shuffle of
the fact table. Spark's bucketed tables move that shuffle to WRITE time:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of
buckets per partition-directory, records the layout in the catalog, and
every later join or aggregation on the bucket key reads the layout
instead of exchanging — the same idea as the reference-free Iceberg
``bucket(n, col)`` partition transform (see README §Iceberg).

Caveats encoded here rather than discovered in production:

* bucketing only round-trips through the CATALOG (``saveAsTable`` +
  ``spark.table``) — ``.parquet(path)`` loses the layout;
* both sides of a join must agree on bucket count (or be multiples,
  with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
* a ``sortBy`` within buckets additionally removes the per-task sort
  of a sort-merge join.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "bucketed_exchange_count"]


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: Optional[str] = None,
    sort_cols: Optional[List[str]] = None,
    mode: str = "overwrite",
) -> str:
    """Write ``df`` as a bucketed parquet table registered as ``name``.

    ``path`` makes it an external table (recommended: keeps the data
    under an explicit root instead of the session warehouse). Returns
    the table name for ``spark.table``/``read_bucketed``.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = df.write.format("parquet").mode(mode)
    if path is not None:
        w = w.option("path", path)
    w = w.bucketBy(n_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)
    return name


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — the ONLY read path that preserves the bucket
    layout (a direct ``spark.read.parquet`` of the files would shuffle
    again on the next join)."""
    return spark.table(name)


def bucketed_exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the executed plan — the metric a
    bucketed join exists to drive to zero (BroadcastExchanges are not
    counted: broadcasting a small side is the desired plan, not a
    shuffle of the fact table)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every shuffle Exchange counts — hash, range AND SinglePartition
    # (a global-aggregate shuffle is still a shuffle); only broadcast
    # distribution is excluded
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
