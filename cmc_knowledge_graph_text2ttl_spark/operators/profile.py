"""Table profiling — the data-engineering sanity pass a pipeline runs
before trusting a new corpus drop: per-column null counts, exact
distinct cardinalities and min/max, emitted as DATA (a tall
(column, metric, value) table the lineage store can diff across
generations), not logs.

Every metric is engine-exact: counts are integers, min/max are cast to
strings with Spark/DuckDB-identical rendering for the types used here
(integers and strings; floats are rejected — their string rendering
differs between engines and a float min/max belongs in a numeric
profile, not a portable one).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PORTABLE = ("string", "bigint", "int", "smallint", "tinyint", "boolean",
             "date")


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """(column, metric, value) — metrics per column: ``count``,
    ``nulls``, ``distinct`` (exact), ``min``, ``max`` (as strings;
    NULL when the column is all-null).

    Scale shape: one pass of map-side-combinable aggregates for
    count/nulls/min/max (a single reduce row), plus one
    count-distinct expansion per column — the expensive part, kept
    exact because the oracle must reproduce it (approx HLL sketches
    are not cross-engine); profile runs are offline QA, not per-query
    work. The one-row aggregate is unpivoted with ``stack`` — fully
    lazy, nothing is collected.
    """
    cols = list(columns) if columns is not None else df.columns
    schema = dict(df.dtypes)
    for c in cols:
        if c not in schema:
            raise ValueError(f"no such column: {c}")
        if not c.replace("_", "").isalnum():
            raise ValueError(
                f"column name {c!r} is not spliceable into the stack() "
                "expression; rename to [A-Za-z0-9_]+ first"
            )
        if schema[c] not in _PORTABLE:
            raise ValueError(
                f"column {c} has non-portable type {schema[c]}; "
                "profile integers/strings/booleans/dates only"
            )
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs.extend(
            [
                F.count(F.lit(1)).cast("string").alias(f"{c}__count"),
                F.sum(col.isNull().cast("long")).cast("string").alias(
                    f"{c}__nulls"
                ),
                F.count_distinct(col).cast("string").alias(f"{c}__distinct"),
                F.min(col).cast("string").alias(f"{c}__min"),
                F.max(col).cast("string").alias(f"{c}__max"),
            ]
        )
    one = df.agg(*aggs)
    pairs = []
    for c in cols:
        for metric in ("count", "nulls", "distinct", "min", "max"):
            pairs.append(f"'{c}', '{metric}', `{c}__{metric}`")
    n = len(cols) * 5
    return one.select(
        F.expr(
            f"stack({n}, {', '.join(pairs)}) AS (column, metric, value)"
        )
    )
