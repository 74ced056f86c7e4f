"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark AND its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod
from cmc_knowledge_graph_text2ttl_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    import datetime
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(normalize(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            srows = df.collect()
            scols = df.columns
        except Exception as ex:
            print(f"FAIL  {name:32s} spark error: {ex}")
            failures.append(name)
            continue
        # Driver-harness contract: the gate canonicalizes with a pandas
        # lexsort, which throws "unhashable type" on list/dict cells.
        # Reject array/map/struct output columns HERE so the class of
        # round-4 driver reds (skew_topk etc.) can never recur.
        from pyspark.sql.types import ArrayType, MapType, StructType

        bad = [
            f.name for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            print(
                f"FAIL  {name:32s} gate schema has non-scalar columns "
                f"{bad} (driver harness cannot sort them — project to "
                f"strings with array_join)"
            )
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP  {name:32s} rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name:32s} duckdb error: {str(ex)[:120]}")
            failures.append(name)
            continue
        elapsed = time.time() - t0
        if sorted(scols) != sorted(ocols):
            print(f"FAIL  {name:32s} columns differ: {sorted(scols)} vs {sorted(ocols)}")
            failures.append(name)
            continue
        if len(srows) != len(orows):
            print(f"FAIL  {name:32s} rowcount {len(srows)} vs {len(orows)}")
            failures.append(name)
            continue
        a = rowset(scols, [[r[c] for c in scols] for r in srows])
        b = rowset(ocols, orows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL  {name:32s} values differ; first diffs: {diff}")
            failures.append(name)
            continue
        print(f"OK    {name:32s} rows={len(srows):6d}  {elapsed:5.1f}s")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall queries match the oracle")


if __name__ == "__main__":
    main()
