"""Benchmark harness — prints ONE JSON line.

Headline queries over $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]:

* kg_pipeline   — the engine's core workload: 2 workflows × documents →
                  best-of selection → winner triples (count action)
* kg_canonical  — sameAs-style connected components + triple rewrite
* dedup_minhash — MinHash+LSH near-dup pairs over documents
* dedup_exact   — md5 groupBy dedup
* ann_topk      — brute-force cosine top-k over embeddings
* text_quality  — quality features + lang id (one fused projection scan)
* tpch_q1       — pricing summary aggregate over lineitem
* tpch_join_topk— orders⋈customer⋈nation + top-k
* events_window — hourly tumbling aggregation + per-type top-k window

`value` = total wall seconds of the suite (best of N_RUNS per query after
a warm-up); extra keys report docs/sec + triples/sec for the KG pipeline.

NOISE PAIRING (BASELINE.md protocol, same discipline as bench_scaling):
this is a shared, oversubscribed box whose throughput swings ±20-60%
between windows. Every query timing therefore interleaves a pure-Python
multiprocessing control run; the JSON reports the per-query control
minimum (``controls``) next to the query minimum. Compare ACROSS bench
runs by normalizing with the control ratio — a query regression with an
equally-slower control is host noise, not an engine change. Run nothing
else Spark/pytest-shaped concurrently.

The JSON also self-reports ``ratio_vs_control``: each query's time vs
the committed REFERENCE window, discounted by the host-load ratio when
(and only when) this run's control is slower than the reference's —
1.0 = same engine speed; >1.25 = investigate before attributing to
code; a quieter-than-reference host is never credited (fixed planning
overhead in sub-second queries would turn that credit into phantom
regressions).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import re as _re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
CONTROL_PROCS = int(os.environ.get("SPARK_GRAFT_BENCH_CONTROL_PROCS", "8"))

# Committed reference window: BENCH_r03.json (sf0.1, local[32]), the first
# run with per-query controls. `ratio_vs_control` below divides each
# query's (time / control) by the same quantity here, so a value of 1.0
# means "identical engine speed once shared-box load is factored out";
# treat anything within 0.8-1.25 as noise (BASELINE.md doctrine). Update
# these numbers ONLY from a driver BENCH_r*.json, never from ad-hoc runs.
REFERENCE = {
    "queries": {
        "kg_pipeline": 1.893, "kg_canonical": 1.718, "dedup_minhash": 4.25,
        "dedup_exact": 0.748, "ann_topk": 0.695, "text_quality": 0.517,
        "tpch_q1": 0.349, "tpch_join_topk": 0.487, "events_window": 0.842,
    },
    "controls": {
        "kg_pipeline": 0.31, "kg_canonical": 0.292, "dedup_minhash": 0.302,
        "dedup_exact": 0.334, "ann_topk": 0.332, "text_quality": 0.302,
        "tpch_q1": 0.291, "tpch_join_topk": 0.291, "events_window": 0.305,
    },
    "round": 3,
}


def _mp_regex_work(n):
    pat = _re.compile(r"\b(join|scan|sort|merge|filter|window|hash|agg)\b")
    text = (
        "key agg row scan slow fast table value part hash value table part "
        "a row fast merge batch part value fast spark a the line sort window "
    ) * 30
    c = 0
    for _ in range(n):
        c += len(pat.findall(text))
    return c


def host_control(pool) -> float:
    """One control measurement (~0.5 s of pure-Python regex work across
    CONTROL_PROCS processes) against a pre-warmed pool; interleaved with
    every query run so both see the same shared-box load."""
    t0 = time.time()
    pool.map(_mp_regex_work, [200] * (CONTROL_PROCS * 8))
    return time.time() - t0


def build_suite(spark, sf_dir):
    """name -> zero-arg callable executing one benchmark query (an action)."""
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from cmc_knowledge_graph_text2ttl_spark.operators import (
        dedup as D,
        explode_triples,
        run_workflows,
        similarity as SIM,
        textstats as TS,
    )
    from cmc_knowledge_graph_text2ttl_spark.operators.best import select_best_workflow
    from cmc_knowledge_graph_text2ttl_spark.operators.canonicalize import (
        canonicalize_triples,
        connected_components,
    )

    # single-file parquet = one partition; repartition so CPU-heavy column
    # work (shingling, hashing) uses every core (the tables are tiny, the
    # derived work is not)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(CPUS)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(CPUS)
    counters = {}

    def kg_pipeline():
        pages = E._docs_as_pages(spark, sf_dir)
        ranked = run_workflows(pages, E._programs(), select_best=True)
        tri = explode_triples(ranked, winners_only=True)
        n = tri.count()
        counters["kg_docs"] = docs.count()
        counters["kg_triples"] = n
        return n

    def kg_canonical():
        pad = lambda c: F.lpad(c.cast("string"), 5, "0")
        e1 = docs.filter(F.col("doc_id") % 5 == 0).select(
            F.concat(F.lit("n"), pad(F.col("doc_id"))).alias("src"),
            F.concat(F.lit("n"), pad(F.col("doc_id") + 1)).alias("dst"),
        )
        e2 = docs.filter(F.col("doc_id") % 10 == 0).select(
            F.concat(F.lit("n"), pad(F.col("doc_id") + 1)).alias("src"),
            F.concat(F.lit("n"), pad(F.col("doc_id") + 2)).alias("dst"),
        )
        return connected_components(e1.union(e2)).count()

    def dedup_minhash():
        return D.minhash_lsh_pairs(
            docs, n_hashes=16, bands=4, shingle_n=5, threshold=0.5
        ).count()

    def dedup_exact():
        return D.exact_duplicates(docs).count()

    def ann_topk():
        qv = [float(x) for x in emb.filter("vec_id = 0").first().embedding]
        return len(SIM.cosine_topk(emb, qv, k=10).collect())

    def text_quality():
        qf = TS.quality_features(docs)
        li = TS.lang_id(docs)
        return qf.join(li, "id").count()

    def tpch_q1():
        return E.q_tpch_pricing_summary(spark, sf_dir).count()

    def tpch_join_topk():
        return len(E.q_tpch_top_customers(spark, sf_dir).collect())

    def events_window():
        return E.q_events_hourly(spark, sf_dir).count() + len(
            E.q_events_top_users(spark, sf_dir).collect()
        )

    suite = {
        "kg_pipeline": kg_pipeline,
        "kg_canonical": kg_canonical,
        "dedup_minhash": dedup_minhash,
        "dedup_exact": dedup_exact,
        "ann_topk": ann_topk,
        "text_quality": text_quality,
        "tpch_q1": tpch_q1,
        "tpch_join_topk": tpch_join_topk,
        "events_window": events_window,
    }
    return suite, counters


def run_bench(master=None, sf_dir=SF_DIR, quiet=True):
    from cmc_knowledge_graph_text2ttl_spark.session import get_spark

    spark = get_spark(
        app_name="kg-bench",
        master=master or f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    suite, counters = build_suite(spark, sf_dir)
    timings = {n: float("inf") for n in suite}
    controls = {n: float("inf") for n in suite}
    with mp.Pool(CONTROL_PROCS) as pool:
        pool.map(_mp_regex_work, [10] * CONTROL_PROCS)  # warm the pool
        for fn in suite.values():
            fn()  # warm-up pass (JIT, file listing, broadcast)
        # min over N_RUNS FULL-SUITE passes, not back-to-back repeats:
        # the two samples of a query land a whole suite apart, so a
        # transient shared-box spike cannot poison both (the discipline
        # bench_scaling.py already uses — rounds 2 and 4 each printed a
        # 2×+ ghost regression from one noisy window under the old
        # per-query repeat loop).
        for _ in range(N_RUNS):
            for name, fn in suite.items():
                controls[name] = min(controls[name], host_control(pool))
                t0 = time.time()
                fn()
                timings[name] = min(timings[name], time.time() - t0)
    timings = {n: round(t, 3) for n, t in timings.items()}
    controls = {n: round(c, 3) for n, c in controls.items()}
    kg_seconds = timings.get("kg_pipeline")
    spark.stop()
    return timings, controls, counters, kg_seconds


def normalized_deltas(timings, controls):
    """Per-query engine-speed ratio vs the committed REFERENCE window:
    (t / t_ref) / max(1, ctrl / ctrl_ref).

    The control divisor only ever EXCUSES slowness measured on a
    busier-than-reference host — it is floored at 1 rather than
    crediting a quieter one, because sub-second queries carry fixed
    scheduling/planning overhead that does not speed up when the box
    idles (a symmetric (t/ctrl)/(t_ref/ctrl_ref) reads a faster raw
    time on a quiet host as a regression). Only meaningful at the
    reference shape (sf0.1, 32 cpus) — returns {} otherwise."""
    if SF_DIR.rstrip("/").endswith("sf0.1") is False or CPUS != 32:
        return {}
    out = {}
    for name, t in timings.items():
        t_ref = REFERENCE["queries"].get(name)
        c_ref = REFERENCE["controls"].get(name)
        c = controls.get(name)
        if t_ref and c_ref and c:
            out[name] = round((t / t_ref) / max(1.0, c / c_ref), 2)
    return out


def main():
    timings, controls, counters, kg_seconds = run_bench()
    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    norm = normalized_deltas(timings, controls)
    out = {
        "metric": "bench_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "controls": controls,
        "ratio_vs_control": norm,
        "ratio_reference_round": REFERENCE["round"] if norm else None,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
        "kg_docs_per_sec": (
            round(counters.get("kg_docs", 0) / kg_seconds, 1) if kg_seconds else None
        ),
        "kg_triples_per_sec": (
            round(counters.get("kg_triples", 0) / kg_seconds, 1) if kg_seconds else None
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
