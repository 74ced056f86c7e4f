"""Extra benchmark harness for the round-5 heavy operators — prints ONE
JSON line (metric: bench_extra_suite_seconds).

bench.py is FROZEN for driver measurement, so the heavy corpus-scan
operators added in round 5 (plus the embedding-pair paths optimized in
round 6) are timed here with the SAME methodology: noop sink (guide
§1.4 — every column of every row computed, nothing written), per-query
minimum over N_RUNS full interleaved suite passes after a warm-up, and
an interleaved pure-Python multiprocessing host-control measurement per
query so cross-run comparisons can be normalized for shared-box load.

Queries (all over $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1):

* dedup_substring  — ExactSubstr token-window removal (one persisted
                     corpus window explode)
* semdedup         — IVF-cell clustering + in-cell cosine pairs + CC +
                     keep rule (the salted-pair path)
* text_tiling      — TextTiling segmentation (one persisted block bag)
* emb_near_dup     — hyperplane-LSH bucketed cosine pairs (salted)
* bpe_learn        — BPE merge learning, n_merges=64 (driver-side loop
                     after the distributed word count)

Run nothing else Spark/pytest-shaped concurrently (BASELINE.md noise
doctrine, same as bench.py / bench_scaling.py).
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
    t0 = time.time()
    pool.map(_mp_regex_work, [200] * (CONTROL_PROCS * 8))
    return time.time() - t0


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def build_suite(spark, sf_dir):
    from cmc_knowledge_graph_text2ttl_spark.operators import dedup as D
    from cmc_knowledge_graph_text2ttl_spark.operators import textstats as TS

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(CPUS)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(CPUS)

    def dedup_substring():
        return _noop(D.exact_substring_dedup(docs, n=8))

    def semdedup():
        return _noop(D.semdedup(emb, n_cells=8, threshold=0.35))

    def text_tiling():
        return _noop(TS.text_tiling(docs))

    def emb_near_dup():
        return _noop(D.embedding_near_dup_pairs(emb, threshold=0.9, n_planes=8))

    def bpe_learn():
        return _noop(TS.learn_bpe_merges(docs, n_merges=64))

    return {
        "dedup_substring": dedup_substring,
        "semdedup": semdedup,
        "text_tiling": text_tiling,
        "emb_near_dup": emb_near_dup,
        "bpe_learn": bpe_learn,
    }


def main():
    from cmc_knowledge_graph_text2ttl_spark.session import get_spark

    spark = get_spark(
        app_name="kg-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    suite = build_suite(spark, SF_DIR)
    timings = {n: float("inf") for n in suite}
    controls = {n: float("inf") for n in suite}
    with mp.Pool(CONTROL_PROCS) as pool:
        pool.map(_mp_regex_work, [10] * CONTROL_PROCS)
        for name, fn in suite.items():
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:warmup")
            fn()  # warm-up (JIT, file listing, codegen)
        for _ in range(N_RUNS):
            for name, fn in suite.items():
                controls[name] = min(controls[name], host_control(pool))
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                fn()
                timings[name] = min(timings[name], time.time() - t0)
    timings = {n: round(t, 3) for n, t in timings.items()}
    controls = {n: round(c, 3) for n, c in controls.items()}
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "bench_extra_suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "controls": controls,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
