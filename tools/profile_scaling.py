"""Decompose the 8→32-core scaling residual of the fused KG hot path.

VERDICT r1 flagged: engine 8→32 efficiency 0.501 vs host-control 0.766 —
~35% of the high-core loss unexplained. This probe splits the job into
layers and measures each at local[8] and local[32] on the same corpus:

  jvm_scan   — parquet scan + length(html) sum (pure JVM, no Python)
  arrow_pass — mapInPandas identity projection (Arrow + worker infra)
  full       — extract + 4 workflows + in-UDF best + winners count
  full_b512 / full_b8192 — Arrow batch-size sensitivity

Usage: python tools/profile_scaling.py [n_pages]
Prints one JSON line per (layer, cores) plus the efficiency table.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
CORPUS = "/tmp/kg_scale_pages_profile"
PARTITIONS = 64
RUNS = 3


def ensure_corpus():
    from cmc_knowledge_graph_text2ttl_spark.session import get_spark
    from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df

    if os.path.exists(os.path.join(CORPUS, "_SUCCESS")):
        return
    spark = get_spark(app_name="profile-gen", master="local[32]",
                      shuffle_partitions=PARTITIONS)
    spark.sparkContext.setLogLevel("ERROR")
    synth_pages_df(spark, N_PAGES, slices=PARTITIONS).write.mode(
        "overwrite"
    ).parquet(CORPUS)
    spark.stop()


def layers(spark, programs):
    from pyspark.sql import functions as F

    from cmc_knowledge_graph_text2ttl_spark.operators import explode_triples
    from cmc_knowledge_graph_text2ttl_spark.operators.run import (
        extract_and_run_workflows,
    )

    pages = spark.read.parquet(CORPUS)

    def jvm_scan():
        return pages.select(F.sum(F.length("html"))).first()[0]

    def arrow_pass():
        def ident(batches):
            for pdf in batches:
                yield pdf[["url"]]

        return pages.select("url", "html", "text").mapInPandas(
            ident, schema="url string"
        ).count()

    def full():
        ranked = extract_and_run_workflows(pages, programs, select_best=True)
        return explode_triples(ranked, winners_only=True).count()

    return {"jvm_scan": jvm_scan, "arrow_pass": arrow_pass, "full": full}


def measure(cores: int):
    from cmc_knowledge_graph_text2ttl_spark.session import get_spark
    from cmc_knowledge_graph_text2ttl_spark.workflow.compile import (
        compile_workflow_file,
    )

    programs = [
        compile_workflow_file(p, index=i)
        for i, p in enumerate(sorted(glob.glob("fixtures/workflows/*.yaml")))
    ]
    spark = get_spark(
        app_name=f"profile-{cores}", master=f"local[{cores}]",
        shuffle_partitions=PARTITIONS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    lay = layers(spark, programs)
    for name, fn in lay.items():
        fn()  # warm
        best = min(_timed(fn) for _ in range(RUNS))
        out[name] = best
    # Arrow batch-size sensitivity on the full job
    for recs, label in ((512, "full_b512"), (8192, "full_b8192")):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(recs))
        lay["full"]()  # warm at new batch size
        out[label] = min(_timed(lay["full"]) for _ in range(RUNS))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    spark.stop()
    return out


def _timed(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def main():
    ensure_corpus()
    results = {c: measure(c) for c in (8, 32)}
    for cores, vals in results.items():
        for k, v in vals.items():
            print(json.dumps({"layer": k, "cores": cores, "sec": round(v, 2)}))
    effs = {
        k: round(results[8][k] / results[32][k] / 4.0, 3)
        for k in results[8]
    }
    print(json.dumps({"efficiency_8_to_32": effs, "pages": N_PAGES}))


if __name__ == "__main__":
    main()
