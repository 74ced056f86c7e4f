"""Soak run (SURVEY §5.5): 1M skewed synthetic pages through the fused
pipeline at local[32]. Prints one JSON line; paste the numbers into
BENCH/BASELINE.md's Soak section.

Usage: python tools/soak.py [n_pages]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000


def main():
    from pyspark.sql import functions as F

    from cmc_knowledge_graph_text2ttl_spark.operators import explode_triples
    from cmc_knowledge_graph_text2ttl_spark.operators.run import (
        extract_and_run_workflows,
    )
    from cmc_knowledge_graph_text2ttl_spark.session import get_spark
    from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df
    from cmc_knowledge_graph_text2ttl_spark.workflow.compile import (
        compile_workflow_file,
    )

    programs = [
        compile_workflow_file(p, index=i)
        for i, p in enumerate(sorted(glob.glob("fixtures/workflows/*.yaml")))
    ]
    spark = get_spark(app_name="kg-soak", master="local[32]", shuffle_partitions=256)
    spark.sparkContext.setLogLevel("ERROR")
    pages = synth_pages_df(spark, N, skew=True, slices=256)
    t0 = time.time()
    ranked = extract_and_run_workflows(pages, programs, select_best=True)
    tri = explode_triples(ranked, winners_only=True)
    n_triples = tri.count()
    wall = time.time() - t0
    # winner-count integrity: one winner per successfully extracted url
    n_winners = ranked.filter("is_best").count()
    n_urls = ranked.select("url").distinct().count()
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "soak_triples_per_sec",
                "value": round(n_triples / wall, 1),
                "unit": "triples/sec",
                "pages": N,
                "triples": n_triples,
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(N / wall, 1),
                "winners": n_winners,
                "distinct_urls": n_urls,
                "winners_equal_urls": n_winners == n_urls,
            }
        )
    )


if __name__ == "__main__":
    main()
