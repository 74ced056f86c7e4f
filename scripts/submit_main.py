"""Thin driver file for spark-submit (the engine ships via --py-files).

Validated launch:

    python tools/package.py
    spark-submit --master <cluster> --py-files dist/kg_engine.zip \
        scripts/submit_main.py \
        --pages <pages table> --workflows 'workflows/*.yaml' \
        --workdir <checkpoint root> --buckets 4096
"""

import sys

from cmc_knowledge_graph_text2ttl_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
