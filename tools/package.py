"""Build the --py-files artifact for spark-submit.

Usage: python tools/package.py [outdir]   (default dist/)
Produces dist/kg_engine.zip containing the package — ship with:

    spark-submit --py-files dist/kg_engine.zip \\
        -m cmc_knowledge_graph_text2ttl_spark.cli ...
"""

import os
import sys
import zipfile

PKG = "cmc_knowledge_graph_text2ttl_spark"


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "dist"
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, "kg_engine.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for name in files:
                if name.endswith(".py"):
                    path = os.path.join(root, name)
                    zf.write(path, path)
    size = os.path.getsize(out)
    print(f"{out}: {size/1024:.0f} KiB")


if __name__ == "__main__":
    main()
