"""Stage 2 — run compiled workflows over extracted pages.

The reference's nested per-document × per-workflow loop (runner.py:341-396)
becomes ONE ``mapInPandas`` stage: the compiled workflow list (and the
``select:`` reference graphs) are broadcast once; each Arrow batch of
documents is interpreted locally on the executor; output is one row per
(url, workflow) carrying the stats AND the triples as a nested
``array<struct>`` column.

Keeping triples nested at this point is deliberate: best-workflow
selection (stage 3) is a window over exactly these rows, so the winner can
be picked BEFORE exploding — no join between a stats table and a triples
table, one shuffle saved (the join the reference's design would imply is
gone entirely).
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..workflow.compile import WorkflowProgram
from ..workflow.interpreter import run_document
from ..workflow.sparql import GraphRow, MiniGraph, make_query_fn

TRIPLE_STRUCT = StructType(
    [
        StructField("subj", StringType(), True),
        StructField("pred", StringType(), True),
        StructField("obj_kind", StringType(), True),
        StructField("obj_lexical", StringType(), True),
        StructField("obj_lang", StringType(), True),
        StructField("obj_datatype", StringType(), True),
    ]
)

RESULTS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("workflow", StringType(), False),
        StructField("workflow_idx", IntegerType(), False),
        StructField("no_matches", LongType(), True),
        StructField("no_triples", LongType(), True),
        StructField("total_match_len", LongType(), True),
        StructField("score", DoubleType(), True),
        StructField("error", StringType(), True),
        StructField("triples", ArrayType(TRIPLE_STRUCT), True),
    ]
)

_WS = re.compile(r"\s+")
_NON_ASCII = re.compile(r"[^\x20-\x7F]")


def doc_vars_for_url(url: str) -> Dict[str, str]:
    """Seed per-document variables exactly like the runner (runner.py:312-317,
    367-369): ``doc`` = cleaned basename without extension, ``docname`` =
    basename, ``docpathname`` = the full path (here: the url)."""
    basename = url.rstrip("/").rsplit("/", 1)[-1] or url
    trunk = basename.rsplit(".", 1)[0] if "." in basename else basename
    clean = _NON_ASCII.sub("-", _WS.sub("-", trunk))
    return {"doc": clean, "docname": basename, "docpathname": url}


def run_workflows(
    extracted: DataFrame,
    programs: List[WorkflowProgram],
    graphs: Optional[Dict[str, List[GraphRow]]] = None,
    extra_vars: Optional[Dict[str, str]] = None,
    collect_log: bool = False,
) -> DataFrame:
    """extracted(url, text, ...) × broadcast(programs) → results table.

    Documents with extraction errors are skipped (the reference logs and
    continues, runner.py:335-339); per-(doc,workflow) ProcessorExceptions
    land in the ``error`` column and exclude that row from best-selection
    (the reference drops the result, runner.py:389-394).
    """
    spark = extracted.sparkSession
    bc = spark.sparkContext.broadcast(
        {
            "programs": programs,
            "graphs": graphs or {},
            "extra_vars": extra_vars or {},
        }
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payload = bc.value
        progs: List[WorkflowProgram] = payload["programs"]
        minigraphs = {k: MiniGraph(v) for k, v in payload["graphs"].items()}
        query_fn = make_query_fn(minigraphs) if minigraphs else None
        seed_extra = payload["extra_vars"]
        for pdf in batches:
            out: Dict[str, list] = {f.name: [] for f in RESULTS_SCHEMA.fields}
            has_err = "extract_error" in pdf.columns
            for row in pdf.itertuples(index=False):
                if has_err and isinstance(row.extract_error, str) and row.extract_error:
                    continue
                text = row.text
                if not isinstance(text, str):
                    continue
                doc_vars = doc_vars_for_url(row.url)
                doc_vars.update(seed_extra)
                for prog in progs:
                    res = run_document(
                        text,
                        prog,
                        doc_vars=dict(doc_vars),
                        query_fn=query_fn,
                        collect_log=collect_log,
                    )
                    out["url"].append(row.url)
                    out["workflow"].append(prog.name)
                    out["workflow_idx"].append(prog.index)
                    out["no_matches"].append(res.no_matches)
                    out["no_triples"].append(res.no_triples)
                    out["total_match_len"].append(res.total_match_len)
                    out["score"].append(res.score)
                    out["error"].append(res.error)
                    out["triples"].append(
                        [
                            {
                                "subj": t[0],
                                "pred": t[1],
                                "obj_kind": t[2],
                                "obj_lexical": t[3],
                                "obj_lang": t[4],
                                "obj_datatype": t[5],
                            }
                            for t in res.triples
                        ]
                    )
            yield pd.DataFrame(out)

    cols = [c for c in ("url", "text", "extract_error") if c in extracted.columns]
    return extracted.select(*cols).mapInPandas(run, schema=RESULTS_SCHEMA)


def explode_triples(results: DataFrame, winners_only: bool = False) -> DataFrame:
    """results → flat triples(url, workflow, subj, pred, obj_*).

    Per-document set semantics are already applied inside the interpreter
    (rdflib-graph dedup equivalent), so no distributed dropDuplicates is
    needed here — cross-document dedup is a *different*, optional operator.
    """
    df = results
    if winners_only and "is_best" in df.columns:
        df = df.filter(F.col("is_best"))
    return (
        df.filter(F.col("error").isNull())
        .select("url", "workflow", F.explode("triples").alias("t"))
        .select("url", "workflow", "t.*")
    )
