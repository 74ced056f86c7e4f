"""Stage 2 — run compiled workflows over extracted pages.

The reference's nested per-document × per-workflow loop (runner.py:341-396)
becomes ONE ``mapInPandas`` stage: the compiled workflow list (and the
``select:`` reference graphs) are broadcast once; each Arrow batch of
documents is interpreted locally on the executor; output is one row per
(url, workflow) carrying the stats AND the triples as a nested
``array<struct>`` column.

Keeping triples nested at this point is deliberate: all of a document's
candidate rows are produced together in one task, so best-workflow
selection happens IN the UDF (``select_best=True``) with zero shuffle —
no join between a stats table and a triples table exists anywhere, and
the triple payloads never cross the cluster before the winner filter.
"""

from __future__ import annotations

import re
from typing import Dict, Iterator, List, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
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
        # dump:-to-file outputs and save-as: requests (OutputHandler
        # equivalents, processor.py:780/977 — side outputs become columns)
        StructField(
            "texts",
            ArrayType(
                StructType(
                    [
                        StructField("name", StringType(), True),
                        StructField("text", StringType(), True),
                    ]
                )
            ),
            True,
        ),
        StructField("saved_as", ArrayType(StringType()), True),
    ]
)

_LOG_FIELD = StructField("log", ArrayType(StringType()), True)


def _results_schema(select_best: bool, collect_log: bool) -> StructType:
    """RESULTS_SCHEMA + optional is_best / log columns. The log side
    channel (echo/desc lines) is only materialized when asked for —
    at scale nobody pays for per-doc log arrays by default."""
    fields = list(RESULTS_SCHEMA.fields)
    if collect_log:
        fields.append(_LOG_FIELD)
    if select_best:
        fields.append(StructField("is_best", BooleanType(), False))
    return StructType(fields)


RESULTS_SCHEMA_WITH_BEST = StructType(
    RESULTS_SCHEMA.fields + [StructField("is_best", BooleanType(), False)]
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
    select_best: bool = False,
) -> DataFrame:
    """extracted(url, text, ...) × broadcast(programs) → results table.

    Documents with extraction errors are skipped (the reference logs and
    continues, runner.py:335-339); per-(doc,workflow) ProcessorExceptions
    land in the ``error`` column and exclude that row from best-selection
    (the reference drops the result, runner.py:389-394).

    ``select_best=True`` adds the ``is_best`` top-1 flag *inside the UDF*:
    all candidate rows of one document are produced together in one task,
    so the best-workflow selection needs NO shuffle at all — the window
    variant (operators.best) exists for stats re-ranked from checkpoints,
    but the hot path never moves the triple payloads across the cluster.
    The tie-break is identical to the reference's stable descending sort
    (runner.py:402-407): earliest workflow wins ties.
    """
    spark = extracted.sparkSession
    bc = spark.sparkContext.broadcast(
        {
            "programs": programs,
            "graphs": graphs or {},
            "extra_vars": extra_vars or {},
        }
    )
    schema = _results_schema(select_best, collect_log)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payload = bc.value
        progs: List[WorkflowProgram] = payload["programs"]
        minigraphs = {k: MiniGraph(v) for k, v in payload["graphs"].items()}
        query_fn = make_query_fn(minigraphs) if minigraphs else None
        seed_extra = payload["extra_vars"]
        for pdf in batches:
            out: Dict[str, list] = {f.name: [] for f in schema.fields}
            has_err = "extract_error" in pdf.columns
            for row in pdf.itertuples(index=False):
                if has_err and isinstance(row.extract_error, str) and row.extract_error:
                    continue
                text = row.text
                if not isinstance(text, str):
                    continue
                doc_vars = doc_vars_for_url(row.url)
                doc_vars.update(seed_extra)
                doc_results = []
                for prog in progs:
                    res = run_document(
                        text,
                        prog,
                        doc_vars=dict(doc_vars),
                        query_fn=query_fn,
                        collect_log=collect_log,
                    )
                    doc_results.append((prog, res))
                if select_best:
                    # stable descending sort per runner.py:404 — candidates
                    # are already in workflow_idx order, errors excluded
                    ranked = sorted(
                        (i for i, (_, r) in enumerate(doc_results) if r.error is None),
                        key=lambda i: (
                            -doc_results[i][1].no_triples,
                            -doc_results[i][1].no_matches,
                            -doc_results[i][1].total_match_len,
                            i,
                        ),
                    )
                    best_idx = ranked[0] if ranked else None
                for i, (prog, res) in enumerate(doc_results):
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
                    out["texts"].append(
                        [{"name": k, "text": v} for k, v in res.texts.items()]
                    )
                    out["saved_as"].append(list(res.saved_as))
                    if collect_log:
                        out["log"].append(list(res.log))
                    if select_best:
                        out["is_best"].append(i == best_idx)
            # An all-skipped batch must yield NOTHING: an empty
            # pd.DataFrame gives its columns default dtypes that Arrow
            # cannot convert to array<struct> (NumPyConverter error) —
            # hit when a partition contains only malformed documents.
            if out["url"]:
                yield pd.DataFrame(out)

    cols = [c for c in ("url", "text", "extract_error") if c in extracted.columns]
    return extracted.select(*cols).mapInPandas(run, schema=schema)


def extract_and_run_workflows(
    pages: DataFrame,
    programs: List[WorkflowProgram],
    graphs: Optional[Dict[str, List[GraphRow]]] = None,
    extra_vars: Optional[Dict[str, str]] = None,
    select_best: bool = True,
    collect_log: bool = False,
) -> DataFrame:
    """Fused stage: html bytes → text → workflows → stats+triples in ONE
    ``mapInPandas``. Versus extract_text → run_workflows this removes an
    Arrow round-trip and a second Python worker per task — the fastest
    path when no extraction checkpoint is needed (the staged pipeline
    keeps them separate for resumability; this is the streaming/bench
    hot path). Results are identical by construction: it calls the same
    ``extract_one`` + ``run_document`` kernels.
    """
    from .extract import extract_one

    spark = pages.sparkSession
    bc = spark.sparkContext.broadcast(
        {
            "programs": programs,
            "graphs": graphs or {},
            "extra_vars": extra_vars or {},
        }
    )
    schema = _results_schema(select_best, collect_log)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        payload = bc.value
        progs: List[WorkflowProgram] = payload["programs"]
        minigraphs = {k: MiniGraph(v) for k, v in payload["graphs"].items()}
        query_fn = make_query_fn(minigraphs) if minigraphs else None
        seed_extra = payload["extra_vars"]
        for pdf in batches:
            out: Dict[str, list] = {f.name: [] for f in schema.fields}
            for url, raw, pre in zip(pdf["url"], pdf["html"], pdf["text"]):
                if isinstance(pre, str) and pre:
                    text = pre
                else:
                    text, _, err = extract_one(bytes(raw) if raw is not None else None)
                    if err:
                        continue
                doc_vars = doc_vars_for_url(url)
                doc_vars.update(seed_extra)
                doc_results = []
                for prog in progs:
                    res = run_document(
                        text,
                        prog,
                        doc_vars=dict(doc_vars),
                        query_fn=query_fn,
                        collect_log=collect_log,
                    )
                    doc_results.append((prog, res))
                best_idx = None
                if select_best:
                    ranked = sorted(
                        (i for i, (_, r) in enumerate(doc_results) if r.error is None),
                        key=lambda i: (
                            -doc_results[i][1].no_triples,
                            -doc_results[i][1].no_matches,
                            -doc_results[i][1].total_match_len,
                            i,
                        ),
                    )
                    best_idx = ranked[0] if ranked else None
                for i, (prog, res) in enumerate(doc_results):
                    out["url"].append(url)
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
                    out["texts"].append(
                        [{"name": k, "text": v} for k, v in res.texts.items()]
                    )
                    out["saved_as"].append(list(res.saved_as))
                    if collect_log:
                        out["log"].append(list(res.log))
                    if select_best:
                        out["is_best"].append(i == best_idx)
            if out["url"]:  # see run_workflows: empty batches break Arrow
                yield pd.DataFrame(out)

    return pages.select("url", "html", "text").mapInPandas(run, schema=schema)


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
