"""Golden regression tests (FIXTURES.md §5): the distributed engine must
reproduce the checked-in oracle goldens exactly — triples per workflow
(canonical N-Triples), extraction byte hashes, and the stable best-of
tie-break between the wf_alt_a/wf_alt_b competitors.
"""

import csv
import glob
import hashlib
import os

import pytest

from cmc_knowledge_graph_text2ttl_spark.operators import (
    explode_triples,
    extract_text,
    run_workflows,
)
from cmc_knowledge_graph_text2ttl_spark.sinks import triples_to_nt_lines
from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df
from cmc_knowledge_graph_text2ttl_spark.workflow.compile import compile_workflow_file
from cmc_knowledge_graph_text2ttl_spark.workflow.sparql import parse_ttl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "fixtures", "golden")
N_DOCS = 60


@pytest.fixture(scope="module")
def all_programs():
    paths = sorted(glob.glob(f"{REPO}/fixtures/workflows/*.yaml")) + sorted(
        glob.glob(f"{REPO}/fixtures/workflows_ops/*.yaml")
    )
    return [compile_workflow_file(p, index=i) for i, p in enumerate(paths)]


@pytest.fixture(scope="module")
def engine_triples(spark, all_programs):
    with open(f"{REPO}/fixtures/ontology.ttl") as fh:
        graphs = {"ontology": parse_ttl(fh.read())}
    pages = synth_pages_df(spark, N_DOCS, slices=3)
    res = run_workflows(extract_text(pages), all_programs, graphs=graphs)
    tri = explode_triples(res)
    by_wf = {}
    for r in tri.collect():
        by_wf.setdefault(r.workflow, []).append(
            (r.subj, r.pred, r.obj_kind, r.obj_lexical, r.obj_lang, r.obj_datatype)
        )
    return by_wf


def test_every_workflow_matches_golden(engine_triples):
    golden_files = sorted(glob.glob(f"{GOLDEN}/*.nt"))
    assert len(golden_files) >= 12
    for path in golden_files:
        wf_name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as fh:
            expect = [l for l in fh.read().splitlines() if l]
        got = sorted(triples_to_nt_lines(engine_triples.get(wf_name, [])))
        assert got == sorted(expect), f"{wf_name}: engine != golden"


def test_extraction_hashes_match_golden(spark):
    with open(f"{GOLDEN}/text_hashes.csv") as fh:
        golden = {r["url"]: (r["sha256"], r["error"]) for r in csv.DictReader(fh)}
    pages = synth_pages_df(spark, N_DOCS, slices=3)
    for r in extract_text(pages).collect():
        g_hash, g_err = golden[r.url]
        if r.extract_error:
            assert g_err, r.url
        else:
            assert hashlib.sha256(r.text.encode()).hexdigest() == g_hash, r.url


def test_alt_tie_break_stable(spark):
    """wf_alt_a and wf_alt_b tie on kv/table/entity docs (identical stats);
    A (earlier index) must win every tie; B wins section docs outright."""
    progs = [
        compile_workflow_file(f"{REPO}/fixtures/workflows_ops/wf_alt_a.yaml", index=0),
        compile_workflow_file(f"{REPO}/fixtures/workflows_ops/wf_alt_b.yaml", index=1),
    ]
    pages = synth_pages_df(spark, N_DOCS, slices=3)
    ranked = run_workflows(extract_text(pages), progs, select_best=True)
    rows = ranked.collect()
    stats = {}
    for r in rows:
        stats.setdefault(r.url, {})[r.workflow] = r
    winners = {r.url: r.workflow for r in rows if r.is_best}
    tie_urls = [
        u for u, by in stats.items()
        if len(by) == 2
        and (by["wf_alt_a"].no_triples, by["wf_alt_a"].no_matches, by["wf_alt_a"].total_match_len)
        == (by["wf_alt_b"].no_triples, by["wf_alt_b"].no_matches, by["wf_alt_b"].total_match_len)
    ]
    assert tie_urls, "fixture must produce tie cases"
    for u in tie_urls:
        assert winners[u] == "wf_alt_a", u
    b_urls = [u for u, w in winners.items() if w == "wf_alt_b"]
    assert b_urls, "section docs must make wf_alt_b win somewhere"
