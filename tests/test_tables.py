"""Whole-column scoped-matching analogs vs the interpreter.

The column-function cells/sections/matches must equal what the
interpreter's match-dimensions / within-every / match-every walks produce
on the same documents — the survey's claimed [DF] analogs, proven.
"""

import re

import pytest

from cmc_knowledge_graph_text2ttl_spark.operators.extract import extract_one
from cmc_knowledge_graph_text2ttl_spark.operators.run import doc_vars_for_url
from cmc_knowledge_graph_text2ttl_spark.operators.tables import (
    extract_matches,
    extract_sections,
    extract_table_cells,
)
from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df, synth_page_rows
from cmc_knowledge_graph_text2ttl_spark.workflow import run_document

from conftest import wf

N = 120


@pytest.fixture(scope="module")
def extracted(spark):
    from cmc_knowledge_graph_text2ttl_spark.operators import extract_text

    return extract_text(synth_pages_df(spark, N, slices=4)).filter(
        "extract_error is null"
    ).cache()


def _oracle_texts():
    out = {}
    for url, ts, html, _, lang in synth_page_rows(N):
        text, ctype, err = extract_one(html)
        if not err:
            out[url] = text
    return out


def test_table_cells_equal_match_dimensions(spark, extracted):
    got = {
        (r.id, r.table_no, r.row, r.col): r.cell
        for r in extract_table_cells(extracted).collect()
    }
    # interpreter oracle: match-dimensions over the same patterns
    src = """
- within-every: '<table>(.*?)</table>'
  as: tbl
  do:
    - match-dimensions:
        - '<tr>(.*?)</tr>'
        - '<t[dh]>(.*?)</t[dh]>'
      dimensions: [row, col]
      as: cell
      do:
        - subject: http://e/doc
          predicate: http://e/cell_@{tbl_count}_@{row}_@{col}
          object: "^@{cell.1}"
"""
    program = wf(src)
    expect = {}
    for url, text in _oracle_texts().items():
        res = run_document(text, program, doc_vars=doc_vars_for_url(url))
        assert res.error is None
        for _, pred, _, lex, _, _ in res.triples:
            m = re.match(r"http://e/cell_(\d+)_(\d+)_(\d+)", pred)
            expect[(url, int(m.group(1)), int(m.group(2)), int(m.group(3)))] = lex
    assert got == expect
    assert len(got) > 50  # table docs exist in the corpus


def test_sections_equal_within_every(spark, extracted):
    pat = r"(?s)<h2>Section (\d+)</h2>"
    got = {
        (r.id, r.section_no): r.body
        for r in extract_sections(extracted, pat).collect()
    }
    expect = {}
    for url, text in _oracle_texts().items():
        for i, m in enumerate(re.finditer(pat, text)):
            expect[(url, i + 1)] = m.group(1)
    assert got == expect


def test_matches_equal_match_every(spark, extracted):
    pat = r"<p>Material: ([^<]+)</p>"
    got = {
        (r.id, r.match_no): r.match
        for r in extract_matches(extracted, pat).collect()
    }
    expect = {}
    for url, text in _oracle_texts().items():
        for i, m in enumerate(re.finditer(pat, text)):
            expect[(url, i + 1)] = m.group(1)
    assert got == expect
    assert len(got) > 20


def test_cells_plan_has_no_python(spark, extracted):
    plan = extract_table_cells(extracted)._jdf.queryExecution().executedPlan().toString()
    # the dimension explosion itself is pure JVM (Generate/posexplode);
    # only the upstream extraction stage is a Python stage
    gen_part = plan.split("MapInPandas")[0]
    assert "Generate" in gen_part and "posexplode" in gen_part
