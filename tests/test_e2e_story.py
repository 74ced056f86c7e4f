"""The north-star end-to-end story on one corpus:

pages → extraction → workflows (incl. sameAs emission from alias docs)
→ best-of → triples → connected-components canonicalization → the
alias clusters collapse onto one canonical IRI, with fact triples
rewritten — i.e. the full north_rule pipeline in one test.
"""

import glob
import os

import pytest
from pyspark.sql import functions as F

from cmc_knowledge_graph_text2ttl_spark.operators import explode_triples
from cmc_knowledge_graph_text2ttl_spark.operators.canonicalize import (
    OWL_SAMEAS,
    canonicalize_triples,
    sameas_edges,
)
from cmc_knowledge_graph_text2ttl_spark.operators.run import extract_and_run_workflows
from cmc_knowledge_graph_text2ttl_spark.sources import synth_pages_df
from cmc_knowledge_graph_text2ttl_spark.workflow.compile import compile_workflow_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def story(spark):
    progs = [
        compile_workflow_file(p, index=i)
        for i, p in enumerate(sorted(glob.glob(f"{REPO}/fixtures/workflows/*.yaml")))
    ]
    pages = synth_pages_df(spark, 600, slices=8)
    ranked = extract_and_run_workflows(pages, progs, select_best=True)
    triples = explode_triples(ranked, winners_only=True).cache()
    canonical = canonicalize_triples(triples).cache()
    return triples, canonical


def test_sameas_edges_exist(story):
    triples, _ = story
    edges = sameas_edges(triples)
    assert edges.count() > 0


def test_alias_clusters_collapse(story):
    triples, canonical = story
    # every alias group from the entity docs (e.g. ASA/Acetylsalicylic
    # Acid/aspirin → Aspirin) must resolve to ONE subject after
    # canonicalization
    # NB: lowercase 'aspirin' is deliberately NOT in the workflow's
    # mapping, so it never gets a sameAs edge — dictionary coverage, not
    # string similarity, decides linkage
    aliases = {
        "http://example.org/kg/material_ASA",
        "http://example.org/kg/material_Acetylsalicylic_Acid",
        "http://example.org/kg/material_Aspirin",
    }
    before = {
        r.subj
        for r in triples.filter(F.col("subj").isin(list(aliases))).collect()
    }
    assert before, "alias mentions must exist in the raw triples"
    after = {
        r.subj
        for r in canonical.filter(F.col("subj").isin(list(aliases))).collect()
    }
    # all alias subjects rewritten away to the component representative
    comp = {
        r.component
        for r in __import__(
            "cmc_knowledge_graph_text2ttl_spark.operators.canonicalize",
            fromlist=["connected_components"],
        ).connected_components(sameas_edges(triples)).filter(
            F.col("node").isin(list(aliases))
        ).collect()
    }
    assert len(comp) == 1
    rep = comp.pop()
    assert after <= {rep}
    # no sameAs triples survive canonicalization
    assert canonical.filter(F.col("pred") == OWL_SAMEAS).count() == 0


def test_facts_preserved_modulo_rewrite(story):
    triples, canonical = story
    n_sameas = triples.filter(
        (F.col("pred") == OWL_SAMEAS) & (F.col("obj_kind") == "iri")
    ).count()
    # rewriting never invents facts: canonical <= raw - sameAs (dedup may
    # shrink further when aliases collapse onto identical triples)
    assert canonical.count() <= triples.count() - n_sameas
    # and at least the non-alias facts survive
    assert canonical.count() > 0
    preds_before = {r.pred for r in triples.select("pred").distinct().collect()}
    preds_after = {r.pred for r in canonical.select("pred").distinct().collect()}
    assert preds_after == preds_before - {OWL_SAMEAS}
