"""Randomized (seeded, deterministic) Spark-vs-oracle equivalence sweep.

Generates unicode-heavy documents and workflows from a constrained op
grammar, runs them through the DISTRIBUTED path and the single-process
oracle, and requires exact triple/stat equality. This is the layer the
fixture goldens can't cover: Arrow string round-trips, odd codepoints,
empty docs, template edge characters.
"""

import hashlib
import random

import pytest

from cmc_knowledge_graph_text2ttl_spark.operators import explode_triples, run_workflows
from cmc_knowledge_graph_text2ttl_spark.operators.run import doc_vars_for_url
from cmc_knowledge_graph_text2ttl_spark.workflow import compile_workflow, run_document

SEED = 20260816
WORDS = ["alpha", "Beta", "γάμμα", "δelta", "x-1", "müller", "東京", "naïve", "42", "3.5"]
PUNCT = [" ", "  ", "\n", "\t", " | ", " — ", " … "]


def gen_docs(rng, n):
    docs = []
    for i in range(n):
        parts = []
        for _ in range(rng.randint(0, 40)):
            parts.append(rng.choice(WORDS))
            parts.append(rng.choice(PUNCT))
        text = "".join(parts)
        if rng.random() < 0.1:
            text = ""  # empty doc
        if rng.random() < 0.1:
            text += ' quote:" backslash:\\ brace:@{'  # template-ish noise
        docs.append((f"fuzz://doc/{i}", text))
    return docs


def gen_workflow(rng, idx):
    """A random but valid workflow from a tiny grammar (built as plan
    dicts and dumped — immune to indentation bugs)."""
    import yaml

    needle = rng.choice(["alpha", "Beta", "müller", "東京", r"\d+", r"[a-z]+-\d"])
    emit_kind = rng.choice(["plain", "typed", "lang", "iri"])
    obj = {
        "plain": "^w-@{m.1}-@{m_count}",
        "typed": "@{m_count}",
        "lang": {"text": "@{m.1}", "lang": "de"},
        "iri": {"iri": "ex:w_@{m.1:iri}"},
    }[emit_kind]
    emit = {
        "subject": "ex:doc_@{doc:iri}",
        "predicate": f"ex:p{idx}",
        "object": obj,
    }
    inner = {"match-every": f"({needle})", "as": "m", "do": [emit]}
    if rng.random() < 0.4:
        step = {"within": "(.{0,80})", "do": [inner]}
    else:
        step = inner
    plan = [{"prefix": "ex", "iri": f"http://f/{idx}/"}, step]
    return yaml.safe_dump(plan, allow_unicode=True, sort_keys=False)


@pytest.fixture(scope="module")
def fuzz_case():
    rng = random.Random(SEED)
    docs = gen_docs(rng, 80)
    programs = []
    for i in range(12):
        src = gen_workflow(rng, i)
        programs.append(compile_workflow(src, f"fz{i}", index=i))
    return docs, programs


def test_spark_equals_oracle_on_fuzz_corpus(spark, fuzz_case):
    docs, programs = fuzz_case
    df = spark.createDataFrame(docs, ["url", "text"]).repartition(7)
    res = run_workflows(df, programs)
    got_stats = {
        (r.url, r.workflow): (r.no_matches, r.no_triples, r.total_match_len, r.error)
        for r in res.collect()
    }
    got_triples = {}
    for r in explode_triples(res).collect():
        got_triples.setdefault((r.url, r.workflow), set()).add(
            (r.subj, r.pred, r.obj_kind, r.obj_lexical, r.obj_lang, r.obj_datatype)
        )
    checked = 0
    for url, text in docs:
        for prog in programs:
            o = run_document(text, prog, doc_vars=doc_vars_for_url(url))
            assert got_stats[(url, prog.name)] == (
                o.no_matches, o.no_triples, o.total_match_len, o.error
            ), (url, prog.name)
            assert got_triples.get((url, prog.name), set()) == set(o.triples), (
                url, prog.name,
            )
            checked += 1
    assert checked == len(docs) * len(programs)


def test_fuzz_corpus_has_interesting_cases(fuzz_case):
    docs, programs = fuzz_case
    assert any(t == "" for _, t in docs)  # empty docs present
    assert any("東京" in t for _, t in docs)  # CJK present
    assert any("@{" in t for _, t in docs)  # template-noise present
