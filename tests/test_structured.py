"""JSON-LD structured-data extraction (operators/structured.py)."""

import pytest

from cmc_knowledge_graph_text2ttl_spark.operators import structured as st

RDF_TYPE = st.RDF_TYPE

PAGE = """<html><head>
<script type="application/ld+json">
{"@context": "https://schema.org", "@type": "Product",
 "@id": "http://shop/p1", "name": "Widget", "price": 9.5,
 "inStock": true, "tags": ["a", "b"],
 "brand": {"@type": "Brand", "name": "Acme"},
 "seller": {"@id": "http://shop/s1", "name": "Shop"}}
</script>
<script type="application/ld+json">not json at all</script>
<SCRIPT TYPE='application/ld+json'>[{"@type": "Person", "name": "Ann"}]</SCRIPT>
</head><body></body></html>"""


def _df(spark, html=PAGE, binary=False):
    blob = html.encode() if binary else html
    schema = "url string, html " + ("binary" if binary else "string")
    return spark.createDataFrame([("http://pg", blob)], schema)


class TestExtractJsonld:
    def test_full_flattening(self, spark):
        rows = st.extract_jsonld(_df(spark)).collect()
        triples = {
            (r.subj, r.pred, r.obj_kind, r.obj)
            for r in rows
            if r.error is None
        }
        S = "https://schema.org/"
        assert ("http://shop/p1", RDF_TYPE, "iri", S + "Product") in triples
        assert ("http://shop/p1", S + "name", "literal", "Widget") in triples
        assert ("http://shop/p1", S + "price", "literal", "9.5") in triples
        assert ("http://shop/p1", S + "inStock", "literal", "true") in triples
        assert ("http://shop/p1", S + "tags", "literal", "a") in triples
        assert ("http://shop/p1", S + "tags", "literal", "b") in triples
        # nested without @id → blank node, then recursed
        brand = [
            r.obj for r in rows
            if r.pred == S + "brand" and r.error is None
        ][0]
        assert brand.startswith("_:http://pg#0/0/b")
        assert (brand, S + "name", "literal", "Acme") in triples
        # nested WITH @id keeps it
        assert ("http://shop/p1", S + "seller", "iri", "http://shop/s1") in triples
        assert ("http://shop/s1", S + "name", "literal", "Shop") in triples

    def test_bad_block_isolated_and_case_insensitive_script(self, spark):
        rows = st.extract_jsonld(_df(spark)).collect()
        errs = [r for r in rows if r.error is not None]
        assert len(errs) == 1 and "bad json" in errs[0].error
        # the third (uppercase SCRIPT, single quotes, array) block parses
        S = "https://schema.org/"
        person = [
            r for r in rows
            if r.error is None and r.obj == S + "Person"
        ]
        assert len(person) == 1 and person[0].subj == "_:http://pg#2/0"

    def test_binary_html(self, spark):
        key = lambda t: tuple("" if v is None else str(v) for v in t)
        a = sorted(map(tuple, st.extract_jsonld(_df(spark)).collect()), key=key)
        b = sorted(
            map(tuple, st.extract_jsonld(_df(spark, binary=True)).collect()),
            key=key,
        )
        assert a == b

    def test_no_blocks_no_rows(self, spark):
        df = _df(spark, "<html><body>plain</body></html>")
        assert st.extract_jsonld(df).count() == 0

    def test_deep_nesting_becomes_error_row_not_task_failure(self, spark):
        html = ('<script type="application/ld+json">'
                + "[" * 3000 + "]" * 3000 + "</script>")
        rows = st.extract_jsonld(_df(spark, html)).collect()
        assert len(rows) == 1 and "bad json" in rows[0].error

    def test_graph_members_are_independent_nodes(self, spark):
        html = ('<script type="application/ld+json">'
                '{"@context": "x", "@graph": ['
                '{"@id": "http://n/1", "name": "one"},'
                '{"name": "two"}]}</script>')
        rows = [r for r in st.extract_jsonld(_df(spark, html)).collect()
                if r.error is None]
        S = "https://schema.org/"
        preds = {r.pred for r in rows}
        assert S + "@graph" not in preds  # no synthetic linking triple
        got = {(r.subj, r.obj) for r in rows if r.pred == S + "name"}
        assert ("http://n/1", "one") in got
        assert any(s.startswith("_:") and o == "two" for s, o in got)

    def test_value_object_is_literal(self, spark):
        html = ('<script type="application/ld+json">'
                '{"@id": "http://n/p", "price": {"@value": "9.5"}}</script>')
        rows = [r for r in st.extract_jsonld(_df(spark, html)).collect()
                if r.error is None]
        assert rows == [rows[0]]
        assert (rows[0].pred, rows[0].obj_kind, rows[0].obj) == (
            "https://schema.org/price", "literal", "9.5")

    def test_data_type_script_excluded_unquoted_type_included(self, spark):
        html = ('<script data-type="application/ld+json">var x = 1;</script>'
                '<script type=application/ld+json>{"@id": "http://n/u", '
                '"name": "bare"}</script>')
        rows = st.extract_jsonld(_df(spark, html)).collect()
        assert all(r.error is None for r in rows)
        assert {(r.subj, r.obj) for r in rows} == {("http://n/u", "bare")}

    def test_absolute_iri_keys_pass_through(self, spark):
        html = (
            '<script type="application/ld+json">'
            '{"@type": "http://my/Type", "http://my/prop": "v"}</script>'
        )
        rows = st.extract_jsonld(_df(spark, html)).collect()
        got = {(r.pred, r.obj) for r in rows}
        assert (RDF_TYPE, "http://my/Type") in got
        assert ("http://my/prop", "v") in got
