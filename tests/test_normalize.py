"""Text normalization chain (operators/normalize.py)."""

import pytest


def _run(spark, rows):
    from cmc_knowledge_graph_text2ttl_spark.operators.normalize import (
        normalize_text,
    )

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r.id: r for r in normalize_text(df).collect()}


class TestNormalizeText:
    def test_identity_on_clean_text(self, spark):
        rows = [(1, "A clean line.\nAnother clean line.")]
        got = _run(spark, rows)
        assert got[1].text == rows[0][1]
        assert got[1].n_chars_before == got[1].n_chars_after

    def test_line_endings(self, spark):
        got = _run(spark, [(1, "a\r\nb\rc\nd")])
        assert got[1].text == "a\nb\nc\nd"

    def test_control_chars_stripped_tab_newline_kept(self, spark):
        got = _run(spark, [(1, "a\x00b\x07c\td\ne\x7ff")])
        # the tab later collapses to a space (rule 4)
        assert got[1].text == "abc d\nef"

    def test_punctuation_runs_squeeze_to_three(self, spark):
        got = _run(spark, [(1, "wow!!!!!! ---------- ok??? ...")])
        assert got[1].text == "wow!!! --- ok??? ..."

    def test_whitespace_runs_and_indentation(self, spark):
        got = _run(spark, [(1, "a   b\t\tc\n   indented   \nd")])
        assert got[1].text == "a b c\nindented\nd"

    def test_blank_line_collapse_and_trim(self, spark):
        got = _run(spark, [(1, "\n\n  first\n\n\n\n\nsecond   \n\n")])
        assert got[1].text == "first\n\nsecond"

    def test_char_counts(self, spark):
        got = _run(spark, [(1, "ab   cd"), (2, None)])
        assert (got[1].n_chars_before, got[1].n_chars_after) == (7, 5)
        assert (got[2].text, got[2].n_chars_before, got[2].n_chars_after) == (
            "", 0, 0)

    def test_idempotent(self, spark):
        from cmc_knowledge_graph_text2ttl_spark.operators.normalize import (
            normalize_text,
        )

        rows = [(i, f"x{i}!!!!!\r\n\n\n\n  y\t z  \x01" * (1 + i % 3))
                for i in range(40)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        once = normalize_text(df)
        twice = normalize_text(
            once.withColumnRenamed("id", "doc_id").select("doc_id", "text")
        )
        a = sorted((r.id, r.text) for r in once.collect())
        b = sorted((r.id, r.text) for r in twice.collect())
        assert a == b
