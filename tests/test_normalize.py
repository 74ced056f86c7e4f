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


class TestRepairMojibake:
    def _run(self, spark, rows):
        from cmc_knowledge_graph_text2ttl_spark.operators.normalize import (
            repair_mojibake,
        )

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {r.id: r for r in repair_mojibake(df).collect()}

    def test_latin1_utf8_double_decode_repaired(self, spark):
        moji = "caf\u00c3\u00a9 na\u00c3\u00afve r\u00c3\u00a9sum\u00c3\u00a9"
        got = self._run(spark, [(1, moji)])
        assert got[1].text == "caf\u00e9 na\u00efve r\u00e9sum\u00e9"
        assert got[1].was_mojibake

    def test_three_byte_sequence_repaired(self, spark):
        # U+2014 em dash as E2 80 94 seen through latin-1
        moji = "a \u00e2\u0080\u0094 b"
        got = self._run(spark, [(1, moji)])
        assert got[1].text == "a \u2014 b" and got[1].was_mojibake

    def test_ascii_and_real_unicode_untouched(self, spark):
        rows = [(1, "plain ascii"), (2, "caf\u00e9 already fine"),
                (3, "\u65e5\u672c\u8a9e"), (4, None)]
        got = self._run(spark, rows)
        assert got[1].text == "plain ascii" and not got[1].was_mojibake
        # real 'café': lone continuation char U+00E9 fails the grammar
        assert got[2].text == "caf\u00e9 already fine" and not got[2].was_mojibake
        assert got[3].text == "\u65e5\u672c\u8a9e" and not got[3].was_mojibake
        assert got[4].text == "" and not got[4].was_mojibake

    def test_truncated_sequence_not_repaired_and_no_throw(self, spark):
        # trailing lone lead byte: invalid UTF-8 -- must pass through
        # WITHOUT evaluating the (throwing) decode branch
        got = self._run(spark, [(1, "broken \u00c3"), (2, "x \u00c3Z y")])
        assert got[1].text == "broken \u00c3" and not got[1].was_mojibake
        assert got[2].text == "x \u00c3Z y" and not got[2].was_mojibake

    def test_surrogate_and_overlong_rejected(self, spark):
        # ED A0 80 would decode to a surrogate; E0 80 80 is overlong
        rows = [(1, "s \u00ed\u00a0\u0080"), (2, "o \u00e0\u0080\u0080")]
        got = self._run(spark, rows)
        assert not got[1].was_mojibake and not got[2].was_mojibake
        assert got[1].text == rows[0][1] and got[2].text == rows[1][1]
