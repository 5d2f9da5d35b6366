"""Readability scores (llm.text.readability)."""

from __future__ import annotations

import pytest



# ---------------------------------------------------------------------------
# Readability (Flesch / Flesch-Kincaid)
# ---------------------------------------------------------------------------


class TestReadability:
    def test_hand_computed(self, spark):
        from temporal_retriever_spark.llm.text import readability

        # "the cat sat." -> words=3, sentences=1, vowel groups: e,a,a = 3
        df = spark.createDataFrame([(1, "the cat sat.")], "doc_id long, text string")
        r = readability(df).collect()[0]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
        wps, spw = 3.0, 1.0
        assert r["flesch_reading_ease"] == pytest.approx(
            round(206.835 - 1.015 * wps - 84.6 * spw, 6)
        )
        assert r["fk_grade"] == pytest.approx(
            round(0.39 * wps + 11.8 * spw - 15.59, 6)
        )

    def test_polysyllabic_reads_harder(self, spark):
        from temporal_retriever_spark.llm.text import readability

        simple = "the dog ran. it was fun. we all saw it."
        dense = (
            "extraordinary bureaucratic considerations necessitate "
            "comprehensive organizational accountability evaluations."
        )
        df = spark.createDataFrame(
            [(1, simple), (2, dense)], "doc_id long, text string"
        )
        got = {r["doc_id"]: r for r in readability(df).collect()}
        assert got[1]["flesch_reading_ease"] > got[2]["flesch_reading_ease"]
        assert got[1]["fk_grade"] < got[2]["fk_grade"]

    def test_no_terminal_punct_floors_sentences(self, spark):
        from temporal_retriever_spark.llm.text import readability

        df = spark.createDataFrame([(1, "no punctuation here")], "doc_id long, text string")
        r = readability(df).collect()[0]
        assert r["n_sentences"] == 1
        assert r["flesch_reading_ease"] is not None


from temporal_retriever_spark.llm.text import keyness


class TestKeyness:
    def test_llr_math_and_ranking(self, spark):
        import math

        # slice A over-uses 'kernel'; both use 'the' equally
        rows = [("A", "the kernel kernel kernel runs"),
                ("A", "the kernel kernel scheduler"),
                ("B", "the garden grows the flowers"),
                ("B", "the garden path winds")]
        df = spark.createDataFrame(rows, "src string, text string")
        got = keyness(df, group_col="src", text_col="text", k=3, min_count=2)
        rowsA = {r["token"]: r for r in got.collect() if r["src"] == "A"}
        assert "kernel" in rowsA
        r = rowsA["kernel"]
        a, b = 5.0, 0.0
        c = 9.0   # A tokens
        dd = 9.0  # B tokens
        ea = c * (a + b) / (c + dd)
        llr = 2 * (a * math.log(a / ea))  # b=0 contributes 0
        assert r["llr"] == pytest.approx(llr, rel=1e-9)
        assert r["n_in"] == 5 and r["n_out"] == 0
        # 'the' is not over-represented in either slice at these rates
        assert "the" not in rowsA or rowsA["the"]["rank"] > 1

    def test_under_represented_excluded_and_validation(self, spark):
        rows = [("A", "x x x x x"), ("B", "x y y y y")]
        df = spark.createDataFrame(rows, "src string, text string")
        got = keyness(df, group_col="src", k=5, min_count=2).collect()
        # 'y' characterizes B only; 'x' characterizes A only
        by = {(r["src"], r["token"]) for r in got}
        assert ("B", "y") in by and ("A", "x") in by
        assert ("A", "y") not in by and ("B", "x") not in by
        import pytest as _pt

        with _pt.raises(ValueError):
            keyness(df, group_col="src", k=0)
