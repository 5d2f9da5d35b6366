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
