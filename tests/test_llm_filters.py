"""Corpus filters: repetition metrics, Gopher rules, scrubbing,
contamination — hand-computable fixtures with exact expectations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.filters import (
    contamination,
    gopher_filter,
    repetition_stats,
    scrub_text,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_filter_matches_gopher_rules(spark, sf_dir):
    # gopher_filter duplicates the rule expressions in staged form for
    # performance (r9); this parity pin forces the two code paths to
    # agree so a future edit to gopher_rules (threshold, regex, stopword
    # list) cannot silently diverge them (ADVICE r9).
    from temporal_retriever_spark.llm.filters import gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    rules = gopher_rules("text")
    via_rules = docs.select(
        "doc_id", *[expr.alias(name) for name, expr in rules.items()]
    )
    via_filter = gopher_filter(docs)
    assert via_filter.columns == via_rules.columns
    a = sorted(map(tuple, via_filter.collect()))
    b = sorted(map(tuple, via_rules.collect()))
    assert a == b


def test_repetition_duplicate_lines_and_paras(spark):
    text = "alpha beta\ngamma\nalpha beta\n\nalpha beta\ngamma"
    # lines: [alpha beta, gamma, alpha beta, '', alpha beta, gamma] -> 6
    # distinct: {alpha beta, gamma, ''} -> 3 -> dup_line_frac = 0.5
    # paras (split on \n{2,}): 2, distinct 2 -> 0.0
    out = repetition_stats(_docs(spark, [(1, text)])).collect()[0]
    assert out["n_lines"] == 6
    assert out["dup_line_frac"] == pytest.approx(0.5)
    assert out["dup_para_frac"] == pytest.approx(0.0)


def test_repetition_top_ngram_char_frac(spark):
    # "ab ab ab cd": top unigram "ab" x3, len 2, n_chars 11 -> 6/11
    # top bigram "ab ab" x2, len 5 -> 10/11; mode tie resolution is
    # smallest gram ("ab ab" beats "ab cd" on count, no tie here)
    out = repetition_stats(_docs(spark, [(1, "ab ab ab cd")])).collect()[0]
    assert out["top_1gram_char_frac"] == pytest.approx(6 / 11, abs=1e-6)
    assert out["top_2gram_char_frac"] == pytest.approx(10 / 11, abs=1e-6)


def test_repetition_mode_tie_is_deterministic(spark):
    # "b a b a": unigrams a x2, b x2 -> tie resolves to 'a' (sorted
    # order, smallest value): frac = 2*1/7
    out = repetition_stats(_docs(spark, [(1, "b a b a")])).collect()[0]
    assert out["top_1gram_char_frac"] == pytest.approx(2 / 7, abs=1e-6)


def test_repetition_short_doc_zero_ngrams(spark):
    out = repetition_stats(_docs(spark, [(1, "solo")])).collect()[0]
    assert out["top_2gram_char_frac"] == 0.0
    assert out["top_3gram_char_frac"] == 0.0


def test_gopher_filter_rules(spark):
    good = (
        "the quick brown fox jumps over that lazy dog and it runs to "
        "the barn with great speed because it wants to be home of the "
        "morning light and that is the whole point of have with story "
        "told again for the children of the village every single day "
        "under the warm sun and the cold moon alike forever and ever"
    )
    short = "too short"
    symbols = " ".join(["###"] * 60)
    repeated = " ".join(["spam spam"] * 40)
    out = {
        r["doc_id"]: r
        for r in gopher_filter(
            _docs(spark, [(1, good), (2, short), (3, symbols), (4, repeated)])
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["r_word_count"] is False and out[2]["keep"] is False
    assert out[3]["r_symbol_ratio"] is False
    assert out[3]["r_alpha_words"] is False
    assert out[4]["r_top_2gram"] is False and out[4]["keep"] is False


def test_gopher_thresholds_are_tunable(spark):
    out = gopher_filter(
        _docs(spark, [(1, "the cat sat with that hat of doom")]),
        min_words=5,
    ).collect()[0]
    assert out["r_word_count"] is True
    assert out["r_stopwords"] is True  # the, with, that, of -> 4 >= 2


def test_scrub_text_counts_and_redacts(spark):
    text = (
        "mail bob@example.com or visit https://ex.com/a?q=1 "
        "from 10.1.2.3 twice bob@example.com"
    )
    out = scrub_text(_docs(spark, [(1, text)])).collect()[0]
    assert out["n_email"] == 2
    assert out["n_url"] == 1
    assert out["n_ipv4"] == 1
    s = out["scrubbed"]
    assert "<EMAIL>" in s and "<URL>" in s and "<IP>" in s
    assert "bob@example.com" not in s and "10.1.2.3" not in s


def test_scrub_unknown_category_raises(spark):
    with pytest.raises(ValueError, match="categories"):
        scrub_text(_docs(spark, [(1, "x")]), categories=("ssn",))


def test_contamination_overlap_fraction(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e"),   # 3 distinct 3-grams: abc bcd cde
            (2, "x y z w"),     # 2: xyz yzw
            (3, "a b"),         # shorter than n -> 0 ngrams
        ],
    )
    bench = spark.createDataFrame([("a b c d q",)], "text string")
    # bench 3-grams: abc bcd cdq -> doc1 overlap {abc, bcd} = 2/3
    out = {
        r["doc_id"]: r
        for r in contamination(docs, bench, n=3).collect()
    }
    assert out[1]["n_ngrams"] == 3 and out[1]["n_contaminated"] == 2
    assert out[1]["contaminated_frac"] == pytest.approx(2 / 3)
    assert out[2]["n_contaminated"] == 0
    assert out[3]["n_ngrams"] == 0 and out[3]["contaminated_frac"] == 0.0


def test_contamination_plan_is_hash_join_no_python(spark):
    docs = _docs(spark, [(1, "a b c d e f g")])
    bench = spark.createDataFrame([("a b c",)], "text string")
    plan = (
        contamination(docs, bench, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "BroadcastHashJoin" in plan


class TestC4Clean:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_line_rules(self, spark):
        from temporal_retriever_spark.llm.filters import c4_clean

        text = "\n".join(
            [
                "This is a proper sentence with words.",  # kept
                "short line.",                            # < 3 words
                "no terminal punctuation here",           # no punct
                "Enable javascript to continue reading.", # javascript
                'He said "stop right there!"',            # ends in quote
                "One more good sentence follows here.",   # kept
            ]
        )
        got = c4_clean(self._df(spark, [(1, text)])).first()
        kept = got["text_clean"].split("\n")
        assert kept == [
            "This is a proper sentence with words.",
            'He said "stop right there!"',
            "One more good sentence follows here.",
        ]
        assert got["n_lines"] == 6
        assert got["n_lines_kept"] == 3

    def test_page_gates(self, spark):
        from temporal_retriever_spark.llm.filters import c4_clean

        good = "\n".join(
            f"This sentence number {i} is perfectly fine." for i in range(6)
        )
        rows = [
            (1, good),
            (2, good + "\nAlso some lorem ipsum filler text here."),
            (3, good.replace("fine.", "fine {.")),
            (4, "Only two sentences here. Not enough content."),
        ]
        got = {r["doc_id"]: r for r in c4_clean(self._df(spark, rows)).collect()}
        assert got[1]["keep"] is True
        assert got[2]["keep"] is False and got[2]["r_bad_phrases"] is False
        assert got[3]["keep"] is False and got[3]["r_curly"] is False
        assert got[4]["keep"] is False and got[4]["r_min_sentences"] is False

    def test_sentence_count_on_cleaned_text(self, spark):
        from temporal_retriever_spark.llm.filters import c4_clean

        # junk lines are dropped BEFORE sentences are counted
        text = "bad ... line ... no!!! punct words\n" * 3 + (
            "A single clean sentence survives here."
        )
        got = c4_clean(
            self._df(spark, [(1, text)]), min_line_words=4
        ).first()
        assert got["n_sentences"] == 1

    def test_null_and_empty(self, spark):
        from temporal_retriever_spark.llm.filters import c4_clean

        got = {
            r["doc_id"]: r
            for r in c4_clean(
                spark.createDataFrame(
                    [(1, None), (2, "")], "doc_id long, text string"
                )
            ).collect()
        }
        assert got[1]["keep"] is False
        assert got[2]["n_lines_kept"] == 0
