from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.dedup import (
    exact_dedup,
    exact_duplicate_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    near_dup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
    word_shingles,
)
from tests.conftest import assert_matches_oracle


@pytest.fixture()
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank tonight"
    other = "completely different content about spark query engines and shuffles"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, "  THE quick   brown fox jumps over the lazy dog near the river bank today "),  # normalized dup
            (4, near),  # near dup
            (5, other),
        ],
        "doc_id long, text string",
    )


def test_exact_duplicate_groups(dup_docs):
    groups = {r["keep_id"]: r for r in exact_duplicate_groups(dup_docs).collect()}
    assert groups[1]["n_docs"] == 3
    assert groups[1]["doc_ids"] == [1, 2, 3]
    assert groups[4]["n_docs"] == 1


def test_exact_dedup_keeps_min_id(dup_docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(dup_docs).collect())
    assert kept == [1, 4, 5]


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = sorted(r["shingle"] for r in word_shingles(df, n=3).collect())
    assert got == ["a b c", "b c d"]


def test_short_doc_shingles(spark):
    # docs shorter than n still produce one shingle (the whole doc)
    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    got = [r["shingle"] for r in word_shingles(df, n=3).collect()]
    assert got == ["hello"]


def test_minhash_detects_near_dups(dup_docs):
    pairs = near_dup_pairs(dup_docs, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs}
    # exact dups estimate 1.0
    assert found[(1, 2)] == 1.0
    assert found[(1, 3)] == 1.0
    # near pair (1,4) found with high estimate
    assert (1, 4) in found and found[(1, 4)] > 0.5
    # unrelated doc 5 pairs with nothing
    assert not any(5 in p for p in found)


def test_lsh_requires_sig_len(tables):
    docs = tables["documents"].limit(10)
    sigs = minhash_signatures(docs, num_hashes=16)
    with pytest.raises(TypeError, match="sig_len"):
        lsh_candidate_pairs(sigs, num_bands=8)


def test_lsh_is_subset_of_all_pairs(tables):
    docs = tables["documents"].limit(200)
    sigs = minhash_signatures(docs, num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, num_bands=8, sig_len=32)
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0


def test_ngram_jaccard_exact(dup_docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(dup_docs, threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # near dup: 12 shingles each, 11 shared -> 11/13
    assert abs(pairs[(1, 4)] - 11 / 13) < 1e-12


def test_ngram_jaccard_oracle(tables, duck):
    got = ngram_jaccard_pairs(tables["documents"].limit(100), threshold=0.2)
    sql = """
        WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        toks AS (
            SELECT doc_id,
                   string_split_regex(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ') AS tokens
            FROM docs
        ),
        idx AS (
            SELECT doc_id, tokens,
                   unnest(generate_series(1, GREATEST(len(tokens) - 2, 1))) AS i
            FROM toks
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(tokens[i : i + 2], ' ') AS shingle
            FROM idx
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    """
    assert_matches_oracle(got, duck, sql)


def test_simhash_near_dups(dup_docs):
    sigs = simhash_signatures(dup_docs)
    vals = {r["doc_id"]: r["simhash"] for r in sigs.collect()}
    assert vals[1] == vals[2] == vals[3]  # identical token multisets
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(sigs, max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 4) in pairs and pairs[(1, 4)] <= 16
    assert (1, 5) not in pairs


def test_containment_catches_subset_docs(spark):
    from temporal_retriever_spark.llm.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    small = "alpha beta gamma delta epsilon zeta eta theta"  # contained
    other = "completely different words about completely different topics here"
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id long, text string"
    )
    out = ngram_containment_pairs(df, n=3, threshold=0.9).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert (row.id_a, row.id_b) == (1, 2)
    # every shingle of the small doc appears in the big doc
    assert row.containment_b == 1.0
    assert row.containment == 1.0
    # Jaccard misses this pair at the same bar — the asymmetric
    # denominator is the point of the operator
    jac = ngram_jaccard_pairs(df, n=3, threshold=0.9).toPandas()
    assert len(jac) == 0


def test_containment_directions_and_threshold(spark):
    from temporal_retriever_spark.llm.dedup import ngram_containment_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d x y")], "doc_id long, text string"
    )
    # shingles(1): {abc bcd cde def}; shingles(2): {abc bcd cdx dxy}
    out = ngram_containment_pairs(df, n=3, threshold=0.4).toPandas()
    assert len(out) == 1
    assert out.iloc[0].containment == pytest.approx(0.5)
    assert ngram_containment_pairs(df, n=3, threshold=0.6).count() == 0


from temporal_retriever_spark.llm.dedup import allpairs_jaccard, ngram_jaccard_pairs


class TestAllPairsJaccard:
    def _corpus(self, spark):
        base = "the quick brown fox jumps over the lazy dog again and again"
        rows = [
            (0, base),
            (1, base + " tonight"),                       # near-dup of 0
            (2, base.replace("quick", "slow")),           # near-dup of 0
            (3, "completely different text about spark window functions"),
            (4, "completely different text about spark window functions"),  # exact dup of 3
            (5, "unrelated short doc here now"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exactly_matches_bruteforce(self, spark):
        df = self._corpus(spark)
        for tau in (0.3, 0.5, 0.8):
            got = {
                (r["id_a"], r["id_b"], round(r["jaccard"], 9))
                for r in allpairs_jaccard(df, threshold=tau).collect()
            }
            want = {
                (r["id_a"], r["id_b"], round(r["jaccard"], 9))
                for r in ngram_jaccard_pairs(df, threshold=tau).collect()
            }
            assert got == want, (tau, got ^ want)

    def test_no_false_negatives_on_random_corpus(self, spark):
        import random

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(30)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(8, 20))))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        tau = 0.4
        got = {(r["id_a"], r["id_b"]) for r in allpairs_jaccard(df, threshold=tau).collect()}
        want = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df, threshold=tau).collect()}
        assert got == want

    def test_exact_dup_has_jaccard_one(self, spark):
        out = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in allpairs_jaccard(self._corpus(spark), threshold=0.9).collect()
        }
        assert out[(3, 4)] == 1.0

    def test_validation(self, spark):
        with pytest.raises(ValueError, match="threshold"):
            allpairs_jaccard(self._corpus(spark), threshold=0.0)
