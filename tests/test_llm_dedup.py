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


def test_anchored_exact_pairs_equals_restricted_full(spark):
    """anchored_exact_pairs == ngram_jaccard_pairs restricted to pairs
    touching the anchor set — same ids, same exact jaccard values."""
    from temporal_retriever_spark.llm.dedup import anchored_exact_pairs

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(12):
        toks = words[: 6 + (i % 4)] + [f"tail{i % 3}", f"x{i % 5}"]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    anchors = spark.createDataFrame([(0,), (3,), (7,)], "doc_id long")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in anchored_exact_pairs(docs, anchors, n=3, threshold=0.2).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.2).collect()
        if r["id_a"] in (0, 3, 7) or r["id_b"] in (0, 3, 7)
    }
    assert got == full and got  # non-empty on this fixture


def test_embedding_probe_restriction_matches_full(spark):
    """probe_ids-restricted exact pairs == full exact pairs touching
    the probe set; probe-restricted LSH is the same subset of full LSH
    (identical hyperplanes, candidate join merely narrowed)."""
    from temporal_retriever_spark.llm.similarity import embedding_near_dup_pairs

    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for b in range(6):
        base = rng.standard_normal(16)
        rows.append((2 * b, [float(x) for x in base]))
        rows.append(
            (2 * b + 1, [float(x) for x in base + 0.01 * rng.standard_normal(16)])
        )
    for i in range(12, 30):
        rows.append((i, [float(x) for x in rng.standard_normal(16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    probe = spark.createDataFrame([(0,), (5,), (13,)], "vec_id long")
    probe_set = {0, 5, 13}

    full_exact = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs(emb, threshold=0.95, method="exact").collect()
    }
    got_exact = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs(
            emb, threshold=0.95, method="exact", probe_ids=probe
        ).collect()
    }
    assert got_exact == {
        p for p in full_exact if p[0] in probe_set or p[1] in probe_set
    }

    full_lsh = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs(
            emb, threshold=0.95, method="lsh", n_planes=4, n_tables=8, dim=16
        ).collect()
    }
    got_lsh = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs(
            emb,
            threshold=0.95,
            method="lsh",
            n_planes=4,
            n_tables=8,
            dim=16,
            probe_ids=probe,
        ).collect()
    }
    assert got_lsh == {
        p for p in full_lsh if p[0] in probe_set or p[1] in probe_set
    }


def test_simhash_pairs_exact_recall_vs_bruteforce(spark):
    """Blocked pairs == brute-force hamming pairs — the pigeonhole
    guarantee is exact, including through the d+2-chunk two-level
    split (bucket_cap forced to 1 so EVERY bucket takes the
    second-level path)."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(17)
    base = rng.getrandbits(63)
    rows = []
    for i in range(40):
        sig = base
        for _ in range(rng.randint(0, 12)):
            sig ^= 1 << rng.randrange(63)
        rows.append((i, sig))
    for i in range(40, 80):
        rows.append((i, rng.getrandbits(63)))
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    brute = {
        (a, b)
        for (a, sa) in rows
        for (b, sb) in rows
        if a < b and bin(sa ^ sb).count("1") <= 6
    }
    for cap in (2000, 1):
        got = {
            (r["id_a"], r["id_b"])
            for r in simhash_pairs(sigs, max_hamming=6, bucket_cap=cap).collect()
        }
        assert got == brute, f"bucket_cap={cap}"


def test_simhash_pairs_replica_concentrated_fixture(spark):
    """The r6 degeneracy case: one huge identical-signature group plus
    satellites within the radius. Recall must be exact and the
    identical-sig pairs must all surface at hamming 0."""
    rows = [(i, 0x5A5A5A5A5A5A5A5) for i in range(50)]  # replicas
    rows += [(100 + j, 0x5A5A5A5A5A5A5A5 ^ (1 << j)) for j in range(5)]
    rows += [(200, 0x123456789ABCDEF)]  # far away
    sigs = spark.createDataFrame(rows, "doc_id long, simhash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(sigs, max_hamming=3, bucket_cap=4).collect()
    }
    brute = {
        (a, b): bin(sa ^ sb).count("1")
        for (a, sa) in rows
        for (b, sb) in rows
        if a < b and bin(sa ^ sb).count("1") <= 3
    }
    assert got == brute
    assert sum(1 for h in got.values() if h == 0) == 50 * 49 // 2


def test_simhash_shingle_features_discriminate_templates(spark):
    """Unigram SimHash collapses docs that share vocabulary in
    different order; shingle features keep them apart."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "theta eta zeta epsilon delta gamma beta alpha"),
        ],
        "doc_id long, text string",
    )
    tok = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert tok[1] == tok[2]  # identical token multisets -> same sig
    shg = {
        r["doc_id"]: r["simhash"]
        for r in simhash_signatures(docs, feature="shingle", n=3).collect()
    }
    assert shg[1] != shg[2]  # different 3-gram sets -> different sigs


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
