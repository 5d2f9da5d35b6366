"""Fuzzy join: exactness vs a brute-force cross join, blocking
completeness bound, stop-gram guard, edge cases."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.fuzzy import fuzzy_join, qgrams_expr


def _lev(a, b):
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
            )
    return dp[len(b)]


NAMES = [
    "acme corp",
    "acme corp.",
    "acme  corporation",
    "globex",
    "globexx",
    "initech",
    "initech llc",
    "umbrella",
    "umbrela",
    "stark industries",
    "stark industry",
    "wayne enterprises",
]


def test_matches_brute_force(spark):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(NAMES)], "id long, name string"
    )
    got = {
        (r["id"], r["id_r"], r["distance"])
        for r in fuzzy_join(
            df,
            df.selectExpr("id as id_r", "name as name_r"),
            left_col="name",
            right_col="name_r",
            left_id="id",
            right_id="id_r",
            max_distance=2,
        ).collect()
        if r["id"] < r["id_r"]
    }
    want = set()
    for (i, a), (j, b) in itertools.combinations(enumerate(NAMES), 2):
        d = _lev(a.lower().strip(), b.lower().strip())
        if d <= 2:
            want.add((i, j, d))
    assert want  # the fixture contains real near-pairs
    assert got == want


def test_exact_match_distance_zero(spark):
    df = spark.createDataFrame([(1, "Same")], "id long, s string")
    other = spark.createDataFrame([(2, "  same  ")], "id long, s string")
    got = fuzzy_join(
        df, other.selectExpr("id as id2", "s as s2"),
        left_col="s", right_col="s2", left_id="id", right_id="id2",
        max_distance=0,
    ).collect()
    # normalization (lower+trim) makes these equal
    assert len(got) == 1 and got[0]["distance"] == 0


def test_blocking_completeness_bound(spark):
    """Every pair with d <= 2 and min length > q(d−1)+1 = 4 must
    survive blocking — verified against brute force over a
    deterministic perturbation family."""
    base = ["electricity", "temperature", "saturating", "covariate"]
    variants = []
    for w in base:
        variants.append(w)
        variants.append(w[1:])            # 1 deletion
        variants.append(w[:3] + "x" + w[4:])  # 1 substitution
        variants.append(w + "zz")         # 2 insertions
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(variants)], "id long, w string"
    )
    got = {
        (r["id"], r["id_r"])
        for r in fuzzy_join(
            df, df.selectExpr("id as id_r", "w as w_r"),
            left_col="w", right_col="w_r", left_id="id", right_id="id_r",
            max_distance=2,
        ).collect()
        if r["id"] < r["id_r"]
    }
    want = {
        (i, j)
        for (i, a), (j, b) in itertools.combinations(enumerate(variants), 2)
        if _lev(a, b) <= 2
    }
    assert want <= got or want == got
    assert got == want


def test_stop_gram_guard_reduces_candidates(spark):
    rows = [(i, f"prefix common suffix {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, s string")
    # with a tiny df cap, the shared grams are all dropped -> no pairs
    got = fuzzy_join(
        df, df.selectExpr("id as id_r", "s as s_r"),
        left_col="s", right_col="s_r", left_id="id", right_id="id_r",
        max_distance=2, max_gram_df=1,
    ).filter(F.col("id") != F.col("id_r")).collect()
    assert got == []


def test_qgram_padding_short_strings(spark):
    df = spark.createDataFrame([("a",)], "s string")
    grams = df.select(qgrams_expr("s", 3).alias("g")).first()["g"]
    assert len(grams) == 3  # len + q - 1 = 1 + 2
    with pytest.raises(ValueError, match="q must be"):
        df.select(qgrams_expr("s", 1))


def test_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, s string")
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(df, df, left_col="s", right_col="s", max_distance=-1)


from temporal_retriever_spark.fuzzy import entity_resolution


class TestEntityResolution:
    def test_clusters_and_golden_record(self, spark):
        rows = [
            (1, "acme corporation"),
            (2, "acme corporations"),   # 1 edit from #1
            (3, "acme corporatioon"),   # 1 edit from #1
            (4, "zenith industries"),
            (5, "zenith industried"),   # 1 edit from #4
            (6, "completely different"),
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        got = {
            r["id"]: r
            for r in entity_resolution(
                df, id_col="id", value_col="name", max_distance=2
            ).collect()
        }
        assert {got[i]["entity_id"] for i in (1, 2, 3)} == {1}
        assert {got[i]["entity_id"] for i in (4, 5)} == {4}
        assert got[6]["entity_id"] == 6 and got[6]["cluster_size"] == 1
        # golden record: equal frequency -> shortest string wins
        assert got[1]["canonical_value"] == "acme corporation"
        assert got[2]["canonical_value"] == "acme corporation"
        assert got[4]["canonical_value"] in ("zenith industries", "zenith industried")
        assert got[1]["cluster_size"] == 3

    def test_majority_spelling_wins(self, spark):
        rows = [
            (1, "acme corporation x"),
            (2, "acme corporation x"),
            (3, "acme corporation"),  # shorter but minority... wait
        ]
        # frequency beats shortness: two votes for the longer spelling
        df = spark.createDataFrame(rows, "id long, name string")
        got = entity_resolution(
            df, id_col="id", value_col="name", max_distance=2
        ).collect()
        assert all(r["canonical_value"] == "acme corporation x" for r in got)

    def test_transitive_chain_merges(self, spark):
        # a-b within 2, b-c within 2, a-c within 4: one entity anyway
        rows = [
            (1, "abcdefghij"),
            (2, "abcdefghixx"),
            (3, "abcdefghixxzz"),
        ]
        df = spark.createDataFrame(rows, "id long, name string")
        got = entity_resolution(
            df, id_col="id", value_col="name", max_distance=3, q=2
        ).collect()
        assert {r["entity_id"] for r in got} == {1}
