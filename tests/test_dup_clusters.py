from __future__ import annotations

from pyspark.sql import functions as F

from temporal_retriever_spark.llm.dedup import duplicate_clusters, ngram_jaccard_pairs
from tests.conftest import assert_matches_oracle


def test_clusters_simple_chain(spark):
    # chain 1-2-3 plus pair (10,11): two components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_clusters_long_chain_converges(spark):
    # path graph 0-1-2-...-9: diameter 9, still one component
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 10


CLUSTER_ORACLE = """
WITH RECURSIVE pairs AS (
    SELECT id_a, id_b FROM (
        WITH toks AS (
            SELECT doc_id,
                   string_split_regex(TRIM(regexp_replace(LOWER(text), '\\s+', ' ', 'g')), ' ') AS tokens
            FROM documents
        ),
        idx AS (
            SELECT doc_id, tokens,
                   unnest(generate_series(1, GREATEST(len(tokens) - 2, 1))) AS i
            FROM toks
        ),
        sh AS (
            SELECT DISTINCT doc_id, array_to_string(tokens[i : i + 2], ' ') AS shingle
            FROM idx
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    )
),
edges AS (
    SELECT id_a AS src, id_b AS dst FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
reach(id, root) AS (
    SELECT src, src FROM edges
    UNION
    SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY 1
"""


def test_clusters_match_recursive_cte_oracle(tables, duck):
    pairs = ngram_jaccard_pairs(tables["documents"], n=3, threshold=0.2)
    got = duplicate_clusters(pairs)
    assert_matches_oracle(got, duck, CLUSTER_ORACLE)


def test_star_clusters_match_recursive_cte_oracle(tables, duck):
    # large-star/small-star produces the same clusters as label
    # propagation on the real fixture pairs
    pairs = ngram_jaccard_pairs(tables["documents"], n=3, threshold=0.2)
    got = duplicate_clusters(pairs, method="star")
    assert_matches_oracle(got, duck, CLUSTER_ORACLE)


def test_star_clusters_bounded_rounds_on_deep_chain(spark):
    # path graph of depth 1000: min-label propagation needs ~1000
    # rounds (O(diameter)); large-star/small-star must finish within
    # O(log n) — 16 rounds is ~1.6x the log2(1000) bound
    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, method="star", max_iter=16).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {0}


def test_star_matches_label_on_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    label = {
        r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()
    }
    star = {
        r["doc_id"]: r["cluster_id"]
        for r in duplicate_clusters(pairs, method="star").collect()
    }
    assert star == label
