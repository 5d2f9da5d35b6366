"""Plan-growth regression guard for every iterative (driver-loop)
operator.

The failure mode this catches: a round body that references the
previous round's DataFrame MORE than once without lineage truncation
doubles the lazy plan per round — 20 rounds is ~2^20 plan nodes and
Catalyst's analyzer OOMs on a five-row input (the exact bug
markov_stationary shipped with in round 5, funnel.py). Invisible in
a quick smoke test at rounds=2, fatal at the default round count.

Guard: build each operator's output frame at three round counts
(r, 2r, 3r), measure the ANALYZED logical plan size (treeString line
count — analysis runs, execution doesn't, except where a round body
eagerly checkpoints by design), and assert the growth is linear:
the second difference n(3r)-n(2r) must not exceed the first
difference n(2r)-n(r) by more than a slack constant. Linear growth
has equal differences; exponential growth quadruples them; eager
per-round checkpoints give a flat plan (both differences ~0) and
pass trivially.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

ROUNDS = (2, 4, 6)
# second difference may exceed the first by at most this many plan
# lines (absorbs round-count-dependent constants like the modulo
# checkpoint cadence); exponential growth overshoots by hundreds.
SLACK = 30


def plan_lines(df) -> int:
    return len(
        df._jdf.queryExecution().analyzed().treeString().splitlines()
    )


def assert_linear(build, rounds=ROUNDS, slack=SLACK):
    n1, n2, n3 = (plan_lines(build(r)) for r in rounds)
    d1, d2 = n2 - n1, n3 - n2
    assert d2 <= d1 + slack, (
        f"super-linear plan growth: sizes {n1}/{n2}/{n3} at rounds "
        f"{rounds} (diffs {d1} then {d2}) — a round body is "
        f"referencing the previous round's frame more than once "
        f"without lineage truncation"
    )


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        ("u1", "2024-01-01 00:00:00", "click", 1.0),
        ("u1", "2024-01-01 00:01:00", "view", 2.0),
        ("u1", "2024-01-01 00:02:00", "purchase", 3.0),
        ("u2", "2024-01-01 00:00:30", "click", 4.0),
        ("u2", "2024-01-01 00:03:00", "view", 1.5),
        ("u3", "2024-01-01 00:00:10", "view", 2.5),
        ("u3", "2024-01-01 00:05:00", "click", 0.5),
    ]
    return spark.createDataFrame(
        rows, "user_id string, ts string, event_type string, value double"
    ).select(
        "user_id", F.to_timestamp("ts").alias("ts"), "event_type", "value"
    )


@pytest.fixture(scope="module")
def edges(spark):
    rows = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "b")]
    return spark.createDataFrame(rows, "src string, dst string")


class TestIterativePlanGrowth:
    def test_markov_stationary(self, events):
        from temporal_retriever_spark.funnel import markov_stationary

        assert_linear(lambda r: markov_stationary(events, rounds=r))

    def test_markov_absorption(self, events):
        from temporal_retriever_spark.funnel import markov_absorption

        assert_linear(
            lambda r: markov_absorption(events, ["purchase"], rounds=r)
        )

    def test_gmm_em(self, events):
        from temporal_retriever_spark.mixture import gmm_em

        assert_linear(
            lambda r: gmm_em(
                events.select("event_type", F.col("value").alias("y")),
                key_cols=("event_type",),
                k=2,
                rounds=r,
            )
        )

    def test_pagerank(self, edges):
        from temporal_retriever_spark.graph import pagerank

        assert_linear(lambda r: pagerank(edges, iterations=r))

    def test_hits(self, edges):
        from temporal_retriever_spark.graph import hits

        assert_linear(lambda r: hits(edges, iterations=r))

    def test_label_propagation(self, edges):
        from temporal_retriever_spark.graph import label_propagation

        assert_linear(lambda r: label_propagation(edges, iterations=r))

    def test_connected_components_star(self, edges):
        from temporal_retriever_spark.graph import connected_components

        assert_linear(
            lambda r: connected_components(edges, method="star", max_iter=r)
        )

    def test_connected_components_label(self, edges):
        from temporal_retriever_spark.graph import connected_components

        assert_linear(
            lambda r: connected_components(edges, method="label", max_iter=r)
        )

    def test_als_train(self, events):
        from temporal_retriever_spark.recommend import als_train

        ratings = events.select(
            "user_id",
            F.col("event_type").alias("item_id"),
            F.col("value").alias("rating"),
        )

        def build(r):
            users, items = als_train(ratings, iterations=r)
            return users.join(items, ["f0", "f1"], "left")

        assert_linear(build)
