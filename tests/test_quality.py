"""Data-quality constraint suite: metric math, pass/fail gates,
single-job plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.quality import (
    bounds,
    check_constraints,
    completeness,
    contained_in,
    non_negative,
    row_count,
    uniqueness,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", -1.0),
        (3, "b", 5.0),
        (4, None, 7.0),
        (4, "c", None),
    ]
    return spark.createDataFrame(rows, "id long, cat string, v double")


def test_metrics_and_gates(df):
    got = {
        (r["check"], r["column"]): (r["metric"], r["passed"])
        for r in check_constraints(
            df,
            [
                completeness("cat", min_ratio=0.8),
                completeness("v", min_ratio=0.9),
                uniqueness("id"),
                uniqueness(["id", "cat"], min_ratio=0.8),
                bounds("v", minimum=0.0, maximum=100.0),
                contained_in("cat", ["a", "b"], min_ratio=0.5),
                row_count(minimum=3, maximum=4),
            ],
        ).collect()
    }
    assert got[("completeness", "cat")] == (0.8, True)
    assert got[("completeness", "v")] == (0.8, False)
    assert got[("uniqueness", "id")] == (0.8, False)  # id 4 repeats
    # COUNT DISTINCT skips tuples with any NULL (SQL semantics, noted
    # in the docstring): (4, None) doesn't count -> 4/5
    assert got[("uniqueness", "id,cat")] == (0.8, True)
    assert got[("min_bound", "v")] == (-1.0, False)
    assert got[("max_bound", "v")] == (10.0, True)
    assert got[("contained_in", "cat")] == (0.6, True)
    assert got[("row_count_min", "*")] == (5.0, True)
    assert got[("row_count_max", "*")] == (5.0, False)


def test_empty_table_fails_closed(spark):
    empty = spark.createDataFrame([], "id long, v double")
    got = {
        r["check"]: r["passed"]
        for r in check_constraints(
            empty, [completeness("v"), row_count(minimum=1), non_negative("v")]
        ).collect()
    }
    # null metrics (no rows) must FAIL, not silently pass
    assert got == {
        "completeness": False,
        "row_count_min": False,
        "min_bound": False,
    }


def test_single_job_plan(df):
    suite = check_constraints(
        df,
        [
            completeness("cat"),
            uniqueness("id"),
            bounds("v", minimum=0.0),
            row_count(),
        ],
    )
    plan = suite._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("Scan ExistingRDD") == 1  # one pass over the table


def test_validation(df):
    with pytest.raises(ValueError, match="no checks"):
        check_constraints(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        check_constraints(df, [completeness("v"), completeness("v")])
    with pytest.raises(ValueError, match="minimum and/or maximum"):
        bounds("v")
    with pytest.raises(ValueError, match="non-empty"):
        contained_in("cat", [])


from temporal_retriever_spark.quality import benford_test


class TestBenford:
    def test_benford_sample_conforms(self, spark):
        import math
        import random

        rng = random.Random(3)
        # multiplicative process -> Benford-distributed magnitudes
        rows = [(math.exp(rng.uniform(0, 20)),) for _ in range(5000)]
        df = spark.createDataFrame(rows, "v double")
        r = benford_test(df, "v").collect()[0]
        assert r["n"] == 5000
        assert r["p_value"] > 0.001
        assert r["max_dev"] < 0.03

    def test_uniform_data_flagged(self, spark):
        import random

        rng = random.Random(5)
        rows = [(rng.uniform(100.0, 999.0),) for _ in range(5000)]
        df = spark.createDataFrame(rows, "v double")
        r = benford_test(df, "v").collect()[0]
        assert r["p_value"] < 1e-12
        assert r["chi2_stat"] > 100

    def test_chi2_matches_hand_computation(self, spark):
        import math

        # fixed counts: digit 1 x30, digit 2 x20, digit 9 x10 (others 0)
        rows = [(1.5,)] * 30 + [(25.0,)] * 20 + [(0.09,)] * 10
        df = spark.createDataFrame(rows, "v double")
        r = benford_test(df, "v").collect()[0]
        n = 60
        obs = {1: 30, 2: 20, 9: 10}
        chi2 = n * sum(
            ((obs.get(d, 0) / n) - math.log10(1 + 1 / d)) ** 2
            / math.log10(1 + 1 / d)
            for d in range(1, 10)
        )
        assert r["chi2_stat"] == pytest.approx(chi2, rel=1e-9)
        maxdev = max(
            abs(obs.get(d, 0) / n - math.log10(1 + 1 / d)) for d in range(1, 10)
        )
        assert r["max_dev"] == pytest.approx(maxdev, rel=1e-9)

    def test_zeros_nulls_excluded_and_keys(self, spark):
        rows = [("a", 123.0), ("a", 0.0), ("a", None), ("a", -250.0),
                ("b", 0.004)]
        df = spark.createDataFrame(rows, "k string, v double")
        got = {r["k"]: r for r in benford_test(df, "v", keys=["k"]).collect()}
        assert got["a"]["n"] == 2  # 123 (d=1) and -250 (d=2)
        assert got["b"]["n"] == 1  # 0.004 -> digit 4


class TestProfileTable:
    def test_profiles_mixed_types(self, spark):
        from temporal_retriever_spark.quality import profile_table

        df = spark.createDataFrame(
            [
                (1, 2.5, "x"),
                (2, None, "y"),
                (3, 7.5, None),
                (3, 0.0, "y"),
            ],
            "a int, b double, c string",
        )
        got = {r["column"]: r for r in profile_table(df).collect()}
        assert set(got) == {"a", "b", "c"}
        a = got["a"]
        assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 0, 3)
        assert (a["min_num"], a["max_num"], a["mean"]) == (1.0, 3.0, 2.25)
        assert a["min_str"] is None and a["max_str"] is None
        b = got["b"]
        assert (b["n_null"], b["n_distinct"]) == (1, 3)
        assert b["mean"] == pytest.approx(10.0 / 3)
        c = got["c"]
        assert (c["n_null"], c["n_distinct"]) == (1, 2)
        assert (c["min_str"], c["max_str"]) == ("x", "y")
        assert c["min_num"] is None and c["mean"] is None
        assert c["dtype"] == "string" and a["dtype"] == "int"

    def test_column_subset_and_validation(self, spark):
        from temporal_retriever_spark.quality import profile_table

        df = spark.createDataFrame([(1, "x")], "a int, c string")
        rows = profile_table(df, columns=["c"]).collect()
        assert [r["column"] for r in rows] == ["c"]
        with pytest.raises(ValueError):
            profile_table(df, columns=["nope"])
