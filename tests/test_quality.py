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
