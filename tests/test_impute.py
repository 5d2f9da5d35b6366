"""Imputation: per-group statistics, mode ties, constants, all-null
groups keep nulls, flags."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.impute import impute


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("g1", 1.0, "x"),
        ("g1", 3.0, "x"),
        ("g1", None, "y"),
        ("g1", None, None),
        ("g2", 10.0, None),
        ("g2", None, "z"),
        ("g3", None, None),  # all-null group
    ]
    return spark.createDataFrame(rows, "grp string, v double, c string")


def test_grouped_mean_and_mode(df):
    got = impute(
        df, {"v": "mean", "c": "mode"}, group_cols=["grp"]
    ).collect()
    by_grp = {}
    for r in got:
        by_grp.setdefault(r["grp"], []).append(r)
    g1 = {r["c"] for r in by_grp["g1"]}
    assert g1 == {"x", "y"}  # mode 'x' fills the null c
    assert all(
        r["v"] in (1.0, 3.0, 2.0) for r in by_grp["g1"]
    )  # mean(1,3)=2 fills
    assert [r["v"] for r in by_grp["g2"] if r["v_imputed"]] == [10.0]
    # all-null group keeps nulls, flags stay False
    g3 = by_grp["g3"][0]
    assert g3["v"] is None and not g3["v_imputed"]
    assert g3["c"] is None and not g3["c_imputed"]


def test_global_median_and_constant(df):
    got = impute(df, {"v": "median", "c": ("constant", "?")}).collect()
    # global median of [1, 3, 10] = 3
    vs = [r["v"] for r in got]
    assert vs.count(3.0) >= 3  # one real 3.0 + three imputed
    assert all(r["c"] is not None for r in got)
    assert sum(1 for r in got if r["c"] == "?") == 3


def test_mode_tie_breaks_smallest(spark):
    rows = [("a",), ("b",), (None,)]
    d = spark.createDataFrame(rows, "c string")
    got = impute(d, {"c": "mode"}).collect()
    filled = [r["c"] for r in got if r["c_imputed"]]
    assert filled == ["a"]  # tie between a/b -> smallest value


def test_schema_and_order_preserved(df):
    got = impute(df, {"v": "mean"}, group_cols=["grp"])
    assert got.columns == ["grp", "v", "c", "v_imputed"]


def test_validation(df):
    with pytest.raises(ValueError, match="non-empty"):
        impute(df, {})
    with pytest.raises(ValueError, match="unknown column"):
        impute(df, {"nope": "mean"})
    with pytest.raises(ValueError, match="unknown strategy"):
        impute(df, {"v": "max"})
    with pytest.raises(ValueError, match="bad strategy"):
        impute(df, {"v": ("fill", 1)})
