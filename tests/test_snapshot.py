"""Snapshot diff: statuses, null-safety, column attribution, plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.snapshot import snapshot_diff, snapshot_diff_summary


@pytest.fixture()
def versions(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 20.0),
            (3, "c", None),
            (4, "d", 40.0),
            (5, None, 50.0),
        ],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),      # unchanged
            (2, "B", 20.0),      # s changed
            (3, "c", 30.0),      # v NULL -> value
            (5, None, 50.0),     # unchanged (NULL == NULL)
            (6, "f", 60.0),      # added
        ],                        # 4 removed
        "k long, s string, v double",
    )
    return old, new


class TestDiff:
    def test_statuses_and_changed_cols(self, spark, versions):
        old, new = versions
        rows = {r["k"]: r for r in snapshot_diff(old, new, keys=["k"]).collect()}
        assert rows[1]["diff_status"] == "unchanged"
        assert rows[2]["diff_status"] == "changed"
        assert rows[2]["changed_cols"] == ["s"]
        assert rows[3]["diff_status"] == "changed"
        assert rows[3]["changed_cols"] == ["v"]
        assert rows[4]["diff_status"] == "removed"
        assert rows[5]["diff_status"] == "unchanged"  # null-safe equality
        assert rows[6]["diff_status"] == "added"
        assert rows[6]["changed_cols"] == []
        # old/new value columns travel along
        assert rows[2]["s_old"] == "b" and rows[2]["s_new"] == "B"
        assert rows[4]["s_new"] is None and rows[4]["s_old"] == "d"

    def test_multi_column_change_sorted(self, spark):
        old = spark.createDataFrame([(1, "x", 1.0)], "k long, s string, v double")
        new = spark.createDataFrame([(1, "y", 2.0)], "k long, s string, v double")
        [r] = snapshot_diff(old, new, keys=["k"]).collect()
        assert r["changed_cols"] == ["s", "v"]

    def test_compare_cols_subset(self, spark, versions):
        old, new = versions
        rows = {
            r["k"]: r
            for r in snapshot_diff(
                old, new, keys=["k"], compare_cols=["v"]
            ).collect()
        }
        # s-only change is invisible when comparing v alone
        assert rows[2]["diff_status"] == "unchanged"
        assert rows[3]["diff_status"] == "changed"

    def test_validation(self, spark, versions):
        old, new = versions
        with pytest.raises(ValueError, match="keys"):
            snapshot_diff(old, new, keys=[])
        with pytest.raises(ValueError, match="compare_cols"):
            snapshot_diff(old, new, keys=["k"], compare_cols=["nope"])

    def test_summary(self, spark, versions):
        old, new = versions
        diff = snapshot_diff(old, new, keys=["k"])
        summ = {
            r["diff_status"]: r for r in snapshot_diff_summary(diff).collect()
        }
        assert summ["unchanged"]["n_keys"] == 2
        assert summ["changed"]["n_keys"] == 2
        assert summ["added"]["n_keys"] == 1
        assert summ["removed"]["n_keys"] == 1
        cc = {c["col"]: c["n"] for c in summ["changed"]["col_changes"]}
        assert cc == {"s": 1, "v": 1}
        assert summ["added"]["col_changes"] == []

    def test_single_join_plan(self, spark, versions):
        old, new = versions
        plan = (
            snapshot_diff(old, new, keys=["k"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Join") == 1
        assert "Python" not in plan
