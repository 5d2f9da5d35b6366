"""CDC apply / merge and key-skew diagnostics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.history import apply_cdc, merge_cdc_snapshot
from temporal_retriever_spark.quality import key_skew_report


@pytest.fixture()
def changelog(spark):
    rows = [
        # key 1: insert then update -> value 11
        (1, "2024-01-01 00:00:00", "upsert", 10.0),
        (1, "2024-01-02 00:00:00", "upsert", 11.0),
        # key 2: insert then delete -> gone
        (2, "2024-01-01 00:00:00", "upsert", 20.0),
        (2, "2024-01-03 00:00:00", "delete", None),
        # key 3: delete then REinsert -> present
        (3, "2024-01-01 00:00:00", "delete", None),
        (3, "2024-01-02 00:00:00", "upsert", 33.0),
        # key 4: single insert
        (4, "2024-01-05 00:00:00", "upsert", 44.0),
    ]
    return spark.createDataFrame(
        rows, "k long, ts string, op string, v double"
    ).select("k", F.to_timestamp("ts").alias("ts"), "op", "v")


class TestApplyCdc:
    def test_last_writer_wins(self, spark, changelog):
        got = {r["k"]: r["v"] for r in apply_cdc(changelog, keys=["k"], ts_col="ts").collect()}
        assert got == {1: 11.0, 3: 33.0, 4: 44.0}

    def test_same_ts_seq_tiebreak(self, spark):
        rows = [
            (1, "2024-01-01 00:00:00", 1, "upsert", 100.0),
            (1, "2024-01-01 00:00:00", 2, "upsert", 200.0),
            (1, "2024-01-01 00:00:00", 3, "delete", None),
        ]
        df = spark.createDataFrame(
            rows, "k long, ts string, seq int, op string, v double"
        ).select("k", F.to_timestamp("ts").alias("ts"), "seq", "op", "v")
        assert apply_cdc(df, keys=["k"], ts_col="ts", seq_col="seq").count() == 0
        no_del = df.filter("op <> 'delete'")
        [r] = apply_cdc(no_del, keys=["k"], ts_col="ts", seq_col="seq").collect()
        assert r["v"] == 200.0

    def test_null_ts_fails_loud(self, spark):
        df = spark.createDataFrame(
            [(1, None, "upsert", 1.0)], "k long, ts timestamp, op string, v double"
        )
        with pytest.raises(Exception, match="NULL ts"):
            apply_cdc(df, keys=["k"], ts_col="ts").collect()

    def test_validation(self, spark, changelog):
        with pytest.raises(ValueError, match="keys"):
            apply_cdc(changelog, keys=[], ts_col="ts")

    def test_pre_shuffle_window_group_limit(self, spark, changelog):
        plan = (
            apply_cdc(changelog, keys=["k"], ts_col="ts")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan


class TestMergeSnapshot:
    def test_log_at_snapshot_ts_supersedes(self, spark, changelog):
        snap = spark.createDataFrame(
            [(1, "2024-01-02 00:00:00", 1.0), (9, "2024-01-01 00:00:00", 99.0)],
            "k long, ts string, v double",
        ).select("k", F.to_timestamp("ts").alias("ts"), "v")
        got = {
            r["k"]: r["v"]
            for r in merge_cdc_snapshot(
                snap, changelog, keys=["k"], ts_col="ts"
            ).collect()
        }
        # key 1: log upsert AT the snapshot ts wins (11 over 1)
        # key 9: snapshot-only key survives; key 2 deleted by the log
        assert got == {1: 11.0, 3: 33.0, 4: 44.0, 9: 99.0}
        # the synthesized seq column does not leak
        out = merge_cdc_snapshot(snap, changelog, keys=["k"], ts_col="ts")
        assert "_seq" not in out.columns and "op" not in out.columns


class TestKeySkew:
    def test_report(self, spark):
        rows = [("hot", i % 3) for i in range(90)] + [
            (f"u{i}", i) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "k string, g int")
        out = {r["key_col"]: r for r in key_skew_report(df, ["k", "g"]).collect()}
        k = out["k"]
        assert k["n_rows"] == 100 and k["n_keys"] == 11
        assert k["top_key"] == "hot" and k["top_count"] == 90
        assert math.isclose(k["top_share"], 0.9)
        assert math.isclose(k["skew_factor"], 90 * 11 / 100)
        g = out["g"]
        assert g["n_keys"] == 10  # 0..9 (0,1,2 reused by hot rows)
        assert g["top_count"] == 31  # g=0: 30 hot + 1 unique

    def test_null_keys_counted(self, spark):
        df = spark.createDataFrame(
            [(None,), ("a",), (None,)], "k string"
        )
        [r] = key_skew_report(df, ["k"]).collect()
        assert r["n_keys"] == 2 and r["n_rows"] == 3
