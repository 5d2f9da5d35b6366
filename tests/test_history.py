"""SCD2 history: version collapse, ranges, snapshots, null-safe
change detection."""

from __future__ import annotations

from datetime import datetime

import pytest

from temporal_retriever_spark.history import scd2_history, snapshot_at


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k long, ts timestamp, status string, tier string"
    )


ROWS = [
    (1, datetime(2024, 1, 1), "new", "a"),
    (1, datetime(2024, 1, 5), "new", "a"),      # unchanged -> collapsed
    (1, datetime(2024, 2, 1), "active", "a"),   # v2
    (1, datetime(2024, 3, 1), "active", "b"),   # v3 (tier change)
    (2, datetime(2024, 1, 10), "new", "a"),     # single version
]


def test_versions_and_ranges(spark):
    hist = scd2_history(
        _changes(spark, ROWS), key_cols=["k"], ts_col="ts"
    ).collect()
    by = {(r["k"], r["version"]): r for r in hist}
    assert len(by) == 4
    v1 = by[(1, 1)]
    assert (v1["status"], v1["tier"]) == ("new", "a")
    assert str(v1["valid_from"]) == "2024-01-01 00:00:00"
    assert str(v1["valid_to"]) == "2024-02-01 00:00:00"  # collapse skipped Jan 5
    assert v1["is_current"] is False
    v3 = by[(1, 3)]
    assert v3["tier"] == "b" and v3["valid_to"] is None and v3["is_current"]
    v21 = by[(2, 1)]
    assert v21["is_current"] and v21["valid_to"] is None


def test_no_collapse_keeps_every_observation(spark):
    hist = scd2_history(
        _changes(spark, ROWS), key_cols=["k"], ts_col="ts",
        collapse_unchanged=False,
    ).collect()
    assert len([r for r in hist if r["k"] == 1]) == 4


def test_snapshot_between_versions(spark):
    hist = scd2_history(_changes(spark, ROWS), key_cols=["k"], ts_col="ts")
    snap = {
        r["k"]: (r["status"], r["tier"])
        for r in snapshot_at(hist, datetime(2024, 2, 15)).collect()
    }
    assert snap == {1: ("active", "a"), 2: ("new", "a")}
    # exactly at a boundary: half-open -> the NEW version applies
    snap2 = {
        r["k"]: r["status"]
        for r in snapshot_at(hist, datetime(2024, 2, 1)).collect()
    }
    assert snap2[1] == "active"
    # before a key existed: absent
    snap3 = snapshot_at(hist, datetime(2024, 1, 5)).collect()
    assert {r["k"] for r in snap3} == {1}


def test_null_attrs_are_null_safe(spark):
    rows = [
        (1, datetime(2024, 1, 1), None, "a"),
        (1, datetime(2024, 1, 2), None, "a"),   # NULL == NULL: no new version
        (1, datetime(2024, 1, 3), "x", "a"),
    ]
    hist = scd2_history(
        _changes(spark, rows), key_cols=["k"], ts_col="ts"
    ).collect()
    assert len(hist) == 2


def test_tiebreak_same_timestamp(spark):
    rows = [
        (1, datetime(2024, 1, 1), "b", "a"),
        (1, datetime(2024, 1, 1), "a", "a"),
    ]
    df = spark.createDataFrame(
        rows, "k long, ts timestamp, status string, tier string"
    )
    hist = scd2_history(
        df, key_cols=["k"], ts_col="ts", attr_cols=["status"],
        tiebreak_cols=["status"],
    ).collect()
    first = [r for r in hist if r["version"] == 1][0]
    assert first["status"] == "a"  # deterministic: status ascending


def test_validation(spark):
    df = _changes(spark, ROWS)
    with pytest.raises(ValueError, match="key_cols"):
        scd2_history(df, key_cols=[])
    with pytest.raises(ValueError, match="attribute"):
        scd2_history(
            df, key_cols=["k", "status", "tier"], ts_col="ts"
        )
