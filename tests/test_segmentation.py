"""Binary segmentation: planted shifts recovered, stopping rules,
segment means, validation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.segmentation import binseg_changepoints, segment_means


def _series(spark, levels, wobble=0.1, name="s"):
    """Piecewise-constant series with deterministic small wobble."""
    rows = []
    i = 0
    for level, length in levels:
        for _ in range(length):
            y = level + wobble * math.sin(7.0 * (i + 1))
            rows.append((name, i, float(y)))
            i += 1
    return spark.createDataFrame(rows, "series_id string, ds int, y double")


def test_recovers_planted_shifts(spark):
    df = _series(spark, [(0.0, 30), (5.0, 25), (2.0, 35)])
    got = binseg_changepoints(df, penalty=10.0).orderBy("cp_index").collect()
    assert [r["cp_index"] for r in got] == [30, 55]
    assert all(r["gain"] > 10.0 for r in got)
    # ds column carries the split position's timestamp (0-based ints here)
    assert [r["ds"] for r in got] == [29, 54]


def test_no_shift_returns_empty(spark):
    df = _series(spark, [(1.0, 60)])
    got = binseg_changepoints(df, penalty=10.0).collect()
    assert got == []


def test_multiple_series_one_job(spark):
    a = _series(spark, [(0.0, 20), (4.0, 20)], name="a")
    b = _series(spark, [(1.0, 40)], name="b")
    c = _series(spark, [(0.0, 15), (3.0, 15), (-3.0, 15)], name="c")
    df = a.unionByName(b).unionByName(c)
    got = binseg_changepoints(df, penalty=8.0)
    by = {
        k: sorted(r["cp_index"] for r in rs)
        for k, rs in _group(got.collect()).items()
    }
    assert by.get("a") == [20]
    assert "b" not in by
    assert by.get("c") == [15, 30]


def _group(rows):
    out = {}
    for r in rows:
        out.setdefault(r["series_id"], []).append(r)
    return out


def test_max_changepoints_cap(spark):
    df = _series(spark, [(float(5 * i), 12) for i in range(6)])  # 5 real shifts
    got = binseg_changepoints(df, penalty=5.0, max_changepoints=2).collect()
    assert len(got) == 2


def test_min_segment_respected(spark):
    # shift at index 3 — invisible when min_segment=10
    df = _series(spark, [(0.0, 3), (8.0, 57)])
    got = binseg_changepoints(df, penalty=5.0, min_segment=10).collect()
    for r in got:
        assert r["cp_index"] >= 10
    df2 = _series(spark, [(0.0, 30), (8.0, 30)])
    got2 = binseg_changepoints(df2, penalty=5.0, min_segment=10).collect()
    assert [r["cp_index"] for r in got2] == [30]


def test_segment_means(spark):
    df = _series(spark, [(0.0, 30), (5.0, 30)], wobble=0.0)
    cps = binseg_changepoints(df, penalty=10.0)
    segs = segment_means(df, cps).orderBy("segment").collect()
    assert len(segs) == 2
    assert segs[0]["n"] == 30 and segs[0]["mean"] == pytest.approx(0.0, abs=1e-12)
    assert segs[1]["n"] == 30 and segs[1]["mean"] == pytest.approx(5.0, abs=1e-12)
    assert segs[0]["start_rn"] == 1 and segs[0]["end_rn"] == 30
    assert segs[1]["start_rn"] == 31 and segs[1]["end_rn"] == 60


def test_segment_means_no_changepoints(spark):
    df = _series(spark, [(2.0, 20)], wobble=0.0)
    cps = binseg_changepoints(df, penalty=10.0)
    segs = segment_means(df, cps).collect()
    assert len(segs) == 1
    assert segs[0]["mean"] == pytest.approx(2.0, abs=1e-12)


def test_validation(spark):
    df = _series(spark, [(0.0, 5)])
    with pytest.raises(ValueError, match="penalty"):
        binseg_changepoints(df, penalty=0.0)
    with pytest.raises(ValueError, match="min_segment"):
        binseg_changepoints(df, penalty=1.0, min_segment=0)
    with pytest.raises(ValueError, match="max_changepoints"):
        binseg_changepoints(df, penalty=1.0, max_changepoints=0)
