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


def test_max_series_guard(spark):
    # 6 tiny series against max_series=5: the driver-state cap raises
    # before bookkeeping dicts are built (and before any split rounds).
    many = spark.range(6 * 4).select(
        F.concat(F.lit("s"), (F.col("id") / 4).cast("int").cast("string")).alias(
            "series_id"
        ),
        (F.col("id") % 4).alias("ds"),
        (F.col("id") % 4).cast("double").alias("y"),
    )
    with pytest.raises(ValueError, match="max_series"):
        binseg_changepoints(many, penalty=1.0, max_series=5)
    # raising the cap restores normal operation on the same frame
    binseg_changepoints(many, penalty=1000.0, max_series=10).collect()


from temporal_retriever_spark.segmentation import rfm_scores


class TestRfmScores:
    def test_scores_and_segments(self, spark):
        import datetime

        t0 = datetime.datetime(2024, 1, 1)

        def at(days):
            return t0 + datetime.timedelta(days=days)

        rows = []
        # champion: recent + frequent + big spender
        for i in range(20):
            rows.append(("champ", at(80 + i % 10), 100.0))
        # hibernating: one old event
        rows.append(("sleeper", at(0), 5.0))
        # regular-ish users spread out
        import random

        rng = random.Random(3)
        for u in range(20):
            for _ in range(rng.randint(2, 8)):
                rows.append((f"u{u}", at(rng.randint(10, 85)), rng.uniform(1, 50)))
        df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
        got = {r["user_id"]: r for r in rfm_scores(df).collect()}
        ch, sl = got["champ"], got["sleeper"]
        assert ch["r_score"] == 5 and ch["f_score"] == 5 and ch["m_score"] == 5
        assert ch["segment"] == "champion"
        assert sl["r_score"] == 1 and sl["f_score"] == 1
        assert sl["segment"] == "hibernating"
        assert ch["recency_days"] == 0 - 0 + (89 - 89)  # most recent = 0 days
        assert sl["frequency"] == 1 and sl["monetary"] == 5.0
        # every score in range
        for r in got.values():
            assert 1 <= r["r_score"] <= 5
            assert 1 <= r["f_score"] <= 5
            assert 1 <= r["m_score"] <= 5

    def test_validation(self, spark):
        import datetime

        df = spark.createDataFrame(
            [("u", datetime.datetime(2024, 1, 1), 1.0)],
            "user_id string, ts timestamp, value double",
        )
        import pytest as _pt

        with _pt.raises(ValueError):
            rfm_scores(df, n_bins=1)
