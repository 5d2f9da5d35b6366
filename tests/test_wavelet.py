"""Haar DWT: hand-computed pyramid, power-of-two truncation,
reconstruction identity, energy shares."""

from __future__ import annotations

import datetime as dt

import pytest

from temporal_retriever_spark.wavelet import haar_dwt, haar_energy


def _series(spark, values, name="s"):
    base = dt.date(2024, 1, 1)
    rows = [
        (name, base + dt.timedelta(days=i), float(v)) for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, ["event_type", "ds", "y"])


def test_hand_computed_pyramid(spark):
    # x = [4, 2, 6, 8]:
    # level 1: a=[3, 7], d=[1, -1]
    # level 2: a=[5],    d=[-2]
    df = _series(spark, [4, 2, 6, 8])
    got = {
        (r.level, r.k): (r.approx, r.detail)
        for r in haar_dwt(df, levels=2).collect()
    }
    assert got == {
        (1, 0): (3.0, 1.0),
        (1, 1): (7.0, -1.0),
        (2, 0): (5.0, -2.0),
    }


def test_truncation_to_power_of_two(spark):
    # 7 values -> only the first 4 participate
    df = _series(spark, [4, 2, 6, 8, 100, 200, 300])
    got = {
        (r.level, r.k): (r.approx, r.detail)
        for r in haar_dwt(df, levels=2).collect()
    }
    assert got == {
        (1, 0): (3.0, 1.0),
        (1, 1): (7.0, -1.0),
        (2, 0): (5.0, -2.0),
    }


def test_reconstruction_identity(spark):
    # x[2k] = a[k] + d[k], x[2k+1] = a[k] - d[k] at every level
    values = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    df = _series(spark, values)
    rows = haar_dwt(df, levels=3).collect()
    lvl1 = sorted(
        [(r.k, r.approx, r.detail) for r in rows if r.level == 1]
    )
    rebuilt = []
    for _, a, d in lvl1:
        rebuilt += [a + d, a - d]
    assert rebuilt == values


def test_levels_stop_at_series_length(spark):
    df = _series(spark, [1, 2, 3, 4])  # length 4 -> levels 1, 2 only
    levels = {r.level for r in haar_dwt(df, levels=6).collect()}
    assert levels == {1, 2}
    with pytest.raises(ValueError):
        haar_dwt(df, levels=0)


def test_multi_series_independent(spark):
    a = _series(spark, [4, 2, 6, 8], name="a")
    b = _series(spark, [10, 10, 10, 10], name="b")
    rows = haar_dwt(a.unionByName(b), levels=1).collect()
    by = {(r.event_type, r.k): r.detail for r in rows}
    assert by[("a", 0)] == 1.0 and by[("a", 1)] == -1.0
    assert by[("b", 0)] == 0.0 and by[("b", 1)] == 0.0


def test_energy_shares(spark):
    df = _series(spark, [4, 2, 6, 8])
    got = {r.level: (r.energy, r.energy_share) for r in haar_energy(df, levels=2).collect()}
    # level 1 energy = 1 + 1 = 2; level 2 = 4; total 6
    assert got[1] == (2.0, pytest.approx(2 / 6))
    assert got[2] == (4.0, pytest.approx(4 / 6))
