from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

from temporal_retriever_spark.tsfeatures import (
    hurst_rs,
    sax_breakpoints,
    sax_words,
    ts_features,
)


def _series_df(spark, values, key="a", start=dt.date(2024, 1, 1)):
    rows = [
        (key, start + dt.timedelta(days=i), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "event_type string, ds date, y double")


def _sax_ref(values, word_len, alphabet):
    y = np.asarray(values, float)
    n = len(y)
    sig = y.std()
    z = (y - y.mean()) / sig if sig > 0 else np.zeros(n)
    segs = (np.arange(n) * word_len) // n
    bps = sax_breakpoints(alphabet)
    word = ""
    for s in sorted(set(segs)):
        pz = z[segs == s].mean()
        sym = sum(1 for b in bps if pz >= b)
        word += chr(97 + sym)
    return word


class TestSaxWords:
    def test_matches_reference(self, spark):
        rng = np.random.default_rng(7)
        vals = np.cumsum(rng.normal(size=64))
        got = sax_words(
            _series_df(spark, vals), word_len=8, alphabet=4
        ).collect()
        assert len(got) == 1
        assert got[0]["n"] == 64
        assert got[0]["sax_word"] == _sax_ref(vals, 8, 4)

    def test_shape_sensitivity(self, spark):
        up = sax_words(_series_df(spark, range(32)), word_len=4, alphabet=4)
        down = sax_words(
            _series_df(spark, range(32, 0, -1)), word_len=4, alphabet=4
        )
        assert up.collect()[0]["sax_word"] == "aabd"[0:1] + up.collect()[0][
            "sax_word"
        ][1:]  # monotone up starts at the lowest symbol
        assert up.collect()[0]["sax_word"][0] == "a"
        assert up.collect()[0]["sax_word"][-1] == "d"
        assert down.collect()[0]["sax_word"][0] == "d"
        assert down.collect()[0]["sax_word"][-1] == "a"

    def test_constant_series_mid_symbol(self, spark):
        got = sax_words(
            _series_df(spark, [5.0] * 16), word_len=4, alphabet=4
        ).collect()[0]
        # z == 0 everywhere; 0 >= bp for the lower half of 4 breakpoints
        assert got["sax_word"] == "cccc"

    def test_short_series_shorter_word(self, spark):
        got = sax_words(
            _series_df(spark, [1.0, 2.0, 3.0]), word_len=8, alphabet=3
        ).collect()[0]
        assert len(got["sax_word"]) == 3

    def test_multi_series_independent(self, spark):
        df = _series_df(spark, range(16), key="a").union(
            _series_df(spark, range(16, 0, -1), key="b")
        )
        got = {
            r["event_type"]: r["sax_word"]
            for r in sax_words(df, word_len=4, alphabet=4).collect()
        }
        assert got["a"] == _sax_ref(list(range(16)), 4, 4)
        assert got["b"] == _sax_ref(list(range(16, 0, -1)), 4, 4)

    def test_validation(self, spark):
        df = _series_df(spark, [1.0])
        with pytest.raises(ValueError):
            sax_words(df, word_len=0)
        with pytest.raises(ValueError):
            sax_words(df, alphabet=1)
        with pytest.raises(ValueError):
            sax_words(df, series_cols=())


def _tsfeat_ref(values, tile_width=7, flat_bins=10):
    y = np.asarray(values, float)
    n = len(y)
    mean = y.mean()
    std = y.std(ddof=1)
    dev = y - mean
    acf1 = (dev[1:] * dev[:-1]).sum() / (dev * dev).sum()
    i = np.arange(n, dtype=float)
    sxx = ((i - i.mean()) ** 2).sum()
    sxy = ((i - i.mean()) * dev).sum()
    r2 = sxy**2 / (sxx * (dev * dev).sum())
    z = (y - mean) / std if std > 0 else np.zeros(n)
    tiles = [
        z[k : k + tile_width]
        for k in range(0, n - tile_width + 1, tile_width)
        if len(z[k : k + tile_width]) == tile_width
    ]
    tmeans = np.array([t.mean() for t in tiles])
    tvars = np.array([t.var() for t in tiles])
    stability = tmeans.var() if len(tiles) >= 2 else None
    lumpiness = tvars.var() if len(tiles) >= 2 else None
    med = np.quantile(y, 0.5)
    above = y > med
    crossing = int((above[1:] != above[:-1]).sum())
    span = y.max() - y.min()
    if span > 0:
        bins = np.minimum(
            np.floor((y - y.min()) * flat_bins / span), flat_bins - 1
        )
    else:
        bins = np.zeros(n)
    best = run = 1
    for k in range(1, n):
        run = run + 1 if bins[k] == bins[k - 1] else 1
        best = max(best, run)
    return dict(
        n=n, mean=mean, std=std, acf1=acf1, trend_r2=r2,
        stability=stability, lumpiness=lumpiness,
        crossing_points=crossing, flat_spots=best,
    )


class TestTsFeatures:
    def test_matches_reference(self, spark):
        rng = np.random.default_rng(11)
        vals = np.cumsum(rng.normal(size=60)) + 0.4 * np.arange(60)
        got = ts_features(_series_df(spark, vals)).collect()[0]
        ref = _tsfeat_ref(vals)
        for k in ("mean", "std", "acf1", "trend_r2", "stability", "lumpiness"):
            assert got[k] == pytest.approx(ref[k], rel=1e-9), k
        assert got["n"] == ref["n"]
        assert got["crossing_points"] == ref["crossing_points"]
        assert got["flat_spots"] == ref["flat_spots"]
        assert got["cv"] == pytest.approx(ref["std"] / abs(ref["mean"]))

    def test_trendy_vs_noise(self, spark):
        rng = np.random.default_rng(3)
        df = _series_df(spark, np.arange(56.0), key="trend").union(
            _series_df(spark, rng.normal(size=56), key="noise")
        )
        got = {r["event_type"]: r for r in ts_features(df).collect()}
        assert got["trend"]["trend_r2"] > 0.99
        assert got["noise"]["trend_r2"] < 0.3
        assert abs(got["noise"]["acf1"]) < 0.4

    def test_constant_series(self, spark):
        got = ts_features(_series_df(spark, [4.0] * 20)).collect()[0]
        assert got["acf1"] is None and got["trend_r2"] is None
        assert got["flat_spots"] == 20
        assert got["crossing_points"] == 0

    def test_short_series_null_tiles(self, spark):
        got = ts_features(
            _series_df(spark, [1.0, 5.0, 2.0, 8.0]), tile_width=7
        ).collect()[0]
        assert got["stability"] is None and got["lumpiness"] is None

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            ts_features(_series_df(spark, [1.0]), tile_width=1)


def _hurst_ref(values, sizes):
    y = np.asarray(values, float)
    pts = []
    for m in sizes:
        rs = []
        for b in range(len(y) // m):
            blk = y[b * m : (b + 1) * m]
            s = blk.std()
            if s > 0:
                w = np.cumsum(blk - blk.mean())
                rs.append((w.max() - w.min()) / s)
        if rs and np.mean(rs) > 0:
            pts.append((math.log(m), math.log(np.mean(rs))))
    if len(pts) < 2:
        return None
    x, yy = np.array(pts).T
    return float(np.polyfit(x, yy, 1)[0])


class TestHurstRs:
    def test_matches_reference(self, spark):
        rng = np.random.default_rng(5)
        vals = np.cumsum(rng.normal(size=256))
        got = hurst_rs(
            _series_df(spark, vals), block_sizes=(8, 16, 32, 64)
        ).collect()[0]
        assert got["n_sizes"] == 4
        assert got["hurst"] == pytest.approx(
            _hurst_ref(vals, (8, 16, 32, 64)), rel=1e-9
        )

    def test_persistent_vs_antipersistent(self, spark):
        rng = np.random.default_rng(9)
        walk = np.cumsum(rng.normal(size=512))  # H ~ 0.5+
        noise = rng.normal(size=512)  # white noise: H well below walk's
        df = _series_df(spark, walk, key="walk").union(
            _series_df(spark, noise, key="noise")
        )
        got = {r["event_type"]: r["hurst"] for r in hurst_rs(df).collect()}
        assert got["walk"] > got["noise"]
        assert got["walk"] > 0.7  # R/S of a random walk trends high

    def test_too_few_sizes_null(self, spark):
        # 20 points: only the m=16 block completes -> 1 usable size
        got = hurst_rs(
            _series_df(spark, np.sin(np.arange(20.0))),
            block_sizes=(16, 32, 64),
        ).collect()[0]
        assert got["hurst"] is None and got["n_sizes"] == 1

    def test_validation(self, spark):
        df = _series_df(spark, [1.0])
        with pytest.raises(ValueError):
            hurst_rs(df, block_sizes=(8,))
        with pytest.raises(ValueError):
            hurst_rs(df, block_sizes=(1, 8))
