"""Count-Min / Bloom sketches: exact mirror vs a Python reference
(same md5 hash family), CM guarantee, mergeability, no false
negatives."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.llm.sketch import (
    bloom_build,
    bloom_contains,
    bloom_merge,
    cms_build,
    cms_merge,
    cms_query,
)


def _h(value, seed: int, modulus: int) -> int:
    return (
        int(hashlib.md5(f"{seed}:{value}".encode()).hexdigest()[:8], 16) % modulus
    )


def _py_cms(values, depth, width, weights=None):
    sketch = Counter()
    weights = weights or [1.0] * len(values)
    for v, w in zip(values, weights):
        for i in range(depth):
            sketch[(i, _h(v, i, width))] += w
    return sketch


def _py_cms_est(sketch, value, depth, width):
    return min(sketch.get((i, _h(value, i, width)), 0.0) for i in range(depth))


WORDS = ["apple", "pear", "apple", "plum", "apple", "pear", "kiwi", "fig"]


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame([(w,) for w in WORDS], ["word"])


def test_cms_exact_mirror_of_python_reference(spark, words_df):
    depth, width = 3, 16  # narrow on purpose: collisions must match too
    sk = {
        (r.row_idx, r.bucket): r.cnt
        for r in cms_build(words_df, "word", depth=depth, width=width).collect()
    }
    assert sk == dict(_py_cms(WORDS, depth, width))


def test_cms_query_guarantee_and_exactness(spark, words_df):
    depth, width = 4, 2048
    sk = cms_build(words_df, "word", depth=depth, width=width)
    probes = spark.createDataFrame(
        [("apple",), ("pear",), ("plum",), ("kiwi",), ("fig",), ("durian",)],
        ["word"],
    )
    got = {
        r.word: r.cms_est
        for r in cms_query(sk, probes, "word", depth=depth, width=width).collect()
    }
    true = Counter(WORDS)
    for w, est in got.items():
        assert est >= true[w]  # CM never underestimates
    # width 2048 over 5 distinct items: no collisions -> exact
    assert got == {w: float(true[w]) for w in got}
    assert got["durian"] == 0.0  # unseen item


def test_cms_merge_equals_whole(spark):
    depth, width = 3, 32
    a = spark.createDataFrame([(w,) for w in WORDS[:4]], ["word"])
    b = spark.createDataFrame([(w,) for w in WORDS[4:]], ["word"])
    whole = spark.createDataFrame([(w,) for w in WORDS], ["word"])
    merged = {
        (r.row_idx, r.bucket): r.cnt
        for r in cms_merge(
            cms_build(a, "word", depth=depth, width=width),
            cms_build(b, "word", depth=depth, width=width),
        ).collect()
    }
    full = {
        (r.row_idx, r.bucket): r.cnt
        for r in cms_build(whole, "word", depth=depth, width=width).collect()
    }
    assert merged == full


def test_cms_weighted(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 3.0), ("b", 1.5)], ["word", "w"]
    )
    sk = cms_build(df, "word", depth=2, width=64, weight_col="w")
    probes = spark.createDataFrame([("a",), ("b",)], ["word"])
    got = {
        r.word: r.cms_est
        for r in cms_query(sk, probes, "word", depth=2, width=64).collect()
    }
    assert got == {"a": 5.0, "b": 1.5}


def test_bloom_no_false_negatives_and_mirror(spark, words_df):
    m, k = 256, 3
    bf = bloom_build(words_df, "word", num_bits=m, num_hashes=k)
    bits = {r.bit for r in bf.collect()}
    py_bits = {_h(w, i, m) for w in WORDS for i in range(k)}
    assert bits == py_bits
    probes = spark.createDataFrame(
        [(w,) for w in ["apple", "pear", "plum", "kiwi", "fig", "durian", "mango"]],
        ["word"],
    )
    got = {
        r.word: r.maybe_present
        for r in bloom_contains(bf, probes, "word", num_bits=m, num_hashes=k).collect()
    }
    for w in set(WORDS):
        assert got[w] is True  # no false negatives
    for w in ("durian", "mango"):  # mirror: verdict == python bloom verdict
        assert got[w] == all(_h(w, i, m) in py_bits for i in range(k))


def test_bloom_merge_is_union(spark):
    m, k = 128, 4
    a = spark.createDataFrame([("x",), ("y",)], ["v"])
    b = spark.createDataFrame([("z",)], ["v"])
    merged = {
        r.bit
        for r in bloom_merge(
            bloom_build(a, "v", num_bits=m, num_hashes=k),
            bloom_build(b, "v", num_bits=m, num_hashes=k),
        ).collect()
    }
    whole = {
        r.bit
        for r in bloom_build(
            spark.createDataFrame([("x",), ("y",), ("z",)], ["v"]),
            "v",
            num_bits=m,
            num_hashes=k,
        ).collect()
    }
    assert merged == whole


def test_bloom_null_and_bad_geometry(spark):
    df = spark.createDataFrame([("x",), (None,)], "v: string")
    bf = bloom_build(df, "v", num_bits=64, num_hashes=2)
    assert bf.count() <= 2  # only "x" contributes
    with pytest.raises(ValueError):
        bloom_build(df, "v", num_bits=0)
    with pytest.raises(ValueError):
        cms_build(df, "v", depth=0)


# --- HyperLogLog -----------------------------------------------------

from temporal_retriever_spark.llm.sketch import (  # noqa: E402
    hll_build,
    hll_estimate,
    hll_merge,
)


def _py_hll_register(value, m):
    return _h(value, 0, m)


def _py_hll_rank(value):
    s = hashlib.md5(f"1:{value}".encode()).hexdigest()[:15]
    rest = s.lstrip("0")
    if not rest:
        return 61
    z = len(s) - len(rest)
    bl = int(rest[0], 16).bit_length()
    return 4 * z + (4 - bl) + 1


def _py_hll(values, p):
    m = 1 << p
    regs = {}
    for v in values:
        r = _py_hll_register(v, m)
        regs[r] = max(regs.get(r, 0), _py_hll_rank(v))
    return regs


def test_hll_exact_mirror_of_python_reference(spark):
    p = 6
    vals = [f"item-{i}" for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {
        r.register: r.max_rank for r in hll_build(df, "v", p=p).collect()
    }
    assert got == _py_hll(vals, p)


def test_hll_estimate_within_standard_error(spark):
    p = 10  # m=1024, se ~ 3.25%
    n = 5000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], ["v"])
    est = hll_estimate(hll_build(df, "v", p=p), p=p).collect()[0][0]
    assert abs(est - n) / n < 0.10  # 3 standard errors

    # small-range regime: linear counting should be near-exact
    small = spark.createDataFrame([(f"s{i}",) for i in range(30)], ["v"])
    est2 = hll_estimate(hll_build(small, "v", p=p), p=p).collect()[0][0]
    assert abs(est2 - 30) < 2


def test_hll_merge_equals_whole_and_duplicates_free(spark):
    p = 8
    a = spark.createDataFrame([(f"x{i}",) for i in range(100)], ["v"])
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(50, 150)], ["v"]  # 50 overlap
    )
    whole = spark.createDataFrame([(f"x{i}",) for i in range(150)], ["v"])
    merged = {
        r.register: r.max_rank
        for r in hll_merge(
            hll_build(a, "v", p=p), hll_build(b, "v", p=p)
        ).collect()
    }
    full = {
        r.register: r.max_rank for r in hll_build(whole, "v", p=p).collect()
    }
    assert merged == full  # merge is exactly the sketch of the union


def test_hll_keyed(spark):
    p = 9
    rows = [("a", f"u{i}") for i in range(400)] + [
        ("b", f"u{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    sk = hll_build(df, "v", p=p, key_cols=("k",))
    got = {r.k: r.hll_est for r in hll_estimate(sk, p=p).collect()}
    assert abs(got["a"] - 400) / 400 < 0.15
    assert abs(got["b"] - 40) < 6


def test_hll_validation_and_nulls(spark):
    df = spark.createDataFrame([("x",), (None,)], "v: string")
    assert hll_build(df, "v", p=4).count() == 1
    with pytest.raises(ValueError):
        hll_build(df, "v", p=3)
    with pytest.raises(ValueError):
        hll_estimate(hll_build(df, "v", p=4), p=17)


# --- histogram quantile sketch ---------------------------------------

from temporal_retriever_spark.llm.sketch import (  # noqa: E402
    hist_build,
    hist_merge,
    hist_quantiles,
)


def test_hist_build_counts_and_clamp(spark):
    df = spark.createDataFrame(
        [(v,) for v in [-5.0, 0.0, 1.0, 2.5, 9.9, 10.0, 50.0, None]],
        "v: double",
    )
    got = {r.bin: r.cnt for r in hist_build(df, "v", lo=0.0, hi=10.0, bins=10).collect()}
    # -5 clamps to bin 0; 10.0 and 50.0 clamp to bin 9; NULL dropped
    assert got == {0: 2.0, 1: 1.0, 2: 1.0, 9: 3.0}


def test_hist_merge_equals_whole(spark):
    a = spark.createDataFrame([(float(i),) for i in range(50)], "v: double")
    b = spark.createDataFrame([(float(i),) for i in range(30, 100)], "v: double")
    whole = spark.createDataFrame(
        [(float(i),) for i in list(range(50)) + list(range(30, 100))],
        "v: double",
    )
    kw = dict(lo=0.0, hi=100.0, bins=20)
    merged = {
        r.bin: r.cnt
        for r in hist_merge(
            hist_build(a, "v", **kw), hist_build(b, "v", **kw)
        ).collect()
    }
    full = {r.bin: r.cnt for r in hist_build(whole, "v", **kw).collect()}
    assert merged == full


def test_hist_quantiles_uniform_within_bin_width(spark):
    import numpy as np

    n, bins = 5000, 100
    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 1000, n)
    df = spark.createDataFrame([(float(v),) for v in vals], "v: double")
    sk = hist_build(df, "v", lo=0.0, hi=1000.0, bins=bins)
    got = {
        r.q: r.q_est
        for r in hist_quantiles(
            sk, (0.1, 0.5, 0.9), lo=0.0, hi=1000.0, bins=bins
        ).collect()
    }
    width = 1000.0 / bins
    for q in (0.1, 0.5, 0.9):
        true = float(np.quantile(vals, q))
        assert abs(got[q] - true) <= width + 1e-9, (q, got[q], true)


def test_hist_quantiles_keyed_and_extremes(spark):
    rows = [("a", float(i)) for i in range(100)] + [("b", 5.0)] * 10
    df = spark.createDataFrame(rows, "k string, v double")
    sk = hist_build(df, "v", lo=0.0, hi=100.0, bins=50, key_cols=("k",))
    got = {
        (r.k, r.q): r.q_est
        for r in hist_quantiles(
            sk, (0.0, 0.5, 1.0), lo=0.0, hi=100.0, bins=50
        ).collect()
    }
    # q=1.0 of key a: last value 99 sits in bin 49 -> est <= 100
    assert 98.0 <= got[("a", 1.0)] <= 100.0
    assert 48.0 <= got[("a", 0.5)] <= 52.0
    # all of b's mass is one bin: every quantile inside [4, 6]
    for q in (0.0, 0.5, 1.0):
        assert 4.0 <= got[("b", q)] <= 6.0


def test_hist_validation(spark):
    df = spark.createDataFrame([(1.0,)], "v: double")
    with pytest.raises(ValueError):
        hist_build(df, "v", lo=0.0, hi=0.0)
    with pytest.raises(ValueError):
        hist_build(df, "v", lo=0.0, hi=1.0, bins=0)
    sk = hist_build(df, "v", lo=0.0, hi=1.0, bins=4)
    with pytest.raises(ValueError):
        hist_quantiles(sk, (), lo=0.0, hi=1.0, bins=4)
    with pytest.raises(ValueError):
        hist_quantiles(sk, (1.5,), lo=0.0, hi=1.0, bins=4)
