"""Two-sample tests (inference.py) vs scipy-free naive references,
plus plan-shape guards for the distinct-value aggregation design."""

from __future__ import annotations

import bisect
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.inference import ks_2sample, mann_whitney_u


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def samples():
    rng = random.Random(7)
    rows = [("a", round(rng.gauss(0, 1), 2)) for _ in range(300)] + [
        ("b", round(rng.gauss(0.3, 1.2), 2)) for _ in range(250)
    ]
    return rows


@pytest.fixture(scope="module")
def sdf(spark, samples):
    return spark.createDataFrame(samples, "grp string, v double")


def _naive_ks(rows):
    av = sorted(v for g, v in rows if g == "a")
    bv = sorted(v for g, v in rows if g == "b")
    xs = sorted({v for _, v in rows})
    d = max(
        abs(
            bisect.bisect_right(av, x) / len(av)
            - bisect.bisect_right(bv, x) / len(bv)
        )
        for x in xs
    )
    en = math.sqrt(len(av) * len(bv) / (len(av) + len(bv)))
    lam = (en + 0.12 + 0.11 / en) * d
    if lam <= 0.2:
        return len(av), len(bv), d, 1.0
    p = 2 * sum(
        (-1) ** (j - 1) * math.exp(-2 * j * j * lam * lam) for j in range(1, 101)
    )
    return len(av), len(bv), d, min(1.0, max(0.0, p))


def _naive_mwu(rows):
    av = [v for g, v in rows if g == "a"]
    bv = [v for g, v in rows if g == "b"]
    cnt = Counter(v for _, v in rows)
    ranks, i = {}, 0
    for v in sorted(cnt):
        ranks[v] = i + (cnt[v] + 1) / 2
        i += cnt[v]
    n1, n2 = len(av), len(bv)
    n = n1 + n2
    r1 = sum(ranks[v] for v in av)
    u1 = r1 - n1 * (n1 + 1) / 2
    ties = sum(c**3 - c for c in cnt.values())
    var = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    d = u1 - n1 * n2 / 2
    d += -0.5 if d > 0 else (0.5 if d < 0 else 0.0)
    z = d / math.sqrt(var)
    t = 1 / (1 + 0.2316419 * abs(z))
    b = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    sf = (
        math.exp(-z * z / 2)
        * 0.3989422804014327
        * (b[0] * t + b[1] * t**2 + b[2] * t**3 + b[3] * t**4 + b[4] * t**5)
    )
    return n1, n2, u1, z, min(1.0, 2 * sf)


def test_ks_matches_naive(sdf, samples):
    n1, n2, d, p = _naive_ks(samples)
    row = ks_2sample(sdf, "v", "grp", "a", "b").collect()[0]
    assert (row.n_a, row.n_b) == (n1, n2)
    assert row.d_stat == pytest.approx(d, abs=1e-12)
    assert row.p_value == pytest.approx(p, abs=1e-12)


def test_mwu_matches_naive(sdf, samples):
    n1, n2, u1, z, p = _naive_mwu(samples)
    row = mann_whitney_u(sdf, "v", "grp", "a", "b").collect()[0]
    assert (row.n_a, row.n_b) == (n1, n2)
    assert row.u_stat == pytest.approx(u1, abs=1e-9)
    assert row.z_score == pytest.approx(z, abs=1e-12)
    assert row.p_value == pytest.approx(p, abs=1e-12)


def test_ks_identical_samples_high_p(spark):
    rows = [(g, float(v % 13)) for g in ("a", "b") for v in range(200)]
    df = spark.createDataFrame(rows, "grp string, v double")
    row = ks_2sample(df, "v", "grp", "a", "b").collect()[0]
    assert row.d_stat == 0.0
    assert row.p_value == 1.0


def test_mwu_identical_samples_z_zero(spark):
    rows = [(g, float(v % 13)) for g in ("a", "b") for v in range(200)]
    df = spark.createDataFrame(rows, "grp string, v double")
    row = mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    assert row.z_score == 0.0
    # the A&S polynomial CDF is exact to ~7.5e-8, not at the boundary
    assert row.p_value == pytest.approx(1.0, abs=1e-6)


def test_keyed_matches_per_key_naive(spark, samples):
    rows = [(g, i % 2, v) for i, (g, v) in enumerate(samples)]
    df = spark.createDataFrame(rows, "grp string, k int, v double")
    got = {r.k: r for r in ks_2sample(df, "v", "grp", "a", "b", keys=["k"]).collect()}
    for k in (0, 1):
        sub = [(g, v) for g, kk, v in rows if kk == k]
        n1, n2, d, p = _naive_ks(sub)
        assert (got[k].n_a, got[k].n_b) == (n1, n2)
        assert got[k].d_stat == pytest.approx(d, abs=1e-12)
        assert got[k].p_value == pytest.approx(p, abs=1e-12)


def test_other_groups_ignored_and_nulls_dropped(spark):
    rows = [("a", 1.0), ("b", 2.0), ("c", 99.0), ("a", None), ("b", 3.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    row = ks_2sample(df, "v", "grp", "a", "b").collect()[0]
    assert (row.n_a, row.n_b) == (1, 2)


def test_mwu_shift_direction(spark):
    # group b strictly larger -> ranks of a low -> u_stat small, z < 0
    rows = [("a", float(i)) for i in range(50)] + [
        ("b", float(i + 100)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    row = mann_whitney_u(df, "v", "grp", "a", "b").collect()[0]
    assert row.u_stat == 0.0
    assert row.z_score < -7
    assert row.p_value < 1e-6


def test_plans_native_single_value_shuffle(sdf):
    # both tests: no Python workers, and the raw data shuffles once
    # (on the value); later exchanges only carry distinct values
    for fn in (ks_2sample, mann_whitney_u):
        plan = _plan(fn(sdf, "v", "grp", "a", "b"))
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan


def test_collocations_pmi_naive(spark):
    rows = [
        (1, "New York is big New York is loud"),
        (2, "old york is quiet new york sleeps"),
        (3, "new york new york New YORK"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from temporal_retriever_spark.llm.text import collocations_pmi

    got = {
        (r.w1, r.w2): (r.pair_cnt, r.pmi)
        for r in collocations_pmi(df, min_count=2).collect()
    }
    # naive reference
    docs = [r[1].lower().split() for r in rows]
    uni = Counter(w for d in docs for w in d)
    bi = Counter((d[i], d[i + 1]) for d in docs for i in range(len(d) - 1))
    nun = sum(uni.values())
    nbi = sum(bi.values())
    for (w1, w2), c in bi.items():
        if c >= 2:
            pmi = math.log((c / nbi) / ((uni[w1] / nun) * (uni[w2] / nun)))
            assert got[(w1, w2)][0] == c
            assert got[(w1, w2)][1] == pytest.approx(pmi, abs=1e-12)
    assert set(got) == {k for k, c in bi.items() if c >= 2}
    # high-PMI sanity: 'new york' should beat 'is big'
    assert got[("new", "york")][1] > 0


def test_collocations_pmi_broadcast_plan(spark):
    rows = [(i, "alpha beta gamma delta " * 3) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from temporal_retriever_spark.llm.text import collocations_pmi

    plan = _plan(collocations_pmi(df, min_count=2))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # both probability joins and both totals are broadcasts: the bigram
    # count table never reshuffles after its aggregation
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("BroadcastNestedLoopJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_chi2_matches_naive(spark):
    rng = random.Random(11)
    rows = [
        (rng.choice("abc"), rng.choice(["x", "y", "z", "w"])) for _ in range(400)
    ]
    df = spark.createDataFrame(rows, "a string, b string")
    from temporal_retriever_spark.inference import chi2_independence
    from temporal_retriever_spark.stats import chi2_sf

    obs = Counter(rows)
    ra = Counter(a for a, _ in rows)
    cb = Counter(b for _, b in rows)
    n = len(rows)
    chi2 = sum(
        (obs.get((a, b), 0) - ra[a] * cb[b] / n) ** 2 / (ra[a] * cb[b] / n)
        for a in ra
        for b in cb
    )
    dof = (len(ra) - 1) * (len(cb) - 1)
    row = chi2_independence(df, "a", "b", dof=dof).collect()[0]
    assert (row.n, row.dof) == (n, dof)
    assert row.chi2 == pytest.approx(chi2, abs=1e-9)
    assert row.cramers_v == pytest.approx(
        math.sqrt(chi2 / (n * min(len(ra) - 1, len(cb) - 1))), abs=1e-12
    )
    assert row.p_value == pytest.approx(chi2_sf(chi2, dof), abs=1e-6)


def test_chi2_zero_cells_counted(spark):
    # (a2, y) never occurs -> its expected mass must still enter chi2
    rows = [("a1", "x")] * 10 + [("a1", "y")] * 10 + [("a2", "x")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    from temporal_retriever_spark.inference import chi2_independence

    row = chi2_independence(df, "a", "b").collect()[0]
    # naive with the zero cell: e(a2,y)=10*20/30? -> marginals: a2=10, y=10
    ra = {"a1": 20, "a2": 10}
    cb = {"x": 20, "y": 10}
    obs = {("a1", "x"): 10, ("a1", "y"): 10, ("a2", "x"): 10}
    chi2 = sum(
        (obs.get((a, b), 0) - ra[a] * cb[b] / 30) ** 2 / (ra[a] * cb[b] / 30)
        for a in ra
        for b in cb
    )
    assert row.chi2 == pytest.approx(chi2, abs=1e-12)
    assert row.dof == 1


def test_chi2_wilson_hilferty_path(spark):
    rng = random.Random(3)
    rows = [(rng.choice("ab"), rng.choice("xy")) for _ in range(300)]
    df = spark.createDataFrame(rows, "a string, b string")
    from temporal_retriever_spark.inference import chi2_independence
    from temporal_retriever_spark.stats import chi2_sf

    row = chi2_independence(df, "a", "b").collect()[0]  # runtime dof
    assert row.p_value == pytest.approx(chi2_sf(row.chi2, row.dof), abs=2e-3)


def test_chi2_dof_mismatch_raises(spark):
    rows = [("a1", "x"), ("a1", "y"), ("a2", "x"), ("a2", "y")]
    df = spark.createDataFrame(rows, "a string, b string")
    from temporal_retriever_spark.inference import chi2_independence

    with pytest.raises(Exception):
        chi2_independence(df, "a", "b", dof=24).collect()


def test_jsd_naive_and_bounds(spark):
    from temporal_retriever_spark.inference import js_divergence

    # identical distributions -> 0 bits
    rows = [("a", t) for t in "xxyyz"] + [("b", t) for t in "xxyyz"]
    df = spark.createDataFrame(rows, "grp string, tok string")
    row = js_divergence(df, "tok", "grp", "a", "b").collect()[0]
    assert row.jsd_bits == pytest.approx(0.0, abs=1e-15)

    # disjoint vocabularies -> exactly 1 bit
    rows = [("a", t) for t in "xxyy"] + [("b", t) for t in "uuvv"]
    df = spark.createDataFrame(rows, "grp string, tok string")
    row = js_divergence(df, "tok", "grp", "a", "b").collect()[0]
    assert row.jsd_bits == pytest.approx(1.0, abs=1e-12)

    # naive cross-check on a random pair of distributions
    rng = random.Random(5)
    rows = [("a", rng.choice("pqrs")) for _ in range(200)] + [
        ("b", rng.choice("qrst")) for _ in range(150)
    ]
    df = spark.createDataFrame(rows, "grp string, tok string")
    ca = Counter(t for g, t in rows if g == "a")
    cb = Counter(t for g, t in rows if g == "b")
    na, nb = sum(ca.values()), sum(cb.values())
    jsd = 0.0
    for t in set(ca) | set(cb):
        p, q = ca.get(t, 0) / na, cb.get(t, 0) / nb
        if p > 0:
            jsd += 0.5 * p * math.log2(2 * p / (p + q))
        if q > 0:
            jsd += 0.5 * q * math.log2(2 * q / (p + q))
    row = js_divergence(df, "tok", "grp", "a", "b").collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.jsd_bits == pytest.approx(jsd, abs=1e-12)


def test_prop_ztest_matches_naive(spark):
    rng = random.Random(9)
    rows = [("a", 1 if rng.random() < 0.30 else 0) for _ in range(400)] + [
        ("b", 1 if rng.random() < 0.36 else 0) for _ in range(350)
    ]
    df = spark.createDataFrame(rows, "grp string, s int")
    from temporal_retriever_spark.inference import prop_ztest

    n1 = 400
    x1 = sum(s for g, s in rows if g == "a")
    n2 = 350
    x2 = sum(s for g, s in rows if g == "b")
    p1, p2 = x1 / n1, x2 / n2
    pp = (x1 + x2) / (n1 + n2)
    z = (p1 - p2) / math.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
    t = 1 / (1 + 0.2316419 * abs(z))
    b = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
    sf = (
        math.exp(-z * z / 2)
        * 0.3989422804014327
        * (b[0] * t + b[1] * t**2 + b[2] * t**3 + b[3] * t**4 + b[4] * t**5)
    )
    row = prop_ztest(df, "s", "grp", "a", "b").collect()[0]
    assert (row.n_a, row.x_a, row.n_b, row.x_b) == (n1, x1, n2, x2)
    assert row.z_score == pytest.approx(z, abs=1e-12)
    assert row.p_value == pytest.approx(min(1.0, 2 * sf), abs=1e-12)


def test_prop_ztest_degenerate_variance(spark):
    # all successes in both groups -> pooled variance 0 -> z = 0, p = 1
    rows = [("a", 1)] * 10 + [("b", 1)] * 10
    df = spark.createDataFrame(rows, "grp string, s int")
    from temporal_retriever_spark.inference import prop_ztest

    row = prop_ztest(df, "s", "grp", "a", "b").collect()[0]
    assert row.z_score == 0.0
    assert row.p_value == pytest.approx(1.0, abs=1e-6)


def test_psi_matches_naive_with_empty_bins(spark):
    rng = random.Random(13)
    # disjoint-ish supports with unequal n -> empty bins matter
    vals = [("a", rng.uniform(0, 1)) for _ in range(500)] + [
        ("b", rng.uniform(3, 4)) for _ in range(300)
    ]
    df = spark.createDataFrame(vals, "grp string, v double")
    from temporal_retriever_spark.inference import psi as psi_op

    bins = 10
    lo = min(v for _, v in vals)
    hi = max(v for _, v in vals)
    width = (hi - lo) / bins

    def binof(v):
        return max(0, min(bins - 1, int(math.floor((v - lo) / width))))

    ca = Counter(binof(v) for g, v in vals if g == "a")
    cb = Counter(binof(v) for g, v in vals if g == "b")
    na, nb = 500, 300
    expect = sum(
        ((ca.get(i, 0) + 0.5) / (na + 5.0) - (cb.get(i, 0) + 0.5) / (nb + 5.0))
        * math.log(
            ((ca.get(i, 0) + 0.5) / (na + 5.0))
            / ((cb.get(i, 0) + 0.5) / (nb + 5.0))
        )
        for i in range(bins)
    )
    row = psi_op(df, "v", "grp", "a", "b", bins=bins).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert row.psi == pytest.approx(expect, abs=1e-12)
    assert row.psi > 0.25  # far-drifted pair lands in the "drifted" band


def test_psi_identical_distributions_zero(spark):
    rows = [(g, float(i % 7)) for g in ("a", "b") for i in range(210)]
    df = spark.createDataFrame(rows, "grp string, v double")
    from temporal_retriever_spark.inference import psi as psi_op

    row = psi_op(df, "v", "grp", "a", "b", bins=7).collect()[0]
    assert row.psi == pytest.approx(0.0, abs=1e-15)


def test_psi_static_bounds_and_clamp(spark):
    # values beyond [lo, hi] clamp into the boundary bins
    rows = [("a", -5.0), ("a", 0.5), ("b", 0.5), ("b", 99.0)]
    df = spark.createDataFrame(rows, "grp string, v double")
    from temporal_retriever_spark.inference import psi as psi_op

    row = psi_op(df, "v", "grp", "a", "b", bins=4, lo=0.0, hi=1.0).collect()[0]
    ca, cb = {0: 2}, {1: 1, 3: 1}
    # -5 clamps to bin 0; 0.5 -> bin 2? floor(0.5/0.25)=2; 99 clamps to 3
    ca = {0: 1, 2: 1}
    cb = {2: 1, 3: 1}
    expect = sum(
        ((ca.get(i, 0) + 0.5) / (2 + 2.0) - (cb.get(i, 0) + 0.5) / (2 + 2.0))
        * math.log(
            ((ca.get(i, 0) + 0.5) / (2 + 2.0)) / ((cb.get(i, 0) + 0.5) / (2 + 2.0))
        )
        for i in range(4)
    )
    assert row.psi == pytest.approx(expect, abs=1e-12)


def test_fdr_bh_matches_naive(spark):
    from temporal_retriever_spark.inference import fdr_bh

    ps = [0.01, 0.04, 0.03, 0.20, 0.20, 0.9, 0.005]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(ps)], "test_id int, p_value double"
    )
    got = {
        r.test_id: r.p_adj
        for r in fdr_bh(df, "p_value", tiebreak=["test_id"]).collect()
    }
    # naive BH
    m = len(ps)
    order = sorted(range(m), key=lambda i: (ps[i], i))
    adj = [0.0] * m
    run = 1.0
    for rank in range(m, 0, -1):
        i = order[rank - 1]
        run = min(run, ps[i] * m / rank)
        adj[i] = run
    for i in range(m):
        assert got[i] == pytest.approx(adj[i], abs=1e-15), i
    # monotone in p, clamped at 1
    assert max(got.values()) <= 1.0
    assert got[6] <= got[0] <= got[2]


def test_fdr_bh_keyed_families_independent(spark):
    from temporal_retriever_spark.inference import fdr_bh

    rows = [("f1", 1, 0.02), ("f1", 2, 0.5), ("g2", 1, 0.02), ("g2", 2, 0.5)]
    df = spark.createDataFrame(rows, "fam string, tid int, p_value double")
    got = fdr_bh(df, "p_value", keys=["fam"], tiebreak=["tid"]).collect()
    # both families are identical, so adjustments must match pairwise
    by = {(r.fam, r.tid): r.p_adj for r in got}
    assert by[("f1", 1)] == by[("g2", 1)] == pytest.approx(0.04)
    assert by[("f1", 2)] == by[("g2", 2)] == pytest.approx(0.5)


from temporal_retriever_spark.inference import kruskal_wallis, welch_ttest


def _norm_sf(z: float) -> float:
    return 0.5 * math.erfc(z / math.sqrt(2))


def _naive_welch(rows, a="a", b="b"):
    av = [v for g, v in rows if g == a]
    bv = [v for g, v in rows if g == b]
    n1, n2 = len(av), len(bv)
    m1, m2 = sum(av) / n1, sum(bv) / n2
    v1 = sum((x - m1) ** 2 for x in av) / (n1 - 1)
    v2 = sum((x - m2) ** 2 for x in bv) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    dfw = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    return t, dfw, m1, m2


class TestWelch:
    def test_matches_naive(self, spark, sdf, samples):
        row = welch_ttest(sdf, "v", "grp", "a", "b").collect()[0]
        t, dfw, m1, m2 = _naive_welch(samples)
        assert row["n_a"] == 300 and row["n_b"] == 250
        assert math.isclose(row["mean_a"], m1, rel_tol=1e-12)
        assert math.isclose(row["t_stat"], t, rel_tol=1e-9)
        assert math.isclose(row["df_welch"], dfw, rel_tol=1e-9)
        # asymptotic normal p, the documented convention
        p_ref = min(1.0, 2 * _norm_sf(abs(t)))
        assert math.isclose(row["p_value"], p_ref, abs_tol=2e-7)

    def test_identical_populations_p_near_one(self, spark):
        rows = [("a", float(v)) for v in range(50)] + [
            ("b", float(v)) for v in range(50)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        row = welch_ttest(df, "v", "grp", "a", "b").collect()[0]
        assert abs(row["t_stat"]) < 1e-12
        assert row["p_value"] > 0.999

    def test_undefined_cases_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0), ("b", 3.0)], "grp string, v double"
        )
        row = welch_ttest(df, "v", "grp", "a", "b").collect()[0]
        assert row["t_stat"] is None and row["p_value"] is None
        # both-constant populations: se2 == 0
        df2 = spark.createDataFrame(
            [("a", 1.0)] * 3 + [("b", 1.0)] * 3, "grp string, v double"
        )
        row2 = welch_ttest(df2, "v", "grp", "a", "b").collect()[0]
        assert row2["p_value"] is None

    def test_keyed_single_aggregation_plan(self, spark, sdf):
        keyed = sdf.withColumn("k", F.lit("x"))
        out = welch_ttest(keyed, "v", "grp", "a", "b", keys=["k"])
        plan = _plan(out)
        assert plan.count("Exchange") == 1, plan
        assert "Python" not in plan


def _naive_kw(rows):
    """Tie-corrected Kruskal-Wallis via explicit midranks."""
    vals = sorted(v for _, v in rows)
    n = len(vals)
    # midrank of each distinct value
    first = {}
    cnt = Counter(vals)
    pos, mid = 0, {}
    for v in sorted(cnt):
        mid[v] = pos + (cnt[v] + 1) / 2
        pos += cnt[v]
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(mid[v])
    s = sum(sum(r) ** 2 / len(r) for r in groups.values())
    h = 12.0 / (n * (n + 1)) * s - 3 * (n + 1)
    ties = sum(c**3 - c for c in cnt.values())
    return h / (1 - ties / (n**3 - n)), len(groups)


class TestKruskalWallis:
    def test_matches_naive_with_ties(self, spark):
        rng = random.Random(11)
        rows = (
            [("a", float(rng.randint(0, 20))) for _ in range(80)]
            + [("b", float(rng.randint(3, 23))) for _ in range(70)]
            + [("c", float(rng.randint(0, 20))) for _ in range(60)]
        )
        df = spark.createDataFrame(rows, "grp string, v double")
        row = kruskal_wallis(df, "v", "grp").collect()[0]
        h_ref, k_ref = _naive_kw(rows)
        assert row["k_groups"] == k_ref and row["dof"] == k_ref - 1
        assert row["n"] == len(rows)
        assert math.isclose(row["h_stat"], h_ref, rel_tol=1e-9)
        # Wilson-Hilferty p reference
        k = row["dof"]
        z = ((h_ref / k) ** (1 / 3) - (1 - 2 / (9 * k))) / math.sqrt(
            2 / (9 * k)
        )
        p_ref = _norm_sf(z) if z >= 0 else 1 - _norm_sf(-z)
        assert math.isclose(row["p_value"], p_ref, abs_tol=2e-7)

    def test_exact_series_p_for_known_groups(self, spark):
        rng = random.Random(5)
        rows = (
            [("a", float(rng.gauss(0, 1))) for _ in range(40)]
            + [("b", float(rng.gauss(1, 1))) for _ in range(40)]
            + [("c", float(rng.gauss(2, 1))) for _ in range(40)]
        )
        df = spark.createDataFrame(rows, "grp string, v double")
        row = kruskal_wallis(df, "v", "grp", groups=3).collect()[0]
        # dof=2: chi2 sf is exactly exp(-h/2)
        assert math.isclose(
            row["p_value"], math.exp(-row["h_stat"] / 2), rel_tol=1e-9
        )

    def test_two_groups_consistent_with_mwu(self, spark, sdf, samples):
        kw = kruskal_wallis(sdf, "v", "grp").collect()[0]
        mwu = mann_whitney_u(sdf, "v", "grp", "a", "b", continuity=False).collect()[0]
        # H (df=1) == z^2 for two groups (tie-corrected, no continuity)
        assert math.isclose(kw["h_stat"], mwu["z_score"] ** 2, rel_tol=1e-9)

    def test_all_tied_pool_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0)] * 5 + [("b", 1.0)] * 5, "grp string, v double"
        )
        row = kruskal_wallis(df, "v", "grp").collect()[0]
        assert row["h_stat"] is None and row["p_value"] is None

    def test_group_count_mismatch_fails_loud(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 2.0)], "grp string, v double"
        )
        with pytest.raises(Exception, match="group count mismatch"):
            kruskal_wallis(df, "v", "grp", groups=3).collect()


from temporal_retriever_spark.inference import (
    _poisson1_thresholds,
    bootstrap_ci,
    poisson_weight_expr,
)


class TestPoissonBootstrap:
    def test_thresholds_are_poisson_cdf(self):
        t = _poisson1_thresholds()
        e1 = math.exp(-1)
        assert math.isclose(t[0], e1, rel_tol=1e-15)
        assert math.isclose(t[1], 2 * e1, rel_tol=1e-15)
        assert math.isclose(t[2], 2.5 * e1, rel_tol=1e-15)
        assert t[-1] > 1 - 1e-7  # truncation tail is negligible

    def test_weight_draw_distribution(self, spark):
        # md5-uniforms through the inverse CDF should look Poisson(1)
        df = spark.range(20000).select(
            poisson_weight_expr(
                (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                 .cast("double") + 0.5) / F.lit(float(2**32))
            ).alias("w")
        )
        rows = df.groupBy("w").count().collect()
        dist = {r["w"]: r["count"] / 20000 for r in rows}
        e1 = math.exp(-1)
        assert abs(dist.get(0, 0) - e1) < 0.02
        assert abs(dist.get(1, 0) - e1) < 0.02
        assert abs(dist.get(2, 0) - e1 / 2) < 0.02
        mean = sum(k * p for k, p in dist.items())
        assert abs(mean - 1.0) < 0.03

    def test_ci_covers_mean_and_shrinks(self, spark):
        rng = random.Random(3)
        small = [(i, rng.gauss(10, 2)) for i in range(100)]
        big = [(i, rng.gauss(10, 2)) for i in range(4000)]
        for rows, max_width in ((small, 2.0), (big, 0.5)):
            df = spark.createDataFrame(rows, "rid long, v double")
            out = bootstrap_ci(df, "v", id_col="rid", n_boot=120).collect()[0]
            assert out["ci_lo"] < out["est"] < out["ci_hi"]
            assert out["ci_lo"] < 10.3 and out["ci_hi"] > 9.7  # covers truth
            width = out["ci_hi"] - out["ci_lo"]
            assert width < max_width, (len(rows), width)
            # ~ +-2 se sanity: width within 4x of the CLT width
            se = 2 / math.sqrt(len(rows))
            assert width > 1.5 * se, (len(rows), width, se)

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, float(i % 13)) for i in range(500)]
        a = bootstrap_ci(
            spark.createDataFrame(rows, "rid long, v double").repartition(2),
            "v", id_col="rid", n_boot=50,
        ).collect()[0]
        b = bootstrap_ci(
            spark.createDataFrame(rows, "rid long, v double").repartition(17),
            "v", id_col="rid", n_boot=50,
        ).collect()[0]
        assert abs(a["ci_lo"] - b["ci_lo"]) < 1e-9
        assert abs(a["ci_hi"] - b["ci_hi"]) < 1e-9

    def test_keyed(self, spark):
        rows = [("a", i, 5.0 + (i % 3)) for i in range(300)] + [
            ("b", i, 50.0 + (i % 7)) for i in range(300)
        ]
        df = spark.createDataFrame(rows, "k string, rid long, v double")
        out = {r["k"]: r for r in bootstrap_ci(
            df, "v", id_col="rid", keys=["k"], n_boot=80
        ).collect()}
        assert out["a"]["ci_hi"] < 10 and out["b"]["ci_lo"] > 40
        assert out["a"]["n"] == 300 and out["a"]["n_boot"] == 80

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, 1.0)], "rid long, v double")
        with pytest.raises(ValueError, match="alpha"):
            bootstrap_ci(df, "v", id_col="rid", alpha=1.5)
        with pytest.raises(ValueError, match="n_boot"):
            bootstrap_ci(df, "v", id_col="rid", n_boot=1)


from temporal_retriever_spark.inference import cuped_adjust, cuped_ttest


class TestCuped:
    @pytest.fixture(scope="class")
    def ab(self, spark):
        # y correlated with pre-metric x; true lift +0.5 for b
        rng = random.Random(19)
        rows = []
        for i in range(800):
            x = rng.gauss(10, 3)
            g = "a" if i % 2 == 0 else "b"
            lift = 0.5 if g == "b" else 0.0
            y = 2.0 + 0.9 * x + lift + rng.gauss(0, 1)
            rows.append((g, float(x), float(y)))
        return spark.createDataFrame(rows, "grp string, x double, y double")

    def test_adjustment_is_mean_preserving(self, spark, ab):
        adj = cuped_adjust(ab, "y", "x")
        row = adj.agg(
            F.avg("y").alias("my"), F.avg("y_cv").alias("mycv")
        ).collect()[0]
        assert abs(row["my"] - row["mycv"]) < 1e-9

    def test_theta_matches_cov_over_var(self, spark, ab):
        out = cuped_ttest(ab, "y", "x", "grp", "a", "b").collect()[0]
        pdf = ab.toPandas()
        theta_ref = pdf["x"].cov(pdf["y"]) / pdf["x"].var()
        assert math.isclose(out["theta"], theta_ref, rel_tol=1e-9)

    def test_variance_reduction_and_power(self, spark, ab):
        cuped = cuped_ttest(ab, "y", "x", "grp", "a", "b").collect()[0]
        raw = welch_ttest(ab, "y", "grp", "a", "b").collect()[0]
        # corr ~ 0.94 => ~88% variance reduction
        assert cuped["var_reduction"] > 0.7, cuped["var_reduction"]
        # same direction, much stronger evidence on the adjusted metric
        assert abs(cuped["t_stat"]) > abs(raw["t_stat"]) * 1.5
        assert cuped["p_value"] < 1e-6
        # detected lift is near the true +0.5 (b - a => mean_a - mean_b < 0)
        assert -0.75 < cuped["mean_a"] - cuped["mean_b"] < -0.25

    def test_zero_variance_covariate_noop(self, spark):
        rows = [("a", 1.0, float(v)) for v in range(20)] + [
            ("b", 1.0, float(v + 1)) for v in range(20)
        ]
        df = spark.createDataFrame(rows, "grp string, x double, y double")
        out = cuped_ttest(df, "y", "x", "grp", "a", "b").collect()[0]
        assert out["theta"] == 0.0 and out["var_reduction"] == 0.0
        raw = welch_ttest(df, "y", "grp", "a", "b").collect()[0]
        assert math.isclose(out["t_stat"], raw["t_stat"], rel_tol=1e-12)


from temporal_retriever_spark.inference import cohens_kappa


class TestCohensKappa:
    def test_textbook_two_rater(self, spark):
        # classic 2x2: 20 yes-yes, 5 yes-no, 10 no-yes, 15 no-no
        rows = (
            [("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15
        )
        df = spark.createDataFrame(rows, "a string, b string")
        out = cohens_kappa(df, "a", "b").collect()[0]
        po = 35 / 50
        pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
        assert out["n"] == 50
        assert math.isclose(out["p_observed"], po, rel_tol=1e-12)
        assert math.isclose(out["p_expected"], pe, rel_tol=1e-12)
        assert math.isclose(out["kappa"], (po - pe) / (1 - pe), rel_tol=1e-12)

    def test_perfect_and_chance_agreement(self, spark):
        perfect = spark.createDataFrame(
            [("a", "a")] * 5 + [("b", "b")] * 5, "a string, b string"
        )
        assert cohens_kappa(perfect, "a", "b").collect()[0]["kappa"] == 1.0
        # independent labels at 50/50: kappa ~ 0
        chance = spark.createDataFrame(
            [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")] * 10,
            "a string, b string",
        )
        assert abs(cohens_kappa(chance, "a", "b").collect()[0]["kappa"]) < 1e-12

    def test_offdiagonal_label_contributes_to_pe(self, spark):
        # label 'c' never agrees but both raters use it: its marginal
        # product must still enter p_e (diagonal-only impls miss it)
        rows = [("a", "a")] * 4 + [("c", "b")] * 3 + [("b", "c")] * 3
        df = spark.createDataFrame(rows, "a string, b string")
        out = cohens_kappa(df, "a", "b").collect()[0]
        pe = (4 / 10) * (4 / 10) + (3 / 10) * (3 / 10) + (3 / 10) * (3 / 10)
        assert math.isclose(out["p_expected"], pe, rel_tol=1e-12)

    def test_constant_raters_kappa_null(self, spark):
        df = spark.createDataFrame([("a", "a")] * 5, "a string, b string")
        out = cohens_kappa(df, "a", "b").collect()[0]
        assert out["kappa"] is None and out["p_expected"] == 1.0

    def test_nulls_excluded(self, spark):
        rows = [("a", "a"), ("a", None), (None, "b"), ("b", "b")]
        df = spark.createDataFrame(rows, "a string, b string")
        assert cohens_kappa(df, "a", "b").collect()[0]["n"] == 2


# ---------------------------------------------------------------------------
# Propensity-score matching (ATT)
# ---------------------------------------------------------------------------


class TestPropensityATT:
    def test_confounded_null_effect_recovered(self, spark):
        from temporal_retriever_spark.inference import propensity_att

        # outcome depends ONLY on x; treatment probability rises with x.
        # naive difference is badly biased upward; matched ATT ~ 0.
        rows = []
        for i in range(300):
            x = (i % 3) / 2.0          # three strata: 0, 0.5, 1
            treated = 1 if (i % 10) < (2 + 3 * (i % 3)) else 0
            y = 10.0 * x               # no treatment effect at all
            rows.append((treated, y, x))
        df = spark.createDataFrame(rows, "tr int, y double, x double")
        got = propensity_att(df, "tr", "y", ["x"], iterations=30, lr=1.0).collect()[0]
        assert got["n_treated"] > 50
        assert got["n_matched"] == got["n_treated"]
        assert abs(got["naive_diff"]) > 1.0       # confounding is real
        assert abs(got["att"]) < 1e-9             # exact-score matches
    def test_true_effect_estimated(self, spark):
        from temporal_retriever_spark.inference import propensity_att

        rows = []
        for i in range(300):
            x = (i % 3) / 2.0
            treated = 1 if (i % 10) < (2 + 3 * (i % 3)) else 0
            y = 5.0 * x + (2.0 if treated else 0.0)
            rows.append((treated, y, x))
        df = spark.createDataFrame(rows, "tr int, y double, x double")
        got = propensity_att(df, "tr", "y", ["x"], iterations=30, lr=1.0).collect()[0]
        assert got["att"] == pytest.approx(2.0, abs=1e-9)

    def test_caliper_drops_distant_matches(self, spark):
        from temporal_retriever_spark.inference import propensity_att

        # one treated unit far from every control in feature space
        rows = [(0, 1.0, 0.0)] * 10 + [(1, 5.0, 0.0)] * 5 + [(1, 9.0, 10.0)]
        df = spark.createDataFrame(rows, "tr int, y double, x double")
        loose = propensity_att(df, "tr", "y", ["x"], iterations=20).collect()[0]
        tight = propensity_att(
            df, "tr", "y", ["x"], iterations=20, caliper=0.05
        ).collect()[0]
        assert loose["n_matched"] == 6
        assert tight["n_matched"] == 5  # the outlier's match is dropped

    def test_validation(self, spark):
        from temporal_retriever_spark.inference import propensity_att

        df = spark.createDataFrame([(1, 1.0, 0.5)], "tr int, y double, x double")
        with pytest.raises(ValueError, match="caliper"):
            propensity_att(df, "tr", "y", ["x"], caliper=0.0)


class TestDiffInDiff:
    def test_recovers_planted_effect(self, spark):
        from temporal_retriever_spark.inference import diff_in_diff

        # common trend +3 in post; treated get +2 extra; group gap +5
        rows = []
        for i in range(400):
            gv = i % 2
            pv = (i // 2) % 2
            noise = ((i * 7919) % 11 - 5) / 10.0
            y = 10.0 + 5.0 * gv + 3.0 * pv + 2.0 * gv * pv + noise
            rows.append((gv, pv, y))
        df = spark.createDataFrame(rows, "g int, p int, y double")
        r = diff_in_diff(
            df, group_col="g", period_col="p", outcome_col="y"
        ).collect()[0]
        assert r["n"] == 400
        assert r["did"] == pytest.approx(2.0, abs=0.2)
        assert r["p_value"] < 1e-6
        # the raw group gap and the trend do NOT contaminate the DiD
        assert r["m10"] - r["m00"] == pytest.approx(5.0, abs=0.2)
        assert r["m01"] - r["m00"] == pytest.approx(3.0, abs=0.2)

    def test_null_effect_large_p(self, spark):
        from temporal_retriever_spark.inference import diff_in_diff

        rows = []
        for i in range(400):
            gv = i % 2
            pv = (i // 2) % 2
            noise = ((i * 104729) % 101 - 50) / 25.0
            y = 4.0 + 2.0 * gv + 1.0 * pv + noise
            rows.append((gv, pv, y))
        df = spark.createDataFrame(rows, "g int, p int, y double")
        r = diff_in_diff(
            df, group_col="g", period_col="p", outcome_col="y"
        ).collect()[0]
        assert abs(r["did"]) < 3 * r["se"]
        assert r["p_value"] > 0.01


from temporal_retriever_spark.inference import anova_oneway
from temporal_retriever_spark.stats import f_sf


def _naive_anova(rows):
    """Textbook one-way ANOVA from (group, value) tuples."""
    from collections import defaultdict

    by = defaultdict(list)
    for g, v in rows:
        by[g].append(v)
    N = sum(len(v) for v in by.values())
    k = len(by)
    grand = sum(sum(v) for v in by.values()) / N
    ssb = sum(len(v) * (sum(v) / len(v) - grand) ** 2 for v in by.values())
    ssw = sum(
        sum((x - sum(v) / len(v)) ** 2 for x in v) for v in by.values()
    )
    f = (ssb / (k - 1)) / (ssw / (N - k))
    return f, ssb / (ssb + ssw), k, N


class TestAnovaOneway:
    def test_matches_textbook_computation(self, spark):
        rng = random.Random(7)
        rows = (
            [("a", rng.gauss(0.0, 1.0)) for _ in range(50)]
            + [("b", rng.gauss(0.8, 1.0)) for _ in range(40)]
            + [("c", rng.gauss(-0.5, 1.3)) for _ in range(60)]
        )
        df = spark.createDataFrame(rows, "grp string, v double")
        row = anova_oneway(df, "v", "grp", groups=3).collect()[0]
        f_ref, eta_ref, k, n = _naive_anova(rows)
        assert row["k_groups"] == k and row["n"] == n
        assert row["df_num"] == k - 1 and row["df_den"] == n - k
        assert math.isclose(row["f_stat"], f_ref, rel_tol=1e-9)
        assert math.isclose(row["eta_sq"], eta_ref, rel_tol=1e-9)
        assert math.isclose(
            row["p_value"], f_sf(f_ref, k - 1, n - k), rel_tol=1e-9
        )

    def test_null_effect_high_p(self, spark):
        rng = random.Random(13)
        rows = [
            (g, rng.gauss(5.0, 2.0))
            for g in ("a", "b", "c", "d")
            for _ in range(100)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        row = anova_oneway(df, "v", "grp", groups=4).collect()[0]
        assert row["p_value"] > 0.01
        assert row["eta_sq"] < 0.05

    def test_planted_effect_low_p(self, spark):
        rng = random.Random(13)
        rows = [
            (g, rng.gauss(mu, 1.0))
            for g, mu in (("a", 0.0), ("b", 2.0), ("c", 4.0))
            for _ in range(50)
        ]
        df = spark.createDataFrame(rows, "grp string, v double")
        row = anova_oneway(df, "v", "grp", groups=3).collect()[0]
        assert row["p_value"] < 1e-9
        assert row["eta_sq"] > 0.5

    def test_without_groups_p_is_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 5.0)],
            "grp string, v double",
        )
        row = anova_oneway(df, "v", "grp").collect()[0]
        assert row["f_stat"] is not None and row["p_value"] is None

    def test_zero_within_variance_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0)] * 3 + [("b", 2.0)] * 3, "grp string, v double"
        )
        row = anova_oneway(df, "v", "grp").collect()[0]
        assert row["f_stat"] is None and row["p_value"] is None

    def test_keyed_and_mismatch(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.0), (1, "a", 2.0), (1, "b", 4.0), (1, "b", 7.0),
             (2, "a", 0.0), (2, "a", 1.0), (2, "b", 1.0), (2, "b", 2.0)],
            "k int, grp string, v double",
        )
        rows = anova_oneway(df, "v", "grp", keys=["k"]).collect()
        assert {r["k"] for r in rows} == {1, 2}
        with pytest.raises(Exception, match="group count mismatch"):
            anova_oneway(df, "v", "grp", groups=3).collect()


from temporal_retriever_spark.inference import ratio_ttest


def _binom(rng, n, p):
    return float(sum(1 for _ in range(n) if rng.random() < p))


def _naive_ratio_test(rows, a="a", b="b"):
    import statistics

    def side(g):
        nums = [n for gg, n, d in rows if gg == g]
        dens = [d for gg, n, d in rows if gg == g]
        n = len(nums)
        R = sum(nums) / sum(dens)
        vn = statistics.variance(nums)
        vd = statistics.variance(dens)
        mn = sum(nums) / n
        md = sum(dens) / n
        cov = sum((x - mn) * (y - md) for x, y in zip(nums, dens)) / (n - 1)
        var = (vn - 2 * R * cov + R * R * vd) / (n * md * md)
        return R, var, n

    Ra, Va, na = side(a)
    Rb, Vb, nb = side(b)
    z = (Ra - Rb) / math.sqrt(Va + Vb)
    return Ra, Rb, z


class TestRatioTtest:
    def test_matches_delta_method_reference(self, spark):
        rng = random.Random(5)
        rows = []
        for _ in range(200):
            v = rng.randint(5, 50)
            rows.append(("a", _binom(rng, v, 0.3), float(v)))
        for _ in range(180):
            v = rng.randint(5, 50)
            rows.append(("b", _binom(rng, v, 0.35), float(v)))
        df = spark.createDataFrame(rows, "grp string, clicks double, views double")
        got = ratio_ttest(df, "clicks", "views", "grp", "a", "b").collect()[0]
        Ra, Rb, z = _naive_ratio_test(rows)
        assert got["ratio_a"] == pytest.approx(Ra, rel=1e-12)
        assert got["ratio_b"] == pytest.approx(Rb, rel=1e-12)
        assert got["z_score"] == pytest.approx(z, rel=1e-9)
        assert got["n_a"] == 200 and got["n_b"] == 180

    def test_null_effect_and_planted_effect(self, spark):
        rng = random.Random(9)

        def mk(g, p, n):
            out = []
            for _ in range(n):
                v = rng.randint(10, 60)
                out.append((g, _binom(rng, v, p), float(v)))
            return out

        same = spark.createDataFrame(
            mk("a", 0.3, 400) + mk("b", 0.3, 400),
            "grp string, num double, den double",
        )
        r0 = ratio_ttest(same, "num", "den", "grp", "a", "b").collect()[0]
        assert r0["p_value"] > 0.01
        diff = spark.createDataFrame(
            mk("a", 0.3, 400) + mk("b", 0.45, 400),
            "grp string, num double, den double",
        )
        r1 = ratio_ttest(diff, "num", "den", "grp", "a", "b").collect()[0]
        assert r1["p_value"] < 1e-6
        assert r1["diff"] < 0

    def test_degenerate_null(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0, 2.0), ("b", 1.0, 2.0)], "grp string, num double, den double"
        )
        r = ratio_ttest(df, "num", "den", "grp", "a", "b").collect()[0]
        assert r["z_score"] is None and r["p_value"] is None


from temporal_retriever_spark.inference import wilcoxon_signed_rank


def _naive_wilcoxon(pairs):
    ds = [a - b for a, b in pairs if a != b]
    ads = sorted((abs(d), d > 0) for d in ds)
    # midranks with ties
    ranks = {}
    i = 0
    vals = [a for a, _ in ads]
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        mid = (i + 1 + j) / 2.0
        ranks.setdefault(vals[i], mid)
        i = j
    W = sum(ranks[abs(d)] for d in ds if d > 0)
    n = len(ds)
    mean = n * (n + 1) / 4.0
    from collections import Counter

    ties = sum(c**3 - c for c in Counter(abs(d) for d in ds).values())
    var = n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0
    diff = W - mean
    cc = -0.5 if diff > 0 else (0.5 if diff < 0 else 0.0)
    return n, W, (diff + cc) / math.sqrt(var)


class TestWilcoxonSignedRank:
    def test_matches_reference_with_ties_and_zeros(self, spark):
        rng = random.Random(13)
        pairs = [
            (round(rng.gauss(10, 2), 1), round(rng.gauss(10, 2), 1))
            for _ in range(120)
        ]
        pairs += [(5.0, 5.0)] * 10  # zero diffs dropped
        df = spark.createDataFrame(pairs, "a double, b double")
        got = wilcoxon_signed_rank(df, "a", "b").collect()[0]
        n, W, z = _naive_wilcoxon(pairs)
        assert got["n"] == n
        assert got["w_stat"] == pytest.approx(W, rel=1e-12)
        assert got["z_score"] == pytest.approx(z, rel=1e-9)

    def test_planted_shift_detected(self, spark):
        rng = random.Random(5)
        pairs = [
            (x + 1.0 + rng.gauss(0, 0.5), x)
            for x in (rng.uniform(0, 50) for _ in range(100))
        ]
        df = spark.createDataFrame(pairs, "a double, b double")
        got = wilcoxon_signed_rank(df, "a", "b").collect()[0]
        assert got["p_value"] < 1e-9
        sym = spark.createDataFrame(
            [(x, x + rng.gauss(0, 1.0)) for x in
             (rng.uniform(0, 50) for _ in range(300))],
            "a double, b double",
        )
        r0 = wilcoxon_signed_rank(sym, "a", "b").collect()[0]
        assert r0["p_value"] > 0.01

    def test_degenerate_null(self, spark):
        df = spark.createDataFrame([(1.0, 1.0), (2.0, 2.0)], "a double, b double")
        rows = wilcoxon_signed_rank(df, "a", "b").collect()
        assert rows == [] or rows[0]["z_score"] is None


from temporal_retriever_spark.inference import mantel_haenszel


class TestMantelHaenszel:
    def test_matches_hand_computation(self, spark):
        # two strata with known 2x2 cells
        rows = []
        # stratum 1: a=30 b=10 c=20 d=40
        rows += [("s1", True, True)] * 30 + [("s1", True, False)] * 10
        rows += [("s1", False, True)] * 20 + [("s1", False, False)] * 40
        # stratum 2: a=15 b=25 c=10 d=50
        rows += [("s2", True, True)] * 15 + [("s2", True, False)] * 25
        rows += [("s2", False, True)] * 10 + [("s2", False, False)] * 50
        df = spark.createDataFrame(rows, "st string, exp boolean, out boolean")
        got = mantel_haenszel(df, "exp", "out", "st").collect()[0]
        n1, n2 = 100.0, 100.0
        num = 30 * 40 / n1 + 15 * 50 / n2
        den = 10 * 20 / n1 + 25 * 10 / n2
        assert got["or_mh"] == pytest.approx(num / den, rel=1e-12)
        e1 = 40 * 50 / n1
        e2 = 40 * 25 / n2
        v1 = 40 * 60 * 50 * 50 / (n1 * n1 * (n1 - 1))
        v2 = 40 * 60 * 25 * 75 / (n2 * n2 * (n2 - 1))
        cmh = (abs((30 + 15) - (e1 + e2)) - 0.5) ** 2 / (v1 + v2)
        assert got["cmh_stat"] == pytest.approx(cmh, rel=1e-12)
        assert got["n"] == 200 and got["n_strata"] == 2
        from temporal_retriever_spark.stats import chi2_sf

        assert got["p_value"] == pytest.approx(chi2_sf(cmh, 1), abs=2e-7)

    def test_simpsons_paradox_resolved(self, spark):
        import random

        rng = random.Random(3)
        rows = []
        # within every stratum exposure has NO effect, but exposure
        # concentrates in the high-outcome stratum -> marginal OR > 1,
        # MH OR ~ 1
        for st, base_p, exp_frac in (("hi", 0.8, 0.9), ("lo", 0.2, 0.1)):
            for _ in range(2000):
                e = rng.random() < exp_frac
                o = rng.random() < base_p
                rows.append((st, e, o))
        df = spark.createDataFrame(rows, "st string, exp boolean, out boolean")
        got = mantel_haenszel(df, "exp", "out", "st").collect()[0]
        assert 0.8 < got["or_mh"] < 1.25
        assert got["p_value"] > 0.001
        # the marginal (single-stratum) analysis is fooled
        marg = mantel_haenszel(
            df.withColumn("one", F.lit("x")), "exp", "out", "one"
        ).collect()[0]
        assert marg["or_mh"] > 2.0

    def test_degenerate_null(self, spark):
        df = spark.createDataFrame(
            [("s", True, True), ("s", True, True)],
            "st string, exp boolean, out boolean",
        )
        got = mantel_haenszel(df, "exp", "out", "st").collect()[0]
        assert got["cmh_stat"] is None and got["p_value"] is None


from temporal_retriever_spark.inference import mcnemar_test, spearman_corr


class TestMcNemar:
    def test_hand_computed(self, spark):
        rows = (
            [(True, True)] * 40 + [(False, False)] * 30
            + [(True, False)] * 20 + [(False, True)] * 8
        )
        df = spark.createDataFrame(rows, "a boolean, b boolean")
        got = mcnemar_test(df, "a", "b").collect()[0]
        assert got["b_only"] == 20 and got["c_only"] == 8
        chi2 = (abs(20 - 8) - 1) ** 2 / 28
        assert got["chi2_stat"] == pytest.approx(chi2, rel=1e-12)
        from temporal_retriever_spark.stats import chi2_sf

        assert got["p_value"] == pytest.approx(chi2_sf(chi2, 1), abs=2e-7)

    def test_no_discordance_null(self, spark):
        df = spark.createDataFrame(
            [(True, True)] * 5 + [(False, False)] * 5, "a boolean, b boolean"
        )
        got = mcnemar_test(df, "a", "b").collect()[0]
        assert got["chi2_stat"] is None and got["p_value"] is None


class TestSpearman:
    def test_matches_rank_pearson_with_ties(self, spark):
        import statistics

        rng = random.Random(7)
        xs = [round(rng.uniform(0, 20), 0) for _ in range(150)]
        ys = [round(x * 0.5 + rng.gauss(0, 3), 0) for x in xs]

        def midrank(vals):
            order = sorted(vals)
            from collections import Counter, defaultdict

            first = {}
            c = Counter(vals)
            pos = 0
            out = {}
            for v in sorted(c):
                out[v] = pos + (c[v] + 1) / 2.0
                pos += c[v]
            return [out[v] for v in vals]

        rx, ry = midrank(xs), midrank(ys)
        ref = statistics.correlation(rx, ry)
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        got = spearman_corr(df, "x", "y").collect()[0]
        assert got["n"] == 150
        assert got["rho"] == pytest.approx(ref, rel=1e-9)
        assert got["p_value"] < 1e-6

    def test_monotone_nonlinear_is_one(self, spark):
        xs = [float(i) for i in range(30)]
        ys = [x**3 for x in xs]  # nonlinear but perfectly monotone
        df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
        got = spearman_corr(df, "x", "y").collect()[0]
        assert got["rho"] == pytest.approx(1.0)

    def test_constant_column_null(self, spark):
        df = spark.createDataFrame(
            [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)], "x double, y double"
        )
        got = spearman_corr(df, "x", "y").collect()[0]
        assert got["rho"] is None and got["p_value"] is None


from temporal_retriever_spark.inference import kendall_tau


def _naive_tau_b(pairs):
    n = len(pairs)
    C = D = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[j][0] - pairs[i][0]
            dy = pairs[j][1] - pairs[i][1]
            s = (dx > 0) - (dx < 0)
            t = (dy > 0) - (dy < 0)
            if s == 0:
                tx += 1
            if t == 0:
                ty += 1
            if s * t > 0:
                C += 1
            elif s * t < 0:
                D += 1
    n0 = n * (n - 1) / 2
    return (C - D) / math.sqrt((n0 - tx) * (n0 - ty))


class TestKendallTau:
    def test_matches_reference_with_ties(self, spark):
        rng = random.Random(9)
        pairs = [
            (round(rng.uniform(0, 10), 0), round(rng.uniform(0, 10), 0))
            for _ in range(80)
        ]
        # add monotone structure
        pairs += [(float(i), float(i + rng.randint(-1, 1))) for i in range(40)]
        df = spark.createDataFrame(pairs, "x double, y double")
        got = kendall_tau(df, "x", "y").collect()[0]
        assert got["n"] == 120
        assert got["tau_b"] == pytest.approx(_naive_tau_b(pairs), rel=1e-9)

    def test_perfect_and_reversed(self, spark):
        xs = [float(i) for i in range(25)]
        up = spark.createDataFrame([(x, x * 2) for x in xs], "x double, y double")
        dn = spark.createDataFrame([(x, -x) for x in xs], "x double, y double")
        assert kendall_tau(up, "x", "y").collect()[0]["tau_b"] == pytest.approx(1.0)
        r = kendall_tau(dn, "x", "y").collect()[0]
        assert r["tau_b"] == pytest.approx(-1.0)
        assert r["p_value"] < 1e-9

    def test_all_tied_null(self, spark):
        df = spark.createDataFrame([(1.0, 2.0)] * 6, "x double, y double")
        got = kendall_tau(df, "x", "y").collect()[0]
        assert got["tau_b"] is None
