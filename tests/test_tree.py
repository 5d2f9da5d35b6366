"""Histogram decision tree: reference-parity on structure and
predictions, determinism, and edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from temporal_retriever_spark.tree import TreeModel, tree_apply, tree_train


def _bin(x, mn, mx, n_bins):
    if x is None or mx == mn:
        return 0
    return max(0, min(int(math.floor((x - mn) / (mx - mn) * n_bins)), n_bins - 1))


def _train_ref(rows, k, ranges, n_bins, max_depth, min_leaf):
    """Same histogram algorithm, driver-side."""
    binned = [
        ([_bin(xs[i], *ranges[i], n_bins) for i in range(k)], y)
        for *_, (xs, y) in [(None, r) for r in rows]
    ]
    splits, leaves = {}, {}

    def route(bins):
        node = 0
        for _ in range(max_depth):
            if node in splits:
                f, b = splits[node]
                node = 2 * node + 1 if bins[f] <= b else 2 * node + 2
        return node

    open_nodes = [0]
    for depth in range(max_depth):
        nxt = []
        for nd in open_nodes:
            sub = [(bins, y) for bins, y in binned if route(bins) == nd]
            if not sub:
                continue
            nt = float(len(sub))
            st = sum(y for _, y in sub)
            best = None
            for f in range(k):
                present = sorted({bins[f] for bins, _ in sub})
                nl = sl = 0.0
                for b in present[:-1]:
                    nl = float(sum(1 for bins, _ in sub if bins[f] <= b))
                    sl = sum(y for bins, y in sub if bins[f] <= b)
                    nr, sr = nt - nl, st - sl
                    if nl < min_leaf or nr < min_leaf:
                        continue
                    gain = sl * sl / nl + sr * sr / nr - st * st / nt
                    cand = (-gain, f, b)
                    if gain > 1e-12 and (best is None or cand < best[0]):
                        best = (cand, (f, b))
            if best is not None:
                splits[nd] = best[1]
                nxt.extend([2 * nd + 1, 2 * nd + 2])
            else:
                leaves[nd] = st / nt
        open_nodes = nxt
        if not open_nodes:
            break
    for nd in open_nodes:
        sub = [(bins, y) for bins, y in binned if route(bins) == nd]
        if sub:
            leaves[nd] = sum(y for _, y in sub) / len(sub)
    return splits, leaves


def _data():
    """Deterministic 2-feature step function with mild pseudo-noise."""
    rows = []
    for i in range(240):
        x0 = (i * 37 % 100) / 100.0
        x1 = (i * 61 % 100) / 100.0
        y = (3.0 if x0 > 0.5 else 1.0) + (0.5 if x1 > 0.7 else 0.0)
        y += ((i * 7919) % 11 - 5) / 100.0
        rows.append(((x0, x1), y))
    return rows


class TestTreeTrain:
    def test_matches_reference_structure_and_leaves(self, spark):
        rows = _data()
        df = spark.createDataFrame(
            [(x0, x1, y) for (x0, x1), y in rows],
            "f0 double, f1 double, y double",
        )
        model = tree_train(
            df, ["f0", "f1"], "y", max_depth=3, n_bins=8, min_leaf=10
        )
        ranges = [
            (min(r[0][i] for r in rows), max(r[0][i] for r in rows))
            for i in range(2)
        ]
        ref_splits, ref_leaves = _train_ref(
            rows, 2, ranges, 8, max_depth=3, min_leaf=10
        )
        assert model.splits == ref_splits
        assert set(model.leaves) == set(ref_leaves)
        for nd, v in ref_leaves.items():
            assert math.isclose(model.leaves[nd], v, rel_tol=1e-9), nd

    def test_predictions_recover_step_function(self, spark):
        rows = _data()
        df = spark.createDataFrame(
            [(x0, x1, y) for (x0, x1), y in rows],
            "f0 double, f1 double, y double",
        )
        model = tree_train(
            df, ["f0", "f1"], "y", max_depth=3, n_bins=8, min_leaf=10
        )
        scored = tree_apply(df, model)
        sse_tree = scored.select(
            F.sum((F.col("pred") - F.col("y")) ** 2).alias("s")
        ).collect()[0]["s"]
        mean = df.agg(F.avg("y")).collect()[0][0]
        sse_mean = df.select(
            F.sum((F.lit(mean) - F.col("y")) ** 2).alias("s")
        ).collect()[0]["s"]
        assert sse_tree < 0.1 * sse_mean  # the step structure is found

    def test_constant_label_is_single_leaf(self, spark):
        df = spark.createDataFrame(
            [(float(i % 10), 5.0) for i in range(50)], "f double, y double"
        )
        model = tree_train(df, ["f"], "y", max_depth=3, n_bins=4, min_leaf=5)
        assert model.splits == {}
        assert model.leaves == {0: 5.0}

    def test_min_leaf_blocks_small_splits(self, spark):
        df = spark.createDataFrame(
            [(0.0, 0.0)] * 30 + [(1.0, 10.0)] * 5, "f double, y double"
        )
        model = tree_train(df, ["f"], "y", max_depth=2, n_bins=4, min_leaf=10)
        assert model.splits == {}  # right side would hold only 5 rows

    def test_validation(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], "f double, y double")
        with pytest.raises(ValueError, match="feature_cols"):
            tree_train(df, [], "y")
        with pytest.raises(ValueError, match="max_depth"):
            tree_train(df, ["f"], "y", max_depth=0)
        with pytest.raises(ValueError, match="n_bins"):
            tree_train(df, ["f"], "y", n_bins=1)
        with pytest.raises(ValueError, match="empty"):
            tree_train(df.filter("y > 99"), ["f"], "y")

    def test_apply_null_feature_routes_to_bin0(self, spark):
        model = TreeModel(
            feature_cols=["f"],
            ranges={"f": (0.0, 1.0)},
            n_bins=4,
            splits={0: (0, 1)},
            leaves={1: 10.0, 2: 20.0},
        )
        df = spark.createDataFrame(
            [(None,), (0.1,), (0.9,)], "f double"
        )
        got = [r["pred"] for r in tree_apply(df, model).collect()]
        assert got == [10.0, 10.0, 20.0]


class TestGBT:
    def test_boosting_reduces_error_beyond_one_tree(self, spark):
        from temporal_retriever_spark.tree import gbt_apply, gbt_train

        rows = _data()
        df = spark.createDataFrame(
            [(x0, x1, y) for (x0, x1), y in rows],
            "f0 double, f1 double, y double",
        )

        def sse(scored):
            return scored.select(
                F.sum((F.col("pred") - F.col("y")) ** 2).alias("s")
            ).collect()[0]["s"]

        # a single stump captures only ONE of the two additive steps;
        # boosted stumps recover both — the classic boosting win.
        # (deeper trees already sit near the bin-quantization error
        # floor here, so stumps are the honest baseline)
        stump = tree_train(df, ["f0", "f1"], "y", max_depth=1, n_bins=8, min_leaf=10)
        sse_stump = sse(tree_apply(df, stump))
        boosted = gbt_train(
            df, ["f0", "f1"], "y",
            n_trees=8, learning_rate=0.5, max_depth=1, n_bins=8, min_leaf=10,
        )
        sse_boost = sse(gbt_apply(df, boosted))
        assert len(boosted.trees) >= 2
        assert sse_boost < 0.75 * sse_stump, (sse_boost, sse_stump)

    def test_apply_is_base_plus_scaled_trees(self, spark):
        from temporal_retriever_spark.tree import gbt_apply, gbt_train, tree_apply

        rows = _data()[:60]
        df = spark.createDataFrame(
            [(x0, x1, y) for (x0, x1), y in rows],
            "f0 double, f1 double, y double",
        )
        m = gbt_train(
            df, ["f0", "f1"], "y",
            n_trees=3, learning_rate=0.4, max_depth=1, n_bins=4, min_leaf=5,
        )
        got = [r["pred"] for r in gbt_apply(df, m).orderBy("f0", "f1").collect()]
        manual = df
        for i, t in enumerate(m.trees):
            manual = tree_apply(manual, t, pred_col=f"_t{i}")
        acc = F.lit(m.base)
        for i in range(len(m.trees)):
            acc = acc + F.lit(m.learning_rate) * F.col(f"_t{i}")
        want = [
            r["w"] for r in manual.withColumn("w", acc).orderBy("f0", "f1").collect()
        ]
        assert got == pytest.approx(want, rel=1e-12)

    def test_constant_label_early_stop(self, spark):
        from temporal_retriever_spark.tree import gbt_apply, gbt_train

        df = spark.createDataFrame(
            [(float(i % 7), 4.25) for i in range(40)], "f double, y double"
        )
        m = gbt_train(df, ["f"], "y", n_trees=5, max_depth=2, min_leaf=5)
        assert m.base == 4.25
        assert m.trees == []
        got = gbt_apply(df, m).select("pred").distinct().collect()
        assert [r["pred"] for r in got] == [4.25]

    def test_validation(self, spark):
        from temporal_retriever_spark.tree import gbt_train

        df = spark.createDataFrame([(1.0, 1.0)], "f double, y double")
        with pytest.raises(ValueError, match="n_trees"):
            gbt_train(df, ["f"], "y", n_trees=0)
        with pytest.raises(ValueError, match="learning_rate"):
            gbt_train(df, ["f"], "y", learning_rate=0.0)
        with pytest.raises(ValueError, match="empty"):
            gbt_train(df.filter("y > 9"), ["f"], "y")


class TestForest:
    def _df(self, spark):
        rows = _data()
        return spark.createDataFrame(
            [(i, x0, x1, y) for i, ((x0, x1), y) in enumerate(rows)],
            "rid long, f0 double, f1 double, y double",
        )

    def test_deterministic_and_salt_sensitivity(self, spark):
        from temporal_retriever_spark.tree import forest_train

        df = self._df(spark)
        kw = dict(id_col="rid", n_trees=3, max_depth=2, n_bins=8, min_leaf=10)
        a = forest_train(df, ["f0", "f1"], "y", salt="s1", **kw)
        b = forest_train(df, ["f0", "f1"], "y", salt="s1", **kw)
        c = forest_train(df, ["f0", "f1"], "y", salt="s2", **kw)
        assert [(t.splits, t.leaves) for t in a.trees] == [
            (t.splits, t.leaves) for t in b.trees
        ]
        assert [(t.splits, t.leaves) for t in a.trees] != [
            (t.splits, t.leaves) for t in c.trees
        ]
        # bagged subsamples differ between trees
        assert (a.trees[0].splits, a.trees[0].leaves) != (
            a.trees[1].splits,
            a.trees[1].leaves,
        )

    def test_apply_is_mean_of_trees(self, spark):
        from temporal_retriever_spark.tree import (
            forest_apply,
            forest_train,
            tree_apply,
        )

        df = self._df(spark)
        m = forest_train(
            df, ["f0", "f1"], "y",
            id_col="rid", n_trees=3, max_depth=2, n_bins=8, min_leaf=10,
        )
        got = [
            r["pred"]
            for r in forest_apply(df, m).orderBy("rid").collect()
        ]
        scored = df
        for i, t in enumerate(m.trees):
            scored = tree_apply(scored, t, pred_col=f"_t{i}")
        want = [
            (r["_t0"] + r["_t1"] + r["_t2"]) / 3.0
            for r in scored.orderBy("rid").collect()
        ]
        assert got == pytest.approx(want, rel=1e-12)

    def test_forest_fits_structure(self, spark):
        from temporal_retriever_spark.tree import forest_apply, forest_train

        df = self._df(spark)
        m = forest_train(
            df, ["f0", "f1"], "y",
            id_col="rid", n_trees=5, max_depth=3, n_bins=8, min_leaf=8,
        )
        sse = forest_apply(df, m).select(
            F.sum((F.col("pred") - F.col("y")) ** 2).alias("s")
        ).collect()[0]["s"]
        mean = df.agg(F.avg("y")).collect()[0][0]
        sse_mean = df.select(
            F.sum((F.lit(mean) - F.col("y")) ** 2).alias("s")
        ).collect()[0]["s"]
        assert sse < 0.15 * sse_mean

    def test_feature_fraction_and_validation(self, spark):
        from temporal_retriever_spark.tree import forest_apply, forest_train

        df = self._df(spark)
        m = forest_train(
            df, ["f0", "f1"], "y",
            id_col="rid", n_trees=4, feature_fraction=0.5,
            max_depth=2, n_bins=8, min_leaf=10,
        )
        assert all(len(t.feature_cols) == 1 for t in m.trees)
        used = {t.feature_cols[0] for t in m.trees}
        assert used == {"f0", "f1"}  # salted ranking varies the subset
        with pytest.raises(ValueError, match="sample_fraction"):
            forest_train(df, ["f0"], "y", id_col="rid", sample_fraction=0.0)
        with pytest.raises(ValueError, match="feature_fraction"):
            forest_train(df, ["f0"], "y", id_col="rid", feature_fraction=1.5)
        with pytest.raises(ValueError, match="no trees"):
            from temporal_retriever_spark.tree import ForestModel

            forest_apply(df, ForestModel())
