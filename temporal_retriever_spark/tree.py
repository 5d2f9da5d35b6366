"""Histogram-based decision-tree training — the distributed tree recipe.

The histogram method is how every scale-serious GBDT trains trees
(LightGBM, XGBoost hist; Ke et al. 2017): discretize features into a
few bins ONCE, then a tree level needs only the per-(node, feature,
bin) label statistics — one map-side-combined aggregation whose
output is ``nodes × features × bins`` rows REGARDLESS of data size.
Split search happens driver-side on that tiny histogram (the same
O(small-state) iteration contract as k-means / pagerank / the GLM
trainers); row→node routing is a codegen'd CASE chain on integer bin
ids, so rows never shuffle during training at all — only the
histogram aggregations do.

Variance-reduction splits (regression form; 0/1 labels make it the
Brier-score tree): gain = Σl²/nl + Σr²/nr − Σt²/nt, deterministic
tie-break (gain desc, feature asc, bin asc). Everything about the
model is reproducible: fixed-width bins from global column ranges,
no RNG, no row-order dependence beyond float-sum association.

Scoring (`tree_apply`) compiles the tree into one nested CASE
expression over the bin ids — a single codegen'd projection, no
Python, no join.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporal_retriever_spark.sources.layout import column_ranges

__all__ = ["ForestModel", "GBTModel", "TreeModel", "forest_apply", "forest_train", "gbt_apply", "gbt_train", "tree_train", "tree_apply"]


@dataclass
class TreeModel:
    """Binary tree over binned features.

    ``splits``: node_id -> (feature_idx, bin_threshold) — rows with
    ``bin[feature] <= bin_threshold`` go to child ``2·id+1``, others
    to ``2·id+2``. ``leaves``: node_id -> predicted value.
    ``ranges``: per-feature (min, max) used for binning; ``n_bins``
    the bin count — both required to reproduce bin ids at scoring
    time.
    """

    feature_cols: list[str]
    ranges: dict[str, tuple[float, float]]
    n_bins: int
    splits: dict[int, tuple[int, int]] = field(default_factory=dict)
    leaves: dict[int, float] = field(default_factory=dict)


def _bin_expr(
    col: str, mn: float | None, mx: float | None, n_bins: int
) -> Column:
    """clamp(floor((x − mn)/(mx − mn) · n_bins), 0, n_bins − 1); NULL
    and constant columns map to bin 0 (same convention as
    sources.layout.zvalue_expr)."""
    if mn is None or mx is None or mx == mn:
        return F.lit(0)
    scaled = (
        (F.col(col).cast("double") - F.lit(float(mn)))
        / F.lit(float(mx) - float(mn))
        * F.lit(float(n_bins))
    )
    return F.when(F.col(col).isNull(), F.lit(0)).otherwise(
        F.greatest(
            F.lit(0),
            F.least(F.floor(scaled).cast("int"), F.lit(n_bins - 1)),
        )
    )


def _best_splits(hist, open_nodes, n_feats, min_leaf):
    """Driver-side split search on the collected histogram.

    hist: {(node, f, b): (n, sy, syy)}. Returns {node: (f, bin, gain,
    left_mean, right_mean)} for nodes with a positive-gain legal
    split; deterministic tie-break (gain desc, f asc, b asc).
    """
    out = {}
    for node in open_nodes:
        total = {}
        for f in range(n_feats):
            bins = sorted(
                (b, v)
                for (nd, ff, b), v in hist.items()
                if nd == node and ff == f
            )
            if not bins:
                continue
            nt = sum(v[0] for _, v in bins)
            st = sum(v[1] for _, v in bins)
            total[f] = (nt, st)
        if not total:
            continue
        best = None
        for f in range(n_feats):
            if f not in total:
                continue
            nt, st = total[f]
            nl = sl = 0.0
            bins = sorted(
                (b, v)
                for (nd, ff, b), v in hist.items()
                if nd == node and ff == f
            )
            for b, (n, sy, _) in bins[:-1]:  # last bin can't split
                nl += n
                sl += sy
                nr, sr = nt - nl, st - sl
                if nl < min_leaf or nr < min_leaf:
                    continue
                gain = sl * sl / nl + sr * sr / nr - st * st / nt
                cand = (-gain, f, b)
                if gain > 1e-12 and (best is None or cand < best[0]):
                    best = (cand, (f, b, gain, sl / nl, sr / nr))
        if best is not None:
            out[node] = best[1]
    return out


def tree_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    max_depth: int = 3,
    n_bins: int = 16,
    min_leaf: int = 20,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> TreeModel:
    """Train a variance-reduction regression tree (0/1 labels → a
    probability tree) by the histogram method.

    Per level: ONE aggregation over (node, feature, bin) — built by
    exploding each row into its ``len(feature_cols)`` (feature, bin)
    pairs, map-side combined, so the shuffle carries at most
    ``open_nodes × features × n_bins`` rows per partition. The
    collected histogram (same bound) is the only driver state; split
    decisions re-enter the plan as a CASE chain on integer bin ids.
    The binned frame is persisted once and node routing is recomputed
    lazily from the split table — rows are never materialized per
    level.
    """
    from pyspark import StorageLevel

    feature_cols = list(feature_cols)
    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    if ranges is None:
        ranges = column_ranges(df, feature_cols)
    y = F.col(label_col).cast("double")
    binned = df.select(
        y.alias("_y"),
        *[
            _bin_expr(c, *ranges[c], n_bins).alias(f"_b{i}")
            for i, c in enumerate(feature_cols)
        ],
    ).filter(F.col("_y").isNotNull()).persist(StorageLevel.MEMORY_AND_DISK)
    n_total = binned.count()
    model = TreeModel(feature_cols, ranges, n_bins)
    if n_total == 0:
        binned.unpersist()
        raise ValueError("cannot train on an empty frame")

    def node_expr(splits: dict[int, tuple[int, int]]) -> Column:
        node = F.lit(0)
        for _ in range(max_depth):
            expr = node
            for nd, (f, b) in splits.items():
                expr = F.when(
                    node == nd,
                    F.when(
                        F.col(f"_b{f}") <= F.lit(b), F.lit(2 * nd + 1)
                    ).otherwise(F.lit(2 * nd + 2)),
                ).otherwise(expr)
            node = expr
        return node

    open_nodes = [0]
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("f"), F.col(f"_b{i}").alias("b")
                )
                for i in range(k)
            ]
        )
    ).alias("_p")
    leaf_stats: dict[int, tuple[float, float]] = {}
    for depth in range(max_depth):
        cur = binned.withColumn("_node", node_expr(model.splits))
        hist_rows = (
            cur.filter(F.col("_node").isin(open_nodes))
            .select("_node", "_y", pairs)
            .groupBy("_node", "_p.f", "_p.b")
            .agg(
                F.count("*").cast("double").alias("n"),
                F.sum("_y").alias("sy"),
                F.sum(F.col("_y") * F.col("_y")).alias("syy"),
            )
            .collect()
        )
        hist = {
            (r["_node"], r["f"], r["b"]): (r["n"], r["sy"], r["syy"])
            for r in hist_rows
        }
        # per-node totals from feature 0 (all features see every row)
        for nd in open_nodes:
            nt = sum(v[0] for (n2, f2, _), v in hist.items() if n2 == nd and f2 == 0)
            st = sum(v[1] for (n2, f2, _), v in hist.items() if n2 == nd and f2 == 0)
            if nt > 0:
                leaf_stats[nd] = (nt, st)
        found = _best_splits(hist, open_nodes, k, min_leaf)
        nxt = []
        for nd in open_nodes:
            if nd in found and depth < max_depth:
                f, b, gain, lm, rm = found[nd]
                model.splits[nd] = (f, b)
                nxt.extend([2 * nd + 1, 2 * nd + 2])
            elif nd in leaf_stats:
                nt, st = leaf_stats[nd]
                model.leaves[nd] = st / nt
        open_nodes = nxt
        if not open_nodes:
            break
    # remaining open nodes at the depth limit become leaves: one last
    # per-node mean aggregation
    if open_nodes:
        cur = binned.withColumn("_node", node_expr(model.splits))
        rows = (
            cur.filter(F.col("_node").isin(open_nodes))
            .groupBy("_node")
            .agg(F.count("*").cast("double").alias("n"), F.sum("_y").alias("sy"))
            .collect()
        )
        for r in rows:
            model.leaves[r["_node"]] = r["sy"] / r["n"]
    binned.unpersist()
    return model


def tree_apply(
    df: DataFrame,
    model: TreeModel,
    *,
    pred_col: str = "pred",
) -> DataFrame:
    """Score rows under a trained tree: ONE nested CASE expression
    over recomputed bin ids — a single codegen'd projection."""

    def descend(node: int) -> Column:
        if node in model.splits:
            f, b = model.splits[node]
            bcol = _bin_expr(
                model.feature_cols[f],
                *model.ranges[model.feature_cols[f]],
                model.n_bins,
            )
            return F.when(bcol <= F.lit(b), descend(2 * node + 1)).otherwise(
                descend(2 * node + 2)
            )
        return F.lit(model.leaves.get(node, 0.0))

    return df.withColumn(pred_col, descend(0))


@dataclass
class GBTModel:
    """Additive tree ensemble: prediction = base + lr · Σ treeᵢ(x)."""

    base: float
    learning_rate: float
    trees: list[TreeModel] = field(default_factory=list)


def _tree_pred_expr(model: TreeModel) -> Column:
    """The nested-CASE scoring expression of one tree (shared by
    tree_apply and the boosting residual chain)."""

    def descend(node: int) -> Column:
        if node in model.splits:
            f, b = model.splits[node]
            bcol = _bin_expr(
                model.feature_cols[f],
                *model.ranges[model.feature_cols[f]],
                model.n_bins,
            )
            return F.when(bcol <= F.lit(b), descend(2 * node + 1)).otherwise(
                descend(2 * node + 2)
            )
        return F.lit(model.leaves.get(node, 0.0))

    return descend(0)


def gbt_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    n_trees: int = 10,
    learning_rate: float = 0.3,
    max_depth: int = 3,
    n_bins: int = 16,
    min_leaf: int = 20,
) -> GBTModel:
    """Gradient-boosted trees for squared loss (Friedman 2001): start
    from the label mean, then each round fits a histogram tree to the
    current residuals and adds it scaled by ``learning_rate``.

    Squared loss makes the gradient the plain residual, so each round
    is exactly one :func:`tree_train` — the per-round cost stays
    ``max_depth`` histogram aggregations, the driver state stays one
    small tree, and the residual column is an EXPRESSION over the
    prior trees (never materialized; the CASE chain grows by ~2^depth
    terms per round, trivially codegen-able at tens of rounds). Stops
    early when a round finds no split and a ~zero correction.
    """
    if n_trees < 1:
        raise ValueError(f"n_trees must be >= 1, got {n_trees}")
    if not 0 < learning_rate <= 1:
        raise ValueError(
            f"learning_rate must be in (0, 1], got {learning_rate}"
        )
    feature_cols = list(feature_cols)
    ranges = column_ranges(df, feature_cols)
    y = F.col(label_col).cast("double")
    base_row = df.filter(y.isNotNull()).agg(F.avg(y)).collect()[0]
    if base_row[0] is None:
        raise ValueError("cannot train on an empty frame")
    base = float(base_row[0])
    model = GBTModel(base=base, learning_rate=learning_rate)
    resid: Column = y - F.lit(base)
    for _ in range(n_trees):
        cur = df.withColumn("_resid", resid)
        tree = tree_train(
            cur,
            feature_cols,
            "_resid",
            max_depth=max_depth,
            n_bins=n_bins,
            min_leaf=min_leaf,
            ranges=ranges,
        )
        if not tree.splits and abs(tree.leaves.get(0, 0.0)) < 1e-12:
            break
        model.trees.append(tree)
        resid = resid - F.lit(learning_rate) * _tree_pred_expr(tree)
    return model


def gbt_apply(
    df: DataFrame,
    model: GBTModel,
    *,
    pred_col: str = "pred",
) -> DataFrame:
    """Score rows under a boosted ensemble: base + lr·Σ tree CASEs —
    still ONE codegen'd projection, no Python, no join."""
    expr: Column = F.lit(model.base)
    for tree in model.trees:
        expr = expr + F.lit(model.learning_rate) * _tree_pred_expr(tree)
    return df.withColumn(pred_col, expr)


@dataclass
class ForestModel:
    """Bagged tree ensemble: prediction = mean of tree predictions."""

    trees: list[TreeModel] = field(default_factory=list)


def forest_train(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    id_col: str,
    n_trees: int = 5,
    sample_fraction: float = 0.7,
    feature_fraction: float = 1.0,
    max_depth: int = 3,
    n_bins: int = 16,
    min_leaf: int = 20,
    salt: str = "rf",
) -> ForestModel:
    """Random forest (Breiman 2001) with DETERMINISTIC bagging: each
    tree trains on the rows whose md5-hash draw (the engine-portable
    "hash the id, not rand()" idiom from ``llm.corpus``) falls under
    ``sample_fraction`` for that tree's salt, and on a salted-hash-
    ranked subset of ``feature_fraction`` of the features. Same salt →
    bit-identical forest on any cluster layout; disjoint tree salts →
    independent subsamples.

    Cost: n_trees × the histogram-tree cost (each subsample scan is a
    codegen'd md5 filter — no materialized copies); bin ranges are
    computed ONCE on the full frame so every tree shares the bin
    space. Scoring (`forest_apply`) is one projection averaging the
    trees' CASE chains.
    """
    import hashlib

    feature_cols = list(feature_cols)
    k = len(feature_cols)
    if k == 0:
        raise ValueError("feature_cols must be non-empty")
    if n_trees < 1:
        raise ValueError(f"n_trees must be >= 1, got {n_trees}")
    if not 0 < sample_fraction <= 1:
        raise ValueError(
            f"sample_fraction must be in (0, 1], got {sample_fraction}"
        )
    if not 0 < feature_fraction <= 1:
        raise ValueError(
            f"feature_fraction must be in (0, 1], got {feature_fraction}"
        )
    m = max(1, round(k * feature_fraction))
    ranges = column_ranges(df, feature_cols)
    forest = ForestModel()
    for t in range(n_trees):
        key = F.concat(
            F.lit(f"{salt}:{t}:"), F.col(id_col).cast("string")
        )
        draw = (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
            / F.lit(float(2**32))
        )
        sub = df.filter(draw < F.lit(sample_fraction))
        feats = sorted(
            feature_cols,
            key=lambda c: hashlib.md5(
                f"{salt}:{t}:{c}".encode()
            ).hexdigest(),
        )[:m]
        feats = [c for c in feature_cols if c in feats]  # stable order
        forest.trees.append(
            tree_train(
                sub,
                feats,
                label_col,
                max_depth=max_depth,
                n_bins=n_bins,
                min_leaf=min_leaf,
                ranges={c: ranges[c] for c in feats},
            )
        )
    return forest


def forest_apply(
    df: DataFrame,
    model: ForestModel,
    *,
    pred_col: str = "pred",
) -> DataFrame:
    """Score rows under a forest: mean of the trees' CASE chains —
    ONE codegen'd projection."""
    if not model.trees:
        raise ValueError("forest has no trees")
    expr: Column = _tree_pred_expr(model.trees[0])
    for tree in model.trees[1:]:
        expr = expr + _tree_pred_expr(tree)
    return df.withColumn(pred_col, expr / F.lit(float(len(model.trees))))
