"""Collaborative filtering: rank-2 ALS matrix factorization, closed form.

The recommender classic (Koren/Bell/Volinsky 2009; Zhou et al. 2008
for the ALS formulation): factor the sparse (user, item, rating)
matrix as R ≈ U·Vᵀ and read recommendations off the reconstructed
scores. `spark.ml.recommendation.ALS` solves the same normal
equations with a blocked native solver; here the rank is pinned to 2
so each per-key solve is a CLOSED-FORM 2×2 inverse — the whole
trainer is relational algebra, no linear-algebra library, no Python
on the executors, and every round is oracle-replayable in SQL.

Why rank 2 is the right fixed point for this engine: rank 1 makes
every user's item ranking identical (a popularity list — useless as
a recommender); rank 2 is the smallest rank where users genuinely
disagree, and the 2×2 solve

    u_i = (A + λI)⁻¹ b,  A = Σ_j v_j v_jᵀ,  b = Σ_j r_ij v_j

expands to five sums (s00, s01, s11, b0, b1) and a determinant — one
aggregation per side per round. λ > 0 keeps A + λI positive-definite,
so the determinant never vanishes.

Scale shape: solving the USER side joins ratings against the ITEM
factor table (catalog-sized — broadcast); solving the item side joins
against the user factor table — user-count-sized, so that join
shuffles co-keyed on user id, the unavoidable exchange. Per-round
factor tables are key-sized and ``localCheckpoint``'d (lineage depth
stays 1 at any iteration count — the same measured rule as
``graph.pagerank``). Init is the engine-portable md5 draw
(`llm.corpus.sample_hash_expr` idiom): f0 = 1, f1 = ±0.1 by hash
parity of the item id — deterministic under any partition layout,
asymmetric so the second component can't collapse onto the first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["als_train", "als_recommend"]


def _hash01(col: Column, salt: str) -> Column:
    key = F.concat(F.lit(salt), col.cast("string"))
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("double")
        / F.lit(float(2**32))
    )


def _solve_side(
    ratings: DataFrame,
    factors: DataFrame,
    *,
    join_key: str,
    out_key: str,
    l2: float,
    broadcast_factors: bool,
) -> DataFrame:
    """One ALS half-round: closed-form (A + λI)⁻¹ b per out_key."""
    f = F.broadcast(factors) if broadcast_factors else factors
    j = ratings.join(f, on=join_key)
    agg = j.groupBy(out_key).agg(
        F.sum(F.col("f0") * F.col("f0")).alias("_s00"),
        F.sum(F.col("f0") * F.col("f1")).alias("_s01"),
        F.sum(F.col("f1") * F.col("f1")).alias("_s11"),
        F.sum(F.col("_r") * F.col("f0")).alias("_b0"),
        F.sum(F.col("_r") * F.col("f1")).alias("_b1"),
    )
    a00 = F.col("_s00") + F.lit(float(l2))
    a11 = F.col("_s11") + F.lit(float(l2))
    det = a00 * a11 - F.col("_s01") * F.col("_s01")
    return agg.select(
        out_key,
        ((F.col("_b0") * a11 - F.col("_b1") * F.col("_s01")) / det).alias("f0"),
        ((F.col("_b1") * a00 - F.col("_b0") * F.col("_s01")) / det).alias("f1"),
    )


def als_train(
    ratings: DataFrame,
    *,
    user_col: str = "user_id",
    item_col: str = "item_id",
    rating_col: str = "rating",
    iterations: int = 3,
    l2: float = 0.1,
    init_salt: str = "als",
) -> tuple[DataFrame, DataFrame]:
    """Train rank-2 ALS factors over (user, item, rating) rows.

    One ``iterations`` = one full alternation (users re-solved against
    items, then items against the fresh users). Duplicate (user, item)
    observations are averaged first — the standard dedup, and it keeps
    the normal equations those of the rating MATRIX rather than
    silently weighting repeated rows.

    Returns ``(user_factors, item_factors)`` — ``(key, f0, f1)``
    frames, materialized. Deterministic: md5 init + fixed rounds.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if l2 <= 0:
        raise ValueError(f"l2 must be > 0 (keeps the 2x2 solve PD), got {l2}")
    r = (
        ratings.filter(
            F.col(user_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(rating_col).isNotNull()
        )
        .groupBy(
            F.col(user_col).alias("_u"), F.col(item_col).alias("_i")
        )
        .agg(F.avg(F.col(rating_col).cast("double")).alias("_r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    items = (
        r.select("_i")
        .distinct()
        .select(
            "_i",
            F.lit(1.0).alias("f0"),
            F.when(_hash01(F.col("_i"), init_salt) < 0.5, F.lit(-0.1))
            .otherwise(F.lit(0.1))
            .alias("f1"),
        )
        .localCheckpoint(eager=True)
    )
    users = None
    for _ in range(iterations):
        users = _solve_side(
            r, items, join_key="_i", out_key="_u", l2=l2,
            broadcast_factors=True,
        ).localCheckpoint(eager=True)
        items = _solve_side(
            r, users, join_key="_u", out_key="_i", l2=l2,
            broadcast_factors=False,
        ).localCheckpoint(eager=True)
    r.unpersist()
    return (
        users.select(F.col("_u").alias(user_col), "f0", "f1"),
        items.select(F.col("_i").alias(item_col), "f0", "f1"),
    )


def als_recommend(
    user_factors: DataFrame,
    item_factors: DataFrame,
    *,
    k: int = 5,
    user_col: str = "user_id",
    item_col: str = "item_id",
    exclude: DataFrame | None = None,
) -> DataFrame:
    """Top-k items per user by factor dot product.

    ``exclude`` (typically the training ratings) drops already-seen
    (user, item) pairs before ranking. The item-factor table is
    catalog-sized and broadcast, so scoring is one scan of the user
    table fanned out ×|items|; the per-user top-k compiles to the
    rank window Spark executes as a pre-shuffle WindowGroupLimit.
    Ties broken by item id ascending (deterministic output).

    Output: ``(user, item, score, rec_rank)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    u = user_factors.select(
        F.col(user_col),
        F.col("f0").alias("_uf0"),
        F.col("f1").alias("_uf1"),
    )
    i = item_factors.select(
        F.col(item_col),
        F.col("f0").alias("_if0"),
        F.col("f1").alias("_if1"),
    )
    scored = u.crossJoin(F.broadcast(i)).select(
        user_col,
        item_col,
        (
            F.col("_uf0") * F.col("_if0") + F.col("_uf1") * F.col("_if1")
        ).alias("score"),
    )
    if exclude is not None:
        seen = exclude.select(
            F.col(user_col), F.col(item_col)
        ).distinct()
        scored = scored.join(seen, on=[user_col, item_col], how="left_anti")
    w = Window.partitionBy(user_col).orderBy(
        F.col("score").desc(), F.col(item_col).asc()
    )
    return (
        scored.withColumn("rec_rank", F.row_number().over(w))
        .filter(F.col("rec_rank") <= int(k))
    )
