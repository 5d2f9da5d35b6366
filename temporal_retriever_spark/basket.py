"""Market-basket analysis: frequent itemsets and association rules.

The retail-OLAP classic (Agrawal & Srikant 1994, Apriori): which items
co-occur in the same basket more often than chance, and which
"antecedent → consequent" rules have high confidence and lift? The
operator family behind `spark.ml.fpm.FPGrowth`, re-expressed as plain
DataFrame relational algebra so the result is byte-auditable against a
SQL oracle (FPGrowth's tree construction is an optimization of the
SAME counts; for the pairwise itemsets produced here the two-join
formulation is the canonical distributed plan — cf. the SON/Apriori
layered-count literature).

Scale design (the part that matters at 100 TB):

* The (basket, item) incidence is deduplicated ONCE up front — one
  shuffle — so multi-line baskets (a basket listing the same item k
  times) count each item once, the standard support semantics.
* Apriori prune BEFORE pair generation: only items that are frequent
  on their own can appear in a frequent pair, so the incidence table
  is semi-joined down to frequent items first. The frequent-item list
  is support-bounded — at most (avg basket size / min_support) entries
  REGARDLESS of corpus size — so it is always broadcastable; the prune
  costs zero shuffles.
* Pair generation is a self-equi-join on the basket key over the
  PRUNED incidence — both sides share one hash-partitioning on
  basket, and the output is bounded by sum_b k_b^2 over pruned basket
  sizes. ``max_basket_items`` guards the quadratic term against
  pathological mega-baskets (the same per-key-bounded contract as
  ``funnel``/``sessionize``): oversized baskets are DROPPED (classic
  practice — a basket containing half the catalog carries no signal
  and would dominate the join).
* Rule scoring is arithmetic over the (tiny) frequent-itemset result
  joined with the broadcast singleton counts — no further passes over
  the data.

No Python UDFs anywhere; every stage is codegen'd relational algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _incidence(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_items: int | None,
) -> DataFrame:
    """Distinct (basket, item) pairs, oversized baskets dropped."""
    base = (
        df.filter(F.col(basket_col).isNotNull() & F.col(item_col).isNotNull())
        .select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    if max_basket_items is not None:
        if max_basket_items < 1:
            raise ValueError(
                f"max_basket_items must be >= 1: {max_basket_items}"
            )
        sizes = base.groupBy("_b").agg(F.count("*").alias("_bk"))
        base = base.join(
            sizes.filter(F.col("_bk") <= max_basket_items).select("_b"),
            on="_b",
        )
    return base


def frequent_itemsets(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Frequent itemsets of size 1 and 2 at ``min_support``.

    ``support(X) = |baskets containing every item of X| / |baskets|``;
    an itemset is frequent when support >= min_support. Size-2 output
    is canonicalized ``item_a < item_b``.

    Output: ``size, item_a, item_b (NULL for singletons),
    support_count, support`` — exact integer counts plus the ratio.

    Plan: incidence dedup (1 shuffle) → basket count + item counts
    (map-side-combined aggs) → Apriori semi-join prune (broadcast,
    0 shuffles) → basket self-join (1 co-partitioned shuffle) → pair
    agg. Five exchanges total, none sized by the raw input after the
    first.
    """
    if not 0.0 < min_support <= 1.0:
        raise ValueError(f"min_support must be in (0, 1]: {min_support}")
    # materialize the incidence ONCE: four downstream consumers (n,
    # item counts, both pair-join sides) would otherwise re-run the
    # dedup shuffle — and re-scan the source — per reference (44
    # parquet scans in the un-checkpointed plan, measured)
    base = _incidence(df, basket_col, item_col, max_basket_items).localCheckpoint(
        eager=True
    )
    # one driver scalar (the same O(small-state) contract as
    # pagerank's dangling mass); oracle mirrors 0.02 * CAST(n AS
    # DOUBLE) — the identical IEEE product
    n = base.select(F.count_distinct("_b")).collect()[0][0]
    if n == 0:
        return df.sparkSession.createDataFrame(
            [],
            "size int, item_a string, item_b string, "
            "support_count long, support double",
        )
    minc = F.lit(float(min_support) * float(n))
    nd = F.lit(float(n))
    c1 = base.groupBy("_i").agg(F.count("*").alias("support_count"))
    f1 = c1.filter(F.col("support_count").cast("double") >= minc)
    singles = f1.select(
        F.lit(1).alias("size"),
        F.col("_i").cast("string").alias("item_a"),
        F.lit(None).cast("string").alias("item_b"),
        F.col("support_count"),
        (F.col("support_count").cast("double") / nd).alias("support"),
    )
    # Apriori prune: support-bounded frequent-item list, broadcastable
    # at any corpus size (<= avg_basket/min_support entries)
    keep = F.broadcast(f1.select("_i"))
    pruned = base.join(keep, on="_i").select("_b", "_i")
    pairs = (
        pruned.alias("l")
        .join(pruned.alias("r"), on="_b")
        .filter(F.col("l._i") < F.col("r._i"))
        .groupBy(
            F.col("l._i").alias("item_a"), F.col("r._i").alias("item_b")
        )
        .agg(F.count("*").alias("support_count"))
        .filter(F.col("support_count").cast("double") >= minc)
        .select(
            F.lit(2).alias("size"),
            F.col("item_a").cast("string").alias("item_a"),
            F.col("item_b").cast("string").alias("item_b"),
            F.col("support_count"),
            (F.col("support_count").cast("double") / nd).alias("support"),
        )
    )
    return singles.unionByName(pairs)


def association_rules(
    df: DataFrame,
    *,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
    max_basket_items: int | None = None,
) -> DataFrame:
    """Pairwise association rules ``antecedent → consequent``.

    For every frequent pair {a, b} (see `frequent_itemsets`) BOTH
    orientations are scored:

        support    = count(a, b) / N
        confidence = count(a, b) / count(antecedent)
        lift       = confidence / (count(consequent) / N)

    and rules below ``min_confidence`` are dropped. lift > 1 means the
    consequent is MORE likely inside the antecedent's baskets than in
    the population — the chance-corrected signal; confidence alone
    rewards merely-popular consequents.

    Output: ``antecedent, consequent, support_count, support,
    confidence, lift``.

    Plan: everything in `frequent_itemsets` plus two broadcast joins
    against the singleton-count table (itemset results are
    support-bounded and tiny) — no additional pass over the data.
    """
    if not 0.0 <= min_confidence <= 1.0:
        raise ValueError(
            f"min_confidence must be in [0, 1]: {min_confidence}"
        )
    # itemsets are support-bounded and tiny; checkpoint so the three
    # derivations below don't re-run the whole mining pipeline
    sets = frequent_itemsets(
        df,
        basket_col=basket_col,
        item_col=item_col,
        min_support=min_support,
        max_basket_items=max_basket_items,
    ).localCheckpoint(eager=True)
    singles = sets.filter(F.col("size") == 1).select(
        F.col("item_a").alias("_i"),
        F.col("support_count").alias("_ic"),
        (F.col("support_count") / F.col("support")).alias("_nd"),
    )
    pairs = sets.filter(F.col("size") == 2).select(
        "item_a", "item_b", F.col("support_count"), "support"
    )
    # both orientations of each canonical pair
    oriented = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("antecedent"),
                    F.col("item_b").alias("consequent"),
                ),
                F.struct(
                    F.col("item_b").alias("antecedent"),
                    F.col("item_a").alias("consequent"),
                ),
            )
        ).alias("_r"),
        F.col("support_count"),
        F.col("support"),
    ).select("_r.antecedent", "_r.consequent", "support_count", "support")
    ant = F.broadcast(
        singles.select(F.col("_i").alias("antecedent"), F.col("_ic").alias("_ac"))
    )
    con = F.broadcast(
        singles.select(
            F.col("_i").alias("consequent"),
            F.col("_ic").alias("_cc"),
            F.col("_nd"),
        )
    )
    out = (
        oriented.join(ant, on="antecedent")
        .join(con, on="consequent")
        .select(
            "antecedent",
            "consequent",
            "support_count",
            "support",
            (
                F.col("support_count").cast("double")
                / F.col("_ac").cast("double")
            ).alias("confidence"),
            (
                F.col("support_count").cast("double")
                * F.col("_nd")
                / (F.col("_ac").cast("double") * F.col("_cc").cast("double"))
            ).alias("lift"),
        )
        .filter(F.col("confidence") >= F.lit(float(min_confidence)))
    )
    return out
