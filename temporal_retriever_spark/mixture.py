"""Gaussian mixture models by expectation-maximization, relationally.

1-D GMMs per key — the model-based alternative to threshold rules for
"is this metric bimodal?" (mixed user populations, dual-mode latency,
contaminated measurements). Everything is native column expressions:
the E-step is closed-form arithmetic per row, the M-step is ONE
aggregation per round, and the model state is a key-sized frame that
re-joins (broadcast) each round — the same fixed-round chained-lazy
shape as ``features.quantile_regression``'s IRLS.

Determinism contract (shared with SQL oracles):

* init: component means at the interpolated quantiles (2c+1)/(2k),
  shared variance = population variance (floored), weights 1/k —
  no RNG anywhere;
* E-step responsibilities in the pairwise-stable form
  r_c = 1 / Σ_c' exp(l_c' − l_c) with l_c = ln w_c − (y−μ_c)²/(2σ_c²)
  − ½ln σ_c² (the shared −½ln 2π cancels): no φ underflow — if some
  l_c' dominates, exp overflows to +inf and r_c cleanly hits 0;
* M-step: n_c = Σr_c, μ_c = Σr_c·y / n_c, σ_c² = max(Σr_c·y²/n_c −
  μ_c², var_floor), w_c = n_c/n. A fixed round count (no data-driven
  convergence test) keeps the plan static and the oracle an exact
  unrolled replay.

Scale: per round, the data shuffles ONCE into the key aggregation of
3k conditional sums; model state is k·|keys| rows (broadcast back).
100k keys × any row count = 100k×3k-float aggregation rows per round.
Rounds are a driver loop over a lazy plan — ~10 joined stages, the
depth ``quantile_regression`` already sustains.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["gmm_em"]


def gmm_em(
    df: DataFrame,
    *,
    value_col: str = "y",
    key_cols: Iterable[str] = (),
    k: int = 2,
    rounds: int = 6,
    var_floor: float = 1e-6,
) -> DataFrame:
    """Fit a k-component 1-D GMM per key; returns one row per
    (key, component): ``(*key_cols, comp, weight, mu, var, n,
    loglik)`` — ``n`` the key's row count and ``loglik`` the final
    total log-likelihood of the key's data under the fitted mixture
    (including the −n/2·ln 2π constant), identical on every row of a
    key. NULL-valued rows are excluded."""
    key_cols = list(key_cols)
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if var_floor <= 0:
        raise ValueError(f"var_floor must be > 0, got {var_floor}")
    y = F.col(value_col).cast("double")
    data = df.filter(y.isNotNull()).select(*key_cols, y.alias("_y"))

    probs = [(2 * c + 1) / (2 * k) for c in range(k)]
    init_aggs = [
        F.expr(f"percentile(_y, {p!r})").alias(f"_mu{c}")
        for c, p in enumerate(probs)
    ] + [
        F.greatest(F.var_pop("_y"), F.lit(float(var_floor))).alias("_v"),
        F.count(F.lit(1)).cast("double").alias("_n"),
    ]
    g = data.groupBy(*key_cols) if key_cols else data.groupBy()
    params = g.agg(*init_aggs).select(
        *key_cols,
        "_n",
        *[F.col(f"_mu{c}") for c in range(k)],
        *[F.col("_v").alias(f"_v{c}") for c in range(k)],
        *[F.lit(1.0 / k).alias(f"_w{c}") for c in range(k)],
    )

    def log_dens(c: int) -> Column:
        mu, v, w = F.col(f"_mu{c}"), F.col(f"_v{c}"), F.col(f"_w{c}")
        d = F.col("_y") - mu
        # weight floor pairs with the _nc collapse guard below: a dead
        # component has w=0 and F.log(0) is NULL in Spark, which would
        # null the whole responsibility row; log(1e-300) ≈ -691 keeps
        # it finite and the component's responsibility ≈ 0. Any live
        # weight is >> 1e-300, so non-degenerate arithmetic (and the
        # oracle match) is bit-identical.
        return (
            F.log(F.greatest(w, F.lit(1e-300)))
            - d * d / (2 * v)
            - F.lit(0.5) * F.log(v)
        )

    def joined(p: DataFrame) -> DataFrame:
        if key_cols:
            return data.join(F.broadcast(p), key_cols)
        return data.crossJoin(F.broadcast(p))

    for _ in range(rounds):
        j = joined(params)
        ls = [log_dens(c) for c in range(k)]
        resp = [
            1.0
            / sum(
                (F.exp(ls[o] - ls[c]) for o in range(k)),
                start=F.lit(0.0),
            )
            for c in range(k)
        ]
        aggs = []
        for c in range(k):
            r = resp[c]
            aggs.append(F.sum(r).alias(f"_nc{c}"))
            aggs.append(F.sum(r * F.col("_y")).alias(f"_sc{c}"))
            aggs.append(F.sum(r * F.col("_y") * F.col("_y")).alias(f"_qc{c}"))
        aggs.append(F.count(F.lit(1)).cast("double").alias("_n"))
        jg = j.groupBy(*key_cols) if key_cols else j.groupBy()
        m = jg.agg(*aggs)
        sel = [*key_cols, "_n"]
        # collapse guard: if a component's responsibility mass hits
        # exactly 0 (every row's E-step underflows), an unguarded
        # _sc/_nc is 0/0 = NaN and poisons all remaining rounds. The
        # floor only changes the degenerate case (any live component
        # has _nc >= one row's responsibility >> 1e-300): a dead
        # component deterministically parks at (mu=0, v=var_floor,
        # w=0) instead of NaN.
        for c in range(k):
            nc = F.greatest(F.col(f"_nc{c}"), F.lit(1e-300))
            mu_new = F.col(f"_sc{c}") / nc
            sel.append(mu_new.alias(f"_mu{c}"))
        for c in range(k):
            nc = F.greatest(F.col(f"_nc{c}"), F.lit(1e-300))
            mu_new = F.col(f"_sc{c}") / nc
            v_new = F.greatest(
                F.col(f"_qc{c}") / nc - mu_new * mu_new,
                F.lit(float(var_floor)),
            )
            sel.append(v_new.alias(f"_v{c}"))
        for c in range(k):
            sel.append((F.col(f"_nc{c}") / F.col("_n")).alias(f"_w{c}"))
        params = m.select(*sel)

    # final log-likelihood under the fitted mixture (logsumexp with
    # the shared -0.5 ln 2pi constant restored)
    j = joined(params)
    ls = [log_dens(c) for c in range(k)]
    lmax = ls[0]
    for c in range(1, k):
        lmax = F.greatest(lmax, ls[c])
    lse = lmax + F.log(
        sum((F.exp(ls[c] - lmax) for c in range(k)), start=F.lit(0.0))
    )
    const = F.lit(-0.5 * math.log(2.0 * math.pi))
    llg = j.groupBy(*key_cols) if key_cols else j.groupBy()
    ll = llg.agg(F.sum(lse + const).alias("loglik"))

    comps = F.array(
        *[
            F.struct(
                F.lit(c).alias("comp"),
                F.col(f"_w{c}").alias("weight"),
                F.col(f"_mu{c}").alias("mu"),
                F.col(f"_v{c}").alias("var"),
            )
            for c in range(k)
        ]
    )
    long = params.select(
        *key_cols,
        F.col("_n").cast("long").alias("n"),
        F.explode(comps).alias("_c"),
    ).select(
        *key_cols,
        F.col("_c.comp").alias("comp"),
        F.col("_c.weight").alias("weight"),
        F.col("_c.mu").alias("mu"),
        F.col("_c.var").alias("var"),
        "n",
    )
    if key_cols:
        return long.join(ll, key_cols)
    return long.crossJoin(F.broadcast(ll))
