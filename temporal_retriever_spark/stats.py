"""Minimal numpy-only distribution functions (no scipy in container).

Used by diagnostics.granger_causality for p-values. Implementation is
the standard continued-fraction regularized incomplete beta (Lentz's
algorithm, cf. Numerical Recipes §6.4 — public-domain math, written
from the formulas).
"""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float, max_iter: int = 200, eps: float = 3e-14) -> float:
    """Continued fraction for the incomplete beta function."""
    tiny = 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < tiny:
        d = tiny
    d = 1.0 / d
    h = d
    for m in range(1, max_iter + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < tiny:
            d = tiny
        c = 1.0 + aa / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_front = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    front = math.exp(ln_front)
    if x < (a + 1.0) / (a + b + 2.0):
        return front * _betacf(a, b, x) / a
    return 1.0 - front * _betacf(b, a, 1.0 - x) / b


def f_sf(f: float, dfn: float, dfd: float) -> float:
    """Survival function (1 - CDF) of the F distribution — the p-value
    of an F test statistic."""
    if not (f > 0) or dfn <= 0 or dfd <= 0:
        return 1.0 if f == f else float("nan")  # f<=0 -> p=1; NaN passthrough
    if math.isinf(f):
        return 0.0
    x = dfd / (dfd + dfn * f)
    return betainc(dfd / 2.0, dfn / 2.0, x)


def chi2_sf(x: float, df: int) -> float:
    """Survival function of the chi-square distribution for integer
    ``df`` — the p-value of a Ljung-Box / Box-Pierce Q statistic.

    Integer degrees of freedom make the regularized upper incomplete
    gamma exact and loop-free: for even df a finite Poisson sum, for
    odd df the erfc closed form plus a finite half-integer sum
    (A&S 6.5.13 family). Matches scipy.stats.chi2.sf to ~1e-14.
    """
    if df < 1:
        raise ValueError(f"df must be >= 1: {df}")
    if not (x > 0):
        return 1.0 if x == x else float("nan")
    h = x / 2.0
    if df % 2 == 0:
        s, c = 0.0, 1.0
        for j in range(df // 2):
            s += c
            c *= h / (j + 1.0)
        return math.exp(-h) * s
    # odd df = 2k+1: erfc(sqrt(h)) + exp(-h) * sum_{j=1..k} h^{j-1/2}/G(j+1/2)
    s = 0.0
    for j in range(1, df // 2 + 1):
        s += math.pow(h, j - 0.5) / math.gamma(j + 0.5)
    return math.erfc(math.sqrt(h)) + math.exp(-h) * s


def norm_ppf(p: float) -> float:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9 — the public-domain algorithm every engine
    without a native probit ships). Used for confidence-band z values;
    the resulting constant is embedded identically in the Spark plan
    and the SQL oracle, so approximation error cannot cause
    cross-engine drift."""
    if not 0.0 < p < 1.0:
        raise ValueError(f"p must be in (0, 1): {p}")
    a = (-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    b = (-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01)
    c = (-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    d = (7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00)
    plow, phigh = 0.02425, 1.0 - 0.02425
    if p < plow:
        q = math.sqrt(-2.0 * math.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    if p > phigh:
        q = math.sqrt(-2.0 * math.log(1.0 - p))
        return -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / (
            (((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1.0
        )
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / (
        ((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1.0
    )
