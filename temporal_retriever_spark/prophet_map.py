"""Stan-free Prophet MAP backend (pure numpy/pandas).

The reference's core forecaster is Prophet with MAP estimation and MC
uncertainty (app.py:124-138 builds ``Prophet(changepoint_prior_scale,
uncertainty_samples)`` per correlation; app.py:442-487 the saturating
variant; 1000 samples app.py:125). The prophet wheel (and its Stan
binary) is not installable in this environment, so this module vendors
the SAME statistical model and fits it in closed numpy:

Model (public prophet ``forecaster.py`` / ``prophet.stan``, linear
growth, additive seasonality)::

    t       = (ds - ds_min) / (ds_max - ds_min)            # scaled time
    y_s     = y / max|y|                                   # scaled value
    trend   = (k + A(t)·δ)·t + (m + A(t)·γ),  γ_j = -t_j·δ_j
            = k·t + m + Σ_j δ_j·max(t - t_j, 0)            # hinge form
    η       = trend + X·β           # X: Fourier seasonality + regressors
    y_s     ~ Normal(η, σ)
    k, m    ~ Normal(0, 5)
    δ_j     ~ Laplace(0, τ)         # τ = changepoint_prior_scale
    β_j     ~ Normal(0, s_j)        # s_j = seasonality/regressor prior scale
    σ       ~ Normal(0, 0.5) truncated to σ > 0

MAP therefore minimizes::

    L = n·log σ + ‖y_s − η‖²/(2σ²) + 2σ²
        + (k² + m²)/50 + ‖δ‖₁/τ + Σ_j β_j²/(2 s_j²)

For FIXED σ this is an L1/L2-penalized least squares — convex — solved
exactly by cyclic coordinate descent with soft-thresholding on the δ
block (the lasso update). σ's stationarity condition is a quadratic in
σ²: 4σ⁴ + n·σ² − SSE = 0, solved in closed form. Alternating the two
converges to the joint MAP (the objective is strictly decreasing and
bi-convex; tests pin the KKT conditions at the returned optimum).

Changepoint grid, seasonality auto-rules, Fourier features, future
trend, and the MC uncertainty scheme (future changepoints at Poisson-
arriving times with Laplace(0, mean|δ|) magnitudes + observation noise,
interval_width quantiles) all mirror the public prophet implementation;
the one deliberate divergence is determinism: sampling uses a seeded
``numpy.random.Generator`` instead of the global numpy state, so runs
are reproducible across executors (README DIVERGENCES #6).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

_EPOCH = pd.Timestamp("1970-01-01")


def fourier_series(dates: pd.Series, period: float, series_order: int) -> np.ndarray:
    """Prophet's Fourier feature matrix: columns sin/cos of
    2π·(i+1)·t/period for i in range(order), t in days since epoch."""
    t = (pd.to_datetime(dates) - _EPOCH).dt.total_seconds().to_numpy() / 86400.0
    cols = []
    for i in range(series_order):
        x = 2.0 * (i + 1) * np.pi * t / period
        cols.append(np.sin(x))
        cols.append(np.cos(x))
    if not cols:
        return np.zeros((len(dates), 0))
    return np.column_stack(cols)


def _soft(z: float, lam: float) -> float:
    if z > lam:
        return z - lam
    if z < -lam:
        return z + lam
    return 0.0


@dataclass
class _Seasonality:
    period: float
    order: int
    prior_scale: float


@dataclass
class _Regressor:
    prior_scale: float
    mu: float = 0.0
    std: float = 1.0
    standardize: object = "auto"


@dataclass
class ProphetMAP:
    """Prophet-compatible MAP forecaster (linear growth, additive)."""

    growth: str = "linear"
    n_changepoints: int = 25
    changepoint_range: float = 0.8
    changepoint_prior_scale: float = 0.05
    seasonality_prior_scale: float = 10.0
    yearly_seasonality: object = "auto"
    weekly_seasonality: object = "auto"
    daily_seasonality: object = "auto"
    interval_width: float = 0.8
    uncertainty_samples: int = 1000
    seed: int = 20260815

    seasonalities: dict = field(default_factory=dict)
    extra_regressors: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.growth != "linear":
            raise NotImplementedError(
                "ProphetMAP implements linear growth (the reference /analyze "
                "path, app.py:124-138); logistic saturating growth has a "
                "native engine path (forecast.py saturating=True)"
            )

    # -- model setup ----------------------------------------------------

    def add_seasonality(self, name: str, period: float, fourier_order: int,
                        prior_scale: float | None = None) -> "ProphetMAP":
        self.seasonalities[name] = _Seasonality(
            period=float(period),
            order=int(fourier_order),
            prior_scale=float(prior_scale or self.seasonality_prior_scale),
        )
        return self

    def add_regressor(self, name: str, prior_scale: float | None = None,
                      standardize: object = "auto") -> "ProphetMAP":
        self.extra_regressors[name] = _Regressor(
            prior_scale=float(prior_scale or self.seasonality_prior_scale),
            standardize=standardize,
        )
        return self

    def _auto_seasonalities(self, ds: pd.Series) -> None:
        """Prophet's enable rules: yearly if span ≥ 730d, weekly if span
        ≥ 14d and spacing < 7d, daily if span ≥ 2d and spacing < 1d."""
        first, last = ds.min(), ds.max()
        dt_min = ds.diff().dropna().min() if len(ds) > 1 else pd.Timedelta(days=1)

        def on(flag, default_on, order_default):
            if flag == "auto":
                return order_default if default_on else 0
            if flag is True:
                return order_default
            if flag is False:
                return 0
            return int(flag)

        yearly = on(self.yearly_seasonality,
                    last - first >= pd.Timedelta(days=730), 10)
        weekly = on(self.weekly_seasonality,
                    (last - first >= pd.Timedelta(weeks=2))
                    and (dt_min < pd.Timedelta(weeks=1)), 3)
        daily = on(self.daily_seasonality,
                   (last - first >= pd.Timedelta(days=2))
                   and (dt_min < pd.Timedelta(days=1)), 4)
        if yearly and "yearly" not in self.seasonalities:
            self.add_seasonality("yearly", 365.25, yearly)
        if weekly and "weekly" not in self.seasonalities:
            self.add_seasonality("weekly", 7, weekly)
        if daily and "daily" not in self.seasonalities:
            self.add_seasonality("daily", 1, daily)

    def _feature_matrix(self, ds: pd.Series, frame: pd.DataFrame):
        """X (n × p), per-column prior scales, and component slices."""
        blocks, scales, components = [], [], {}
        col = 0
        for name, s in self.seasonalities.items():
            X = fourier_series(ds, s.period, s.order)
            blocks.append(X)
            scales += [s.prior_scale] * X.shape[1]
            components[name] = (col, col + X.shape[1])
            col += X.shape[1]
        for name, r in self.extra_regressors.items():
            x = ((frame[name].astype(float) - r.mu) / r.std).to_numpy()
            blocks.append(x.reshape(-1, 1))
            scales.append(r.prior_scale)
            components[name] = (col, col + 1)
            col += 1
        X = np.hstack(blocks) if blocks else np.zeros((len(ds), 0))
        return X, np.asarray(scales, dtype=float), components

    # -- fitting ---------------------------------------------------------

    def fit(self, df: pd.DataFrame) -> "ProphetMAP":
        hist = df.dropna(subset=["y"]).sort_values("ds").reset_index(drop=True)
        if len(hist) < 2:
            raise ValueError("ProphetMAP requires >= 2 non-null rows")
        hist = hist.copy()
        hist["ds"] = pd.to_datetime(hist["ds"])
        self.history = hist
        self.start = hist["ds"].min()
        self.t_scale = (hist["ds"].max() - self.start).total_seconds() or 1.0
        self.y_scale = float(np.abs(hist["y"]).max()) or 1.0
        t = ((hist["ds"] - self.start).dt.total_seconds() / self.t_scale).to_numpy()
        y_s = (hist["y"] / self.y_scale).to_numpy(dtype=float)

        # regressor standardization (prophet: skip for binary unless forced)
        for name, r in self.extra_regressors.items():
            x = hist[name].astype(float)
            standardize = r.standardize
            if standardize == "auto":
                standardize = not set(x.unique()) <= {0.0, 1.0}
            if standardize:
                r.mu, r.std = float(x.mean()), float(x.std()) or 1.0
            else:
                r.mu, r.std = 0.0, 1.0

        self._auto_seasonalities(hist["ds"])
        X, prior_scales, self._components = self._feature_matrix(
            hist["ds"], hist
        )

        # changepoint grid: evenly spaced over the first changepoint_range
        # of history (prophet set_changepoints)
        n = len(hist)
        hist_size = int(np.floor(n * self.changepoint_range))
        n_cp = min(self.n_changepoints, max(hist_size - 1, 0))
        if n_cp > 0:
            cp_idx = np.linspace(0, hist_size - 1, n_cp + 1).round().astype(int)[1:]
            self.changepoints_t = t[cp_idx]
        else:
            self.changepoints_t = np.array([0.0])
        hinges = np.maximum(t[:, None] - self.changepoints_t[None, :], 0.0)

        # design: [t, 1, hinges..., X...]
        M = np.hstack([t.reshape(-1, 1), np.ones((n, 1)), hinges, X])
        p_cp = hinges.shape[1]
        p_x = X.shape[1]
        # quadratic penalties per column (0 on the L1 delta block)
        quad = np.concatenate([
            np.array([1.0 / 25.0, 1.0 / 25.0]),
            np.zeros(p_cp),
            1.0 / np.square(prior_scales) if p_x else np.zeros(0),
        ])
        l1_mask = np.zeros(M.shape[1], dtype=bool)
        l1_mask[2:2 + p_cp] = True
        lam = 1.0 / self.changepoint_prior_scale

        # init (prophet linear_growth_init)
        k0 = (y_s[-1] - y_s[0]) / (t[-1] - t[0] or 1.0)
        theta = np.zeros(M.shape[1])
        theta[0], theta[1] = k0, y_s[0] - k0 * t[0]
        sigma = 1.0

        G = M.T @ M
        g_diag = np.diag(G).copy()
        My = M.T @ y_s
        for _outer in range(200):
            # exact cyclic coordinate descent at fixed sigma
            s2 = sigma * sigma
            for _inner in range(10000):
                max_step = 0.0
                for j in range(len(theta)):
                    gj = g_diag[j]
                    if gj == 0.0 and quad[j] == 0.0:
                        continue
                    rho = (My[j] - (G[j] @ theta) + gj * theta[j]) / s2
                    if l1_mask[j]:
                        new = _soft(rho, lam) / (gj / s2)
                    else:
                        new = rho / (gj / s2 + quad[j])
                    max_step = max(max_step, abs(new - theta[j]))
                    theta[j] = new
                if max_step < 1e-12:
                    break
            resid = y_s - M @ theta
            sse = float(resid @ resid)
            # 4σ⁴ + nσ² − SSE = 0  →  σ² = (−n + √(n² + 16·SSE)) / 8
            new_sigma = math.sqrt((-n + math.sqrt(n * n + 16.0 * sse)) / 8.0)
            if abs(new_sigma - sigma) < 1e-13:
                sigma = new_sigma
                break
            sigma = new_sigma

        self.params = {
            "k": float(theta[0]),
            "m": float(theta[1]),
            "delta": theta[2:2 + p_cp].copy(),
            "beta": theta[2 + p_cp:].copy(),
            "sigma_obs": float(sigma),
        }
        self._design_cache = (M, quad, l1_mask, lam)
        self._t_hist = t
        return self

    def neg_log_posterior(self, theta: np.ndarray | None = None,
                          sigma: float | None = None) -> float:
        """The MAP objective L (up to additive constants) — exposed so
        tests can pin optimality without a Stan binary."""
        M, quad, l1_mask, lam = self._design_cache
        if theta is None:
            p = self.params
            theta = np.concatenate([[p["k"], p["m"]], p["delta"], p["beta"]])
        if sigma is None:
            sigma = self.params["sigma_obs"]
        y_s = (self.history["y"] / self.y_scale).to_numpy(dtype=float)
        resid = y_s - M @ theta
        n = len(y_s)
        return (
            n * math.log(sigma)
            + float(resid @ resid) / (2.0 * sigma * sigma)
            + 2.0 * sigma * sigma
            + float(theta @ (quad * theta)) / 2.0
            + lam * float(np.abs(theta[l1_mask]).sum())
        )

    # -- prediction ------------------------------------------------------

    def make_future_dataframe(self, periods: int, freq: str = "D",
                              include_history: bool = True) -> pd.DataFrame:
        last = self.history["ds"].max()
        fut = pd.date_range(last, periods=periods + 1, freq=freq)[1:]
        if include_history:
            ds = pd.concat(
                [self.history["ds"], pd.Series(fut)], ignore_index=True
            )
        else:
            ds = pd.Series(fut)
        return pd.DataFrame({"ds": pd.to_datetime(ds)})

    def _trend_scaled(self, t: np.ndarray, k: float, m: float,
                      delta: np.ndarray, cps: np.ndarray) -> np.ndarray:
        hinges = np.maximum(t[:, None] - cps[None, :], 0.0)
        return k * t + m + hinges @ delta

    def predict(self, future: pd.DataFrame | None = None) -> pd.DataFrame:
        if future is None:
            future = self.history[["ds"]]
        frame = future.copy()
        frame["ds"] = pd.to_datetime(frame["ds"])
        t = ((frame["ds"] - self.start).dt.total_seconds() / self.t_scale).to_numpy()
        p = self.params
        trend = self._trend_scaled(
            t, p["k"], p["m"], p["delta"], self.changepoints_t
        ) * self.y_scale
        X, _, components = self._feature_matrix(frame["ds"], frame)
        additive = (X @ p["beta"]) * self.y_scale if X.shape[1] else np.zeros(len(t))
        out = pd.DataFrame({"ds": frame["ds"], "trend": trend})
        for name, (lo, hi) in components.items():
            out[name] = (X[:, lo:hi] @ p["beta"][lo:hi]) * self.y_scale
        out["additive_terms"] = additive
        out["multiplicative_terms"] = 0.0
        out["yhat"] = trend + additive
        if self.uncertainty_samples:
            lower, upper = self._predict_uncertainty(t, X)
            out["yhat_lower"] = lower
            out["yhat_upper"] = upper
        return out

    def _sample_predictive_trend(self, t: np.ndarray,
                                 rng: np.random.Generator) -> np.ndarray:
        """Prophet sample_predictive_trend: future changepoints arrive at
        the historical rate with Laplace(0, mean|δ|) magnitudes."""
        p = self.params
        T = float(t.max())
        n_new = 0
        if T > 1.0:
            S = len(self.changepoints_t)
            n_new = rng.poisson(S * (T - 1.0))
        if n_new > 0:
            new_cps = np.sort(1.0 + rng.random(n_new) * (T - 1.0))
            lam = float(np.mean(np.abs(p["delta"]))) + 1e-8
            new_deltas = rng.laplace(0.0, lam, n_new)
            cps = np.concatenate([self.changepoints_t, new_cps])
            deltas = np.concatenate([p["delta"], new_deltas])
        else:
            cps, deltas = self.changepoints_t, p["delta"]
        return self._trend_scaled(t, p["k"], p["m"], deltas, cps)

    def _predict_uncertainty(self, t: np.ndarray, X: np.ndarray):
        p = self.params
        rng = np.random.default_rng(self.seed)
        seasonal_s = X @ p["beta"] if X.shape[1] else np.zeros(len(t))
        sims = np.empty((self.uncertainty_samples, len(t)))
        for i in range(self.uncertainty_samples):
            trend_s = self._sample_predictive_trend(t, rng)
            noise = rng.normal(0.0, p["sigma_obs"], len(t))
            sims[i] = (trend_s + seasonal_s + noise) * self.y_scale
        lo = (1.0 - self.interval_width) / 2.0
        return (
            np.quantile(sims, lo, axis=0),
            np.quantile(sims, 1.0 - lo, axis=0),
        )


def regressor_coefficients(model: ProphetMAP) -> pd.DataFrame:
    """Prophet utilities.regressor_coefficients: de-standardized additive
    coefficient per extra regressor, in y units per regressor unit
    (reference consumes this at app.py:214)."""
    rows = []
    for name, r in model.extra_regressors.items():
        lo, hi = model._components[name]
        beta = float(model.params["beta"][lo:hi][0])
        coef = beta * model.y_scale / r.std
        rows.append({
            "regressor": name,
            "regressor_mode": "additive",
            "center": r.mu,
            "coef_lower": coef,
            "coef": coef,
            "coef_upper": coef,
        })
    return pd.DataFrame(rows)
