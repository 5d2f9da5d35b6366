"""Stan-free Prophet MAP backend (pure numpy/pandas).

The reference's core forecaster is Prophet with MAP estimation and MC
uncertainty (app.py:124-138 builds ``Prophet(changepoint_prior_scale,
uncertainty_samples)`` per correlation; app.py:442-487 the saturating
variant; 1000 samples app.py:125). The prophet wheel (and its Stan
binary) is not installable in this environment, so this module vendors
the SAME statistical model and fits it in closed numpy:

Model (public prophet ``forecaster.py`` / ``prophet.stan``, additive
seasonality; linear growth shown — logistic/saturating growth swaps the
trend for Prophet's piecewise logistic, see the trend-machinery section
below, and is fitted by projected L-BFGS with exact forward-mode
gradients plus an active-set polish)::

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


# -- logistic (saturating) trend machinery ---------------------------------
#
# Prophet's piecewise logistic (public prophet forecaster.py
# piecewise_logistic / prophet.stan logistic_trend): offset adjustments
# γ_j keep the curve continuous across rate changepoints:
#
#   k_j = k + Σ_{l<=j} δ_l
#   γ_j = (t_j − m − Σ_{l<j} γ_l) · (1 − k_{j−1}/k_j)
#   trend(t) = cap(t) / (1 + exp(−(k + A(t)δ) · (t − (m + A(t)γ))))
#
# The γ recursion is differentiated in closed form (forward-mode over
# the 25-step recursion) so the L-BFGS fit uses exact gradients.


def _logistic_gamma(k: float, m: float, delta: np.ndarray, cps: np.ndarray,
                    with_grad: bool = False):
    """γ vector (S,), optionally with dγ/d(k, m, δ) of shape (S, 2+S)."""
    S = len(cps)
    gamma = np.zeros(S)
    k_cum = k
    gsum = 0.0
    if not with_grad:
        for j in range(S):
            k_prev = k_cum
            k_cum = k_cum + delta[j]
            base = cps[j] - m - gsum
            gamma[j] = base * (1.0 - k_prev / k_cum)
            gsum += gamma[j]
        return gamma
    p = 2 + S
    dgamma = np.zeros((S, p))
    dk_cum = np.zeros(p)
    dk_cum[0] = 1.0  # ∂k_cum/∂k
    dgsum = np.zeros(p)
    for j in range(S):
        k_prev, dk_prev = k_cum, dk_cum.copy()
        dk_cum = dk_prev.copy()
        dk_cum[2 + j] += 1.0
        k_cum = k_cum + delta[j]
        ratio = k_prev / k_cum
        dratio = (dk_prev * k_cum - k_prev * dk_cum) / (k_cum * k_cum)
        base = cps[j] - m - gsum
        dbase = -dgsum.copy()
        dbase[1] -= 1.0  # ∂base/∂m
        gamma[j] = base * (1.0 - ratio)
        dgamma[j] = dbase * (1.0 - ratio) - base * dratio
        gsum += gamma[j]
        dgsum = dgsum + dgamma[j]
    return gamma, dgamma


def _piecewise_logistic(t: np.ndarray, cap_s: np.ndarray, k: float, m: float,
                        delta: np.ndarray, cps: np.ndarray) -> np.ndarray:
    gamma = _logistic_gamma(k, m, delta, cps)
    A = (t[:, None] >= cps[None, :]).astype(float)
    rate = k + A @ delta
    offset = m + A @ gamma
    x = np.clip(rate * (t - offset), -500.0, 500.0)
    return cap_s / (1.0 + np.exp(-x))


def _lbfgs(f_grad, x0: np.ndarray, max_iter: int = 500, mem: int = 10,
           tol: float = 1e-10, project=None):
    """Compact L-BFGS with Armijo backtracking. ``f_grad(x) -> (f, g)``;
    non-smooth |δ| terms enter g as subgradients (sign, 0 at 0) — the
    Armijo test runs on the true objective, so steps always descend.
    ``project`` (optional) maps each trial iterate onto a feasible set
    before evaluation (e.g. an orthant, OWL-QN style)."""
    x = x0.copy()
    if project is not None:
        x = project(x)
    f, g = f_grad(x)
    s_list: list[np.ndarray] = []
    y_list: list[np.ndarray] = []
    rho: list[float] = []
    for _ in range(max_iter):
        gnorm = float(np.abs(g).max())
        if gnorm < tol:
            break
        q = g.copy()
        alphas = []
        for s, yv, r in zip(reversed(s_list), reversed(y_list), reversed(rho)):
            a = r * float(s @ q)
            alphas.append(a)
            q -= a * yv
        if y_list:
            scale = float(s_list[-1] @ y_list[-1]) / float(y_list[-1] @ y_list[-1])
        else:
            scale = 1.0 / max(gnorm, 1.0)
        z = scale * q
        for (s, yv, r), a in zip(zip(s_list, y_list, rho), reversed(alphas)):
            b = r * float(yv @ z)
            z += (a - b) * s
        d = -z
        gd = float(g @ d)
        if gd > 0:  # not a descent direction (curvature noise): steepest
            d = -g
            gd = -float(g @ g)
        step = 1.0
        fn, gn, xn = f, g, x
        while step > 1e-15:
            xn = x + step * d
            if project is not None:
                xn = project(xn)
            fn, gn = f_grad(xn)
            if fn <= f + 1e-4 * step * gd:
                break
            step *= 0.5
        if step <= 1e-15 or fn >= f - 1e-15 * (abs(f) + 1.0):
            break
        s_vec = xn - x
        y_vec = gn - g
        sy = float(s_vec @ y_vec)
        if sy > 1e-12:
            s_list.append(s_vec)
            y_list.append(y_vec)
            rho.append(1.0 / sy)
            if len(s_list) > mem:
                s_list.pop(0)
                y_list.pop(0)
                rho.pop(0)
        x, f, g = xn, fn, gn
    return x, f


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
        if self.growth not in ("linear", "logistic"):
            raise ValueError(f"growth must be linear or logistic: {self.growth}")

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

    def _floor_cap_scaled(self, frame: pd.DataFrame):
        """Per-row (floor, cap_scaled) arrays for the logistic branch
        (prophet setup_dataframe: y/cap shift by the floor column when
        present, then divide by y_scale)."""
        n = len(frame)
        floor = (
            frame["floor"].astype(float).to_numpy()
            if self.logistic_floor
            else np.zeros(n)
        )
        if "cap" not in frame.columns:
            raise ValueError("logistic growth requires a 'cap' column")
        cap_s = (frame["cap"].astype(float).to_numpy() - floor) / self.y_scale
        if np.any(cap_s <= 0):
            raise ValueError("cap must exceed floor everywhere")
        return floor, cap_s

    def fit(self, df: pd.DataFrame) -> "ProphetMAP":
        hist = df.dropna(subset=["y"]).sort_values("ds").reset_index(drop=True)
        if len(hist) < 2:
            raise ValueError("ProphetMAP requires >= 2 non-null rows")
        hist = hist.copy()
        hist["ds"] = pd.to_datetime(hist["ds"])
        self.history = hist
        self.start = hist["ds"].min()
        self.t_scale = (hist["ds"].max() - self.start).total_seconds() or 1.0
        self.logistic_floor = self.growth == "logistic" and "floor" in hist.columns
        if self.growth == "logistic":
            floor = (
                hist["floor"].astype(float).to_numpy()
                if self.logistic_floor
                else np.zeros(len(hist))
            )
            self.y_scale = float(np.abs(hist["y"].to_numpy() - floor).max()) or 1.0
            _, cap_s = self._floor_cap_scaled(hist)
            y_s = (hist["y"].to_numpy(dtype=float) - floor) / self.y_scale
        else:
            self.y_scale = float(np.abs(hist["y"]).max()) or 1.0
            y_s = (hist["y"] / self.y_scale).to_numpy(dtype=float)
            cap_s = None
        t = ((hist["ds"] - self.start).dt.total_seconds() / self.t_scale).to_numpy()

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
        if self.growth == "logistic":
            self._fit_logistic(t, y_s, cap_s, X, prior_scales)
            self._t_hist = t
            return self

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

    def _fit_logistic(self, t: np.ndarray, y_s: np.ndarray, cap_s: np.ndarray,
                      X: np.ndarray, prior_scales: np.ndarray) -> None:
        """Saturating-growth MAP: L-BFGS with exact analytic gradients
        over (k, m, δ, β) at fixed σ, alternated with the closed-form σ
        root (same stationarity as the linear branch). The γ-recursion
        gradient comes from _logistic_gamma(with_grad=True); the
        gradient itself is pinned against finite differences in
        tests/test_prophet_map.py."""
        n = len(y_s)
        cps = self.changepoints_t
        S = len(cps)
        p_tr = 2 + S
        p_x = X.shape[1]
        A = (t[:, None] >= cps[None, :]).astype(float)
        lam = 1.0 / self.changepoint_prior_scale
        beta_pen = (
            1.0 / np.square(prior_scales) if p_x else np.zeros(0)
        )

        # prophet logistic_growth_init
        i0, i1 = 0, n - 1
        C0, C1 = cap_s[i0], cap_s[i1]
        T = t[i1] - t[i0] or 1.0
        y0 = min(max(y_s[i0], 0.01 * C0), 0.99 * C0)
        y1 = min(max(y_s[i1], 0.01 * C1), 0.99 * C1)
        r0, r1 = C0 / y0, C1 / y1
        if abs(r0 - r1) <= 0.01:
            r0 = 1.05 * r0
        L0, L1 = math.log(r0 - 1.0), math.log(r1 - 1.0)
        k0 = (L0 - L1) / T
        m0 = L0 * T / (L0 - L1)

        theta = np.zeros(p_tr + p_x)
        theta[0], theta[1] = k0, m0
        sigma = 1.0

        def f_grad_at(sigma_now):
            s2 = sigma_now * sigma_now

            def f_grad(th):
                k, m = th[0], th[1]
                delta = th[2:p_tr]
                beta = th[p_tr:]
                gamma, dgamma = _logistic_gamma(k, m, delta, cps, with_grad=True)
                rate = k + A @ delta
                offset = m + A @ gamma
                x = np.clip(rate * (t - offset), -500.0, 500.0)
                sig = 1.0 / (1.0 + np.exp(-x))
                trend = cap_s * sig
                eta = trend + (X @ beta if p_x else 0.0)
                resid = y_s - eta
                f = (
                    n * math.log(sigma_now)
                    + float(resid @ resid) / (2.0 * s2)
                    + 2.0 * s2
                    + (k * k + m * m) / 50.0
                    + lam * float(np.abs(delta).sum())
                    + float(beta @ (beta_pen * beta)) / 2.0
                )
                doffset = A @ dgamma
                doffset[:, 1] += 1.0
                drate = np.zeros((n, p_tr))
                drate[:, 0] = 1.0
                drate[:, 2:] = A
                dx = drate * (t - offset)[:, None] - rate[:, None] * doffset
                dtrend = (cap_s * sig * (1.0 - sig))[:, None] * dx
                g = np.empty_like(th)
                g[:p_tr] = -(resid / s2) @ dtrend
                g[0] += k / 25.0
                g[1] += m / 25.0
                g[2:p_tr] += lam * np.sign(delta)
                if p_x:
                    g[p_tr:] = -(X.T @ resid) / s2 + beta_pen * beta
                return f, g

            return f_grad

        def ista_polish(fg, th, iters=400):
            """Proximal-gradient polish: L-BFGS with an |δ| subgradient
            stalls near kinks (curvature pairs jump by ±2λ when a δ
            crosses 0); ISTA soft-thresholds the δ block exactly, so it
            snaps near-zero deltas to 0 and drives the smooth
            coordinates to true stationarity."""
            f, g = fg(th)
            eta = 1e-2
            for _ in range(iters):
                delta_blk = th[2:p_tr]
                g_smooth = g.copy()
                g_smooth[2:p_tr] -= lam * np.sign(delta_blk)
                smooth_f = f - lam * float(np.abs(delta_blk).sum())
                while True:
                    cand = th - eta * g_smooth
                    cand[2:p_tr] = np.sign(cand[2:p_tr]) * np.maximum(
                        np.abs(cand[2:p_tr]) - eta * lam, 0.0
                    )
                    fc, gc = fg(cand)
                    step = cand - th
                    smooth_fc = fc - lam * float(np.abs(cand[2:p_tr]).sum())
                    ok = smooth_fc <= smooth_f + float(g_smooth @ step) + float(
                        step @ step
                    ) / (2.0 * eta)
                    if ok or eta < 1e-14:
                        break
                    eta *= 0.5
                if fc > f - 1e-14 * (abs(f) + 1.0):
                    th = cand if fc < f else th
                    break
                th, f, g = cand, fc, gc
                eta *= 1.5
            return th

        def active_set_refine(fg, th, max_rounds=10):
            """Lasso-style active-set polish: ISTA identifies the δ
            support but converges at O(L/μ) on this ill-conditioned
            problem; with the zero deltas CLAMPED the objective is
            smooth (λ·s_j·δ_j linear at fixed signs), so plain L-BFGS
            drives the active coordinates to real stationarity. Rounds
            re-check the KKT conditions: an inactive δ whose smooth
            gradient exceeds λ enters the support; an active δ that
            flips sign leaves it."""
            delta = th[2:p_tr]
            active = delta != 0.0
            signs = np.sign(delta)
            for _round in range(max_rounds):
                act_idx = np.concatenate([
                    np.array([0, 1]),
                    2 + np.where(active)[0],
                    np.arange(p_tr, p_tr + p_x),
                ]).astype(int)
                sgn_act = signs[active]

                def fg_red(th_red):
                    th_full = th.copy()
                    th_full[act_idx] = th_red
                    f, g = fg(th_full)
                    d = th_full[2:p_tr]
                    smooth_f = f - lam * float(np.abs(d).sum())
                    n_act = int(active.sum())
                    d_act = th_red[2:2 + n_act]
                    f_a = smooth_f + lam * float(sgn_act @ d_act)
                    g_red = g[act_idx].copy()
                    # replace the |δ| subgradient with the fixed-sign
                    # linear term for the active coordinates
                    g_red[2:2 + n_act] += lam * (sgn_act - np.sign(d[active]))
                    return f_a, g_red

                n_act = int(active.sum())

                def project(th_red):
                    # orthant projection: an active δ that crosses its
                    # assumed sign clamps to 0, so λ·s_j·δ_j == λ|δ_j|
                    # everywhere the search visits (otherwise a
                    # saturated sigmoid makes the sign-fixed linear
                    # term unbounded below)
                    out = th_red.copy()
                    d_act = out[2:2 + n_act]
                    d_act[d_act * sgn_act < 0] = 0.0
                    return out

                th_red, _ = _lbfgs(
                    fg_red, th[act_idx].copy(), max_iter=1000, project=project
                )
                th = th.copy()
                th[act_idx] = th_red
                delta = th[2:p_tr]
                # actives that crossed zero leave the support
                flipped = active & (np.sign(delta) != signs) & (delta != 0.0)
                delta[flipped] = 0.0
                active &= ~flipped
                f, g = fg(th)
                smooth_d = g[2:p_tr] - lam * np.sign(delta)
                entering = (~active) & (np.abs(smooth_d) > lam * (1.0 + 1e-9))
                if not flipped.any() and not entering.any():
                    break
                active |= entering
                signs = np.where(entering, -np.sign(smooth_d), signs)
            return th

        # alternation: rough LBFGS+ISTA identifies the δ support, the
        # active-set pass polishes to stationarity, then σ re-solves in
        # closed form until the pair settles
        for _outer in range(30):
            fg = f_grad_at(sigma)
            theta, _ = _lbfgs(fg, theta, max_iter=300 if _outer == 0 else 60)
            theta = ista_polish(fg, theta, iters=200 if _outer == 0 else 50)
            theta = active_set_refine(fg, theta)
            k, m = theta[0], theta[1]
            delta = theta[2:p_tr]
            beta = theta[p_tr:]
            trend = _piecewise_logistic(t, cap_s, k, m, delta, cps)
            resid = y_s - trend - (X @ beta if p_x else 0.0)
            sse = float(resid @ resid)
            new_sigma = math.sqrt((-n + math.sqrt(n * n + 16.0 * sse)) / 8.0)
            done = abs(new_sigma - sigma) < 1e-8 * max(sigma, 1e-6)
            sigma = new_sigma
            if done:
                break

        self.params = {
            "k": float(theta[0]),
            "m": float(theta[1]),
            "delta": theta[2:p_tr].copy(),
            "beta": theta[p_tr:].copy(),
            "sigma_obs": float(sigma),
        }
        self._logistic_fg = f_grad_at  # for the gradient/stationarity tests
        self._design_cache = None

    def neg_log_posterior(self, theta: np.ndarray | None = None,
                          sigma: float | None = None) -> float:
        """The MAP objective L (up to additive constants) — exposed so
        tests can pin optimality without a Stan binary."""
        if theta is None:
            p = self.params
            theta = np.concatenate([[p["k"], p["m"]], p["delta"], p["beta"]])
        if sigma is None:
            sigma = self.params["sigma_obs"]
        if self._design_cache is None:  # logistic branch: reuse the fit closure
            f, _ = self._logistic_fg(sigma)(np.asarray(theta, dtype=float))
            return float(f)
        M, quad, l1_mask, lam = self._design_cache
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
            future = self.history
        frame = future.copy()
        frame["ds"] = pd.to_datetime(frame["ds"])
        t = ((frame["ds"] - self.start).dt.total_seconds() / self.t_scale).to_numpy()
        p = self.params
        if self.growth == "logistic":
            floor, cap_s = self._floor_cap_scaled(frame)
            trend_s = _piecewise_logistic(
                t, cap_s, p["k"], p["m"], p["delta"], self.changepoints_t
            )
        else:
            floor, cap_s = np.zeros(len(t)), None
            trend_s = self._trend_scaled(
                t, p["k"], p["m"], p["delta"], self.changepoints_t
            )
        trend = trend_s * self.y_scale + floor
        X, _, components = self._feature_matrix(frame["ds"], frame)
        additive = (X @ p["beta"]) * self.y_scale if X.shape[1] else np.zeros(len(t))
        out = pd.DataFrame({"ds": frame["ds"], "trend": trend})
        for name, (lo, hi) in components.items():
            out[name] = (X[:, lo:hi] @ p["beta"][lo:hi]) * self.y_scale
        out["additive_terms"] = additive
        out["multiplicative_terms"] = 0.0
        out["yhat"] = trend + additive
        if self.uncertainty_samples:
            lower, upper = self._predict_uncertainty(t, X, cap_s, floor)
            out["yhat_lower"] = lower
            out["yhat_upper"] = upper
        return out

    def _sample_predictive_trend(self, t: np.ndarray, rng: np.random.Generator,
                                 cap_s: np.ndarray | None = None) -> np.ndarray:
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
        if cap_s is not None:
            return _piecewise_logistic(t, cap_s, p["k"], p["m"], deltas, cps)
        return self._trend_scaled(t, p["k"], p["m"], deltas, cps)

    def _predict_uncertainty(self, t: np.ndarray, X: np.ndarray,
                             cap_s: np.ndarray | None = None,
                             floor: np.ndarray | float = 0.0):
        p = self.params
        rng = np.random.default_rng(self.seed)
        seasonal_s = X @ p["beta"] if X.shape[1] else np.zeros(len(t))
        sims = np.empty((self.uncertainty_samples, len(t)))
        for i in range(self.uncertainty_samples):
            trend_s = self._sample_predictive_trend(t, rng, cap_s)
            noise = rng.normal(0.0, p["sigma_obs"], len(t))
            sims[i] = (trend_s + seasonal_s + noise) * self.y_scale + floor
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
