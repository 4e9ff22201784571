"""Model-based feature kernels (reference:
/root/reference/tspymfe/model_based.py, class MFETSModelBased).

Optimizer-backed fits (Holt / Holt-Winters / ARIMA / GP) use the numpy
reimplementations in functions/models.py — documented approximate parity."""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions import stats as _st
from ts_pymfe_ray.functions.models import TSArima, TSHolt, TSHoltWinters
from ts_pymfe_ray.functions.kernels_global import calc_ioe_stats


def _des(c: SeriesCtx) -> TSHolt:
    """Holt double ES on the scaled series (model_based.py:295-344)."""

    def _fit():
        m = TSHolt()
        m.fit_series(c.ts_scaled)
        return m

    return c._get("model_des", _fit)


def _ets(c: SeriesCtx) -> TSHoltWinters:
    """Holt-Winters triple additive ES with seasonal_periods=period
    (model_based.py:347-413)."""

    def _fit():
        m = TSHoltWinters(period=max(2, c.period), seasonal="add")
        m.fit_series(c.ts_scaled)
        return m

    return c._get("model_ets", _fit)


register(FeatureKernel("des_level", "model_based", lambda c: float(_des(c).alpha),
                       cost="heavy", ref="model_based.py:451"))
register(FeatureKernel("des_trend", "model_based", lambda c: float(_des(c).beta),
                       cost="heavy", ref="model_based.py:512"))
register(FeatureKernel("ets_level", "model_based", lambda c: float(_ets(c).alpha),
                       cost="heavy", ref="model_based.py:574"))
register(FeatureKernel("ets_trend", "model_based", lambda c: float(_ets(c).beta),
                       cost="heavy", ref="model_based.py:647"))
register(FeatureKernel("ets_season", "model_based", lambda c: float(_ets(c).gamma),
                       cost="heavy", ref="model_based.py:721"))


def ortho_poly(ts: np.ndarray, degree: int = 2) -> np.ndarray:
    """R poly()-compatible orthogonal polynomial design (reference
    _orthopoly.py:5-40)."""
    x = ts - ts.mean()
    pol = np.fliplr(np.vander(x, degree + 1))
    q, r = np.linalg.qr(pol)
    raw = q * np.diag(r)
    norms = np.sqrt(np.sum(raw**2, axis=0))
    return (raw / norms)[:, 1:]


def _orthoreg_params(c: SeriesCtx) -> np.ndarray:
    def _fit():
        X = ortho_poly(np.linspace(0, 1, c.ts_trend.size), 2)
        X = np.column_stack([np.ones(X.shape[0]), X])
        y = _st.standardize_ts(c.ts_trend)
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        return beta

    return c._get("orthoreg", _fit)


register(FeatureKernel("linearity", "model_based",
                       lambda c: float(_orthoreg_params(c)[1]),
                       cost="medium",
                       ref="model_based.py:794, _orthopoly.py:5-40"))
register(FeatureKernel("curvature", "model_based",
                       lambda c: float(_orthoreg_params(c)[2]),
                       cost="medium", ref="model_based.py:845"))


def _avg_cycle_period(c: SeriesCtx) -> float:
    """2*pi/arccos(-phi1(1-phi2)/(4 phi2)) from AR(2) fit
    (model_based.py:896-940); NaN when no cycle exists."""
    m = TSArima((2, 0, 0), const=True)
    m.fit_series(c.ts)
    a, b = float(m.params[1]), float(m.params[2])
    if a * a + 4 * b >= 0:
        return np.nan
    return float(2 * np.pi / np.arccos(-0.25 * a * (1 - b) / b))


register(FeatureKernel("avg_cycle_period", "model_based", _avg_cycle_period,
                       cost="medium", ref="model_based.py:896-940"))


def _gaussian_r_sqr(c: SeriesCtx) -> float:
    from ts_pymfe_ray.functions.gp import gp_r_squared

    return gp_r_squared(c.ts_scaled)


register(FeatureKernel("gaussian_r_sqr", "model_based", _gaussian_r_sqr,
                       cost="heavy", ref="model_based.py:943"))


def _ioe_std_fit(c: SeriesCtx, step_size: float = 0.05) -> tuple[float, float]:
    def _fit():
        from ts_pymfe_ray.functions.kernels_global import ioe_stats_fast

        ioe_std = ioe_stats_fast(c.ts_scaled, "std_adj", step_size=step_size)
        if ioe_std.size < 3:
            return (np.nan, np.nan)
        x = np.arange(ioe_std.size) * step_size
        X = np.column_stack([np.ones(x.size), x])
        beta, *_ = np.linalg.lstsq(X, ioe_std, rcond=None)
        resid = ioe_std - X @ beta
        ss_res = float(resid @ resid)
        ss_tot = float(((ioe_std - ioe_std.mean()) ** 2).sum())
        n, k = ioe_std.size, 1
        r2 = 1 - ss_res / ss_tot if ss_tot > 0 else np.nan
        adj = 1 - (1 - r2) * (n - 1) / (n - k - 1) if np.isfinite(r2) else np.nan
        return (float(beta[1]), float(adj))

    return c._get("ioe_std_linreg", _fit)


register(FeatureKernel("ioe_std_slope", "model_based",
                       lambda c: _ioe_std_fit(c)[0],
                       cost="medium", ref="model_based.py:1002, fit 226-292"))
register(FeatureKernel("ioe_std_adj_r_sqr", "model_based",
                       lambda c: _ioe_std_fit(c)[1],
                       cost="medium", ref="model_based.py:1066"))
