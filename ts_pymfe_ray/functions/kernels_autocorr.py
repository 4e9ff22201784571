"""Autocorrelation-group feature kernels (reference:
/root/reference/tspymfe/autocorr.py, class MFETSAutocorr)."""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions import stats as _st
from ts_pymfe_ray.functions.kernels_general import _find_crit_pt
from ts_pymfe_ray.functions.special import chi2_sf


def embed_lag(c: SeriesCtx) -> int:
    """Default embedding lag: first non-significant detrended-ACF lag
    (reference _embed.py:346-455 'acf' method); fallback 1."""
    acfs = c.detrended_acfs
    thr = 1.96 / np.sqrt(c.ts.size)
    below = np.flatnonzero(np.abs(acfs) <= thr)
    return int(below[0] + 1) if below.size else 1


register(FeatureKernel(
    "acf", "autocorr",
    lambda c: _st.acf(c.ts, nlags=c.ts.size // 2),
    returns_array=True,
    ref="autocorr.py:315 (raw series, adjusted FFT ACF, lag 0 dropped)",
))

register(FeatureKernel(
    "acf_detrended", "autocorr",
    lambda c: c.detrended_acfs,
    returns_array=True, cost="medium",
    ref="autocorr.py:345",
))

def _detrended_diff(c: SeriesCtx) -> np.ndarray:
    """diff(ts) detrended with SuperSmoother — ft_acf_diff / ft_pacf_diff
    default detrend=True (autocorr.py:391,512 -> _calc_acf detrend path)."""

    def _build():
        from ts_pymfe_ray.functions.decompose import supersmoother

        d = np.diff(c.ts)
        return d - supersmoother(d)

    return c._get("detrended_diff", _build)


register(FeatureKernel(
    "acf_diff", "autocorr",
    lambda c: _st.acf(_detrended_diff(c), nlags=max(1, (c.ts.size - 1) // 2)),
    returns_array=True, cost="medium",
    ref="autocorr.py:391 (detrend=True default: SS-detrended diff)",
))

register(FeatureKernel(
    "pacf", "autocorr",
    lambda c: _st.pacf_ols(c.ts),
    returns_array=True, cost="medium",
    ref="autocorr.py:442 (ols-adjusted, exact reference method)",
))

register(FeatureKernel(
    "pacf_detrended", "autocorr",
    lambda c: _st.pacf_ols(c.ts_detrended_ss),
    returns_array=True, cost="medium",
    ref="autocorr.py:471 (ols-adjusted)",
))

register(FeatureKernel(
    "pacf_diff", "autocorr",
    lambda c: _st.pacf_ols(_detrended_diff(c)),
    returns_array=True, cost="medium",
    ref="autocorr.py:512 (detrend=True default, ols-adjusted)",
))


def _first_below(c: SeriesCtx, threshold: float, use_abs: bool) -> float:
    acfs = np.abs(c.detrended_acfs) if use_abs else c.detrended_acfs
    below = np.flatnonzero(acfs <= threshold)
    return float(below[0] + 1) if below.size else np.nan


register(FeatureKernel(
    "acf_first_nonsig", "autocorr",
    lambda c: _first_below(c, 1.96 / np.sqrt(c.ts.size), True),
    cost="medium",
    ref="autocorr.py:562-617",
))

register(FeatureKernel(
    "acf_first_nonpos", "autocorr",
    lambda c: _first_below(c, 0.0, False),
    cost="medium",
    ref="autocorr.py:620",
))


def _first_acf_locmin(c: SeriesCtx) -> float:
    locmin = np.flatnonzero(_find_crit_pt(c.detrended_acfs, "min"))
    return float(locmin[0] + 1) if locmin.size else np.nan


register(FeatureKernel("first_acf_locmin", "autocorr", _first_acf_locmin,
                       cost="medium", ref="autocorr.py:662"))


def _trev(c: SeriesCtx, only_numerator: bool = False) -> float:
    lag = embed_lag(c)
    d = c.ts[lag:] - c.ts[:-lag]
    numen = float(np.mean(d**3))
    if only_numerator:
        return numen
    return numen / float(np.mean(d**2)) ** 1.5


register(FeatureKernel("trev", "autocorr", _trev, cost="medium",
                       ref="autocorr.py:711-797"))


def _tc3(c: SeriesCtx) -> float:
    lag = embed_lag(c)
    x = c.ts
    if x.size <= 2 * lag:
        return np.nan
    s1, s2, s3 = x[: -2 * lag], x[lag:-lag], x[2 * lag :]
    aux = s1 * s2
    return float(np.mean(aux * s3) / np.abs(np.mean(aux)) ** 1.5)


register(FeatureKernel("tc3", "autocorr", _tc3, cost="medium",
                       ref="autocorr.py:800-890"))


def _gen_autocorr(c: SeriesCtx, alpha: float = 1, beta: float = 1) -> float:
    lag = embed_lag(c)
    ts_abs = np.abs(c.ts)
    a, b = ts_abs[:-lag], ts_abs[lag:]
    am, bm = np.mean(a**alpha), np.mean(b**beta)
    # NOTE: operator precedence reproduced exactly as in the reference
    # (autocorr.py:994-1003): the normalization divides only the mean
    # product, not the whole covariance.
    return float(
        np.mean(a**alpha * b**beta)
        - am * bm / (
            np.sqrt(np.mean(a ** (2 * alpha)) - am**2)
            * np.sqrt(np.mean(b ** (2 * beta)) - bm**2)
        )
    )


register(FeatureKernel("gen_autocorr", "autocorr", _gen_autocorr, cost="medium",
                       ref="autocorr.py:893-1008 (bug-compatible precedence)"))


register(FeatureKernel(
    "autocorr_crit_pt", "autocorr",
    lambda c: np.flatnonzero(_find_crit_pt(c.detrended_acfs, "non-plateau")).astype(float),
    returns_array=True, cost="medium",
    ref="autocorr.py:1011-1086",
))


def _autocorr_out_dist(c: SeriesCtx, p: float = 0.8) -> np.ndarray:
    acfs = c.detrended_acfs
    ts_abs = np.abs(c.ts)
    inliers = c.ts[ts_abs <= _st.quantiles_part(ts_abs, (p,))[0]]
    in_acfs = _st.acf(inliers, nlags=inliers.size // 2)
    return np.abs(acfs[: in_acfs.size] - in_acfs)


register(FeatureKernel("autocorr_out_dist", "autocorr", _autocorr_out_dist,
                       returns_array=True, cost="medium",
                       ref="autocorr.py:1243-1314"))


def _gresid(c: SeriesCtx) -> np.ndarray:
    from ts_pymfe_ray.functions.gp import fit_gp_residuals

    return c._get("gaussian_resid", lambda: fit_gp_residuals(c.ts_scaled))


register(FeatureKernel(
    "gresid_autocorr", "autocorr",
    lambda c: _st.acf(_gresid(c), nlags=8),
    returns_array=True, cost="heavy",
    ref="autocorr.py:1089-1161 (numpy GP, approximate parity)",
))


def ljung_box_pvals(resid: np.ndarray, max_nlags: int = 16) -> np.ndarray:
    """Ljung-Box per-lag p-values (used by ft_test_lb and gresid_lbtest;
    reference stat_tests.py:72 via statsmodels acorr_ljungbox)."""
    n = resid.size
    h = min(max_nlags, n - 1)
    if h < 1:
        return np.empty(0)
    a = _st.acf(resid, nlags=h, adjusted=False)
    terms = a**2 / (n - np.arange(1, h + 1))
    q = n * (n + 2.0) * np.cumsum(terms)
    return np.array([chi2_sf(q[k], k + 1) for k in range(h)])


register(FeatureKernel(
    "gresid_lbtest", "autocorr",
    lambda c: ljung_box_pvals(_gresid(c), 8),
    returns_array=True, cost="heavy",
    ref="autocorr.py:1164-1240",
))
