"""Independent numeric validation of the APPROX kernel classes.

Every test here re-implements a SECOND, naive version of the target
computation inline — dense grid search against the engine's Nelder-Mead
SSE fits, closed forms, synthetic series with analytically known answers,
and null-distribution calibration for the simulated-p-value stat tests.
No code is shared with the kernels under test (the round-2 verdict's gap:
the optimizer-backed kernels rested on self-goldens that would mask a
systematic bias).

Conventions: for optimizer fits the assertion is "the engine's fitted
parameters score within a few percent of the best point of a dense
independent grid (with per-grid-point OPTIMAL linear initial states)" —
parameter equality is not required (flat SSE surfaces), solution QUALITY
is.
"""

import numpy as np
import pytest

import ts_pymfe_ray.features  # populate registry  # noqa: F401
from ts_pymfe_ray.registry import REGISTRY, SeriesCtx


def _kernel(name):
    return REGISTRY[name].fn


# --------------------------------------------------------------- helpers


def _arfima_d(n: int, d: float, rng: np.random.Generator) -> np.ndarray:
    """ARFIMA(0, d, 0) via truncated MA(inf): psi_k = psi_{k-1}(k-1+d)/k.
    Hurst exponent of the resulting fractional noise is H = d + 0.5."""
    k = 4096
    psi = np.empty(k)
    psi[0] = 1.0
    for i in range(1, k):
        psi[i] = psi[i - 1] * (i - 1 + d) / i
    eps = rng.standard_normal(n + k)
    return np.convolve(eps, psi, mode="full")[k : k + n]


# ------------------------------------------------- exponential smoothing


def test_ses_alpha_beats_dense_grid():
    """TSSES (Nelder-Mead over alpha, l0) vs a dense alpha grid with the
    closed-form SSE-optimal l0 per alpha (fitted values are affine in l0:
    f = a_t + (1-alpha)^t l0)."""
    from ts_pymfe_ray.functions.models import TSSES

    rng = np.random.default_rng(3)
    for trial in range(3):
        n = 48
        y = np.cumsum(rng.normal(0, 1, n)) + rng.normal(0, 0.3, n)

        def naive_sse(alpha, l0):
            l, sse = l0, 0.0
            for v in y:
                sse += (v - l) ** 2
                l = alpha * v + (1 - alpha) * l
            return sse

        best = np.inf
        for alpha in np.linspace(0.01, 0.999, 200):
            # basis: fitted(l0) = a_t + b_t*l0 with b_t = (1-alpha)^t
            b = (1 - alpha) ** np.arange(n)
            a = np.empty(n)
            l = 0.0
            for t in range(n):
                a[t] = l
                l = alpha * y[t] + (1 - alpha) * l
            denom = float(b @ b)
            l0 = float(b @ (y - a)) / denom if denom > 0 else y[0]
            best = min(best, naive_sse(alpha, l0))

        m = TSSES().fit_series(y)
        # engine alpha with the grid's optimal-l0 construction
        b = (1 - m.alpha) ** np.arange(n)
        a = np.empty(n)
        l = 0.0
        for t in range(n):
            a[t] = l
            l = m.alpha * y[t] + (1 - m.alpha) * l
        l0 = float(b @ (y - a)) / float(b @ b)
        eng = naive_sse(m.alpha, l0)
        assert eng <= best * 1.05 + 1e-9, (trial, eng, best)


def test_holt_beats_dense_grid():
    """TSHolt vs a (alpha, beta) grid with lstsq-optimal (l0, b0) per grid
    point (the filter is affine in the initial states)."""
    from ts_pymfe_ray.functions.models import TSHolt

    rng = np.random.default_rng(5)
    n = 48
    y = 0.4 * np.arange(n) + np.cumsum(rng.normal(0, 0.5, n))

    def naive_filter(alpha, beta, l0, b0):
        f = np.empty(n)
        l, bb = l0, b0
        for t in range(n):
            f[t] = l + bb
            l_new = alpha * y[t] + (1 - alpha) * (l + bb)
            bb = beta * (l_new - l) + (1 - beta) * bb
            l = l_new
        return f

    def best_init_sse(alpha, beta):
        f00 = naive_filter(alpha, beta, 0.0, 0.0)
        e1 = naive_filter(alpha, beta, 1.0, 0.0) - f00
        e2 = naive_filter(alpha, beta, 0.0, 1.0) - f00
        X = np.column_stack([e1, e2])
        beta_hat, *_ = np.linalg.lstsq(X, y - f00, rcond=None)
        r = y - f00 - X @ beta_hat
        return float(r @ r)

    grid = np.linspace(0.02, 0.98, 14)
    best = min(best_init_sse(a, b) for a in grid for b in grid)

    m = TSHolt().fit_series(y)
    eng = best_init_sse(m.alpha, m.beta)
    assert eng <= best * 1.10 + 1e-9, (eng, best)


def test_holtwinters_beats_dense_grid():
    """TSHoltWinters (additive) vs a (alpha, beta, gamma) grid sharing the
    documented classical-decomposition initial states, re-derived here
    independently."""
    from ts_pymfe_ray.functions.models import TSHoltWinters

    rng = np.random.default_rng(11)
    p = 8
    n = 64
    t = np.arange(n)
    y = 10 + 0.2 * t + 3 * np.sin(2 * np.pi * t / p) + rng.normal(0, 0.4, n)

    # independent re-derivation of the documented heuristic inits
    nseas = n // p
    mat = y[: nseas * p].reshape(nseas, p)
    s0 = mat.mean(axis=0) - y[: nseas * p].mean()
    l0 = y[: nseas * p].mean()
    b0 = (mat[-1].mean() - mat[0].mean()) / ((nseas - 1) * p)

    def naive_sse(a, b, g):
        l, bb = l0, b0
        s = list(s0)
        sse = 0.0
        for i in range(n):
            si = s[i % p]
            f = l + bb + si
            sse += (y[i] - f) ** 2
            l_new = a * (y[i] - si) + (1 - a) * (l + bb)
            s[i % p] = g * (y[i] - l_new) + (1 - g) * si
            bb = b * (l_new - l) + (1 - b) * bb
            l = l_new
        return sse

    grid = np.linspace(0.02, 0.98, 9)
    best = min(naive_sse(a, b, g) for a in grid for b in grid for g in grid)

    m = TSHoltWinters(period=p, seasonal="add").fit_series(y)
    eng = naive_sse(m.alpha, m.beta, m.gamma)
    assert eng <= best * 1.10 + 1e-9, (eng, best)


# --------------------------------------------------------------- ARIMA


def test_arima_pure_ar_matches_fresh_ols():
    """AR(p)+c conditional-SSE optimum == OLS on the lag design, computed
    here from scratch."""
    from ts_pymfe_ray.functions.models import TSArima

    rng = np.random.default_rng(21)
    n = 1000
    y = np.zeros(n)
    e = rng.normal(size=n)
    for i in range(2, n):
        y[i] = 1.0 + 0.5 * y[i - 1] - 0.3 * y[i - 2] + e[i]

    m = TSArima((2, 0, 0), const=True).fit_series(y)
    X = np.column_stack([np.ones(n - 2), y[1:-1], y[:-2]])
    beta, *_ = np.linalg.lstsq(X, y[2:], rcond=None)
    assert np.allclose(m.params, beta, atol=1e-8)
    assert abs(beta[1] - 0.5) < 0.1 and abs(beta[2] + 0.3) < 0.1


def test_arima_ma_beats_dense_grid():
    """ARIMA(0,1,1)+c: engine CSS vs a dense (theta, c) grid evaluated
    with an independently coded CSS recursion."""
    from ts_pymfe_ray.functions.models import TSArima

    rng = np.random.default_rng(23)
    n = 200
    eps = rng.normal(size=n + 1)
    w = 0.3 + eps[1:] + 0.6 * eps[:-1]  # true differenced process
    y = np.cumsum(w)

    def naive_css(theta, c):
        e_prev, sse = 0.0, 0.0
        for t in range(n):
            pred = c + theta * e_prev
            e_prev = w[t] - pred
            sse += e_prev**2
        return sse

    thetas = np.linspace(-0.95, 0.95, 39)
    cs = np.linspace(w.mean() - 1.0, w.mean() + 1.0, 21)
    best = min(naive_css(th, c) for th in thetas for c in cs)

    m = TSArima((0, 1, 1), const=True).fit_series(y)
    eng = naive_css(float(m.params[1]), float(m.params[0]))
    assert eng <= best * 1.05 + 1e-9, (eng, best)
    assert abs(float(m.params[1]) - 0.6) < 0.2  # recovers the true theta


def test_avg_cycle_period_analytic_ar2():
    """AR(2) with complex roots r e^{+-i theta} has pseudo-period
    2*pi/theta; the kernel must recover it from a simulated series."""
    rng = np.random.default_rng(29)
    r, period = 0.95, 12.0
    th = 2 * np.pi / period
    a1, a2 = 2 * r * np.cos(th), -(r**2)
    n = 512
    y = np.zeros(n)
    e = rng.normal(0, 0.2, n)
    for i in range(2, n):
        y[i] = a1 * y[i - 1] + a2 * y[i - 2] + e[i]
    got = _kernel("avg_cycle_period")(SeriesCtx(y, "d"))
    assert np.isfinite(got)
    assert abs(got - period) < 1.5, got


# ------------------------------------------------------- nolds-class


def test_hurst_rs_known_exponents():
    """R/S on series with analytically known Hurst exponents: white noise
    H=0.5; ARFIMA(0, 0.3, 0) fractional noise H=0.8 (independent MA(inf)
    generator above).  R/S has a well-known small-sample upward bias at
    H=0.5, hence the asymmetric band."""
    k = _kernel("exp_hurst")
    rng = np.random.default_rng(31)
    est_wn = np.mean([k(SeriesCtx(rng.standard_normal(512), "d")) for _ in range(5)])
    assert 0.45 < est_wn < 0.68, est_wn
    est_fn = np.mean([k(SeriesCtx(_arfima_d(512, 0.3, rng), "d")) for _ in range(5)])
    assert 0.68 < est_fn < 0.95, est_fn
    assert est_fn > est_wn + 0.08


def test_dfa_known_exponents():
    """DFA alpha: white noise 0.5; fractional noise d=0.3 -> 0.8; a random
    walk input -> 1.5 (the kernel integrates once more internally)."""
    k = _kernel("dfa")
    rng = np.random.default_rng(37)
    est_wn = np.mean([k(SeriesCtx(rng.standard_normal(512), "d")) for _ in range(5)])
    assert 0.4 < est_wn < 0.65, est_wn
    est_fn = np.mean([k(SeriesCtx(_arfima_d(512, 0.3, rng), "d")) for _ in range(5)])
    assert 0.65 < est_fn < 0.95, est_fn
    est_rw = np.mean([k(SeriesCtx(np.cumsum(rng.standard_normal(512)), "d"))
                      for _ in range(5)])
    assert 1.25 < est_rw < 1.75, est_rw


def test_corr_dim_continuous_1d():
    """Correlation dimension of any continuous scalar distribution at
    emb_dim=1 is 1."""
    k = _kernel("corr_dim")
    rng = np.random.default_rng(41)
    est = np.mean([k(SeriesCtx(rng.uniform(size=400), "d")) for _ in range(3)])
    assert 0.8 < est < 1.2, est


def test_lyap_chaotic_vs_regular():
    """Rosenstein largest-Lyapunov (nolds-parity defaults: emb_dim=10,
    whole-trajectory fit — known to UNDERestimate strongly chaotic maps
    because divergence saturates inside the fit window; the check is
    therefore discriminative, not absolute): chaotic logistic map at
    r=3.7 must score well above a noiseless periodic signal and white
    noise, and must be clearly positive."""
    k = _kernel("exp_max_lyap")
    x = np.empty(600)
    x[0] = 0.2
    for i in range(1, 600):
        x[i] = 3.7 * x[i - 1] * (1.0 - x[i - 1])
    lam_chaos = k(SeriesCtx(x, "d"))
    t = np.arange(600)
    lam_sine = k(SeriesCtx(np.sin(2 * np.pi * t / 24), "d"))
    rng = np.random.default_rng(73)
    lam_noise = k(SeriesCtx(rng.standard_normal(600), "d"))
    assert lam_chaos > 0.12, lam_chaos
    assert lam_sine < lam_chaos / 4, (lam_sine, lam_chaos)
    assert lam_noise < lam_chaos / 4, (lam_noise, lam_chaos)


def test_boxcox_mle_against_grid_llf():
    """opt_boxcox_coef vs a dense-grid maximization of an independently
    coded Box-Cox log-likelihood; lognormal data must give lambda near 0."""
    rng = np.random.default_rng(43)
    y = np.exp(rng.normal(0, 0.5, 400))
    got = _kernel("opt_boxcox_coef")(SeriesCtx(y, "d"))

    ctx = SeriesCtx(y, "d")
    x = ctx.ts - ctx.ts.min() + 1.0  # the kernel's documented shift
    logx = np.log(x)
    n = x.size

    def llf(lmbda):
        z = logx if abs(lmbda) < 1e-12 else (x**lmbda - 1.0) / lmbda
        v = z.var()
        return (lmbda - 1.0) * logx.sum() - n / 2.0 * np.log(v)

    grid = np.linspace(-3, 3, 2401)
    vals = np.array([llf(g) for g in grid])
    assert llf(got) >= vals.max() - 0.01, (got, grid[vals.argmax()])
    assert abs(got - grid[vals.argmax()]) < 0.05


# ------------------------------------------------------ stat-test p-values


def _pvals(name, series_list):
    k = _kernel(name)
    return np.array([k(SeriesCtx(s, "d")) for s in series_list])


@pytest.mark.parametrize("name", ["test_adf", "test_pp", "test_adf_gls"])
def test_unit_root_null_calibration(name):
    """Under the null (pure random walk) simulated p-values must be
    roughly uniform; under a stationary AR(0.2) with n=512 the tests must
    reject decisively."""
    rng = np.random.default_rng(47)
    nulls = [np.cumsum(rng.standard_normal(512)) for _ in range(24)]
    p_null = _pvals(name, nulls)
    p_null = p_null[np.isfinite(p_null)]
    assert p_null.size >= 20
    assert 0.25 < p_null.mean() < 0.75, (name, p_null.mean())
    assert (p_null < 0.05).mean() <= 0.25, (name, p_null)

    stat = []
    for _ in range(8):
        x = np.zeros(512)
        e = rng.standard_normal(512)
        for i in range(1, 512):
            x[i] = 0.2 * x[i - 1] + e[i]
        stat.append(x)
    p_alt = _pvals(name, stat)
    assert np.nanmedian(p_alt) < 0.05, (name, p_alt)


def test_za_null_calibration():
    rng = np.random.default_rng(53)
    nulls = [np.cumsum(rng.standard_normal(512)) for _ in range(16)]
    p_null = _pvals("test_za", nulls)
    p_null = p_null[np.isfinite(p_null)]
    assert 0.15 < p_null.mean() < 0.85, p_null.mean()
    # stationary series with a level break: decisive rejection
    brk = []
    for _ in range(6):
        x = rng.standard_normal(512)
        x[256:] += 3.0
        brk.append(x)
    assert np.nanmedian(_pvals("test_za", brk)) < 0.05


def test_kpss_direction():
    """KPSS is the reverse test: fail-to-reject stationary data (clamped
    p = 0.10), reject a random walk (clamped p = 0.01)."""
    rng = np.random.default_rng(59)
    p_stat = _pvals("test_kpss", [rng.standard_normal(512) for _ in range(6)])
    assert np.nanmedian(p_stat) >= 0.095, p_stat
    p_rw = _pvals("test_kpss", [np.cumsum(rng.standard_normal(512)) for _ in range(6)])
    assert np.nanmedian(p_rw) <= 0.011, p_rw


def test_lilliefors_calibration():
    rng = np.random.default_rng(61)
    p_norm = _pvals("test_lilliefors",
                    [rng.normal(2.0, 3.0, 512) for _ in range(16)])
    p_norm = p_norm[np.isfinite(p_norm)]
    assert 0.25 < p_norm.mean() < 0.75, p_norm.mean()
    p_exp = _pvals("test_lilliefors", [rng.exponential(1.0, 512) for _ in range(6)])
    assert np.nanmedian(p_exp) < 0.02, p_exp


def test_arch_lm_calibration():
    """ARCH-LM uses an exact chi-square.  The kernel's input is the
    decomposition residual (reference semantics — note the reference's
    own period = argmax|acf|+1 picks ~n/2 on aperiodic noise, so STL
    residuals of noise are NOT homoskedastic; that is faithful, not a
    bug).  The statistic itself is validated here on controlled
    residuals via a minimal ctx stub: uniform p-values under iid noise,
    collapse under volatility bursts."""
    from ts_pymfe_ray.functions.kernels_stat_tests import _arch_lm

    class _Stub:
        def __init__(self, r):
            self.ts_residuals = r

    rng = np.random.default_rng(67)
    p_null = np.array([_arch_lm(_Stub(rng.standard_normal(512)))
                       for _ in range(24)])
    p_null = p_null[np.isfinite(p_null)]
    assert 0.25 < p_null.mean() < 0.75, p_null.mean()
    p_burst = []
    for _ in range(6):
        vol = np.ones(512)
        vol[100:250] = 6.0
        p_burst.append(_arch_lm(_Stub(rng.standard_normal(512) * vol)))
    assert np.nanmedian(p_burst) < 0.01


# ------------------------------------------------------ model-shape checks


def test_gp_r_squared_signal_vs_noise():
    from ts_pymfe_ray.functions.gp import gp_r_squared

    t = np.arange(400)
    smooth = np.sin(2 * np.pi * t / 100.0)
    smooth = (smooth - smooth.mean()) / smooth.std()
    rng = np.random.default_rng(71)
    noise = rng.standard_normal(400)
    r2_s = gp_r_squared(smooth)
    r2_n = gp_r_squared((noise - noise.mean()) / noise.std())
    assert r2_s > 0.9, r2_s
    # a noise-free GP interpolates even white noise well (the
    # reference's sklearn default kernel does too) - assert ordering
    assert r2_n < r2_s - 0.1, (r2_n, r2_s)


def test_orthoreg_linearity_curvature_signs():
    t = np.arange(200, dtype=float)
    lin = 2.0 * t + 1.0
    ctx = SeriesCtx(lin, "d")
    lin_coef = _kernel("linearity")(ctx)
    curv_coef = _kernel("curvature")(ctx)
    assert abs(lin_coef) > 100 * abs(curv_coef), (lin_coef, curv_coef)
    par = (t - 100.0) ** 2
    curv_par = _kernel("curvature")(SeriesCtx(par, "d"))
    lin_par = _kernel("linearity")(SeriesCtx(par, "d"))
    assert abs(curv_par) > abs(lin_par), (curv_par, lin_par)
    assert np.sign(curv_par) == np.sign(
        _kernel("curvature")(SeriesCtx(par + 5.0, "d")))


# ------------------------------------------------- landmarking CV harness


def test_landmarking_cv_harness_hand_computed():
    """The forward-chaining CV harness (fold boundaries, train-fit min-max
    scaling, RMSE) re-derived by hand for the two fully-deterministic
    landmarking models: naive (predict last train value) and model_mean
    (ARIMA(0,0,0)+c == train mean).  Exact equality — a bias anywhere in
    the CV plumbing would shift every landmarking feature."""
    rng = np.random.default_rng(83)
    y = np.cumsum(rng.normal(size=300))
    ctx = SeriesCtx(y, "d")

    def scale(train, x):
        lo, hi = train.min(), train.max()
        rng_ = hi - lo if hi > lo else 1.0
        return (x - lo) / rng_

    n = y.size
    ts = n // 6
    exp_naive, exp_mean = [], []
    for i in range(5):
        test_end = n - (5 - i - 1) * ts
        test_start = test_end - ts
        tr, te = y[:test_start], y[test_start:test_end]
        y_tr, y_te = scale(tr, tr), scale(tr, te)
        exp_naive.append(np.sqrt(np.mean((y_tr[-1] - y_te) ** 2)))
        exp_mean.append(np.sqrt(np.mean((y_tr.mean() - y_te) ** 2)))

    got_naive = _kernel("model_naive")(ctx)
    got_mean = _kernel("model_mean")(ctx)
    assert np.allclose(got_naive, exp_naive, rtol=0, atol=1e-12), (got_naive, exp_naive)
    assert np.allclose(got_mean, exp_mean, rtol=0, atol=1e-12), (got_mean, exp_mean)


def test_pacf_ols_against_fresh_regression():
    """pacf_ols (the reference's exact ols-adjusted method) vs a fresh
    per-lag regression built here with numpy.polyfit-free code sharing
    nothing with stats.py; plus AR(2) theory: pacf[2] recovers the second
    AR coefficient and higher lags vanish."""
    from ts_pymfe_ray.functions.stats import pacf_ols

    rng = np.random.default_rng(89)
    n = 400
    y = np.zeros(n)
    e = rng.normal(size=n)
    for i in range(2, n):
        y[i] = 0.5 * y[i - 1] - 0.3 * y[i - 2] + e[i]

    got = pacf_ols(y, nlags=6)
    for k in range(1, 7):
        rows = n - k
        X = np.ones((rows, k + 1))
        for j in range(1, k + 1):
            X[:, j] = y[k - j : n - j]
        # normal equations, solved independently
        beta = np.linalg.solve(X.T @ X, X.T @ y[k:])
        exp = beta[k] * n / (n - k)
        assert abs(got[k - 1] - exp) < 1e-9, (k, got[k - 1], exp)
    assert abs(got[1] + 0.3) < 0.08      # phi_22 == a2 for AR(2)
    assert np.all(np.abs(got[2:]) < 0.12)  # cuts off beyond p


def test_pacf_ols_near_collinear_matches_lstsq():
    """Adversarial conditioning case: an almost-pure linear trend makes the
    lag windows strongly collinear (Gram matrix near-singular but still
    numerically invertible).  The |beta_k| sanity bound must route these
    to the rcond-regularized lstsq path, so pacf_ols stays within tolerance
    of a fresh per-lag lstsq fit instead of returning a finite-but-wrong
    normal-equations solve."""
    from ts_pymfe_ray.functions.stats import pacf_ols

    rng = np.random.default_rng(7)
    n = 300
    t = np.arange(n, dtype=np.float64)
    for noise in (1e-9, 1e-7):
        y = t + noise * rng.normal(size=n)
        got = pacf_ols(y, nlags=6)
        assert np.all(np.isfinite(got)), got
        # fresh lstsq twin on the standardized series (coefficient is
        # scale/shift-invariant; standardizing matches the impl's path)
        x = (y - y.mean()) / y.std()
        for k in range(1, 7):
            X = np.ones((n - k, k + 1))
            for j in range(1, k + 1):
                X[:, j] = x[k - j : n - j]
            beta, *_ = np.linalg.lstsq(X, x[k:], rcond=None)
            exp = beta[k] * n / (n - k)
            assert abs(got[k - 1] - exp) < 1e-6, (noise, k, got[k - 1], exp)
