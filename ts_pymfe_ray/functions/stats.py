"""Core per-series statistical kernels (pure numpy, no scipy/statsmodels).

Semantics mirror the reference (cited file:line); since scipy/statsmodels
are not available in this environment, the math is reimplemented from the
published definitions.
"""

from __future__ import annotations

import numpy as np


def standardize_ts(ts: np.ndarray) -> np.ndarray:
    """Z-score with population std — sklearn StandardScaler semantics
    (reference: /root/reference/tspymfe/_utils.py:70-83)."""
    ts = np.asarray(ts, dtype=np.float64)
    sd = ts.std()  # ddof=0, matching StandardScaler
    if sd == 0 or not np.isfinite(sd):
        return np.zeros_like(ts)
    return (ts - ts.mean()) / sd


def standardize_stack(Y: np.ndarray) -> np.ndarray:
    """Row-wise :func:`standardize_ts` for an (R, n) stack — bitwise
    identical per row (axis-1 reductions and scalar broadcasts are
    per-row; parity gate in tests/test_kernels.py)."""
    Y = np.asarray(Y, dtype=np.float64)
    mu = Y.mean(axis=1, keepdims=True)
    sd = Y.std(axis=1, keepdims=True)
    with np.errstate(all="ignore"):
        out = (Y - mu) / sd
    bad = (sd[:, 0] == 0) | ~np.isfinite(sd[:, 0])
    if bad.any():
        out[bad] = 0.0
    return out


def acf(ts: np.ndarray, nlags: int | None = None, adjusted: bool = True) -> np.ndarray:
    """Autocorrelation function via FFT, statsmodels-compatible.

    statsmodels.tsa.stattools.acf(x, nlags, adjusted=True, fft=True):
    acov[k] = sum((x_i - mu)(x_{i+k} - mu)) / (n - k)  [adjusted]
              or / n [not adjusted]; acf = acov / acov[0].
    Returns lags 1..nlags (lag 0 dropped — reference drops it,
    /root/reference/tspymfe/autocorr.py:188-191).
    """
    x = np.asarray(ts, dtype=np.float64)
    n = x.size
    if nlags is None:
        nlags = n // 2
    nlags = int(min(nlags, n - 1))
    if n < 2 or nlags < 1:
        return np.empty(0)
    xd = x - x.mean()
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    fx = np.fft.rfft(xd, nfft)
    acov_raw = np.fft.irfft(fx * np.conj(fx), nfft)[: nlags + 1]
    if adjusted:
        acov = acov_raw / (n - np.arange(nlags + 1))
    else:
        acov = acov_raw / n
    if acov[0] == 0:
        return np.full(nlags, np.nan)
    return (acov / acov[0])[1:]


def acf_stack(X: np.ndarray, nlags: int, adjusted: bool = True) -> np.ndarray:
    """:func:`acf` applied to every ROW of the (R, n) stack with one
    batched FFT pass.  Matches the per-row path up to float reassociation
    (pocketfft's stacked transforms are not bitwise-stable vs single-row
    calls — use only where values are tolerance-compared, never on the
    bitwise preseed/parity paths).  Returns (R, nlags), lag 0 dropped;
    zero-variance rows are all-NaN like the scalar flavor."""
    X = np.asarray(X, dtype=np.float64)
    r, n = X.shape
    nlags = int(min(nlags, n - 1))
    if n < 2 or nlags < 1:
        return np.empty((r, 0))
    xd = X - X.mean(axis=1, keepdims=True)
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    fx = np.fft.rfft(xd, nfft, axis=1)
    acov = np.fft.irfft(fx * np.conj(fx), nfft, axis=1)[:, : nlags + 1]
    if adjusted:
        acov = acov / (n - np.arange(nlags + 1))
    else:
        acov = acov / n
    with np.errstate(all="ignore"):
        out = acov / acov[:, :1]
    out[acov[:, 0] == 0] = np.nan
    return out[:, 1:]


def acf_full(ts: np.ndarray, nlags: int | None = None, adjusted: bool = True) -> np.ndarray:
    """ACF including lag 0 (statsmodels layout)."""
    a = acf(ts, nlags=nlags, adjusted=adjusted)
    return np.concatenate([[1.0], a])


def pacf_ld(ts: np.ndarray, nlags: int | None = None) -> np.ndarray:
    """Partial autocorrelation via Levinson-Durbin on the adjusted ACF.

    NOTE: the registry's pacf kernels use :func:`pacf_ols` (the reference's
    exact "ols-adjusted" method, autocorr.py:194-250) — there is NO
    semantic divergence on the feature surface.  This O(k^2) Yule-Walker
    recursion is kept as the fast utility flavor (tests, sketch-derived
    paths) where the asymptotically-equivalent estimate suffices.
    Returns lags 1..nlags.
    """
    x = np.asarray(ts, dtype=np.float64)
    n = x.size
    if nlags is None:
        nlags = 1 + n // 10
    nlags = int(min(nlags, max(0, n - 1)))
    if nlags < 1:
        return np.empty(0)
    r = np.concatenate([[1.0], acf(x, nlags=nlags, adjusted=True)])
    pacf = np.empty(nlags)
    phi = np.zeros((nlags + 1, nlags + 1))
    phi[1, 1] = r[1]
    pacf[0] = r[1]
    for k in range(2, nlags + 1):
        num = r[k] - phi[k - 1, 1:k] @ r[1:k][::-1]
        den = 1.0 - phi[k - 1, 1:k] @ r[1:k]
        phi[k, k] = num / den if den != 0 else np.nan
        phi[k, 1:k] = phi[k - 1, 1:k] - phi[k, k] * phi[k - 1, 1:k][::-1]
        pacf[k - 1] = phi[k, k]
    return pacf


def skewness(values: np.ndarray, method: int = 3, bias: bool = True) -> float:
    """e1071-compatible skewness (reference _summary.py:149-209)."""
    x = np.asarray(values, dtype=np.float64)
    n = x.size
    if n == 0:
        return np.nan
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m3 = ((x - mu) ** 3).mean()
    with np.errstate(all="ignore"):
        g1 = m3 / m2**1.5 if m2 > 0 else 0.0
        sk = g1
        if not bias and n > 2 and m2 > 0:
            sk = np.sqrt(n * (n - 1.0)) / (n - 2.0) * g1
        if method == 2 and n != 2:
            sk *= (n * (n - 1.0)) ** 0.5 / (n - 2.0)
        elif method == 3:
            sk *= ((n - 1.0) / n) ** 1.5
    return float(sk)


def kurtosis(values: np.ndarray, method: int = 3, bias: bool = True) -> float:
    """e1071-compatible kurtosis (reference _summary.py:212-273)."""
    x = np.asarray(values, dtype=np.float64)
    n = x.size
    if n == 0:
        return np.nan
    mu = x.mean()
    m2 = ((x - mu) ** 2).mean()
    m4 = ((x - mu) ** 4).mean()
    with np.errstate(all="ignore"):
        g2 = m4 / m2**2 - 3.0 if m2 > 0 else -3.0
        kt = g2
        if not bias and n > 3 and m2 > 0:
            kt = ((n - 1.0) / ((n - 2.0) * (n - 3.0))) * ((n + 1.0) * g2 + 6.0)
        if method == 2 and n > 3:
            kt = (n + 1.0) * kt + 6.0
            kt *= (n - 1.0) / ((n - 2.0) * (n - 3.0))
        elif method == 3:
            kt = (kt + 3.0) * (1.0 - 1.0 / n) ** 2 - 3.0
    return float(kt)


def trim_mean(values: np.ndarray, proportiontocut: float = 0.02) -> float:
    """scipy.stats.trim_mean semantics (reference ft_t_mean,
    global_stats.py:848): sort, drop floor(p*n) from each end, mean."""
    x = np.sort(np.asarray(values, dtype=np.float64))
    n = x.size
    k = int(n * proportiontocut)
    if n - 2 * k <= 0:
        return np.nan
    return float(x[k : n - k].mean())


def diff(ts: np.ndarray, order: int = 1) -> np.ndarray:
    return np.diff(np.asarray(ts, dtype=np.float64), n=order)


def seasonal_diff(ts: np.ndarray, period: int) -> np.ndarray:
    """ts[p:] - ts[:-p] (reference ft_*_sdiff, global_stats.py:253-279)."""
    x = np.asarray(ts, dtype=np.float64)
    if period >= x.size:
        return np.empty(0)
    return x[period:] - x[:-period]


def pacf_ols(ts: np.ndarray, nlags: int | None = None, adjusted: bool = True) -> np.ndarray:
    """Partial autocorrelation via per-lag OLS — statsmodels
    pacf(method="ols-adjusted") semantics (the reference default,
    autocorr.py:194-250): for each lag k regress x_t on
    [1, x_{t-1}, ..., x_{t-k}] over t = k..n-1 and take the k-th lag
    coefficient, scaled by n/(n-k) when adjusted.  Returns lags 1..nlags."""
    x0 = np.asarray(ts, dtype=np.float64)
    n = x0.size
    if nlags is None:
        nlags = 1 + n // 10
    nlags = int(min(nlags, max(0, n // 2 - 1)))
    if nlags < 1 or n < 4:
        return np.empty(0)
    # All nlags regressions from ONE Gram pass: the lag-k coefficient is
    # invariant to centering/scaling x (the intercept absorbs the shift,
    # the k-th coefficient is scale-free), and on the standardized series
    # the normal equations match the per-lag lstsq answer to ~1e-9 at a
    # ~30x flop reduction (one (n-K)x(K+1) GEMM + K small solves instead
    # of K SVD factorizations of growing embed matrices).
    x = x0 - x0.mean()
    sd = x.std()
    if sd > 0:
        x = x / sd
    K = nlags
    st = x.strides[0]
    # Z[t, j] = x[K + t - j] over the common window t=K..n-1, j=0..K
    Z = np.lib.stride_tricks.as_strided(x[K:], shape=(n - K, K + 1),
                                        strides=(st, -st))
    G = Z.T @ Z
    sums = Z.sum(axis=0)
    out = np.empty(K)
    vv = np.zeros(K + 1)
    for k in range(K, 0, -1):
        A = np.empty((k + 1, k + 1))
        A[0, 0] = n - k
        A[0, 1:] = sums[1 : k + 1]
        A[1:, 0] = sums[1 : k + 1]
        A[1:, 1:] = G[1 : k + 1, 1 : k + 1]
        b = np.empty(k + 1)
        b[0] = sums[0]
        b[1:] = G[0, 1 : k + 1]
        # Conditioning gate before trusting the normal-equations solve: a
        # near-singular-but-invertible Gram matrix (near-constant or
        # strongly collinear lag windows, e.g. an almost-pure trend)
        # returns a finite-but-wrong coefficient without raising.  The
        # Cholesky diagonal ratio squared is a cheap (O(k^3/6)) spectral
        # condition proxy for SPD matrices; past ~1e8 the solve's accuracy
        # can no longer honor the ~1e-9 lstsq-parity contract, so route to
        # the rcond-regularized lstsq the reference semantics use.  A false
        # trigger only costs the fallback's flops — both paths agree when
        # the system is well-posed.
        beta_k = np.nan
        try:
            dl = np.diagonal(np.linalg.cholesky(A))
            if dl.min() > 0 and (dl.max() / dl.min()) ** 2 < 1e8:
                beta_k = float(np.linalg.solve(A, b)[k])
        except np.linalg.LinAlgError:
            beta_k = np.nan
        if not np.isfinite(beta_k):
            # degenerate window: fall back to the rank-aware lstsq fit
            m = n - k
            X = np.empty((m, k + 1))
            X[:, 0] = 1.0
            for j in range(1, k + 1):
                X[:, j] = x[k - j : n - j]
            beta, *_ = np.linalg.lstsq(X, x[k:], rcond=None)
            beta_k = float(beta[k])
        out[k - 1] = beta_k * (n / (n - k)) if adjusted else beta_k
        if k > 1:
            # widen the window one row (t = k-1): rank-1 Gram update
            v = x[k - 1 :: -1][: K + 1]
            vv[: v.size] = v
            vv[v.size :] = 0.0
            G += np.outer(vv, vv)
            sums += vv
    return out


_EDGE_ARANGE: dict[int, np.ndarray] = {}


def hist_edges(x: np.ndarray, nbins: int) -> np.ndarray:
    """== np.histogram(x, nbins)[1] for finite x (uniform bins), without
    paying for the counting pass.

    Replicates np.linspace's arithmetic exactly (arange * step + start,
    then pin the endpoint; the step==0 denormal branch divides first) with
    a cached arange — linspace's ~25us of per-call machinery matters at
    hundreds of histogram kernels per batch."""
    lo = float(np.min(x))
    hi = float(np.max(x))
    if lo == hi:
        lo -= 0.5
        hi += 0.5
    ar = _EDGE_ARANGE.get(nbins)
    if ar is None:
        ar = _EDGE_ARANGE[nbins] = np.arange(nbins + 1, dtype=np.float64)
    delta = hi - lo
    step = delta / nbins
    if step == 0:
        e = ar * delta
        e /= nbins
    else:
        e = ar * step
    e += lo
    e[-1] = hi
    return e


def quantiles_part(x: np.ndarray, qs: tuple[float, ...]) -> tuple[float, ...]:
    """== np.quantile(x, qs) bitwise for 1-D x (default 'linear' method),
    via one np.partition on the needed order stats instead of
    np.quantile's ~60us dispatch machinery.  Mirrors numpy's _lerp
    exactly (a + (b-a)*t, and b - (b-a)*(1-t) when t >= 0.5) and its
    NaN propagation (any NaN -> fall back to np.quantile)."""
    n = x.size
    vs = [q * (n - 1) for q in qs]
    kth = sorted({min(int(v) + d, n - 1) for v in vs for d in (0, 1)})
    if np.isnan(x).any():  # numpy propagates NaN; partition would hide it
        r = np.atleast_1d(np.quantile(x, qs))
        return tuple(float(t) for t in r)
    p = np.partition(x, kth)
    out = []
    for v in vs:
        i0 = int(v)
        i1 = min(i0 + 1, n - 1)
        t = v - i0
        a, b = p[i0], p[i1]
        d = b - a
        out.append(b - d * (1 - t) if t >= 0.5 else a + d * t)
    return tuple(out)


def quantile2(x: np.ndarray, q_lo: float, q_hi: float) -> tuple[float, float]:
    """== np.quantile(x, (q_lo, q_hi)) bitwise — see quantiles_part."""
    return quantiles_part(x, (q_lo, q_hi))


def median_part(x: np.ndarray) -> float:
    """== np.median(x) bitwise for 1-D x: partition the middle order
    stat(s); even n averages the two middles exactly as np.mean of the
    two-element slice does ((a+b)/2).  NaN input falls back to numpy for
    its propagation semantics."""
    n = x.size
    if n == 0 or np.isnan(x).any():
        return float(np.median(x))
    h = n // 2
    if n % 2:
        return float(np.partition(x, h)[h])
    p = np.partition(x, (h - 1, h))
    return float((p[h - 1] + p[h]) / 2.0)


def hist_counts(x: np.ndarray, nbins: int) -> tuple[np.ndarray, np.ndarray]:
    """(counts, edges) == np.histogram(x, nbins) bitwise, via the same
    uniform-bin index arithmetic numpy uses (scaled index + edge
    correction) but without np.histogram's per-call machinery — the
    cheap-pack entropy kernels call this hundreds of times per batch."""
    edges = hist_edges(x, nbins)
    first, last = edges[0], edges[-1]
    norm = nbins / (last - first)
    idx = ((x - first) * norm).astype(np.intp)
    idx[idx == nbins] -= 1
    dec = x < edges[idx]
    idx[dec] -= 1
    inc = (x >= edges[idx + 1]) & (idx != nbins - 1)
    idx[inc] += 1
    return np.bincount(idx, minlength=nbins), edges


def hist_density(x: np.ndarray, nbins: int) -> np.ndarray:
    """== np.histogram(x, nbins, density=True)[0] bitwise."""
    counts, edges = hist_counts(x, nbins)
    db = np.diff(edges)
    return counts / db / counts.sum()
