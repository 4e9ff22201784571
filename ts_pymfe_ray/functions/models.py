"""Forecasting models for the landmarking and model-based groups.

Custom models mirror /root/reference/tspymfe/_models.py (cited per class);
the statsmodels-backed ones (SES / Holt / Holt-Winters / ARIMA) are
reimplemented as their textbook recursions with SSE-minimizing Nelder-Mead
parameter search — documented approximate parity (optimizer-backed).

All models expose fit(X, y) / predict(X) like the reference's BaseModel.
"""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.functions.optimize import curve_fit_sse, nelder_mead


class TSNaive:
    """_models.py:21-62."""

    def fit(self, X, y):
        self.last_obs = y[-1]
        return self

    def predict(self, X):
        return np.full(np.asarray(X).ravel().shape, self.last_obs)


class TSNaiveDrift:
    """_models.py:65-124."""

    def fit(self, X, y):
        X = np.asarray(X).ravel()
        self.last_obs, self.last_ind = y[-1], X[-1]
        self.slope = (y[-1] - y[0]) / (X[-1] - X[0]) if y.size > 1 else 0.0
        return self

    def predict(self, X):
        d = np.asarray(X).ravel() - self.last_ind
        return self.last_obs + d * self.slope


class TSNaiveSeasonal:
    """_models.py:127-186."""

    def __init__(self, ts_period: int):
        self.ts_period = ts_period

    def fit(self, X, y):
        X = np.asarray(X).ravel()
        if X.size < self.ts_period:
            raise ValueError("series smaller than period")
        self.y = np.asarray(y)
        self.interval = X[1] - X[0]
        return self

    def predict(self, X):
        X = (np.asarray(X).ravel() / self.interval).astype(int)
        shift = (X - self.y.size) // self.ts_period
        inds = X - self.ts_period * (1 + shift)
        if np.any(inds < 0):
            raise ValueError("invalid prediction timestamps")
        return self.y[inds]


class TSLocalStat:
    """_models.py:189-264 (last 25% of train)."""

    def __init__(self, stat_func, train_prop: float = 0.25):
        self.stat_func = stat_func
        self.train_prop = train_prop

    def fit(self, X, y):
        last = int(np.ceil(y.size * self.train_prop))
        self.val = self.stat_func(y[-last:])
        return self

    def predict(self, X):
        return np.full(np.asarray(X).ravel().shape, self.val)


class TSLinear:
    """OLS on timestamps (landmarking.py:815, sklearn LinearRegression)."""

    def fit(self, X, y):
        X = np.asarray(X).ravel()
        A = np.column_stack([X, np.ones(X.size)])
        self.coef, *_ = np.linalg.lstsq(A, y, rcond=None)
        return self

    def predict(self, X):
        X = np.asarray(X).ravel()
        return self.coef[0] * X + self.coef[1]


class TSSine:
    """A*sin(w t + p) + c, FFT initial guess (_models.py:267-345)."""

    def fit(self, X, y):
        X = np.asarray(X).ravel()
        freqs = np.fft.fftfreq(y.size, X[1] - X[0])
        fyy = np.abs(np.fft.rfft(y))[1:]
        w_guess = 2 * np.pi * np.abs(freqs[1 + int(np.argmax(fyy))])
        guess = np.array([np.std(y) * np.sqrt(2), w_guess, 0.0, np.mean(y)])
        fn = lambda t, A, w, p, c: A * np.sin(w * t + p) + c
        # out-buffer objective: identical op order to fn (same SSE bits,
        # same Nelder-Mead trajectory), ~5 fewer allocations per eval at
        # ~650 evaluations per fold
        u = np.empty_like(X, dtype=np.float64)

        def sse(q):
            A, w, p, c = q
            with np.errstate(all="ignore"):
                np.multiply(w, X, out=u)
                np.add(u, p, out=u)
                np.sin(u, out=u)
                np.multiply(A, u, out=u)
                np.add(u, c, out=u)
                np.subtract(u, y, out=u)
            return float(u @ u)

        self.p = nelder_mead(sse, guess)
        self._fn = fn
        return self

    def predict(self, X):
        return self._fn(np.asarray(X).ravel(), *self.p)


class TSExp:
    """a*exp(b t) + c (_models.py:348-391)."""

    def fit(self, X, y):
        X = np.asarray(X).ravel()
        b0 = y[-1] / y[-2] if y.size > 1 and y[-2] != 0 else 1.0
        guess = np.array([0.1, b0, 0.0])
        fn = lambda t, a, b, c: a * np.exp(np.clip(b * t, -700, 700)) + c
        u = np.empty_like(X, dtype=np.float64)

        def sse(q):
            a, b, c = q
            with np.errstate(all="ignore"):
                np.multiply(b, X, out=u)
                np.clip(u, -700, 700, out=u)
                np.exp(u, out=u)
                np.multiply(a, u, out=u)
                np.add(u, c, out=u)
                np.subtract(u, y, out=u)
            return float(u @ u)

        self.p = nelder_mead(sse, guess)
        self._fn = fn
        return self

    def predict(self, X):
        return self._fn(np.asarray(X).ravel(), *self.p)


class TSGaussianProcess:
    """sklearn GP stand-in (landmarking.py:737) — numpy RBF GP.  Training
    folds are tail-capped at 128 points (O(n^3) fit; documented cost
    bound, same spirit as the reference's lm_sample_frac knob)."""

    CAP = 128

    def fit(self, X, y):
        from ts_pymfe_ray.functions.gp import GPModel

        X = np.asarray(X).ravel()[-self.CAP :]
        y = np.asarray(y).ravel()[-self.CAP :]
        self.m = GPModel(X, y)
        return self

    def predict(self, X):
        return self.m.predict(np.asarray(X).ravel())


# ------------------------------------------------ exponential smoothing family


def ses_filter(y: np.ndarray, alpha: float, l0: float) -> np.ndarray:
    """One-step-ahead fitted values of simple exponential smoothing.

    List-based scalar loop (the objective runs ~120x per fit); identical
    float ops in identical order as an ndarray-indexed loop."""
    yl = y.tolist()
    fitted = [0.0] * len(yl)
    l = l0
    one_m = 1 - alpha
    for i, yi in enumerate(yl):
        fitted[i] = l
        l = alpha * yi + one_m * l
    return np.array(fitted)


class TSSES:
    """SimpleExpSmoothing (landmarking.py:1913): SSE-optimal alpha, l0."""

    CAP = 256  # sequential-filter fits are tail-capped (documented)

    def fit_series(self, y: np.ndarray):
        y = y[-self.CAP :]

        def sse(p):
            a = 1.0 / (1.0 + np.exp(-p[0]))
            f = ses_filter(y, a, p[1])
            r = y - f
            return float(r @ r)

        p = nelder_mead(sse, np.array([0.0, y[0]]), max_iter=120)
        self.alpha = 1.0 / (1.0 + np.exp(-p[0]))
        self.l0 = p[1]
        l = self.l0
        for v in y:
            l = self.alpha * v + (1 - self.alpha) * l
        self.level = l
        return self

    def forecast(self, h: int) -> np.ndarray:
        return np.full(h, self.level)


def holt_filter(y, alpha, beta, l0, b0, damped=False, phi=1.0):
    # scalar-register loop; (l + phi*b) is reused for the level update —
    # it is the same expression the original evaluated twice, so values
    # are bitwise-identical while halving the per-step work
    yl = np.asarray(y).tolist()
    fitted = [0.0] * len(yl)
    l, b = l0, b0
    one_ma = 1 - alpha
    one_mb = 1 - beta
    for i, yi in enumerate(yl):
        f = l + phi * b
        fitted[i] = f
        l_new = alpha * yi + one_ma * f
        b = beta * (l_new - l) + one_mb * phi * b
        l = l_new
    return np.array(fitted), l, b


class TSHolt:
    """Holt double ES, additive trend (model_based.py:295-344)."""

    def __init__(self, damped: bool = False):
        self.damped = damped

    CAP = 256

    def fit_series(self, y: np.ndarray):
        y = y[-self.CAP :]

        def unpack(p):
            a = 1.0 / (1.0 + np.exp(-p[0]))
            b = 1.0 / (1.0 + np.exp(-p[1]))
            phi = 0.8 + 0.18 / (1.0 + np.exp(-p[4])) if self.damped else 1.0
            return a, b, p[2], p[3], phi

        def sse(p):
            a, b, l0, b0, phi = unpack(p)
            f, _, _ = holt_filter(y, a, b, l0, b0, phi=phi)
            r = y - f
            return float(r @ r)

        b0_init = y[1] - y[0] if y.size > 1 else 0.0
        x0 = [0.0, -1.0, y[0], b0_init] + ([0.0] if self.damped else [])
        p = nelder_mead(sse, np.array(x0), max_iter=150)
        if not self.damped:
            p = np.concatenate([p, [0.0]])  # phi slot unused
        self.alpha, self.beta, l0, b0, self.phi = unpack(p)
        _, self.level, self.trend = holt_filter(y, self.alpha, self.beta, l0, b0, phi=self.phi)
        return self

    def forecast(self, h: int) -> np.ndarray:
        steps = np.arange(1, h + 1)
        if self.phi == 1.0:
            return self.level + steps * self.trend
        phis = np.cumsum(self.phi ** steps)
        return self.level + phis * self.trend


class TSHoltWinters:
    """Holt-Winters triple ES (model_based.py:347-413; landmarking
    hwes_ada/adm damped variants, landmarking.py:1984-2175).
    trend: additive (damped optional); seasonal: 'add' or 'mul'."""

    def __init__(self, period: int, seasonal: str = "add", damped: bool = False):
        self.period = max(2, int(period))
        self.seasonal = seasonal
        self.damped = damped

    def _filter(self, y, a, b, g, phi, l0, b0, s0):
        # list-based scalar loop, seasonal branch hoisted; float ops in
        # the same order as the original ndarray-indexed version
        p = self.period
        l, bb = l0, b0
        s = list(s0)
        yl = np.asarray(y).tolist()
        fitted = [0.0] * len(yl)
        one_ma = 1 - a
        one_mg = 1 - g
        one_mb = 1 - b
        add = self.seasonal == "add"
        for i, yi in enumerate(yl):
            k = i % p
            si = s[k]
            lev = l + phi * bb
            if add:
                fitted[i] = lev + si
                l_new = a * (yi - si) + one_ma * lev
                s[k] = g * (yi - l_new) + one_mg * si
            else:
                fitted[i] = lev * si
                denom = si if si != 0 else 1e-12
                l_new = a * (yi / denom) + one_ma * lev
                s[k] = g * (yi / (l_new if l_new != 0 else 1e-12)) + one_mg * si
            bb = b * (l_new - l) + one_mb * phi * bb
            l = l_new
        return np.array(fitted), l, bb, s

    CAP = 384

    def fit_series(self, y: np.ndarray):
        y = y[-self.CAP :]
        p = self.period
        if y.size < 2 * p:
            raise ValueError("series too short for seasonal model")
        # heuristic inits (classical decomposition style)
        nseas = y.size // p
        mat = y[: nseas * p].reshape(nseas, p)
        seas_means = mat.mean(axis=0)
        overall = y[: nseas * p].mean()
        if self.seasonal == "add":
            s0 = seas_means - overall
        else:
            s0 = seas_means / (overall if overall != 0 else 1e-12)
        l0 = overall
        b0 = (mat[-1].mean() - mat[0].mean()) / max(1, (nseas - 1) * p)

        def unpack(q):
            a = 1.0 / (1.0 + np.exp(-q[0]))
            b = 1.0 / (1.0 + np.exp(-q[1]))
            g = 1.0 / (1.0 + np.exp(-q[2]))
            phi = 0.8 + 0.18 / (1.0 + np.exp(-q[3])) if self.damped else 1.0
            return a, b, g, phi

        def sse(q):
            a, b, g, phi = unpack(q)
            f, *_ = self._filter(y, a, b, g, phi, l0, b0, s0)
            r = y - f
            return float(r @ r)

        q = nelder_mead(sse, np.array([0.0, -2.0, -2.0, 0.0]), max_iter=120)
        self.alpha, self.beta, self.gamma, self.phi = unpack(q)
        _, self.level, self.trend, self.seas = self._filter(
            y, self.alpha, self.beta, self.gamma, self.phi, l0, b0, s0
        )
        self.n_fit = y.size
        return self

    def forecast(self, h: int) -> np.ndarray:
        p = self.period
        steps = np.arange(1, h + 1)
        phis = steps if self.phi == 1.0 else np.cumsum(self.phi ** steps)
        base = self.level + phis * self.trend
        seas = np.array([self.seas[(self.n_fit + k) % p] for k in range(h)])
        return base + seas if self.seasonal == "add" else base * seas


class TSArima:
    """ARIMA(p,d,q) (+c optional) via conditional sum of squares
    (landmarking.py:1316-1891 fixed-order variants).  Small orders only."""

    def __init__(self, order: tuple[int, int, int], const: bool = True):
        self.p, self.d, self.q = order
        self.const = const

    def _css(self, w: np.ndarray, params) -> np.ndarray:
        p, q = self.p, self.q
        c = float(params[0]) if self.const else 0.0
        off = 1 if self.const else 0
        n = w.size
        # scalar-register unrolls of the order combinations the landmark
        # registry actually optimizes ((0,1) and (1,2) after differencing).
        # Operation ORDER matches the generic loop exactly (same +=
        # sequence, 0.0 terms included), so residuals — and therefore every
        # Nelder-Mead trajectory — are bitwise-identical; the win is
        # dropping per-step numpy indexing and the inner Python loops,
        # which dominate the objective at ~600 evaluations per fit.
        wl = w.tolist()
        if p == 0 and q == 1:
            m1 = float(params[off])
            el = [0.0] * n
            e1 = 0.0
            for t in range(n):
                e1 = wl[t] - (c + m1 * e1)
                el[t] = e1
            return np.array(el)
        if p == 1 and q == 2:
            a1 = float(params[off])
            m1 = float(params[off + 1])
            m2 = float(params[off + 2])
            el = [0.0] * n
            wprev = e1 = e2 = 0.0
            for t in range(n):
                cur = wl[t] - (((c + a1 * wprev) + m1 * e1) + m2 * e2)
                el[t] = cur
                e2 = e1
                e1 = cur
                wprev = wl[t]
            return np.array(el)
        ar = params[off : off + p]
        ma = params[off + p : off + p + q]
        e = np.zeros(n)
        for t in range(n):
            pred = c
            for i in range(p):
                pred += ar[i] * (w[t - 1 - i] if t - 1 - i >= 0 else 0.0)
            for j in range(q):
                pred += ma[j] * (e[t - 1 - j] if t - 1 - j >= 0 else 0.0)
            e[t] = w[t] - pred
        return e

    def fit_series(self, y: np.ndarray):
        w = np.diff(y, n=self.d) if self.d else np.asarray(y, dtype=float)
        nparams = (1 if self.const else 0) + self.p + self.q
        x0 = np.zeros(nparams)
        if self.const:
            x0[0] = w.mean()

        if self.q == 0 and self.p > 0 and w.size > self.p + 2:
            # pure AR: conditional SSE minimum is exact OLS — no optimizer
            n = w.size - self.p
            cols = ([np.ones(n)] if self.const else []) + [
                w[self.p - 1 - i : w.size - 1 - i] for i in range(self.p)
            ]
            X = np.column_stack(cols)
            beta, *_ = np.linalg.lstsq(X, w[self.p :], rcond=None)
            self.params = beta
        elif self.p == 0 and self.q == 0:
            self.params = x0
        else:

            def sse(params):
                e = self._css(w, params)
                return float(e @ e)

            self.params = nelder_mead(sse, x0, max_iter=120)
        self.w = w
        self.e = self._css(w, self.params)
        self.y_last = np.asarray(y, dtype=float)
        return self

    def forecast(self, h: int) -> np.ndarray:
        p, q = self.p, self.q
        c = self.params[0] if self.const else 0.0
        off = 1 if self.const else 0
        ar = self.params[off : off + p]
        ma = self.params[off + p : off + p + q]
        w_ext = list(self.w)
        e_ext = list(self.e)  # future errors appended as zero
        fc_w = []
        for _ in range(h):
            pred = c
            for i in range(p):
                pred += ar[i] * (w_ext[-1 - i] if len(w_ext) > i else 0.0)
            for j in range(q):
                pred += ma[j] * (e_ext[-1 - j] if len(e_ext) > j else 0.0)
            fc_w.append(pred)
            w_ext.append(pred)
            e_ext.append(0.0)
        fc_w = np.array(fc_w)
        if self.d == 0:
            return fc_w
        # integrate d times
        out = fc_w
        for _ in range(self.d):
            out = np.cumsum(out) + self.y_last[-1]
        return out
