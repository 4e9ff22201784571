"""Landmarking feature kernels (reference:
/root/reference/tspymfe/landmarking.py, class MFETSLandmarking): each
feature is the per-fold RMSE array of a model under forward-chaining CV
(5 folds, train min-max scaled to [0,1]; landmarking.py:36-273).

In the engine this is the heaviest group; the feature stage runs it as an
actor pool (SURVEY.md §2.12).  All 24 reference models are implemented;
ARIMA/HWES are approximate-parity (numpy CSS / Nelder-Mead fits)."""

from __future__ import annotations

import numpy as np

from ts_pymfe_ray.registry import FeatureKernel, SeriesCtx, register
from ts_pymfe_ray.functions import cv as _cv
from ts_pymfe_ray.functions import models as _m
from ts_pymfe_ray.functions import stats as _st


def _sk(c: SeriesCtx, make_model, **kw) -> np.ndarray:
    return _cv.cv_score_sklearn_style(c.ts, make_model, **kw)


def _fc(c: SeriesCtx, make_model, **kw) -> np.ndarray:
    return _cv.cv_score_forecast_style(c.ts, make_model, **kw)


def _reg(name, fn, ref, cost="heavy"):
    register(FeatureKernel(name, "landmarking", fn, returns_array=True,
                           cost=cost, ref=ref))


_reg("model_mean",
     lambda c: _fc(c, lambda: _m.TSArima((0, 0, 0), const=True)),
     "landmarking.py:343 (ARIMA(0,0,0)+c == global mean)", cost="medium")

_reg("model_loc_mean",
     lambda c: _sk(c, lambda: _m.TSLocalStat(np.mean)),
     "landmarking.py:421, _models.py:189-264", cost="medium")

_reg("model_loc_median",
     lambda c: _sk(c, lambda: _m.TSLocalStat(np.median)),
     "landmarking.py:497", cost="medium")

_reg("model_naive", lambda c: _sk(c, _m.TSNaive),
     "landmarking.py:1112, _models.py:21-62", cost="medium")

_reg("model_naive_drift", lambda c: _sk(c, _m.TSNaiveDrift),
     "landmarking.py:1175, _models.py:65-124", cost="medium")


def _naive_seasonal(c: SeriesCtx) -> np.ndarray:
    # X = index timestamps so the period lookup works (reference passes the
    # unitless timestamp grid; seasonal index math needs unit spacing)
    return _cv.cv_score_sklearn_style(
        c.ts, lambda: _m.TSNaiveSeasonal(max(1, c.period)),
        X=np.arange(c.ts.size, dtype=np.float64),
    )


_reg("model_naive_seasonal", _naive_seasonal,
     "landmarking.py:1241, _models.py:127-186", cost="medium")

_reg("model_sine", lambda c: _sk(c, _m.TSSine),
     "landmarking.py:573, _models.py:267-345")

_reg("model_exp", lambda c: _sk(c, _m.TSExp),
     "landmarking.py:661, _models.py:348-391")

_reg("model_gaussian", lambda c: _sk(c, _m.TSGaussianProcess),
     "landmarking.py:737 (numpy GP)")

_reg("model_linear", lambda c: _sk(c, _m.TSLinear),
     "landmarking.py:815", cost="medium")


class _TSLinearEmbed:
    """OLS on delay embedding (landmarking.py:869-1023): lag from
    first-nonsig ACF, dim from Cao's method (same estimators the
    reference wires in)."""

    def __init__(self, lag: int, dim: int = 3):
        self.lag, self.dim = max(1, lag), dim

    def fit_series(self, y: np.ndarray):
        from ts_pymfe_ray.functions.embed import embed_ts

        if y.size <= self.dim * self.lag + 2:
            raise ValueError("too short to embed")
        emb = embed_ts(y, dim=self.dim + 1, lag=self.lag)
        X = np.column_stack([np.ones(emb.shape[0]), emb[:, 1:]])
        self.beta, *_ = np.linalg.lstsq(X, emb[:, 0], rcond=None)
        self.hist = y
        return self

    def forecast(self, h: int) -> np.ndarray:
        buf = list(self.hist)
        out = []
        for _ in range(h):
            feats = [1.0] + [buf[-1 - j * self.lag] for j in range(self.dim)]
            val = float(np.dot(self.beta, feats))
            out.append(val)
            buf.append(val)
        return np.array(out)


def _linear_embed(c: SeriesCtx) -> np.ndarray:
    from ts_pymfe_ray.functions.kernels_autocorr import embed_lag
    from ts_pymfe_ray.functions.kernels_general import _emb_dim_cao

    lag = embed_lag(c)
    try:
        dim = int(np.clip(_emb_dim_cao(c), 2, 16))
    except Exception:
        dim = 3
    return _fc(c, lambda: _TSLinearEmbed(lag, dim=dim))


_reg("model_linear_embed", _linear_embed, "landmarking.py:869-1023")


class _TSLinearSeasonal:
    """OLS on one-hot season-position dummies (landmarking.py:1026-1109)."""

    def __init__(self, period: int):
        self.period = max(2, period)

    def fit_series(self, y: np.ndarray):
        # one-hot design -> orthogonal columns: the OLS (min-norm) solution
        # is the per-position mean, 0.0 for unobserved positions — same
        # values as lstsq on the dummy matrix without building it
        pos = np.arange(y.size) % self.period
        cnt = np.bincount(pos, minlength=self.period)
        s = np.bincount(pos, weights=y, minlength=self.period)
        self.beta = np.divide(s, cnt, out=np.zeros(self.period), where=cnt > 0)
        self.n = y.size
        return self

    def forecast(self, h: int) -> np.ndarray:
        pos = (self.n + np.arange(h)) % self.period
        return self.beta[pos]


_reg("model_linear_seasonal",
     lambda c: _fc(c, lambda: _TSLinearSeasonal(c.period)),
     "landmarking.py:1026-1109", cost="medium")

_reg("model_ses", lambda c: _fc(c, _m.TSSES), "landmarking.py:1913")

for _order, _const, _suffix in (
    ((1, 0, 0), True, "100_c"),
    ((0, 1, 0), True, "010_c"),
    ((1, 1, 0), True, "110_c"),
    ((0, 1, 1), False, "011_nc"),
    ((0, 1, 1), True, "011_c"),
    ((0, 2, 1), True, "021_c"),
    ((1, 1, 2), False, "112_nc"),
):
    _reg(
        f"model_arima_{_suffix}",
        (lambda order, const: lambda c: _fc(
            c, lambda: _m.TSArima(order, const=const)
        ))(_order, _const),
        f"landmarking.py ARIMA{_order} const={_const} (CSS fit, approx parity)",
    )

_reg("model_hwes_ada",
     lambda c: _fc(c, lambda: _m.TSHoltWinters(max(2, c.period), "add", damped=True)),
     "landmarking.py:1984 (damped additive HW)")


def _hwes_adm(c: SeriesCtx) -> np.ndarray:
    """Damped additive-trend + multiplicative-seasonal HW; train scaled to
    [1,2] for positivity (landmarking.py:2079, 2160-2173)."""
    return _cv.cv_score_forecast_style(
        c.ts, lambda: _m.TSHoltWinters(max(2, c.period), "mul", damped=True),
        scale_range=(1.0, 2.0),
    )


_reg("model_hwes_adm", _hwes_adm, "landmarking.py:2079")


def _acf_first_nonpos_score(pred: np.ndarray, true: np.ndarray) -> float:
    """Per-fold score: first non-positive lag of the SS-DETRENDED ACF of
    the prediction errors (reference _model_acf_first_nonpos scoring hook,
    landmarking.py:276-340: score = ft_acf_first_nonpos(ts=pred - test)
    which detrends by default)."""
    from ts_pymfe_ray.functions.decompose import supersmoother

    err = np.asarray(pred) - np.asarray(true)
    if err.size < 5:
        return np.nan
    detr = err - supersmoother(err)
    a = _st.acf(detr, nlags=err.size // 2)
    nonpos = np.flatnonzero(a <= 0)
    return float(nonpos[0] + 1) if nonpos.size else np.nan


def _acf_first_nonpos_score_batch(preds: list, trues: list) -> np.ndarray:
    """All folds' scores in one pass: the fold horizons are equal-length,
    so the SS detrend runs through the ragged batched SuperSmoother
    (bitwise == per-fold) and the error ACFs through one stacked FFT
    (tolerance surface).  Same per-fold semantics as
    :func:`_acf_first_nonpos_score`."""
    from ts_pymfe_ray.functions.decompose import supersmoother_ragged

    errs = [np.asarray(p) - np.asarray(t) for p, t in zip(preds, trues)]
    out = np.full(len(errs), np.nan)
    valid = [i for i, e in enumerate(errs) if e.size >= 5]
    if not valid:
        return out
    trends = supersmoother_ragged([errs[i] for i in valid])
    detr = [errs[i] - tr for i, tr in zip(valid, trends)]
    if len({d.size for d in detr}) == 1:
        A = _st.acf_stack(np.stack(detr), nlags=detr[0].size // 2)
        mask = A <= 0
        has = mask.any(axis=1)
        vals = np.where(has, np.argmax(mask, axis=1) + 1.0, np.nan)
    else:  # ragged fallback (cannot happen with time_series_splits)
        vals = np.array([
            _acf_first_nonpos_score(preds[i], trues[i]) for i in valid
        ])
    out[valid] = vals
    return out


register(FeatureKernel(
    "model_mean_acf_first_nonpos", "landmarking",
    lambda c: _fc(c, lambda: _m.TSArima((0, 0, 0), const=True),
                  score_batch=_acf_first_nonpos_score_batch),
    returns_array=True, cost="medium",
    ref="landmarking.py:2178 (per-fold scores, detrended error ACF)",
))
register(FeatureKernel(
    "model_linear_acf_first_nonpos", "landmarking",
    lambda c: _sk(c, _m.TSLinear, score_batch=_acf_first_nonpos_score_batch),
    returns_array=True, cost="medium",
    ref="landmarking.py:2252",
))
