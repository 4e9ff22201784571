"""Forward-chaining cross-validation for landmarking (reference:
/root/reference/tspymfe/landmarking.py:36-273).

sklearn.model_selection.TimeSeriesSplit(n_splits=k) semantics: test size =
n // (k + 1); fold i tests [n - (k - i) * ts, n - (k - i - 1) * ts) and
trains on everything before.  Train folds are min-max scaled to [0, 1]
(fit on train, transform test); score defaults to RMSE
(scoring.py:66-73); fit/predict exceptions -> NaN fold.
"""

from __future__ import annotations

import numpy as np


def time_series_splits(n: int, n_splits: int = 5):
    test_size = n // (n_splits + 1)
    if test_size < 1:
        return
    for i in range(n_splits):
        test_end = n - (n_splits - i - 1) * test_size
        test_start = test_end - test_size
        yield np.arange(0, test_start), np.arange(test_start, test_end)


def rmse(pred: np.ndarray, true: np.ndarray) -> float:
    return float(np.sqrt(np.mean((pred - true) ** 2)))


def mae(pred, true) -> float:
    return float(np.mean(np.abs(pred - true)))


def mse(pred, true) -> float:
    return float(np.mean((pred - true) ** 2))


def smape(pred, true) -> float:
    """scoring.py smape: 200 * mean(|p - t| / (|p| + |t|))."""
    denom = np.abs(pred) + np.abs(true)
    denom = np.where(denom == 0, 1.0, denom)
    return float(200.0 * np.mean(np.abs(pred - true) / denom))


SCORES = {"rmse": rmse, "mae": mae, "mse": mse, "smape": smape}


class MinMax:
    def __init__(self, lo: float = 0.0, hi: float = 1.0):
        self.lo, self.hi = lo, hi

    def fit_transform(self, y: np.ndarray) -> np.ndarray:
        self.mn, self.mx = float(y.min()), float(y.max())
        return self.transform(y)

    def transform(self, y: np.ndarray) -> np.ndarray:
        rng = self.mx - self.mn
        if rng == 0:
            rng = 1.0
        return self.lo + (y - self.mn) * (self.hi - self.lo) / rng


def cv_score_sklearn_style(
    y: np.ndarray,
    make_model,
    score=rmse,
    num_cv_folds: int = 5,
    lm_sample_frac: float = 1.0,
    scale_range: tuple[float, float] | None = (0.0, 1.0),
    X: np.ndarray | None = None,
    score_batch=None,
) -> np.ndarray:
    """X = linspace [0,1] timestamps; model.fit(X_tr, y_tr) /
    model.predict(X_te) (landmarking.py:36-146)."""
    if lm_sample_frac < 1.0:
        k = int(np.ceil(y.size * lm_sample_frac))
        y = y[-k:]
        X = X[-k:] if X is not None else None
    if X is None:
        X = np.linspace(0.0, 1.0, y.size)
    res = np.full(num_cv_folds, np.nan)
    pairs: list = [None] * num_cv_folds
    for i, (tr, te) in enumerate(time_series_splits(y.size, num_cv_folds)):
        try:
            scaler = MinMax() if scale_range is not None else None
            y_tr = scaler.fit_transform(y[tr]) if scaler else y[tr]
            y_te = scaler.transform(y[te]) if scaler else y[te]
            model = make_model()
            model.fit(X[tr], y_tr)
            pred = np.asarray(model.predict(X[te])).ravel()
            if score_batch is not None:
                pairs[i] = (pred, y_te)
            else:
                res[i] = score(pred, y_te)
        except Exception:
            res[i] = np.nan
    if score_batch is not None:
        _apply_score_batch(res, pairs, score_batch)
    return res


def _apply_score_batch(res: np.ndarray, pairs: list, score_batch) -> None:
    """Fill res[i] for succeeded folds from ONE batched score call (fold
    horizons are equal-length, so hooks can stack their work)."""
    ok = [i for i, p in enumerate(pairs) if p is not None]
    if ok:
        vals = np.asarray(score_batch([pairs[i][0] for i in ok],
                                      [pairs[i][1] for i in ok]))
        for j, i in enumerate(ok):
            res[i] = vals[j]


def cv_score_forecast_style(
    y: np.ndarray,
    make_model,
    score=rmse,
    num_cv_folds: int = 5,
    lm_sample_frac: float = 1.0,
    scale_range: tuple[float, float] | None = (0.0, 1.0),
    score_batch=None,
) -> np.ndarray:
    """statsmodels-flavor pipeline (landmarking.py:149-273): the model
    consumes the raw train series and forecasts the test horizon."""
    if lm_sample_frac < 1.0:
        k = int(np.ceil(y.size * lm_sample_frac))
        y = y[-k:]
    res = np.full(num_cv_folds, np.nan)
    pairs: list = [None] * num_cv_folds
    for i, (tr, te) in enumerate(time_series_splits(y.size, num_cv_folds)):
        try:
            scaler = MinMax() if scale_range is not None else None
            y_tr = scaler.fit_transform(y[tr]) if scaler else y[tr]
            y_te = scaler.transform(y[te]) if scaler else y[te]
            model = make_model()
            model.fit_series(y_tr)
            pred = np.asarray(model.forecast(te.size)).ravel()
            if score_batch is not None:
                pairs[i] = (pred, y_te)
            else:
                res[i] = score(pred, y_te)
        except Exception:
            res[i] = np.nan
    if score_batch is not None:
        _apply_score_batch(res, pairs, score_batch)
    return res
