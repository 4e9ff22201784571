"""Static feature-kernel registry + lazy per-series context.

The reference discovers features by reflecting over ``ft_``-prefixed
classmethods and wires shared intermediates through a mutable precompute
dict (/root/reference/tspymfe/_internal.py:305-455, 1158-1331).  The engine
replaces both with static structures chosen at plan time:

- :class:`SeriesCtx` — one per row; every shared intermediate (scaled
  series, period, STL/SuperSmoother components, detrended ACF, ...) is a
  lazily computed, cached property, so a fused ``map_batches`` kernel
  computes each intermediate at most once per row no matter how many
  features need it.
- :data:`REGISTRY` — ``{feature_name: FeatureKernel}``; a kernel is a pure
  function ``fn(ctx) -> float | np.ndarray``.  Array-valued kernels are
  reduced by summary functions into fixed columns ``name.summary`` exactly
  like the reference (tsmfe.py:525-549); defaults ("mean", "sd").
- NaN-on-error: any exception inside a kernel yields NaN for that feature
  only (reference policy, _internal.py:204-213, 594-614).

User extension surface: ``register(FeatureKernel(...))`` — the declared
equivalent of adding an ``ft_`` method to a reference class.
"""

from __future__ import annotations

import dataclasses
import math
import typing as t

import numpy as np

from ts_pymfe_ray.functions import decompose as _dec
from ts_pymfe_ray.functions import stats as _st
from ts_pymfe_ray.functions.period import ts_period_from_detrended

# Analysis window cap: per-series (non-rollup) kernels run on the most
# recent min(n, CAP) observations, mirroring the reference tests' own
# truncate-to-last-512 behavior (/root/reference/test_a.py:27, test_b.py:10)
# and bounding worst-case per-row cost for super-linear kernels — the
# hot-key story for the feature (not rollup) path.
DEFAULT_ANALYSIS_CAP = 512


class SeriesCtx:
    """Lazy, cached per-row intermediates (the precompute cache, static)."""

    def __init__(self, ts: np.ndarray, doc_id: str = "", cap: int = DEFAULT_ANALYSIS_CAP):
        full = np.asarray(ts, dtype=np.float64)
        self.ts_all = full
        self.ts = full[-cap:] if cap and full.size > cap else full
        self.doc_id = doc_id
        self._cache: dict[str, t.Any] = {}

    def _get(self, key: str, fn: t.Callable[[], t.Any]) -> t.Any:
        if key not in self._cache:
            self._cache[key] = fn()
        return self._cache[key]

    # --- shared intermediates -------------------------------------------
    @property
    def ts_scaled(self) -> np.ndarray:
        return self._get("ts_scaled", lambda: _st.standardize_ts(self.ts))

    @property
    def ssmoother_trend(self) -> np.ndarray:
        return self._get("ss_trend", lambda: _dec.supersmoother(self.ts))

    @property
    def ts_detrended_ss(self) -> np.ndarray:
        """SuperSmoother-detrended series (used by period + detrended ACF,
        reference autocorr.py:128-191 'detrend=True' path)."""
        return self._get("ts_detrended_ss", lambda: self.ts - self.ssmoother_trend)

    @property
    def ts_diff(self) -> np.ndarray:
        """First difference of the capped series — shared (read-only by
        convention) by the diff / sd_diff / skewness_diff / kurtosis_diff
        kernels, which all recompute the identical np.diff otherwise."""
        return self._get("ts_diff", lambda: np.diff(self.ts))

    @property
    def period(self) -> int:
        return self._get("period", lambda: ts_period_from_detrended(self.ts_detrended_ss))

    @property
    def components(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(trend, season, resid) — reference _detrend.py:117-182 semantics."""

        def _build():
            if self.period <= 1:
                tr = self.ssmoother_trend
                return tr, np.zeros(self.ts.size), self.ts - tr
            return _dec.stl_decompose(self.ts, self.period)

        return self._get("components", _build)

    @property
    def ts_trend(self) -> np.ndarray:
        return self.components[0]

    @property
    def ts_season(self) -> np.ndarray:
        return self.components[1]

    @property
    def ts_residuals(self) -> np.ndarray:
        return self.components[2]

    @property
    def ts_detrended(self) -> np.ndarray:
        return self._get("ts_detrended", lambda: self.ts - self.ts_trend)

    @property
    def ts_deseasonalized(self) -> np.ndarray:
        return self._get("ts_deseasonalized", lambda: self.ts - self.ts_season)

    @property
    def detrended_acfs(self) -> np.ndarray:
        """ACF (lags 1..n//2, adjusted, FFT) of the SS-detrended series
        (reference precompute_detrended_acf, autocorr.py:23-62)."""
        return self._get(
            "detrended_acfs", lambda: _st.acf(self.ts_detrended_ss, nlags=self.ts.size // 2)
        )

    @property
    def detrended_ami(self) -> np.ndarray:
        from ts_pymfe_ray.functions.kernels_info import calc_ami_lags

        return self._get("detrended_ami", lambda: calc_ami_lags(self))

    @property
    def rng(self) -> np.random.Generator:
        """Per-row deterministic RNG (cluster-reproducible — never the
        global numpy seed the reference uses, tsmfe.py:272-274)."""

        def _mk():
            from ts_pymfe_ray.synth import stable_hash64

            return np.random.Generator(np.random.PCG64(stable_hash64("ctx:" + self.doc_id)))

        return self._get("rng", _mk)


@dataclasses.dataclass(frozen=True)
class FeatureKernel:
    name: str  # reference-compatible feature name (e.g. "trend_strenght")
    group: str  # reference group class (general, global_stats, ...)
    fn: t.Callable[[SeriesCtx], t.Union[float, np.ndarray]]
    returns_array: bool = False  # arrays get summarized into name.summary cols
    cost: str = "cheap"  # cheap | medium | heavy — drives stage placement
    ref: str = ""  # file:line citation into /root/reference


REGISTRY: dict[str, FeatureKernel] = {}

# postprocess hooks (reference scans postprocess_* methods,
# _internal.py:1711-1805 — a no-op in practice; the engine keeps the
# extension point as an explicit registry)
POSTPROCESSORS: list[t.Callable[[dict, "SeriesCtx"], None]] = []


def register(k: FeatureKernel) -> FeatureKernel:
    REGISTRY[k.name] = k
    return k


def register_postprocessor(fn: t.Callable[[dict, "SeriesCtx"], None]) -> t.Callable:
    """Register a hook run after per-row extraction; it may mutate the
    result dict in place (the engine's postprocess_* equivalent)."""
    POSTPROCESSORS.append(fn)
    return fn


def kernels_of(groups: t.Iterable[str] | None = None, max_cost: str = "heavy") -> list[FeatureKernel]:
    order = {"cheap": 0, "medium": 1, "heavy": 2}
    lim = order[max_cost]
    sel = [
        k
        for k in REGISTRY.values()
        if (groups is None or k.group in groups) and order[k.cost] <= lim
    ]
    return sorted(sel, key=lambda k: k.name)


# --- summaries applied to array-valued kernels (reference default
# ("mean", "sd"), tsmfe.py:48) ------------------------------------------
def summarize_array(vals: np.ndarray) -> dict[str, float]:
    v = vals if type(vals) is np.ndarray and vals.dtype == np.float64 \
        else np.asarray(vals, dtype=np.float64)
    if v.size == 0:
        return {"mean": np.nan, "sd": np.nan}
    s1 = v.sum()
    if not np.isfinite(s1):  # NaN/inf present -> pay for the mask
        v = v[np.isfinite(v)]
        if v.size == 0:
            return {"mean": np.nan, "sd": np.nan}
        s1 = v.sum()
    n = v.size
    mean = s1 / n
    if n < 2:
        return {"mean": float(mean), "sd": np.nan}
    var = (v @ v - n * mean * mean) / (n - 1)
    # math.sqrt == np.sqrt bitwise (both the IEEE-754 sqrt), ~10x cheaper
    # on a scalar — this runs once per array kernel per row
    return {"mean": float(mean), "sd": math.sqrt(var) if var > 0 else 0.0}


def feature_columns(kernels: list[FeatureKernel]) -> list[str]:
    """Fixed output schema: scalar kernels -> one column; array kernels ->
    name.mean / name.sd (name-sorted, like reference tsmfe.py:941-947)."""
    cols: list[str] = []
    for k in kernels:
        if k.returns_array:
            cols.extend([f"{k.name}.mean", f"{k.name}.sd"])
        else:
            cols.append(k.name)
    return sorted(cols)


def evaluate_row(ts: np.ndarray, doc_id: str, kernels: list[FeatureKernel], cap: int = DEFAULT_ANALYSIS_CAP, ctx: "SeriesCtx | None" = None) -> dict[str, float]:
    """Run every kernel on one series; exceptions -> NaN (reference
    _internal.py:204-213).  ``ctx`` lets the feature stage pass a
    pre-seeded SeriesCtx (batched same-length precomputes); ``ts`` is
    ignored when given."""
    if ctx is None:
        ctx = SeriesCtx(ts, doc_id=doc_id, cap=cap)
    out: dict[str, float] = {}
    # ONE errstate scope for the whole row: entering/exiting a numpy
    # errstate per kernel costs ~5us x 37 kernels; the outer scope covers
    # exactly what the per-kernel managers covered
    with np.errstate(all="ignore"):
        out = _eval_kernels(ctx, kernels)
    for post in POSTPROCESSORS:
        try:
            post(out, ctx)
        except Exception:
            pass  # hooks must never fail a row (reference error policy)
    return out


def _eval_kernels(ctx: "SeriesCtx", kernels: list[FeatureKernel]) -> dict[str, float]:
    out: dict[str, float] = {}
    for k in kernels:
        try:
            val = k.fn(ctx)
        except Exception:
            val = np.nan
        if k.returns_array:
            if isinstance(val, np.ndarray):
                summ = summarize_array(val)
            else:
                summ = {"mean": np.nan, "sd": np.nan}
            for s, sv in summ.items():
                out[f"{k.name}.{s}"] = sv
        else:
            try:
                out[k.name] = float(val)
            except (TypeError, ValueError):
                out[k.name] = np.nan
    return out
