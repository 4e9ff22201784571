"""Side-by-side conformance vs the reference library (FIXTURES.md §2).

In THIS container tspymfe cannot import (scipy/statsmodels/sklearn are
absent), so the pytest suite carries conformance through hand-derived
closed forms and committed goldens.  This tool exists for any environment
that does have the reference's dependencies: it runs EVERY engine kernel
(the full 149-name registry) next to the reference's same-named
``ft_*`` classmethod on the reference's 20-series corpus, using the
reference's own call protocol — the component dict + precompute pass +
signature binding of test_a.py:60-290 — and reports per-feature deltas
with per-kernel tolerance classes:

- TIGHT   (default, rtol 1e-7): deterministic kernels; any delta is a bug.
- DECOMP  (rtol/atol 1e-2): depends on the trend/season decomposition,
  where the engine's pure-numpy decompose and the reference's
  STL/SuperSmoother (_detrend.py:34-169) differ legitimately.
- APPROX  (per-kernel rel tol): optimizer-backed fits (ETS/DES/HW/ARIMA,
  _models.py:295-413), GP kernels, simulated-null / table-interpolated
  p-values (stat_tests.py:176-424), nolds ports (global_stats.py:644-807).
- RNGSTAT (rel 0.35 on the scalar summary): kernels that consume random
  draws; the engine seeds per-doc, the reference per random_state, so only
  statistical agreement is meaningful.

Usage:
    python tools/conformance_vs_reference.py [n_series]  # full side-by-side
    python tools/conformance_vs_reference.py --engine-only [n_series]
        # container mode: evaluates the ENGINE side of every mapped kernel
        # (exercises the full map's plumbing even without the reference)

Exits 0 with a SKIP message when tspymfe is unimportable (unless
--engine-only, which always runs).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import numpy as np

# ---------------------------------------------------------- tolerance map

# kernels whose reference value depends on the decomposition impl
DECOMP = {
    "trend_strenght", "season_strenght", "sd_residuals",
    "skewness_residuals", "kurtosis_residuals", "acf_detrended",
    "pacf_detrended", "ami_detrended", "turning_points_trend",
    "step_changes_trend", "acf_first_nonsig", "first_acf_locmin",
    "autocorr_crit_pt",
}

# optimizer / simulated-null / table / nolds-port kernels: honest rel tols
APPROX = {
    "des_level": 0.05, "des_trend": 0.05,
    "ets_level": 0.05, "ets_trend": 0.05, "ets_season": 0.05,
    "model_hwes_ada": 0.05, "model_hwes_adm": 0.05, "model_ses": 0.02,
    "model_arima_010_c": 0.05, "model_arima_011_c": 0.05,
    "model_arima_011_nc": 0.05, "model_arima_021_c": 0.05,
    "model_arima_100_c": 0.05, "model_arima_110_c": 0.05,
    "model_arima_112_nc": 0.05,
    "model_gaussian": 0.05, "model_linear_embed": 0.02,
    "avg_cycle_period": 0.05, "gaussian_r_sqr": 0.05,
    "gresid_autocorr": 0.05, "gresid_lbtest": 0.05,
    "opt_boxcox_coef": 1e-3,
    "test_adf": 0.1, "test_adf_gls": 0.1, "test_pp": 0.1, "test_za": 0.1,
    "test_lilliefors": 0.1, "moving_lilliefors": 0.1, "test_kpss": 0.05,
    "corr_dim": 0.1, "dfa": 0.1, "exp_hurst": 0.1, "exp_max_lyap": 0.2,
    "spikiness": 1e-4,
}

# kernels consuming random draws (engine: per-doc seed; reference:
# random_state) — only statistical agreement applies
RNGSTAT = {
    "itrand_mean", "itrand_sd", "itrand_acf", "resample_std",
    "resample_first_acf_nonpos", "resample_first_acf_locmin",
    "surr_tc3", "surr_trev", "ami_curvature", "surprise", "pred",
}

TIGHT_RTOL = 1e-7
TIGHT_ATOL = 1e-8


def _tolerance(name: str) -> tuple[str, float, float]:
    """(class, rtol, atol) for a kernel name."""
    if name in RNGSTAT:
        return "RNGSTAT", 0.35, 0.35
    if name in APPROX:
        t = APPROX[name]
        return "APPROX", t, t
    if name in DECOMP:
        return "DECOMP", 1e-2, 1e-2
    return "TIGHT", TIGHT_RTOL, TIGHT_ATOL


# --------------------------------------------------- reference-side driver


def _build_components(ts: np.ndarray, random_state: int = 16) -> dict:
    """The reference's component dict (test_a.py:60-78) + precompute pass
    (test_a.py:80-277): every ft_* is then called by signature binding."""
    import inspect

    import sklearn.metrics
    from tspymfe import _detrend, _period

    ts_period = _period.get_ts_period(ts)
    ts_trend, ts_season, ts_residuals = _detrend.decompose(ts, ts_period=ts_period)

    components = {
        "ts": ts,
        "ts_trend": ts_trend,
        "ts_season": ts_season,
        "ts_residuals": ts_residuals,
        "ts_detrended": ts - ts_trend,
        "ts_deseasonalized": ts - ts_season,
        "random_state": random_state,
        "score": sklearn.metrics.mean_squared_error,
        "ts_period": ts_period,
    }

    from tspymfe.autocorr import MFETSAutocorr
    from tspymfe.freq_domain import MFETSFreqDomain
    from tspymfe.general import MFETSGeneral
    from tspymfe.global_stats import MFETSGlobalStats
    from tspymfe.info_theory import MFETSInfoTheory
    from tspymfe.local_stats import MFETSLocalStats
    from tspymfe.model_based import MFETSModelBased
    from tspymfe.randomize import MFETSRandomize

    precomps = (
        MFETSGeneral.precompute_walker,
        MFETSGeneral.precompute_embed_caos_method,
        MFETSGeneral.precompute_period,
        MFETSGeneral.precompute_ts_scaled,
        MFETSFreqDomain.precompute_ps_residuals,
        MFETSGlobalStats.precompute_period,
        MFETSAutocorr.precompute_detrended_acf,
        MFETSAutocorr.precompute_gaussian_model,
        MFETSLocalStats.precompute_ts_scaled,
        MFETSLocalStats.precompute_rolling_window,
        MFETSModelBased.precompute_ts_scaled,
        MFETSModelBased.precompute_period,
        MFETSModelBased.precompute_model_ets,
        MFETSModelBased.precompute_ioe_std_linear_model,
        MFETSRandomize.precompute_ts_scaled,
        MFETSRandomize.precompute_itrand_stats,
        MFETSInfoTheory.precompute_ts_scaled,
        MFETSInfoTheory.precompute_detrended_ami,
    )
    for method in precomps:
        params = inspect.signature(method).parameters.keys()
        args = {k: v for k, v in components.items() if k in params}
        try:
            components.update(method(**args))
        except Exception:
            pass
    return components


def _call_reference(group: str, name: str, components: dict):
    import importlib
    import inspect

    mod = importlib.import_module(f"tspymfe.{group}")
    cls = next(getattr(mod, a) for a in dir(mod) if a.startswith("MFETS"))
    method = getattr(cls, f"ft_{name}")
    params = inspect.signature(method).parameters.keys()
    args = {k: v for k, v in components.items() if k in params}
    return method(**args)


def _summary(v) -> float:
    """Scalar summary for comparison: scalars pass through; arrays use the
    finite mean (the reference's default summarization, tsmfe.py:48)."""
    a = np.asarray(v, dtype=float).ravel()
    if a.size == 1:
        return float(a[0])
    fin = a[np.isfinite(a)]
    return float(fin.mean()) if fin.size else float("nan")


def main() -> int:
    engine_only = "--engine-only" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_series = int(argv[0]) if argv else 5

    import ts_pymfe_ray.features  # noqa: F401 — register all packs
    from tests.test_api import load_corpus_series
    from ts_pymfe_ray.registry import REGISTRY, SeriesCtx

    have_ref = True
    if not engine_only:
        try:
            import tspymfe.general  # noqa: F401
        except Exception as exc:
            print(f"SKIP: reference not importable here ({type(exc).__name__}: {exc})")
            print("Run in an environment with scipy/statsmodels/sklearn/arch "
                  "installed, or use --engine-only for the container half.")
            return 0
    else:
        try:
            import tspymfe.general  # noqa: F401
        except Exception:
            have_ref = False

    per_class = {"TIGHT": 0, "DECOMP": 0, "APPROX": 0, "RNGSTAT": 0}
    for k in REGISTRY.values():
        per_class[_tolerance(k.name)[0]] += 1
    print(f"mapped kernels: {len(REGISTRY)} "
          f"(TIGHT {per_class['TIGHT']}, DECOMP {per_class['DECOMP']}, "
          f"APPROX {per_class['APPROX']}, RNGSTAT {per_class['RNGSTAT']})")

    fails = 0
    evaluated = 0
    for ind in range(n_series):
        ts = load_corpus_series(ind)
        ctx = SeriesCtx(ts, doc_id=f"corpus-{ind}")
        components = _build_components(ts) if (have_ref and not engine_only) else None
        for k in sorted(REGISTRY.values(), key=lambda x: x.name):
            cls_name, rtol, atol = _tolerance(k.name)
            try:
                eng_val = k.fn(ctx)
            except Exception:
                # the pipeline's NaN-on-error policy (registry.evaluate_row,
                # reference _internal.py:204-213): an exception IS NaN
                eng_val = float("nan")
            evaluated += 1
            if engine_only or components is None:
                continue
            try:
                ref_val = _call_reference(k.group, k.name, components)
            except Exception:
                # reference errored too -> NaN under the same policy
                ref_val = float("nan")
            e, r = _summary(eng_val), _summary(ref_val)
            ok = (np.isnan(e) and np.isnan(r)) or bool(
                np.isclose(e, r, rtol=rtol, atol=atol, equal_nan=True)
            )
            if not ok:
                fails += 1
                print(f"FAIL[{cls_name}] series={ind} {k.name}: eng={e:.6g} ref={r:.6g}")
    mode = "engine-only" if (engine_only or not have_ref) else "side-by-side"
    print(f"done ({mode}): {n_series} series x {len(REGISTRY)} kernels, "
          f"{evaluated} evaluated, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
