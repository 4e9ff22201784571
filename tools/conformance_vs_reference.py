"""Side-by-side conformance vs the reference library (FIXTURES.md §2).

In THIS container tspymfe cannot import (scipy/statsmodels/sklearn are
absent), so the pytest suite carries conformance through hand-derived
closed forms.  This tool exists for any environment that does have the
reference's dependencies: it runs tspymfe's own classmethods next to the
engine's kernels on the reference's 20-series corpus and reports
per-feature deltas with the documented tolerances (rtol=1e-9 for
deterministic kernels; loose for optimizer/table-backed ones).

Usage: python tools/conformance_vs_reference.py [n_series]
Exits 0 with a SKIP message when tspymfe is unimportable.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/reference")

import numpy as np

# (engine kernel name, reference group module, ft method, tolerance)
DETERMINISTIC = [
    ("length", "general", "ft_length", 0),
    ("turning_points", "general", "ft_turning_points", 1e-9),
    ("step_changes", "general", "ft_step_changes", 1e-9),
    ("frac_cp", "general", "ft_frac_cp", 1e-9),
    ("bin_mean", "general", "ft_bin_mean", 1e-9),
    ("fs_len", "general", "ft_fs_len", 1e-9),
    ("stick_angles", "general", "ft_stick_angles", 1e-9),
    ("walker_cross_frac", "general", "ft_walker_cross_frac", 1e-9),
    ("t_mean", "global_stats", "ft_t_mean", 1e-9),
    ("sd_diff", "global_stats", "ft_sd_diff", 1e-9),
    ("skewness_diff", "global_stats", "ft_skewness_diff", 1e-9),
    ("kurtosis_diff", "global_stats", "ft_kurtosis_diff", 1e-9),
    ("spikiness", "global_stats", "ft_spikiness", 1e-7),
    ("acf", "autocorr", "ft_acf", 1e-8),
    ("acf_diff", "autocorr", "ft_acf_diff", 1e-8),
    ("hist_entropy", "info_theory", "ft_hist_entropy", 1e-9),
    ("lz_complexity", "info_theory", "ft_lz_complexity", 1e-9),
    ("lumpiness", "local_stats", "ft_lumpiness", 1e-9),
    ("stability", "local_stats", "ft_stability", 1e-9),
    ("local_range", "local_stats", "ft_local_range", 1e-9),
    ("moving_avg", "local_stats", "ft_moving_avg", 1e-9),
    ("moving_var", "local_stats", "ft_moving_var", 1e-9),
    ("moving_acf", "local_stats", "ft_moving_acf", 1e-7),
    ("moving_sd", "local_stats", "ft_moving_sd", 1e-9),
    ("moving_skewness", "local_stats", "ft_moving_skewness", 1e-8),
    ("moving_kurtosis", "local_stats", "ft_moving_kurtosis", 1e-8),
    ("moving_avg_shift", "local_stats", "ft_moving_avg_shift", 1e-9),
    ("moving_kldiv", "local_stats", "ft_moving_kldiv", 1e-7),
    ("local_extrema", "local_stats", "ft_local_extrema", 1e-9),
    ("sd_residuals", "global_stats", "ft_sd_residuals", 1e-4),  # STL impl differs
    ("ioe_tdelta_mean", "global_stats", "ft_ioe_tdelta_mean", 1e-8),
    ("trev", "autocorr", "ft_trev", 1e-8),
    ("tc3", "autocorr", "ft_tc3", 1e-8),
    ("gen_autocorr", "autocorr", "ft_gen_autocorr", 1e-8),
    ("acf_first_nonsig", "autocorr", "ft_acf_first_nonsig", 0.5),  # detrend impl differs
    ("hist_ent_out_diff", "info_theory", "ft_hist_ent_out_diff", 1e-9),
    ("approx_entropy", "info_theory", "ft_approx_entropy", 1e-8),
    ("sample_entropy", "info_theory", "ft_sample_entropy", 1e-8),
    ("ps_entropy", "freq_domain", "ft_ps_entropy", 1e-6),
    ("low_freq_power", "freq_domain", "ft_low_freq_power", 1e-6),
    ("ps_freqs", "freq_domain", "ft_ps_freqs", 1e-6),
    ("test_lb", "stat_tests", "ft_test_lb", 1e-6),
    ("test_earch", "stat_tests", "ft_test_earch", 1e-5),
    ("linearity", "model_based", "ft_linearity", 1e-3),
    ("curvature", "model_based", "ft_curvature", 1e-3),
]


def main():
    try:
        import tspymfe.general  # noqa: F401
    except Exception as exc:
        print(f"SKIP: reference not importable here ({type(exc).__name__}: {exc})")
        print("Run in an environment with scipy/statsmodels/sklearn/arch installed.")
        return 0

    import importlib

    from tests.test_api import load_corpus_series

    from ts_pymfe_ray.registry import REGISTRY, SeriesCtx

    n_series = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    fails = 0
    for ind in range(n_series):
        ts = load_corpus_series(ind)
        ctx = SeriesCtx(ts, doc_id=f"corpus-{ind}")
        for eng_name, mod_name, ft_name, tol in DETERMINISTIC:
            mod = importlib.import_module(f"tspymfe.{mod_name}")
            cls = next(
                getattr(mod, a) for a in dir(mod) if a.startswith("MFETS")
            )
            try:
                ref_val = np.asarray(getattr(cls, ft_name)(ts=ts), dtype=float)
            except TypeError:
                ref_val = np.asarray(
                    getattr(cls, ft_name)(ts_residuals=ctx.ts_residuals), dtype=float
                )
            eng_val = np.asarray(REGISTRY[eng_name].fn(ctx), dtype=float)
            ok = eng_val.shape == ref_val.shape and np.allclose(
                eng_val, ref_val, rtol=max(tol, 1e-12), atol=tol, equal_nan=True
            )
            status = "OK " if ok else "FAIL"
            if not ok:
                fails += 1
                print(f"{status} series={ind} {eng_name}: eng={eng_val.ravel()[:3]} ref={ref_val.ravel()[:3]}")
    print(f"done: {n_series} series x {len(DETERMINISTIC)} features, {fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
