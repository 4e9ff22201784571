"""Sketch-derived fast per-series features — ladder-speed extraction.

The full kernel registry evaluates ~150 features per row with per-row
Python dispatch (ms/row).  This stage computes the sketch-DERIVABLE subset
— whole-series and first-difference moments, lag-1 autocorrelation,
extrema, mean-crossing fraction — with the SAME vectorized machinery as
the tier rollup: one sketch per row + one batched derive pass, ~tens of
microseconds per row.  At 10^12 sequences this is the feature pass you can
afford on every row; the full registry runs on samples or behind the
medium/heavy packs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ts_pymfe_ray.functions import sketch as sk
from ts_pymfe_ray.functions.gapfill import gap_fill
from ts_pymfe_ray.stages.rollup import tokens_views
from ts_pymfe_ray.synth import stable_hash64

FAST_FEATURES = (
    "length", "mean", "var", "sd", "skewness", "kurtosis", "acf1",
    "vmin", "vmax", "vrange",
    "diff_mean", "diff_var", "diff_sd", "diff_skewness", "diff_kurtosis", "diff_acf1",
)


class FastFeatureStage:
    def __init__(self, num_parts: int = 64):
        self.num_parts = num_parts

    def __call__(self, batch: pa.Table) -> pa.Table:
        views, _, _ = tokens_views(batch)
        doc_ids = batch.column("doc_id").to_pylist()
        n = len(views)
        whole = np.empty((n, sk.N_FIELDS))
        diffs = np.empty((n, sk.N_FIELDS))
        part_ids = np.empty(n, dtype=np.int32)
        for i, tok in enumerate(views):
            x = gap_fill(tok)
            whole[i] = sk.compute_window_sketches(x, max(1, x.size))[0]
            d = np.diff(x)
            if d.size:
                diffs[i] = sk.compute_window_sketches(d, d.size)[0]
            else:
                diffs[i] = np.nan
            part_ids[i] = stable_hash64(doc_ids[i]) % self.num_parts
        fw = sk.derive_features(whole)
        fd = sk.derive_features(diffs)
        cols: dict[str, object] = {
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "part_id": pa.array(part_ids),
            "length": pa.array(fw["count"], pa.float64()),
        }
        for name in ("mean", "var", "sd", "skewness", "kurtosis", "acf1", "vmin", "vmax", "vrange"):
            cols[name] = pa.array(fw[name], pa.float64())
        for name in ("mean", "var", "sd", "skewness", "kurtosis", "acf1"):
            cols[f"diff_{name}"] = pa.array(fd[name], pa.float64())
        return pa.table(cols)


def run_fast_features(input_dir: str, out_dir: str | None = None):
    """Streaming fast-feature pass; returns the Dataset (caller writes or
    aggregates)."""
    from ts_pymfe_ray.sources.sequences import read_sequences
    from ts_pymfe_ray.stages.rollup import split_long_rows

    ds = read_sequences(input_dir)
    ds = ds.map_batches(
        FastFeatureStage(), batch_format="pyarrow", zero_copy_batch=True, batch_size=512
    )
    if out_dir is not None:
        ds.write_parquet(out_dir)
        return None
    return ds
