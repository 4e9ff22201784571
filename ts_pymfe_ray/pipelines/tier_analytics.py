"""Downstream analytics over the COMPRESSED tier output — the consumption
side of the retention ladder.

The rollup writes per-(doc, tier) Gorilla blobs; this pipeline reads those
parquet files back as a Ray Dataset, decodes the window-statistic streams
in ``map_batches`` (zero raw-token access — the whole point of retention:
after the raw tier ages out, analytics continue on 10x/100x), and computes
per-doc trend/volatility diagnostics from the window-mean/var/acf1 curves.

This is the continuous-aggregate query path of the north star: the tier
store is 1-2 orders of magnitude smaller than the token store, and every
query here touches only the compressed streams.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ts_pymfe_ray.functions.rounding import round_ha
import pyarrow as pa

import ray.data

from ts_pymfe_ray.functions import gorilla
from ts_pymfe_ray.stages.rollup import STREAMS


def read_tier_dataset(out_dir: str, tier: str) -> ray.data.Dataset:
    import ts_pymfe_ray._compat  # noqa: F401

    ds = ray.data.read_parquet(
        out_dir,
        file_extensions=["parquet"],
        partition_filter=None,
        partitioning=ray.data.datasource.partitioning.Partitioning("hive"),
    )
    return ds.filter(expr=f"tier == '{tier}'")


def _decode_and_diagnose(batch: pa.Table) -> pa.Table:
    """Per tier row: decode the window streams, fit a linear drift to the
    window means, report volatility-of-volatility and mean window ACF."""
    out = {
        "doc_id": batch.column("doc_id").to_pylist(),
        "source": batch.column("source").to_pylist(),
        "tier": batch.column("tier").to_pylist(),
        "n_windows": batch.column("n_windows").to_pylist(),
    }
    blobs = batch.column("win_streams").to_pylist()
    nws = out["n_windows"]
    drift, volvol, mean_acf1, level = [], [], [], []
    for blob, nw in zip(blobs, nws):
        flat = gorilla.decode_floats_xor(blob)
        streams = {s: flat[j * nw : (j + 1) * nw] for j, s in enumerate(STREAMS)}
        means = streams["mean"]
        level.append(float(np.nanmean(means)))
        if nw > 1:
            t = np.arange(nw, dtype=np.float64)
            tm, mm = t.mean(), np.nanmean(means)
            drift.append(float(np.nansum((t - tm) * (means - mm)) / ((t - tm) ** 2).sum()))
            sd = np.sqrt(np.maximum(streams["var"], 0))
            volvol.append(float(np.nanstd(sd, ddof=1)) if nw > 2 else np.nan)
        else:
            drift.append(np.nan)
            volvol.append(np.nan)
        with np.errstate(all="ignore"):
            mean_acf1.append(float(np.nanmean(streams["acf1"])) if np.isfinite(streams["acf1"]).any() else np.nan)
    out["window_mean_level"] = level
    out["window_mean_drift"] = drift
    out["window_sd_volatility"] = volvol
    out["mean_window_acf1"] = mean_acf1
    return pa.table(out)


def tier_diagnostics(out_dir: str, tier: str = "10x",
                     gap_free: bool = False) -> pd.DataFrame:
    """Per-source diagnostics computed purely from compressed tier rows.

    ``gap_free=True`` restricts to rows with no gap sentinels — the
    SQL-oracled mode where a DuckDB twin recomputes the same window
    means/sd/acf1 from the RAW tokens (validating sequences -> rollup ->
    Gorilla decode -> analytics end-to-end; gap-filled values are float
    association-sensitive and stay rows-only)."""
    ds = read_tier_dataset(out_dir, tier)
    if gap_free:
        ds = ds.filter(expr="n_gap == 0")
    diag = ds.map_batches(_decode_and_diagnose, batch_format="pyarrow", batch_size=512)

    def combiner(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("source").agg(
            n_docs=("doc_id", "size"),
            sum_drift=("window_mean_drift", "sum"),
            n_drift=("window_mean_drift", "count"),
            sum_volvol=("window_sd_volatility", "sum"),
            n_volvol=("window_sd_volatility", "count"),
            sum_acf1=("mean_window_acf1", "sum"),
            n_acf1=("mean_window_acf1", "count"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = diag.map_batches(combiner, batch_format="pyarrow").to_pandas()
    g = partials.groupby("source").agg(
        n_docs=("n_docs", "sum"), sum_drift=("sum_drift", "sum"),
        n_drift=("n_drift", "sum"), sum_volvol=("sum_volvol", "sum"),
        n_volvol=("n_volvol", "sum"), sum_acf1=("sum_acf1", "sum"),
        n_acf1=("n_acf1", "sum"),
    ).reset_index()
    g["avg_window_drift"] = round_ha((g["sum_drift"] / g["n_drift"]).to_numpy())
    g["avg_sd_volatility"] = round_ha((g["sum_volvol"] / g["n_volvol"]).to_numpy())
    g["avg_window_acf1"] = round_ha((g["sum_acf1"] / g["n_acf1"]).to_numpy())
    g["n_docs"] = g["n_docs"].astype("int64")
    out = g[["source", "n_docs", "avg_window_drift", "avg_sd_volatility", "avg_window_acf1"]]
    return out.sort_values("source").reset_index(drop=True)


def explode_tier(out_dir: str, tier: str = "10x") -> ray.data.Dataset:
    """Relational view of a tier: stream-decode the Gorilla blobs into one
    row per (doc, window) with the six statistic columns — the bridge from
    the compressed tier store to SQL-style tooling.  Streaming map; never
    materializes the store."""

    def decode(batch: pa.Table) -> pa.Table:
        nws = batch.column("n_windows").to_numpy()
        blobs = batch.column("win_streams").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        sources = batch.column("source").to_pylist()
        offs = batch.column("window_offset").to_numpy()
        buckets = batch.column("bucket_size").to_numpy()
        total = int(nws.sum())
        out = {
            "doc_id": np.empty(total, dtype=object),
            "source": np.empty(total, dtype=object),
            "window_id": np.empty(total, dtype=np.int64),
        }
        stream_cols = {s: np.empty(total, dtype=np.float64) for s in STREAMS}
        pos = 0
        for i, blob in enumerate(blobs):
            nw = int(nws[i])
            flat = gorilla.decode_floats_xor(blob)
            base = int(offs[i]) // int(buckets[i])
            sl = slice(pos, pos + nw)
            out["doc_id"][sl] = doc_ids[i]
            out["source"][sl] = sources[i]
            out["window_id"][sl] = base + np.arange(nw)
            for j, s in enumerate(STREAMS):
                stream_cols[s][sl] = flat[j * nw : (j + 1) * nw]
            pos += nw
        cols = {
            "doc_id": pa.array(out["doc_id"].tolist(), pa.string()),
            "source": pa.array(out["source"].tolist(), pa.string()),
            "window_id": pa.array(out["window_id"]),
        }
        for s in STREAMS:
            cols[f"win_{s}"] = pa.array(stream_cols[s])
        return pa.table(cols)

    ds = read_tier_dataset(out_dir, tier)
    return ds.map_batches(decode, batch_format="pyarrow", batch_size=512)
