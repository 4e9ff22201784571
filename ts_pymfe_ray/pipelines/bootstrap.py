"""Distributed bootstrap confidence intervals — the reference's
``extract_with_confidence`` (tsmfe.py:982-1248) re-expressed Ray-Data-first
(SURVEY.md §2.1):

    row -> flat_map into K resampled replicate rows (seeded per (doc, rep))
        -> the same fused feature kernel
        -> groupby(doc_id) quantile aggregation

The reference reseeds the GLOBAL numpy RNG per replicate
(tsmfe.py:1051-1054); here each replicate's resampling indices come from
``PCG64(hash(doc_id) ^ rep)`` so results are identical regardless of which
worker or node processes which replicate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ts_pymfe_ray.sources.sequences import read_sequences
from ts_pymfe_ray.stages.features import FeatureStage
from ts_pymfe_ray.stages.rollup import tokens_views
from ts_pymfe_ray.synth import stable_hash64


def _explode(batch: pa.Table, sample_num: int) -> pa.Table:
    views, _, _ = tokens_views(batch)
    doc_ids = batch.column("doc_id").to_pylist()
    sources = batch.column("source").to_pylist()
    out = {"doc_id": [], "rep": [], "tokens": [], "n_tok": [], "source": []}
    for i, tok in enumerate(views):
        n = tok.size
        for rep in range(sample_num):
            rng = np.random.Generator(np.random.PCG64(stable_hash64(doc_ids[i]) ^ rep))
            res = tok[rng.integers(n, size=n)]
            out["doc_id"].append(doc_ids[i])
            out["rep"].append(rep)
            out["tokens"].append(res)
            out["n_tok"].append(n)
            out["source"].append(sources[i])
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "rep": pa.array(out["rep"], pa.int32()),
            "tokens": pa.array(out["tokens"], pa.list_(pa.int32())),
            "n_tok": pa.array(out["n_tok"], pa.int32()),
            "source": pa.array(out["source"], pa.string()),
        }
    )


def bootstrap_features(
    input_dir: str,
    sample_num: int = 16,
    confidence: float = 0.95,
    groups: tuple[str, ...] = ("general",),
    max_cost: str = "cheap",
    max_docs: int | None = 256,
) -> pd.DataFrame:
    """Per-feature bootstrap quantile intervals per doc.

    ``max_docs`` bounds the replicate fan-out for interactive runs (cost is
    sample_num x the feature pass); pass None to run the full table.
    """
    ds = read_sequences(input_dir)
    if max_docs is not None:
        # deterministic subset: smallest hash values, independent of order
        def keep(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            mask = np.array([stable_hash64(d) % 1024 < max(1, 1024 * max_docs // 100_000) for d in ids])
            return batch.filter(pa.array(mask))

        ds = ds.map_batches(keep, batch_format="pyarrow")
    ds = ds.map_batches(
        _explode, batch_format="pyarrow", fn_kwargs={"sample_num": sample_num},
        batch_size=32,
    )
    feat_stage = FeatureStage(groups=groups, max_cost=max_cost)

    def featurize(batch: pa.Table) -> pa.Table:
        # FeatureStage keys on doc_id; carry the rep column through
        out = feat_stage(batch)
        return out.append_column("rep", batch.column("rep"))

    feats = ds.map_batches(featurize, batch_format="pyarrow", zero_copy_batch=True, batch_size=64)
    lo_q = (1.0 - confidence) / 2.0

    feat_cols = feat_stage.columns

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        row: dict = {"doc_id": df["doc_id"].iloc[0], "n_reps": np.int64(len(df))}
        with np.errstate(all="ignore"):
            for c in feat_cols:
                v = df[c].to_numpy()
                v = v[np.isfinite(v)]
                if v.size:
                    row[f"{c}.lo"] = float(np.quantile(v, lo_q))
                    row[f"{c}.hi"] = float(np.quantile(v, 1 - lo_q))
                else:
                    row[f"{c}.lo"] = np.nan
                    row[f"{c}.hi"] = np.nan
        return pd.DataFrame([row])

    out = feats.groupby("doc_id").map_groups(agg, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
