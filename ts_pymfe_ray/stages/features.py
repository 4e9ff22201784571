"""Per-series feature extraction stage: the reference's fit+extract
pipeline (tsmfe.py:632-980) fused into one map_batches pass.

Stateless variant (cheap/medium kernels: pure numpy, no warm state) runs as
Ray tasks; the heavy variant (GP fits, embedding NN searches, model fits)
is the same callable used as an ACTOR POOL via
``map_batches(FeatureStage, concurrency=N)`` so per-actor state (kernel
list, scratch buffers) is built once per worker, not per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ts_pymfe_ray.features  # noqa: F401  (populates the registry)
from ts_pymfe_ray.functions.gapfill import gap_fill
from ts_pymfe_ray.registry import (
    DEFAULT_ANALYSIS_CAP,
    evaluate_row,
    feature_columns,
    kernels_of,
)
from ts_pymfe_ray.stages.rollup import tokens_views
from ts_pymfe_ray.synth import stable_hash64


class FeatureStage:
    def __init__(
        self,
        groups: tuple[str, ...] | None = None,
        max_cost: str = "medium",
        cap: int = DEFAULT_ANALYSIS_CAP,
        num_parts: int = 64,
    ):
        self.kernels = kernels_of(groups, max_cost=max_cost)
        self.columns = feature_columns(self.kernels)
        self.cap = cap
        self.num_parts = num_parts
        # driver-side pre-seed: simulated stat-test null tables ship with
        # the stage instead of being rebuilt in every worker process
        self._null_tables = None
        if any(k.group == "stat_tests" and k.cost == "heavy" for k in self.kernels):
            from ts_pymfe_ray.functions.kernels_stat_tests import build_null_tables

            buckets = tuple(sorted({min(cap, 1024), 512} | {min(cap, 1024)}))
            self._null_tables = build_null_tables(buckets)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._null_tables is not None:
            from ts_pymfe_ray.functions.kernels_stat_tests import preseed_null_tables

            preseed_null_tables(self._null_tables)
        views, _, _ = tokens_views(batch)
        doc_ids = batch.column("doc_id").to_pylist()
        sources = batch.column("source").to_pylist()
        n = len(views)
        data = {c: np.full(n, np.nan) for c in self.columns}
        part_ids = np.empty(n, dtype=np.int32)
        for i, tok in enumerate(views):
            part_ids[i] = stable_hash64(doc_ids[i]) % self.num_parts
            x = gap_fill(tok)
            vals = evaluate_row(x, doc_ids[i], self.kernels, cap=self.cap)
            for k, v in vals.items():
                data[k][i] = v
        cols = {
            "doc_id": pa.array(doc_ids, pa.string()),
            "source": pa.array(sources, pa.string()),
            "part_id": pa.array(part_ids),
            "n_tok": batch.column("n_tok"),
        }
        # fixed, name-sorted feature schema (reference sorts by name,
        # tsmfe.py:941-947); dots are Arrow-safe in flat column names
        for c in self.columns:
            cols[c] = pa.array(data[c], pa.float64())
        return pa.table(cols)
