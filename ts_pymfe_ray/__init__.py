"""ts_pymfe_ray — a Ray-Data-native time-series rollup / downsample / retention engine.

A from-scratch engine (NOT a port) with the query and data-processing
capabilities of FelSiq/ts-pymfe (reference at /root/reference, cited by
file:line in docstrings), re-expressed Ray-Data-first:

- input: Parquet tables of pre-tokenized training sequences
  ``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
- each row is one univariate series; per-series feature kernels are pure
  numpy functions fused into one ``map_batches`` pass over zero-copy Arrow
  batches
- window rollups use mergeable moment/comoment sketches that power a
  raw -> 10x -> 100x retention ladder, Gorilla-style compressed tier output
- shuffles (cross-series rollups) are salted, partial-aggregated groupbys
- output is partitioned Parquet with a manifest enabling exact resume
"""

__version__ = "0.1.0"

# Every Ray worker that deserializes a stage callable imports this package;
# pulling the compat shims in here (malloc tuning + fsspec probe stub)
# guarantees they run in workers too, not only on the driver.
import ts_pymfe_ray._compat  # noqa: E402,F401
