"""CSV source: ingest the reference's comp-engine export format into the
engine's sequences schema.

The reference's own corpus (test_a.py:27-38,
data/comp-engine-export-sample.20200503.csv) is a CSV of
``timeseries_id,datapoints`` rows where ``datapoints`` is one quoted
comma-joined float series.  This source streams that format through
``ray.data.read_csv`` and quantizes each series to the engine's int32
token domain [0, 65535] with the SAME min-max rule the synthesizer uses
(synth.py:97-104), so every engine pipeline — tier rollup, feature
extraction, dedup, analytics — runs unchanged on reference-corpus data.
A user of the reference can point their CSV exports at this reader and
keep their pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

import ts_pymfe_ray._compat  # noqa: F401  (fsspec probe shim)

TOKEN_MAX = 65535

SEQ_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("tokens", pa.list_(pa.int32())),
        ("n_tok", pa.int32()),
        ("source", pa.string()),
    ]
)


def quantize_series(v: np.ndarray) -> np.ndarray:
    """Min-max quantization to [0, TOKEN_MAX] (synth.py:102-104 rule).

    Non-finite observations (NaN/inf from a dirty export row) are dropped
    before quantization — the reference harness cleans its corpus the same
    way — and an all-bad/empty series quantizes to an empty token array
    instead of crashing or emitting garbage."""
    v = np.asarray(v, dtype=np.float64)
    v = v[np.isfinite(v)]
    if v.size == 0:
        return np.empty(0, dtype=np.int32)
    lo, hi = float(v.min()), float(v.max())
    scale = (TOKEN_MAX / (hi - lo)) if hi > lo else 0.0
    return np.rint((v - lo) * scale).astype(np.int32)


def _safe_float(x: str) -> float:
    try:
        return float(x)
    except ValueError:
        return float("nan")


def read_comp_engine_csv(path: str, source: str = "comp-engine",
                         max_obs: int = 0) -> ray.data.Dataset:
    """Streaming read of comp-engine CSV exports -> sequences Dataset.

    ``max_obs`` > 0 keeps only the trailing observations of each series
    (the reference harness keeps the last 512, test_a.py:36)."""
    ds = ray.data.read_csv(path)

    def to_sequences(batch: pa.Table) -> pa.Table:
        ids = batch.column("timeseries_id").to_pylist()
        dps = batch.column("datapoints").to_pylist()
        toks, ntoks = [], []
        for s in dps:
            parts = s.split(",")
            try:
                v = np.asarray(parts, dtype=np.float64)
            except ValueError:  # unparseable cell -> NaN, dropped by quantize
                v = np.array([_safe_float(x) for x in parts], dtype=np.float64)
            if max_obs:
                v = v[-max_obs:]
            tok = quantize_series(v)
            toks.append(tok)
            ntoks.append(tok.size)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.string()),
                "tokens": pa.array(toks, pa.list_(pa.int32())),
                "n_tok": pa.array(ntoks, pa.int32()),
                "source": pa.array([source] * len(ids), pa.string()),
            },
            schema=SEQ_SCHEMA,
        )

    return ds.map_batches(to_sequences, batch_format="pyarrow")


def ingest_comp_engine_csv(path: str, out_dir: str, source: str = "comp-engine",
                           max_obs: int = 0) -> str:
    """Materialize a comp-engine CSV as a sequences parquet directory that
    run_rollup / run_features / every queries() pipeline accepts."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    read_comp_engine_csv(path, source=source, max_obs=max_obs).write_parquet(out_dir)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return out_dir
