"""Deterministic synthesis of the `sequences` table (FIXTURES.md §1).

Schema (exactly BASELINE.json ``input_hint``):

    doc_id : string      "doc-{source}-{i:08d}"
    tokens : list<int32> univariate series quantized to [0, 65535]; -1 = gap
    n_tok  : int32
    source : string      {"web": 70%, "code": 20%, "books": 9%, "chat": 1%}

Every row is reproducible independently: the per-row RNG is
``np.random.Generator(PCG64(SEED ^ stable_hash64(doc_id)))``, so any subset
of rows (any partition, any scale factor prefix) regenerates bit-identically
— the property that makes resumable/verifiable synthesis possible at scale.

Series shapes (mixed per source so every reference code path fires —
period>1 -> STL branch /root/reference/tspymfe/_detrend.py:162-169;
period<=1 -> SuperSmoother branch):
white noise, linear trend + noise, seasonal sin, random walk, level shifts,
heteroskedastic bursts.  10% of rows carry 1-5 sentinel gap runs to exercise
LOCF + linear-interpolation gap-fill.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
SOURCES = ("web", "code", "books", "chat")
SOURCE_P = (0.70, 0.20, 0.09, 0.01)
TOKEN_MAX = 65535
SENTINEL = -1
CACHE_ROOT = "/tmp/ts_pymfe_ray_data"


def stable_hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _row_rng(doc_id: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(SEED ^ stable_hash64(doc_id)))


def _pick_source(i: int) -> str:
    r = np.random.Generator(np.random.PCG64(SEED ^ i)).random()
    acc = 0.0
    for s, p in zip(SOURCES, SOURCE_P):
        acc += p
        if r < acc:
            return s
    return SOURCES[-1]


def _sample_length(rng: np.random.Generator) -> int:
    u = rng.random()
    if u < 0.80:
        return int(rng.integers(64, 513))
    if u < 0.95:
        return int(rng.integers(512, 4097))
    # long tail, log-uniform in [4096, 65536] — the "hot keys"
    return int(np.exp(rng.uniform(np.log(4096), np.log(65536))))


def _gen_values(rng: np.random.Generator, n: int) -> np.ndarray:
    shape = int(rng.integers(6))
    t = np.arange(n, dtype=np.float64)
    noise = rng.normal(0.0, 1.0, n)
    if shape == 0:  # white noise
        v = noise
    elif shape == 1:  # linear trend + noise (reference README.md:36 example)
        v = 0.3 * t + noise
    elif shape == 2:  # seasonal + weak trend + noise
        p = int(rng.choice((7, 12, 24, 50)))
        amp = rng.uniform(1.0, 5.0)
        v = amp * np.sin(2.0 * np.pi * t / p) + rng.uniform(-0.05, 0.05) * t + 0.3 * noise
    elif shape == 3:  # random walk (unit root)
        v = np.cumsum(noise)
    elif shape == 4:  # level shifts
        v = noise.copy()
        for _ in range(int(rng.integers(2, 6))):
            cp = int(rng.integers(1, n))
            v[cp:] += rng.uniform(2.0, 8.0) * rng.choice((-1.0, 1.0))
    else:  # heteroskedastic bursts
        vol = np.ones(n)
        for _ in range(int(rng.integers(1, 4))):
            a = int(rng.integers(0, n))
            b = min(n, a + int(rng.integers(8, max(9, n // 4))))
            vol[a:b] *= rng.uniform(3.0, 8.0)
        v = noise * vol
    return v


def make_row_tokens(doc_id: str) -> np.ndarray:
    """Generate one row's int32 token array, deterministically from doc_id."""
    rng = _row_rng(doc_id)
    n = _sample_length(rng)
    v = _gen_values(rng, n)
    lo, hi = float(v.min()), float(v.max())
    scale = (TOKEN_MAX / (hi - lo)) if hi > lo else 0.0
    tok = np.rint((v - lo) * scale).astype(np.int32)
    # 10% of rows: 1-5 sentinel gap runs
    if rng.random() < 0.10:
        for _ in range(int(rng.integers(1, 6))):
            a = int(rng.integers(0, n))
            b = min(n, a + int(rng.integers(1, 21)))
            tok[a:b] = SENTINEL
    return tok


def rows_for_sf(sf: float) -> int:
    return max(1, int(round(sf * 1_000_000)))


def sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(os.path.normpath(sf_dir))
    if base.startswith("sf"):
        return float(base[2:])
    raise ValueError(f"cannot parse scale factor from {sf_dir!r}")


def _build_batch(indices: np.ndarray) -> pa.Table:
    doc_ids, tokens, n_toks, sources = [], [], [], []
    for i in indices:
        src = _pick_source(int(i))
        doc_id = f"doc-{src}-{int(i):08d}"
        tok = make_row_tokens(doc_id)
        doc_ids.append(doc_id)
        tokens.append(tok)
        n_toks.append(tok.size)
        sources.append(src)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "tokens": pa.array(tokens, pa.list_(pa.int32())),
            "n_tok": pa.array(n_toks, pa.int32()),
            "source": pa.array(sources, pa.string()),
        }
    )


def sequences_path(sf: float, cache_root: str = CACHE_ROOT) -> str:
    return os.path.join(cache_root, f"sequences_sf{sf:g}")


def ensure_sequences(sf: float, cache_root: str = CACHE_ROOT, use_ray: bool | None = None) -> str:
    """Materialize (once, cached) the sequences table for scale ``sf``.

    Returns the parquet directory path.  Uses Ray Data for generation when a
    Ray session is available (parallel synthesis via map_batches over the
    index range — itself an example of the engine's streaming style),
    otherwise plain pyarrow.
    """
    out_dir = sequences_path(sf, cache_root)
    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n_rows = rows_for_sf(sf)

    if use_ray is None:
        import ray

        use_ray = ray.is_initialized() and n_rows >= 10_000

    if use_ray:
        import ray.data as rd

        def gen(batch: pa.Table) -> pa.Table:
            return _build_batch(batch.column("id").to_numpy())

        (
            rd.range(n_rows)
            .map_batches(gen, batch_format="pyarrow", batch_size=2048)
            .write_parquet(out_dir)
        )
    else:
        # one file per chunk so downstream file-shard resume has >1 shard
        rows_per_file = max(64, n_rows // 16)
        for k, start in enumerate(range(0, n_rows, rows_per_file)):
            tbl = _build_batch(np.arange(start, min(start + rows_per_file, n_rows)))
            pq.write_table(tbl, os.path.join(out_dir, f"part-{k:05d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


# scale factor of the most recent driver-facing ensure_sequences_for_dir
# call — the SQL oracles build their read_parquet glob from this, so the
# twins always read the SAME corpus the engine queries ran on (the driver
# evaluates at sf0.01 today; this keeps the pair in lockstep if it moves)
LAST_DRIVER_SF: list = [0.01]


def ensure_sequences_for_dir(sf_dir: str, cache_root: str = CACHE_ROOT) -> str:
    """Sequences table matching the scale of a /root/testdata/sfX dir."""
    sf = sf_from_dir(sf_dir)
    LAST_DRIVER_SF[0] = sf
    return ensure_sequences(sf, cache_root)
