"""Sequences-table source: pruned parquet reads + file-shard listing."""

from __future__ import annotations

import glob
import os

import ray.data

SEQ_COLUMNS = ["doc_id", "tokens", "n_tok", "source"]


def list_parquet_files(input_dir: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(input_dir, "**", "*.parquet"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    return files


def shard_files(files: list[str], num_shards: int) -> list[list[str]]:
    num_shards = min(num_shards, len(files))
    return [files[i::num_shards] for i in range(num_shards)]


def read_sequences(paths: str | list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned read (SURVEY.md 'prune at the read'): only the columns
    a stage needs leave storage."""
    return ray.data.read_parquet(paths, columns=columns or SEQ_COLUMNS)
