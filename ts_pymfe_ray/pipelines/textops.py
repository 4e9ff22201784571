"""Training-data operators over the documents/embeddings tables:
deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard /
embedding-cosine), text analysis (language-ID, quality scoring, token
counting, fingerprinting) and the multimodal decode stub plumbing.

Scale shape: every operator is (1) a vectorized/per-batch map computing
compact signatures, (2) a groupby on signature buckets (LSH bands /
simhash segments) so candidate generation shuffles only small signature
rows, (3) an in-group verification.  No stage materializes the corpus.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ts_pymfe_ray.functions.rounding import round_ha

NUM_PERM = 64
BANDS = 16  # 16 bands x 4 rows
ROWS_PER_BAND = NUM_PERM // BANDS

# 31-bit Mersenne prime: products a*x fit exactly in uint64, so the
# MinHash permutation (a*x + b) mod p vectorizes with no overflow.
_MERSENNE = (1 << 31) - 1


def _read_docs(sf_dir: str, columns=None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=columns or ["doc_id", "text"]
    )


def _hash64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingle hashes (deterministic)."""
    words = text.split(" ")
    if len(words) < k:
        return np.array([_hash64(text)], dtype=np.uint64)
    return np.array(
        [_hash64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)],
        dtype=np.uint64,
    )


# deterministic MinHash permutation parameters (a*x + b mod p)
_rng = np.random.Generator(np.random.PCG64(20240817))
_A = _rng.integers(1, _MERSENNE, size=NUM_PERM, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, size=NUM_PERM, dtype=np.uint64)


def minhash_signature(shingle_hashes: np.ndarray) -> np.ndarray:
    """(NUM_PERM,) minhash signature — one vectorized (perm x shingle)
    modmul, exact in uint64 thanks to the 31-bit modulus."""
    x = (shingle_hashes % np.uint64(_MERSENNE)).astype(np.uint64)
    vals = (_A[:, None] * x[None, :] + _B[:, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def band_keys(sig: np.ndarray) -> list[int]:
    """LSH band bucket keys: md5_64 of the band's decimal-joined values
    plus the band index — bit-identical to the DuckDB twin's
    md5_number_lower(array_to_string(band, ',') || '|' || b)."""
    keys = []
    for b in range(BANDS):
        chunk = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
        keys.append(_md5_64(",".join(str(int(v)) for v in chunk) + "|" + str(b)))
    return keys


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = set(a.tolist()), set(b.tolist())
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def q_dedup_minhash(sf_dir: str, threshold: float = 0.6) -> pd.DataFrame:
    """MinHash+LSH near-duplicate pairs: shingle -> minhash -> band ->
    bucket groupby -> verified n-gram Jaccard >= threshold."""
    ds = _read_docs(sf_dir)

    def to_bands(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {"band_key": [], "doc_id": [], "sig": []}
        for i, t in enumerate(texts):
            sh = _md5_shingles(t)  # md5 base hash: SQL twin computes the
            sig = minhash_signature(sh)  # identical signatures
            for key in band_keys(sig):
                rows["band_key"].append(key)
                rows["doc_id"].append(ids[i])
                rows["sig"].append(sig.tobytes())
        return pa.table(
            {
                "band_key": pa.array(rows["band_key"], pa.uint64()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "sig": pa.array(rows["sig"], pa.binary()),
            }
        )

    def candidates(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        sigs = group.column("sig").to_pylist()
        out = {"doc_a": [], "doc_b": [], "est_jaccard": []}
        if len(ids) > 1:
            uniq: dict[int, bytes] = {}
            for i, s in zip(ids, sigs):
                uniq[i] = s
            items = sorted(uniq.items())
            for i in range(len(items)):
                for j in range(i + 1, len(items)):
                    sa = np.frombuffer(items[i][1], dtype=np.uint64)
                    sb = np.frombuffer(items[j][1], dtype=np.uint64)
                    est = float((sa == sb).mean())
                    if est >= threshold:
                        out["doc_a"].append(items[i][0])
                        out["doc_b"].append(items[j][0])
                        out["est_jaccard"].append(round_ha(est))
        return pa.table(
            {
                "doc_a": pa.array(out["doc_a"], pa.int64()),
                "doc_b": pa.array(out["doc_b"], pa.int64()),
                "est_jaccard": pa.array(out["est_jaccard"], pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(to_bands, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(candidates, batch_format="pyarrow")
        .to_pandas()
    )
    pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pairs.reset_index(drop=True)


def simhash64(text: str) -> np.uint64:
    words = text.split(" ")
    if not words:
        return np.uint64(0)
    hashes = np.array([_md5_64(w) for w in words], dtype=np.uint64)
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    score = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for b in np.flatnonzero(score > 0):
        out |= np.uint64(1) << np.uint64(b)
    return out


def q_dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup pairs via 4-segment LSH (any pair within hamming
    distance 3 shares at least one exact 16-bit segment)."""
    ds = _read_docs(sf_dir)

    def to_segments(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        rows = {"seg_key": [], "doc_id": [], "sim": []}
        for i, t in enumerate(texts):
            h = simhash64(t)
            for s in range(4):
                seg = int((h >> np.uint64(16 * s)) & np.uint64(0xFFFF))
                rows["seg_key"].append((seg << 2) | s)
                rows["doc_id"].append(ids[i])
                rows["sim"].append(int(h))
        return pa.table(
            {
                "seg_key": pa.array(rows["seg_key"], pa.int64()),
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "sim": pa.array(rows["sim"], pa.uint64()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id").to_pylist()
        sims = group.column("sim").to_pylist()
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        uniq = sorted(set(zip(ids, sims)))
        for i in range(len(uniq)):
            for j in range(i + 1, len(uniq)):
                if uniq[i][0] == uniq[j][0]:
                    continue
                ham = bin(uniq[i][1] ^ uniq[j][1]).count("1")
                if ham <= max_hamming:
                    out["doc_a"].append(uniq[i][0])
                    out["doc_b"].append(uniq[j][0])
                    out["hamming"].append(ham)
        return pa.table(
            {
                "doc_a": pa.array(out["doc_a"], pa.int64()),
                "doc_b": pa.array(out["doc_b"], pa.int64()),
                "hamming": pa.array(out["hamming"], pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(to_segments, batch_format="pyarrow")
        .groupby("seg_key")
        .map_groups(verify, batch_format="pyarrow")
        .to_pandas()
    )
    if len(pairs):
        pairs = pairs.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pairs.reset_index(drop=True)


def _md5_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct word k-shingle hashes using the low 64 MD5 bits — the same
    hash DuckDB's md5_number_lower computes, so the exact-Jaccard dedup has
    a bit-identical SQL oracle twin."""
    words = text.split(" ")
    if len(words) < k:
        return np.array([_md5_64(text)], dtype=np.uint64)
    hs = {_md5_64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def q_dedup_ngram_jaccard(sf_dir: str, threshold: float = 0.5,
                          df_cap: int | None = None,
                          num_buckets: int = 512) -> pd.DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via a distributed shingle
    inverted index — no driver-side corpus materialization and no
    LSH-recall gap:

    1. map: per doc -> distinct 3-word-shingle hash rows
       ``(bucket, shingle, doc_id, size)`` (size = |shingle set|, carried on
       every row so no sizes table needs broadcasting or joining);
    2. groupby(bucket): vectorized self-merge on shingle inside each hash
       bucket -> one candidate-pair row per shared shingle;
    3. groupby(pair): Count() = |intersection|;  jaccard = i/(sa+sb-i).

    Shuffle volume is shingle rows + shared-shingle pair rows, never text.
    ``df_cap`` (document frequency cap) drops shingles shared by more than
    that many docs inside a bucket — the standard web-scale knob against
    hot-shingle pair blowup (stopword trigrams); None = exact (the
    SQL-oracled mode)."""
    from ray.data.aggregate import Count

    ds = _read_docs(sf_dir)

    def to_shingles(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_b, out_s, out_d, out_n = [], [], [], []
        for i, t in enumerate(texts):
            hs = _md5_shingles(t)
            out_s.append(hs)
            out_b.append((hs % np.uint64(num_buckets)).astype(np.int64))
            out_d.append(np.full(hs.size, ids[i], dtype=np.int64))
            out_n.append(np.full(hs.size, hs.size, dtype=np.int64))
        return pa.table(
            {
                "bucket": pa.array(np.concatenate(out_b), pa.int64()),
                "shingle": pa.array(np.concatenate(out_s), pa.uint64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "size": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if df_cap is not None:
            df = df[df.groupby("shingle")["doc_id"].transform("size") <= df_cap]
        m = df.merge(df, on="shingle")
        m = m[m["doc_id_x"] < m["doc_id_y"]]
        return pd.DataFrame(
            {
                "doc_a": m["doc_id_x"].to_numpy(),
                "doc_b": m["doc_id_y"].to_numpy(),
                "size_a": m["size_x"].to_numpy(),
                "size_b": m["size_y"].to_numpy(),
            }
        )

    inter = (
        ds.map_batches(to_shingles, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b", "size_a", "size_b"])
        .aggregate(Count())
        .to_pandas()
    )
    if inter.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                             "doc_b": pd.Series([], dtype="int64"),
                             "jaccard": pd.Series([], dtype="float64")})
    i = inter["count()"].to_numpy(dtype=np.float64)
    union = inter["size_a"].to_numpy() + inter["size_b"].to_numpy() - i
    inter["jaccard"] = round_ha(i / union)
    out = inter.loc[i / union >= threshold, ["doc_a", "doc_b", "jaccard"]]
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    out["doc_a"] = out["doc_a"].astype("int64")
    out["doc_b"] = out["doc_b"].astype("int64")
    return out


_PLANT_OFFSET = 1_000_000


def q_embeddings_neardup(sf_dir: str, threshold: float = 0.95,
                         plant: int = 0) -> pd.DataFrame:
    """Embedding-cosine near-duplicates via random-hyperplane LSH banding:
    signature map -> bucket groupby -> in-bucket exact cosine verify.

    ``plant`` > 0 injects that many deterministic near-duplicate rows
    (vec_id + 1e6, 1% relative noise, cosine ~0.9999) derived from the
    input inside the stream — the driver data has no pairs above 0.95
    (max true pair cosine at sf0.01 is 0.51), so without planting the
    operator would run but prove nothing."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    if plant:
        def add_planted(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            keep = np.flatnonzero(ids < plant)
            if keep.size == 0:
                return batch
            mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
            dup_ids, dup_vecs = [], []
            for r in keep:
                rng = np.random.Generator(np.random.PCG64(int(ids[r])))
                scale = 0.01 * np.linalg.norm(mat[r]) / np.sqrt(mat.shape[1])
                dup_vecs.append((mat[r] + rng.normal(0.0, scale, mat.shape[1])).astype(np.float32))
                dup_ids.append(int(ids[r]) + _PLANT_OFFSET)
            planted = pa.table(
                {
                    "vec_id": pa.array(dup_ids, batch.schema.field("vec_id").type),
                    "embedding": pa.array([v.tolist() for v in dup_vecs],
                                          batch.schema.field("embedding").type),
                }
            )
            return pa.concat_tables([batch, planted])

        ds = ds.map_batches(add_planted, batch_format="pyarrow")
    probe = next(iter(ds.limit(1).iter_batches(batch_format="pyarrow")))
    dim = len(probe.column("embedding").to_pylist()[0])
    rng = np.random.Generator(np.random.PCG64(7))
    planes = rng.normal(size=(16, dim))  # 16-bit signatures, 4 segments

    def to_buckets(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        signs = (mat @ planes.T) > 0
        sig = (signs.astype(np.uint32) << np.arange(16, dtype=np.uint32)).sum(axis=1)
        rows = {"bucket": [], "vec_id": [], "emb": []}
        for s in range(4):
            seg = (sig >> (4 * s)) & 0xF
            for i in range(len(ids)):
                rows["bucket"].append(int((int(seg[i]) << 3) | s))
                rows["vec_id"].append(int(ids[i]))
                rows["emb"].append(mat[i].tobytes())
        return pa.table(
            {
                "bucket": pa.array(rows["bucket"], pa.int64()),
                "vec_id": pa.array(rows["vec_id"], pa.int64()),
                "emb": pa.array(rows["emb"], pa.binary()),
            }
        )

    def verify(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        embs = group.column("emb").to_pylist()
        uniq: dict[int, bytes] = dict(zip(ids, embs))
        items = sorted(uniq.items())
        out = {"vec_a": [], "vec_b": [], "cosine": []}
        if len(items) > 1:
            mat = np.stack([np.frombuffer(b, dtype=np.float64) for _, b in items])
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            matn = mat / norms[:, None]
            sims = matn @ matn.T
            ii, jj = np.triu_indices(len(items), k=1)
            keep = sims[ii, jj] >= threshold
            for a, b, s in zip(ii[keep], jj[keep], sims[ii, jj][keep]):
                out["vec_a"].append(items[a][0])
                out["vec_b"].append(items[b][0])
                out["cosine"].append(round_ha(float(s)))
        return pa.table(
            {
                "vec_a": pa.array(out["vec_a"], pa.int64()),
                "vec_b": pa.array(out["vec_b"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    pairs = (
        ds.map_batches(to_buckets, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pyarrow")
        .to_pandas()
    )
    if len(pairs):
        pairs = pairs.drop_duplicates(["vec_a", "vec_b"]).sort_values(["vec_a", "vec_b"])
    return pairs.reset_index(drop=True)


# ------------------------------------------------------------- text analysis

from ts_pymfe_ray.functions.langprofiles import (
    ASCII_MIN, CJK_MIN, PROFILE_ORDER, PROFILES, SCORE_MIN, SHORT_DOC_WORDS,
)

# the text-quality stopword signal uses the English profile
_STOPWORDS = PROFILES["en"]


def text_quality_features(texts: list[str]) -> pd.DataFrame:
    n_words, n_chars, stop_ratio, punct_ratio, mean_wlen = [], [], [], [], []
    for t in texts:
        words = t.split(" ")
        n_words.append(len(words))
        n_chars.append(len(t))
        stop_ratio.append(sum(w in _STOPWORDS for w in words) / max(1, len(words)))
        punct_ratio.append(sum(ch in ".,;:!?" for ch in t) / max(1, len(t)))
        mean_wlen.append(np.mean([len(w) for w in words]) if words else 0.0)
    return pd.DataFrame(
        {
            "n_words": np.array(n_words, dtype=np.int64),
            "n_chars": np.array(n_chars, dtype=np.int64),
            "stopword_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "mean_word_len": mean_wlen,
        }
    )


def q_text_quality(sf_dir: str) -> pd.DataFrame:
    """Per-source quality scoring rollup (length / punctuation / stopword
    signals), partial-aggregated per batch."""
    ds = _read_docs(sf_dir, ["source", "text"])

    def combiner(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        q = text_quality_features(batch.column("text").to_pylist())
        q["source"] = src
        g = q.groupby("source").agg(
            n_docs=("n_words", "size"),
            sum_words=("n_words", "sum"),
            sum_stop=("stopword_ratio", "sum"),
            sum_wlen=("mean_word_len", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(combiner, batch_format="pyarrow").to_pandas()
    g = partials.groupby("source").agg(
        n_docs=("n_docs", "sum"), sum_words=("sum_words", "sum"),
        sum_stop=("sum_stop", "sum"), sum_wlen=("sum_wlen", "sum"),
    ).reset_index()
    g["avg_words"] = round_ha((g["sum_words"] / g["n_docs"]).to_numpy())
    g["avg_stopword_ratio"] = round_ha((g["sum_stop"] / g["n_docs"]).to_numpy())
    g["avg_word_len"] = round_ha((g["sum_wlen"] / g["n_docs"]).to_numpy())
    g["n_docs"] = g["n_docs"].astype("int64")
    g["sum_words"] = g["sum_words"].astype("int64")
    # SQL-oracled subset: the stopword/word-length signals have no clean
    # ANSI-SQL twin and live in q_text_quality_full (rows-only).
    out = g[["source", "n_docs", "sum_words", "avg_words"]]
    return out.sort_values("source").reset_index(drop=True)


def q_text_quality_full(sf_dir: str) -> pd.DataFrame:
    """Rows-only: full quality-signal rollup including stopword ratio and
    mean word length."""
    ds = _read_docs(sf_dir, ["source", "text"])

    def combiner(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        q = text_quality_features(batch.column("text").to_pylist())
        q["source"] = src
        g = q.groupby("source").agg(
            n_docs=("n_words", "size"),
            sum_words=("n_words", "sum"),
            sum_stop=("stopword_ratio", "sum"),
            sum_punct=("punct_ratio", "sum"),
            sum_wlen=("mean_word_len", "sum"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(combiner, batch_format="pyarrow").to_pandas()
    g = partials.groupby("source").agg(
        n_docs=("n_docs", "sum"), sum_words=("sum_words", "sum"),
        sum_stop=("sum_stop", "sum"), sum_punct=("sum_punct", "sum"),
        sum_wlen=("sum_wlen", "sum"),
    ).reset_index()
    g["avg_words"] = round_ha((g["sum_words"] / g["n_docs"]).to_numpy())
    g["avg_stopword_ratio"] = round_ha((g["sum_stop"] / g["n_docs"]).to_numpy())
    g["avg_punct_ratio"] = round_ha((g["sum_punct"] / g["n_docs"]).to_numpy())
    g["avg_word_len"] = round_ha((g["sum_wlen"] / g["n_docs"]).to_numpy())
    g["n_docs"] = g["n_docs"].astype("int64")
    out = g[["source", "n_docs", "avg_words", "avg_stopword_ratio", "avg_punct_ratio", "avg_word_len"]]
    return out.sort_values("source").reset_index(drop=True)


def detect_lang(text: str) -> str:
    """Multi-profile stopword language-ID heuristic (en/es/de/fr via
    stopword-hit ratios, zh via CJK codepoint ratio, else unknown).

    Precedence is deterministic and mirrored exactly by the DuckDB oracle
    twin: non-ascii docs are 'zh' if the CJK ratio clears CJK_MIN else
    'unknown'; ascii docs take the FIRST profile (PROFILE_ORDER) whose hit
    ratio is maximal and clears SCORE_MIN; short ascii docs fall back to
    'en'."""
    words = text.lower().split(" ")
    if not words:
        return "unknown"
    ascii_ratio = sum(c.isascii() for c in text) / max(1, len(text))
    if ascii_ratio <= ASCII_MIN:
        cjk = sum("一" <= c <= "鿿" for c in text) / max(1, len(text))
        return "zh" if cjk > CJK_MIN else "unknown"
    scores = [(name, sum(w in PROFILES[name] for w in words) / len(words))
              for name in PROFILE_ORDER]
    best_name, best = max(scores, key=lambda kv: kv[1])  # ties: first wins
    if best > SCORE_MIN:
        return best_name
    if len(words) < SHORT_DOC_WORDS:
        return "en"
    return "unknown"


def q_lang_id(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir, ["doc_id", "text", "lang"])

    def combiner(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = batch.column("lang").to_pylist()
        pred = [detect_lang(t) for t in texts]
        df = pd.DataFrame({"lang": langs, "pred_lang": pred})
        g = df.groupby(["lang", "pred_lang"]).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(combiner, batch_format="pyarrow").to_pandas()
    g = partials.groupby(["lang", "pred_lang"])["n"].sum().reset_index(name="n_docs")
    g["n_docs"] = g["n_docs"].astype("int64")
    return g.sort_values(["lang", "pred_lang"]).reset_index(drop=True)


def _md5_64(s: str) -> int:
    """Low 64 bits of MD5 (digest bytes 8..16, little-endian) — bit-identical
    to DuckDB's md5_number_lower(), so fingerprints are SQL-oracle-checkable
    (doc_fingerprints has an exact DuckDB twin)."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Rabin-Karp-style rolling-hash document fingerprint: min hash over
    rolling word windows (winnowing-lite)."""
    words = text.split(" ")
    if len(words) <= window:
        return _md5_64(text)
    hs = [_md5_64(" ".join(words[i : i + window])) for i in range(len(words) - window + 1)]
    return min(hs)


def q_doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir, ["source", "text"])

    def combiner(batch: pa.Table) -> pa.Table:
        src = batch.column("source").to_pylist()
        fps = [rolling_fingerprint(t) for t in batch.column("text").to_pylist()]
        return pa.table({"source": src, "fp": pa.array(fps, pa.uint64())})

    fps = ds.map_batches(combiner, batch_format="pyarrow").to_pandas()
    g = fps.groupby("source")["fp"].agg(n_docs="size", uniq_fingerprints="nunique").reset_index()
    g["n_docs"] = g["n_docs"].astype("int64")
    g["uniq_fingerprints"] = g["uniq_fingerprints"].astype("int64")
    return g.sort_values("source").reset_index(drop=True)


# ------------------------------------------------------------ ANN: IVF path


def _kmeans_lite(sample: np.ndarray, k: int = 16, iters: int = 10, seed: int = 11) -> np.ndarray:
    """Seeded Lloyd's k-means on a driver-side sample — builds the IVF
    coarse quantizer (centroids are broadcast to every map task)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    centroids = sample[rng.choice(sample.shape[0], size=min(k, sample.shape[0]), replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(centroids.shape[0]):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


_IVF_CACHE_ROOT = "/tmp/ts_pymfe_ray_ivf"


def build_ivf_index(sf_dir: str, n_cells: int = 16,
                    sample_rows: int = 2048) -> tuple[str, np.ndarray]:
    """One-off IVF layout build (cached per (input, n_cells)): train the
    coarse quantizer on a ``ds.limit`` sample (bounded driver pull), assign
    every vector to its nearest centroid via map_batches, and write a
    hive-partitioned parquet layout ``cell=K/``.  Queries then read ONLY
    the probed partitions — at 10^9+ vectors the scan touches
    n_probe/n_cells of the corpus and nothing else leaves storage.

    Returns (index_dir, centroids)."""
    src = os.path.join(sf_dir, "embeddings.parquet")
    # cache key covers the input's identity AND content generation
    # (mtime+size — a regenerated file at the same path invalidates the
    # layout), every build parameter, and a layout-version suffix bumped
    # when the quantizer/assignment code changes
    st = os.stat(src)
    tag = hashlib.blake2b(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}|{n_cells}|{sample_rows}|ivf-v2".encode(),
        digest_size=8,
    ).hexdigest()
    out_dir = os.path.join(_IVF_CACHE_ROOT, tag)
    cpath = os.path.join(out_dir, "_centroids.npy")
    if os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir, np.load(cpath)

    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    sample = ds.limit(sample_rows).to_pandas()
    mat_sample = np.asarray(sample["embedding"].to_list(), dtype=np.float64)
    centroids = _kmeans_lite(mat_sample, k=n_cells)

    def assign(batch: pa.Table) -> pa.Table:
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        return batch.append_column("cell", pa.array(d.argmin(axis=1), pa.int32()))

    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["cell"]
    )
    np.save(cpath, centroids)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("ok")
    return out_dir, centroids


def q_embeddings_ann_ivf(sf_dir: str, k: int = 5, query_vec_id: int = 0,
                         n_cells: int = 16, n_probe: int = 4) -> pd.DataFrame:
    """IVF approximate top-k — the SCALE path for similarity search: probe
    the ``n_probe`` cells nearest the query and scan only those hive
    partitions of the prebuilt cell layout (build_ivf_index).  The query
    vector itself comes from a pushdown-filtered read, never a full-table
    pull."""
    index_dir, centroids = build_ivf_index(sf_dir, n_cells=n_cells)

    import pyarrow.compute as pc

    qtbl = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"],
        filter=pc.field("vec_id") == query_vec_id,
    ).to_pandas()
    q = np.asarray(qtbl["embedding"].iloc[0], dtype=np.float64)
    qn = q / np.linalg.norm(q)
    probe = np.argsort(((centroids - q) ** 2).sum(axis=1))[:n_probe]

    # partition pruning by construction: only the probed cell=K/ dirs are
    # passed to the read — nothing else leaves storage
    import glob as _glob

    paths = [f for c in probe
             for f in sorted(_glob.glob(os.path.join(index_dir, f"cell={int(c)}", "*.parquet")))]
    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        mat = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        sims = (mat @ qn) / norms
        top = np.argsort(-sims)[:k]
        return pa.table({"vec_id": pa.array(ids[top], pa.int64()),
                         "cosine": pa.array(round_ha(sims[top]), pa.float64())})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = partials.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
    out["vec_id"] = out["vec_id"].astype("int64")
    return out.reset_index(drop=True)
