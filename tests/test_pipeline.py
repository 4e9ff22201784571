"""End-to-end pipeline tests over a tiny deterministic sequences table:
rollup ladder correctness, token round-trip, resume, cross-series rollup."""

import os

import numpy as np
import pyarrow.dataset as pads
import pytest

from ts_pymfe_ray.functions import gorilla, sketch as sk
from ts_pymfe_ray.functions.gapfill import gap_fill
from ts_pymfe_ray.pipelines import flagship
from ts_pymfe_ray.stages.rollup import RAW_BUCKET, decode_tier_row
from ts_pymfe_ray.state import manifest as mf


@pytest.fixture(scope="module")
def rollup_out(ray_session, seq_dir_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tiers"))
    res = flagship.run_rollup(seq_dir_small, out, num_shards=4)
    return out, res


def _load_rows(out_dir, **filt):
    ds = pads.dataset(out_dir, format="parquet", partitioning="hive",
                      ignore_prefixes=[".", "_", "manifest"])
    tbl = ds.to_table()
    rows = tbl.to_pylist()
    for k, v in filt.items():
        rows = [r for r in rows if r[k] == v]
    return rows


def test_rollup_completes_and_has_three_tiers(rollup_out):
    out, res = rollup_out
    assert res["committed"] == res["num_shards"]
    rows = _load_rows(out)
    tiers = {r["tier"] for r in rows}
    assert tiers == {"raw", "10x", "100x"}
    docs = {r["doc_id"] for r in rows}
    assert len(rows) == 3 * len({(r["doc_id"], r["chunk_id"]) for r in rows})
    assert len(docs) >= 400


def test_raw_tier_token_roundtrip_bitwise(rollup_out, seq_dir_small):
    """BASELINE.json invariant: decode(tokens_dod) == original tokens."""
    out, _ = rollup_out
    src = pads.dataset(seq_dir_small, format="parquet").to_table(
        columns=["doc_id", "tokens"]
    )
    originals = dict(zip(src.column("doc_id").to_pylist(), src.column("tokens").to_pylist()))
    rows = _load_rows(out, tier="raw")
    assert rows
    for r in rows[:200]:
        dec = gorilla.decode_ints_dod(r["tokens_dod"])
        orig = np.asarray(originals[r["doc_id"]], dtype=np.int64)
        assert np.array_equal(dec, orig), r["doc_id"]


def test_tier_ladder_matches_direct_computation(rollup_out, seq_dir_small):
    """Tier streams decoded from parquet == sketches computed directly on
    the gap-filled series (FIXTURES.md §3.2 at the pipeline level)."""
    out, _ = rollup_out
    src = pads.dataset(seq_dir_small, format="parquet").to_table(
        columns=["doc_id", "tokens"]
    )
    originals = dict(zip(src.column("doc_id").to_pylist(), src.column("tokens").to_pylist()))
    for tier, factor in (("raw", 1), ("10x", 10), ("100x", 100)):
        rows = _load_rows(out, tier=tier)[:50]
        assert rows
        for r in rows:
            x = gap_fill(np.asarray(originals[r["doc_id"]], dtype=np.int32))
            direct = sk.derive_features(sk.compute_window_sketches(x, RAW_BUCKET * factor))
            dec = decode_tier_row(r)
            for stream in ("mean", "var", "acf1", "count"):
                np.testing.assert_allclose(
                    dec[stream], direct[stream], rtol=1e-9, equal_nan=True
                )
            assert dec["window_id"].tolist() == list(range(len(dec["mean"])))


def test_resume_skips_committed_and_fingerprint_stable(
    ray_session, seq_dir_small, tmp_path_factory
):
    """Kill after k shards -> resume -> manifest fingerprint identical to a
    straight run (FIXTURES.md §3.4)."""
    out_a = str(tmp_path_factory.mktemp("resume_a"))
    out_b = str(tmp_path_factory.mktemp("resume_b"))
    full = flagship.run_rollup(seq_dir_small, out_a, num_shards=4)
    partial = flagship.run_rollup(seq_dir_small, out_b, num_shards=4, max_shards=2)
    assert partial["committed"] == 2
    resumed = flagship.run_rollup(seq_dir_small, out_b, num_shards=4)
    assert resumed["committed"] == 4
    assert resumed["fingerprint"] == full["fingerprint"]
    # manifests carry lineage + metrics
    rec = mf.load_committed(out_b)[0]
    for key in ("input_files", "lineage_hash", "rows", "tokens", "wall_ms"):
        assert key in rec


def test_hot_key_splitting_exact(ray_session, seq_dir_small, tmp_path_factory):
    """Forcing a tiny chunk threshold splits long rows; sketches must stay
    exact per chunk and cover the full series."""
    out = str(tmp_path_factory.mktemp("tiers_split"))
    flagship.run_rollup(seq_dir_small, out, num_shards=2, max_chunk_tokens=6400)
    rows = _load_rows(out, tier="raw")
    split_docs = {}
    for r in rows:
        split_docs.setdefault(r["doc_id"], []).append(r)
    multi = {d: rs for d, rs in split_docs.items() if len(rs) > 1}
    assert multi, "expected at least one split doc"
    doc, rs = next(iter(multi.items()))
    rs.sort(key=lambda r: r["chunk_id"])
    # chunks tile the series without overlap
    total = sum(r["n_tok"] for r in rs)
    toks = np.concatenate([gorilla.decode_ints_dod(r["tokens_dod"]) for r in rs])
    assert toks.size == total
    # window ids are globally consistent
    wids = np.concatenate([decode_tier_row(r)["window_id"] for r in rs])
    assert wids.tolist() == list(range(len(wids)))


def test_features_pipeline(ray_session, seq_dir_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("feat"))
    res = flagship.run_features(
        seq_dir_small, out, groups=("general", "global_stats"), max_cost="medium",
        num_shards=2,
    )
    ds = pads.dataset(out, format="parquet", ignore_prefixes=[".", "_", "manifest"]).to_table()
    assert ds.num_rows >= 400
    names = ds.column_names
    assert "trend_strenght" in names and "length" in names
    ts_col = ds.column("trend_strenght").to_numpy()
    ok = np.isfinite(ts_col)
    assert ok.mean() > 0.95
    assert np.all((ts_col[ok] >= 0) & (ts_col[ok] <= 1))


def test_rollup_by_source(ray_session, seq_dir_small):
    res = flagship.rollup_by_source(seq_dir_small, tiers=("100x",)).to_pandas()
    assert set(res["source"]) <= {"web", "code", "books", "chat"}
    assert (res["tier"] == "100x").all()
    # window 0 aggregates every doc of the source
    w0 = res[res["window_id"] == 0]
    assert (w0["n"] > 0).all()


def test_retention_prunes_tier_dirs(ray_session, seq_dir_small, tmp_path_factory):
    """North-rule retention: age out the raw tier by directory delete;
    coarser tiers stay decodable; resume does not resurrect raw."""
    from ts_pymfe_ray.state import retention

    out = str(tmp_path_factory.mktemp("tiers_ret"))
    flagship.run_rollup(seq_dir_small, out, num_shards=3)
    tiers_before = retention.list_tiers(out)
    assert set(tiers_before) == {"raw", "10x", "100x"}

    removed = retention.apply_retention(out, drop_tiers=("raw",))
    assert removed["raw"] == tiers_before["raw"]
    assert set(retention.list_tiers(out)) == {"10x", "100x"}

    # coarser tiers still decodable
    tbl = retention.read_tiers(out, tier="10x")
    assert tbl.num_rows > 0
    row = tbl.to_pylist()[0]
    dec = decode_tier_row(row)
    assert dec["mean"].size == row["n_windows"]

    # resume must NOT recompute committed shards (raw stays pruned)
    res = flagship.run_rollup(seq_dir_small, out, num_shards=3)
    assert res["committed"] == 3
    assert set(retention.list_tiers(out)) == {"10x", "100x"}

    # audit record landed in the manifest
    import json

    with open(f"{out}/manifest.jsonl") as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert any(r.get("type") == "retention" for r in recs)


def test_true_sigkill_resume(ray_session, seq_dir_small, tmp_path_factory):
    """Hard-kill (SIGKILL) a rollup subprocess mid-job, then resume in a
    fresh process: final manifest fingerprint must equal a straight run's."""
    import json
    import subprocess
    import sys
    import time as _t

    out = str(tmp_path_factory.mktemp("tiers_kill"))
    code = f"""
import ray, logging
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
logging.getLogger("ray.data").setLevel(logging.ERROR)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from ts_pymfe_ray.pipelines import flagship
flagship.run_rollup({seq_dir_small!r}, {out!r}, num_shards=4)
"""
    proc = subprocess.Popen([sys.executable, "-c", code], cwd="/root/repo",
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # wait for the first shard commit, then SIGKILL the whole job
    manifest = os.path.join(out, "manifest.jsonl")
    for _ in range(600):
        if os.path.exists(manifest) and os.path.getsize(manifest) > 0:
            break
        _t.sleep(0.1)
    proc.kill()
    proc.wait()
    # FENCE: the killed driver's raylet keeps its in-flight write tasks
    # alive for a moment; wait for them to be reaped so zombie writers
    # cannot race the resumed run's recompute of uncommitted shards
    # (production guidance: SCALE.md §5 — fence the previous attempt).
    _t.sleep(5)
    committed_after_kill = sum(1 for l in open(manifest) if l.strip()) if os.path.exists(manifest) else 0
    assert committed_after_kill >= 1

    # resume in-process (fresh logical run)
    res = flagship.run_rollup(seq_dir_small, out, num_shards=4)
    assert res["committed"] == 4

    straight = str(tmp_path_factory.mktemp("tiers_straight"))
    ref = flagship.run_rollup(seq_dir_small, straight, num_shards=4)
    assert res["fingerprint"] == ref["fingerprint"]


def test_rollup_with_compressor_actor_pool(ray_session, seq_dir_small, tmp_path_factory):
    """Actor-pool variant of the compressor stage produces identical output
    (fingerprint) to the stateless-task variant."""
    out_t = str(tmp_path_factory.mktemp("tiers_tasks"))
    out_a = str(tmp_path_factory.mktemp("tiers_actors"))
    r1 = flagship.run_rollup(seq_dir_small, out_t, num_shards=2)
    r2 = flagship.run_rollup(seq_dir_small, out_a, num_shards=2, compressor_actors=2)
    assert r1["fingerprint"] == r2["fingerprint"]


def test_tier_analytics_from_compressed_streams(ray_session, seq_dir_small, tmp_path_factory):
    """Consumption side of the ladder: per-source diagnostics computed
    purely from compressed 10x tier rows — works even after the raw tier
    has been aged out."""
    from ts_pymfe_ray.pipelines.tier_analytics import tier_diagnostics
    from ts_pymfe_ray.state import retention

    out = str(tmp_path_factory.mktemp("tiers_analytics"))
    flagship.run_rollup(seq_dir_small, out, num_shards=2)
    retention.apply_retention(out, drop_tiers=("raw",))  # tokens are gone
    df = tier_diagnostics(out, tier="10x")
    assert df["n_docs"].sum() >= 400
    assert (df["avg_window_acf1"].abs() <= 1.0).all()
    # NaN allowed for sources whose docs are all too short for volatility
    # (nw <= 2); the bulk sources must produce finite diagnostics
    assert df["avg_sd_volatility"].notna().sum() >= 3


def test_source_rollup_consistent_under_splitting(ray_session, seq_dir_small):
    """Cross-series rollup must be invariant to hot-key splitting: chunk
    rows contribute their windows at GLOBAL positions."""
    import pandas as pd

    from ts_pymfe_ray.sources.sequences import read_sequences
    from ts_pymfe_ray.stages.rollup import split_long_rows
    from ts_pymfe_ray.pipelines.flagship import _partial_sketches

    def run(max_chunk):
        ds = read_sequences(seq_dir_small)
        ds = ds.map_batches(split_long_rows, batch_format="pyarrow",
                            fn_kwargs={"max_chunk_tokens": max_chunk})
        ds = ds.map_batches(_partial_sketches, batch_format="pyarrow",
                            fn_kwargs={"tiers": ("100x",)})
        df = (ds.groupby(["source", "tier", "window_id"])
                .sum(["n", "s1", "s2"]).to_pandas())
        return df.sort_values(["source", "window_id"]).reset_index(drop=True)

    whole = run(1_048_576)
    split = run(6400)  # force splitting of every row > 6400 tokens
    pd.testing.assert_frame_equal(whole, split, check_exact=False, rtol=1e-9)


def test_fast_features_match_full_kernels(ray_session, seq_dir_small, tmp_path_factory):
    """Sketch-derived fast features equal the registry kernels' values on
    the same (uncapped) series."""
    import pandas as pd

    from ts_pymfe_ray.stages.fast_features import run_fast_features

    df = run_fast_features(seq_dir_small).to_pandas().set_index("doc_id")
    src = pads.dataset(seq_dir_small, format="parquet").to_table(columns=["doc_id", "tokens"])
    originals = dict(zip(src.column("doc_id").to_pylist(), src.column("tokens").to_pylist()))
    from ts_pymfe_ray.functions.stats import skewness, kurtosis

    for doc_id in list(df.index)[:40]:
        x = gap_fill(np.asarray(originals[doc_id], dtype=np.int32))
        row = df.loc[doc_id]
        assert row["length"] == x.size
        assert row["mean"] == pytest.approx(x.mean(), rel=1e-12)
        assert row["var"] == pytest.approx(x.var(ddof=1), rel=1e-9)
        assert row["skewness"] == pytest.approx(skewness(x), abs=1e-9)
        assert row["kurtosis"] == pytest.approx(kurtosis(x), abs=1e-8)
        d = np.diff(x)
        assert row["diff_sd"] == pytest.approx(d.std(ddof=1), rel=1e-9)
        mu = x.mean()
        acf1 = ((x[:-1] - mu) * (x[1:] - mu)).sum() / ((x - mu) ** 2).sum()
        assert row["acf1"] == pytest.approx(acf1, abs=1e-9)


def test_token_histogram_quantiles(ray_session, seq_dir_small):
    """Mergeable histogram rollup: quantile estimates within one bin width
    of exact quantiles computed directly."""
    from ts_pymfe_ray.pipelines.flagship import token_histogram_by_source

    df = token_histogram_by_source(seq_dir_small).set_index("source")
    src = pads.dataset(seq_dir_small, format="parquet").to_table(columns=["source", "tokens"])
    by_src: dict[str, list] = {}
    for s, toks in zip(src.column("source").to_pylist(), src.column("tokens").to_pylist()):
        by_src.setdefault(s, []).extend(t for t in toks if t >= 0)
    width = 65536 / 256
    for s, vals in by_src.items():
        vals = np.asarray(vals)
        assert df.loc[s, "n_tokens"] == vals.size
        for q, col in ((0.5, "q50_est"), (0.95, "q95_est")):
            exact = np.quantile(vals, q)
            assert abs(df.loc[s, col] - exact) <= width + 1, (s, col)


def test_resume_recomputes_when_input_files_change(ray_session, seq_dir_small, tmp_path_factory):
    """Appending input files changes shard composition; affected committed
    shards must recompute rather than silently serve stale output."""
    import shutil

    import pyarrow.parquet as pq

    src_dir = str(tmp_path_factory.mktemp("seq_grow"))
    files = sorted(os.listdir(seq_dir_small))
    pq_files = [f for f in files if f.endswith(".parquet")]
    for f in pq_files[:-1]:
        shutil.copy(os.path.join(seq_dir_small, f), os.path.join(src_dir, f))

    out = str(tmp_path_factory.mktemp("tiers_grow"))
    r1 = flagship.run_rollup(src_dir, out, num_shards=2)
    rows_before = len(_load_rows(out))

    # append the held-out file — shard composition changes
    shutil.copy(os.path.join(seq_dir_small, pq_files[-1]), os.path.join(src_dir, pq_files[-1]))
    r2 = flagship.run_rollup(src_dir, out, num_shards=2)
    rows_after = len(_load_rows(out))
    assert rows_after > rows_before
    assert r2["fingerprint"] != r1["fingerprint"]
    # and the result equals a from-scratch run over the grown input
    fresh = str(tmp_path_factory.mktemp("tiers_grow_fresh"))
    r3 = flagship.run_rollup(src_dir, fresh, num_shards=2)
    assert r2["fingerprint"] == r3["fingerprint"]


def test_attempt_lock_blocks_concurrent_writers(ray_session, seq_dir_small, tmp_path_factory):
    """Two drivers must not double-write one output dir; a dead owner's
    lock is stolen."""
    from ts_pymfe_ray.state.manifest import AttemptLock

    out = str(tmp_path_factory.mktemp("tiers_lock"))
    with AttemptLock(out):
        with pytest.raises(RuntimeError, match="locked by a live run"):
            flagship.run_rollup(seq_dir_small, out, num_shards=2)
    # lock released -> run proceeds
    res = flagship.run_rollup(seq_dir_small, out, num_shards=2)
    assert res["committed"] == 2
    # stale lock (dead pid) is stolen transparently
    import json as _json

    with open(os.path.join(out, ".attempt_lock"), "w") as f:
        f.write(_json.dumps({"pid": 999999999}))
    res2 = flagship.run_rollup(seq_dir_small, out, num_shards=2)
    assert res2["committed"] == 2


def test_explode_tier_relational_view(ray_session, seq_dir_small, tmp_path_factory):
    """explode_tier turns compressed blobs into per-window rows equal to
    direct computation."""
    from ts_pymfe_ray.pipelines.tier_analytics import explode_tier

    out = str(tmp_path_factory.mktemp("tiers_explode"))
    flagship.run_rollup(seq_dir_small, out, num_shards=2)
    df = explode_tier(out, tier="10x").to_pandas()
    src = pads.dataset(seq_dir_small, format="parquet").to_table(columns=["doc_id", "tokens"])
    originals = dict(zip(src.column("doc_id").to_pylist(), src.column("tokens").to_pylist()))
    one = df[df["doc_id"] == df["doc_id"].iloc[0]].sort_values("window_id")
    x = gap_fill(np.asarray(originals[one["doc_id"].iloc[0]], dtype=np.int32))
    direct = sk.derive_features(sk.compute_window_sketches(x, RAW_BUCKET * 10))
    np.testing.assert_allclose(one["win_mean"].to_numpy(), direct["mean"], rtol=1e-9)
    np.testing.assert_allclose(one["win_var"].to_numpy(), direct["var"], rtol=1e-9, equal_nan=True)
    assert one["window_id"].tolist() == list(range(len(one)))


def test_comp_engine_csv_ingest_end_to_end(ray_session, tmp_path):
    """The reference's own corpus CSV ingests into the sequences schema and
    flows through the tier rollup + fast features unchanged."""
    from ts_pymfe_ray.sources.comp_engine import ingest_comp_engine_csv
    from ts_pymfe_ray.stages.fast_features import run_fast_features

    seq_dir = ingest_comp_engine_csv(
        "/root/reference/data/comp-engine-export-sample.20200503.csv",
        str(tmp_path / "ce_seq"), max_obs=512,
    )
    out = str(tmp_path / "ce_tiers")
    res = flagship.run_rollup(seq_dir, out, num_shards=2)
    assert res["committed"] == 2
    df = run_fast_features(seq_dir).to_pandas()
    assert len(df) == 20  # the corpus has 20 series
    assert (df["source"] == "comp-engine").all()
    assert df["length"].between(1, 512).all()
    assert np.isfinite(df["mean"]).all()


def test_sessionize_carry_matches_per_user(ray_session):
    """The boundary-carry sessionize (time-range partitions, carry-row
    merge) must reproduce whole-user-per-task output exactly — including
    with a 1-hour span that forces many cross-boundary session stitches."""
    from ts_pymfe_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.01"
    base = q.q_events_sessionize(sf)
    assert base.equals(q.q_events_sessionize_carry(sf))
    assert base.equals(q.q_events_sessionize_carry(sf, span_hours=1))


def test_asof_carry_matches_per_user(ray_session):
    from ts_pymfe_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.01"
    base = q.q_events_asof_purchase(sf)
    assert base.equals(q.q_events_asof_purchase_carry(sf))
    assert base.equals(q.q_events_asof_purchase_carry(sf, span_hours=1))


def test_disc_quantiles_match_duckdb_semantics():
    """_disc_quantiles implements DuckDB quantile_disc's element-at-
    ceil(q*n)-1 convention; lock it against DuckDB itself on adversarial
    integer multisets (heavy ties, n=1, duplicate-only, skewed counts)."""
    import duckdb
    import pandas as pd
    import numpy as np

    from ts_pymfe_ray.pipelines.queries import _disc_quantiles

    rng = np.random.default_rng(7)
    qs = (0.25, 0.5, 0.75, 0.9)
    cases = [
        np.array([5]),
        np.array([3, 3, 3, 3]),
        rng.integers(0, 10, 37),          # heavy ties
        rng.integers(0, 100_000, 256),    # near-distinct
        np.repeat([1, 2], [99, 1]),       # extreme skew
    ]
    for i, vals in enumerate(cases):
        u, c = np.unique(vals, return_counts=True)
        hist = pd.DataFrame({"source": f"s{i}", "n_chars": u, "c": c})
        got = _disc_quantiles(hist, qs).iloc[0]
        exp = duckdb.sql(
            "SELECT " + ", ".join(
                f"quantile_disc(x, {q}) AS p{int(q * 100)}" for q in qs
            ) + " FROM (SELECT unnest($vals) AS x)",
            params={"vals": [int(v) for v in vals]},
        ).fetchone()
        for (q, e) in zip(qs, exp):
            assert got[f"p{int(q * 100)}"] == e, (i, q, got, exp)


def test_hash_sampling_deterministic_and_unbiased(ray_session):
    """The md5 sampling coin is stable across runs (same kept set) and its
    keep-rate lands near the target for a uniform id population."""
    import numpy as np

    from ts_pymfe_ray.pipelines.queries import _md5_mod100, q_documents_sample_hash

    ids = np.arange(10_000, dtype=np.int64)
    coin = _md5_mod100(ids)
    assert np.array_equal(coin, _md5_mod100(ids))
    rate = float((coin < 25).mean())
    assert 0.22 < rate < 0.28
    a = q_documents_sample_hash("/root/testdata/sf0.001")
    b = q_documents_sample_hash("/root/testdata/sf0.001")
    assert a.equals(b)


def test_disc_quantiles_property_vs_duckdb():
    """Property check: for arbitrary small integer multisets and quantile
    levels, _disc_quantiles matches DuckDB quantile_disc exactly."""
    import duckdb
    import numpy as np
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ts_pymfe_ray.pipelines.queries import _disc_quantiles

    @settings(max_examples=60, deadline=None)
    @given(
        vals=st.lists(st.integers(min_value=-1000, max_value=1000),
                      min_size=1, max_size=60),
        q=st.sampled_from([0.01, 0.1, 0.25, 0.33, 0.5, 0.66, 0.75, 0.9, 0.99]),
    )
    def check(vals, q):
        u, c = np.unique(np.asarray(vals), return_counts=True)
        hist = pd.DataFrame({"source": "s", "n_chars": u, "c": c})
        got = int(_disc_quantiles(hist, (q,)).iloc[0][f"p{int(q * 100)}"])
        exp = duckdb.sql(
            f"SELECT quantile_disc(x, {q}) FROM (SELECT unnest($v) AS x)",
            params={"v": [int(v) for v in vals]},
        ).fetchone()[0]
        assert got == exp, (vals, q, got, exp)

    check()


def _write_events(path, n_per_user, seed=5, days=30):
    """Deterministic synthetic events table (user_id, ts, event_id, value)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    uid, ts, val = [], [], []
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_total = days * 24 * 3600 * 1_000_000
    for u, n in n_per_user.items():
        uid.append(np.full(n, u, dtype=np.int64))
        # strictly increasing within user so (ts, event_id) order is stable
        ts.append(t0 + (np.arange(n, dtype=np.int64) * (span_total // n)))
        val.append(np.round(rng.normal(50.0, 20.0, size=n), 2))
    uid = np.concatenate(uid)
    ts = np.concatenate(ts)
    val = np.concatenate(val)
    eid = np.arange(uid.size, dtype=np.int64)  # global ids -> %10 gap pattern
    etype = np.array(["click", "error", "view"], dtype=object)[eid % 3]
    tbl = pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts.view("datetime64[us]")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(etype, pa.string()),
        "value": pa.array(val, pa.float64()),
    })
    pq.write_table(tbl, os.path.join(path, "events.parquet"))
    return pd.DataFrame({"event_id": eid, "ts": ts.view("datetime64[us]"),
                         "user_id": uid, "event_type": etype, "value": val})


def _ref_window_rollup(df, bucket=16):
    """Whole-user-per-task reference form (the round-4 implementation),
    on the exact-cents stream the round-5 queries sketch."""
    import pandas as pd
    from ts_pymfe_ray.functions.rounding import round_ha

    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        v = np.round(g["value"].to_numpy() * 100)
        m = sk.compute_window_sketches(v, bucket)
        m[:, sk.FIELDS.index("s1")] = sk.seq_window_sums(v, bucket)
        f = sk.derive_features(m)
        nw = m.shape[0]
        out.append(pd.DataFrame({
            "user_id": np.full(nw, uid, dtype=np.int64),
            "window_id": np.arange(nw, dtype=np.int64),
            "value_count": f["count"].astype(np.int64),
            "value_mean": round_ha(f["mean"] / 100.0),
            "value_var": round_ha(f["var"] / 10000.0),
        }))
    return (pd.concat(out, ignore_index=True)
            .sort_values(["user_id", "window_id"]).reset_index(drop=True))


def test_window_family_hot_user_distributed(ray_session, tmp_path_factory):
    """A planted 10^6-event bot user must flow through the positional-window
    engine without any single group materializing its history: the engine's
    largest per-task unit is one (user, span) slice — assert the span
    partitioning bounds it — and the distributed output must equal the
    whole-user-per-task reference form exactly."""
    import pandas as pd
    from ts_pymfe_ray.pipelines import queries as q

    d = str(tmp_path_factory.mktemp("hotevents"))
    df = _write_events(d, {0: 1_000_000, 1: 500, 2: 173, 3: 16})

    # engine partitioning bound: no (user, span) group holds more than a
    # span's worth of the bot's events (30 days -> ~33k/span), and the
    # window groupby holds <= bucket rows by construction
    span_us = 24 * 3600 * 1_000_000
    ts_us = df["ts"].to_numpy().astype("datetime64[us]").astype("int64")
    per_span = pd.DataFrame({"u": df["user_id"], "s": ts_us // span_us}) \
        .groupby(["u", "s"]).size()
    assert per_span.max() < 50_000 < 1_000_000
    assert per_span.loc[0].size >= 25  # the bot's history spans many groups

    got = q.q_events_user_window_rollup(d)
    exp = _ref_window_rollup(df)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == -(-1_000_000 // 16) + sum((-(-n // 16)) for n in (500, 173, 16))


def test_window_family_distributed_matches_per_user(ray_session, tmp_path_factory):
    """All five window-family queries: distributed positional-window engine
    == whole-user reference form on a multi-user table (acf1 within the
    documented c1 ulp-class tolerance, everything else exact)."""
    import pandas as pd
    from ts_pymfe_ray.functions.rounding import round_ha
    from ts_pymfe_ray.pipelines import queries as q

    d = str(tmp_path_factory.mktemp("events2"))
    df = _write_events(d, {7: 60_000, 8: 321, 9: 47}, seed=11)

    pd.testing.assert_frame_equal(q.q_events_user_window_rollup(d),
                                  _ref_window_rollup(df))

    # 10x merge reference: merge_adjacent over per-user fine sketches
    def ref_10x(bucket=16, factor=10):
        out = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            v = np.round(g["value"].to_numpy() * 100)  # exact-cents stream
            fine = sk.compute_window_sketches(v, bucket)
            s1 = sk.FIELDS.index("s1")
            fine[:, s1] = sk.seq_window_sums(v, bucket)
            merged = sk.merge_adjacent(fine, factor)
            merged[:, s1] = sk.seq_window_sums(fine[:, s1], factor)
            f = sk.derive_features(merged)
            nw = merged.shape[0]
            out.append(pd.DataFrame({
                "user_id": np.full(nw, uid, dtype=np.int64),
                "window_id": np.arange(nw, dtype=np.int64),
                "value_count": f["count"].astype(np.int64),
                "value_mean": round_ha(f["mean"] / 100.0),
                "value_var": round_ha(f["var"] / 10000.0),
            }))
        return (pd.concat(out, ignore_index=True)
                .sort_values(["user_id", "window_id"]).reset_index(drop=True))

    pd.testing.assert_frame_equal(q.q_events_user_window_rollup_10x(d), ref_10x())

    # acf1: c1 is the one sketch field whose isolated-window association
    # differs by ~1 ulp from the whole-series path (documented); compare
    # at the rounding quantum
    def ref_acf1(bucket=16):
        out = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            m = sk.compute_window_sketches(g["value"].to_numpy(), bucket)
            f = sk.derive_features(m)
            ok = (f["count"] == bucket) & np.isfinite(f["acf1"])
            out.append(pd.DataFrame({
                "user_id": np.full(int(ok.sum()), uid, dtype=np.int64),
                "window_id": np.flatnonzero(ok).astype(np.int64),
                "acf1": round_ha(f["acf1"][ok]),
            }))
        return (pd.concat(out, ignore_index=True)
                .sort_values(["user_id", "window_id"]).reset_index(drop=True))

    got, exp = q.q_events_user_window_acf1(d), ref_acf1()
    pd.testing.assert_frame_equal(got[["user_id", "window_id"]],
                                  exp[["user_id", "window_id"]])
    assert np.allclose(got["acf1"], exp["acf1"], atol=2e-6, rtol=0)

    # gap-fill: engine policy on the whole series, then windows
    def ref_gapfill(bucket=16):
        out = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            v = g["value"].to_numpy().copy()
            missing = (g["event_id"].to_numpy() % 10) == 0
            if missing.all():
                continue
            pos = np.arange(v.size)
            valid = ~missing
            vidx = pos[valid]
            prev_i = np.searchsorted(vidx, pos, side="right") - 1
            next_i = np.searchsorted(vidx, pos, side="left")
            pi = vidx[np.clip(prev_i, 0, vidx.size - 1)]
            ni = vidx[np.clip(next_i, 0, vidx.size - 1)]
            pv, nv = v[pi], v[ni]
            with np.errstate(invalid="ignore", divide="ignore"):
                interp = pv + (nv - pv) * (pos - pi) / (ni - pi)
            filled = np.where(valid, v,
                              np.where(prev_i < 0, nv,
                                       np.where(next_i >= vidx.size, pv, interp)))
            m = sk.compute_window_sketches(filled, bucket)
            m[:, sk.FIELDS.index("s1")] = sk.seq_window_sums(filled, bucket)
            f = sk.derive_features(m)
            nw = m.shape[0]
            out.append(pd.DataFrame({
                "user_id": np.full(nw, uid, dtype=np.int64),
                "window_id": np.arange(nw, dtype=np.int64),
                "value_count": f["count"].astype(np.int64),
                "value_mean": round_ha(f["mean"]),
            }))
        return (pd.concat(out, ignore_index=True)
                .sort_values(["user_id", "window_id"]).reset_index(drop=True))

    pd.testing.assert_frame_equal(q.q_events_gapfill_rollup(d), ref_gapfill())


def test_acf1_span_partials_match_whole_history(ray_session, tmp_path_factory):
    """The span-partial acf1 must equal np.corrcoef over each type's full
    chronological history (to the shared 6dp rounding) — on a fixture with
    one hot type carrying 100x the events of the others, so the partials
    path (many spans merged via boundary pairs) is actually exercised."""
    import pandas as pd
    from ts_pymfe_ray.functions.rounding import round_ha
    from ts_pymfe_ray.pipelines import queries as q

    d = str(tmp_path_factory.mktemp("acf1events"))
    df = _write_events(d, {1: 60_000, 2: 400, 3: 150}, seed=9)
    got = q.q_events_acf1(d, span_hours=6)

    exp_rows = []
    for et, g in df.groupby("event_type"):
        g = g.sort_values(["ts", "event_id"])
        v = g["value"].to_numpy()
        r = float(np.corrcoef(v[:-1], v[1:])[0, 1]) if v.size >= 3 else np.nan
        exp_rows.append({"event_type": et, "acf1": round_ha(r),
                         "n": np.int64(v.size)})
    exp = pd.DataFrame(exp_rows).sort_values("event_type").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)


def test_range_join_bucketed_matches_per_user(ray_session, tmp_path_factory):
    """The interval-bucketed range join must equal the whole-user-per-task
    reference form exactly (integer lag math) — including on a dense user
    whose events are far closer together than the band width (many
    replicated clicks per bucket) and a sparse user with empty bands."""
    import pandas as pd
    from ts_pymfe_ray.pipelines import queries as q

    d = str(tmp_path_factory.mktemp("rjevents"))
    # user 7: 60k events over 30 days (~23 s apart, band 60 s -> dense)
    df = _write_events(d, {7: 60_000, 8: 321, 9: 47}, seed=11)

    def ref(band_sec=60):
        band_us = band_sec * 1_000_000
        out = []
        for uid, g in df.groupby("user_id"):
            g = g.sort_values(["ts", "event_id"])
            ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            et = g["event_type"].to_numpy()
            ids = g["event_id"].to_numpy()
            click_ts = ts[et == "click"]
            err = et == "error"
            e_ts, e_id = ts[err], ids[err]
            lo = np.searchsorted(click_ts, e_ts - band_us, side="left")
            hi = np.searchsorted(click_ts, e_ts + band_us, side="right")
            n_in = (hi - lo).astype(np.int64)
            nearest = np.full(e_ts.size, -1, dtype=np.int64)
            for j in range(e_ts.size):
                if n_in[j] > 0:
                    nearest[j] = np.abs(click_ts[lo[j]:hi[j]] - e_ts[j]).min()
            out.append(pd.DataFrame({"event_id": e_id.astype(np.int64),
                                     "n_clicks_in_band": n_in,
                                     "nearest_click_lag_us": nearest}))
        return (pd.concat(out, ignore_index=True)
                .sort_values("event_id").reset_index(drop=True))

    pd.testing.assert_frame_equal(q.q_events_range_join(d), ref())


def test_cents_recipe_pins_half_boundary_means(ray_session, tmp_path_factory):
    """Regression pin for the sf0.1 rounding-boundary class: a 2dp value
    stream whose hour-bucket mean lands EXACTLY on the 6dp half must
    produce identical engine and DuckDB output.  Constructed case: 32
    events in one hour with an ODD cent sum (142623) -> true mean
    142623/3200 = 44.5696875, an exact 6dp half; the raw-float path put
    the two sides' ulp-different sums on opposite sides of it at sf0.1.
    The cents recipe makes both sides compute the SAME double before
    rounding, so the outputs agree whichever way that double rounds."""
    from fractions import Fraction

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ts_pymfe_ray.pipelines import queries as q

    d = str(tmp_path_factory.mktemp("boundary"))
    vals = [44.57] * 31 + [44.56]          # cents sum 142623 (odd), n = 32
    true_mean = Fraction(sum(round(v * 100) for v in vals), 3200)
    # sanity: the true mean sits EXACTLY on the 6dp rounding half
    assert (true_mean * 10**7) % 10 == 5
    n = len(vals)
    t0 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    tbl = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
        "ts": pa.array((t0 + np.arange(n, dtype=np.int64) * 1_000_000)
                       .view("datetime64[us]")),
        "user_id": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array(np.array(vals, dtype=np.float64), pa.float64()),
    })
    pq.write_table(tbl, os.path.join(d, "events.parquet"))

    got = q.q_events_window_rollup(d)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    import __ray_entry__ as e
    exp = con.execute(e.oracle_sql()["events_window_rollup"]).df()
    assert len(got) == len(exp) == 1
    for col in ("value_count", "value_sum", "value_mean",
                "value_min", "value_max"):
        assert float(got[col].iloc[0]) == float(exp[col].iloc[0]), col


def test_hash_join_partials_matches_pandas_merge(ray_session):
    """The union+groupby shuffle join == pandas inner merge + group sums,
    including unmatched keys on both sides and multi-partial probe keys."""
    import pandas as pd
    import pyarrow as pa
    import ray
    from ts_pymfe_ray.pipelines.join import hash_join_partials

    rng = np.random.default_rng(21)
    bkeys = np.arange(0, 300, dtype=np.int64)            # build: unique keys
    bpay = rng.integers(0, 50, size=bkeys.size).astype(np.int64)
    pkeys = rng.integers(-20, 320, size=2000).astype(np.int64)  # some miss
    pvals = rng.integers(0, 1000, size=pkeys.size).astype(np.int64)

    build = ray.data.from_arrow(pa.table({"key": bkeys, "pay": bpay}))
    probe = ray.data.from_arrow(pa.table({"key": pkeys, "rev": pvals})) \
        .repartition(7)  # multiple partial rows per key across blocks
    got = hash_join_partials(build, probe, sum_cols=("rev",)).to_pandas()
    got = got.groupby("pay")["rev"].sum().sort_index()

    exp = (pd.DataFrame({"key": pkeys, "rev": pvals})
           .merge(pd.DataFrame({"key": bkeys, "pay": bpay}), on="key")
           .groupby("pay")["rev"].sum().sort_index())
    pd.testing.assert_series_equal(got, exp, check_dtype=False)


def test_funnel_span_partials_match_bruteforce(ray_session, tmp_path_factory):
    """The span-partial forward funnel must equal a brute-force pandas
    computation — including on a hot user whose events span many 6h spans
    (first click in one span, first qualifying purchase several spans
    later) and users with purchases only before their first click."""
    import pandas as pd
    from ts_pymfe_ray.pipelines import queries as q

    d = str(tmp_path_factory.mktemp("funnelevents"))
    df = _write_events(d, {1: 40_000, 2: 300, 3: 11, 4: 2}, seed=13)
    # _write_events assigns event_type by event_id % 3: click/error/view —
    # rewrite deterministically so purchases exist sparsely
    import pyarrow as pa
    import pyarrow.parquet as pq
    rng = np.random.default_rng(7)
    et = np.where(rng.random(len(df)) < 0.03, "purchase",
                  np.where(rng.random(len(df)) < 0.5, "click", "view"))
    df["event_type"] = et
    tbl = pa.table({
        "event_id": pa.array(df["event_id"].to_numpy(), pa.int64()),
        "ts": pa.array(df["ts"].to_numpy().astype("datetime64[us]")),
        "user_id": pa.array(df["user_id"].to_numpy(), pa.int64()),
        "event_type": pa.array(df["event_type"].to_numpy(dtype=object), pa.string()),
        "value": pa.array(df["value"].to_numpy(), pa.float64()),
    })
    pq.write_table(tbl, os.path.join(d, "events.parquet"))

    got = q.q_events_funnel(d, span_hours=6)

    day_us = 86400 * 1_000_000
    win_us = 72 * 3600 * 1_000_000
    rows = []
    for uid, g in df.groupby("user_id"):
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        et = g["event_type"].to_numpy()
        clicks = ts[et == "click"]
        if clicks.size == 0:
            continue
        fc = clicks.min()
        purch = ts[(et == "purchase") & (ts >= fc)]
        conv = int(purch.size > 0 and purch.min() - fc <= win_us)
        rows.append({"cohort_day": fc // day_us, "conv": conv})
    ref = pd.DataFrame(rows)
    exp = ref.groupby("cohort_day").agg(
        n_users=("conv", "size"), n_converted=("conv", "sum")).reset_index()
    exp["cohort_day"] = exp["cohort_day"].astype("int64")
    exp["n_users"] = exp["n_users"].astype("int64")
    exp["n_converted"] = exp["n_converted"].astype("int64")
    exp = exp.sort_values("cohort_day").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
