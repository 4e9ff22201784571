"""Job driver — the ``ray job submit`` entry point.

    ray job submit -- python -m ts_pymfe_ray.cli rollup \
        --input /data/sequences --output /data/tiers --num-shards 256

Owns the Ray session (guarded init — inside a Ray job the session already
exists).  Each subcommand is one of the flagship pipelines; rollup and
features are resumable (re-running skips committed shards via the
manifest)."""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
            kwargs["address"] = "local"
        ray.init(**kwargs)
    import logging

    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ts_pymfe_ray")
    ap.add_argument("job", choices=["rollup", "features", "source-rollup", "bootstrap", "synth", "retention", "fast-features", "ingest-csv", "text", "embed", "curate"])
    ap.add_argument("--input", help="sequences parquet dir")
    ap.add_argument("--output", help="output dir (rollup/features)")
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--groups", default=None, help="comma-separated kernel groups")
    ap.add_argument("--max-cost", default="medium", choices=["cheap", "medium", "heavy"])
    ap.add_argument("--sf", type=float, default=None, help="synth: scale factor")
    ap.add_argument("--drop-tiers", default="raw", help="retention: comma-separated tiers to age out")
    ap.add_argument("--op", default="quality",
                    choices=["quality", "quality-filter", "dedup-exact",
                             "dedup-minhash", "dedup-simhash", "dedup-clusters",
                             "lang-id", "repetition", "fingerprints",
                             "sample", "sample-stratified",
                             "split", "heavy-hitters", "top-terms",
                             "length-quantiles",
                             "length-buckets", "overlap-matrix",
                             "dedup-ngram",
                             "kmeans", "kmeans-step", "label-centroids", "knn",
                             "curate", "decontaminate", "mix"],
                    help="text/embed: which operator to run")
    ap.add_argument("--sf-dir", default=None,
                    help="text: directory holding documents.parquet")
    # production scale knobs (SCALE.md §3): the CLI defaults flip the caps
    # ON — exact mode (None) is the oracle-gate configuration, reachable
    # with --bucket-cap 0 / --df-cap 0
    ap.add_argument("--bucket-cap", type=int, default=2048,
                    help="text dedup: star-pair LSH buckets larger than this "
                         "(0 = exact all-pairs mode)")
    ap.add_argument("--df-cap", type=int, default=512,
                    help="text dedup-ngram: drop shingles shared by more "
                         "than this many docs (0 = keep all)")
    args = ap.parse_args(argv)

    if args.job in ("text", "embed") and not args.sf_dir:
        ap.error(f"--sf-dir is required for job '{args.job}'")
    if args.job == "retention" and not args.output:
        ap.error("--output (the tier dir) is required for retention")
    if args.job in ("rollup", "features", "source-rollup", "bootstrap", "fast-features", "ingest-csv") and not args.input:
        ap.error(f"--input is required for job '{args.job}'")
    if args.job in ("rollup", "features", "ingest-csv") and not args.output:
        ap.error(f"--output is required for job '{args.job}'")

    _ensure_ray(args.num_cpus)
    groups = tuple(args.groups.split(",")) if args.groups else None

    from ts_pymfe_ray.pipelines import flagship

    if args.job == "synth":
        from ts_pymfe_ray.synth import ensure_sequences

        path = ensure_sequences(args.sf or 0.001)
        print(json.dumps({"sequences": path}))
    elif args.job == "rollup":
        res = flagship.run_rollup(
            args.input, args.output, num_shards=args.num_shards,
            resume=not args.no_resume,
        )
        print(json.dumps(res))
    elif args.job == "features":
        res = flagship.run_features(
            args.input, args.output, groups=groups, max_cost=args.max_cost,
            num_shards=args.num_shards, resume=not args.no_resume,
        )
        print(json.dumps(res))
    elif args.job == "source-rollup":
        df = flagship.rollup_by_source(args.input).to_pandas()
        if args.output:
            df.to_parquet(args.output)
        print(json.dumps({"rows": len(df)}))
    elif args.job == "fast-features":
        from ts_pymfe_ray.stages.fast_features import run_fast_features

        if args.output:
            run_fast_features(args.input, args.output)
            print(json.dumps({"out": args.output}))
        else:
            print(json.dumps({"rows": run_fast_features(args.input).count()}))
    elif args.job == "retention":
        from ts_pymfe_ray.state.retention import apply_retention

        removed = apply_retention(args.output, tuple(args.drop_tiers.split(",")))
        print(json.dumps({"removed": removed}))
    elif args.job == "ingest-csv":
        from ts_pymfe_ray.sources.comp_engine import ingest_comp_engine_csv

        out = ingest_comp_engine_csv(args.input, args.output)
        print(json.dumps({"sequences": out}))
    elif args.job == "text":
        from ts_pymfe_ray.pipelines import queries as q
        from ts_pymfe_ray.pipelines import textops as t

        bcap = args.bucket_cap or None
        dcap = args.df_cap or None
        op = {
            "quality": t.q_text_quality_full,
            "quality-filter": t.q_quality_filter,
            "dedup-exact": q.q_dedup_exact_keep_first,
            "dedup-minhash": lambda d: t.q_dedup_minhash(d, bucket_cap=bcap),
            "dedup-simhash": lambda d: t.q_dedup_simhash(d, bucket_cap=bcap),
            "dedup-clusters": lambda d: t.q_dedup_clusters(d, bucket_cap=bcap),
            "dedup-ngram": lambda d: t.q_dedup_ngram_jaccard(d, df_cap=dcap),
            "lang-id": t.q_lang_id,
            "repetition": t.q_doc_repetition,
            "fingerprints": t.q_doc_fingerprints,
            # corpus-curation pack (round 4)
            "sample": q.q_documents_sample_hash,
            "sample-stratified": q.q_documents_sample_stratified,
            "split": q.q_documents_split_assign,
            "heavy-hitters": q.q_documents_heavy_hitters,
            "top-terms": q.q_source_top_terms,
            "length-quantiles": q.q_documents_length_quantiles,
            "length-buckets": q.q_documents_length_buckets,
            "overlap-matrix": t.q_source_overlap_matrix,
            "curate": t.q_curation_pipeline,
            "decontaminate": t.q_decontaminate,
            "mix": q.q_documents_mix_uniform,
        }[args.op]
        df = op(args.sf_dir)
        if args.output:
            df.to_parquet(args.output)
        print(json.dumps({"op": args.op, "rows": len(df)}))
    elif args.job == "curate":
        import os as _os

        from ts_pymfe_ray.pipelines.curation import run_curation

        if not args.sf_dir or not args.output:
            ap.error("curate requires --sf-dir and --output")
        res = run_curation(_os.path.join(args.sf_dir, "documents.parquet"),
                           args.output, num_buckets=args.num_shards,
                           resume=not args.no_resume)
        print(json.dumps(res))
    elif args.job == "embed":
        from ts_pymfe_ray.pipelines import queries as q

        op = {
            "kmeans": q.q_embeddings_kmeans,
            "kmeans-step": q.q_embeddings_kmeans_step,
            "label-centroids": q.q_embeddings_label_centroids,
            "knn": q.q_embeddings_knn,
        }.get("kmeans" if args.op == "quality" else args.op)
        if op is None:
            ap.error("embed supports --op kmeans|kmeans-step|label-centroids|knn")
        df = op(args.sf_dir)
        if args.output:
            df.to_parquet(args.output)
        print(json.dumps({"op": args.op, "rows": len(df)}))
    elif args.job == "bootstrap":
        from ts_pymfe_ray.pipelines.bootstrap import bootstrap_features

        df = bootstrap_features(args.input, groups=groups or ("general",))
        if args.output:
            df.to_parquet(args.output)
        print(json.dumps({"rows": len(df)}))

    import ray

    ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
