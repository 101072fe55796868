"""spark-submit entry point for the dedup pipeline.

Packaging (north rule: ships as spark-submit --py-files, no driver-side
data):

    python tools/build_pyfiles.py          # -> dist/europa_spark.zip
    # (dist/ is untracked — the zip is built fresh at submit time so the
    # shipped code always matches HEAD)
    spark-submit --py-files dist/europa_spark.zip jobs/dedup_job.py \
        --input db.documents --output /out/dedup \
        --checkpoint-dir /ckpt/run1 --langs en de \
        --methods exact minhash substring

All state flows through DataFrames and the checkpoint store; the driver
holds only the union-find convergence counter.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="europa-spark near-dup pipeline")
    p.add_argument("--input", required=True, help="Iceberg table or parquet path")
    p.add_argument("--output", required=True, help="output dir / table prefix")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--methods", nargs="+",
                   default=["exact", "minhash", "substring"],
                   choices=["exact", "minhash", "substring", "simhash"])
    p.add_argument("--langs", nargs="*", default=[])
    p.add_argument("--min-bytes", type=int, default=None)
    p.add_argument("--max-bytes", type=int, default=None)
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument(
        "--no-broadcast-hints", action="store_true",
        help="disable small-side broadcast hints (beyond ~10^9 docs per "
        "job the winner/candidate url sets outgrow broadcast; AQE then "
        "plans shuffle semi-joins)",
    )
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from europa_spark.catalog import save_table
    from europa_spark.checkpoint import CheckpointStore
    from europa_spark.config import DedupConfig
    from europa_spark.pipeline import load_documents, run
    from europa_spark.session import build_session

    cfg = DedupConfig(
        langs=tuple(args.langs),
        min_bytes=args.min_bytes,
        max_bytes=args.max_bytes,
        jaccard_threshold=args.jaccard_threshold,
        broadcast_hints=not args.no_broadcast_hints,
    )
    spark = build_session(
        app_name="europa-dedup", shuffle_partitions=args.shuffle_partitions
    )
    store = (
        CheckpointStore(args.checkpoint_dir, cfg.config_hash())
        if args.checkpoint_dir
        else None
    )
    docs = load_documents(spark, args.input)
    out = run(docs, cfg, methods=tuple(args.methods), store=store)
    for name in ("quarantine", "pairs", "components", "clusters", "report"):
        save_table(out[name], f"{args.output.rstrip('/')}/{name}")
    stats = {
        "clean_docs": out["report"].count(),
        "duplicates": out["report"].filter("is_duplicate").count(),
        "clusters": out["clusters"].count(),
        "pairs": out["pairs"].count(),
    }
    out["release"]()  # storage hygiene: drop every frame this run cached
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
