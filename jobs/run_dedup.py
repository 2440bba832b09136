"""spark-submit entry point for the dedup pipeline.

Usage (cluster):
    zip -r dsps.zip datasketches_postgresql_spark/
    spark-submit --py-files dsps.zip jobs/run_dedup.py \
        --input /path/webpages_parquet_or_iceberg \
        --checkpoint /path/ckpt --resume

Local sandbox equivalent:
    python jobs/run_dedup.py --generate 10000 --checkpoint /tmp/ckpt

Incremental mode (dedup a NEW crawl batch against the accumulated corpus
without re-processing it; equivalence to a full rerun is tested in
tests/test_incremental.py):
    spark-submit --py-files dsps.zip jobs/run_dedup.py \
        --input /path/crawl_2026_08 --checkpoint /path/ckpt \
        --incremental-batch 2026-08

The input table must match BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="webpages table path (parquet dir)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a synthetic corpus of N docs instead of --input")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--incremental-batch", default=None, metavar="BATCH_ID",
                    help="treat the input as a NEW batch appended to the "
                         "corpus already checkpointed under --checkpoint; "
                         "stages are suffixed with BATCH_ID")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shingle-n", type=int, default=9)
    ap.add_argument("--num-perm", type=int, default=128)
    ap.add_argument("--bands", type=int, default=32)
    ap.add_argument("--rows", type=int, default=4)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--representative", default="url", choices=("url", "quality"),
                    help="which cluster member survives: lexicographic-min "
                         "url (default) or highest quality_score")
    ap.add_argument("--url-dedup", action="store_true",
                    help="collapse recrawls by canonical URL before any text "
                         "stage (freshest warc_ts wins)")
    ap.add_argument("--line-dedup", type=int, nargs="?", const=4, default=0,
                    metavar="MIN_DOCS",
                    help="drop lines appearing in >= MIN_DOCS distinct docs "
                         "(default 4 when flag given) before shingling; the "
                         "raw extracted checkpoint is kept unmodified")
    ap.add_argument("--bloom-prefilter", action="store_true",
                    help="checkpoint a mergeable Bloom filter over banded "
                         "hashes; incremental batches probe it so "
                         "definitely-new hashes skip the base corpus")
    args = ap.parse_args()

    from datasketches_postgresql_spark.dedup.pipeline import DedupConfig, DedupPipeline
    from datasketches_postgresql_spark.session import get_spark

    spark = get_spark("dedup-job", master=args.master)
    if args.generate:
        from datasketches_postgresql_spark.sources.corpus import generate_corpus_distributed

        pages = generate_corpus_distributed(spark, args.generate)
    else:
        pages = spark.read.parquet(args.input)

    cfg = DedupConfig(
        shingle_n=args.shingle_n,
        num_perm=args.num_perm,
        bands=args.bands,
        rows=args.rows,
        jaccard_threshold=args.jaccard,
        representative_policy=args.representative,
        url_dedup=args.url_dedup,
        line_dedup=bool(args.line_dedup),
        line_dedup_min_docs=args.line_dedup or 4,
        bloom_prefilter=args.bloom_prefilter,
    )
    pipe = DedupPipeline(spark, args.checkpoint, cfg)
    if args.incremental_batch:
        out = pipe.run_incremental(
            pages, batch_id=args.incremental_batch, resume=args.resume
        )
    else:
        out = pipe.run(pages, resume=args.resume)
    summary = {
        "docs": out["resolved"].count(),
        "clusters": out["clusters"].select("cluster_id").distinct().count(),
        "checkpoint": args.checkpoint,
        "config_hash": cfg.config_hash(),
    }
    if args.incremental_batch:
        summary["batch"] = args.incremental_batch
        summary["batches"] = pipe.store.state().get("batches", [])
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
