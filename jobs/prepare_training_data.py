"""End-to-end training-data preparation: crawl pages in, packed training
shards out. Chains every tier the engine ships, in the order a production
pretraining pipeline runs them:

  1. dedup        DedupPipeline (extract, MinHash/SimHash/LSH, substring,
                  connected components) -> keep each cluster's
                  representative (url or quality policy)
  2. clean        PII redaction (regex cascade, zero-shuffle projection)
  3. filter       Gopher-rules composite quality filter
  4. decontaminate drop docs sharing word n-grams with an eval benchmark
                  (optional --benchmark parquet with (bench_id, text))
  5. pack         best-fit-decreasing token-budget bins (token count =
                  BPE-ish pre-tokenizer), assignment joined back by id
  6. split        deterministic hash-bucket train/val assignment (stable
                  across partitioning, parallelism and reruns)
  7. write        parquet shards partitioned by split, plus ONE JSON line
                  of per-tier survivor counts (the lineage a 100 TB run
                  logs per checkpoint)

Usage:
  python jobs/prepare_training_data.py --generate 8000 \
      --checkpoint /tmp/prep_ck --output /tmp/prep_out \
      [--benchmark bench.parquet] [--budget 2048] [--val-frac 0.01] \
      [--master local[32]] [--resume]

Every stage is a DataFrame transform over the dedup pipeline's
checkpointed tables, so a rerun with --resume reuses the expensive dedup
stages and only replays the cheap projections.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="webpages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate a synthetic corpus of N docs instead of --input")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True, help="output dir for packed shards")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--benchmark", help="eval-set parquet (bench_id, text) to decontaminate against")
    ap.add_argument("--budget", type=int, default=2048, help="tokens per packed bin")
    ap.add_argument("--val-frac", type=float, default=0.01)
    ap.add_argument("--master", default=None)
    ap.add_argument("--representative", default="quality", choices=("url", "quality"))
    ap.add_argument("--domain-cap", type=int, default=0, metavar="N",
                    help="keep at most N pages per registrable domain BEFORE "
                         "dedup (anti-spam/diversity quota; skew-safe hash "
                         "mode so a mega-domain never sorts)")
    ap.add_argument("--bpe-vocab", metavar="PATH",
                    help="merge table (textops/bpe.py json; train one with "
                         "tools/train_bpe_vocab.py) — packing budgets then "
                         "use REAL post-merge BPE token counts instead of "
                         "the pre-tokenizer proxy")
    ap.add_argument("--quality-model", metavar="PATH",
                    help="trained classifier (textops/quality_model.py json) "
                         "— adds a learned quality tier after the Gopher "
                         "rules: drop docs scoring below --quality-threshold")
    ap.add_argument("--quality-threshold", type=float, default=0.5)
    args = ap.parse_args()

    from datasketches_postgresql_spark.session import get_spark

    spark = get_spark("prepare-training-data", master=args.master)
    if args.generate:
        from datasketches_postgresql_spark.sources.corpus import generate_corpus_distributed

        pages = generate_corpus_distributed(spark, args.generate)
    else:
        pages = spark.read.parquet(args.input)

    summary = run(
        spark,
        pages,
        checkpoint=args.checkpoint,
        output=args.output,
        resume=args.resume,
        benchmark=spark.read.parquet(args.benchmark) if args.benchmark else None,
        budget=args.budget,
        val_frac=args.val_frac,
        representative=args.representative,
        domain_cap=args.domain_cap,
        bpe_vocab=args.bpe_vocab,
        quality_model=args.quality_model,
        quality_threshold=args.quality_threshold,
    )
    print(json.dumps(summary))


def run(
    spark,
    pages,
    *,
    checkpoint: str,
    output: str,
    resume: bool = False,
    benchmark=None,
    budget: int = 2048,
    val_frac: float = 0.01,
    representative: str = "quality",
    domain_cap: int = 0,
    bpe_vocab: str | None = None,
    quality_model: str | None = None,
    quality_threshold: float = 0.5,
) -> dict:
    """The whole prep chain as a library call (main() is the CLI shell):
    pages (url, warc_ts, html, text, lang) in, packed shards at ``output``
    out, returns the one-line lineage summary dict. ``benchmark`` is an
    optional (bench_id, text) DataFrame to decontaminate against."""
    from datasketches_postgresql_spark.dedup.pipeline import DedupConfig, DedupPipeline
    from datasketches_postgresql_spark.textops.analysis import bpe_token_count, gopher_filter
    from datasketches_postgresql_spark.textops.packing import pack_documents, packing_stats
    from datasketches_postgresql_spark.textops.pii import redact_pii
    from datasketches_postgresql_spark.textops.split import hash_split

    counts: dict[str, int] = {}

    # 0. per-domain quota (optional, before any text stage runs)
    if domain_cap > 0:
        from datasketches_postgresql_spark.textops.urlops import cap_per_domain

        pages = cap_per_domain(pages, "url", max_docs=domain_cap, mode="hash")

    # 1. dedup -> representatives only, with their extracted text
    pipe = DedupPipeline(
        spark, checkpoint, DedupConfig(representative_policy=representative)
    )
    out = pipe.run(pages, resume=resume)
    reps = out["resolved"].where("is_representative").select("doc_id", "cluster_id")
    text = out["extracted"].select("doc_id", "url", "lang", "text")
    docs = text.join(reps, "doc_id")
    counts["extracted"] = text.count()
    counts["after_dedup"] = reps.count()  # ids only — no text pass

    # 2. PII redaction (projection; original text never leaves the job)
    docs = docs.withColumn("text", redact_pii(F.col("text")))

    # 3. quality filter; materialize ONCE — the redact + filter projection
    # feeds the count, the token pass, the pack join and the shard write
    docs = gopher_filter(docs, "text", min_words=30).where("keep").drop("keep").persist()
    counts["after_quality"] = docs.count()

    # 3b. learned quality tier (optional): the trained classifier scores
    # every survivor (broadcast weight join, exact integer logit) and the
    # threshold drops the low-quality tail
    if quality_model:
        from datasketches_postgresql_spark.textops.quality_model import (
            QualityModel,
            quality_score,
        )

        qm = QualityModel.load(quality_model)
        docs = (
            quality_score(docs, "text", qm, "doc_id")
            .where(F.col("quality_p") >= quality_threshold)
            .drop("quality_p")
            .persist()
        )
        counts["after_quality_model"] = docs.count()

    # 4. benchmark decontamination (optional)
    if benchmark is not None:
        from datasketches_postgresql_spark.textops.decontaminate import decontaminate

        hits = decontaminate(docs, benchmark, doc_id="doc_id", doc_text="text")
        docs = docs.join(hits.select("doc_id"), "doc_id", "left_anti")
        counts["after_decontaminate"] = docs.count()

    # 5. token counts + packing (lengths shuffle; text joins back by id)
    if benchmark is not None:
        docs = docs.persist()  # the anti-join re-plans the persisted base
    if bpe_vocab:
        from datasketches_postgresql_spark.textops.bpe import (
            BpeVocab,
            bpe_token_count_real,
        )

        vocab = BpeVocab.load(bpe_vocab)
        docs = docs.withColumn("n_tokens", bpe_token_count_real(F.col("text"), vocab))
    else:
        docs = docs.withColumn("n_tokens", bpe_token_count(F.col("text")))
    # persist: the stats collect below and the shard-write join both read
    # the assignment — without this the pack shuffle + Fenwick pass and the
    # token-count UDF run twice
    assignment = pack_documents(docs, "doc_id", "n_tokens", budget).persist()
    stats = packing_stats(assignment, budget).collect()[0]
    packed = docs.join(
        assignment.select(
            F.col("id").alias("doc_id"), "bin_id", "bin_fill", "oversize"
        ),
        "doc_id",
    )

    # 6. deterministic split — keyed on bin_id so a bin never straddles
    # train/val (packed sequences are the training unit, not documents)
    if val_frac > 0:
        packed = hash_split(
            packed, {"train": 1.0 - val_frac, "val": val_frac},
            id_col="bin_id",
        )
    else:  # --val-frac 0: everything is train, no degenerate zero weight
        packed = packed.withColumn("split", F.lit("train"))

    # 7. shards partitioned by split, bucketed-friendly ordering inside
    (packed
     .repartition("split", F.pmod(F.col("bin_id"), F.lit(16)))
     .sortWithinPartitions("bin_id")
     .write.mode("overwrite").partitionBy("split").parquet(output))

    written = spark.read.parquet(output)
    counts["train_docs"] = written.where("split = 'train'").count()
    counts["val_docs"] = written.where("split = 'val'").count()
    summary = {
        **counts,
        # a fully-filtered corpus leaves 0-row aggregates (NULL sums)
        "n_bins": int(stats["n_bins"] or 0),
        "n_oversize": int(stats["n_oversize"] or 0),
        "utilization": float(stats["utilization"] or 0.0),
        "budget": budget,
        "output": output,
    }
    return summary


if __name__ == "__main__":
    main()
