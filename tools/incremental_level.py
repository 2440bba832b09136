"""Incremental-batch dedup measurement (bench.py phase 2.5) in a FRESH
process (same spark-submit-per-job shape as tools/scaling_level.py).

Times ``DedupPipeline.run_incremental`` — a NEW crawl batch deduped against
the full-machine run's checkpointed corpus — which is the shape a 100 TB
training pipeline actually runs per crawl increment. The full-machine
pipeline time over the BASE corpus is a lower bound on what re-running the
world (base + batch) would cost, so ``full_sec / warm_min_sec`` understates
the true speedup.

What the increment still pays that is O(base corpus) here: one columnar
scan of the stored banded signatures for the touched-bucket semi-join (on
Iceberg the banded index is bucketed by band_hash, pruning that scan; the
parquet fallback reads it). Everything text-sized — extraction, shingling,
signatures — is O(batch) only.

Usage: python tools/incremental_level.py <cores> <base_ckpt> <batch_docs> <min_runs>
Prints one JSON line {cores, batch_docs, runs[], cold_sec, warm_min_sec}.

Each measured run recomputes the same batch (resume=False, fixed batch_id):
``_base_for`` pins an already-recorded batch to its ORIGINAL base, so every
run does identical work and warm-run selection mirrors scaling_level.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    cores, ckpt = int(sys.argv[1]), sys.argv[2]
    batch_docs, runs = int(sys.argv[3]), int(sys.argv[4])
    from bench import DATA_DIR, fresh_spark, warm_workers
    from datasketches_postgresql_spark.dedup.pipeline import (
        DedupConfig,
        DedupPipeline,
    )

    spark = fresh_spark(cores, max(cores * 2, 8))
    warm_workers(spark, cores)

    # batch corpus: disjoint url/id namespace from every bench corpus
    # (id_offset beyond any shard), cached to parquet so generation cost
    # stays outside the timed window
    path = os.path.join(DATA_DIR, f"bench_inc_batch_{batch_docs}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from datasketches_postgresql_spark.sources.corpus import (
            generate_corpus_pandas,
        )

        pages_pd, _ = generate_corpus_pandas(
            batch_docs, seed=10_007, id_offset=1_000_000_000
        )
        spark.createDataFrame(pages_pd).repartition(
            max(cores * 2, 8), "url"
        ).write.mode("overwrite").parquet(path)
    batch = spark.read.parquet(path)

    times: list[float] = []
    for _ in range(runs):
        pipe = DedupPipeline(spark, ckpt, DedupConfig())
        t0 = time.time()
        pipe.run_incremental(batch, batch_id="bench_inc", resume=False)
        times.append(time.time() - t0)
    print(
        json.dumps(
            {
                "cores": cores,
                "batch_docs": batch_docs,
                "runs": [round(t, 3) for t in times],
                "cold_sec": round(times[0], 3),
                "warm_min_sec": round(min(times), 3),
                "mean_sec": round(statistics.mean(times), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
