"""Profile per-stage wall time of the dedup pipeline at one parallelism
level (scaling-efficiency diagnosis). Fresh process per level, same shape
as tools/scaling_level.py.

Usage: python tools/profile_stages.py <cores> <corpus_parquet> [runs]
Prints one JSON line per run: {cores, total_sec, stages: {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    cores = int(sys.argv[1])
    corpus = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    from bench import DATA_DIR, fresh_spark, run_dedup_job, warm_workers
    from datasketches_postgresql_spark.dedup.pipeline import DedupConfig, DedupPipeline
    import shutil

    spark = fresh_spark(cores, max(cores * 2, 8))
    warm_workers(spark, cores)
    pages = spark.read.parquet(corpus)
    ckpt = os.path.join(DATA_DIR, f"profile_stage_ckpt_{cores}")
    for _ in range(runs):
        shutil.rmtree(ckpt, ignore_errors=True)
        pipe = DedupPipeline(spark, ckpt, DedupConfig())
        t0 = time.time()
        out = pipe.run(pages, resume=False)
        out["resolved"].count()
        total = time.time() - t0
        print(
            json.dumps(
                {
                    "cores": cores,
                    "total_sec": round(total, 3),
                    "stages": pipe.stage_seconds,
                    "unattributed": round(
                        total - sum(pipe.stage_seconds.values()), 3
                    ),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
