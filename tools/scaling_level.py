"""One scaling-measurement level in a FRESH process (bench.py phase 2).

Each parallelism level gets its own interpreter + JVM — the north rule's
"run via spark-submit at N and 4N executors" shape, and it keeps one
level's JVM aging (GC pressure, heap fragmentation from the full-machine
phase) from polluting another's timings.

Usage: python tools/scaling_level.py <cores> <runs> <big_parquet> <warm_parquet>
Prints one JSON line: {cores, runs[], cold_sec, warm_min_sec, mean_sec, std_sec}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main() -> None:
    cores, runs = int(sys.argv[1]), int(sys.argv[2])
    big, warm = sys.argv[3], sys.argv[4]
    from bench import DATA_DIR, fresh_spark, run_dedup_job, warm_workers

    spark = fresh_spark(cores, max(cores * 2, 8))
    warm_workers(spark, cores)
    run_dedup_job(spark, spark.read.parquet(warm), os.path.join(DATA_DIR, f"warm_ckpt_{cores}"))
    pages = spark.read.parquet(big)
    times = [
        run_dedup_job(spark, pages, os.path.join(DATA_DIR, f"bench_ckpt_{cores}"))
        for _ in range(runs)
    ]
    print(
        json.dumps(
            {
                "cores": cores,
                "runs": [round(t, 3) for t in times],
                "cold_sec": round(times[0], 3),
                "warm_min_sec": round(min(times), 3),
                "mean_sec": round(statistics.mean(times), 3),
                "std_sec": round(statistics.pstdev(times), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
