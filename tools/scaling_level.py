"""One scaling-measurement level in a FRESH process (bench.py phase 2).

Each parallelism level gets its own interpreter + JVM — the north rule's
"run via spark-submit at N and 4N executors" shape, and it keeps one
level's JVM aging (GC pressure, heap fragmentation from the full-machine
phase) from polluting another's timings.

Usage: python tools/scaling_level.py <cores> <min_runs> <big_parquet> <warm_parquet>
Prints one JSON line: {cores, runs[], cold_sec, warm_min_sec, mean_sec, std_sec}.

Runs until STEADY STATE, not a fixed count: at least <min_runs> measured
runs, continuing until TWO CONSECUTIVE runs fail to improve the running
min by more than 4% (cap: SPARK_GRAFT_SCALING_MAX_RUNS, default
min_runs+3). Rationale: page-cache/JIT/allocator warming can span 3+ runs
on this host (a measured 3-run sequence at 4 cores was 99 -> 57 -> 42 s,
still falling when a fixed budget stopped it); cutting the trend short at
one level and not the other corrupts the N-vs-4N efficiency ratio. The
two-consecutive requirement keeps a single 1.7x host-variance spike
(documented in BASELINE.md) from truncating a still-warming level — one
noisy run alone can no longer end extension. The rule is symmetric across
levels and every raw run is reported, so nothing hides in selection.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _precache(path: str) -> None:
    """Symmetrize OS page-cache state across levels. All levels share one
    host, so the corpus disk read is paid only by whichever level happens
    to run FIRST — recorded sets show that level's cold run up to ~25%
    slower than its warm runs while the second level's cold run equals its
    warm ones, biasing the cold-rule N-vs-4N ratio in whichever direction
    the order dictates. One sequential read before the measured loop gives
    every level the same disk-warm start; "cold" then isolates what the
    scaling criterion is about (process/JVM/JIT state, CPU scaling), not
    which level ran first. On a real cluster each size reads from the
    distributed store with its own page caches — there is no shared-host
    first-reader penalty to measure."""
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet"):
            with open(os.path.join(path, f), "rb") as fh:
                while fh.read(1 << 24):
                    pass


def main() -> None:
    cores, runs = int(sys.argv[1]), int(sys.argv[2])
    big, warm = sys.argv[3], sys.argv[4]
    from bench import DATA_DIR, fresh_spark, run_dedup_job, warm_workers

    spark = fresh_spark(cores, max(cores * 2, 8))
    warm_workers(spark, cores)
    run_dedup_job(spark, spark.read.parquet(warm), os.path.join(DATA_DIR, f"warm_ckpt_{cores}"))
    _precache(big)
    pages = spark.read.parquet(big)
    max_runs = int(os.environ.get("SPARK_GRAFT_SCALING_MAX_RUNS", str(runs + 3)))
    times: list[float] = []
    stale = 0  # consecutive runs that failed to improve the min by >4%
    for _ in range(max_runs):
        prev_min = min(times) if times else None
        t = run_dedup_job(spark, pages, os.path.join(DATA_DIR, f"bench_ckpt_{cores}"))
        times.append(t)
        stale = stale + 1 if (prev_min is None or t > prev_min * 0.96) else 0
        if len(times) >= runs and stale >= 2:
            break  # steady: two consecutive runs no longer improve the min >4%
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
