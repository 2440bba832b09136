"""Measure this machine's effective parallel capacity for the two workload
shapes that matter to the pipeline:

  stream : memory-streaming numpy passes (large working set, DRAM-bound) —
           the shape of UNBLOCKED kernels and of Arrow/parquet IO;
  cache  : L2-resident numpy passes (the shape of this repo's cache-blocked
           kernels' inner loops).

Run: python tools/parallel_capacity.py

Interpretation: on the benchmark VM these print ~9x max speedup for
``stream`` (single shared memory bus saturates around 8 concurrent
streams; 32 vCPUs exist but cannot add bandwidth) and ~20x+ for ``cache``.
That ceiling is an environment property, not a pipeline property: a real
4N-executor cluster brings 4N memory controllers, so throughput scaling is
evidenced at parallelism levels below the bus saturation point (local[2] vs
local[8]) and the full-machine (local[32]) throughput is reported
separately. See BASELINE.md "Measured results".
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _stream(q):
    import ctypes

    libc = ctypes.CDLL("libc.so.6")
    libc.mallopt(-3, 1 << 30)
    libc.mallopt(-1, 1 << 30)
    x = np.arange(2_000_000, dtype=np.uint64)
    t0 = time.time()
    with np.errstate(over="ignore"):
        for _ in range(60):
            r = np.zeros(x.size, dtype=np.uint64)
            for _j in range(9):
                r *= np.uint64(0x100000001B3)
                r += x
    q.put(time.time() - t0)


def _cache(q):
    x = np.arange(100_000, dtype=np.uint64)
    t0 = time.time()
    with np.errstate(over="ignore"):
        r = np.zeros(x.size, dtype=np.uint64)
        for _ in range(1200):
            for _j in range(9):
                r *= np.uint64(0x100000001B3)
                r += x
    q.put(time.time() - t0)


def run(target, n: int) -> float:
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=target, args=(q,)) for _ in range(n)]
    t0 = time.time()
    for p in ps:
        p.start()
    for _ in ps:
        q.get()
    for p in ps:
        p.join()
    return n / (time.time() - t0)


def main() -> None:
    out: dict = {}
    for name, target in (("stream", _stream), ("cache", _cache)):
        base = run(target, 1)
        out[name] = {
            str(n): round(run(target, n) / base, 2) for n in (2, 4, 8, 16, 32)
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
