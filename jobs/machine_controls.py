#!/usr/bin/env python
"""Reproduce the machine-capability controls cited in BENCH/BASELINE.md.

Three job-independent probes that bound what the sandbox VM can deliver,
so engine scaling numbers can be separated from host artifacts:

1. parallel  — 16-process fixed arithmetic loop (bench.parallel_control):
               the quiet-machine gate (~0.3 s when the hypervisor is
               delivering full parallelism).
2. bandwidth — streaming-sum over a 64 MB buffer per process at
               1/4/8/16 processes: aggregate GB/s shows the memory wall
               (linear 1→4, ~2.6× 4→16 on this VM).
3. codegen   — spark.range sum at local[4] vs local[16]: pure-codegen
               thread scaling (~4.1× when quiet), the contrast proving
               that parquet/string-path contention (BENCH/BASELINE.md
               `idx_sum` discussion) is not a general thread ceiling.

Usage: python jobs/machine_controls.py [parallel|bandwidth|codegen|all]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def probe_parallel() -> None:
    from bench import parallel_control

    for _ in range(3):
        print(f"parallel_control(16): {parallel_control():.3f}s")


def _bw_worker(_i: int) -> float:
    import numpy as np

    a = np.empty(64_000_000, dtype=np.uint8)
    a[:] = 1
    t0 = time.perf_counter()
    reps = 0
    while time.perf_counter() - t0 < 3.0:
        a.sum()
        reps += 1
    return reps * a.nbytes / (time.perf_counter() - t0)


def probe_bandwidth() -> None:
    from multiprocessing import get_context

    for nproc in (1, 4, 8, 16):
        with get_context("fork").Pool(nproc) as pool:
            rates = pool.map(_bw_worker, range(nproc))
        agg = sum(rates) / 1e9
        print(f"bandwidth nproc={nproc:>2}: aggregate {agg:.1f} GB/s "
              f"({agg / nproc:.2f} GB/s per proc)")


def probe_codegen() -> None:
    from georaster_spark.session import get_spark

    for cpus in (4, 16):
        spark = get_spark(master=f"local[{cpus}]", app_name=f"ctl-{cpus}")
        df = spark.range(10_000_000_000, numPartitions=256)
        df.selectExpr("sum(id)").first()  # warmup/codegen
        t0 = time.perf_counter()
        df.selectExpr("sum(id)").first()
        print(f"codegen sum local[{cpus}]: {time.perf_counter() - t0:.1f}s")
        spark.stop()


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("parallel", "all"):
        probe_parallel()
    if which in ("bandwidth", "all"):
        probe_bandwidth()
    if which in ("codegen", "all"):
        probe_codegen()


if __name__ == "__main__":
    main()
