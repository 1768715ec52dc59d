#!/usr/bin/env python
"""Per-leg scaling probe for the BENCH headline job.

Runs each leg of bench.headline_job separately in THIS process at the
parallelism given by --cpus, printing a JSON line of per-leg wall times.
Used to locate which leg breaks N->4N scaling efficiency (BASELINE.md);
not part of the driver contract.

Usage: python jobs/scaling_probe.py --cpus 4 --repl 128 [--split 512k]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--repl", type=int, default=128)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--split", default="512k")
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from georaster_spark.session import get_spark
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.pip import pip_join
    from georaster_spark.plans.pipeline import load_fixture, zone_image_stats

    spark = get_spark(
        master=f"local[{args.cpus}]",
        app_name=f"probe-{args.cpus}",
        extra_conf={
            "spark.sql.files.maxPartitionBytes": args.split,
            "spark.sql.files.openCostInBytes": "64k",
        },
    )

    def replicated():
        images = load_fixture(spark, args.sf_dir, "images")
        if args.repl > 1:
            idx = geo.image_idx()
            images = images.withColumn(
                "_rep", F.explode(F.array(*[F.lit(i) for i in range(args.repl)]))
            ).withColumn(
                "image_id", F.format_string("img%08d", idx + F.col("_rep") * 100_000)
            ).drop("_rep")
        return images

    zones = load_fixture(spark, args.sf_dir, "zones")

    def leg_assign():
        tiles = geo.georegister(replicated().select("image_id", "w", "h"))
        return geo.tile_assignments(tiles).count()

    def leg_pip():
        tiles = geo.georegister(replicated().select("image_id", "w", "h"))
        return pip_join(tiles, zones, x=geo.centroid_x(), y=geo.centroid_y()).count()

    def leg_pixel():
        return zone_image_stats(replicated(), zones).count()

    legs = {"assign": leg_assign, "pip": leg_pip, "pixel": leg_pixel}
    for _ in range(args.warmup):
        for fn in legs.values():
            fn()
    out = {"cpus": args.cpus, "repl": args.repl, "split": args.split}
    for name, fn in legs.items():
        t0 = time.perf_counter()
        fn()
        out[f"{name}_sec"] = round(time.perf_counter() - t0, 3)
    out["total_sec"] = round(sum(v for k, v in out.items() if k.endswith("_sec")), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
