#!/usr/bin/env python
"""Production job entry point — ship with:

    python jobs/package_pyfiles.py             # -> dist/georaster_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/georaster_spark.zip \\
        jobs/run_pipeline.py --sf-dir <data> --out <dir> [--resume]

Runs the flagship zonal pipeline (georegister -> fused decode+mean ->
broadcast PIP -> per-zone agg) with op E9 durability: per-unit
manifests + icelite snapshot pinning, so a killed run resumes exactly
(`--resume` is implicit — a rerun only processes unfinished units).

The session comes from spark-submit's conf (no master hardcoded here);
georaster_spark.session.get_spark is only the local/test factory.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--unit-res", type=int, default=8, help="work-unit cell resolution")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("georaster-flagship").getOrCreate()

    from georaster_spark.constants import DEFAULT_RES
    from georaster_spark.functions import cells
    from georaster_spark.functions.codecs import pixel_mean
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.pip import pip_join
    from georaster_spark.plans import checkpoint as ckpt
    from georaster_spark.plans.pipeline import load_fixture
    from georaster_spark.sources import icelite

    images = load_fixture(spark, args.sf_dir, "images")
    zones = load_fixture(spark, args.sf_dir, "zones")

    # pin the input: icelite snapshot of the images table (lineage)
    in_tbl = f"{args.out}/input_snapshot"
    try:
        snap_v = icelite.current_version(in_tbl)
        if snap_v is None:
            raise FileNotFoundError
    except FileNotFoundError:
        snap_v = icelite.write_snapshot(images, in_tbl, mode="append")
    pinned = icelite.read_snapshot(spark, in_tbl, version=snap_v)

    tiles = (
        geo.georegister(pinned)
        .withColumn("tile_mean", pixel_mean(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")))
        .withColumn("unit", cells.cell_parent_chain(F.col("cell_id"), DEFAULT_RES, args.unit_res))
    )
    pairs = pip_join(tiles, zones, x=geo.centroid_x(), y=geo.centroid_y())
    result = pairs.select("image_id", "zone_id", "tile_mean", "unit")

    report = ckpt.checkpointed_write(
        result,
        f"{args.out}/zone_pairs",
        "unit",
        metric_aggs={"mean_tile_mean": F.avg("tile_mean")},
        input_snapshot=f"v{snap_v}",
    )
    print(
        json.dumps(
            {
                "snapshot": snap_v,
                "processed_units": len(report.processed_units),
                "skipped_units": len(report.skipped_units),
                "rows_written": report.rows_written,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
