"""Flagship end-to-end pipeline (SURVEY §7.1 M1 / §7.4).

"Per zone: number of images whose centroid lies in the zone, and the
mean of their mean-pixel value."

Spine exercised: parquet scan (column-pruned) -> E1 georegister (map-only
Column math) -> fused decode+mean pandas UDF (single JVM<->Python Arrow
hop, ONLY for rows that need pixels) -> E5 broadcast PIP join ->
partial+final hash aggregation.  One shuffle total (the final groupBy);
the PIP join is broadcast so the big side never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import DEFAULT_RES
from ..functions.codecs import pixel_mean
from ..operators import georegister as geo
from ..operators.pip import pip_join
from ..sources.fixtures import fixtures_for_sf_dir


def load_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    fdir = fixtures_for_sf_dir(sf_dir)
    return spark.read.parquet(str(fdir / f"{name}.parquet"))


def zone_image_stats(
    images: DataFrame,
    zones: DataFrame,
    r: int = DEFAULT_RES,
    with_pixels: bool = True,
    max_ring: int | None = None,
) -> DataFrame:
    """Per-zone image count (+ mean of per-tile mean pixel value)."""
    tiles = geo.georegister(images, r)
    if with_pixels:
        tiles = tiles.withColumn(
            "tile_mean", pixel_mean(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"))
        )
    pairs = pip_join(
        tiles,
        zones,
        x=geo.centroid_x(),
        y=geo.centroid_y(),
        r=r,
        max_ring=max_ring,
    )
    aggs = [F.count(F.lit(1)).alias("n_images")]
    if with_pixels:
        aggs.append(F.round(F.avg("tile_mean"), 6).alias("avg_tile_mean"))
    return pairs.groupBy("zone_id").agg(*aggs).repartition(1).sortWithinPartitions("zone_id")


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    images = load_fixture(spark, sf_dir, "images")
    zones = load_fixture(spark, sf_dir, "zones")
    return zone_image_stats(images, zones)
