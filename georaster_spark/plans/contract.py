"""Driver-contract query registry (SURVEY §5.2 layer 2).

Each entry couples a Spark query builder ``(spark, sf_dir) -> DataFrame``
with a DuckDB oracle SQL string over the same parquet.  Column names are
aliased identically on both sides (the driver sorts columns by name and
hashes values).  Spatial queries read the committed fixture parquet under
``<repo>/fixtures/<sf>/`` (generated deterministically by
sources/fixtures.py); relational/text/vector queries read the driver's
own tables, which come pre-registered as DuckDB views.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import oracle_sql as osql
from ..constants import DEFAULT_RES, DOMAIN, RES_SHIFT
from ..functions import cells
from ..operators import georegister as geo
from ..sources.fixtures import fixtures_for_sf_dir
from .pipeline import zone_image_stats

QueryFn = Callable[[SparkSession, str], DataFrame]

# sf dir name -> fixture tile width (FIXTURES.md §5)
_TILE_W = {"sf0.001": 32, "sf0.01": 32, "sf0.1": 64}


def _fx(sf_dir: str) -> Path:
    return fixtures_for_sf_dir(sf_dir)


def _images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(str(_fx(sf_dir) / "images.parquet"))


def _zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(str(_fx(sf_dir) / "zones.parquet"))


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(str(_fx(sf_dir) / "points.parquet"))


# --- Spark sides -----------------------------------------------------------


def q_zone_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return zone_image_stats(_images(spark, sf_dir), _zones(spark, sf_dir))


def q_cell_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op E1/E2: anchor cell id of every tile (bit-for-bit surface)."""
    tiles = geo.georegister(_images(spark, sf_dir))
    return tiles.select("image_id", "cell_id").orderBy("image_id")


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op E3/E4: exploded (image_id, cell_id) covering assignments."""
    tiles = geo.georegister(_images(spark, sf_dir))
    return geo.tile_assignments(tiles).orderBy("image_id", "cell_id")


def q_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Op R7: per-tile extent (left, right, bottom, top) — pure Column math."""
    tiles = geo.georegister(_images(spark, sf_dir))
    return tiles.select(
        "image_id",
        F.col("xmin").alias("left"),
        F.col("xmax").alias("right"),
        F.col("ymin").alias("bottom"),
        F.col("ymax").alias("top"),
    ).orderBy("image_id")


# --- Oracle SQL sides ------------------------------------------------------


def _sql_zone_image_stats(fx: Path, w: int) -> str:
    return osql.flagship_sql(str(fx / "images.parquet"), str(fx / "zones.parquet"), w, w)


def _sql_cell_anchor(fx: Path) -> str:
    cell = osql.cell_expr("gt_x0", "gt_y0", DEFAULT_RES)
    return f"""
WITH {osql.georegister_cte(str(fx / 'images.parquet'))}
SELECT image_id, {cell} AS cell_id FROM tiles ORDER BY image_id
"""


def _sql_tile_assign(fx: Path) -> str:
    r = DEFAULT_RES
    s = float(DOMAIN >> r)
    n = (1 << r) - 1
    return f"""
WITH {osql.georegister_cte(str(fx / 'images.parquet'))},
boxes AS (
  SELECT image_id,
    least(greatest(CAST(floor(gt_x0 / {s}) AS BIGINT), 0), {n}) AS ix0,
    least(greatest(CAST(floor(({DOMAIN} - gt_y0) / {s}) AS BIGINT), 0), {n}) AS iy0,
    CAST(ceil((gt_x0 + w * gt_xres) / {s}) AS BIGINT) - 1 AS rx1,
    CAST(ceil(({DOMAIN} - (gt_y0 - h * gt_yres)) / {s}) AS BIGINT) - 1 AS ry1
  FROM tiles
),
boxes2 AS (
  SELECT image_id, ix0, iy0,
    greatest(least(greatest(rx1, 0), {n}), ix0) AS ix1,
    greatest(least(greatest(ry1, 0), {n}), iy0) AS iy1
  FROM boxes
)
SELECT image_id,
       ({r}::BIGINT << {RES_SHIFT}) + iy.iy * {1 << r} + ix.ix AS cell_id
FROM boxes2,
     unnest(generate_series(iy0, iy1)) AS iy(iy),
     unnest(generate_series(ix0, ix1)) AS ix(ix)
ORDER BY image_id, cell_id
"""


def _sql_extent(fx: Path) -> str:
    return f"""
WITH {osql.georegister_cte(str(fx / 'images.parquet'))}
SELECT image_id,
       gt_x0 AS "left",
       gt_x0 + w * gt_xres AS "right",
       gt_y0 - h * gt_yres AS bottom,
       gt_y0 AS top
FROM tiles ORDER BY image_id
"""


# --- Registry --------------------------------------------------------------


def spatial_queries() -> dict[str, QueryFn]:
    return {
        "zone_image_stats": q_zone_image_stats,
        "cell_anchor": q_cell_anchor,
        "tile_assign": q_tile_assign,
        "extent": q_extent,
    }


def spatial_oracles(sf: str = "sf0.01") -> dict[str, str]:
    fx = fixtures_for_sf_dir(f"/root/testdata/{sf}")
    w = _TILE_W[sf]
    return {
        "zone_image_stats": _sql_zone_image_stats(fx, w),
        "cell_anchor": _sql_cell_anchor(fx),
        "tile_assign": _sql_tile_assign(fx),
        "extent": _sql_extent(fx),
    }
