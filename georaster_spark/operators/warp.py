"""Op R15 — distributed reproject / warp + mosaic.

Reference analog: georaster/georaster.py :: __Raster.reproject
(≈L660-760 ⚠ UNVERIFIED — SURVEY §0/§2.1 R15): GDAL builds a target
grid in memory and `gdal.ReprojectImage` inverse-maps every target
pixel into the source.  Distributed re-expression (SURVEY §2.1):

  1. ENUMERATE the target tile grid (spark.range — no data motion).
  2. Each target tile's extent is transformed to the source CRS
     (closed-form 4326<->3857, axis-separable + monotonic, so the
     corner box is exact) — pure Column math.
  3. RANGE-JOIN source tiles whose extents intersect the target tile's
     source-CRS box, accelerated by the GQK cell equi-prefilter (the
     join IS the warp's data movement; broadcast the *target grid* side
     — it is metadata-only and tiny relative to the pixel side).
  4. One `applyInPandas` per target tile: inverse-map its pixel
     centers -> source CRS (NumPy), gather nearest/bilinear from each
     contributing source tile, mosaic deterministic first-valid in
     ascending image_id order (north-rule bit-for-bit posture), emit
     encoded bytes + the target geotransform columns.

Pixels no source covers get `nodata` (default 0).  Output rows follow
the engine tile schema so warps compose (a warped table can be warped,
zonal'd, sampled, written via raster_io.write_raster).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import oracle
from ..constants import DEFAULT_RES
from ..functions import cells

_MERC = "EPSG:3857"
_LL = "EPSG:4326"


@dataclass(frozen=True)
class TargetGrid:
    """R15's (target_srs, nx, ny, xmin, ymax, xres, yres) argument set."""

    crs: str
    x0: float  # left edge
    y0: float  # TOP edge (north-up)
    xres: float
    yres: float  # positive
    nx: int  # total pixels
    ny: int
    tile_w: int = 64
    tile_h: int = 64


def _to_lonlat(crs: str, x: np.ndarray, y: np.ndarray):
    if crs == _LL:
        return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)
    if crs == _MERC:
        return oracle.mercator_to_lonlat(x, y)
    utm = oracle.parse_utm_crs(crs)
    if utm is not None:
        return oracle.utm_to_lonlat(x, y, utm[0], north=utm[1])
    raise ValueError(f"unsupported CRS {crs}")


def _from_lonlat(crs: str, lon: np.ndarray, lat: np.ndarray):
    if crs == _LL:
        return np.asarray(lon, dtype=np.float64), np.asarray(lat, dtype=np.float64)
    if crs == _MERC:
        return oracle.lonlat_to_mercator(lon, lat)
    utm = oracle.parse_utm_crs(crs)
    if utm is not None:
        return oracle.lonlat_to_utm(lon, lat, utm[0], north=utm[1])
    raise ValueError(f"unsupported CRS {crs}")


def _to_source_xy(crs_from: str, crs_to: str, x: np.ndarray, y: np.ndarray):
    """Any pair among EPSG:4326 / EPSG:3857 / UTM (EPSG:326xx, 327xx) via
    the lon/lat hop — all legs closed-form (no pyproj in sandbox)."""
    if crs_from == crs_to:
        return x, y
    return _from_lonlat(crs_to, *_to_lonlat(crs_from, x, y))


def _grid_df(spark: SparkSession, g: TargetGrid, src_crs: str) -> DataFrame:
    """Target tile grid with extents in BOTH target and source CRS.

    4326<->3857 is axis-separable + monotonic, so the 2-corner box is
    exact.  Pairs involving UTM are NOT separable (meridian convergence
    bows transformed edges), so the source box samples a 3x3 grid of the
    tile extent and pads by 0.1% of the span — the box only PREFILTERS
    candidate sources (each pixel still passes the exact containment
    test), so over-covering is safe and under-covering is the only bug.
    """
    utm_leg = (
        oracle.parse_utm_crs(g.crs) is not None
        or oracle.parse_utm_crs(src_crs) is not None
    )
    ntx = -(-g.nx // g.tile_w)
    nty = -(-g.ny // g.tile_h)
    rows = []
    for ty in range(nty):
        for tx in range(ntx):
            w = min(g.tile_w, g.nx - tx * g.tile_w)
            h = min(g.tile_h, g.ny - ty * g.tile_h)
            gx0 = g.x0 + tx * g.tile_w * g.xres
            gy0 = g.y0 - ty * g.tile_h * g.yres
            if utm_leg:
                ex = np.linspace(gx0, gx0 + w * g.xres, 3)
                ey = np.linspace(gy0 - h * g.yres, gy0, 3)
                cx, cy = (m.ravel() for m in np.meshgrid(ex, ey))
            else:
                # extent corners in target crs (separable pair: exact)
                cx = np.array([gx0, gx0 + w * g.xres])
                cy = np.array([gy0 - h * g.yres, gy0])
            sx, sy = _to_source_xy(g.crs, src_crs, cx, cy)
            sx0, sx1 = float(np.min(sx)), float(np.max(sx))
            sy0, sy1 = float(np.min(sy)), float(np.max(sy))
            if utm_leg:
                pad_x = 1e-3 * (sx1 - sx0) + 1e-9
                pad_y = 1e-3 * (sy1 - sy0) + 1e-9
                sx0, sx1, sy0, sy1 = sx0 - pad_x, sx1 + pad_x, sy0 - pad_y, sy1 + pad_y
            rows.append(
                (ty * ntx + tx, tx, ty, w, h, gx0, gy0, sx0, sx1, sy0, sy1)
            )
    schema = (
        "tid long, tx int, ty int, w int, h int, gt_x0 double, gt_y0 double,"
        " s_xmin double, s_xmax double, s_ymin double, s_ymax double"
    )
    return spark.createDataFrame(rows, schema)


def reproject(
    tiles: DataFrame,
    grid: TargetGrid,
    method: str = "nearest",
    nodata: float = 0.0,
    r: int = DEFAULT_RES,
) -> DataFrame:
    """Warp `tiles` (engine tile schema incl. extent + cover_cells) onto
    `grid`.  method: 'nearest' (floor-gather, first-valid mosaic) |
    'bilinear' (pixel-center, edge-clamped inside each source tile) |
    'average' (gdalwarp -r average seam-blend analog: the nearest gather
    from EVERY covering source, blended per pixel with the integer-exact
    half-up mean (2·Σv + n) // (2n) — overlap seams average instead of
    first-source-wins, and the blended pixels stay oracle-checkable)."""
    if method not in ("nearest", "bilinear", "average"):
        raise ValueError(method)
    spark = tiles.sparkSession
    src_crs = tiles.select("crs").first()[0]
    g = _grid_df(spark, grid, src_crs)

    # cell prefilter: target tile source-box cover cells vs source cover_cells
    gx = g.withColumn(
        "cell_id",
        F.explode(cells.cell_cover(F.col("s_xmin"), F.col("s_xmax"), F.col("s_ymin"), F.col("s_ymax"), r)),
    )
    src = tiles.select(
        F.col("image_id"), F.col("bytes"), F.col("w").alias("sw"), F.col("h").alias("sh"),
        F.col("fmt"), F.col("gt_x0").alias("s_gx0"), F.col("gt_y0").alias("s_gy0"),
        F.col("gt_xres").alias("s_xres"), F.col("gt_yres").alias("s_yres"),
        F.col("xmin"), F.col("xmax"), F.col("ymin"), F.col("ymax"),
        F.explode("cover_cells").alias("cell_id"),
    )
    pairs = (
        src.join(F.broadcast(gx), "cell_id")
        .where(
            (F.col("xmin") < F.col("s_xmax")) & (F.col("xmax") > F.col("s_xmin"))
            & (F.col("ymin") < F.col("s_ymax")) & (F.col("ymax") > F.col("s_ymin"))
        )
        .drop("cell_id", "xmin", "xmax", "ymin", "ymax", "s_xmin", "s_xmax", "s_ymin", "s_ymax")
        .dropDuplicates(["tid", "image_id"])
    )

    out_schema = StructType(
        [
            StructField("tile_id", LongType()),
            StructField("bytes", BinaryType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("fmt", StringType()),
            StructField("gt_x0", DoubleType()),
            StructField("gt_y0", DoubleType()),
            StructField("gt_xres", DoubleType()),
            StructField("gt_yres", DoubleType()),
            StructField("crs", StringType()),
            StructField("n_filled", LongType()),
            StructField("n_sources", IntegerType()),
        ]
    )
    tgt_crs, txres, tyres = grid.crs, grid.xres, grid.yres
    bilinear = method == "bilinear"
    average = method == "average"

    def warp_tile(key, pdf: pd.DataFrame):
        row0 = pdf.iloc[0]
        w, h = int(row0["w"]), int(row0["h"])
        gx0, gy0 = float(row0["gt_x0"]), float(row0["gt_y0"])
        # target pixel centers -> source CRS
        cx = gx0 + (np.arange(w, dtype=np.float64) + 0.5) * txres
        cy = gy0 - (np.arange(h, dtype=np.float64) + 0.5) * tyres
        X, Y = np.meshgrid(cx, cy)
        SX, SY = _to_source_xy(tgt_crs, src_crs, X, Y)
        out = np.full((h, w), np.float64(nodata))
        filled = np.zeros((h, w), dtype=bool)
        acc = np.zeros((h, w), dtype=np.int64)
        cnt = np.zeros((h, w), dtype=np.int64)
        for _, s in pdf.sort_values("image_id").iterrows():
            arr = oracle.decode_pixels(s["bytes"], int(s["sw"]), int(s["sh"]), s["fmt"])
            sx0, sy0 = float(s["s_gx0"]), float(s["s_gy0"])
            xr, yr = float(s["s_xres"]), float(s["s_yres"])
            inside = (
                (SX >= sx0) & (SX < sx0 + int(s["sw"]) * xr)
                & (SY > sy0 - int(s["sh"]) * yr) & (SY <= sy0)
            )
            if not average:
                inside &= ~filled
            if not inside.any():
                continue
            px, py = SX[inside], SY[inside]
            if bilinear:
                vals = oracle.interp_bilinear(arr, px, py, sx0, sy0, xr, yr)
            elif average:
                acc[inside] += oracle.value_at(arr, px, py, sx0, sy0, xr, yr).astype(np.int64)
                cnt[inside] += 1
                continue
            else:
                vals = oracle.value_at(arr, px, py, sx0, sy0, xr, yr).astype(np.float64)
            out[inside] = vals
            filled |= inside
        if average:
            filled = cnt > 0
            # integer-exact half-up mean: (2Σv + n) // (2n) == floor(Σv/n + .5)
            out[filled] = ((2 * acc[filled] + cnt[filled]) // (2 * cnt[filled])).astype(
                np.float64
            )
        # Half-up quantization (floor(v + 0.5)) — normative engine rule:
        # identical to rint for the integer-valued nearest path, and for
        # bilinear it is reproducible in plain SQL (FLOOR(v + 0.5)), so
        # the warped PIXELS stay oracle-checkable.  (np.rint's half-even
        # rule has no DuckDB twin.)
        enc = oracle.encode_pixels(np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8), "raw")
        return pd.DataFrame(
            {
                "tile_id": [int(row0["tid"])],
                "bytes": [enc],
                "w": [w],
                "h": [h],
                "fmt": ["raw"],
                "gt_x0": [gx0],
                "gt_y0": [gy0],
                "gt_xres": [txres],
                "gt_yres": [tyres],
                "crs": [tgt_crs],
                "n_filled": [int(filled.sum())],
                "n_sources": [len(pdf)],
            }
        )

    return pairs.groupBy("tid").applyInPandas(warp_tile, schema=out_schema)
