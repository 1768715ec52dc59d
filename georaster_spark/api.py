"""Reference-compatible API façade.

Mirrors the public surface of georaster/georaster.py (SingleBandRaster /
MultiBandRaster / simple_write_geotiff — symbol names per the public
upstream repo, ≈bands UNVERIFIED, SURVEY §0) so a user of the reference
can switch with minimal edits.  Every method delegates to the
DISTRIBUTED operators over an engine tiles DataFrame — a
SingleBandRaster here is a 1-row view of the same table the cluster
operators run on, so code written against this façade scales by
swapping the 1-row DataFrame for the full table.

Deliberate deviations (documented in SURVEY §2.1):
* coord_to_px: floor + clamp (upstream np.round is a flagged VERIFY).
* interp: pixel-center bilinear, edge-clamped (upstream scipy
  constant-0 out-of-range is a flagged VERIFY).
* No GDAL: sources are parquet tables / NumPy arrays; `latlon=True`
  accepts lon/lat and converts via the closed-form WebMercator pair.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import oracle
from .operators import raster_io, sampling
from .operators.georegister import with_cells


def _to_xy(latlon: bool, x, y):
    if latlon:
        return oracle.lonlat_to_mercator(x, y)
    return np.asarray(x, dtype=np.float64), np.asarray(y, dtype=np.float64)


class SingleBandRaster:
    """georaster.SingleBandRaster analog over an engine tile row.

    Construct from a tiles DataFrame (one row) or `from_array`.  The
    pixel payload loads lazily (`load_data=False` defers the collect —
    the reference's metadata-only open, SURVEY §2.1 R2)."""

    def __init__(self, tiles: DataFrame, load_data: bool = True, band: int = 1):
        self._df = with_cells(tiles) if "cell_id" not in tiles.columns else tiles
        meta_cols = [c for c in self._df.columns if c != "bytes"]
        row = self._df.select(*meta_cols).first()
        if row is None:
            raise ValueError("empty tiles DataFrame")
        self._meta = row.asDict()
        self.nx = int(row["w"])
        self.ny = int(row["h"])
        self.trans = (
            float(row["gt_x0"]), float(row["gt_xres"]), 0.0,
            float(row["gt_y0"]), 0.0, -float(row["gt_yres"]),
        )  # GDAL 6-tuple, north-up (negative yres), as upstream exposes it
        self.extent = (
            float(row["gt_x0"]),
            float(row["gt_x0"]) + self.nx * float(row["gt_xres"]),
            float(row["gt_y0"]) - self.ny * float(row["gt_yres"]),
            float(row["gt_y0"]),
        )
        self.crs = row["crs"] if "crs" in self._meta else "EPSG:3857"
        self.band = band
        self._r: np.ndarray | None = None
        if load_data:
            _ = self.r

    # -- data access --------------------------------------------------------

    @property
    def r(self) -> np.ndarray:
        if self._r is None:
            self._r = self.read_single_band(self.band)
        return self._r

    def read_single_band(self, band: int = 1) -> np.ndarray:
        cols = ["bytes", "w", "h", "fmt"] + (["nbands"] if "nbands" in self._df.columns else [])
        row = self._df.select(*cols).first()
        nb = int(row["nbands"]) if "nbands" in cols and row["nbands"] is not None else 1
        arr = oracle.decode_pixels(row["bytes"], int(row["w"]), int(row["h"]), row["fmt"], nbands=nb)
        return arr if nb == 1 else arr[band - 1]

    def read_single_band_subset(self, bounds, latlon=False, extent=False, band=1, update_info=False):
        from .operators.subset import read_subset

        if latlon:
            x0, y0 = _to_xy(True, bounds[0], bounds[2])
            x1, y1 = _to_xy(True, bounds[1], bounds[3])
            bounds = (float(x0), float(x1), float(y0), float(y1))
        sub = SingleBandRaster(read_subset(self._df, bounds), load_data=True, band=band)
        if update_info:
            return sub  # the new object IS the updated-info raster
        if extent:
            return sub.r, sub.extent
        return sub.r

    @classmethod
    def from_array(cls, raster: np.ndarray, geo_transform, proj4: str = "EPSG:3857",
                   nodata=None, spark: SparkSession | None = None) -> "SingleBandRaster":
        spark = spark or SparkSession.active()
        x0, xres, _r0, y0, _r1, yres = geo_transform  # GDAL order
        df = raster_io.from_arrays(
            spark, [("from_array", raster, (x0, y0, xres, abs(yres)))],
            fmt="raw16" if raster.dtype.itemsize > 1 else "raw",
            crs=proj4, nodata=nodata,
        )
        return cls(df)

    # -- georeferencing math -------------------------------------------------

    def get_extent_latlon(self):
        xmin, xmax, ymin, ymax = self.extent
        lon0, lat0 = oracle.mercator_to_lonlat(xmin, ymin)
        lon1, lat1 = oracle.mercator_to_lonlat(xmax, ymax)
        return (float(lon0), float(lon1), float(lat0), float(lat1))

    def get_extent_projected(self, crs: str):
        """R8 analog of upstream get_extent_projected(pyproj_obj): extent
        envelope reprojected to `crs` — any of EPSG:4326 / EPSG:3857 /
        UTM EPSG:326xx/327xx (closed-form transforms; the sandbox has no
        pyproj, so a CRS string replaces the projection object).  The
        envelope samples a 3x3 grid of the extent because UTM legs are
        not axis-separable (transformed edges bow)."""
        from .operators.warp import _to_source_xy

        ex = np.linspace(self.extent[0], self.extent[1], 3)
        ey = np.linspace(self.extent[2], self.extent[3], 3)
        gx, gy = np.meshgrid(ex, ey)
        px, py = _to_source_xy(self.crs, crs, gx.ravel(), gy.ravel())
        return (float(np.min(px)), float(np.max(px)), float(np.min(py)), float(np.max(py)))

    def coord_to_px(self, x, y, latlon: bool = False, rounded: bool = False, check_valid: bool = True):
        """World -> pixel indices.  Engine-normative defaults: floor +
        clamp (rounded=False, check_valid=True).  NOTE the deliberate
        default deviation from upstream (rounded=True there — np.round
        half-even): pass rounded=True / check_valid=False explicitly for
        upstream parity; the switches are honored all the way down
        (oracle.coord_to_px)."""
        px, py = _to_xy(latlon, x, y)
        j, i = oracle.coord_to_px(
            px, py, self.trans[0], self.trans[3], self.trans[1], -self.trans[5],
            self.nx, self.ny, rounded=rounded, check_valid=check_valid,
        )
        return j, i

    def coordinates(self):
        return oracle.pixel_centers(
            self.trans[0], self.trans[3], self.trans[1], -self.trans[5], self.nx, self.ny
        )

    # -- sampling (delegates to the distributed operators) -------------------

    def _points_df(self, x, y, latlon):
        px, py = _to_xy(latlon, x, y)
        px, py = np.atleast_1d(px), np.atleast_1d(py)
        spark = self._df.sparkSession
        return spark.createDataFrame(
            [(int(i), float(a), float(b)) for i, (a, b) in enumerate(zip(px, py))],
            "point_id long, x double, y double",
        ), px.shape

    def value_at_coords(self, x, y, latlon: bool = False, band=None, system=None,
                        window: int | None = None, return_window: bool = False):
        if return_window:  # patch gather is local by definition
            j, i = self.coord_to_px(x, y, latlon)
            half = (window or 1) // 2
            return self.r[
                max(0, int(i) - half): int(i) + half + 1,
                max(0, int(j) - half): int(j) + half + 1,
            ]
        pts, shape = self._points_df(x, y, latlon)
        out = sampling.value_at_coords(pts, self._df, window=window)
        vals = np.array([r["val"] for r in out.orderBy("point_id").collect()])
        return float(vals[0]) if shape == (1,) and np.isscalar(x) else vals.reshape(shape)

    find_value_at_coords = value_at_coords  # upstream deprecated alias (R17)

    def interp(self, x, y, order: int = 1, latlon: bool = False):
        pts, shape = self._points_df(x, y, latlon)
        out = sampling.interp(pts, self._df, order=order)
        vals = np.array([r["val"] for r in out.orderBy("point_id").collect()])
        return float(vals[0]) if shape == (1,) and np.isscalar(x) else vals.reshape(shape)

    # -- warp / set ops ------------------------------------------------------

    def reproject(self, target_srs: str, nx: int, ny: int, xmin: float, ymax: float,
                  xres: float, yres: float, dtype=None, nodata=0.0,
                  interp_type: str = "nearest", progress: bool = False) -> "SingleBandRaster":
        from .operators.warp import TargetGrid, reproject

        grid = TargetGrid(crs=target_srs, x0=xmin, y0=ymax, xres=xres, yres=yres,
                          nx=nx, ny=ny, tile_w=nx, tile_h=ny)
        method = "bilinear" if "bilinear" in interp_type.lower() else "nearest"
        out = reproject(self._df, grid, method=method, nodata=nodata)
        out = out.withColumnRenamed("tile_id", "image_id").withColumn(
            "image_id", F.col("image_id").cast("string")
        ).withColumn("nbands", F.lit(1)).withColumn("nodata", F.lit(float(nodata)))
        return SingleBandRaster(out)

    def intersection(self, other: "SingleBandRaster"):
        a, b = self.extent, other.extent
        xmin, xmax = max(a[0], b[0]), min(a[1], b[1])
        ymin, ymax = max(a[2], b[2]), min(a[3], b[3])
        if xmin >= xmax or ymin >= ymax:
            return None
        return (xmin, xmax, ymin, ymax)


class MultiBandRaster(SingleBandRaster):
    """R3/R4: band-aware view; `bands` lists loaded band ids (1-based)."""

    def __init__(self, tiles: DataFrame, bands="all", load_data: bool = True):
        super().__init__(tiles, load_data=False)
        nb = int(self._meta.get("nbands") or 1)
        self.bands = list(range(1, nb + 1)) if bands == "all" else list(bands)
        if load_data:
            row = self._df.select("bytes", "w", "h", "fmt", "nbands").first()
            arr = oracle.decode_pixels(
                row["bytes"], int(row["w"]), int(row["h"]), row["fmt"], nbands=nb
            )
            if arr.ndim == 2:
                arr = arr[None]
            self._r = np.stack([arr[b - 1] for b in self.bands], axis=-1)  # (ny, nx, nb)

    def gdal_band(self, b: int) -> int:
        return self.bands.index(b)


def simple_write_geotiff(outfile, raster, geoTransform, wkt=None, proj4="EPSG:3857",
                         mask=None, dtype=None, nodata_value=None,
                         spark: SparkSession | None = None) -> int:
    """R6 analog: writes an icelite table (parquet + snapshot) — GeoTIFF
    the container is out of scope without GDAL; the information content
    (pixels + geotransform + CRS + nodata) round-trips.  Returns the
    snapshot version."""
    spark = spark or SparkSession.active()
    x0, xres, _r0, y0, _r1, yres = geoTransform
    df = raster_io.from_arrays(
        spark, [("write0", raster, (x0, y0, xres, abs(yres)))],
        fmt="raw16" if raster.dtype.itemsize > 1 else "raw",
        crs=proj4, nodata=nodata_value,
    )
    if mask is not None:
        df = df.withColumn("mask", F.lit(bytes(np.asarray(mask, dtype=np.uint8).tobytes())))
        return raster_io.write_raster(
            df, outfile, nodata_fill=nodata_value or 0, mask_col="mask",
            fmt_to="raw16" if raster.dtype.itemsize > 1 else "raw",
        )
    return raster_io.write_raster(df, outfile)
