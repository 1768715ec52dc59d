"""M5: R15 reproject/warp, R6 sink, R5 from_array, R2 downsample,
R3/R4 multiband — engine vs NumPy oracle (SURVEY §5.2 layer 1/3)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from georaster_spark import oracle
from georaster_spark.operators import raster_io, warp
from georaster_spark.operators.georegister import with_cells
from georaster_spark.sources import icelite


def _quilt_tiles(spark, n=2, w=32):
    """n x n adjacent ramp tiles with 10-unit pixels starting at (1000, 2000+n*w*10)."""
    items = []
    for ty in range(n):
        for tx in range(n):
            idx = ty * n + tx
            arr = oracle.ramp_tile(idx, w, w)
            gx0 = 1000.0 + tx * w * 10.0
            gy0 = 2000.0 + (n - ty) * w * 10.0
            items.append((f"t{idx}", arr, (gx0, gy0, 10.0, 10.0)))
    df = with_cells(raster_io.from_arrays(spark, items))
    return df, items


def _stitched(items, n, w):
    big = np.zeros((n * w, n * w), dtype=np.uint8)
    for ty in range(n):
        for tx in range(n):
            arr = items[ty * n + tx][1]
            big[ty * w : (ty + 1) * w, tx * w : (tx + 1) * w] = arr
    return big


def test_from_array_roundtrip(spark):
    arr = oracle.ramp_tile(7, 16, 12)
    df = raster_io.from_arrays(spark, [("a", arr, (0.0, 120.0, 1.0, 1.0))])
    row = df.collect()[0]
    got = oracle.decode_pixels(row["bytes"], row["w"], row["h"], row["fmt"])
    assert np.array_equal(got, arr)
    assert (row["w"], row["h"], row["nbands"]) == (16, 12, 1)


def test_reproject_identity_mosaic(spark):
    n, w = 2, 32
    tiles, items = _quilt_tiles(spark, n, w)
    grid = warp.TargetGrid(
        crs="EPSG:3857", x0=1000.0, y0=2000.0 + n * w * 10.0,
        xres=10.0, yres=10.0, nx=n * w, ny=n * w, tile_w=w, tile_h=w,
    )
    out = warp.reproject(tiles, grid, method="nearest").collect()
    assert len(out) == n * n
    big = _stitched(items, n, w)
    for row in out:
        got = oracle.decode_pixels(row["bytes"], row["w"], row["h"], row["fmt"])
        ty, tx = divmod(row["tile_id"], n)
        exp = big[ty * w : (ty + 1) * w, tx * w : (tx + 1) * w]
        assert np.array_equal(got, exp), f"tile {row['tile_id']}"
        assert row["n_filled"] == w * w


def test_reproject_shifted_grid_bilinear(spark):
    """Target grid offset by half a source pixel: bilinear values must
    match the oracle kernel applied at the target centers."""
    n, w = 2, 32
    tiles, items = _quilt_tiles(spark, n, w)
    grid = warp.TargetGrid(
        crs="EPSG:3857", x0=1005.0, y0=1995.0 + n * w * 10.0,
        xres=10.0, yres=10.0, nx=w, ny=w, tile_w=w, tile_h=w,
    )
    rows = warp.reproject(tiles, grid, method="bilinear").collect()
    assert len(rows) == 1
    row = rows[0]
    got = oracle.decode_pixels(row["bytes"], row["w"], row["h"], row["fmt"])
    # oracle: first-valid mosaic in image_id order at the target centers
    cx = grid.x0 + (np.arange(w) + 0.5) * grid.xres
    cy = grid.y0 - (np.arange(w) + 0.5) * grid.yres
    X, Y = np.meshgrid(cx, cy)
    exp = np.zeros((w, w))
    filled = np.zeros((w, w), dtype=bool)
    for tid, arr, (gx0, gy0, xr, yr) in sorted(items, key=lambda t: t[0]):
        inside = (
            (X >= gx0) & (X < gx0 + arr.shape[1] * xr)
            & (Y > gy0 - arr.shape[0] * yr) & (Y <= gy0) & ~filled
        )
        if inside.any():
            exp[inside] = oracle.interp_bilinear(arr, X[inside], Y[inside], gx0, gy0, xr, yr)
            filled |= inside
    assert np.array_equal(got, np.clip(np.floor(exp + 0.5), 0, 255).astype(np.uint8))


def test_reproject_crs_roundtrip_cell(spark):
    """3857 source -> 4326 target grid: a warped pixel equals a nearest
    gather at the inverse-mapped center (spot check, all corners)."""
    w = 32
    tiles, items = _quilt_tiles(spark, 1, w)
    _, arr, (gx0, gy0, xr, yr) = ("t0", items[0][1], items[0][2])
    lon_min, lat_min = oracle.mercator_to_lonlat(gx0, gy0 - w * yr)
    lon_max, lat_max = oracle.mercator_to_lonlat(gx0 + w * xr, gy0)
    grid = warp.TargetGrid(
        crs="EPSG:4326", x0=float(lon_min), y0=float(lat_max),
        xres=float(lon_max - lon_min) / w, yres=float(lat_max - lat_min) / w,
        nx=w, ny=w, tile_w=w, tile_h=w,
    )
    row = warp.reproject(tiles, grid, method="nearest").collect()[0]
    got = oracle.decode_pixels(row["bytes"], row["w"], row["h"], row["fmt"])
    assert row["crs"] == "EPSG:4326"
    assert row["n_filled"] >= w * w - 4 * w  # edge centers may map outside
    cx = grid.x0 + (np.arange(w) + 0.5) * grid.xres
    cy = grid.y0 - (np.arange(w) + 0.5) * grid.yres
    X, Y = np.meshgrid(cx, cy)
    SX, SY = oracle.lonlat_to_mercator(X, Y)
    inside = (SX >= gx0) & (SX < gx0 + w * xr) & (SY > gy0 - w * yr) & (SY <= gy0)
    exp = np.zeros((w, w), dtype=np.uint8)
    exp[inside] = oracle.value_at(arr, SX[inside], SY[inside], gx0, gy0, xr, yr)
    assert np.array_equal(got[inside], exp[inside])


def test_downsample(spark):
    arr = oracle.ramp_tile(3, 33, 33)
    df = raster_io.from_arrays(spark, [("a", arr, (0.0, 330.0, 10.0, 10.0))])
    out = raster_io.downsample(df, 4).collect()[0]
    got = oracle.decode_pixels(out["bytes"], out["w"], out["h"], out["fmt"])
    assert np.array_equal(got, arr[::4, ::4])
    assert (out["w"], out["h"]) == (9, 9)
    assert out["gt_xres"] == 40.0


def test_band_select_and_stats(spark):
    arr = np.stack([oracle.ramp_tile(i, 16, 16) for i in range(3)])
    df = raster_io.from_arrays(spark, [("m", arr, (0.0, 160.0, 10.0, 10.0))])
    sel = raster_io.band_select(df, [3, 1]).collect()[0]
    got = oracle.decode_pixels(sel["bytes"], 16, 16, sel["fmt"], nbands=2)
    assert np.array_equal(got, arr[[2, 0]])
    assert sel["nbands"] == 2
    assert raster_io.gdal_band_index([3, 1], 1) == 1

    stats = {r["band"]: r for r in raster_io.band_stats(df).collect()}
    for b in range(3):
        assert stats[b + 1]["mean_val"] == float(arr[b].mean(dtype=np.float64))
        assert stats[b + 1]["max_val"] == float(arr[b].max())


def test_write_raster_mask_and_snapshot(spark, tmp_path):
    arr = oracle.ramp_tile(5, 16, 16)
    mask = np.zeros_like(arr)
    mask[:8] = 1  # top half masked
    df = raster_io.from_arrays(spark, [("a", arr, (0.0, 160.0, 10.0, 10.0))]).withColumn(
        "mask", F.lit(bytes(mask.tobytes()))
    )
    v = raster_io.write_raster(
        df, tmp_path / "tbl", fmt_to="raw", nodata_fill=255, mask_col="mask"
    )
    back = icelite.read_snapshot(spark, tmp_path / "tbl", version=v).collect()[0]
    got = oracle.decode_pixels(back["bytes"], 16, 16, back["fmt"])
    assert (got[:8] == 255).all()
    assert np.array_equal(got[8:], arr[8:])
