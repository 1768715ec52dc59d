"""Nodata masked-read semantics (R12/R14/E7 + nodata) and bicubic
interp (R14 order=3) vs the NumPy oracle, plus the upstream-parity
switches on coord_to_px / interp_bilinear (SURVEY §2.1 R9/R14 VERIFY).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from georaster_spark import oracle
from georaster_spark.operators import georegister as geo
from georaster_spark.operators import raster_io, sampling
from georaster_spark.operators.zonal import zonal_stats

GT = (1000.0, 2000.0, 10.0, 10.0)  # gt_x0, gt_y0, xres, yres
W = H = 16
NODATA = 7.0


def nd_arr() -> np.ndarray:
    """16x16 ramp with a 3x3 block of nodata (=7) at rows/cols 4..6 and a
    single nodata pixel at (10, 2)."""
    a = (np.arange(H)[:, None] * 3 + np.arange(W)[None, :] * 5 + 11) % 256
    a = a.astype(np.uint8)
    a[a == int(NODATA)] += 1  # only the planted pixels carry the value
    a[4:7, 4:7] = int(NODATA)
    a[10, 2] = int(NODATA)
    return a


@pytest.fixture(scope="module")
def nd_tiles(spark):
    df = raster_io.from_arrays(
        spark, [("nd0", nd_arr(), GT)], fmt="raw", nodata=NODATA
    )
    return geo.with_cells(df).cache()


def pts(spark, coords):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(coords)],
        "point_id long, x double, y double",
    )


def ctr(j, i):
    """World coords of pixel center (col j, row i)."""
    return (GT[0] + (j + 0.5) * GT[2], GT[1] - (i + 0.5) * GT[3])


# --- value_at_coords + nodata ------------------------------------------------


def test_value_at_nodata_null(spark, nd_tiles):
    p = pts(spark, [ctr(5, 5), ctr(2, 10), ctr(0, 0)])  # two nodata, one valid
    out = {r.point_id: r.val for r in sampling.value_at_coords(p, nd_tiles).collect()}
    assert out[0] is None and out[1] is None
    assert out[2] == float(nd_arr()[0, 0])


def test_value_window_excludes_nodata(spark, nd_tiles):
    a = nd_arr().astype(np.float64)
    # 3x3 around (5,5): entirely nodata -> NULL
    # 3x3 around (3,3): one nodata corner (4,4) -> mean over the other 8
    p = pts(spark, [ctr(5, 5), ctr(3, 3)])
    out = {r.point_id: r.val for r in sampling.value_at_coords(p, nd_tiles, window=3).collect()}
    assert out[0] is None
    patch = a[2:5, 2:5]
    expect = patch[patch != NODATA].mean()
    assert out[1] == pytest.approx(expect, abs=1e-12)


def test_interp_corner_nodata_null(spark, nd_tiles):
    a = nd_arr()
    # between centers (2,1)-(3,2) region: corners include (10,2)? choose
    # points whose 4 corners straddle the lone nodata at row 10, col 2
    x_nd = GT[0] + (2 + 0.7) * GT[2] - 0.5 * GT[2]  # fx = 2.2 -> j0=2
    y_nd = GT[1] - (10 + 0.2) * GT[3] - 0.5 * GT[3] * 0  # fy ~ 9.7 -> i0=9, i1=10
    p = pts(spark, [(x_nd, y_nd), ctr(0, 0)])
    out = {r.point_id: r.val for r in sampling.interp(p, nd_tiles, order=1).collect()}
    assert out[0] is None  # corner (10, 2) is nodata
    assert out[1] == pytest.approx(float(a[0, 0]))


def test_zonal_stats_nodata_excluded(spark, nd_tiles):
    a = nd_arr().astype(np.int64)
    ring = [
        {"x": 1000.0, "y": 1840.0}, {"x": 1160.0, "y": 1840.0},
        {"x": 1160.0, "y": 2000.0}, {"x": 1000.0, "y": 2000.0},
        {"x": 1000.0, "y": 1840.0},
    ]  # whole tile, CCW
    zones = spark.createDataFrame(
        [(1, ring, 1000.0, 1160.0, 1840.0, 2000.0)],
        "zone_id long, ring array<struct<x:double,y:double>>, "
        "xmin double, xmax double, ymin double, ymax double",
    )
    row = zonal_stats(nd_tiles, zones).collect()[0]
    keep = a[a != int(NODATA)]
    assert row.n_pixels == keep.size == W * H - 10
    assert row.sum_val == keep.sum()
    assert row.min_val == keep.min() and row.max_val == keep.max()


# --- bicubic (order=3) -------------------------------------------------------


def test_bicubic_exact_at_centers(spark, nd_tiles):
    a = nd_arr().astype(np.float64)
    p = pts(spark, [ctr(3, 8), ctr(0, 0), ctr(15, 15)])
    tiles_nn = nd_tiles.withColumn("nodata", F.lit(None).cast("double"))
    out = {r.point_id: r.val for r in sampling.interp(p, tiles_nn, order=3).collect()}
    assert out[0] == pytest.approx(a[8, 3], abs=1e-9)
    assert out[1] == pytest.approx(a[0, 0], abs=1e-9)
    assert out[2] == pytest.approx(a[15, 15], abs=1e-9)


def test_bicubic_matches_numpy_oracle_random(spark, nd_tiles):
    rng = np.random.RandomState(7)
    xs = GT[0] + rng.uniform(0, W * GT[2], 40)
    ys = GT[1] - rng.uniform(0, H * GT[3], 40)
    a = nd_arr()
    expect = oracle.interp_bicubic(a, xs, ys, GT[0], GT[1], GT[2], GT[3])
    tiles_nn = nd_tiles.withColumn("nodata", F.lit(None).cast("double"))
    p = pts(spark, list(zip(xs, ys)))
    out = sampling.interp(p, tiles_nn, order=3).orderBy("point_id").collect()
    got = np.array([r.val for r in out])
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)


def test_bicubic_nodata_masks_support(spark, nd_tiles):
    # sample right at the center of the nodata block -> NULL; far away -> value
    p = pts(spark, [ctr(5, 5), ctr(12, 12)])
    out = {r.point_id: r.val for r in sampling.interp(p, nd_tiles, order=3).collect()}
    assert out[0] is None
    assert out[1] is not None


def test_catmull_rom_weights_partition_of_unity():
    t = np.linspace(0, 0.999, 13)
    w = oracle._catmull_rom_weights(t)
    np.testing.assert_allclose(w[0] + w[1] + w[2] + w[3], np.ones_like(t), atol=1e-15)


# --- upstream-parity switches ------------------------------------------------


def test_coord_to_px_rounded_switch():
    # fraction 3.6 -> floor 3, round 4; fraction 2.5 -> round half-even 2
    j, i = oracle.coord_to_px(1036.0, 1975.0, *GT, W, H)
    assert (j, i) == (3, 2)
    j, i = oracle.coord_to_px(1036.0, 1975.0, *GT, W, H, rounded=True)
    assert (j, i) == (4, 2)
    j, i = oracle.coord_to_px(1025.0, 1975.0, *GT, W, H, rounded=True)
    assert j == 2  # np.round half-even: 2.5 -> 2


def test_coord_to_px_check_valid_switch():
    j, i = oracle.coord_to_px(GT[0] - 55.0, GT[1] + 95.0, *GT, W, H)
    assert (j, i) == (0, 0)  # clamped (engine default)
    j, i = oracle.coord_to_px(GT[0] - 55.0, GT[1] + 95.0, *GT, W, H, check_valid=False)
    assert (j, i) == (-6, -10)  # raw out-of-bounds indices


def test_interp_edge_zero_switch():
    a = np.full((4, 4), 10.0)
    # sample half a pixel outside the left edge: clamp -> 10, zero -> blend with 0
    x = GT[0] + 0.0  # fx = -0.5 -> j0 = -1 outside
    y = GT[1] - (1.5) * GT[3]
    v_clamp = oracle.interp_bilinear(a, x, y, GT[0], GT[1], GT[2], GT[3])
    v_zero = oracle.interp_bilinear(a, x, y, GT[0], GT[1], GT[2], GT[3], edge="zero")
    assert float(v_clamp) == pytest.approx(10.0)
    assert float(v_zero) == pytest.approx(5.0)  # t=0.5: half weight on cval=0


def test_api_coord_to_px_switches(spark, nd_tiles):
    from georaster_spark.api import SingleBandRaster

    sbr = SingleBandRaster(nd_tiles)
    jf, _ = sbr.coord_to_px(1036.0, 1975.0)
    jr, _ = sbr.coord_to_px(1036.0, 1975.0, rounded=True)
    assert (int(jf), int(jr)) == (3, 4)
    jo, io = sbr.coord_to_px(GT[0] - 55.0, GT[1] + 95.0, check_valid=False)
    assert (int(jo), int(io)) == (-6, -10)
