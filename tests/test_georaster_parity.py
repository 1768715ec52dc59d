"""Reference-parity suite (SURVEY §5.2 layer 1).

Reimplements the four upstream test themes — extent, coordinates,
value_at_coords, interp (georaster test/test_georaster.py ⚠, reference
dir empty, SURVEY §0) — against the deterministic landsat-like tile
(FIXTURES.md §4) with hand-derived constants, exercised through the
DISTRIBUTED operators (Spark), with oracle.py as the executable spec.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from georaster_spark import oracle
from georaster_spark.operators import extent as ext
from georaster_spark.operators import georegister as geo
from georaster_spark.operators import sampling, subset

GT = (500000.0, 4200000.0, 30.0, 30.0)  # gt_x0, gt_y0, xres, yres
W = H = 64


def landsat_arr() -> np.ndarray:
    return (np.arange(H, dtype=np.uint16)[:, None] * 64 + np.arange(W, dtype=np.uint16)[None, :])


@pytest.fixture(scope="module")
def landsat_tiles(spark, sf0001_dir):
    df = spark.read.parquet(str(sf0001_dir / "landsat.parquet"))
    return geo.with_cells(df).cache()


def pts_df(spark, coords):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(coords)],
        "point_id long, x double, y double",
    )


# --- extent (test_extent analog) -------------------------------------------


def test_extent_constants(landsat_tiles):
    row = landsat_tiles.select("xmin", "xmax", "ymin", "ymax").first()
    assert (row.xmin, row.xmax, row.ymin, row.ymax) == (500000.0, 501920.0, 4198080.0, 4200000.0)


def test_extent_latlon_roundtrip(landsat_tiles):
    row = ext.extent_latlon(landsat_tiles).first()
    # engine treats the UTM-like numbers as planar EPSG:3857 (FIXTURES §4)
    lon_min, lat_max = oracle.mercator_to_lonlat(500000.0, 4200000.0)
    assert row.lon_min == pytest.approx(float(lon_min), abs=1e-12)
    assert row.lat_max == pytest.approx(float(lat_max), abs=1e-12)
    # closed-form inverse o forward == identity
    x, y = oracle.lonlat_to_mercator(*oracle.mercator_to_lonlat(500000.0, 4198080.0))
    assert float(x) == pytest.approx(500000.0, abs=1e-6)
    assert float(y) == pytest.approx(4198080.0, abs=1e-6)


# --- coordinates (pixel-center) --------------------------------------------


def test_coordinates_pixel_center(landsat_tiles):
    first = (
        ext.coordinates_demo(landsat_tiles)
        .where((F.col("i") == 0) & (F.col("j") == 0))
        .first()
    )
    assert (first.cx, first.cy) == (500015.0, 4199985.0)
    xs, ys = oracle.pixel_centers(*GT, W, H)
    assert (xs[0, 0], ys[0, 0]) == (500015.0, 4199985.0)


# --- value_at_coords --------------------------------------------------------


def test_value_at_coords_constants(spark, landsat_tiles):
    pts = pts_df(
        spark,
        [
            (500015.0, 4199985.0),  # pixel (0,0) center -> 0
            (500045.0, 4199985.0),  # pixel (0,1) -> 1
            (500015.0, 4199955.0),  # pixel (1,0) -> 64
            (501919.0, 4198081.0),  # bottom-right pixel -> 64*63+63
            (500000.0, 4200000.0),  # top-left CORNER (edge rule) -> 0
        ],
    )
    got = {
        r.point_id: r.val
        for r in sampling.value_at_coords(pts, landsat_tiles).collect()
    }
    assert got == {0: 0.0, 1: 1.0, 2: 64.0, 3: float(64 * 63 + 63), 4: 0.0}


def test_value_window_mean(spark, landsat_tiles):
    # 3x3 window around pixel (1,1): values {0,1,2,64,65,66,128,129,130} -> mean 65
    pts = pts_df(spark, [(500045.0, 4199955.0)])
    got = sampling.value_at_coords(pts, landsat_tiles, window=3).first()
    assert got.val == 65.0
    # corner pixel (0,0): clipped window {0,1,64,65} -> 32.5
    pts2 = pts_df(spark, [(500015.0, 4199985.0)])
    assert sampling.value_at_coords(pts2, landsat_tiles, window=3).first().val == 32.5


# --- interp -----------------------------------------------------------------


def test_interp_at_centers_equals_exact(spark, landsat_tiles):
    coords = [(500015.0 + 30.0 * j, 4199985.0 - 30.0 * i) for i, j in [(0, 0), (3, 5), (10, 10), (63, 63)]]
    pts = pts_df(spark, coords)
    got = {r.point_id: r.val for r in sampling.interp(pts, landsat_tiles).collect()}
    arr = landsat_arr()
    for pid, (i, j) in enumerate([(0, 0), (3, 5), (10, 10), (63, 63)]):
        assert got[pid] == float(arr[i, j])


def test_interp_midway(spark, landsat_tiles):
    # midway between pixel centers (0,0) and (0,1) -> 0.5
    pts = pts_df(spark, [(500030.0, 4199985.0)])
    assert sampling.interp(pts, landsat_tiles).first().val == 0.5


def test_interp_order0_equals_value_at(spark, landsat_tiles, sf0001_dir):
    rng = np.random.default_rng(17)
    xs = rng.uniform(500000.0, 501920.0, 50)
    ys = rng.uniform(4198080.0, 4200000.0, 50)
    pts = pts_df(spark, list(zip(xs, ys)))
    v0 = {r.point_id: r.val for r in sampling.interp(pts, landsat_tiles, order=0).collect()}
    v1 = {r.point_id: r.val for r in sampling.value_at_coords(pts, landsat_tiles).collect()}
    assert v0 == v1


def test_interp_matches_numpy_oracle_random(spark, landsat_tiles):
    rng = np.random.default_rng(23)
    xs = rng.uniform(500000.0, 501920.0, 100)
    ys = rng.uniform(4198080.0, 4200000.0, 100)
    pts = pts_df(spark, list(zip(xs, ys)))
    got = {r.point_id: r.val for r in sampling.interp(pts, landsat_tiles).collect()}
    expect = oracle.interp_bilinear(landsat_arr(), xs, ys, *GT)
    for pid in range(100):
        assert got[pid] == float(expect[pid])


# --- coord_to_px (R9) -------------------------------------------------------


def test_coord_to_px_floor_clamp(spark, landsat_tiles):
    pts = pts_df(spark, [(500000.0, 4200000.0), (500031.0, 4199969.0), (501919.9, 4198080.1)])
    got = {r.point_id: (r.px, r.py) for r in sampling.coord_to_px(pts, landsat_tiles).collect()}
    assert got == {0: (0, 0), 1: (1, 1), 2: (63, 63)}


# --- subset (R11) -----------------------------------------------------------


def test_read_subset_window_and_gt(spark, landsat_tiles):
    # window covering pixels cols [1,3), rows [2,4)
    # py0 = floor((4200000-4199939)/30) = 2; py1 = ceil((4200000-4199885)/30) = 4
    bounds = (500030.0 + 1.0, 500090.0, 4199885.0, 4199940.0 - 1.0)
    out = subset.read_subset(landsat_tiles, bounds).collect()
    assert len(out) == 1
    row = out[0]
    arr = oracle.decode_pixels(row.bytes, row.w, row.h, row.fmt)
    full = landsat_arr()
    assert row.gt_x0 == 500000.0 + 30.0  # px0 = 1
    assert row.gt_y0 == 4200000.0 - 2 * 30.0  # py0 = 2
    np.testing.assert_array_equal(arr, full[2:4, 1:3])


def test_read_subset_downsample(spark, landsat_tiles):
    bounds = (500000.0, 501920.0, 4198080.0, 4200000.0)
    row = subset.read_subset(landsat_tiles, bounds, downsample=2).first()
    arr = oracle.decode_pixels(row.bytes, row.w, row.h, row.fmt)
    np.testing.assert_array_equal(arr, landsat_arr()[::2, ::2])
    assert row.gt_xres == 60.0 and row.w == 32


# --- invariants over random convex rings (SURVEY §5.2-3) --------------------


def test_pip_halfplane_matches_raycast_on_convex():
    rng = np.random.default_rng(31)
    for _ in range(20):
        nv = int(rng.integers(5, 9))
        angles = np.sort(rng.uniform(0, 2 * np.pi, nv))
        ra, rb = rng.uniform(0.5, 1.0, 2)  # ellipse axes — convex by construction
        cx, cy = rng.uniform(-5, 5, 2)
        rx = np.append(cx + ra * np.cos(angles), cx + ra * np.cos(angles[0]))
        ry = np.append(cy + rb * np.sin(angles), cy + rb * np.sin(angles[0]))
        px = rng.uniform(cx - 1.5, cx + 1.5, 200)
        py = rng.uniform(cy - 1.5, cy + 1.5, 200)
        hp = oracle.pip_halfplane(rx, ry, px, py)
        rc = oracle.pip_raycast(rx, ry, px, py)
        # interior points agree; only exact-boundary points may differ
        assert np.mean(hp == rc) > 0.99


def test_codec_roundtrip_and_psnr():
    rng = np.random.default_rng(41)
    arr = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    assert np.array_equal(oracle.decode_pixels(oracle.encode_pixels(arr, "raw"), 32, 32, "raw"), arr)
    q = oracle.decode_pixels(oracle.encode_pixels(arr, "qnt"), 32, 32, "qnt")
    assert oracle.psnr(arr, q) >= 40.0  # FIXTURES §2: step 4 passes the gate
    q16 = oracle.quantize(arr, 16)
    assert oracle.psnr(arr, q16) < 40.0  # negative control: step 16 trips it
