"""Reference-API façade parity: the four upstream test themes (extent,
coordinates, value_at_coords, interp — test/test_georaster.py ⚠, SURVEY
§5.1) exercised through the SingleBandRaster/MultiBandRaster classes on
the landsat-like parity tile (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pytest

from georaster_spark import oracle
from georaster_spark.api import MultiBandRaster, SingleBandRaster, simple_write_geotiff
from georaster_spark.sources import icelite


@pytest.fixture(scope="module")
def landsat(spark, sf0001_dir):
    return SingleBandRaster(spark.read.parquet(str(sf0001_dir / "landsat.parquet")))


def test_extent_and_trans(landsat):
    # gt = (500000, 30, 4200000, 30), 64x64 (FIXTURES.md §4)
    assert landsat.extent == (500000.0, 500000.0 + 64 * 30, 4200000.0 - 64 * 30, 4200000.0)
    assert landsat.trans == (500000.0, 30.0, 0.0, 4200000.0, 0.0, -30.0)
    assert (landsat.nx, landsat.ny) == (64, 64)


def test_value_at_coords(landsat):
    # pixel (i=2, j=3) center -> v = i*64 + j
    x = 500000.0 + (3 + 0.5) * 30.0
    y = 4200000.0 - (2 + 0.5) * 30.0
    assert landsat.value_at_coords(x, y) == 2 * 64 + 3
    assert landsat.find_value_at_coords(x, y) == 2 * 64 + 3  # R17 alias
    # window=3 mean around an interior pixel
    exp = float(landsat.r[1:4, 2:5].mean())
    assert landsat.value_at_coords(x, y, window=3) == exp
    patch = landsat.value_at_coords(x, y, window=3, return_window=True)
    assert patch.shape == (3, 3) and patch[1, 1] == 2 * 64 + 3


def test_interp(landsat):
    # at pixel centers bilinear == exact value
    x = 500000.0 + (10 + 0.5) * 30.0
    y = 4200000.0 - (7 + 0.5) * 30.0
    assert landsat.interp(x, y, order=1) == 7 * 64 + 10
    # halfway between two horizontal neighbors -> average
    xh = 500000.0 + (10 + 1.0) * 30.0
    assert landsat.interp(xh, y, order=1) == (7 * 64 + 10 + 7 * 64 + 11) / 2
    assert landsat.interp(x, y, order=0) == landsat.value_at_coords(x, y)


def test_coordinates_and_coord_to_px(landsat):
    X, Y = landsat.coordinates()
    assert X.shape == (64, 64)
    assert X[0, 0] == 500000.0 + 0.5 * 30.0
    assert Y[0, 0] == 4200000.0 - 0.5 * 30.0
    j, i = landsat.coord_to_px(X[5, 9], Y[5, 9])
    assert (int(j), int(i)) == (9, 5)


def test_subset_and_update_info(landsat):
    bounds = (500000.0 + 10 * 30, 500000.0 + 20 * 30, 4200000.0 - 20 * 30, 4200000.0 - 10 * 30)
    arr = landsat.read_single_band_subset(bounds)
    assert np.array_equal(arr, landsat.r[10:20, 10:20])
    sub = landsat.read_single_band_subset(bounds, update_info=True)
    assert sub.extent[0] == bounds[0] and sub.extent[3] == bounds[3]
    assert (sub.nx, sub.ny) == (10, 10)


def test_from_array_reproject_intersection(spark, landsat):
    arr = oracle.ramp_tile(1, 32, 32)
    r2 = SingleBandRaster.from_array(arr, (500000.0, 30.0, 0.0, 4200000.0, 0.0, -30.0), spark=spark)
    assert np.array_equal(r2.r, arr)
    ix = landsat.intersection(r2)
    assert ix == (500000.0, 500000.0 + 32 * 30, 4200000.0 - 32 * 30, 4200000.0)

    warped = r2.reproject("EPSG:3857", 16, 16, 500000.0, 4200000.0, 60.0, 60.0)
    assert (warped.nx, warped.ny) == (16, 16)
    # 60-unit target pixels: each center falls in source pixel (2i+1, 2j+1)
    assert np.array_equal(warped.r, arr[1::2, 1::2])


def test_multiband_and_writer(spark, tmp_path):
    arr = np.stack([oracle.ramp_tile(i, 16, 16) for i in range(3)])
    from georaster_spark.operators.raster_io import from_arrays

    df = from_arrays(spark, [("m", arr, (0.0, 160.0, 10.0, 10.0))])
    mb = MultiBandRaster(df, bands=[3, 1])
    assert mb.r.shape == (16, 16, 2)
    assert mb.gdal_band(1) == 1
    assert np.array_equal(mb.r[:, :, 0], arr[2])

    v = simple_write_geotiff(tmp_path / "t", oracle.ramp_tile(2, 8, 8),
                             (0.0, 1.0, 0.0, 8.0, 0.0, -1.0), spark=spark)
    back = icelite.read_snapshot(spark, tmp_path / "t", version=v).first()
    got = oracle.decode_pixels(back["bytes"], 8, 8, back["fmt"])
    assert np.array_equal(got, oracle.ramp_tile(2, 8, 8))
