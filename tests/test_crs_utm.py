"""Closed-form transverse Mercator / UTM (SURVEY §2.1 R8 gap: upstream
get_extent_projected takes an arbitrary projection; the sandbox has no
pyproj, so EPSG:326xx/327xx get a Krüger-series implementation).

Accuracy evidence is independent where possible: the meridian arc is
cross-checked against direct numeric quadrature of the ellipsoid
integrand, not against our own series.
"""

from __future__ import annotations

import numpy as np
import pytest

from georaster_spark import oracle
from georaster_spark.operators import georegister as geo
from georaster_spark.operators import raster_io, warp


def test_utm_roundtrip_zone_interior():
    rng = np.random.RandomState(11)
    lon = rng.uniform(-78.0, -72.0, 500)  # zone 18
    lat = rng.uniform(-79.5, 83.5, 500)
    x, y = oracle.lonlat_to_utm(lon, lat, 18)
    lon2, lat2 = oracle.utm_to_lonlat(x, y, 18)
    assert np.abs(lon2 - lon).max() < 1e-8
    assert np.abs(lat2 - lat).max() < 1e-8


def test_utm_central_meridian_and_arc_quadrature():
    x, y = oracle.lonlat_to_utm(-75.0, 40.5, 18)
    assert float(x) == pytest.approx(500000.0, abs=1e-6)
    # independent check: meridian arc by numeric quadrature
    a, f = 6378137.0, 1.0 / 298.257223563
    e2 = f * (2.0 - f)
    phi = np.linspace(0.0, np.radians(40.5), 2_000_001)
    arc = np.trapz(a * (1.0 - e2) / np.power(1.0 - e2 * np.sin(phi) ** 2, 1.5), phi)
    assert float(y) / 0.9996 == pytest.approx(arc, abs=1e-3)  # < 1 mm


def test_utm_southern_hemisphere_false_northing():
    x, y = oracle.lonlat_to_utm(-73.5, -33.0, 18, north=False)
    assert y > 6_000_000  # false northing applied
    lon, lat = oracle.utm_to_lonlat(x, y, 18, north=False)
    assert float(lon) == pytest.approx(-73.5, abs=1e-8)
    assert float(lat) == pytest.approx(-33.0, abs=1e-8)


def test_parse_utm_crs():
    assert oracle.parse_utm_crs("EPSG:32618") == (18, True)
    assert oracle.parse_utm_crs("EPSG:32718") == (18, False)
    assert oracle.parse_utm_crs("EPSG:3857") is None
    assert oracle.parse_utm_crs("EPSG:32661") is None  # UPS, not UTM


def test_warp_to_utm_grid_matches_numpy(spark):
    """Distributed warp 3857 -> UTM vs a direct NumPy inverse-map of the
    same tile (exercises the non-separable source-box prefilter path)."""
    h = w = 32
    arr = ((np.arange(h)[:, None] * 5 + np.arange(w)[None, :] * 3) % 251).astype(np.uint8)
    gt = (260000.0, 170000.0, 100.0, 100.0)  # 3.2 km tile near lon 2.3, lat 1.5
    tiles = geo.with_cells(raster_io.from_arrays(spark, [("t0", arr, gt)], fmt="raw"))

    # target grid in UTM zone 31N around the same spot
    lon_c, lat_c = oracle.mercator_to_lonlat(gt[0] + 1600.0, gt[1] - 1600.0)
    ux, uy = oracle.lonlat_to_utm(lon_c, lat_c, 31)
    g = warp.TargetGrid(
        crs="EPSG:32631", x0=float(ux) - 800.0, y0=float(uy) + 800.0,
        xres=50.0, yres=50.0, nx=32, ny=32, tile_w=32, tile_h=32,
    )
    out = warp.reproject(tiles, g, method="nearest").collect()
    assert len(out) == 1
    row = out[0]
    got = oracle.decode_pixels(row["bytes"], row["w"], row["h"], "raw")

    # direct NumPy: target centers -> lonlat -> mercator -> gather
    cx = g.x0 + (np.arange(32) + 0.5) * g.xres
    cy = g.y0 - (np.arange(32) + 0.5) * g.yres
    gx, gy = np.meshgrid(cx, cy)
    lon, lat = oracle.utm_to_lonlat(gx, gy, 31)
    sx, sy = oracle.lonlat_to_mercator(lon, lat)
    inside = (
        (sx >= gt[0]) & (sx < gt[0] + w * gt[2]) & (sy > gt[1] - h * gt[3]) & (sy <= gt[1])
    )
    expect = np.zeros((32, 32))
    expect[inside] = oracle.value_at(arr, sx[inside], sy[inside], *gt)
    np.testing.assert_array_equal(got, expect.astype(np.uint8))
    assert row["n_filled"] == int(inside.sum()) > 0


def test_get_extent_projected_utm_and_identity(spark, sf0001_dir):
    from georaster_spark.api import SingleBandRaster

    df = spark.read.parquet(str(sf0001_dir / "landsat.parquet"))
    sbr = SingleBandRaster(geo.with_cells(df), load_data=False)
    assert sbr.crs == "EPSG:32645"  # the upstream golden tile's real CRS
    # identity CRS: envelope == extent
    same = sbr.get_extent_projected("EPSG:32645")
    assert same == pytest.approx(
        (sbr.extent[0], sbr.extent[1], sbr.extent[2], sbr.extent[3])
    )
    # lonlat envelope: contains all 4 projected corners, and stays within
    # the corner box plus a small edge-bow allowance
    lo = sbr.get_extent_projected("EPSG:4326")
    cx = np.array([sbr.extent[0], sbr.extent[0], sbr.extent[1], sbr.extent[1]])
    cy = np.array([sbr.extent[2], sbr.extent[3], sbr.extent[2], sbr.extent[3]])
    clon, clat = oracle.utm_to_lonlat(cx, cy, 45)
    assert lo[0] <= clon.min() and lo[1] >= clon.max()
    assert lo[2] <= clat.min() and lo[3] >= clat.max()
    assert lo[1] - lo[0] < (clon.max() - clon.min()) + 1e-4
    assert lo[3] - lo[2] < (clat.max() - clat.min()) + 1e-4
    # cross-UTM-zone envelope is finite and ordered
    utm = sbr.get_extent_projected("EPSG:32646")
    assert utm[0] < utm[1] and utm[2] < utm[3]
