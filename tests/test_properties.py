"""Property-based invariants (SURVEY §5.2-3) over the NumPy oracle —
the executable spec all three implementations mirror.  Pure NumPy, no
Spark: these run in milliseconds and pin the algebra the distributed
operators rely on."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from georaster_spark import oracle
from georaster_spark.constants import DOMAIN, MAX_RES

coords = st.floats(min_value=0.0, max_value=float(DOMAIN) - 1e-3, allow_nan=False)
res = st.integers(min_value=1, max_value=MAX_RES)


@given(coords, coords, res)
def test_cell_roundtrip_and_bounds(x, y, r):
    cell = int(oracle.cell_encode(x, y, r))
    rr, ix, iy = oracle.cell_decode(cell)
    assert int(rr) == r
    xmin, xmax, ymin, ymax = oracle.cell_bounds(cell)
    # the encoding point lies in the cell's closed-open box (modulo the
    # boundary convention at the domain edge where indices clamp)
    assert xmin - 1e-6 <= x and (x < xmax + 1e-6 or int(ix) == (1 << r) - 1)
    assert ymin - 1e-6 <= y or int(iy) == (1 << r) - 1
    assert y <= ymax + 1e-6


@given(coords, coords, res)
def test_cell_parent_contains_child(x, y, r):
    child = int(oracle.cell_encode(x, y, r))
    parent = int(oracle.cell_parent(child))
    assert parent == int(oracle.cell_encode(x, y, r - 1))
    assert child in set(oracle.cell_children(parent).tolist())


@given(coords, coords, res, st.integers(min_value=1, max_value=3))
def test_cell_neighbors_symmetric(x, y, r, ring):
    c = int(oracle.cell_encode(x, y, r))
    ns = oracle.cell_neighbors(c, ring=ring)
    assert c in set(ns.tolist())
    for n in ns.tolist():
        assert c in set(oracle.cell_neighbors(int(n), ring=ring).tolist())


@given(
    st.integers(min_value=0, max_value=10**6),
    st.floats(min_value=0.05, max_value=0.95),
    st.floats(min_value=0.05, max_value=0.95),
)
def test_interp_center_exact_and_order0_equiv(idx, fx, fy):
    arr = oracle.ramp_tile(idx, 16, 16)
    g = (1000.0, 2000.0, 10.0, 10.0)
    # at a pixel center, bilinear returns the exact pixel value
    i, j = int(fy * 16), int(fx * 16)
    cx = g[0] + (j + 0.5) * g[2]
    cy = g[1] - (i + 0.5) * g[3]
    assert oracle.interp_bilinear(arr, cx, cy, *g) == float(arr[i, j])
    # order-0 == value_at everywhere
    x = g[0] + fx * 160.0
    y = g[1] - fy * 160.0
    assert oracle.interp_nearest(arr, x, y, *g) == oracle.value_at(arr, x, y, *g)
    # bilinear stays within the corner hull
    v = float(oracle.interp_bilinear(arr, x, y, *g))
    assert arr.min() - 1e-9 <= v <= arr.max() + 1e-9


@st.composite
def convex_ring(draw):
    n = draw(st.integers(min_value=3, max_value=8))
    cx = draw(st.floats(min_value=100, max_value=900))
    cy = draw(st.floats(min_value=100, max_value=900))
    rad = draw(st.floats(min_value=10, max_value=90))
    # points on an ellipse at increasing angles are convex CCW
    # constructive angle gaps -> well-separated vertices (no degenerate
    # near-point polygons, where the containment conventions may differ)
    gaps = draw(st.lists(st.floats(0.3, 1.0), min_size=n, max_size=n))
    total = sum(gaps)
    angs = [2 * math.pi * 0.98 * sum(gaps[: i + 1]) / total for i in range(n)]
    xs = np.array([cx + rad * math.cos(a) for a in angs] + [cx + rad * math.cos(angs[0])])
    ys = np.array([cy + rad * math.sin(a) for a in angs] + [cy + rad * math.sin(angs[0])])
    return xs, ys


@given(convex_ring(), st.floats(0, 1000), st.floats(0, 1000))
@settings(max_examples=200)
def test_pip_halfplane_agrees_with_raycast_off_boundary(ring, px, py):
    xs, ys = ring
    hp = bool(oracle.pip_halfplane(xs, ys, [px], [py])[0])
    rc = bool(oracle.pip_raycast(xs, ys, [px], [py])[0])
    # off the boundary the two must agree; near edges conventions differ
    d = _min_edge_dist(xs, ys, px, py)
    if d > 1e-6:
        assert hp == rc


def _min_edge_dist(xs, ys, px, py) -> float:
    x1, y1, x2, y2 = xs[:-1], ys[:-1], xs[1:], ys[1:]
    dx, dy = x2 - x1, y2 - y1
    t = np.clip(((px - x1) * dx + (py - y1) * dy) / (dx * dx + dy * dy + 1e-30), 0, 1)
    return float(np.sqrt((x1 + t * dx - px) ** 2 + (y1 + t * dy - py) ** 2).min())


@given(st.integers(min_value=0, max_value=10**6))
def test_codec_roundtrip_and_psnr(idx):
    arr = oracle.ramp_tile(idx, 32, 32)
    assert np.array_equal(
        oracle.decode_pixels(oracle.encode_pixels(arr, "raw"), 32, 32, "raw"), arr
    )
    q = oracle.decode_pixels(oracle.encode_pixels(arr, "qnt"), 32, 32, "qnt")
    assert np.array_equal(oracle.quantize(q), q)  # quantizer idempotent
    p = oracle.psnr(arr, q)
    assert p >= 40.0  # the E10 gate holds for the defined-lossy codec


@given(
    st.floats(min_value=-179.9, max_value=179.9),
    st.floats(min_value=-85.0, max_value=85.0),
)
def test_mercator_roundtrip(lon, lat):
    x, y = oracle.lonlat_to_mercator(lon, lat)
    lon2, lat2 = oracle.mercator_to_lonlat(x, y)
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9
