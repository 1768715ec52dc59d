"""R14 order=2 quadratic interpolation — NumPy-oracle properties
(VERDICT r3 item 8).

The kernel is the Dodgson (1997) r=1 INTERPOLATING quadratic (not
scipy's B-spline-prefilter order=2 — documented deviation, SURVEY §2.1
R14), separable 3x3, centered on the nearest pixel, edge-clamped.
"""

from __future__ import annotations

import numpy as np
import pytest

from georaster_spark import oracle
from georaster_spark.oracle import _quadratic_weights, interp_quadratic

GT = (100.0, 900.0, 2.0, 2.0)  # gt_x0, gt_y0, gt_xres, gt_yres


def _grid(h=8, w=8):
    return (np.arange(h * w, dtype=np.float64).reshape(h, w) * 3.0 + 5.0) % 251


def test_weights_partition_of_unity_and_interpolating():
    s = np.linspace(-0.5, 0.4999, 101)
    w = _quadratic_weights(s)
    np.testing.assert_allclose(w[0] + w[1] + w[2], 1.0, atol=1e-12)
    w0 = _quadratic_weights(np.array([0.0]))
    assert w0[0][0] == 0.0 and w0[1][0] == 1.0 and w0[2][0] == 0.0


def test_exact_at_pixel_centers():
    arr = _grid()
    gx0, gy0, xr, yr = GT
    js, iis = np.meshgrid(np.arange(8), np.arange(8))
    xs = gx0 + (js.ravel() + 0.5) * xr
    ys = gy0 - (iis.ravel() + 0.5) * yr
    got = interp_quadratic(arr, xs, ys, *GT)
    np.testing.assert_allclose(got, arr[iis.ravel(), js.ravel()], atol=1e-9)


def test_reproduces_linear_ramps_in_interior():
    # an interpolating quadratic kernel reconstructs degree<=1 signals
    # exactly away from the clamped border
    h = w = 12
    iis, js = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    arr = 3.0 * js + 7.0 * iis + 11.0
    gx0, gy0, xr, yr = GT
    rng = np.random.default_rng(42)
    xs = gx0 + (rng.uniform(2.0, w - 3.0, 200)) * xr
    ys = gy0 - (rng.uniform(2.0, h - 3.0, 200)) * yr
    fx = (xs - gx0) / xr - 0.5
    fy = (gy0 - ys) / yr - 0.5
    expect = 3.0 * fx + 7.0 * fy + 11.0
    got = interp_quadratic(arr, xs, ys, *GT)
    np.testing.assert_allclose(got, expect, atol=1e-9)


def test_nodata_mask_covers_3x3_support():
    arr = _grid()
    nd = float(arr[3, 4])
    gx0, gy0, xr, yr = GT
    # sample whose nearest pixel is (3,4) -> masked
    x_hit = gx0 + (4 + 0.5) * xr
    y_hit = gy0 - (3 + 0.5) * yr
    # sample 3 pixels away -> support misses (3,4) unless value repeats
    x_far = gx0 + (0 + 0.5) * xr
    y_far = gy0 - (0 + 0.5) * yr
    vals, mask = interp_quadratic(
        arr, np.array([x_hit, x_far]), np.array([y_hit, y_far]), *GT, nodata=nd
    )
    assert bool(mask[0]) is True
    support = arr[0:2, 0:2]
    assert bool(mask[1]) is (nd in support)


def test_edge_clamp_matches_manual_expansion():
    arr = _grid(4, 4)
    gx0, gy0, xr, yr = GT
    # point in the top-left corner pixel: offsets -1 clamp to index 0
    x = gx0 + 0.2 * xr
    y = gy0 - 0.1 * yr
    got = float(interp_quadratic(arr, np.array([x]), np.array([y]), *GT)[0])
    fx = (x - gx0) / xr - 0.5
    fy = (gy0 - y) / yr - 0.5
    jm, im = np.floor(fx + 0.5), np.floor(fy + 0.5)
    wx = _quadratic_weights(fx - jm)
    wy = _quadratic_weights(fy - im)
    jc = [int(np.clip(jm + o, 0, 3)) for o in (-1, 0, 1)]
    ic = [int(np.clip(im + o, 0, 3)) for o in (-1, 0, 1)]
    expect = sum(
        wy[ki] * sum(wx[kj] * arr[ic[ki], jc[kj]] for kj in range(3))
        for ki in range(3)
    )
    np.testing.assert_allclose(got, expect, atol=1e-12)


def test_operator_matches_oracle_on_fixture(spark):
    from georaster_spark.plans.contract import q_interp_quadratic

    out = q_interp_quadratic(spark, "/root/testdata/sf0.001").limit(50).collect()
    assert len(out) > 0
    for row in out:
        assert row["val"] is None or np.isfinite(row["val"])


def test_unsupported_orders_still_raise(spark):
    from georaster_spark.operators import sampling

    with pytest.raises(NotImplementedError):
        sampling.interp(None, None, order=4)
    with pytest.raises(NotImplementedError):
        sampling.interp(None, None, order=5)
