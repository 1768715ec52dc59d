"""Polygon rasterization (operators/rasterize)."""

from __future__ import annotations

import numpy as np

from georaster_spark import oracle
from georaster_spark.operators import georegister as geo
from georaster_spark.operators import rasterize


def _numpy_burn(row, zones):
    """Independent per-pixel reference: min containing zone_id + 1."""
    w, h = int(row["w"]), int(row["h"])
    xs, ys = oracle.pixel_centers(
        row["gt_x0"], row["gt_y0"], row["gt_xres"], row["gt_yres"], w, h
    )
    lab = np.zeros(w * h, dtype=np.int64)
    best = np.full(w * h, np.iinfo(np.int64).max, dtype=np.int64)
    for z in zones:
        rx = np.asarray([p["x"] for p in z["ring"]])
        ry = np.asarray([p["y"] for p in z["ring"]])
        inside = oracle.pip_halfplane(rx, ry, xs.ravel(), ys.ravel())
        zid = int(z["zone_id"])
        take = inside & (zid < best)
        best[take] = zid
        lab[take] = zid + 1
    return lab.reshape(h, w)


def test_rasterize_mask_matches_numpy(spark, sf0001_dir):
    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() < 40)
    zones = spark.read.parquet(str(sf0001_dir / "zones.parquet"))
    zrows = [r.asDict(recursive=True) for r in zones.collect()]
    meta = {r["image_id"]: r.asDict() for r in tiles.drop("bytes").collect()}
    masks = rasterize.rasterize_zones(tiles, zones).collect()
    assert len(masks) == 40
    any_burned = False
    for r in masks:
        got = np.frombuffer(r["mask"], dtype="<u2").reshape(r["h"], r["w"])
        want = _numpy_burn(meta[r["image_id"]], zrows)
        assert np.array_equal(got, want), r["image_id"]
        any_burned = any_burned or bool((got > 0).any())
    assert any_burned, "fixture should burn at least one pixel in 40 tiles"


def test_rasterize_summary_consistent_with_mask(spark, sf0001_dir):
    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() < 40)
    zones = spark.read.parquet(str(sf0001_dir / "zones.parquet"))
    masks = {r["image_id"]: r for r in rasterize.rasterize_zones(tiles, zones).collect()}
    for r in rasterize.rasterize_summary(tiles, zones).collect():
        lab = np.frombuffer(masks[r["image_id"]]["mask"], dtype="<u2").astype(np.int64)
        wt = np.arange(1, lab.size + 1, dtype=np.int64)
        assert r["n_burned"] == int((lab > 0).sum())
        assert r["burn_checksum"] == int((lab * wt).sum())


def test_zone_geometry_rect_exact(spark, sf0001_dir):
    """Rect zones: shoelace must equal 2*w*h exactly (CCW positive), and
    the plan must stay UDF-free (pure array higher-order functions)."""
    from georaster_spark.operators.pip import zone_geometry

    zones = spark.read.parquet(str(sf0001_dir / "zones.parquet"))
    out = zone_geometry(zones)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan
    rows = {r["zone_id"]: r for r in out.collect()}
    import math

    for z in zones.collect():
        r = rows[z["zone_id"]]
        ring = [(math.floor(p["x"] + 0.5), math.floor(p["y"] + 0.5)) for p in z["ring"]]
        area2 = sum(
            ring[k][0] * ring[k + 1][1] - ring[k + 1][0] * ring[k][1]
            for k in range(len(ring) - 1)
        )
        assert r["area2"] == area2
        assert r["n_edges"] == len(ring) - 1
        if z["kind"] == "rect":
            w = round(z["xmax"] - z["xmin"])
            h = round(z["ymax"] - z["ymin"])
            assert abs(r["area2"]) == 2 * w * h
