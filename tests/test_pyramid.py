"""Overview pyramid rollup (raster_io.build_pyramid / pyramid_checksums)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from georaster_spark import oracle
from georaster_spark.operators import georegister as geo
from georaster_spark.operators import raster_io


def test_build_pyramid_composes_exactly(spark, sf0001_dir):
    """Level 2 of the chained pyramid == direct stride-4 decimation
    (bit-for-bit), and geo metadata scales per level."""
    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() < 8)
    lv = raster_io.build_pyramid(tiles, levels=2, k=2)
    direct = raster_io.downsample(tiles, 4)
    got = {r["image_id"]: r for r in lv[1].collect()}
    want = {r["image_id"]: r for r in direct.collect()}
    assert got.keys() == want.keys() and len(got) == 8
    for iid, r in got.items():
        assert r["bytes"] == want[iid]["bytes"]
        assert (r["w"], r["h"]) == (want[iid]["w"], want[iid]["h"]) == (8, 8)
        assert r["gt_xres"] == want[iid]["gt_xres"]


def test_pyramid_checksums_levels(spark, sf0001_dir):
    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() == 0)
    rows = {r["level"]: r for r in raster_io.pyramid_checksums(tiles, 3).collect()}
    assert sorted(rows) == [0, 1, 2, 3]
    arr = oracle.ramp_tile(0, 32, 32).astype(np.int64)
    for lv, r in rows.items():
        d = arr[:: 2**lv, :: 2**lv]
        wt = np.arange(1, d.size + 1, dtype=np.int64).reshape(d.shape)
        assert r["checksum"] == int((d * wt).sum())
        assert r["w"] == d.shape[1] and r["h"] == d.shape[0]
