"""Corpus pixel histogram + exact quantiles (operators/raster_stats)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from georaster_spark import oracle
from georaster_spark.operators.raster_stats import histogram_quantiles, pixel_histogram


def _numpy_hist(n: int, w: int) -> np.ndarray:
    """Per-fmt ground-truth histogram straight from the ramp formula."""
    out = {"raw": np.zeros(256, dtype=np.int64), "qnt": np.zeros(256, dtype=np.int64)}
    for idx in range(n):
        v = oracle.ramp_tile(idx, w, w)
        fmt = "qnt" if idx % 10 == 3 else "raw"
        if fmt == "qnt":
            v = oracle.quantize(v)
        out[fmt] += np.bincount(v.ravel(), minlength=256)
    return out


def test_pixel_histogram_matches_numpy(spark, sf0001_dir):
    images = spark.read.parquet(str(sf0001_dir / "images.parquet"))
    got = {
        (r["fmt"], r["bin"]): r["cnt"]
        for r in pixel_histogram(images).collect()
    }
    want = _numpy_hist(1000, 32)
    for fmt, hist in want.items():
        for b in range(256):
            assert got.get((fmt, b), 0) == hist[b], (fmt, b)
    # only nonzero bins are emitted (matches SQL GROUP BY semantics)
    assert all(c > 0 for c in got.values())


def test_histogram_quantiles_definition(spark, sf0001_dir):
    images = spark.read.parquet(str(sf0001_dir / "images.parquet"))
    hist = pixel_histogram(images)
    rows = histogram_quantiles(hist, (0.25, 0.5, 0.95)).collect()
    want = _numpy_hist(1000, 32)
    for r in rows:
        cnt = want[r["fmt"]]
        cum = np.cumsum(cnt)
        target = int(np.ceil(r["q"] * cum[-1]))
        expect = int(np.searchsorted(cum, target))
        assert r["qbin"] == expect, (r, expect)


def test_pixel_histogram_plan_is_partial_final(spark, sf0001_dir):
    """The shuffle must carry (fmt, bin, cnt) partials, never pixels: the
    exchange hashes on the group keys and the scan reads only bytes+fmt."""
    images = spark.read.parquet(str(sf0001_dir / "images.parquet"))
    plan = pixel_histogram(images)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(fmt" in plan, plan
    assert "ReadSchema: struct<bytes:binary,fmt:string>" in plan, plan
