"""Two-pass histogram equalization (operators/raster_stats)."""

from __future__ import annotations

import numpy as np

from georaster_spark import oracle
from georaster_spark.operators import georegister as geo
from georaster_spark.operators import raster_stats


def _numpy_lut(values_by_fmt: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    out = {}
    for fmt, v in values_by_fmt.items():
        cnt = np.bincount(v, minlength=256).astype(np.int64)
        cum = np.cumsum(cnt)
        total = int(cum[-1])
        cdf_min = int(cum[np.nonzero(cnt)[0][0]])
        lut = np.zeros(256, dtype=np.int64)
        if total != cdf_min:
            occ = np.nonzero(cnt)[0]
            lut[occ] = (255 * (cum[occ] - cdf_min)) // (total - cdf_min)
        out[fmt] = lut
    return out


def test_equalize_matches_numpy(spark, sf0001_dir):
    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    )
    meta = spark.read.parquet(str(sf0001_dir / "images.parquet")).select(
        "image_id", "w", "h", "fmt"
    ).collect()
    # independent full-corpus reference from the ramp formula
    vals: dict[str, list[np.ndarray]] = {}
    for m in meta:
        arr = oracle.ramp_tile(int(m["image_id"][3:]), int(m["w"]), int(m["h"]))
        if m["fmt"] == "qnt":
            arr = oracle.quantize(arr)
        vals.setdefault(m["fmt"], []).append(arr.ravel())
    luts = _numpy_lut({f: np.concatenate(v) for f, v in vals.items()})

    hist = raster_stats.pixel_histogram(tiles)
    lut_df = raster_stats.equalization_lut(hist)
    got_lut: dict[str, np.ndarray] = {}
    for r in lut_df.collect():
        got_lut.setdefault(r["fmt"], np.zeros(256, dtype=np.int64))[r["bin"]] = r["lut"]
    assert set(got_lut) == set(luts)
    for fmt in luts:
        assert np.array_equal(got_lut[fmt], luts[fmt]), fmt

    sample = tiles.where(geo.image_idx() < 5)
    rows = {r["image_id"]: r for r in
            raster_stats.equalize_checksum(sample, lut_df).collect()}
    assert len(rows) == 5
    for m in meta:
        if int(m["image_id"][3:]) >= 5:
            continue
        arr = oracle.ramp_tile(int(m["image_id"][3:]), int(m["w"]), int(m["h"]))
        if m["fmt"] == "qnt":
            arr = oracle.quantize(arr)
        eq = luts[m["fmt"]][arr.ravel()]
        wt = np.arange(1, eq.size + 1, dtype=np.int64)
        r = rows[m["image_id"]]
        assert r["eq_sum"] == int(eq.sum())
        assert r["eq_checksum"] == int((eq * wt).sum())


def test_lut_monotone_and_bounded(spark, sf0001_dir):
    tiles = geo.georegister(spark.read.parquet(str(sf0001_dir / "images.parquet")))
    lut_df = raster_stats.equalization_lut(raster_stats.pixel_histogram(tiles))
    for fmt_rows in (
        [r for r in lut_df.collect() if r["fmt"] == f]
        for f in ("raw", "qnt")
    ):
        fmt_rows.sort(key=lambda r: r["bin"])
        vals = [r["lut"] for r in fmt_rows]
        assert vals == sorted(vals)
        assert 0 <= vals[0] and vals[-1] == 255


def test_match_lut_self_is_identity(spark, sf0001_dir):
    """Matching a corpus to ITSELF must be the identity on occupied bins:
    min u with cdf(u) >= cdf(v) is v exactly — any off-by-one in the
    cross-multiplied CDF compare breaks this immediately."""
    tiles = geo.georegister(spark.read.parquet(str(sf0001_dir / "images.parquet")))
    hist = raster_stats.pixel_histogram(tiles)
    src = hist.where("fmt = 'qnt'")
    lut = raster_stats.match_lut(src, src).collect()
    assert len(lut) > 0
    assert all(r["lut"] == r["bin"] for r in lut)


def test_match_lut_matches_numpy(spark, sf0001_dir):
    """Cross-corpus (qnt -> raw) LUT equals the independent NumPy rule."""
    import pandas as pd

    tiles = geo.georegister(spark.read.parquet(str(sf0001_dir / "images.parquet")))
    hist = raster_stats.pixel_histogram(tiles)
    got = {
        r["bin"]: r["lut"]
        for r in raster_stats.match_lut(
            hist.where("fmt = 'qnt'"), hist.where("fmt = 'raw'")
        ).collect()
    }
    meta = spark.read.parquet(str(sf0001_dir / "images.parquet")).select(
        "image_id", "w", "h", "fmt"
    ).collect()
    vals: dict[str, list[np.ndarray]] = {}
    for m in meta:
        arr = oracle.ramp_tile(int(m["image_id"][3:]), int(m["w"]), int(m["h"]))
        if m["fmt"] == "qnt":
            arr = oracle.quantize(arr)
        vals.setdefault(m["fmt"], []).append(arr.ravel())
    s = np.bincount(np.concatenate(vals["qnt"]), minlength=256).astype(np.int64)
    r = np.bincount(np.concatenate(vals["raw"]), minlength=256).astype(np.int64)
    scum, rcum = np.cumsum(s), np.cumsum(r)
    st, rt = int(scum[-1]), int(rcum[-1])
    occ_r = np.nonzero(r)[0]
    want = {}
    for v in np.nonzero(s)[0]:
        ok = occ_r[rcum[occ_r] * st >= int(scum[v]) * rt]
        want[int(v)] = int(ok[0])
    assert got == want
