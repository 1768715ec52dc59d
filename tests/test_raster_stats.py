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


def test_local_moran_sums_to_global(spark, sf0001_dir):
    """Invariants tying the LISA surface to the global Moran moments:
    sum z_i = 0 scaled, and sum of lisa numerators equals the global
    numerator n^2*(pair_prod_sum adjustments) — both exact integers."""
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.raster_stats import (
        local_moran_moments,
        moran_lattice_moments,
    )

    tiles = geo.georegister(spark.read.parquet(str(sf0001_dir / "images.parquet")))
    loc = local_moran_moments(tiles).toPandas()
    g = moran_lattice_moments(tiles).collect()[0]
    n, S = g["n_tiles"], g["sum_m"]
    assert len(loc) == n
    # z_i = n*m_i - S sums to zero
    assert int((n * loc.m - S).sum()) == 0
    # directed-pair identity: sum_i z_i * (n*lag_i - k_i*S)
    #   = n^2*pair_prod_sum - n*S*pair_sum_sum + w_pairs*S^2
    expected = (
        n * n * g["pair_prod_sum"] - n * S * g["pair_sum_sum"]
        + g["w_pairs"] * S * S
    )
    assert int(loc.lisa_num.sum()) == expected
    # neighbour counts: interior sites have 4; ragged-lattice edge sites
    # (sf0.001 has only 2 rows, the second partial) can drop to 1
    assert set(loc.k_nb.unique()) <= {1, 2, 3, 4}
    assert (loc.k_nb >= 1).all()


def test_local_moran_quadrants_match_float_esda_rule(spark, sf0001_dir):
    """The exact-integer LISA sign must equal the float z_i * lag-dev
    sign (the esda hotspot/outlier quadrant rule)."""
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.raster_stats import local_moran_moments

    tiles = geo.georegister(spark.read.parquet(str(sf0001_dir / "images.parquet")))
    loc = local_moran_moments(tiles).toPandas()
    n = len(loc)
    xbar = loc.m.mean()
    z = loc.m - xbar
    lag_dev = loc.lag_sum - loc.k_nb * xbar
    float_sign = np.sign(z * lag_dev)
    exact_sign = np.sign(loc.lisa_num)
    mask = np.abs(z * lag_dev) > 1e-6  # skip exact-zero boundary
    assert (float_sign[mask] == exact_sign[mask]).all()


def test_zonal_frac_rect_properties(spark, sf0001_dir):
    """Fractional zonal stats: (a) NumPy single-pair parity, (b) the
    weighted stats bracket the center-in stats (coverage semantics),
    (c) full-interior tiles contribute exactly 2^20 per pixel."""
    from pyspark.sql import functions as F

    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.zonal import _FRAC_SCALE, zonal_frac_rect, zonal_stats

    tiles = geo.georegister(spark.read.parquet(str(sf0001_dir / "images.parquet")))
    zones = spark.read.parquet(str(sf0001_dir / "zones.parquet"))
    frac = {r["zone_id"]: r for r in zonal_frac_rect(tiles, zones).collect()}
    assert frac, "no rect zones at sf0.001?"
    center = {r["zone_id"]: r for r in zonal_stats(tiles, zones.where(F.col("kind") == "rect")).collect()}
    for zid, r in frac.items():
        # area-weighted mean stays inside the pixel value range
        assert 0 <= r["vwsum"] / r["wsum"] <= 255
        # total covered area (in cells) is close to the center-in count
        if zid in center:
            cells = r["wsum"] / _FRAC_SCALE
            assert abs(cells - center[zid]["n_pixels"]) <= 0.02 * max(center[zid]["n_pixels"], 50) + 80
        # coverage never exceeds the touched-cell count
        assert r["wsum"] <= r["n_px"] * _FRAC_SCALE


def test_reclassify_matches_numpy_and_broadcasts(spark, sf0001_dir):
    """reclassify vs a per-tile NumPy bincount recompute; the breaks
    side must appear as a broadcast join (never a shuffle) and the
    census must be a single Arrow hop."""
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.raster_stats import CLASS_BREAKS, reclassify

    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).limit(8)
    breaks = spark.createDataFrame(list(CLASS_BREAKS), "cls int, lo int, hi int")
    out = reclassify(tiles, breaks)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1
    got = {(r["image_id"], r["cls"]): r for r in out.collect()}
    for t in tiles.collect():
        v = oracle.decode_pixels(t["bytes"], t["w"], t["h"], t["fmt"]).astype(
            np.int64
        ).ravel()
        for cls, lo, hi in CLASS_BREAKS:
            m = (v >= lo) & (v <= hi)
            if not m.any():
                assert (t["image_id"], cls) not in got
                continue
            r = got[(t["image_id"], cls)]
            assert r["n_px"] == int(m.sum())
            assert r["v_sum"] == int(v[m].sum())


def test_coverage_audit_gaps_and_totals(spark, sf0001_dir):
    """The sparse subset must leave some zones uncovered (nonzero gap
    census), covered+uncovered must partition the zone set, and each
    covered zone's checksum must equal the brute-force overlap scan."""
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.zonal import coverage_audit

    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() % 97 == 0)
    zones = spark.read.parquet(str(sf0001_dir / "zones.parquet"))
    rows = coverage_audit(tiles, zones).collect()
    assert len(rows) == zones.count()
    assert any(r["uncovered"] == 1 for r in rows)
    assert any(r["n_tiles"] > 0 for r in rows)
    tl = tiles.select("image_id", "xmin", "xmax", "ymin", "ymax").collect()
    zl = {z["zone_id"]: z for z in zones.collect()}
    for r in rows:
        z = zl[r["zone_id"]]
        hits = [
            int(t["image_id"][3:])
            for t in tl
            if t["xmin"] < z["xmax"] and t["xmax"] > z["xmin"]
            and t["ymin"] < z["ymax"] and t["ymax"] > z["ymin"]
        ]
        assert r["n_tiles"] == len(hits)
        assert r["tile_checksum"] == sum(hits)
        assert r["uncovered"] == (0 if hits else 1)


def test_geary_moments_identity_with_moran_surface(spark, sf0001_dir):
    """Geary's pair_sqdiff decomposes over the Moran moments:
    Σ(m_i - m_j)^2 = Σ(m_i² + m_j²) - 2Σm_i·m_j over the SAME directed
    pair set, and Σ(m_i² + m_j²) = Σ_i k_i·m_i² (k_i = degree).  Check
    the identity numerically via a brute-force lattice recompute."""
    from georaster_spark.constants import GRID_W
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.raster_stats import (
        geary_lattice_moments,
        moran_lattice_moments,
    )

    tiles = geo.georegister(spark.read.parquet(str(sf0001_dir / "images.parquet")))
    g = geary_lattice_moments(tiles).first()
    mo = moran_lattice_moments(tiles).first()
    assert g["n_tiles"] == mo["n_tiles"] > 0
    assert g["w_pairs"] == mo["w_pairs"] > 0
    # brute force from tile means
    rows = tiles.collect()
    means = {}
    for r in rows:
        arr = oracle.decode_pixels(r["bytes"], r["w"], r["h"], r["fmt"]).astype(np.int64)
        idx = int(r["image_id"][3:])
        means[(idx % GRID_W, idx // GRID_W)] = int(arr.sum()) // arr.size
    sq = 0
    for (gx, gy), mi in means.items():
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            mj = means.get((gx + dx, gy + dy))
            if mj is not None:
                sq += (mi - mj) ** 2
    assert g["pair_sqdiff_sum"] == sq


def test_max_pool_argmax_ties_and_positions(spark):
    """Hand-built 4x4 tile, k=2: block maxima, first-row-major argmax on
    deliberate ties, and the tile-coordinate position encoding."""
    import numpy as np

    from georaster_spark.operators.raster_stats import max_pool_argmax_checksum

    # blocks (2x2 each):  B0=[[5,5],[1,0]]  B1=[[2,9],[9,0]]
    #                     B2=[[0,0],[0,0]]  B3=[[7,1],[3,7]]
    px = np.array(
        [
            [5, 5, 2, 9],
            [1, 0, 9, 0],
            [0, 0, 7, 1],
            [0, 0, 3, 7],
        ],
        dtype=np.uint8,
    )
    df = spark.createDataFrame(
        [("t0", px.tobytes(), 4, 4, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = max_pool_argmax_checksum(df, 2).collect()[0]
    # winners: B0 -> 5 at (0,0) pos 0 (tie with (0,1) broken row-major);
    # B1 -> 9 at (0,3) pos 3 (tie with (1,2)=pos 6 broken by smaller i);
    # B2 -> 0 at (2,0) pos 8; B3 -> 7 at (2,2) pos 10 (tie with (3,3)).
    assert r["n_blocks"] == 4
    assert r["max_sum"] == 5 + 9 + 0 + 7
    assert r["max_min"] == 0
    assert r["arg_pos_sum"] == 0 + 3 + 8 + 10
    assert r["arg_checksum"] == 0 * 1 + 3 * 2 + 8 * 3 + 10 * 4


def test_wht_energy_census_matches_numpy(spark):
    """Per-coefficient WHT vs a direct popcount-sign double loop on a
    deterministic 16x16 tile (k=8: 4 blocks), plus the Parseval check
    sum(C^2) = k^2 * sum(B^2) on every block."""
    import numpy as np

    from georaster_spark.operators.raster_stats import wht_energy_census

    k = 8
    px = ((np.arange(16)[:, None] * 31 + np.arange(16)[None, :] * 7) % 251).astype(
        np.uint8
    )
    df = spark.createDataFrame(
        [("t0", px.tobytes(), 16, 16, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = wht_energy_census(df, k).collect()[0]

    def wht_block(B):
        C = np.zeros((k, k), dtype=np.int64)
        for u in range(k):
            for v in range(k):
                acc = 0
                for x in range(k):
                    for y in range(k):
                        s = bin(u & x).count("1") + bin(v & y).count("1")
                        acc += int(B[x, y]) * (1 if s % 2 == 0 else -1)
                C[u, v] = acc
        return C

    dc = ac = hf = ck = 0
    for bi in range(2):
        for bj in range(2):
            B = px[bi * k : (bi + 1) * k, bj * k : (bj + 1) * k].astype(np.int64)
            C = wht_block(B)
            assert (C * C).sum() == k * k * (B * B).sum()  # Parseval
            A = np.abs(C)
            blk = bi * 2 + bj
            dc += C[0, 0]
            ac += A.sum() - A[0, 0]
            uu, vv = np.meshgrid(range(k), range(k), indexing="ij")
            hf += A[(uu >= k // 2) | (vv >= k // 2)].sum()
            ck += (blk + 1) * (A * (uu * k + vv + 1)).sum()
    assert r["n_blocks"] == 4
    assert r["dc_sum"] == dc
    assert r["ac_energy"] == ac
    assert r["hf_energy"] == hf
    assert r["coef_checksum"] == ck


def test_bitplane_census_matches_numpy(spark):
    import numpy as np

    from georaster_spark.operators.raster_stats import bitplane_census

    px = ((np.arange(8)[:, None] * 37 + np.arange(8)[None, :] * 11) % 256).astype(
        np.uint8
    )
    df = spark.createDataFrame(
        [("t0", px.tobytes(), 8, 8, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    got = {r["plane"]: (r["n_ones"], r["pos_checksum"])
           for r in bitplane_census(df).collect()}
    pw = np.arange(1, 65, dtype=np.int64).reshape(8, 8)
    assert set(got) == set(range(8))
    for plane in range(8):
        bits = (px.astype(np.int64) >> plane) & 1
        assert got[plane] == (bits.sum(), (bits * pw).sum())
