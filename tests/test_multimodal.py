"""Multimodal column plumbing: real self-defined codecs end-to-end,
stubbed industry codecs failing loudly through the same Spark path."""

from __future__ import annotations

import numpy as np
import pytest

from georaster_spark import oracle
from georaster_spark.operators import multimodal as mm


def _sine_pcm16(n=2048, freq=5.0):
    t = np.arange(n) / n
    return (np.sin(2 * np.pi * freq * t) * 20000).astype("<i2")


def test_image_resize_and_features(spark):
    arr = oracle.ramp_tile(9, 32, 32)
    df = mm.media_table(
        spark,
        [{"media_id": "a", "kind": "image", "bytes": arr.tobytes(), "fmt": "raw", "w": 32, "h": 32}],
    )
    out = mm.image_resize(df, 8, 8).collect()[0]
    got = oracle.decode_pixels(out["bytes"], 8, 8, "raw")
    assert np.array_equal(got, mm._resize_nearest(arr, 8, 8))

    feat = mm.image_features(df).collect()[0]
    assert feat["mean_val"] == float(arr.mean(dtype=np.float64))
    hist = np.bincount(((arr.astype(np.int64) * 16) // 256).ravel(), minlength=16)
    assert [feat[f"hist_{b}"] for b in range(16)] == hist.tolist()


def test_compute_phash_matches_numpy(spark, sf0001_dir):
    from georaster_spark.operators.georegister import georegister

    imgs = spark.read.parquet(str(sf0001_dir / "images.parquet")).limit(20)
    rows = georegister(imgs)
    got = {r["image_id"]: r["phash_px"] for r in mm.compute_phash(rows).collect()}
    for r in imgs.collect():
        arr = oracle.decode_pixels(r["bytes"], r["w"], r["h"], r["fmt"])
        blocks = arr.reshape(8, 4, 8, 4).sum(axis=(1, 3), dtype=np.int64)
        bits = blocks * arr.size > arr.sum(dtype=np.int64) * 16
        val = sum(1 << (i * 8 + j) for i in range(8) for j in range(8) if bits[i, j])
        if val >= 1 << 63:
            val -= 1 << 64
        assert got[r["image_id"]] == val


def test_audio_features(spark):
    sig = _sine_pcm16()
    df = mm.media_table(
        spark,
        [{"media_id": "s", "kind": "audio", "bytes": sig.tobytes(), "fmt": "pcm16",
          "sample_rate": 16000, "n_samples": len(sig)}],
    )
    out = mm.audio_features(df).collect()[0]
    f = sig.astype(np.float64) / 32768.0
    assert out["rms"] == pytest.approx(float(np.sqrt(np.mean(f**2))))
    assert out["zero_crossings"] == int(np.sum(np.signbit(f[1:]) != np.signbit(f[:-1])))


def test_video_frame_sample(spark):
    frames = np.stack([oracle.ramp_tile(i, 16, 16) for i in range(6)])
    df = mm.media_table(
        spark,
        [{"media_id": "v", "kind": "video", "bytes": frames.tobytes(), "fmt": "rawv",
          "w": 16, "h": 16, "n_frames": 6}],
    )
    out = sorted(mm.video_frame_sample(df, every_k=2).collect(), key=lambda r: r["frame_no"])
    assert [r["frame_no"] for r in out] == [0, 2, 4]
    for r in out:
        got = oracle.decode_pixels(r["bytes"], 16, 16, "raw")
        assert np.array_equal(got, frames[r["frame_no"]])


def test_stub_codec_fails_loudly(spark):
    df = mm.media_table(
        spark,
        [{"media_id": "j", "kind": "image", "bytes": b"\xff\xd8\xff", "fmt": "jpeg",
          "w": 1, "h": 1}],
    )
    with pytest.raises(Exception, match="codec 'jpeg'"):
        mm.image_features(df).collect()


def test_audio_video_contract_vs_duckdb(spark):
    """The M4/M5 contract queries against their DuckDB oracles at
    sf0.001 — same compare the driver runs at sf0.01 (matching-sf
    oracle SQL built locally, since oracle_sql() pins sf0.01 paths)."""
    import duckdb

    from georaster_spark.plans import contract as ct
    from tests.driver_sim import table_hash

    sf_dir = "/root/testdata/sf0.001"
    fx = ct._fx(sf_dir)
    con = duckdb.connect()
    for name, qfn, sql in [
        ("audio", ct.q_audio_features, ct._sql_audio_features(fx)),
        ("video", ct.q_video_frames, ct._sql_video_frames(fx)),
    ]:
        sdf = qfn(spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        orows = con.execute(sql).fetchall()
        ocols = [d[0] for d in con.description]
        assert len(srows) == len(orows), name
        assert sorted(sdf.columns) == sorted(ocols), name
        assert table_hash(sdf.columns, srows) == table_hash(ocols, orows), name


def test_image_augment_matches_numpy(spark, sf0001_dir):
    """The fused-bytes path, the fused-checksum path, and a direct NumPy
    evaluation of the hflip->rot90->crop chain must all agree."""
    imgs = spark.read.parquet(str(sf0001_dir / "images.parquet")).limit(12)
    out = {r["image_id"]: r for r in mm.image_augment(imgs).collect()}
    chk = {
        r["image_id"]: r
        for r in mm.augment_checksum(
            imgs.select("image_id", "bytes", "w", "h", "fmt")
        ).collect()
    }
    for r in imgs.collect():
        arr = oracle.decode_pixels(r["bytes"], r["w"], r["h"], r["fmt"])
        exp = mm._augment_chain(arr)
        # composite index identity: out[i,j] == arr[H-1-o-j, W-1-o-i]
        h, w = arr.shape
        o = h // 4
        assert exp[1, 2] == arr[h - 1 - o - 2, w - 1 - o - 1]
        got = out[r["image_id"]]
        assert (got["w"], got["h"]) == exp.shape[::-1]
        assert oracle.decode_pixels(
            got["bytes"], got["w"], got["h"], "raw"
        ).tolist() == exp.tolist()
        weights = np.arange(1, exp.size + 1, dtype=np.int64).reshape(exp.shape)
        assert chk[r["image_id"]]["checksum"] == int(
            (exp.astype(np.int64) * weights).sum()
        )


def test_compute_dhash_matches_numpy(spark, sf0001_dir):
    import numpy as np

    from georaster_spark import oracle
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.multimodal import compute_dhash

    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() % 101 == 0)
    got = {r["image_id"]: r["dhash_px"] for r in compute_dhash(tiles).collect()}
    assert len(got) == 10
    for idx in range(0, 1000, 101):
        z = oracle.ramp_tile(idx, 32, 32).astype(np.int64)
        if idx % 10 == 3:
            z = oracle.quantize(z)
        ri = [(2 * i + 1) * 32 // 16 for i in range(8)]
        cj = [(2 * j + 1) * 32 // 18 for j in range(9)]
        val = 0
        for i in range(8):
            for j in range(8):
                if z[ri[i], cj[j + 1]] > z[ri[i], cj[j]]:
                    val |= 1 << (i * 8 + j)
        if val >= 1 << 63:
            val -= 1 << 64
        assert got[f"img{idx:08d}"] == val


def test_xmodal_align_matches_numpy(spark, sf0001_dir):
    """xmodal_align vs a NumPy/pure-Python reimplementation of both
    stub encoders and the integer cos^2 gate; also sanity: the gate
    actually separates (some pass, some fail)."""
    import numpy as np

    from georaster_spark import oracle
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.multimodal import xmodal_align

    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() % 43 == 0)
    got = {r["image_id"]: r for r in xmodal_align(tiles, tau_ppm=320_000).collect()}
    caps = {
        r["image_id"]: r["caption"]
        for r in spark.read.parquet(str(sf0001_dir / "images.parquet"))
        .select("image_id", "caption").collect()
    }
    n_pass = 0
    for idx in range(0, 1000, 43):
        z = oracle.ramp_tile(idx, 32, 32).astype(np.int64)
        if idx % 10 == 3:
            z = oracle.quantize(z)
        f = [int(z[4 * k:4 * (k + 1) if k < 7 else 32, :].sum()) for k in range(8)]
        iid = f"img{idx:08d}"
        words = caps[iid].strip().split()
        t = [sum(1 for w_ in words if len(w_) % 8 == k) for k in range(8)]
        dot = sum(a * b for a, b in zip(f, t))
        n2i = sum(a * a for a in f)
        n2t = sum(b * b for b in t)
        ppm = (1_000_000 * dot * dot) // (n2i * n2t) if n2i and n2t else 0
        r = got[iid]
        assert r["dot"] == dot and r["n2_img"] == n2i and r["n2_txt"] == n2t
        assert r["align_ppm"] == ppm
        assert r["passed"] == int(ppm >= 320_000)
        n_pass += r["passed"]
    assert 0 < n_pass < len(got)


def test_xmodal_align_single_arrow_hop(spark, sf0001_dir):
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators.multimodal import xmodal_align

    tiles = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    )
    plan = xmodal_align(tiles)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1


def test_shot_boundaries_fire_exactly_at_scene_cuts(spark, sf0001_dir):
    from georaster_spark.operators import georegister as geo
    from georaster_spark.operators import multimodal as mm

    imgs = geo.georegister(
        spark.read.parquet(str(sf0001_dir / "images.parquet"))
    ).where(geo.image_idx() < 40)
    rows = mm.shot_boundaries(mm.synth_scene_media(imgs)).collect()
    assert len(rows) > 0
    for r in rows:
        want = 1 if r["frame_no"] % mm.SHOT_SCENE_LEN == 0 else 0
        assert r["is_cut"] == want, r
        if want == 0:
            assert r["ssd"] == 0  # within a scene the pattern is static
