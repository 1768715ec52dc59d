"""M4 scale machinery: op E8 salting (results identical to the plain
join), op E9 checkpoint/resume (kill -> rerun -> identical output), and
icelite snapshot pinning (SURVEY §7.1 M4)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from georaster_spark.constants import DEFAULT_RES
from georaster_spark.operators import georegister as geo
from georaster_spark.operators import skew
from georaster_spark.operators.pip import zone_cells
from georaster_spark.plans import checkpoint as ckpt
from georaster_spark.sources import icelite


def _tiles(spark, sf0001_dir):
    imgs = spark.read.parquet(str(sf0001_dir / "images.parquet")).select("image_id", "w", "h")
    return geo.georegister(imgs)


def test_hot_census_finds_planted_anchors(spark, sf0001_dir):
    tiles = _tiles(spark, sf0001_dir)
    assign = geo.tile_assignments(tiles)
    hot = skew.hot_key_census(assign, "cell_id", sample_fraction=0.5)
    # fixtures teleport ~5% of images into 3 anchor neighborhoods
    # (constants.HOT_ANCHORS); each anchor's cells hold ~1.7% of rows vs
    # ~0.002% for a typical grid cell, so the census must flag them.
    assert len(hot) >= 3
    n = assign.count()
    hot_rows = assign.where(F.col("cell_id").isin(hot)).count()
    assert hot_rows / n > 0.3  # the flagged set is genuinely dense


def test_salted_join_matches_plain(spark, sf0001_dir):
    tiles = _tiles(spark, sf0001_dir)
    assign = geo.tile_assignments(tiles)
    zones = spark.read.parquet(str(sf0001_dir / "zones.parquet"))
    zc = zone_cells(zones, DEFAULT_RES).select("cell_id", "zone_id")

    hot = skew.hot_key_census(assign, "cell_id", sample_fraction=0.5)
    plain = assign.join(zc, "cell_id").select("image_id", "zone_id")
    salted = skew.salted_equi_join(
        assign, zc, key="cell_id", hot_keys=hot, row_key="image_id"
    ).select("image_id", "zone_id")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_checkpoint_resume_exact(spark, sf0001_dir, tmp_path):
    tiles = _tiles(spark, sf0001_dir).select(
        "image_id", "cell_id", F.col("gt_x0"), F.col("gt_y0")
    )
    from georaster_spark.functions import cells as cf

    work = tiles.withColumn(
        "unit", cf.cell_parent(cf.cell_parent(F.col("cell_id"), DEFAULT_RES), DEFAULT_RES - 1)
    )

    out_a = tmp_path / "full"
    rep = ckpt.checkpointed_write(work, out_a, "unit", input_snapshot="v0")
    assert not rep.skipped_units and rep.rows_written == work.count()
    full_rows = sorted(map(tuple, ckpt.read_checkpointed(spark, out_a).collect()))

    # simulate a kill: copy of the run where 2 units lost their manifest
    # (and one of them has torn partial data)
    out_b = tmp_path / "killed"
    ckpt.checkpointed_write(work, out_b, "unit", input_snapshot="v0")
    manifests = sorted((out_b / "_manifest").glob("*.json"))[:2]
    killed_units = [json.loads(m.read_text())["unit"] for m in manifests]
    for m in manifests:
        m.unlink()
    part_dir = next((out_b / "data").glob(f"unit={killed_units[0]}"))
    for f in part_dir.glob("*.parquet"):
        f.write_bytes(b"torn-by-kill")  # stale bytes must be overwritten

    rep2 = ckpt.checkpointed_write(work, out_b, "unit", input_snapshot="v0")
    assert sorted(rep2.processed_units) == sorted(killed_units)
    resumed_rows = sorted(map(tuple, ckpt.read_checkpointed(spark, out_b).collect()))
    assert resumed_rows == full_rows

    # idempotent no-op on a complete output
    rep3 = ckpt.checkpointed_write(work, out_b, "unit", input_snapshot="v0")
    assert not rep3.processed_units


def test_icelite_snapshot_pinning(spark, tmp_path):
    t = tmp_path / "tbl"
    df1 = spark.range(10).withColumnRenamed("id", "x")
    v0 = icelite.write_snapshot(df1, t)
    df2 = spark.range(10, 15).withColumnRenamed("id", "x")
    v1 = icelite.write_snapshot(df2, t)
    assert (v0, v1) == (0, 1)
    assert icelite.read_snapshot(spark, t, version=0).count() == 10
    assert icelite.read_snapshot(spark, t).count() == 15  # append semantics
    assert icelite.snapshot_info(t, 1)["parent"] == 0
