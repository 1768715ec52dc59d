"""Structured Streaming ingest tier: availableNow runs must equal the
batch computation (same georegister Column math, shared code path)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from georaster_spark.streaming import tile_stream as ts


@pytest.fixture()
def stream_dir(spark, sf0001_dir, tmp_path):
    """Split the fixture images into several files (multiple triggers)."""
    src = spark.read.parquet(str(sf0001_dir / "images.parquet"))
    d = tmp_path / "incoming"
    src.repartition(4).write.mode("overwrite").parquet(str(d))
    for extra in d.glob("_SUCCESS*"):
        extra.unlink()
    return d


def test_cell_window_stats_matches_batch(spark, stream_dir, tmp_path):
    stream = ts.read_image_stream(spark, str(stream_dir))
    out = ts.cell_window_stats(stream, window="1 minute", watermark="30 seconds")
    ts.run_to_memory(out, "cells_stream", str(tmp_path / "ck1"))

    got = {
        (r["win_start"], r["cell_id"]): (r["n_images"], r["avg_w"])
        for r in spark.sql("SELECT * FROM cells_stream").collect()
    }

    batch = spark.read.parquet(str(stream_dir))
    exp_df = ts.cell_window_stats(batch)  # same builder works on batch DF
    exp = {
        (r["win_start"], r["cell_id"]): (r["n_images"], r["avg_w"])
        for r in exp_df.collect()
    }
    # append-mode emits only watermark-finalized windows; every emitted
    # window must match batch exactly, and most windows must have closed
    # (fixture spans ~17 minutes of event time vs 30 s watermark).
    assert got
    # windows still open when the stream drains (watermark never passes
    # the last events) are withheld by append mode — a bounded tail
    assert len(got) >= 0.9 * len(exp)
    for k, v in got.items():
        assert exp[k] == v


def test_streaming_near_dup_drop(spark, stream_dir, tmp_path):
    stream = ts.read_image_stream(spark, str(stream_dir))
    out = ts.streaming_near_dup_drop(stream).select("image_id", "phash")
    ts.run_to_memory(out, "dedup_stream", str(tmp_path / "ck2"))
    rows = spark.sql("SELECT * FROM dedup_stream").collect()
    batch = spark.read.parquet(str(stream_dir))
    n_distinct = batch.select("phash").distinct().count()
    # exactly one survivor per phash value inside the watermark horizon
    assert len(rows) == n_distinct
    assert len({r["phash"] for r in rows}) == n_distinct


def _sess_key(r):
    return (
        r["cell_id"],
        int(r["session_start"].timestamp()),
        int(r["session_end"].timestamp()),
        r["n_images"],
    )


def test_stream_sessionize_matches_batch(spark, stream_dir, tmp_path):
    """applyInPandasWithState sessionizer == window-function batch
    sessionizer on the closed sessions; the final open session per cell
    is withheld (no timeout fires after the last availableNow batch),
    exactly like append-mode window finalization."""
    stream = ts.read_image_stream(spark, str(stream_dir))
    out = ts.stream_sessionize(stream, gap_s=200)
    ts.run_to_memory(out, "sess_stream", str(tmp_path / "ck_sess"))
    got = {_sess_key(r) for r in spark.sql("SELECT * FROM sess_stream").collect()}

    batch = spark.read.parquet(str(stream_dir))
    exp_rows = ts.batch_sessionize(batch, gap_s=200).collect()
    exp = {_sess_key(r) for r in exp_rows}
    # every emitted session is exactly a batch session
    assert got <= exp
    # what's withheld is at most the LAST session of each cell
    last_per_cell = {}
    for r in exp_rows:
        k = _sess_key(r)
        prev = last_per_cell.get(r["cell_id"])
        if prev is None or k[1] > prev[1]:
            last_per_cell[r["cell_id"]] = k
    assert exp - got <= set(last_per_cell.values())
    assert got  # fixture has multi-session cells, so some must close inline


def test_resume_from_checkpoint(spark, stream_dir, tmp_path):
    """New files after a finished availableNow run are picked up by a
    restart from the same checkpoint — exactly-once file tracking."""
    ck = str(tmp_path / "ck3")
    sink = str(tmp_path / "sink")

    def run_once():
        stream = ts.read_image_stream(spark, str(stream_dir))
        out = ts.streaming_near_dup_drop(stream).select("image_id", "phash")
        q = (
            out.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(sink).count()

    # land one more file (copy of an existing part with shifted ids)
    more = (
        spark.read.parquet(str(stream_dir))
        .limit(50)
        .withColumn("image_id", F.concat(F.lit("img0099"), F.substring("image_id", 8, 4)))
        .withColumn("phash", F.col("phash") + 999_999)
    )
    more.coalesce(1).write.mode("append").parquet(str(stream_dir))

    run_once()
    n2 = spark.read.parquet(sink).count()
    # restart processed ONLY the new file's rows (no re-emission of old)
    assert n1 < n2 <= n1 + 50


def test_stream_revisit_join_matches_batch(spark, stream_dir, tmp_path):
    """Stream-stream interval join (multi-file source, so both sides see
    several micro-batches) must equal the batch equi+range join."""
    from georaster_spark.operators import georegister as geo

    a = ts.read_image_stream(spark, str(stream_dir)).where(geo.image_idx() % 2 == 0)
    b = ts.read_image_stream(spark, str(stream_dir)).where(geo.image_idx() % 2 == 1)
    out = ts.stream_revisit_join(a, b, horizon_s=120)
    ts.run_to_memory(out, "sjoin_stream", str(tmp_path / "ck_sjoin"), state_partitions=8)
    got = sorted(
        (r["a_id"], r["b_id"], r["cell_id"], r["dt_s"])
        for r in spark.table("sjoin_stream").collect()
    )

    batch_src = spark.read.parquet(str(stream_dir))
    ta = (
        geo.georegister(ts.with_event_time(batch_src.where(geo.image_idx() % 2 == 0)))
        .select(F.col("image_id").alias("a_id"), "cell_id", F.col("ts").alias("ts_a"))
    )
    tb = (
        geo.georegister(ts.with_event_time(batch_src.where(geo.image_idx() % 2 == 1)))
        .select(F.col("image_id").alias("b_id"), F.col("cell_id").alias("cell_b"),
                F.col("ts").alias("ts_b"))
    )
    want = sorted(
        (r["a_id"], r["b_id"], r["cell_id"], r["dt_s"])
        for r in ta.join(
            tb,
            (F.col("cell_id") == F.col("cell_b"))
            & (F.col("ts_b") > F.col("ts_a"))
            & (F.col("ts_b") <= F.col("ts_a") + F.make_interval(secs=F.lit(120))),
        )
        .select(
            "a_id", "b_id", "cell_id",
            (F.col("ts_b").cast("long") - F.col("ts_a").cast("long")).alias("dt_s"),
        )
        .collect()
    )
    assert got == want and len(got) > 0


def test_stream_merge_to_icelite(spark, stream_dir, tmp_path):
    """foreachBatch CDC merge: per-batch snapshot commits, final state ==
    batch upsert of all rows, and a checkpointed re-run is a no-op."""
    from georaster_spark.sources import icelite

    table = tmp_path / "tbl"
    src = spark.read.parquet(str(stream_dir)).select("image_id", "w")
    seeded = src.withColumn("w", F.lit(-1))
    icelite.write_snapshot(seeded, table)
    v0 = icelite.snapshot_info(table)["version"]

    stream = (
        spark.readStream.schema("image_id string, w int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
        .select("image_id", "w")
    )
    ts.stream_merge_to_icelite(stream, table, "image_id", str(tmp_path / "ck_cdc"))
    v1 = icelite.snapshot_info(table)["version"]
    assert v1 >= v0 + 2  # several micro-batches, one commit each

    got = {r["image_id"]: r["w"] for r in icelite.read_snapshot(spark, table).collect()}
    want = {r["image_id"]: r["w"] for r in src.collect()}
    assert got == want  # every seeded -1 overwritten by the true width
    # seeded version still time-travelable
    old = icelite.read_snapshot(spark, table, v0)
    assert old.where(F.col("w") != -1).count() == 0

    # replay with the same checkpoint: stream fully consumed -> no-op
    stream2 = (
        spark.readStream.schema("image_id string, w int")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
        .select("image_id", "w")
    )
    ts.stream_merge_to_icelite(stream2, table, "image_id", str(tmp_path / "ck_cdc"))
    assert icelite.snapshot_info(table)["version"] == v1


def test_stream_sessionize_native_matches_custom(spark, stream_dir, tmp_path):
    """Spark's built-in session_window aggregation must emit exactly the
    sessions the custom applyInPandasWithState operator (and therefore
    the batch window idiom) defines: every emitted session is a batch
    session, and only per-cell tail sessions (unfinalized at the final
    watermark) may be withheld."""
    stream = ts.read_image_stream(spark, str(stream_dir))
    out = ts.stream_sessionize_native(stream, gap_s=200)
    ts.run_to_memory(out, "sess_native", str(tmp_path / "ck_sess_nat"))
    got = {_sess_key(r) for r in spark.sql("SELECT * FROM sess_native").collect()}

    batch = spark.read.parquet(str(stream_dir))
    exp_rows = ts.batch_sessionize(batch, gap_s=200).collect()
    exp = {_sess_key(r) for r in exp_rows}
    assert got <= exp
    last_per_cell = {}
    for r in exp_rows:
        k = _sess_key(r)
        prev = last_per_cell.get(r["cell_id"])
        if prev is None or k[1] > prev[1]:
            last_per_cell[r["cell_id"]] = k
    assert exp - got <= set(last_per_cell.values())
    assert got  # some sessions must finalize under the fixture cadence


def test_stream_quality_gate_matches_batch(spark, stream_dir, tmp_path):
    """S6: the streaming blur gate must pass exactly the tiles the batch
    evaluation passes (stateless mapInPandas — bit-identical verdicts)."""
    thr = 500
    stream = ts.read_image_stream(spark, str(stream_dir))
    out = ts.stream_quality_gate(stream, var_threshold=thr)
    ts.run_to_memory(out, "quality_stream", str(tmp_path / "ckq"))
    got = {
        r["image_id"]: (r["lap_var_num"], r["n_interior"])
        for r in spark.sql("SELECT * FROM quality_stream").collect()
    }
    batch = spark.read.parquet(str(stream_dir))
    exp = {
        r["image_id"]: (r["lap_var_num"], r["n_interior"])
        for r in ts.stream_quality_gate(batch, var_threshold=thr).collect()
    }
    assert got == exp
    assert 0 < len(got) < batch.count()  # the gate actually filters


def test_sliding_rate_matches_bruteforce(spark, stream_dir, tmp_path):
    stream = ts.read_image_stream(spark, str(stream_dir))
    out = ts.sliding_rate(stream)
    ts.run_to_memory(out, "rate_stream", str(tmp_path / "ck_rate"))
    got = {
        r["win_start"]: (r["n_images"], r["idx_checksum"])
        for r in spark.sql("SELECT * FROM rate_stream").collect()
    }
    assert got
    # brute-force sliding assignment from the batch idx set
    idxs = [
        r[0]
        for r in spark.read.parquet(str(stream_dir))
        .select(F.substring("image_id", 4, 10).cast("long"))
        .collect()
    ]
    import datetime
    want: dict = {}
    t0 = datetime.datetime(2024, 1, 1)
    for t in idxs:
        lo = -((120 - t + 29) // 30) if t < 120 else (t - 120) // 30 + 1
        # windows w*30 with w*30 > t-120 and w*30 <= t
        w = lo
        while w * 30 <= t:
            if w * 30 > t - 120:
                k = t0 + datetime.timedelta(seconds=w * 30)
                c, s = want.get(k, (0, 0))
                want[k] = (c + 1, s + t)
            w += 1
    # every emitted (finalized) window must match brute force exactly
    for k, v in got.items():
        assert want[k] == v, k
    # each event contributes to exactly 4 windows overall
    assert sum(c for c, _ in want.values()) == 4 * len(idxs)
