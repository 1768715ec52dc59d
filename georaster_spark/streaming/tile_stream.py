"""Structured Streaming ingest for the tiles table.

The reference is batch-only (SURVEY §2.3: streaming "—"), and the north
rule's durability requirement is met by batch checkpoint/resume (op E9).
This module is the engine's streaming *ingest* tier for the production
posture where the image table grows continuously: new image files land
-> `readStream` picks them up -> georegister (same Column math as batch
— the code path is shared, which is the point of DataFrame-first
design) -> watermarked per-cell tumbling-window stats + streaming
near-dup drop.  `availableNow` triggers make every pipeline testable
batch-equivalently (tests/test_streaming.py).

Event time is derived deterministically from the image index
(fixture-synthesis rule: one image per second from T0) so watermark /
late-data semantics are exercised without wall clocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import DEFAULT_RES
from ..operators import georegister as geo

T0 = "2024-01-01 00:00:00"

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string,"
    " caption string, phash long"
)


def read_image_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a growing directory of image parquet."""
    return (
        spark.readStream.schema(IMAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def with_event_time(images: DataFrame) -> DataFrame:
    ts = F.to_timestamp(F.lit(T0)) + F.make_interval(secs=geo.image_idx())
    return images.withColumn("ts", ts)


def cell_window_stats(
    images: DataFrame,
    r: int = DEFAULT_RES,
    window: str = "1 minute",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Per (tumbling window, anchor cell): image count + mean tile width.
    Watermark bounds state: rows later than `watermark` behind the max
    event time are dropped and their windows finalized."""
    tiles = geo.georegister(with_event_time(images), r)
    return (
        tiles.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("cell_id"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.avg("w").alias("avg_w"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "cell_id",
            "n_images",
            "avg_w",
        )
    )


def streaming_near_dup_drop(images: DataFrame, watermark: str = "2 minutes") -> DataFrame:
    """Streaming exact-phash dedup: keep the first arrival of each phash
    within the watermark horizon (state is bounded by the watermark —
    at 10^12 rows unbounded dropDuplicates state would OOM)."""
    return with_event_time(images).withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["phash"]
    )


def run_to_memory(stream_df: DataFrame, name: str, checkpoint: str):
    """availableNow trigger -> memory sink; returns the finished query.
    (Production: writeStream.format('parquet'/'iceberg') with the same
    checkpointLocation giving exactly-once file output.)"""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q
