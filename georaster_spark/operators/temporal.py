"""Temporal stack composite (A35) — per-pixel reduction across revisit
epochs of the same tile footprint.

The Earth-observation workhorse: given T co-registered snapshots of each
tile (revisit epochs), reduce pixel-wise across the time axis — min/max
composites, range (change envelope), and the epoch-of-minimum band
(`argmin` composite, e.g. "date of greenest pixel").  Upstream georaster
has no multi-temporal surface (one `SingleBandRaster` per file,
`georaster/georaster.py :: SingleBandRaster` ≈L600-780 ⚠ UNVERIFIED,
SURVEY §0); a user stacks arrays by hand.  Here the stack is a relation
of (image_id, epoch) rows and the reduction is a grouped Arrow pass.

Epoch synthesis: the sandbox fixture corpus has one snapshot per tile,
so epoch e's pixels are derived deterministically as
``v_e = (v0 + delta * e) mod 256`` — a rotation of the value ramp that
keeps every per-pixel reduction integer-exact and lets the DuckDB oracle
re-derive the composite from the ramp formula alone.  The *shape* of the
operator is the real one: epoch rows are independent relation rows that
must meet in a per-tile group, exactly as T distinct ingest batches
would.

Scale shape: ONE shuffle of pixel payloads keyed by image_id (the
unavoidable data movement when epochs arrive in separate batches); with
the tiles table bucketed by image_id (sources/bucketed tables op) the
exchange disappears and the grouped reduce runs map-side.  The reduction
itself is vectorized NumPy over an (E, h*w) int64 block per tile; output
rows are slim per-tile stats — pixel bytes never leave the executor
after the group forms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle

_STACK_SCHEMA = (
    "image_id string, n_epochs int, n_px long, min_sum long, max_sum long, "
    "range_sum long, range_max long, argmin_checksum long"
)


def epoch_rows(tiles: DataFrame, n_epochs: int) -> DataFrame:
    """Explode each tile row into `n_epochs` (image_id, epoch, bytes...)
    rows — the stand-in for T real revisit batches.  The epoch pixel
    transform happens inside the reducer so the synthetic bytes are never
    materialized in the shuffle (each epoch row ships the base payload
    exactly once, as a real ingest would ship its own snapshot)."""
    return tiles.select(
        "image_id", "bytes", "w", "h", "fmt",
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    )


def temporal_stack(tiles: DataFrame, n_epochs: int = 4, delta: int = 17) -> DataFrame:
    """Per-tile temporal composite over `n_epochs` epochs:

      n_px             pixels per tile
      min_sum/max_sum  sum over pixels of the per-pixel min/max across epochs
      range_sum/range_max  sum/max of per-pixel (max - min) — change envelope
      argmin_checksum  sum of min_epoch(p) * (pixel_idx + 1), where
                       min_epoch(p) is the SMALLEST epoch attaining the
                       per-pixel min (deterministic tie rule)

    All int64-exact: uint8/uint16 pixels, integer epoch shift mod 256.
    """

    def _reduce(key, pdf: pd.DataFrame) -> pd.DataFrame:
        row0 = pdf.iloc[0]
        w, h = int(row0["w"]), int(row0["h"])
        base = oracle.decode_pixels(row0["bytes"], w, h, row0["fmt"]).astype(np.int64)
        eps = np.sort(pdf["epoch"].to_numpy(dtype=np.int64))
        # epoch snapshots: (E, h*w) int64
        stack = (base.ravel()[None, :] + delta * eps[:, None]) % 256
        mn = stack.min(axis=0)
        mx = stack.max(axis=0)
        # smallest epoch attaining the min: argmax over a reversed mask
        min_epoch = eps[np.argmax(stack == mn[None, :], axis=0)]
        wt = np.arange(1, mn.size + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                "image_id": [key[0]],
                "n_epochs": [int(len(eps))],
                "n_px": [int(mn.size)],
                "min_sum": [int(mn.sum())],
                "max_sum": [int(mx.sum())],
                "range_sum": [int((mx - mn).sum())],
                "range_max": [int((mx - mn).max())],
                "argmin_checksum": [int((min_epoch * wt).sum())],
            }
        )

    rows = epoch_rows(tiles, n_epochs)
    return rows.groupBy("image_id").applyInPandas(_reduce, schema=_STACK_SCHEMA)


_TREND_SCHEMA = (
    "image_id string, n_epochs int, n_px long, trend_sum long, trend_min long, "
    "trend_max long, n_rising long, n_falling long, trend_checksum long"
)


def temporal_trend(tiles: DataFrame, n_epochs: int = 4, delta: int = 17) -> DataFrame:
    """Per-pixel least-squares TREND across revisit epochs (the
    NDVI-trend / land-change detector): for pixel p with epoch values
    v_e, the regression slope of v on e is  num(p) / den  with the
    integer numerator

        num(p) = E * sum(e * v_e) - (sum e) * (sum v_e)

    and a constant positive denominator den = E * sum(e^2) - (sum e)^2 —
    so the SIGN and ORDERING of slopes are exact on the int64 surface
    (rising/falling counts classify exactly; a float slope would not
    hash-match across engines).  Emits per-tile sum/min/max of num,
    rising/falling pixel counts, and the position-weighted checksum.

    Same plan shape as temporal_stack: ONE pixel shuffle keyed by
    image_id (zero when bucketed), vectorized (E, h*w) reduce."""

    def _reduce(key, pdf: pd.DataFrame) -> pd.DataFrame:
        row0 = pdf.iloc[0]
        w, h = int(row0["w"]), int(row0["h"])
        base = oracle.decode_pixels(row0["bytes"], w, h, row0["fmt"]).astype(np.int64)
        eps = np.sort(pdf["epoch"].to_numpy(dtype=np.int64))
        stack = (base.ravel()[None, :] + delta * eps[:, None]) % 256
        e_cnt = len(eps)
        sum_v = stack.sum(axis=0)
        sum_ev = (eps[:, None] * stack).sum(axis=0)
        num = e_cnt * sum_ev - int(eps.sum()) * sum_v
        wt = np.arange(1, num.size + 1, dtype=np.int64)
        return pd.DataFrame(
            {
                "image_id": [key[0]],
                "n_epochs": [e_cnt],
                "n_px": [int(num.size)],
                "trend_sum": [int(num.sum())],
                "trend_min": [int(num.min())],
                "trend_max": [int(num.max())],
                "n_rising": [int((num > 0).sum())],
                "n_falling": [int((num < 0).sum())],
                "trend_checksum": [int((num * wt).sum())],
            }
        )

    rows = epoch_rows(tiles, n_epochs)
    return rows.groupBy("image_id").applyInPandas(_reduce, schema=_TREND_SCHEMA)


def gap_fill_hourly(events: DataFrame) -> DataFrame:
    """Time-series regularization with forward fill (pandas
    ``resample('1h').ffill()`` / InfluxDB fill(previous) — the gap-fill
    every monitoring pipeline runs before modeling): per user, an hourly
    grid from the user's first to last event hour; each slot carries the
    value of its latest event (deterministic in-hour rule: the event
    with max event_id), empty slots forward-fill from the previous
    observed hour.

    Emitted per user: slot count, observed-slot count, the final value,
    and a position-weighted checksum over the FILLED series — pinning
    every filled slot, not just the observed ones.

    Scale shape: one (user, hour) pre-agg collapses raw events, one
    bounded sequence-explode builds the grid (span-sized, not
    event-sized), and the forward fill is a running last() window
    partitioned BY USER — no unpartitioned window anywhere."""
    from pyspark.sql import Window

    val_c = F.round(F.col("value") * 100).cast("long")
    hr = F.floor(F.unix_timestamp("ts") / 3600).cast("long")
    hourly = (
        events.select(
            "user_id", hr.alias("h"), "event_id", val_c.alias("val_c")
        )
        .groupBy("user_id", "h")
        .agg(F.expr("max_by(val_c, event_id)").alias("hv"))
    )
    span = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = span.select(
        "user_id", "h0", F.explode(F.sequence("h0", "h1")).alias("h")
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = joined.select(
        "user_id",
        "h0",
        "h",
        F.col("hv").isNotNull().alias("obs"),
        F.last("hv", ignorenulls=True).over(w).alias("fv"),
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.sum(F.when(F.col("obs"), 1).otherwise(0)).alias("n_observed"),
        F.max_by("fv", "h").alias("last_val"),
        F.sum((F.col("h") - F.col("h0") + 1) * F.col("fv")).alias("fill_checksum"),
    )
