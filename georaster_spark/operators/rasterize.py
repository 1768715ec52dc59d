"""Polygon rasterization — burn zone ids into tile pixel grids (the
GDAL ``gdal.RasterizeLayer`` analog; upstream georaster users reach for
it to make label masks from vector layers).  This is the inverse of
op E7 (zonal extraction): vector -> raster instead of raster -> vector,
and the label-mask generator a training-data pipeline needs (per-pixel
segmentation targets from vector annotations).

Semantics (normative, convex CCW rings, boundary inside — same
containment rule as ops E5/E7): a pixel takes ``zone_id + 1`` of the
LOWEST-id zone whose polygon contains the pixel center, else 0
(background; +1 because zone ids start at 0).  Deterministic under any
zone ordering — ties resolve by min id, matching E5's tie rule.

Scale shape: zones are a broadcast-sized dim (same assumption as the
E5/E7 broadcast joins); their rings are packed into NumPy arrays ONCE
and shipped to executors via an explicit ``SparkContext.broadcast``, so
the burn is a MAP-ONLY pass — no join, no shuffle, nothing pixel-sized
ever moves.  Pixel payloads are not even read: burning needs only each
tile's geotransform, so the scan prunes ``bytes`` away entirely and the
output mask is the only pixel-sized payload in the plan.  (For zone
tables too big to broadcast, switch to the cell-key pair join of op E5
and re-group labels per tile; not needed at dim scale.)

Masks encode as little-endian uint16 (zone count may exceed 255 at
corpus scale; 0 = background) — decodable by ``np.frombuffer(m, '<u2')``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle

_SUMMARY_SCHEMA = "image_id string, n_burned long, burn_checksum long"
_MASK_SCHEMA = "image_id string, w int, h int, mask binary"


def _pack_zones(zones: DataFrame) -> list[tuple]:
    """Driver-side pack of the dim-sized zones table: DESCENDING zone_id,
    so overwriting in order leaves the lowest id in overlaps."""
    rows = (
        zones.select("zone_id", "ring", "xmin", "xmax", "ymin", "ymax")
        .orderBy(F.col("zone_id").desc())
        .collect()
    )
    return [
        (
            int(r["zone_id"]),
            np.asarray([p["x"] for p in r["ring"]], dtype=np.float64),
            np.asarray([p["y"] for p in r["ring"]], dtype=np.float64),
            float(r["xmin"]), float(r["xmax"]), float(r["ymin"]), float(r["ymax"]),
        )
        for r in rows
    ]


def _burn_tile(row, packed) -> np.ndarray:
    w, h = int(row.w), int(row.h)
    xs, ys = oracle.pixel_centers(
        row.gt_x0, row.gt_y0, row.gt_xres, row.gt_yres, w, h
    )
    label = np.zeros(w * h, dtype=np.int64)
    txmin, txmax = float(row.gt_x0), float(row.gt_x0) + w * float(row.gt_xres)
    tymax, tymin = float(row.gt_y0), float(row.gt_y0) - h * float(row.gt_yres)
    fx, fy = xs.ravel(), ys.ravel()
    for zid, rx, ry, zxmin, zxmax, zymin, zymax in packed:
        if txmin >= zxmax or txmax <= zxmin or tymin >= zymax or tymax <= zymin:
            continue
        inside = oracle.pip_halfplane(rx, ry, fx, fy)
        label[inside] = zid + 1  # descending order => min id wins
    return label.reshape(h, w)


def rasterize_zones(tiles: DataFrame, zones: DataFrame) -> DataFrame:
    """Per-tile label mask: (image_id, w, h, mask) with mask the
    row-major little-endian uint16 burn of ``zone_id + 1`` (0 = none)."""
    packed = _pack_zones(zones)
    bc = tiles.sparkSession.sparkContext.broadcast(packed)
    slim = tiles.select(
        "image_id", "w", "h", "gt_x0", "gt_y0", "gt_xres", "gt_yres"
    )

    def _mask(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pk = bc.value
        for pdf in batches:
            out = {"image_id": [], "w": [], "h": [], "mask": []}
            for row in pdf.itertuples(index=False):
                lab = _burn_tile(row, pk)
                out["image_id"].append(row.image_id)
                out["w"].append(int(row.w))
                out["h"].append(int(row.h))
                out["mask"].append(lab.astype("<u2").tobytes())
            yield pd.DataFrame(out)

    return slim.mapInPandas(_mask, schema=_MASK_SCHEMA)


def rasterize_summary(tiles: DataFrame, zones: DataFrame) -> DataFrame:
    """Contract surface: per-tile n_burned (pixels with a label) +
    burn_checksum = sum(label[i,j] * (i*w + j + 1)) — the mask itself
    reduced in the same fused pass (labels never leave NumPy)."""
    packed = _pack_zones(zones)
    bc = tiles.sparkSession.sparkContext.broadcast(packed)
    slim = tiles.select(
        "image_id", "w", "h", "gt_x0", "gt_y0", "gt_xres", "gt_yres"
    )

    def _summary(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pk = bc.value
        for pdf in batches:
            out = {"image_id": [], "n_burned": [], "burn_checksum": []}
            for row in pdf.itertuples(index=False):
                lab = _burn_tile(row, pk).ravel()
                wt = np.arange(1, lab.size + 1, dtype=np.int64)
                out["image_id"].append(row.image_id)
                out["n_burned"].append(int((lab > 0).sum()))
                out["burn_checksum"].append(int((lab * wt).sum()))
            yield pd.DataFrame(out)

    return slim.mapInPandas(_summary, schema=_SUMMARY_SCHEMA)


# ---------------------------------------------------------------------------
# Route burn: DDA super-sampled line rasterization census (round 3)
# ---------------------------------------------------------------------------

ROUTE_STRIDE = 617   # waypoint k = centroid of tile idx = k * STRIDE
ROUTE_STEPS = 256    # DDA samples per segment (power of two)
ROUTE_RES = 13       # burn grid resolution (cell edge = DOMAIN >> 13 = 8192)


def route_burn(tiles: DataFrame) -> DataFrame:
    """Line rasterization census — the vector->raster primitive for LINE
    features (roads, transects; the ``gdal_rasterize`` line-layer analog
    complementing rasterize_tiles' polygon burn).  The route is the
    polyline through every ROUTE_STRIDE-th tile centroid (integer world
    coordinates by construction); each segment is sampled at
    ROUTE_STEPS evenly spaced parameter values (DDA super-sampling) and
    each sample is binned to its res-ROUTE_RES grid cell.

    INTEGER-EXACT in every engine: sample k of segment (x0,y0)->(x1,y1)
    has numerator nx = x0*(S-k) + x1*k over denominator S, so the cell
    column floor(nx/S / edge) = clamp(nx, 0..) DIV (S*edge) is one
    nonnegative int64 floor division — no float ever enters.  Emitted
    per segment: distinct-cell count and the Σ/min/max of the cells'
    LOCAL codes rc = row * 2^r + col (< 2^26, so sums stay far inside
    int64), pinning the burned cell set.

    Plan: the waypoint table is tiny (n/STRIDE rows) — the segment
    self-join broadcasts; the S-step fan-out is a codegen
    explode(sequence), the distinct and the census are ONE shuffle each
    on the slim (seg_id, rc) pair.  Zero Python, zero pixel bytes."""
    from ..constants import DOMAIN, TILE_SPAN
    from .georegister import image_idx

    s_edge = DOMAIN >> ROUTE_RES
    den = ROUTE_STEPS * s_edge
    nmax = (1 << ROUTE_RES) - 1
    idx = image_idx()
    wp = tiles.where(idx % ROUTE_STRIDE == 0).select(
        F.floor(idx / ROUTE_STRIDE).cast("long").alias("wp"),
        (F.col("gt_x0") + TILE_SPAN / 2).cast("long").alias("cx"),
        (F.col("gt_y0") - TILE_SPAN / 2).cast("long").alias("cy"),
    )
    a = wp.alias("a")
    b = wp.select(
        (F.col("wp") - 1).alias("wp"),
        F.col("cx").alias("x1"),
        F.col("cy").alias("y1"),
    ).alias("b")
    seg = a.join(F.broadcast(b), "wp").select(
        F.col("wp").alias("seg_id"),
        F.col("cx").alias("x0"), F.col("cy").alias("y0"),
        "x1", "y1",
    )
    # integer DIV (not float /): exact at any coordinate magnitude
    col = F.expr(
        f"least(greatest(x0 * ({ROUTE_STEPS} - k) + x1 * k, 0)"
        f" DIV {den}, {nmax})"
    )
    row = F.expr(
        f"least(greatest({DOMAIN * ROUTE_STEPS} - (y0 * ({ROUTE_STEPS} - k)"
        f" + y1 * k), 0) DIV {den}, {nmax})"
    )
    cells_ = (
        seg.select(
            "seg_id", "x0", "y0", "x1", "y1",
            F.explode(F.sequence(F.lit(0), F.lit(ROUTE_STEPS - 1))).alias("k"),
        )
        .select("seg_id", (row * (1 << ROUTE_RES) + col).alias("rc"))
        .distinct()
    )
    return cells_.groupBy("seg_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("rc").alias("rc_sum"),
        F.min("rc").alias("rc_min"),
        F.max("rc").alias("rc_max"),
    )
