"""Op R11 — windowed read / extract-subset.

Reference: georaster/georaster.py :: __Raster.read_single_band_subset
(≈L390-480 ⚠ UNVERIFIED, SURVEY §0): world bounds -> pixel window ->
partial read; `update_info=True` rewrites nx/ny/trans/extent.

Distributed shape: a RANGE-PREDICATE FILTER (tiles whose extent overlaps
the query box — Catalyst pushes the metadata predicates to the parquet
scan, so non-overlapping row groups are pruned without touching
`bytes`), then per-tile window slicing fused into one mapInPandas
(decode -> slice -> re-encode), with the new geotransform emitted as
columns — the distributed analog of update_info.

Window math (engine semantics, floor/ceil on corner-relative fractions):
  px0 = max(0, floor((bxmin - gt_x0) / xres));  px1 = min(w, ceil((bxmax - gt_x0) / xres))
  py0 = max(0, floor((gt_y0 - bymax) / yres));  py1 = min(h, ceil((gt_y0 - bymin) / yres))
  gt_x0' = gt_x0 + px0 * xres;  gt_y0' = gt_y0 - py0 * yres;  w' = px1-px0; h' = py1-py0
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import oracle

_OUT_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "gt_x0 double, gt_y0 double, gt_xres double, gt_yres double"
)


def window_columns(tiles: DataFrame, bounds: tuple[float, float, float, float]) -> DataFrame:
    """Attach integer pixel-window columns (px0, px1, py0, py1) for the
    world box bounds=(bxmin, bxmax, bymin, bymax); keeps only tiles with a
    non-empty window.  Pure Column math — usable standalone (the
    `extent=True` metadata-only variant of R11)."""
    bxmin, bxmax, bymin, bymax = bounds
    df = (
        tiles.where(
            (F.col("xmin") < bxmax) & (F.col("xmax") > bxmin)
            & (F.col("ymin") < bymax) & (F.col("ymax") > bymin)
        )
        .withColumn("px0", F.greatest(F.lit(0), F.floor((F.lit(bxmin) - F.col("gt_x0")) / F.col("gt_xres"))))
        .withColumn("px1", F.least(F.col("w").cast("long"), F.ceil((F.lit(bxmax) - F.col("gt_x0")) / F.col("gt_xres"))))
        .withColumn("py0", F.greatest(F.lit(0), F.floor((F.col("gt_y0") - F.lit(bymax)) / F.col("gt_yres"))))
        .withColumn("py1", F.least(F.col("h").cast("long"), F.ceil((F.col("gt_y0") - F.lit(bymin)) / F.col("gt_yres"))))
    )
    return df.where((F.col("px1") > F.col("px0")) & (F.col("py1") > F.col("py0")))


def read_subset(
    tiles: DataFrame,
    bounds: tuple[float, float, float, float],
    downsample: int = 1,
) -> DataFrame:
    """R11 (+R2's downsampl): new tiles table holding only the window,
    with updated geotransform.  `downsample=k` strides the window
    ([::k, ::k]) — the decimated-read analog; its geotransform scales
    resolution by k."""
    windowed = window_columns(tiles, bounds)

    def slice_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "gt_x0", "gt_y0", "gt_xres", "gt_yres")}
            for k in range(len(pdf)):
                row = pdf.iloc[k]
                arr = oracle.decode_pixels(row["bytes"], int(row["w"]), int(row["h"]), row["fmt"])
                px0, px1, py0, py1 = int(row["px0"]), int(row["px1"]), int(row["py0"]), int(row["py1"])
                sub = arr[py0:py1:downsample, px0:px1:downsample]
                fmt = row["fmt"] if row["fmt"] != "qnt" else "raw"  # already quantized
                out["image_id"].append(row["image_id"])
                out["bytes"].append(oracle.encode_pixels(sub, fmt))
                out["w"].append(sub.shape[1])
                out["h"].append(sub.shape[0])
                out["fmt"].append(fmt)
                out["gt_x0"].append(row["gt_x0"] + px0 * row["gt_xres"])
                out["gt_y0"].append(row["gt_y0"] - py0 * row["gt_yres"])
                out["gt_xres"].append(row["gt_xres"] * downsample)
                out["gt_yres"].append(row["gt_yres"] * downsample)
            yield pd.DataFrame(out)

    return windowed.mapInPandas(slice_batches, schema=_OUT_SCHEMA)
