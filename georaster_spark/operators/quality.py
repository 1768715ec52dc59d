"""Image-quality metrics for training-data curation (blur scoring,
information content).  Reference analog: the per-raster NumPy statistics
a georaster user computes on ``self.r`` after an eager load
(`georaster/georaster.py :: SingleBandRaster` eager-load ≈L620-700 ⚠
UNVERIFIED, SURVEY §0) — here the two standard data-curation filters a
10^12-image pipeline runs before training:

* **variance of Laplacian** (blur / flat-image detection — the classic
  OpenCV ``cv2.Laplacian(img).var()`` sharpness test, public knowledge):
  a blurry or constant tile has near-zero high-frequency response, so
  its Laplacian variance collapses.  We keep the INTEGER variance
  numerator ``n*Σx² − (Σx)²`` instead of the float variance, so the
  metric is bit-reproducible across engines (same integer-surface
  discipline as algebra.terrain_stats).
* **Shannon entropy** of the 256-bin pixel histogram (information
  content — near-zero entropy means a synthetic/empty/single-color
  tile).  Entropy is the one float here; it is reduced over ≤256
  histogram terms and rounded to 6 decimals, the same cross-engine
  tolerance convention the multiband std uses.

Scale shape: both are MAP-ONLY fused mapInPandas passes — pixel bytes
cross the JVM→Python Arrow boundary exactly once, all math is
vectorized per (w,h,fmt) group, nothing pixel-sized is ever shuffled.
At 10^12 rows the cost is one scan; the slim metric rows (5 int64s) are
what any downstream filter/join consumes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_DT = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}

_LAP_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_interior", LongType()),
        StructField("lap_sum", LongType()),
        StructField("lap_abs_sum", LongType()),
        StructField("lap_var_num", LongType()),
        StructField("lap_checksum", LongType()),
    ]
)

_ENTROPY_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_pixels", LongType()),
        StructField("n_distinct", LongType()),
        StructField("mode_val", LongType()),
        StructField("mode_cnt", LongType()),
        StructField("entropy", DoubleType()),
    ]
)


def laplacian_stats(tiles: DataFrame) -> DataFrame:
    """Integer-exact variance-of-Laplacian sharpness statistics.

    4-neighbour Laplacian over interior pixels
    ``lap = z[i-1,j] + z[i+1,j] + z[i,j-1] + z[i,j+1] - 4*z[i,j]``;
    emits, per tile, the interior count n, Σlap, Σ|lap|, the exact
    variance numerator ``n·Σlap² − (Σlap)²`` (variance = num / n², so
    thresholding num vs T·n² is the float test, exactly), and the
    position-weighted checksum Σ lap·w pinning every interior value.

    Overflow audit: |lap| ≤ 4·65535 for raw16, lap² ≤ 6.9e10,
    n ≤ 4096 ⇒ n·Σlap² ≤ 1.2e18 < 2^63.  uint8 formats are far below.
    """
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _lap(batches):
        cols = ("n_interior", "lap_sum", "lap_abs_sum", "lap_var_num", "lap_checksum")
        for pdf in batches:
            n = len(pdf)
            out = {"image_id": pdf["image_id"].to_numpy(dtype=object)}
            for c in cols:
                out[c] = np.zeros(n, dtype=np.int64)
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (int(pdf["w"].iat[k]), int(pdf["h"].iat[k]), pdf["fmt"].iat[k])
                groups.setdefault(key, []).append(k)
            for (w, h, fmt), idx in groups.items():
                if w < 3 or h < 3:
                    continue
                # narrow compute dtype: the stencil is memory-bandwidth
                # bound across 32 worker processes, and int64 temporaries
                # measured 4.7x slower than int16 with identical results.
                # |lap| <= 4*255 (int16) / 4*65535 (int32 for raw16);
                # every reduction accumulates in int64 via einsum/dtype=.
                small = np.int32 if fmt == "raw16" else np.int16
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[k] for k in idx), dtype=_DT[fmt]
                    )
                    .reshape(len(idx), h, w)
                    .astype(small)
                )
                lap = (
                    z[:, :-2, 1:-1] + z[:, 2:, 1:-1]
                    + z[:, 1:-1, :-2] + z[:, 1:-1, 2:]
                    - 4 * z[:, 1:-1, 1:-1]
                )
                npx = (h - 2) * (w - 2)
                wt = np.arange(1, npx + 1, dtype=np.int64).reshape(h - 2, w - 2)
                ii = np.asarray(idx)
                s = lap.sum(axis=(1, 2), dtype=np.int64)
                sq = np.einsum("bij,bij->b", lap, lap, dtype=np.int64)
                out["n_interior"][ii] = npx
                out["lap_sum"][ii] = s
                out["lap_abs_sum"][ii] = np.abs(lap).sum(axis=(1, 2), dtype=np.int64)
                out["lap_var_num"][ii] = npx * sq - s * s
                out["lap_checksum"][ii] = np.einsum(
                    "bij,ij->b", lap, wt, dtype=np.int64
                )
            yield pd.DataFrame(out)

    return slim.mapInPandas(_lap, schema=_LAP_SCHEMA)


def entropy_stats(tiles: DataFrame) -> DataFrame:
    """Per-tile 256-bin histogram entropy + exact histogram integers.

    Emits n_pixels, n_distinct (bins hit), the modal value and its count
    (ties broken toward the SMALLEST value, matching the SQL
    ``ORDER BY cnt DESC, v ASC`` idiom), and the Shannon entropy in nats
    ``ln(N) − (Σ c·ln c)/N`` rounded to 6 decimals.  raw16 inputs are
    right-shifted 8 bits so the histogram is always 256 bins.

    All-integer columns are bit-exact; entropy's ≤256-term float reduce
    rounds to 6 decimals (the multiband-std cross-engine convention).
    """
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _ent(batches):
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"].to_numpy(dtype=object),
                "n_pixels": np.zeros(n, dtype=np.int64),
                "n_distinct": np.zeros(n, dtype=np.int64),
                "mode_val": np.zeros(n, dtype=np.int64),
                "mode_cnt": np.zeros(n, dtype=np.int64),
                "entropy": np.zeros(n, dtype=np.float64),
            }
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (int(pdf["w"].iat[k]), int(pdf["h"].iat[k]), pdf["fmt"].iat[k])
                groups.setdefault(key, []).append(k)
            for (w, h, fmt), idx in groups.items():
                z = np.frombuffer(
                    b"".join(pdf["bytes"].iat[k] for k in idx), dtype=_DT[fmt]
                ).reshape(len(idx), h * w)
                if fmt == "raw16":
                    z = (z >> 8).astype(np.uint8)
                npx = h * w
                # vectorized per-row bincount: offset row r's values by 256*r
                offs = (np.arange(len(idx)) * 256)[:, None]
                hist = np.bincount(
                    (z.astype(np.int64) + offs).ravel(), minlength=len(idx) * 256
                ).reshape(len(idx), 256)
                cnt = hist.astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    clogc = np.where(hist > 0, cnt * np.log(np.maximum(cnt, 1)), 0.0)
                ent = np.round(np.log(npx) - clogc.sum(axis=1) / npx, 6)
                # smallest-value tie-break: argmax returns the FIRST max index
                mode_val = hist.argmax(axis=1)
                ii = np.asarray(idx)
                out["n_pixels"][ii] = npx
                out["n_distinct"][ii] = (hist > 0).sum(axis=1)
                out["mode_val"][ii] = mode_val
                out["mode_cnt"][ii] = hist[np.arange(len(idx)), mode_val]
                out["entropy"][ii] = ent
            yield pd.DataFrame(out)

    return slim.mapInPandas(_ent, schema=_ENTROPY_SCHEMA)


_GLCM_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("n_pairs", LongType()),
        StructField("contrast", LongType()),
        StructField("energy", LongType()),
        StructField("n_distinct_pairs", LongType()),
        StructField("pair_checksum", LongType()),
    ]
)


def glcm_texture(tiles: DataFrame) -> DataFrame:
    """GLCM texture metrics (Haralick, horizontal offset (0,1)) — the
    classic remote-sensing texture features, kept on an integer surface:

      contrast         Σ (a−b)² over adjacent pixel pairs (a=z[i,j],
                       b=z[i,j+1]) — high for noisy/edge-rich tiles
      energy           Σ_ab n(a,b)² over the 256×256 co-occurrence
                       matrix — high for uniform texture
      n_distinct_pairs occupied co-occurrence cells
      pair_checksum    Σ (a·256 + b) over pairs — pins the exact pair
                       multiset together with n_pairs/contrast

    raw16 inputs right-shift to 8 bits (256-level GLCM convention).
    Map-only fused Arrow pass; the 64k-bin co-occurrence histogram is a
    per-tile vectorized bincount, never a shuffle."""

    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _glcm(batches):
        for pdf in batches:
            n = len(pdf)
            out = {"image_id": pdf["image_id"].to_numpy(dtype=object)}
            for c in ("n_pairs", "contrast", "energy", "n_distinct_pairs", "pair_checksum"):
                out[c] = np.zeros(n, dtype=np.int64)
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (int(pdf["w"].iat[k]), int(pdf["h"].iat[k]), pdf["fmt"].iat[k])
                groups.setdefault(key, []).append(k)
            for (w, h, fmt), idx in groups.items():
                if w < 2:
                    continue
                z = np.frombuffer(
                    b"".join(pdf["bytes"].iat[k] for k in idx), dtype=_DT[fmt]
                ).reshape(len(idx), h, w)
                if fmt == "raw16":
                    z = (z >> 8).astype(np.uint8)
                z = z.astype(np.int64)
                a, b = z[:, :, :-1], z[:, :, 1:]
                code = (a * 256 + b).reshape(len(idx), -1)
                offs = (np.arange(len(idx)) * 65536)[:, None]
                hist = np.bincount(
                    (code + offs).ravel(), minlength=len(idx) * 65536
                ).reshape(len(idx), 65536)
                ii = np.asarray(idx)
                out["n_pairs"][ii] = h * (w - 1)
                out["contrast"][ii] = ((a - b) ** 2).sum(axis=(1, 2))
                out["energy"][ii] = (hist * hist).sum(axis=1)
                out["n_distinct_pairs"][ii] = (hist > 0).sum(axis=1)
                out["pair_checksum"][ii] = code.sum(axis=1)
            yield pd.DataFrame(out)

    return slim.mapInPandas(_glcm, schema=_GLCM_SCHEMA)


_GATES_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("sharp", BooleanType()),
        StructField("informative", BooleanType()),
    ]
)


def curation_gates(tiles: DataFrame, distinct_min: int) -> DataFrame:
    """Both curation gates in ONE Arrow pass: `sharp` is
    laplacian_stats' variance-numerator test (n·Σlap² − (Σlap)² > 0) and
    `informative` is entropy_stats' distinct-bin census (≥ distinct_min,
    raw16 right-shifted to the 256-bin surface) — bit-identical to
    running the two standalone ops and joining, but the corpus pixels
    cross the JVM→Python boundary and decode ONCE instead of twice.
    This is the fused fast path q_curation_pipeline runs; the standalone
    ops remain for callers that need the full metric columns."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _g(batches):
        for pdf in batches:
            n = len(pdf)
            sharp = np.zeros(n, dtype=bool)
            informative = np.zeros(n, dtype=bool)
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (int(pdf["w"].iat[k]), int(pdf["h"].iat[k]), pdf["fmt"].iat[k])
                groups.setdefault(key, []).append(k)
            for (w, h, fmt), idx in groups.items():
                b = len(idx)
                # same narrow-dtype discipline as laplacian_stats: the
                # stencil is bandwidth-bound; int64 accumulation happens
                # only inside the einsum/sum reductions.
                small = np.int32 if fmt == "raw16" else np.int16
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[k] for k in idx), dtype=_DT[fmt]
                    )
                    .reshape(b, h, w)
                    .astype(small)
                )
                ii = np.asarray(idx)
                if w >= 3 and h >= 3:
                    lap = (
                        z[:, :-2, 1:-1] + z[:, 2:, 1:-1]
                        + z[:, 1:-1, :-2] + z[:, 1:-1, 2:]
                        - 4 * z[:, 1:-1, 1:-1]
                    )
                    npx = (h - 2) * (w - 2)
                    s = lap.sum(axis=(1, 2), dtype=np.int64)
                    sq = np.einsum("bij,bij->b", lap, lap, dtype=np.int64)
                    sharp[ii] = (npx * sq - s * s) > 0
                zz = z.reshape(b, h * w).astype(np.int32)
                if fmt == "raw16":
                    zz = zz >> 8
                offs = (np.arange(b, dtype=np.int32) * 256)[:, None]
                hist = np.bincount(
                    (zz + offs).ravel(), minlength=b * 256
                ).reshape(b, 256)
                informative[ii] = (hist > 0).sum(axis=1) >= distinct_min
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(dtype=object),
                    "sharp": sharp,
                    "informative": informative,
                }
            )

    return slim.mapInPandas(_g, schema=_GATES_SCHEMA)


MERKLE_PARENT_RES_DELTA = 2


def merkle_cells(tiles: DataFrame, res: int | None = None) -> DataFrame:
    """Two-level Merkle tree over the cell index (the content-addressed
    integrity manifest an Iceberg-scale snapshot publisher signs: a
    tamper-evident digest per spatial shard, then per shard-group):
    leaf = md5(image_id ':' pixel_checksum) with the exact
    position-weighted pixel checksum Σ v·(pos+1); level-1 digest =
    md5(concat of child leaf digests sorted by image_id) per anchor
    cell; level-0 digest = the same fold over level-1 digests sorted by
    cell id, per resolution-(r−2) parent cell.  Sorted folds make every
    digest order-free — any partitioning, same root.

    Emits (level, cell_id, digest, n_children) rows for both levels.

    Scale shape: ONE Arrow decode pass for leaf checksums (pixels never
    shuffle); each level is a groupBy over the cell key with
    sort_array(collect_list(...)) — a bounded-fanout fold (children per
    cell are geometry-bounded), exactly how a distributed manifest
    signer shards at 10^12 rows."""
    from pyspark.sql.types import LongType

    from ..constants import DEFAULT_RES
    from ..functions.cells import cell_parent_chain

    r = DEFAULT_RES if res is None else res
    dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}

    @F.pandas_udf(LongType())
    def _cksum(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = np.zeros(len(data), dtype=np.int64)
        for i in range(len(data)):
            z = np.frombuffer(data.iat[i], dtype=dt[fmt.iat[i]]).astype(np.int64)
            out[i] = int((z * (np.arange(len(z), dtype=np.int64) + 1)).sum())
        return pd.Series(out)

    leaves = tiles.select(
        "image_id",
        "cell_id",
        F.md5(
            F.concat_ws(":", F.col("image_id"),
                        _cksum("bytes", "w", "h", "fmt").cast("string"))
        ).alias("leaf"),
    )
    l1 = leaves.groupBy("cell_id").agg(
        F.md5(
            F.concat_ws(
                "", F.sort_array(F.collect_list(F.struct("image_id", "leaf"))).leaf
            )
        ).alias("digest"),
        F.count(F.lit(1)).alias("n_children"),
    )
    l0 = (
        l1.select(
            cell_parent_chain(
                F.col("cell_id"), r, r - MERKLE_PARENT_RES_DELTA
            ).alias("pcell"),
            "cell_id",
            "digest",
        )
        .groupBy("pcell")
        .agg(
            F.md5(
                F.concat_ws(
                    "", F.sort_array(F.collect_list(F.struct("cell_id", "digest"))).digest
                )
            ).alias("digest"),
            F.count(F.lit(1)).alias("n_children"),
        )
        .select(F.lit(0).alias("level"), F.col("pcell").alias("cell_id"),
                "digest", "n_children")
    )
    return l1.select(
        F.lit(1).alias("level"), "cell_id", "digest", "n_children"
    ).unionByName(l0)
