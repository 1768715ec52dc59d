"""Raster sources/sinks + load-variant operators.

Reference analogs (georaster/georaster.py ⚠ UNVERIFIED bands, SURVEY
§0/§2.1): R5 `SingleBandRaster.from_array` (≈L700-760), R6
`simple_write_geotiff` (≈L950-1060), R2's `downsampl=k` decimated read
(≈L620-700), R3/R4 `MultiBandRaster` band selection + `gdal_band`
(≈L780-880).  GeoTIFF-the-format is out of scope (no GDAL in sandbox);
sinks write the engine's parquet/icelite tables with the self-defined
codecs (FIXTURES.md §2), which carry the same information content
(pixels + geotransform + CRS + nodata).

All pixel paths are batched NumPy inside Arrow UDFs (input_hint
mandate); metadata-only paths are pure Column math.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from .. import oracle


# ---------------------------------------------------------------------------
# R5 — from_array source
# ---------------------------------------------------------------------------


def from_arrays(
    spark: SparkSession,
    items: list[tuple[str, np.ndarray, tuple[float, float, float, float]]],
    fmt: str = "raw",
    crs: str = "EPSG:3857",
    nodata: float | None = None,
) -> DataFrame:
    """Build an engine tile table from in-memory NumPy arrays —
    (image_id, array[h,w] or [nbands,h,w], (gt_x0, gt_y0, gt_xres,
    gt_yres)).  Inverse of the decode path; geo columns attached so the
    result composes with every operator (georegister.with_cells adds
    extent/cell columns)."""
    rows = []
    for image_id, arr, (gx0, gy0, xres, yres) in items:
        nb = 1 if arr.ndim == 2 else arr.shape[0]
        h, w = arr.shape[-2], arr.shape[-1]
        rows.append(
            {
                "image_id": image_id,
                "bytes": oracle.encode_pixels(arr, fmt),
                "w": w,
                "h": h,
                "fmt": fmt,
                "nbands": nb,
                "gt_x0": float(gx0),
                "gt_y0": float(gy0),
                "gt_xres": float(xres),
                "gt_yres": float(yres),
                "crs": crs,
                "nodata": nodata,
            }
        )
    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, nbands int,"
        " gt_x0 double, gt_y0 double, gt_xres double, gt_yres double,"
        " crs string, nodata double"
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# R6 — sink (write with optional mask -> nodata fill + re-encode)
# ---------------------------------------------------------------------------


def write_raster(
    df: DataFrame,
    table_dir,
    fmt_to: str | None = None,
    nodata_fill: float | None = None,
    mask_col: str | None = None,
    mode: str = "append",
) -> int:
    """simple_write_geotiff analog: optional mask (binary column, 0x01 =
    masked) fills pixels with `nodata_fill` before encode; optional
    re-encode to `fmt_to`; commits an icelite snapshot (atomic, pinned
    file list) and returns its version."""
    from ..sources import icelite

    out = df
    if mask_col is not None or fmt_to is not None:
        fill = 0.0 if nodata_fill is None else float(nodata_fill)
        target_fmt = fmt_to

        @F.pandas_udf(BinaryType())
        def _rewrite(
            data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series, mask: pd.Series
        ) -> pd.Series:
            res = []
            for k in range(len(data)):
                arr = oracle.decode_pixels(data.iat[k], int(w.iat[k]), int(h.iat[k]), fmt.iat[k])
                if mask.iat[k] is not None:
                    m = np.frombuffer(mask.iat[k], dtype=np.uint8).reshape(arr.shape) != 0
                    arr = np.where(m, np.asarray(fill, dtype=arr.dtype), arr)
                res.append(oracle.encode_pixels(arr, target_fmt or fmt.iat[k]))
            return pd.Series(res)

        mask_arg = F.col(mask_col) if mask_col else F.lit(None).cast("binary")
        out = df.withColumn(
            "bytes", _rewrite(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"), mask_arg)
        )
        if fmt_to is not None:
            out = out.withColumn("fmt", F.lit(fmt_to))
        if mask_col:
            out = out.drop(mask_col)
    return icelite.write_snapshot(out, table_dir, mode=mode)


# ---------------------------------------------------------------------------
# R2 — decimated read (downsampl=k)
# ---------------------------------------------------------------------------


def downsample(tiles: DataFrame, k: int) -> DataFrame:
    """GDAL buf_xsize-style decimation: arr[::k, ::k]; pixel size grows
    k-fold, origin unchanged (matches reading with downsampl=k)."""
    if k <= 1:
        return tiles

    @F.pandas_udf(BinaryType())
    def _dec(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        res = []
        for i in range(len(data)):
            arr = oracle.decode_pixels(data.iat[i], int(w.iat[i]), int(h.iat[i]), fmt.iat[i])
            res.append(oracle.encode_pixels(arr[::k, ::k], fmt.iat[i]))
        return pd.Series(res)

    new_w = F.floor((F.col("w") + k - 1) / k).cast("int")
    new_h = F.floor((F.col("h") + k - 1) / k).cast("int")
    return (
        tiles.withColumn("bytes", _dec(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")))
        .withColumn("w", new_w)
        .withColumn("h", new_h)
        .withColumn("gt_xres", F.col("gt_xres") * k)
        .withColumn("gt_yres", F.col("gt_yres") * k)
    )


def build_pyramid(tiles: DataFrame, levels: int, k: int = 2) -> list[DataFrame]:
    """Overview pyramid (GDAL `BuildOverviews` analog): level L is the
    k-fold decimation of level L-1, so per-level cost drops k^2-fold —
    the rollup pattern, not L independent full-resolution reads.

    Returns [level1, ..., levelN] (level 0 is the input).  At scale each
    level is WRITTEN as its own table before deriving the next (that
    write is the overview file; it also breaks lineage so level L-1 is
    decoded once, not once per downstream level) — the caller owns the
    writes; chaining the returned frames without persisting recomputes
    ancestors per branch.  Decimation composes exactly
    (arr[::k][::k] == arr[::k*k]), which is what pyramid_checksums and
    the DuckDB oracle exploit for closed-form verification."""
    out = []
    cur = tiles
    for _ in range(levels):
        cur = downsample(cur, k)
        out.append(cur)
    return out


def pyramid_checksums(tiles: DataFrame, levels: int, k: int = 2) -> DataFrame:
    """Verification surface for the pyramid: per (tile, level) integer
    checksum sum(v[i,j] * (i*w_L + j + 1)) for levels 0..N, computed in
    ONE fused mapInPandas pass — each tile decodes once and all levels'
    decimations reduce in NumPy, so pixel bytes cross Arrow once for the
    whole pyramid instead of once per level."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _sums(batches):
        for pdf in batches:
            ids, lvls, ws, hs, cks = [], [], [], [], []
            for t in pdf.itertuples(index=False):
                arr = oracle.decode_pixels(t.bytes, int(t.w), int(t.h), t.fmt).astype(
                    np.int64
                )
                for lv in range(levels + 1):
                    d = arr[:: k**lv, :: k**lv] if lv else arr
                    dh, dw = d.shape
                    wt = np.arange(1, dh * dw + 1, dtype=np.int64).reshape(dh, dw)
                    ids.append(t.image_id)
                    lvls.append(lv)
                    ws.append(dw)
                    hs.append(dh)
                    cks.append(int((d * wt).sum()))
            yield pd.DataFrame(
                {"image_id": ids, "level": lvls, "w": ws, "h": hs, "checksum": cks}
            )

    return slim.mapInPandas(
        _sums, schema="image_id string, level int, w int, h int, checksum long"
    )


# ---------------------------------------------------------------------------
# R3/R4 — multi-band load + band selection
# ---------------------------------------------------------------------------


def gdal_band_index(bands: list[int], b: int) -> int:
    """R4 `MultiBandRaster.gdal_band`: band id -> plane axis index."""
    return bands.index(b)


def band_select(tiles: DataFrame, bands: list[int]) -> DataFrame:
    """R3's `bands=` selection re-expressed over stored multi-band tiles:
    keep the chosen 1-based band planes (order preserved).  Metadata
    (`nbands`) updates via Column math; pixels via one Arrow UDF."""
    keep = [b - 1 for b in bands]

    @F.pandas_udf(BinaryType())
    def _sel(
        data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series, nb: pd.Series
    ) -> pd.Series:
        res = []
        for i in range(len(data)):
            arr = oracle.decode_pixels(
                data.iat[i], int(w.iat[i]), int(h.iat[i]), fmt.iat[i], nbands=int(nb.iat[i])
            )
            res.append(oracle.encode_pixels(arr[keep], fmt.iat[i]))
        return pd.Series(res)

    return tiles.withColumn(
        "bytes", _sel(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"), F.col("nbands"))
    ).withColumn("nbands", F.lit(len(bands)))


def band_stats(tiles: DataFrame) -> DataFrame:
    """Per-(image, band) mean/min/max — the multi-band reduce demo
    (fused decode + per-plane stats, one Arrow hop)."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("band", IntegerType()),
            StructField("mean_val", DoubleType()),
            StructField("min_val", DoubleType()),
            StructField("max_val", DoubleType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out = {"image_id": [], "band": [], "mean_val": [], "min_val": [], "max_val": []}
            for _, r in pdf.iterrows():
                arr = oracle.decode_pixels(
                    r["bytes"], int(r["w"]), int(r["h"]), r["fmt"], nbands=int(r["nbands"])
                )
                if arr.ndim == 2:
                    arr = arr[None, :, :]
                for b in range(arr.shape[0]):
                    out["image_id"].append(r["image_id"])
                    out["band"].append(b + 1)
                    out["mean_val"].append(float(arr[b].mean(dtype=np.float64)))
                    out["min_val"].append(float(arr[b].min()))
                    out["max_val"].append(float(arr[b].max()))
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "w", "h", "fmt", "nbands"]
    return tiles.select(*cols).mapInPandas(gen, schema=schema)


def normalized_diff_stats(tiles: DataFrame, band_a: int, band_b: int) -> DataFrame:
    """NDVI-style normalized-difference band index over multi-band tiles
    — the canonical remote-sensing map-algebra op ((NIR−Red)/(NIR+Red)).

    Per pixel the index is kept on an INTEGER surface:
    ``nd = ((a − b) · 1000) // (a + b)`` (floor division; 0 where the
    denominator is 0) — the per-mille-quantized index, bit-reproducible
    across engines (a float division would not hash-match), with floor
    semantics identical in NumPy and SQL.  Emits per-image n_pixels,
    Σnd, min/max, positive/negative counts, and the position-weighted
    checksum pinning every pixel's index.

    Scale shape: map-only fused mapInPandas — one Arrow hop, vectorized
    per (w,h,fmt,nbands) group, zero shuffle."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    pa, pb = band_a - 1, band_b - 1
    schema = StructType(
        [StructField("image_id", StringType())]
        + [
            StructField(c, LongType())
            for c in (
                "n_pixels", "nd_sum", "nd_min", "nd_max",
                "n_pos", "n_neg", "nd_checksum",
            )
        ]
    )

    def gen(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            n = len(pdf)
            out = {"image_id": pdf["image_id"].to_numpy(dtype=object)}
            for c in ("n_pixels", "nd_sum", "nd_min", "nd_max", "n_pos", "n_neg", "nd_checksum"):
                out[c] = np.zeros(n, dtype=np.int64)
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (
                    int(pdf["w"].iat[k]), int(pdf["h"].iat[k]),
                    pdf["fmt"].iat[k], int(pdf["nbands"].iat[k]),
                )
                groups.setdefault(key, []).append(k)
            for (w, h, fmt, nb), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[k] for k in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), nb, h, w)
                    .astype(np.int64)
                )
                a, b = z[:, pa], z[:, pb]
                den = a + b
                nd = np.zeros_like(a)
                nz = den > 0
                np.floor_divide((a - b) * 1000, den, out=nd, where=nz)
                wt = np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w)
                ii = np.asarray(idx)
                out["n_pixels"][ii] = h * w
                out["nd_sum"][ii] = nd.sum(axis=(1, 2))
                out["nd_min"][ii] = nd.min(axis=(1, 2))
                out["nd_max"][ii] = nd.max(axis=(1, 2))
                out["n_pos"][ii] = (nd > 0).sum(axis=(1, 2))
                out["n_neg"][ii] = (nd < 0).sum(axis=(1, 2))
                out["nd_checksum"][ii] = (nd * wt).sum(axis=(1, 2))
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "w", "h", "fmt", "nbands"]
    return tiles.select(*cols).mapInPandas(gen, schema=schema)


def pansharpen_stats(tiles: DataFrame) -> DataFrame:
    """Brovey-transform pansharpening over multi-band tiles — the
    classic fusion op (reference georaster has no fusion; this is the
    GDAL `gdal_pansharpen.py` analog a raster user reaches for next,
    SURVEY §2.3).  With no separate panchromatic plane in the synthetic
    stack, pan is DERIVED as the integer band mean: ``pan = (Σb) // nb``
    — the standard fallback when the sensor ships no pan band.

    Per pixel and band the Brovey ratio is kept on an INTEGER surface:
    ``out = (b · pan · nb) // Σb`` (0 where Σb = 0) — floor semantics
    identical in NumPy and SQL, values ≤ 255·255 so no overflow anywhere
    near int64.  Emits per (image, band): Σout, min, max and the
    position-weighted checksum pinning every fused pixel.

    Scale shape: map-only fused mapInPandas — one Arrow hop, vectorized
    per (w,h,fmt,nbands) group, zero shuffle."""
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    schema = StructType(
        [StructField("image_id", StringType()), StructField("band", IntegerType())]
        + [StructField(c, LongType()) for c in ("ps_sum", "ps_min", "ps_max", "ps_checksum")]
    )

    def gen(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            out = {k: [] for k in ("image_id", "band", "ps_sum", "ps_min", "ps_max", "ps_checksum")}
            groups: dict[tuple, list[int]] = {}
            for k in range(len(pdf)):
                key = (
                    int(pdf["w"].iat[k]), int(pdf["h"].iat[k]),
                    pdf["fmt"].iat[k], int(pdf["nbands"].iat[k]),
                )
                groups.setdefault(key, []).append(k)
            for (w, h, fmt, nb), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[k] for k in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), nb, h, w)
                    .astype(np.int64)
                )
                den = z.sum(axis=1)            # (n, h, w)
                pan = den // nb
                ps = np.zeros_like(z)
                nz = np.broadcast_to((den > 0)[:, None], z.shape)
                np.floor_divide(z * pan[:, None] * nb, den[:, None], out=ps, where=nz)
                wt = np.arange(1, h * w + 1, dtype=np.int64).reshape(h, w)
                for pos, k in enumerate(idx):
                    for b in range(nb):
                        out["image_id"].append(pdf["image_id"].iat[k])
                        out["band"].append(b + 1)
                        out["ps_sum"].append(int(ps[pos, b].sum()))
                        out["ps_min"].append(int(ps[pos, b].min()))
                        out["ps_max"].append(int(ps[pos, b].max()))
                        out["ps_checksum"].append(int((ps[pos, b] * wt).sum()))
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "w", "h", "fmt", "nbands"]
    return tiles.select(*cols).mapInPandas(gen, schema=schema)


def gray_world_stats(tiles: DataFrame) -> DataFrame:
    """Gray-world white-balance gains over multi-band tiles — the
    classic illumination-correction pass (Buchsbaum 1980) a vision
    pipeline runs before training: assume the scene averages to gray,
    so each band's gain is total_mean / band_mean.  Kept on an INTEGER
    surface: ``gain_ppm = (S_total · 1_000_000) // (nbands · S_band)``
    (floor; 0 where the band sums to 0) — parts-per-million-quantized,
    bit-reproducible across engines, with the per-band pixel sum also
    emitted so the oracle pins both the reduction and the ratio.

    Scale shape: map-only fused mapInPandas — one Arrow hop, vectorized
    per (w,h,fmt,nbands) group, per-image output rows, zero shuffle."""
    from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("image_id", StringType()),
            StructField("band", IntegerType()),
            StructField("band_sum", LongType()),
            StructField("gain_ppm", LongType()),
        ]
    )

    def gen(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            ids, bands, sums, gains = [], [], [], []
            groups: dict[tuple, list[int]] = {}
            for k in range(len(pdf)):
                key = (
                    int(pdf["w"].iat[k]), int(pdf["h"].iat[k]),
                    pdf["fmt"].iat[k], int(pdf["nbands"].iat[k]),
                )
                groups.setdefault(key, []).append(k)
            for (w, h, fmt, nb), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[k] for k in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), nb, h, w)
                    .astype(np.int64)
                )
                bs = z.sum(axis=(2, 3))  # (n, nb)
                total = bs.sum(axis=1, keepdims=True)  # (n, 1)
                g = np.zeros_like(bs)
                np.floor_divide(total * 1_000_000, nb * bs, out=g, where=bs > 0)
                for t, k in enumerate(idx):
                    for b in range(nb):
                        ids.append(pdf["image_id"].iat[k])
                        bands.append(b + 1)
                        sums.append(int(bs[t, b]))
                        gains.append(int(g[t, b]))
            yield pd.DataFrame(
                {"image_id": ids, "band": bands, "band_sum": sums, "gain_ppm": gains}
            )

    cols = ["image_id", "bytes", "w", "h", "fmt", "nbands"]
    return tiles.select(*cols).mapInPandas(gen, schema=schema)


def spectral_angle_stats(tiles: DataFrame, band_a: int, band_b: int) -> DataFrame:
    """Spectral Angle Mapper census between two bands of a multi-band
    tile (Kruse et al. 1993 — the illumination-invariant per-spectrum
    similarity of hyperspectral classification).  The angle itself is a
    float acos; the engine ships the EXACT integer moments instead —
    dot = sum(a*b), na2 = sum(a^2), nb2 = sum(b^2) — plus the
    ppm-quantized squared cosine floor(1e6*dot^2/(na2*nb2)) computed
    through DECIMAL(38)/HUGEINT (dot^2*1e6 tops int64), so
    angle = acos(sqrt(cos2_ppm/1e6)) reconstructs at reader precision
    and nothing float reaches the hash.

    Scale shape: map-only fused mapInPandas, one Arrow hop, vectorized
    per (w,h,fmt,nbands) group, zero shuffle."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    pa_, pb_ = band_a - 1, band_b - 1
    schema = StructType(
        [StructField("image_id", StringType())]
        + [StructField(c, LongType()) for c in ("dot", "na2", "nb2", "cos2_ppm")]
    )

    def gen(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            n = len(pdf)
            out = {"image_id": pdf["image_id"].to_numpy(dtype=object)}
            for c in ("dot", "na2", "nb2", "cos2_ppm"):
                out[c] = np.zeros(n, dtype=np.int64)
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (
                    int(pdf["w"].iat[k]), int(pdf["h"].iat[k]),
                    pdf["fmt"].iat[k], int(pdf["nbands"].iat[k]),
                )
                groups.setdefault(key, []).append(k)
            for (w, h, fmt, nb), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[k] for k in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), nb, h, w)
                    .astype(np.int64)
                )
                a = z[:, pa_]
                b = z[:, pb_]
                dot = (a * b).sum(axis=(1, 2))
                na2 = (a * a).sum(axis=(1, 2))
                nb2 = (b * b).sum(axis=(1, 2))
                # dot^2 * 1e6 exceeds int64: go through python ints
                cos2 = np.array(
                    [
                        int(d) * int(d) * 1_000_000 // (int(x) * int(y))
                        if x > 0 and y > 0
                        else 0
                        for d, x, y in zip(dot, na2, nb2)
                    ],
                    dtype=np.int64,
                )
                rows = np.asarray(idx)
                out["dot"][rows] = dot
                out["na2"][rows] = na2
                out["nb2"][rows] = nb2
                out["cos2_ppm"][rows] = cos2
            yield pd.DataFrame(out)

    return tiles.select("image_id", "bytes", "w", "h", "fmt", "nbands").mapInPandas(
        gen, schema=schema
    )
