"""Multimodal column plumbing: image / audio / video payloads as opaque
`binary` columns with typed metadata, processed by batched-NumPy Arrow
UDFs (mapInPandas) — the media layer of a 10^12-row training-data
pipeline.

Media table shape (composes with the tiles schema — an image row IS a
tile row when kind='image'):

    media(media_id string, kind string,            -- image|audio|video
          bytes binary,                            -- opaque payload
          fmt string,                              -- codec tag
          w int, h int,                            -- image/video frames
          sample_rate int, n_samples int,          -- audio
          n_frames int)                            -- video

Codec policy (sandbox has no PIL/ffmpeg/libsndfile): the self-defined
deterministic codecs are REAL end-to-end ('raw'/'qnt' uint8 images,
'pcm16' s16-LE audio, 'rawv' frame-major uint8 video); industry codecs
('jpeg', 'png', 'mp4', 'flac', ...) are STUBS that raise
NotImplementedError with a clear message — the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is identical either
way, so swapping a real decoder in is a one-function change in
`decode_media` and nothing upstream moves.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import oracle

REAL_IMAGE_FMTS = ("raw", "qnt", "raw16")
REAL_AUDIO_FMTS = ("pcm16",)
REAL_VIDEO_FMTS = ("rawv",)
STUB_FMTS = ("jpeg", "png", "webp", "mp4", "webm", "flac", "mp3", "ogg")


def decode_media(kind: str, data: bytes, fmt: str, **meta) -> np.ndarray:
    """Single-payload decoder (called from inside Arrow batches only —
    never per-row from the driver).  Stub formats raise."""
    if fmt in STUB_FMTS:
        raise NotImplementedError(
            f"codec '{fmt}' needs an external library not present in this "
            "environment; plug a real decoder into decode_media — all "
            "Spark-side plumbing is codec-agnostic."
        )
    if kind == "image":
        return oracle.decode_pixels(data, meta["w"], meta["h"], fmt)
    if kind == "audio":
        if fmt not in REAL_AUDIO_FMTS:
            raise ValueError(f"unknown audio fmt {fmt!r}")
        return np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    if kind == "video":
        if fmt not in REAL_VIDEO_FMTS:
            raise ValueError(f"unknown video fmt {fmt!r}")
        return np.frombuffer(data, dtype=np.uint8).reshape(
            meta["n_frames"], meta["h"], meta["w"]
        )
    raise ValueError(f"unknown media kind {kind!r}")


def media_table(spark: SparkSession, rows: list[dict]) -> DataFrame:
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("kind", StringType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", IntegerType()),
            StructField("n_frames", IntegerType()),
        ]
    )
    defaults = {"w": None, "h": None, "sample_rate": None, "n_samples": None, "n_frames": None}
    return spark.createDataFrame([{**defaults, **r} for r in rows], schema)


# ---------------------------------------------------------------------------
# image ops
# ---------------------------------------------------------------------------


def _resize_nearest(arr: np.ndarray, ow: int, oh: int) -> np.ndarray:
    h, w = arr.shape
    ri = (np.arange(oh) * h // oh).astype(np.int64)
    rj = (np.arange(ow) * w // ow).astype(np.int64)
    return arr[ri][:, rj]


def image_resize(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize; one Arrow hop, fused decode+resize+encode."""

    @F.pandas_udf(BinaryType())
    def _rs(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for k in range(len(data)):
            arr = decode_media("image", data.iat[k], fmt.iat[k], w=int(w.iat[k]), h=int(h.iat[k]))
            out.append(oracle.encode_pixels(_resize_nearest(arr, out_w, out_h), "raw"))
        return pd.Series(out)

    return (
        df.withColumn("bytes", _rs(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")))
        .withColumn("w", F.lit(out_w))
        .withColumn("h", F.lit(out_h))
        .withColumn("fmt", F.lit("raw"))
    )


def image_features(df: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-image feature extraction: mean/std + n_bins histogram —
    the embedding-ish stage of a curation pipeline."""
    fields = [
        StructField("media_id", StringType()),
        StructField("mean_val", DoubleType()),
        StructField("std_val", DoubleType()),
    ] + [StructField(f"hist_{b}", LongType()) for b in range(n_bins)]
    schema = StructType(fields)

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_media("image", r["bytes"], r["fmt"], w=int(r["w"]), h=int(r["h"]))
                hist = np.bincount(
                    ((arr.astype(np.int64) * n_bins) // 256).ravel(), minlength=n_bins
                )[:n_bins]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "mean_val": float(arr.mean(dtype=np.float64)),
                        "std_val": float(arr.std(dtype=np.float64)),
                        **{f"hist_{b}": int(hist[b]) for b in range(n_bins)},
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in fields])

    return df.select("media_id", "bytes", "fmt", "w", "h").mapInPandas(gen, schema=schema)


def compute_phash(tiles: DataFrame, grid: int = 8) -> DataFrame:
    """Pixel-derived 64-bit perceptual hash: block-mean 8x8 downsample,
    threshold at the global pixel mean (strict >), bits packed row-major
    (bit k = block (k//8, k%8)).  Integer-exact given integer pixels ->
    SQL-reproducible (the contract oracle re-derives it from the ramp
    formula).  Input: engine tile schema (image fixtures)."""

    @F.pandas_udf(LongType())
    def _ph(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for k in range(len(data)):
            arr = oracle.decode_pixels(data.iat[k], int(w.iat[k]), int(h.iat[k]), fmt.iat[k])
            hh, ww = arr.shape
            bh, bw = hh // grid, ww // grid
            blocks = (
                arr[: bh * grid, : bw * grid]
                .reshape(grid, bh, grid, bw)
                .sum(axis=(1, 3), dtype=np.int64)
            )  # integer block sums — exact
            total = int(arr.astype(np.int64).sum())
            # strict >: block_sum * (h*w) > total * (bh*bw)  (all-integer)
            bits = (blocks * (hh * ww)) > (total * bh * bw)
            val = 0
            for i in range(grid):
                for j in range(grid):
                    if bits[i, j]:
                        val |= 1 << (i * grid + j)
            out.append(val - (1 << 64) if val >= (1 << 63) else val)
        return pd.Series(out)

    return tiles.withColumn(
        "phash_px", _ph(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"))
    )


def _augment_chain(arr: np.ndarray) -> np.ndarray:
    """Deterministic augmentation chain: hflip -> rot90 clockwise ->
    center crop to half size.  Pure index permutation + subset — the
    composite is out[i, j] = arr[H-1-o_h-j, W-1-o_w-i] (o = quarter
    offsets), so every output pixel is an exact integer copy and the
    whole chain is SQL-reproducible from the ramp formula."""
    a = np.rot90(arr[:, ::-1], k=-1)
    h, w = a.shape
    ch, cw = h // 2, w // 2
    oh, ow = h // 4, w // 4
    return a[oh : oh + ch, ow : ow + cw]


def image_augment(df: DataFrame) -> DataFrame:
    """Training-data augmentation over the tiles/media schema: the
    _augment_chain permutation applied in ONE fused Arrow hop
    (decode -> transform -> encode); emits the augmented row with
    updated w/h.  Map-only — at 10^12 images this is a scan."""

    @F.pandas_udf(BinaryType())
    def _ag(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for k in range(len(data)):
            arr = oracle.decode_pixels(
                data.iat[k], int(w.iat[k]), int(h.iat[k]), fmt.iat[k]
            )
            out.append(oracle.encode_pixels(_augment_chain(arr), "raw"))
        return pd.Series(out)

    return (
        df.withColumn("bytes", _ag(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")))
        .withColumn("w", (F.col("w") / 2).cast("int"))
        .withColumn("h", (F.col("h") / 2).cast("int"))
        .withColumn("fmt", F.lit("raw"))
    )


def augment_checksum(tiles: DataFrame) -> DataFrame:
    """Contract surface for image_augment: decode -> augment -> weighted
    checksum (sum of v * (i*w' + j + 1)) fused into ONE Arrow hop — the
    augmented bytes never cross the Python/JVM boundary (the E10
    verification_report lesson)."""

    @F.pandas_udf(LongType())
    def _ac(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for k in range(len(data)):
            arr = oracle.decode_pixels(
                data.iat[k], int(w.iat[k]), int(h.iat[k]), fmt.iat[k]
            )
            a = _augment_chain(arr).astype(np.int64)
            ch, cw = a.shape
            weights = np.arange(1, ch * cw + 1, dtype=np.int64).reshape(ch, cw)
            out.append(int((a * weights).sum()))
        return pd.Series(out)

    return tiles.select(
        "image_id",
        (F.col("w") / 2).cast("int").alias("aug_w"),
        (F.col("h") / 2).cast("int").alias("aug_h"),
        _ac(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")).alias("checksum"),
    )


# ---------------------------------------------------------------------------
# audio / video ops
# ---------------------------------------------------------------------------


def synth_audio_media(images: DataFrame) -> DataFrame:
    """Deterministic pcm16 clips keyed off the images table (media rows
    for the M4 contract query).  The payload is real s16-LE bytes built
    in one Arrow batch per partition — audio_features then genuinely
    decodes them; the DuckDB oracle re-derives the same closed form
    (oracle.audio_samples) without ever touching bytes."""
    from ..operators.georegister import image_idx

    @F.pandas_udf(BinaryType())
    def _enc(idx: pd.Series) -> pd.Series:
        return pd.Series([oracle.audio_samples(int(i)).tobytes() for i in idx])

    idx = image_idx()
    return images.select(
        F.col("image_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        _enc(idx).alias("bytes"),
        F.lit("pcm16").alias("fmt"),
        F.lit(16000).alias("sample_rate"),
        (F.lit(2048) + (idx % 7) * 256).cast("int").alias("n_samples"),
    )


def synth_video_media(images: DataFrame, w: int = 16, h: int = 16) -> DataFrame:
    """Deterministic 'rawv' clips keyed off the images table (media rows
    for the M5 contract query) — frame-major uint8 payloads, n_frames
    varying 6..10 per clip (oracle.video_frames_synth)."""
    from ..operators.georegister import image_idx

    @F.pandas_udf(BinaryType())
    def _enc(idx: pd.Series) -> pd.Series:
        return pd.Series(
            [oracle.video_frames_synth(int(i), w=w, h=h).tobytes() for i in idx]
        )

    idx = image_idx()
    return images.select(
        F.col("image_id").alias("media_id"),
        F.lit("video").alias("kind"),
        _enc(idx).alias("bytes"),
        F.lit("rawv").alias("fmt"),
        F.lit(w).alias("w"),
        F.lit(h).alias("h"),
        (F.lit(6) + (idx % 5)).cast("int").alias("n_frames"),
    )


def audio_features(df: DataFrame, frame: int = 256) -> DataFrame:
    """Frame-level RMS energy + zero-crossing stats per clip (pcm16)."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("n_frames", IntegerType()),
            StructField("rms", DoubleType()),
            StructField("peak", DoubleType()),
            StructField("zero_crossings", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                sig = decode_media("audio", r["bytes"], r["fmt"])
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_frames": int(len(sig) // frame),
                        "rms": float(np.sqrt(np.mean(sig**2))),
                        "peak": float(np.abs(sig).max()) if len(sig) else 0.0,
                        "zero_crossings": int(np.sum(np.signbit(sig[1:]) != np.signbit(sig[:-1]))),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("media_id", "bytes", "fmt").mapInPandas(gen, schema=schema)


def video_frame_sample(df: DataFrame, every_k: int) -> DataFrame:
    """Every k-th frame of each clip as an image row (media_id#f<N>) —
    the frame-extraction stage; output composes with the image ops."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("bytes", BinaryType()),
            StructField("fmt", StringType()),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                vid = decode_media(
                    "video", r["bytes"], r["fmt"],
                    n_frames=int(r["n_frames"]), w=int(r["w"]), h=int(r["h"]),
                )
                for fno in range(0, vid.shape[0], every_k):
                    rows.append(
                        {
                            "media_id": f"{r['media_id']}#f{fno}",
                            "frame_no": fno,
                            "bytes": oracle.encode_pixels(vid[fno], "raw"),
                            "fmt": "raw",
                            "w": int(r["w"]),
                            "h": int(r["h"]),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("media_id", "bytes", "fmt", "w", "h", "n_frames").mapInPandas(
        gen, schema=schema
    )


def compute_dhash(tiles: DataFrame, out_col: str = "dhash_px") -> DataFrame:
    """Pixel-derived 64-bit difference hash (dHash — the
    gradient-sign twin of compute_phash; the standard cheap near-dup
    image fingerprint).  Samples an 8x9 grid at pixel centers
    (row_i = (2i+1)*h // 16, col_j = (2j+1)*w // 18) and sets bit
    k = i*8 + j iff v[row_i, col_{j+1}] > v[row_i, col_j] — nearest
    sampling, not block means, so every bit is a single integer compare
    reproducible in SQL from the ramp formula.  Bits packed row-major,
    two's-complement into a signed long (same convention as
    compute_phash / the fixture phash column, so phash.phash_near_dup's
    banded LSH join applies unchanged)."""

    @F.pandas_udf(LongType())
    def _dh(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = np.zeros(len(data), dtype=np.uint64)
        for k in range(len(data)):
            arr = oracle.decode_pixels(data.iat[k], int(w.iat[k]), int(h.iat[k]), fmt.iat[k])
            hh, ww = arr.shape
            ri = (2 * np.arange(8) + 1) * hh // 16
            cj = (2 * np.arange(9) + 1) * ww // 18
            g = arr[np.ix_(ri, cj)].astype(np.int64)  # (8, 9)
            bits = g[:, 1:] > g[:, :-1]               # (8, 8)
            val = np.uint64(0)
            weights = (np.uint64(1) << (np.arange(8, dtype=np.uint64) * 8)[:, None] <<
                       np.arange(8, dtype=np.uint64)[None, :])
            val = (weights * bits.astype(np.uint64)).sum(dtype=np.uint64)
            out[k] = val
        return pd.Series(out.view(np.int64))

    return tiles.withColumn(
        out_col, _dh(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"))
    )


_XM_K = 8
_XM_SCHEMA = "image_id string, caption string, " + ", ".join(
    f"f{k} long" for k in range(_XM_K)
)


def xmodal_features(tiles: DataFrame) -> DataFrame:
    """Image-side encoder for the cross-modal alignment gate — the
    CLIP-score curation step of a multimodal training pipeline with the
    learned encoders STUBBED (sandbox has no model runtime; policy of
    multimodal.py's codec stubs): the deterministic stand-in embeds an
    image as its 8 row-band pixel sums (exact int64).  The Spark-side
    plumbing is the real thing — pixels cross Arrow ONCE, captions ride
    through untouched, and everything downstream (text features, cosine
    gate) is codegen'd integer logic."""
    slim = tiles.select("image_id", "caption", "bytes", "w", "h", "fmt")
    dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}

    def _feat(batches):
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"].to_numpy(dtype=object),
                "caption": pdf["caption"].to_numpy(dtype=object),
            }
            for k in range(_XM_K):
                out[f"f{k}"] = np.zeros(n, dtype=np.int64)
            groups: dict[tuple, list[int]] = {}
            for r in range(n):
                key = (int(pdf["w"].iat[r]), int(pdf["h"].iat[r]), pdf["fmt"].iat[r])
                groups.setdefault(key, []).append(r)
            for (w, h, fmt), idx in groups.items():
                b = len(idx)
                band = max(h // _XM_K, 1)
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[r] for r in idx), dtype=dt[fmt]
                    )
                    .reshape(b, h, w)
                    .astype(np.int64)
                )
                rows = np.asarray(idx)
                for k in range(_XM_K):
                    lo = k * band
                    hi = h if k == _XM_K - 1 else (k + 1) * band
                    out[f"f{k}"][rows] = z[:, lo:hi, :].sum(axis=(1, 2))
            yield pd.DataFrame(out)

    return slim.mapInPandas(_feat, schema=_XM_SCHEMA)


def xmodal_align(tiles: DataFrame, tau_ppm: int = 320_000) -> DataFrame:
    """Cross-modal (image, caption) alignment gate — the CLIP-filtering
    step, exact-integer end to end: text encoder stub = word-length
    histogram mod 8 (deterministic, SQL-replayable); alignment =
    cos^2 * 10^6 of the two 8-dim integer features, computed as

        align_ppm = (10^6 * dot^2) DIV (|img|^2 * |txt|^2)

    (all int64 by bound analysis: dot <= 8*255*w*h/8*n_words).  Rows
    gate on align_ppm >= tau_ppm.  At 100 TB this is map-only after the
    one Arrow pass of the image encoder; swapping the stubs for real
    CLIP towers changes ONLY the two feature producers."""
    d = xmodal_features(tiles)
    ws = F.split(F.trim(F.col("caption")), r"\s+")
    for k in range(_XM_K):
        d = d.withColumn(
            f"t{k}",
            F.size(F.filter(ws, lambda x: F.length(x) % _XM_K == F.lit(k)))
            .cast("long"),
        )
    dot = sum(F.col(f"f{k}") * F.col(f"t{k}") for k in range(_XM_K))
    n2i = sum(F.col(f"f{k}") * F.col(f"f{k}") for k in range(_XM_K))
    n2t = sum(F.col(f"t{k}") * F.col(f"t{k}") for k in range(_XM_K))
    d = d.select(
        "image_id",
        dot.alias("dot"),
        n2i.alias("n2_img"),
        n2t.alias("n2_txt"),
    ).withColumn(
        "align_ppm",
        F.when(
            (F.col("n2_img") > 0) & (F.col("n2_txt") > 0),
            F.expr("(1000000 * dot * dot) DIV (n2_img * n2_txt)"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return d.withColumn(
        "passed", (F.col("align_ppm") >= tau_ppm).cast("int")
    )


# --- shot-boundary detection ------------------------------------------------------

SHOT_SCENE_LEN = 3       # synthetic clips change scene every 3 frames
SHOT_TAU_PPM = 5_000     # boundary when SSD > tau * w*h*255^2 / 1e6


def synth_scene_media(images: DataFrame, w: int = 16, h: int = 16) -> DataFrame:
    """Deterministic 'rawv' clips WITH SCENE STRUCTURE (the shot-
    detection fixture): frame f of clip idx shows pattern
    v = (idx*7 + (f // SHOT_SCENE_LEN)*31 + i*5 + j*3) % 256 — constant
    within a scene, jumping at every SHOT_SCENE_LEN boundary, so ground
    truth cuts are known in closed form."""
    from ..operators.georegister import image_idx

    @F.pandas_udf(BinaryType())
    def _enc(idx: pd.Series) -> pd.Series:
        out = []
        for iv in idx:
            iv = int(iv)
            nf = 6 + iv % 5
            f = np.arange(nf)[:, None, None]
            i = np.arange(h)[None, :, None]
            j = np.arange(w)[None, None, :]
            clip = (iv * 7 + (f // SHOT_SCENE_LEN) * 31 + i * 5 + j * 3) % 256
            out.append(clip.astype(np.uint8).tobytes())
        return pd.Series(out)

    idx = image_idx()
    return images.select(
        F.col("image_id").alias("media_id"),
        F.lit("video").alias("kind"),
        _enc(idx).alias("bytes"),
        F.lit("rawv").alias("fmt"),
        F.lit(w).alias("w"),
        F.lit(h).alias("h"),
        (F.lit(6) + (idx % 5)).cast("int").alias("n_frames"),
    )


def shot_boundaries(df: DataFrame) -> DataFrame:
    """Shot-boundary detection (PySceneDetect content-detector /
    FFmpeg scdet analog): consecutive-frame SSD per clip, a cut wherever
    1e6·SSD > SHOT_TAU_PPM·w·h·255² — the exact integer form of the
    'mean frame difference over threshold' rule.

    Emits per (clip, boundary candidate): frame index, exact SSD and
    the cut flag — the full difference profile, not just the cuts, so
    the oracle pins the detector's margins too.

    Scale shape: map-only fused mapInPandas (decode + diff + census in
    one Arrow hop, whole clips stay inside their batch); zero shuffle."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_no", IntegerType()),
            StructField("ssd", LongType()),
            StructField("is_cut", IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                vid = decode_media(
                    "video", r["bytes"], r["fmt"],
                    n_frames=int(r["n_frames"]), w=int(r["w"]), h=int(r["h"]),
                ).astype(np.int64)
                d = vid[1:] - vid[:-1]
                ssd = (d * d).sum(axis=(1, 2))
                lim = SHOT_TAU_PPM * int(r["w"]) * int(r["h"]) * 255 * 255
                for f, s in enumerate(ssd, start=1):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_no": f,
                            "ssd": int(s),
                            "is_cut": int(1_000_000 * int(s) > lim),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("media_id", "bytes", "fmt", "w", "h", "n_frames").mapInPandas(
        gen, schema=schema
    )


# --- integer tone census (DFT-bin power surrogate) ---------------------------------

TONE_PERIODS = (8, 16, 32, 64)  # probed periods (samples per cycle)
TONE_SCALE = 16                 # cos/sin tables scaled to +-16 integers


def _tone_tables() -> dict[int, tuple[list[int], list[int]]]:
    """Integer cos/sin lookup tables per probed period, computed ONCE in
    Python and inlined as literals in both engines (the JL-sign-matrix
    convention) — no runtime trig anywhere."""
    import math

    out = {}
    for p in TONE_PERIODS:
        cos = [int(math.floor(TONE_SCALE * math.cos(2 * math.pi * t / p))) for t in range(p)]
        sin = [int(math.floor(TONE_SCALE * math.sin(2 * math.pi * t / p))) for t in range(p)]
        out[p] = (cos, sin)
    return out


def tone_census(df: DataFrame) -> DataFrame:
    """Integer tone census (the Goertzel / single-bin-DFT energy probe
    of dial-tone detection and audio fingerprinting): for each probed
    period P the correlation of the pcm16 stream with an integer-scaled
    cos/sin pair, and the exact power re² + im².  int64 bound:
    |re| <= n·32768·TONE_SCALE ≈ 1.9e9 at n = 3584, so the squares stay
    under 2^63.

    Scale shape: map-only fused mapInPandas — decode + four table dots
    per clip in one Arrow hop; zero shuffle."""
    tables = _tone_tables()
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("period", IntegerType()),
            StructField("re", LongType()),
            StructField("im", LongType()),
            StructField("power", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                x = np.frombuffer(r["bytes"], dtype="<i2").astype(np.int64)
                t = np.arange(len(x), dtype=np.int64)
                for p in TONE_PERIODS:
                    cos, sin = tables[p]
                    c = np.asarray(cos, dtype=np.int64)[t % p]
                    s = np.asarray(sin, dtype=np.int64)[t % p]
                    re = int((x * c).sum())
                    im = int((x * s).sum())
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "period": p,
                            "re": re,
                            "im": im,
                            "power": re * re + im * im,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select("media_id", "bytes").mapInPandas(gen, schema=schema)


def audio_decimate_stats(df: DataFrame) -> DataFrame:
    """Half-band decimation census (pcm16): the 2:1 pair-average
    downsampler every audio preprocessing pipeline runs before feature
    extraction — out[t] = (s[2t] + s[2t+1]) >> 1 (arithmetic shift =
    floor division, identical on int64 in NumPy and SQL even for
    negative samples — the signed-// hazard SURVEY §7.6 catalogues).
    Emits per clip the output length, exact sample sum, position-
    weighted checksum, and zero-crossing count of the decimated signal.

    Scale shape: map-only mapInPandas over the opaque binary column —
    one Arrow hop, no shuffle; the decimator composes with audio_features
    the way video_frame_sample composes with image ops."""
    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("n_out", LongType()),
            StructField("out_sum", LongType()),
            StructField("out_checksum", LongType()),
            StructField("out_crossings", LongType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                # decode_media normalizes pcm16 to float64 s/32768 (both
                # steps exact powers of two); un-normalize back to the
                # raw integer samples before the integer decimator.
                sig = (decode_media("audio", r["bytes"], r["fmt"]) * 32768.0).astype(
                    np.int64
                )
                n2 = (len(sig) // 2) * 2
                out = (sig[0:n2:2] + sig[1:n2:2]) >> 1
                t = np.arange(1, len(out) + 1, dtype=np.int64)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_out": int(len(out)),
                        "out_sum": int(out.sum()),
                        "out_checksum": int((out * t).sum()),
                        "out_crossings": int(
                            np.sum((out[1:] < 0) != (out[:-1] < 0))
                        ),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "bytes", "fmt").mapInPandas(gen, schema=schema)


GOERTZEL_N = 256
GOERTZEL_COEFS = (1800, 1400, 800, 0, -800)  # 2*cos(w)*1024, quantized


def goertzel_stats(df: DataFrame, n: int = GOERTZEL_N) -> DataFrame:
    """Integer Goertzel tone detection (Goertzel 1958) — the single-bin
    DFT power probe DTMF/pilot-tone detectors run instead of a full
    FFT: for each quantized coefficient c ~ 2*cos(w)*1024 the
    recurrence s_0 = x_t + floor(c*s_1/1024) - s_2 runs over the first
    GOERTZEL_N pcm16 samples, and the bin power is
    p = s1^2 + s2^2 - floor(c*s1/1024)*s2.  The 1024 scale is a power
    of two, so floor(c*s/1024.0) is exact in float64 and identical to
    integer floor-division — every engine agrees bit-for-bit.  The
    DuckDB twin replays all five recurrences in one recursive CTE.

    Scale shape: map-only mapInPandas over the binary column — one
    Arrow hop, no shuffle; the t-loop is vectorized across the whole
    (clips x freqs) batch, 256 numpy steps per batch."""
    c = np.asarray(GOERTZEL_COEFS, dtype=np.int64)[None, :]  # (1, K)
    k = len(GOERTZEL_COEFS)
    cols = ", ".join(f"p{i} long" for i in range(k))

    def gen(batches):
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                yield pd.DataFrame(
                    {"media_id": [], **{f"p{i}": [] for i in range(k)}}
                )
                continue
            x = np.stack(
                [
                    np.frombuffer(b, dtype="<i2")[:n].astype(np.int64)
                    for b in pdf["bytes"]
                ]
            )  # (m, n)
            s1 = np.zeros((m, k), dtype=np.int64)
            s2 = np.zeros((m, k), dtype=np.int64)
            for t in range(n):
                s0 = x[:, t : t + 1] + np.floor_divide(c * s1, 1024) - s2
                s2 = s1
                s1 = s0
            p = s1 * s1 + s2 * s2 - np.floor_divide(c * s1, 1024) * s2
            out = {"media_id": pdf["media_id"].to_numpy(dtype=object)}
            for i in range(k):
                out[f"p{i}"] = p[:, i]
            yield pd.DataFrame(out)

    return df.select("media_id", "bytes").mapInPandas(
        gen, schema=f"media_id string, {cols}"
    )


DTW_N = 64  # leading samples per clip entering the alignment


def dtw_stats(pairs: DataFrame, n: int = DTW_N) -> DataFrame:
    """Dynamic-time-warping distance between paired pcm16 clips
    (Sakoe & Chiba 1978) — the elastic alignment cost audio/sensor
    matching runs where Euclidean distance breaks under tempo shift:
    D[i,j] = |a_i - b_j| + min(D[i-1,j], D[i,j-1], D[i-1,j-1]) over the
    first DTW_N samples of each side, all integer.  Evaluated
    anti-diagonal by anti-diagonal (cells of diagonal d depend only on
    d-1 and d-2), which vectorizes the DP across the whole pair batch —
    and is exactly the recursion shape the DuckDB twin replays with two
    carried list columns.  Emits the DTW distance plus the
    diagonal-path cost sum(|a_i - b_i|), a valid warping path and hence
    a provable upper bound the gate checks implicitly.

    Scale shape: map-only fused Arrow pass over (bytes_a, bytes_b);
    2N-1 numpy steps per batch, no shuffle."""
    big = np.int64(1) << 40

    def gen(batches):
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                yield pd.DataFrame({"pair_id": [], "dtw": [], "diag_cost": []})
                continue
            a = np.stack(
                [np.frombuffer(b, dtype="<i2")[:n].astype(np.int64)
                 for b in pdf["bytes_a"]]
            )
            b = np.stack(
                [np.frombuffer(x, dtype="<i2")[:n].astype(np.int64)
                 for x in pdf["bytes_b"]]
            )
            prev = np.full((m, n), big, dtype=np.int64)   # diagonal d-1
            cur = np.full((m, n), big, dtype=np.int64)    # diagonal d
            cur[:, 0] = np.abs(a[:, 0] - b[:, 0])
            for d in range(1, 2 * n - 1):
                new = np.full((m, n), big, dtype=np.int64)
                i = np.arange(n)
                j = d - i
                valid = (j >= 0) & (j <= n - 1)
                iv = i[valid]
                jv = j[valid]
                cost = np.abs(a[:, iv] - b[:, jv])
                right = cur[:, iv]                         # D[d][i]
                down = np.where(iv > 0, cur[:, iv - 1], big)
                diag = np.where(iv > 0, prev[:, iv - 1], big)
                best = np.minimum(np.minimum(right, down), diag)
                new[:, iv] = cost + np.minimum(best, big)
                prev, cur = cur, new
            out = pd.DataFrame(
                {
                    "pair_id": pdf["pair_id"].to_numpy(),
                    "dtw": cur[:, n - 1],
                    "diag_cost": np.abs(a - b).sum(axis=1),
                }
            )
            yield out

    return pairs.select("pair_id", "bytes_a", "bytes_b").mapInPandas(
        gen, schema="pair_id long, dtw long, diag_cost long"
    )


BIQUAD_N = 256  # samples filtered per clip
# fixed-point lowpass biquad, all coefficients scaled by 1024:
# y_t = floor((B0 x_t + B1 x_{t-1} + B2 x_{t-2} - A1 y_{t-1} - A2 y_{t-2})/1024)
BIQUAD_B = (115, 230, 115)
BIQUAD_A = (-1600, 660)  # poles |z|^2 = 660/1024 < 1 -> stable


def biquad_stats(df: DataFrame, n: int = BIQUAD_N) -> DataFrame:
    """Fixed-point biquad IIR filter census (RBJ audio-EQ cookbook
    form, the 2-pole/2-zero section every audio chain is built from):
    the integer recurrence above runs over the first BIQUAD_N pcm16
    samples with floor division by the power-of-two scale — exact in
    both int64 and float64, so every engine agrees bit-for-bit (the
    Goertzel precedent).  Emits per clip the filtered-signal census:
    position-weighted checksum, sum/max of |y|, and the final sample.

    Scale shape: map-only mapInPandas over the binary column; the
    t-loop is vectorized across the whole Arrow batch of clips —
    BIQUAD_N numpy steps per batch, no shuffle."""
    b0, b1, b2 = BIQUAD_B
    a1, a2 = BIQUAD_A

    def gen(batches):
        for pdf in batches:
            m = len(pdf)
            cols = ("y_checksum", "sum_abs", "max_abs", "y_last")
            if m == 0:
                yield pd.DataFrame(
                    {"media_id": [], **{c: [] for c in cols}}
                )
                continue
            x = np.stack(
                [
                    np.frombuffer(b, dtype="<i2")[:n].astype(np.int64)
                    for b in pdf["bytes"]
                ]
            )  # (m, n)
            y1 = np.zeros(m, dtype=np.int64)
            y2 = np.zeros(m, dtype=np.int64)
            cks = np.zeros(m, dtype=np.int64)
            sab = np.zeros(m, dtype=np.int64)
            mab = np.zeros(m, dtype=np.int64)
            for t in range(n):
                xt = x[:, t]
                xm1 = x[:, t - 1] if t >= 1 else 0
                xm2 = x[:, t - 2] if t >= 2 else 0
                num = b0 * xt + b1 * xm1 + b2 * xm2 - a1 * y1 - a2 * y2
                y = np.floor_divide(num, 1024)
                cks += y * (t + 1)
                ay = np.abs(y)
                sab += ay
                np.maximum(mab, ay, out=mab)
                y2 = y1
                y1 = y
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(dtype=object),
                    "y_checksum": cks,
                    "sum_abs": sab,
                    "max_abs": mab,
                    "y_last": y1,
                }
            )

    return df.select("media_id", "bytes").mapInPandas(
        gen,
        schema=(
            "media_id string, y_checksum long, sum_abs long, "
            "max_abs long, y_last long"
        ),
    )


MULAW_BIAS = 132
MULAW_CLIP = 32635


def mu_law_census(df: DataFrame) -> DataFrame:
    """G.711 µ-law companding round-trip census (pcm16): the 8-bit
    logarithmic quantizer every telephony / speech-dataset pipeline
    applies before storage.  Encode: clip |s| to 32635, add the
    standard bias 132, segment = floor(log2(m)) - 7 (m >= 133 so the
    segment is 0..7), mantissa = the 4 bits under the leading 1,
    code = sign<<7 | seg<<4 | mant (the transport-layer ~ inversion is
    omitted — it is a bijection and cancels in the round-trip).
    Decode: m' = ((mant+16) << (seg+3)) + (1 << (seg+2)) - 132, the
    mid-riser reconstruction.  All arithmetic is integer-exact;
    floor(log2) is computed from the float64 exponent (np.frexp), which
    is exact for every int < 2^53.

    Emits per clip: n, code_sum, position-weighted code_checksum, exact
    L1 round-trip error and max error — the fidelity surface a lossy-
    codec gate (cf. the PSNR gate, op E10) audits.

    Scale shape: map-only mapInPandas over the opaque binary column —
    one Arrow hop, zero shuffle; the DuckDB twin replays the same
    segment/mantissa arithmetic with CASE ladders on the closed-form
    sample stream."""
    schema = (
        "media_id string, n long, code_sum long, code_checksum long, "
        "err_abs_sum long, err_max long"
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                s = np.frombuffer(r["bytes"], dtype="<i2").astype(np.int64)
                sign = (s < 0).astype(np.int64)
                m = np.minimum(np.abs(s), MULAW_CLIP) + MULAW_BIAS
                seg = np.frexp(m.astype(np.float64))[1].astype(np.int64) - 8
                mant = (m >> (seg + 3)) & 15
                code = sign * 128 + seg * 16 + mant
                mhat = ((mant + 16) << (seg + 3)) + (1 << (seg + 2)) - MULAW_BIAS
                shat = np.where(sign == 1, -mhat, mhat)
                err = np.abs(s - shat)
                t = np.arange(1, len(s) + 1, dtype=np.int64)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n": int(len(s)),
                        "code_sum": int(code.sum()),
                        "code_checksum": int((code * t).sum()),
                        "err_abs_sum": int(err.sum()),
                        "err_max": int(err.max()) if len(s) else 0,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n", "code_sum", "code_checksum",
                    "err_abs_sum", "err_max",
                ],
            )

    return df.select("media_id", "bytes").mapInPandas(gen, schema=schema)
