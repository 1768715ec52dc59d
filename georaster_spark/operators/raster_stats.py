"""Corpus-level pixel statistics: histogram + exact histogram-derived
quantiles (SURVEY §2.2b extension; reference analog: NumPy reductions a
georaster user runs on `self.r` after a full read — `georaster/
georaster.py :: read_single_band` ≈L370-390 ⚠ UNVERIFIED, SURVEY §0 —
here lifted to the whole 10^12-tile corpus).

Scale shape (the reason this is an operator and not `flatMap(explode
pixels)`): the histogram is a partial+final aggregate where the map-side
partial is ONE vectorized ``np.bincount`` per (dtype-group, Arrow batch)
inside ``mapInPandas``.  Each batch emits at most 256 slim
(fmt, bin, cnt) rows, so shuffle volume is O(n_batches * 256) — never
O(pixels) — and pixel bytes cross the JVM->Python Arrow boundary exactly
once.  The final reduce is a built-in hash ``groupBy(fmt, bin).sum`` that
Catalyst keeps whole-stage-codegen'd.  Quantiles then derive exactly from
the (tiny) histogram with window cumsums — no second pass over pixels,
unlike ``approx_percentile`` which would re-scan and still be
approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HIST_SCHEMA = "fmt string, bin int, cnt long"


def pixel_histogram(tiles: DataFrame) -> DataFrame:
    """256-bin per-fmt histogram over every pixel of every tile.

    uint8 codecs ('raw', 'qnt') bin by value; 'raw16' bins by high byte
    (v >> 8) so a single 256-bin surface covers both dtypes (documented
    coarse binning — a 65536-bin uint16 histogram is the same code with
    ``minlength=65536``).  Only nonzero bins are emitted (matches a SQL
    GROUP BY, which has no empty groups).
    """
    slim = tiles.select("bytes", "fmt")

    def _partials(batches):
        from .. import oracle  # noqa: F401  (import check: codec set lives there)

        for pdf in batches:
            fmts = pdf["fmt"].to_numpy(dtype=object)
            for fmt in pd.unique(pdf["fmt"]):
                if fmt not in ("raw", "qnt", "raw16"):
                    raise ValueError(f"unknown pixel fmt {fmt!r}")
                mask = fmts == fmt
                buf = b"".join(pdf["bytes"].iloc[k] for k in np.nonzero(mask)[0])
                v = np.frombuffer(buf, dtype="<u2" if fmt == "raw16" else np.uint8)
                if fmt == "raw16":
                    v = v >> 8
                cnt = np.bincount(v, minlength=256)
                nz = np.nonzero(cnt)[0]
                yield pd.DataFrame(
                    {"fmt": fmt, "bin": nz.astype(np.int32), "cnt": cnt[nz]}
                )

    partial = slim.mapInPandas(_partials, schema=_HIST_SCHEMA)
    return partial.groupBy("fmt", "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    qs: tuple[float, ...] = (0.25, 0.5, 0.95),
    key: str = "fmt",
) -> DataFrame:
    """Exact quantile bins from a (key, bin, cnt) histogram.

    Definition (normative, integer-exact): quantile q = the smallest bin
    whose per-fmt cumulative count reaches ``ceil(q * total)``.  Pure
    window math over the 256-row histogram — negligible data, and the
    whole derivation is SQL-expressible, so the DuckDB oracle runs the
    verbatim twin (plans/contract._sql_pixel_quantiles).
    """
    w_cum = Window.partitionBy(key).orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy(key)
    cum = hist.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
        "total", F.sum("cnt").over(w_tot)
    )
    qdf = cum.crossJoin(
        F.broadcast(
            cum.sparkSession.createDataFrame([(q,) for q in qs], "q double")
        )
    )
    return (
        qdf.where(F.col("cum") >= F.ceil(F.col("q") * F.col("total")))
        .groupBy(key, "q")
        .agg(F.min("bin").alias("qbin"))
    )


def equalization_lut(hist: DataFrame) -> DataFrame:
    """Histogram-equalization lookup table from a (fmt, bin, cnt)
    histogram: per fmt, ``lut[v] = (255 * (cdf(v) - cdf_min)) DIV
    (total - cdf_min)`` (the classic equalization transfer function with
    INTEGER floor division — exact at any corpus size, where a float
    divide would misround above ~2^53 pixels), ``cdf_min`` = count of the
    first occupied bin; degenerate single-bin corpora map to 0.

    Pure window math over the <=256-row-per-fmt histogram; the whole
    derivation is SQL-expressible so the DuckDB oracle runs the verbatim
    twin."""
    w_cum = Window.partitionBy("fmt").orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy("fmt")
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("total", F.sum("cnt").over(w_tot))
        .withColumn("cdf_min", F.min("cum").over(w_tot))
    )
    lut = F.when(F.col("total") == F.col("cdf_min"), F.lit(0)).otherwise(
        F.expr("(255 * (cum - cdf_min)) DIV (total - cdf_min)")
    )
    return cum.select("fmt", "bin", lut.cast("long").alias("lut"))


def match_lut(src_hist: DataFrame, ref_hist: DataFrame) -> DataFrame:
    """Histogram-MATCHING lookup table (skimage ``match_histograms`` /
    GDAL color-balance idea): remap the source corpus so its value CDF
    tracks a REFERENCE corpus — the cross-corpus normalization step a
    training pipeline runs when two acquisition batches must photometric-
    match before being mixed.  Rule: ``lut[v] = min u with
    cdf_ref(u) >= cdf_src(v)`` where the CDF comparison is the exact
    integer cross-multiplication ``cum_ref[u] * total_src >=
    cum_src[v] * total_ref`` — no float quantiles, so the LUT is
    bit-identical cross-engine (the ratio compare needs int128/Decimal
    above ~3e9 pixels; swap the product for a DecimalType compare there).
    The min-u is always an occupied reference bin (the CDF only rises at
    occupied bins), so joining occupied-bins-only is lossless.

    Both inputs are (fmt, bin, cnt) histograms <=256 rows; the whole
    derivation is window math + one tiny theta join, SQL-expressible
    for the verbatim DuckDB twin.  Output (fmt, bin, lut) feeds
    equalize_checksum's broadcast-remap pass unchanged."""
    def _cum(h: DataFrame) -> DataFrame:
        w_cum = Window.partitionBy("fmt").orderBy("bin").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        w_tot = Window.partitionBy("fmt")
        return h.withColumn("cum", F.sum("cnt").over(w_cum)).withColumn(
            "total", F.sum("cnt").over(w_tot)
        )

    s = _cum(src_hist).select("fmt", "bin", "cum", "total")
    r = _cum(ref_hist).select(
        F.col("bin").alias("rbin"), F.col("cum").alias("rcum"),
        F.col("total").alias("rtotal"),
    )
    return (
        s.join(
            F.broadcast(r),
            F.col("rcum") * F.col("total") >= F.col("cum") * F.col("rtotal"),
        )
        .groupBy("fmt", "bin")
        .agg(F.min("rbin").cast("long").alias("lut"))
    )


def equalize_checksum(tiles: DataFrame, lut: DataFrame) -> DataFrame:
    """Second pass of the two-pass equalization: apply the (tiny) LUT to
    each tile's pixels and reduce in the SAME fused Arrow pass to
    (image_id, eq_sum, eq_checksum) — the remapped pixels never leave
    NumPy.  The LUT is collected driver-side (bounded: <=256 rows per
    fmt) and shipped as a plain broadcast; the pass itself is map-only.

    raw16 payloads remap by high byte (v >> 8), matching
    pixel_histogram's binning rule."""
    rows = lut.collect()
    tables: dict[str, np.ndarray] = {}
    for r in rows:
        tables.setdefault(r["fmt"], np.zeros(256, dtype=np.int64))[
            int(r["bin"])
        ] = int(r["lut"])
    bc = tiles.sparkSession.sparkContext.broadcast(tables)
    slim = tiles.select("image_id", "bytes", "fmt")

    def _remap(batches):
        luts = bc.value
        for pdf in batches:
            out = {"image_id": [], "eq_sum": [], "eq_checksum": []}
            fmts = pdf["fmt"].to_numpy(dtype=object)
            for fmt in pd.unique(pdf["fmt"]):
                t = luts[fmt]
                idx = np.nonzero(fmts == fmt)[0]
                for k in idx:
                    v = np.frombuffer(
                        pdf["bytes"].iat[k], dtype="<u2" if fmt == "raw16" else np.uint8
                    )
                    eq = t[(v >> 8) if fmt == "raw16" else v]
                    wt = np.arange(1, eq.size + 1, dtype=np.int64)
                    out["image_id"].append(pdf["image_id"].iat[k])
                    out["eq_sum"].append(int(eq.sum()))
                    out["eq_checksum"].append(int((eq * wt).sum()))
            yield pd.DataFrame(out)

    return slim.mapInPandas(
        _remap, schema="image_id string, eq_sum long, eq_checksum long"
    )


_POOL_SCHEMA = (
    "image_id string, n_blocks long, block_checksum long, "
    "sum_all long, max_block long"
)


def avg_pool_checksum(tiles: DataFrame, k: int) -> DataFrame:
    """GDAL BuildOverviews 'AVERAGE' resampling surface (vs the 'NEAREST'
    decimation of raster_io.downsample/build_pyramid): k x k block SUMS
    over each tile — the average is sum/k^2, reported as the integer sum
    so every value is int64-exact and order-free.  Tiles are cropped to
    k-multiples (GDAL's partial-edge averaging is a documented deviation).

    Map-only fused mapInPandas; the (n, h//k, k, w//k, k) reshape makes
    the pooling one whole-block NumPy reduction per (w,h,fmt) group."""
    import numpy as np
    import pandas as pd

    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _pool(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"].to_numpy(dtype=object),
                "n_blocks": np.zeros(n, dtype=np.int64),
                "block_checksum": np.zeros(n, dtype=np.int64),
                "sum_all": np.zeros(n, dtype=np.int64),
                "max_block": np.zeros(n, dtype=np.int64),
            }
            groups: dict[tuple, list[int]] = {}
            for i in range(n):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), idx in groups.items():
                h2, w2 = (h // k) * k, (w // k) * k
                if h2 == 0 or w2 == 0:
                    continue
                blk = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)[:, :h2, :w2]
                    .astype(np.int64)
                )
                s = blk.reshape(len(idx), h2 // k, k, w2 // k, k).sum(axis=(2, 4))
                bw = w2 // k
                wt = np.arange(1, (h2 // k) * bw + 1, dtype=np.int64).reshape(
                    h2 // k, bw
                )
                ii = np.asarray(idx)
                out["n_blocks"][ii] = (h2 // k) * bw
                out["block_checksum"][ii] = (s * wt).sum(axis=(1, 2))
                out["sum_all"][ii] = s.sum(axis=(1, 2))
                out["max_block"][ii] = s.max(axis=(1, 2))
            yield pd.DataFrame(out)

    return slim.mapInPandas(_pool, schema=_POOL_SCHEMA)


def mode_pool_checksum(tiles: DataFrame, k: int) -> DataFrame:
    """GDAL BuildOverviews 'MODE' resampling surface (the categorical
    complement of avg_pool_checksum — majority vote per k×k block, ties
    to the SMALLEST value, the same rule as zonal_majority): per tile,
    the block count, Σ of block modes, max block mode, and the
    position-weighted mode checksum pinning every block's winner.

    All int64-exact.  Map-only fused mapInPandas; per (w,h,fmt) group
    the block histogram is ONE vectorized offset-bincount over
    (tile, block) codes — no Python loop over blocks."""
    import numpy as np
    import pandas as pd

    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _pool(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"].to_numpy(dtype=object),
                "n_blocks": np.zeros(n, dtype=np.int64),
                "mode_sum": np.zeros(n, dtype=np.int64),
                "mode_max": np.zeros(n, dtype=np.int64),
                "mode_checksum": np.zeros(n, dtype=np.int64),
            }
            groups: dict[tuple, list[int]] = {}
            for i in range(n):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), idx in groups.items():
                h2, w2 = (h // k) * k, (w // k) * k
                if h2 == 0 or w2 == 0:
                    continue
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)[:, :h2, :w2]
                )
                if fmt == "raw16":
                    z = (z >> 8).astype(np.uint8)
                z = z.astype(np.int64)
                nb_h, nb_w = h2 // k, w2 // k
                nblk = nb_h * nb_w
                # (tile, block) -> 256-bin histogram via one bincount:
                # code = ((tile*nblk + block)*256) + value
                blk = (
                    z.reshape(len(idx), nb_h, k, nb_w, k)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(len(idx) * nblk, k * k)
                )
                offs = (np.arange(len(idx) * nblk) * 256)[:, None]
                hist = np.bincount(
                    (blk + offs).ravel(), minlength=len(idx) * nblk * 256
                ).reshape(len(idx) * nblk, 256)
                # argmax picks the FIRST max -> smallest-value tie rule
                modes = hist.argmax(axis=1).reshape(len(idx), nblk)
                wt = np.arange(1, nblk + 1, dtype=np.int64)
                ii = np.asarray(idx)
                out["n_blocks"][ii] = nblk
                out["mode_sum"][ii] = modes.sum(axis=1)
                out["mode_max"][ii] = modes.max(axis=1)
                out["mode_checksum"][ii] = (modes * wt).sum(axis=1)
            yield pd.DataFrame(out)

    schema = (
        "image_id string, n_blocks long, mode_sum long, "
        "mode_max long, mode_checksum long"
    )
    return slim.mapInPandas(_pool, schema=schema)


def max_pool_argmax_checksum(tiles: DataFrame, k: int) -> DataFrame:
    """Max-pooling with argmax positions (the forward pass of a pooling
    layer plus the indices a training pipeline must keep to route the
    backward pass / unpooling): per k x k block the maximum pixel and
    the TILE coordinates of its first row-major occurrence (the
    deterministic tie rule), rolled up per image as

      n_blocks       blocks pooled (tiles cropped to k-multiples)
      max_sum        sum of block maxima
      max_min        min over block maxima (the weakest activation)
      arg_checksum   sum over blocks of (block_rank+1) * (i*w + j) of the
                     argmax pixel -- pins every winner's position
      arg_pos_sum    sum of argmax flat positions (i*w + j)

    All int64-exact.  Map-only fused mapInPandas, one (n, hb, k, wb, k)
    reshape + argmax per (w,h,fmt) group -- no Python loop over blocks,
    pixels never shuffle."""
    import numpy as np
    import pandas as pd

    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _pool(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"].to_numpy(dtype=object),
                "n_blocks": np.zeros(n, dtype=np.int64),
                "max_sum": np.zeros(n, dtype=np.int64),
                "max_min": np.zeros(n, dtype=np.int64),
                "arg_checksum": np.zeros(n, dtype=np.int64),
                "arg_pos_sum": np.zeros(n, dtype=np.int64),
            }
            groups: dict[tuple, list[int]] = {}
            for i in range(n):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), idx in groups.items():
                h2, w2 = (h // k) * k, (w // k) * k
                if h2 == 0 or w2 == 0:
                    continue
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)[:, :h2, :w2]
                    .astype(np.int64)
                )
                nb_h, nb_w = h2 // k, w2 // k
                nblk = nb_h * nb_w
                blk = (
                    z.reshape(len(idx), nb_h, k, nb_w, k)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(len(idx), nblk, k * k)
                )
                mx = blk.max(axis=2)
                am = blk.argmax(axis=2)  # first max: row-major tie rule
                bi = np.arange(nblk, dtype=np.int64) // nb_w
                bj = np.arange(nblk, dtype=np.int64) % nb_w
                pos = (bi * k + am // k) * w + (bj * k + am % k)
                wt = np.arange(1, nblk + 1, dtype=np.int64)
                ii = np.asarray(idx)
                out["n_blocks"][ii] = nblk
                out["max_sum"][ii] = mx.sum(axis=1)
                out["max_min"][ii] = mx.min(axis=1)
                out["arg_checksum"][ii] = (pos * wt).sum(axis=1)
                out["arg_pos_sum"][ii] = pos.sum(axis=1)
            yield pd.DataFrame(out)

    schema = (
        "image_id string, n_blocks long, max_sum long, "
        "max_min long, arg_checksum long, arg_pos_sum long"
    )
    return slim.mapInPandas(_pool, schema=schema)


def wht_energy_census(tiles: DataFrame, k: int = 8) -> DataFrame:
    """Walsh-Hadamard 2-D block transform energy census — the
    integer-exact stand-in for the DCT energy compaction every
    block-transform codec (JPEG's 8x8 stage) relies on: per k x k block
    (k a power of two) the full WHT C = H_k B H_k with the +-1 Sylvester
    matrix (coef(u,v) = sum_xy B[x,y] * (-1)^(popcount(u&x)+popcount(v&y)),
    natural order), rolled up per image as

      n_blocks       blocks transformed (tiles cropped to k-multiples)
      dc_sum         sum of C[0,0] (block pixel sums; always >= 0)
      ac_energy      sum of |C[u,v]| over (u,v) != (0,0) -- total AC drive
      hf_energy      sum of |C[u,v]| over u >= k/2 or v >= k/2 -- the
                     high-sequency half a codec would quantize away
      coef_checksum  sum over blocks of (blk+1) * sum_uv (u*k+v+1)*|C|,
                     pinning every coefficient of every block

    All int64-exact (|C| <= 255*k^2, far inside 2^53 after weighting).
    Map-only fused mapInPandas: one H @ B @ H einsum per (w,h,fmt)
    group; pixels never shuffle, no Python loop over blocks."""
    import numpy as np
    import pandas as pd

    if k & (k - 1) or k < 2:
        raise ValueError(f"WHT block size must be a power of two >= 2, got {k}")
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _hadamard(m: int) -> "np.ndarray":
        H = np.array([[1]], dtype=np.int64)
        while H.shape[0] < m:
            H = np.block([[H, H], [H, -H]])
        return H

    def _census(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        H = _hadamard(k)
        uu, vv = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
        hf = (uu >= k // 2) | (vv >= k // 2)
        cw = (uu * k + vv + 1).astype(np.int64)
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"].to_numpy(dtype=object),
                "n_blocks": np.zeros(n, dtype=np.int64),
                "dc_sum": np.zeros(n, dtype=np.int64),
                "ac_energy": np.zeros(n, dtype=np.int64),
                "hf_energy": np.zeros(n, dtype=np.int64),
                "coef_checksum": np.zeros(n, dtype=np.int64),
            }
            groups: dict[tuple, list[int]] = {}
            for i in range(n):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), idx in groups.items():
                h2, w2 = (h // k) * k, (w // k) * k
                if h2 == 0 or w2 == 0:
                    continue
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)[:, :h2, :w2]
                    .astype(np.int64)
                )
                nb_h, nb_w = h2 // k, w2 // k
                nblk = nb_h * nb_w
                blk = (
                    z.reshape(len(idx), nb_h, k, nb_w, k)
                    .transpose(0, 1, 3, 2, 4)
                    .reshape(len(idx), nblk, k, k)
                )
                C = np.einsum("ux,tbxy,vy->tbuv", H, blk, H)
                A = np.abs(C)
                wt = np.arange(1, nblk + 1, dtype=np.int64)
                ii = np.asarray(idx)
                out["n_blocks"][ii] = nblk
                out["dc_sum"][ii] = C[:, :, 0, 0].sum(axis=1)
                out["ac_energy"][ii] = A.sum(axis=(1, 2, 3)) - A[:, :, 0, 0].sum(axis=1)
                out["hf_energy"][ii] = (A * hf).sum(axis=(1, 2, 3))
                out["coef_checksum"][ii] = ((A * cw).sum(axis=(2, 3)) * wt).sum(axis=1)
            yield pd.DataFrame(out)

    schema = (
        "image_id string, n_blocks long, dc_sum long, "
        "ac_energy long, hf_energy long, coef_checksum long"
    )
    return slim.mapInPandas(_census, schema=schema)


def bitplane_census(tiles: DataFrame) -> DataFrame:
    """Bit-plane slicing census — the per-plane structure profile
    compression and steganalysis tools read before touching an image:
    for each of the 8 bit planes of every tile, the number of set bits
    and a position-weighted checksum sum((i*w + j + 1) * bit) that pins
    every bit's location.  Low planes of natural imagery look like
    noise (n_ones ~ half the pixels), high planes carry the structure;
    the fixture ramps make every plane's exact profile derivable by the
    DuckDB twin via (v >> plane) & 1.

    Output: one row per (image_id, plane).  All int64-exact.
    Map-only fused mapInPandas: one shift-and-mask broadcast per
    (w,h,fmt) group; pixels never shuffle."""
    import numpy as np
    import pandas as pd

    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _census(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        planes = np.arange(8, dtype=np.int64)
        for pdf in batches:
            n = len(pdf)
            ids, pl, ones, cks = [], [], [], []
            groups: dict[tuple, list[int]] = {}
            for i in range(n):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)
                    .astype(np.int64)
                )
                bits = (z[:, None, :, :] >> planes[None, :, None, None]) & 1
                pw = (np.arange(h * w, dtype=np.int64) + 1).reshape(h, w)
                n1 = bits.sum(axis=(2, 3))
                ck = (bits * pw).sum(axis=(2, 3))
                for t, i in enumerate(idx):
                    ids.extend([pdf["image_id"].iat[i]] * 8)
                    pl.extend(planes.tolist())
                    ones.extend(n1[t].tolist())
                    cks.extend(ck[t].tolist())
            yield pd.DataFrame(
                {"image_id": ids, "plane": pl, "n_ones": ones, "pos_checksum": cks}
            )

    schema = "image_id string, plane int, n_ones long, pos_checksum long"
    return slim.mapInPandas(_census, schema=schema)


def _lattice_site_table(tiles: DataFrame) -> DataFrame:
    """Per-site lattice neighbourhood table — the shared single-pass
    core of the Moran/Geary/Getis-Ord family.

    ONE fused Arrow pass computes each tile's integer floor-mean m
    (exact in float64: integer sum < 2^53, power-of-two divisor, so
    floor() == the oracle's integer SUM // (w*h)), then each tile
    explodes into FIVE slim rows — one `site` row at its own grid cell
    (gx = idx % GRID_W, gy = idx // GRID_W, the pre-jitter layout) and
    four `probe` rows carrying m to the rook neighbours.  A single
    groupBy on the grid key then recovers, per occupied cell:

      m        site value
      k_nb     number of EXISTING rook neighbours (probes only arrive
               from real tiles; cells with no site row are dropped,
               so edge/corner sites count 3/2 exactly)
      lag_sum  Σ neighbour m     (the spatial lag numerator)
      lag_sq   Σ neighbour m²    (for Geary's squared differences)

    Every directed-pair moment the family needs is a per-site function
    of (m, k_nb, lag_sum, lag_sq), so the 4-probe equi-JOIN of the
    textbook formulation disappears entirely: the previous join-based
    shape evaluated the decode projection 3-4× (base agg + probe side +
    join side = 3-4 full pixel passes); this shape decodes ONCE and
    shuffles only the 5n slim probe rows.  At 100 TB the groupBy
    partitions on the grid key and consumers that reuse this table
    twice (per-site stats × global base) share the exchange via
    Spark's ReuseExchange — still one decode."""
    from ..constants import GRID_W
    from ..functions.codecs import pixel_mean
    from .georegister import image_idx

    idx = image_idx()
    gx = (idx % GRID_W).cast("long")
    gy = F.floor(idx / GRID_W).cast("long")
    m = F.floor(
        pixel_mean(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt"))
    ).cast("long")

    def _p(tag: int, x, y):
        return F.struct(F.lit(tag).alias("tag"), x.alias("gx"), y.alias("gy"))

    ex = tiles.select(
        m.alias("m"),
        F.explode(
            F.array(
                _p(0, gx, gy),
                _p(1, gx + 1, gy),
                _p(1, gx - 1, gy),
                _p(1, gx, gy + 1),
                _p(1, gx, gy - 1),
            )
        ).alias("p"),
    ).select(
        "m",
        F.col("p.tag").alias("tag"),
        F.col("p.gx").alias("gx"),
        F.col("p.gy").alias("gy"),
    )
    is_nb = F.col("tag") == 1
    return (
        ex.groupBy("gx", "gy")
        .agg(
            # exactly one site row per occupied cell (idx -> (gx,gy) is
            # injective), so max() is just "the" site value
            F.max(F.when(~is_nb, F.col("m"))).alias("m"),
            F.sum(F.when(is_nb, 1).otherwise(0)).alias("k_nb"),
            F.sum(F.when(is_nb, F.col("m")).otherwise(0)).alias("lag_sum"),
            F.sum(
                F.when(is_nb, F.col("m") * F.col("m")).otherwise(0)
            ).alias("lag_sq"),
        )
        .where(F.col("m").isNotNull())
    )


def moran_lattice_moments(tiles: DataFrame) -> DataFrame:
    """Global Moran's I spatial autocorrelation over the ingest lattice
    (the `esda.Moran` / ArcGIS Spatial Autocorrelation analog a
    georaster user runs on per-tile summary values; reference analog:
    corpus-level statistics over loaded ``self.r`` arrays — SURVEY §0 ⚠,
    nothing on disk).

    Each tile's value is its integer floor-mean pixel value; adjacency
    is rook (4-neighbour) on the ingest lattice gx = idx % GRID_W,
    gy = idx // GRID_W (the pre-jitter layout — a pure idx function, so
    the lattice is complete and deterministic).  Emits the exact integer
    MOMENTS from which Moran's I is recoverable without any float ever
    entering the distributed plan:

      I = (n_tiles / w_pairs) * num / den,
      num = pair_prod_sum - xbar * pair_sum_sum + w_pairs * xbar^2
      den = sum_m2 - n_tiles * xbar^2,          xbar = sum_m / n_tiles

    Directed-pair moments fold into per-site sums over the shared
    single-decode site table (_lattice_site_table):
      w_pairs       = Σ k_nb          (directed pairs, both ends exist)
      pair_prod_sum = Σ m·lag_sum     (= Σ_{i→j} m_i·m_j)
      pair_sum_sum  = Σ (k_nb·m + lag_sum)
    ONE Arrow decode pass, one slim grid-key shuffle, one scalar agg —
    the previous 3-decode join shape measured ~3× slower."""
    s = _lattice_site_table(tiles)
    has_pairs = F.sum("k_nb") > 0
    return s.agg(
        F.count("*").alias("n_tiles"),
        F.sum("m").alias("sum_m"),
        F.sum(F.col("m") * F.col("m")).alias("sum_m2"),
        F.coalesce(F.sum("k_nb"), F.lit(0)).alias("w_pairs"),
        # SUM over an empty pair set is NULL in SQL; preserve that
        F.when(has_pairs, F.sum(F.col("m") * F.col("lag_sum"))).alias(
            "pair_prod_sum"
        ),
        F.when(
            has_pairs, F.sum(F.col("k_nb") * F.col("m") + F.col("lag_sum"))
        ).alias("pair_sum_sum"),
    )


def local_moran_moments(tiles: DataFrame) -> DataFrame:
    """Local Moran's I (LISA — Anselin 1995; esda.Moran_Local analog)
    over the ingest lattice: the per-site decomposition of the global
    statistic moran_lattice_moments emits.  Site value = integer tile
    floor-mean; rook adjacency on the pre-jitter lattice (gx = idx %
    GRID_W, gy = idx // GRID_W).

    With n sites and S = sum of site values, the exact scaled deviation
    is z_i = n*m_i - S (an integer — no float mean ever enters the
    plan), and the emitted LISA numerator is

        lisa_num_i = z_i * (n * lag_i - k_i * S)

    where lag_i = sum of neighbour values and k_i = neighbour count;
    dividing by n^2 * (a float variance) recovers Anselin's I_i, so
    hotspot/outlier CLASSIFICATION (the sign quadrant) is already exact
    on this surface.  |z| <= n*255 and |n*lag| <= 4*n*255, so the
    product stays inside int64 up to n ~ 4e7 sites per statistical
    frame; beyond that, frames are windowed (the standard LISA
    practice) — documented bound, asserted nowhere near at fixture
    scale.

    Scale shape: both the per-site rows and the tiny (n, S) base
    aggregate derive from the SAME single-decode site table
    (_lattice_site_table), materialized once via a lazy localCheckpoint
    — column pruning specializes the two consumers differently, which
    defeats plan-level ReuseExchange, so the slim table (6 longs per
    site — ~50 B/row, negligible next to the pixel corpus) is pinned
    explicitly and pixels decode exactly once.  (The previous join
    formulation evaluated the decode 4×.)"""
    s = _lattice_site_table(tiles).localCheckpoint(eager=False)
    base = s.agg(F.count("*").alias("n_tiles"), F.sum("m").alias("sum_m"))
    return s.crossJoin(F.broadcast(base)).select(
        "gx", "gy", "m", "k_nb", "lag_sum",
        (
            (F.col("n_tiles") * F.col("m") - F.col("sum_m"))
            * (
                F.col("n_tiles") * F.col("lag_sum")
                - F.col("k_nb") * F.col("sum_m")
            )
        ).alias("lisa_num"),
    )


_CENSUS_SCHEMA = "image_id string, v int, cnt long"

# normative demo break table (a real deployment feeds its own DataFrame):
# deliberately non-uniform so class widths differ.
CLASS_BREAKS = ((0, 0, 31), (1, 32, 63), (2, 64, 127), (3, 128, 191), (4, 192, 255))


def value_census(tiles: DataFrame) -> DataFrame:
    """Per-image value census: (image_id, v, cnt) with at most 256 slim
    rows per tile — ONE vectorized np.bincount per tile inside a single
    Arrow hop ('raw16' bins by high byte, same convention as
    pixel_histogram)."""
    slim = tiles.select("image_id", "bytes", "fmt")

    def _p(batches):
        for pdf in batches:
            out = {"image_id": [], "v": [], "cnt": []}
            for k in range(len(pdf)):
                fmt = pdf["fmt"].iat[k]
                if fmt not in ("raw", "qnt", "raw16"):
                    raise ValueError(f"unknown pixel fmt {fmt!r}")
                v = np.frombuffer(
                    pdf["bytes"].iat[k], dtype="<u2" if fmt == "raw16" else np.uint8
                )
                if fmt == "raw16":
                    v = v >> 8
                cnt = np.bincount(v, minlength=256)
                nz = np.nonzero(cnt)[0]
                out["image_id"].extend([pdf["image_id"].iat[k]] * len(nz))
                out["v"].extend(nz.astype(np.int32))
                out["cnt"].extend(cnt[nz])
            yield pd.DataFrame(out)

    return slim.mapInPandas(_p, schema=_CENSUS_SCHEMA)


def reclassify(tiles: DataFrame, breaks: DataFrame) -> DataFrame:
    """Table-driven raster reclassification (gdal_calc / `gdaldem
    color-relief` / QGIS r.reclass analog) in the 100 TB-correct shape:
    HISTOGRAM-THEN-CLASSIFY.  The per-image value census (≤256 rows per
    tile from one fused Arrow pass) is range-joined to the BROADCAST
    class-breaks table (cls, lo, hi) — so classification touches 256
    slim rows per image, never the million raw pixels, and changing the
    break table is a new join, not a new pixel scan.

    Per (image, class): n_px and the value-weighted sum Σv·cnt pinning
    the exact census slice that landed in the class.

    Scale shape: one Arrow hop (census) -> broadcast range join (the
    breaks side is tiny by definition) -> codegen hash agg; shuffle is
    O(tiles·256) slim rows, pixels never shuffle."""
    c = value_census(tiles)
    b = F.broadcast(breaks.select("cls", "lo", "hi"))
    j = c.join(b, (c.v >= b.lo) & (c.v <= b.hi))
    return j.groupBy("image_id", "cls").agg(
        F.sum("cnt").alias("n_px"),
        F.sum(F.col("v").cast("long") * F.col("cnt")).alias("v_sum"),
    )


def geary_lattice_moments(tiles: DataFrame) -> DataFrame:
    """Global Geary's C spatial autocorrelation over the ingest lattice
    — the local-variance complement to moran_lattice_moments (Moran
    measures covariance with the lag; Geary measures squared
    differences, so it is the more sensitive of the pair to local
    structure — the esda.Geary analog).  Same site values (integer
    floor-mean per tile), same rook adjacency, same all-integer moment
    surface:

        C = (n - 1) * pair_sqdiff_sum / (2 * w_pairs * den),
        den = sum_m2 - n * xbar^2,   xbar = sum_m / n

    where pair_sqdiff_sum = Σ (m_i - m_j)^2 over DIRECTED neighbour
    pairs (symmetric weights => each unordered pair twice, cancelling
    the conventional 2W normalisation exactly).

    Directed squared differences fold into per-site sums over the
    shared single-decode site table (_lattice_site_table):
      Σ_{i→j} (m_i - m_j)² = Σ_j (lag_sq - 2·m·lag_sum + k_nb·m²)
    ONE Arrow decode pass, one slim grid-key shuffle, one scalar agg
    (the previous join shape decoded 3×)."""
    s = _lattice_site_table(tiles)
    has_pairs = F.sum("k_nb") > 0
    return s.agg(
        F.count("*").alias("n_tiles"),
        F.sum("m").alias("sum_m"),
        F.sum(F.col("m") * F.col("m")).alias("sum_m2"),
        F.coalesce(F.sum("k_nb"), F.lit(0)).alias("w_pairs"),
        F.when(
            has_pairs,
            F.sum(
                F.col("lag_sq")
                - 2 * F.col("m") * F.col("lag_sum")
                + F.col("k_nb") * F.col("m") * F.col("m")
            ),
        ).alias("pair_sqdiff_sum"),
    )


def getis_ord_moments(tiles: DataFrame) -> DataFrame:
    """Getis-Ord Gi* hot-spot moments (the ArcGIS "Hot Spot Analysis"
    tool; Getis & Ord 1992/1995 — the third member of the lattice
    autocorrelation family after moran_lattice_moments and
    geary_lattice_moments; reference analog: corpus statistics over
    loaded ``self.r`` arrays — SURVEY §0 ⚠, nothing on disk).

    Gi* compares each site's CLOSED-neighborhood sum (rook neighbors
    plus the site itself — the "star" variant) against the global mean.
    With n sites, total S = Σm, star_k_i = |Γ(i)| + 1 and
    star_sum_i = Σ_{j∈Γ(i)∪{i}} m_j, the emitted exact integer

        gi_num_i = n * star_sum_i - star_k_i * S

    is n²·Var-scaled Gi*'s numerator: its SIGN is the hot(+)/cold(−)
    classification and dividing by the global float std recovers the
    textbook z-score, so no float enters the distributed plan.  Bounds:
    |gi_num| <= 5·255·n — int64-safe to n ~ 7e15 sites.

    Scale shape identical to local_moran_moments: per-site rows and the
    tiny (n, S) base aggregate both read the single-decode site table,
    pinned once via lazy localCheckpoint (pruning-specialized consumers
    defeat ReuseExchange), so pixels decode exactly once."""
    s = _lattice_site_table(tiles).localCheckpoint(eager=False)
    base = s.agg(F.count("*").alias("n_tiles"), F.sum("m").alias("sum_m"))
    return s.crossJoin(F.broadcast(base)).select(
        "gx", "gy", "m",
        (F.col("k_nb") + 1).alias("star_k"),
        (F.col("lag_sum") + F.col("m")).alias("star_sum"),
        (
            F.col("n_tiles") * (F.col("lag_sum") + F.col("m"))
            - (F.col("k_nb") + 1) * F.col("sum_m")
        ).alias("gi_num"),
    )

def d4_checksums(tiles: DataFrame) -> DataFrame:
    """Dihedral-group (D4) augmentation census — the eight exact
    symmetries of a square tile (identity, three rotations, two axis
    flips, two diagonal flips) that image-training pipelines apply as
    lossless augmentations (reference analog: a georaster user calling
    np.rot90/np.flip on ``self.r`` before re-writing — SURVEY §0 ⚠,
    nothing on disk).  For each (image, transform) the position-weighted
    checksum sum((i*w + j + 1) * out[i,j]) pins every pixel's landing
    spot, so a wrong axis order or off-by-one mirror flips the hash.

    Transform table (out[i,j] = in[si, sj], square w==h):
      0 identity    si=i        sj=j
      1 rot90 CCW   si=j        sj=w-1-i
      2 rot180      si=w-1-i    sj=w-1-j
      3 rot270      si=w-1-j    sj=i
      4 fliplr      si=i        sj=w-1-j
      5 flipud      si=w-1-i    sj=j
      6 transpose   si=j        sj=i
      7 anti-transp si=w-1-j    sj=w-1-i

    All int64-exact.  Map-only fused mapInPandas: the eight variants are
    numpy views (no copies) over one stacked decode per (w,h,fmt) group;
    pixels cross Arrow once and never shuffle."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _census(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            ids, tr, cks = [], [], []
            groups: dict[tuple, list[int]] = {}
            for i in range(len(pdf)):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)
                    .astype(np.int64)
                )
                pw = (np.arange(h * w, dtype=np.int64) + 1).reshape(h, w)
                variants = [
                    z,
                    np.rot90(z, 1, axes=(1, 2)),
                    np.rot90(z, 2, axes=(1, 2)),
                    np.rot90(z, 3, axes=(1, 2)),
                    z[:, :, ::-1],
                    z[:, ::-1, :],
                    z.transpose(0, 2, 1),
                    z[:, ::-1, ::-1].transpose(0, 2, 1),
                ]
                per_t = [np.einsum("nij,ij->n", v, pw) for v in variants]
                for t, ck in enumerate(per_t):
                    ids.extend(pdf["image_id"].iat[i] for i in idx)
                    tr.extend([t] * len(idx))
                    cks.extend(ck.tolist())
            yield pd.DataFrame({"image_id": ids, "transform": tr, "checksum": cks})

    schema = "image_id string, transform int, checksum long"
    return slim.mapInPandas(_census, schema=schema)


JIGSAW_G = 4  # patches per side
JIGSAW_MULT = 5  # 5 and 16 coprime -> k |-> (5k + idx) % 16 is a bijection


def jigsaw_checksum(tiles: DataFrame) -> DataFrame:
    """Jigsaw patch-permutation checksum — the self-supervised
    pretraining augmentation (Noroozi & Favaro 2016): the tile is cut
    into G×G patches and patch k is moved to slot (5k + idx) mod G²,
    a per-image bijection keyed by the image index, so every image gets
    a different but deterministic shuffle.  The position-weighted
    checksum of the reassembled tile pins each patch's landing slot and
    interior orientation; n_moved counts slots whose content changed.

    Scale shape: map-only fused mapInPandas, one stacked decode per
    (w,h,fmt) group, G² vectorized block copies across the whole batch;
    pixels never shuffle.  All int64-exact."""
    from . import georegister as geo

    g = JIGSAW_G
    slim = tiles.select("image_id", geo.image_idx().alias("idx"), "bytes", "w", "h", "fmt")

    def _census(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        g2 = g * g
        for pdf in batches:
            ids, cks, mvd = [], [], []
            groups: dict[tuple, list[int]] = {}
            for i in range(len(pdf)):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), rows in groups.items():
                p = w // g
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in rows), dtype=dt[fmt]
                    )
                    .reshape(len(rows), h, w)
                    .astype(np.int64)
                )
                idxs = np.array([int(pdf["idx"].iat[i]) for i in rows], dtype=np.int64)
                out = np.empty_like(z)
                # slot q receives patch k = 13*(q - idx) mod 16 (13 = 5^-1 mod 16)
                for q in range(g2):
                    k = (13 * (q - idxs)) % g2  # per-image source patch
                    qi, qj = (q // g) * p, (q % g) * p
                    ki, kj = (k // g) * p, (k % g) * p
                    out[np.arange(len(rows)), qi : qi + p, qj : qj + p] = z[
                        np.arange(len(rows))[:, None, None],
                        ki[:, None, None] + np.arange(p)[None, :, None],
                        kj[:, None, None] + np.arange(p)[None, None, :],
                    ]
                pw = (np.arange(h * w, dtype=np.int64) + 1).reshape(h, w)
                ck = np.einsum("nij,ij->n", out, pw)
                n_moved = np.array(
                    [int(np.sum((13 * (np.arange(g2) - ix)) % g2 != np.arange(g2))) for ix in idxs],
                    dtype=np.int64,
                )
                ids.extend(pdf["image_id"].iat[i] for i in rows)
                cks.extend(ck.tolist())
                mvd.extend(n_moved.tolist())
            yield pd.DataFrame({"image_id": ids, "checksum": cks, "n_moved": mvd})

    schema = "image_id string, checksum long, n_moved long"
    return slim.mapInPandas(_census, schema=schema)


def chroma_subsample_stats(tiles: DataFrame) -> DataFrame:
    """4:2:0-style chroma-subsampling error census — each 2×2 block is
    replaced by its floor mean (the codec's chroma plane), re-expanded
    by nearest-neighbour, and the per-pixel absolute reconstruction
    error is reduced to (sum, max, position-weighted checksum).  This is
    the bandwidth/quality trade every lossy image codec makes; the
    census quantifies it corpus-wide so a curation pipeline can gate on
    it (reference analog: PSNR-style write verification, SURVEY §2.1 R6).

    All int64-exact (floor-mean and |diff| stay integral).  Map-only
    fused mapInPandas; one decode, no shuffle."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _census(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            ids, se, me, ck = [], [], [], []
            groups: dict[tuple, list[int]] = {}
            for i in range(len(pdf)):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), rows in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in rows), dtype=dt[fmt]
                    )
                    .reshape(len(rows), h, w)
                    .astype(np.int64)
                )
                blocks = (
                    z.reshape(len(rows), h // 2, 2, w // 2, 2).sum(axis=(2, 4)) // 4
                )
                up = np.repeat(np.repeat(blocks, 2, axis=1), 2, axis=2)
                err = np.abs(z - up)
                pw = (np.arange(h * w, dtype=np.int64) + 1).reshape(h, w)
                ids.extend(pdf["image_id"].iat[i] for i in rows)
                se.extend(err.sum(axis=(1, 2)).tolist())
                me.extend(err.max(axis=(1, 2)).tolist())
                ck.extend(np.einsum("nij,ij->n", err, pw).tolist())
            yield pd.DataFrame(
                {"image_id": ids, "err_sum": se, "err_max": me, "err_checksum": ck}
            )

    schema = "image_id string, err_sum long, err_max long, err_checksum long"
    return slim.mapInPandas(_census, schema=schema)


RA_OPS = 4  # identity / posterize-3bit / solarize-128 / invert


def randaugment_census(tiles: DataFrame) -> DataFrame:
    """RandAugment-style photometric op census (Cubuk et al. 2020) —
    the integer-exact subset of the RandAugment policy space applied to
    every sampled tile, each op pinned by value-sum and
    position-weighted checksum:

      op 0  identity     v
      op 1  posterize    v & 224   (keep top 3 bits)
      op 2  solarize     v >= 128 ? 255 - v : v
      op 3  invert       255 - v

    These are the exactly-reproducible members of the augmentation
    policy (rotate/shear interpolate and are covered by the float-free
    d4_checksums instead).  Map-only fused mapInPandas; one decode per
    (w,h,fmt) group, pixels never shuffle.  All int64-exact."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _census(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            ids, ops, sums, cks = [], [], [], []
            groups: dict[tuple, list[int]] = {}
            for i in range(len(pdf)):
                key = (int(pdf["w"].iat[i]), int(pdf["h"].iat[i]), pdf["fmt"].iat[i])
                groups.setdefault(key, []).append(i)
            for (w, h, fmt), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[i] for i in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)
                    .astype(np.int64)
                )
                pw = (np.arange(h * w, dtype=np.int64) + 1).reshape(h, w)
                variants = [
                    z,
                    z & 224,
                    np.where(z >= 128, 255 - z, z),
                    255 - z,
                ]
                for op, v in enumerate(variants):
                    ids.extend(pdf["image_id"].iat[i] for i in idx)
                    ops.extend([op] * len(idx))
                    sums.extend(v.sum(axis=(1, 2)).tolist())
                    cks.extend(np.einsum("nij,ij->n", v, pw).tolist())
            yield pd.DataFrame(
                {"image_id": ids, "op": ops, "v_sum": sums, "checksum": cks}
            )

    schema = "image_id string, op int, v_sum long, checksum long"
    return slim.mapInPandas(_census, schema=schema)


JOIN_COUNT_THRESH = 128


def join_count_stats(tiles: DataFrame) -> DataFrame:
    """Cliff-Ord binary join-count statistics over the ingest lattice —
    the categorical sibling of Moran's I (moran_lattice_moments): each
    tile is colored Black iff its integer floor-mean pixel value is
    >= JOIN_COUNT_THRESH, adjacency is rook on the pre-jitter lattice
    (gx = idx % GRID_W, gy = idx // GRID_W), and the statistic is the
    exact undirected count of BB / BW / WW joins plus the margins
    (n_tiles, n_black, w_pairs) that parameterize the free-sampling
    null — the surface from which the z-scores of esda.Join_Counts
    derive as pure functions.

    Scale shape: identical to the Moran family — ONE fused Arrow pass
    computes the tile floor-mean, each site explodes into five slim
    (b, grid-key) rows, and a single groupBy on the grid key recovers
    per-site (b, k_nb, nb_black).  Directed counts fold per-site:
    BB = Σ b·nb_black, WW = Σ (1-b)·(k_nb - nb_black), BW = the rest;
    every count is even (joins are symmetric), so the undirected
    statistic is the exact half.  No pair join, no pixel shuffle."""
    from ..constants import GRID_W
    from ..functions.codecs import pixel_mean
    from .georegister import image_idx

    idx = image_idx()
    gx = (idx % GRID_W).cast("long")
    gy = F.floor(idx / GRID_W).cast("long")
    b = (
        F.floor(pixel_mean(F.col("bytes"), F.col("w"), F.col("h"), F.col("fmt")))
        >= JOIN_COUNT_THRESH
    ).cast("long")

    def _p(tag: int, x, y):
        return F.struct(F.lit(tag).alias("tag"), x.alias("gx"), y.alias("gy"))

    ex = tiles.select(
        b.alias("b"),
        F.explode(
            F.array(
                _p(0, gx, gy),
                _p(1, gx + 1, gy),
                _p(1, gx - 1, gy),
                _p(1, gx, gy + 1),
                _p(1, gx, gy - 1),
            )
        ).alias("p"),
    ).select("b", "p.tag", "p.gx", "p.gy")

    site = (
        ex.groupBy("gx", "gy")
        .agg(
            F.max(F.when(F.col("tag") == 0, F.col("b"))).alias("b"),
            F.sum(F.when(F.col("tag") == 1, 1).otherwise(0)).alias("k_all"),
            F.sum(F.when(F.col("tag") == 1, F.col("b")).otherwise(0)).alias(
                "nb_black_all"
            ),
        )
        # cells with no site row are phantom neighbours; drop them, and
        # k_all/nb_black_all already count only probes from real tiles
        .where(F.col("b").isNotNull())
    )
    # k_all counts probes ARRIVING here from real neighbours == number of
    # existing rook neighbours (the lattice is symmetric), so no second
    # existence join is needed.
    bb_dir = F.sum(F.col("b") * F.col("nb_black_all"))
    ww_dir = F.sum((1 - F.col("b")) * (F.col("k_all") - F.col("nb_black_all")))
    return site.agg(
        F.count("*").alias("n_tiles"),
        F.sum("b").alias("n_black"),
        (F.sum("k_all") / 2).cast("long").alias("w_pairs"),
        (bb_dir / 2).cast("long").alias("bb"),
        (ww_dir / 2).cast("long").alias("ww"),
        ((F.sum("k_all") - bb_dir - ww_dir) / 2).cast("long").alias("bw"),
    )


def projection_profiles(tiles: DataFrame) -> DataFrame:
    """Integer projection profiles at the four lattice angles — the
    discrete Radon signature (row sums 0°, column sums 90°, diagonal
    i+j 45°, antidiagonal i−j 135°) that document-deskew and
    coarse-alignment pipelines correlate instead of running a full
    Radon transform: per tile and angle, the exact bin count, total
    mass, the maximum bin, and the position-weighted profile checksum
    Σ bin_value·(bin_index+1).

    Scale shape: map-only fused Arrow pass — all four profiles are
    vectorized reductions of the same decoded batch (sum over axes /
    np.bincount on i±j), 4 slim rows out per tile; pixels cross the
    Arrow boundary once and never shuffle."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")
    dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}

    def gen(batches):
        for pdf in batches:
            ids, angs, nb, tot, mx, cks = [], [], [], [], [], []
            groups: dict[tuple, list[int]] = {}
            for r in range(len(pdf)):
                key = (int(pdf["w"].iat[r]), int(pdf["h"].iat[r]), pdf["fmt"].iat[r])
                groups.setdefault(key, []).append(r)
            for (w, h, fmt), idx in groups.items():
                z = (
                    np.frombuffer(
                        b"".join(pdf["bytes"].iat[r] for r in idx), dtype=dt[fmt]
                    )
                    .reshape(len(idx), h, w)
                    .astype(np.int64)
                )
                ii, jj = np.meshgrid(
                    np.arange(h, dtype=np.int64),
                    np.arange(w, dtype=np.int64),
                    indexing="ij",
                )
                d_idx = (ii + jj).ravel()
                a_idx = (ii - jj + w - 1).ravel()
                zf = z.reshape(len(idx), -1)
                profs = {
                    "row": z.sum(axis=2),
                    "col": z.sum(axis=1),
                    "diag": np.stack(
                        [np.bincount(d_idx, zr, minlength=h + w - 1) for zr in zf]
                    ).astype(np.int64),
                    "adiag": np.stack(
                        [np.bincount(a_idx, zr, minlength=h + w - 1) for zr in zf]
                    ).astype(np.int64),
                }
                for ang, p in profs.items():
                    b, m = p.shape
                    t = np.arange(1, m + 1, dtype=np.int64)
                    ids.extend(pdf["image_id"].iat[r] for r in idx)
                    angs.extend([ang] * b)
                    nb.extend([m] * b)
                    tot.extend(p.sum(axis=1).tolist())
                    mx.extend(p.max(axis=1).tolist())
                    cks.extend((p * t).sum(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "angle": angs,
                    "n_bins": np.asarray(nb, dtype=np.int64),
                    "mass": np.asarray(tot, dtype=np.int64),
                    "max_bin": np.asarray(mx, dtype=np.int64),
                    "checksum": np.asarray(cks, dtype=np.int64),
                }
            )

    schema = (
        "image_id string, angle string, n_bins long, mass long, "
        "max_bin long, checksum long"
    )
    return slim.mapInPandas(gen, schema=schema)


def clip_histogram(hist: DataFrame, denom: int = 128) -> DataFrame:
    """Contrast-limited (CLAHE-style, Zuiderveld 1994) histogram clip
    with EXACT integer redistribution: per fmt the clip limit is
    ``C = total DIV denom`` (denom=128 -> 2x the uniform 256-bin
    share), every bin count is capped at C, and the clipped excess is
    returned to the occupied bins uniformly — ``base = excess DIV n``
    to every bin plus one extra unit to the first ``excess MOD n``
    bins in bin order (the deterministic remainder rule; float CLAHE
    implementations redistribute iteratively and never agree
    bit-for-bit — this one does).

    Window math over the <=256-row-per-fmt histogram; composes with
    equalization_lut() so the clipped corpus equalizes exactly."""
    w_tot = Window.partitionBy("fmt")
    w_ord = Window.partitionBy("fmt").orderBy("bin")
    c = (
        hist.withColumn("total", F.sum("cnt").over(w_tot))
        .withColumn("clip", F.expr(f"total DIV {denom}"))
        .withColumn("capped", F.least(F.col("cnt"), F.col("clip")))
    )
    c = (
        c.withColumn("excess", F.sum(F.col("cnt") - F.col("capped")).over(w_tot))
        .withColumn("n_bins", F.count(F.lit(1)).over(w_tot))
        .withColumn("rk", F.row_number().over(w_ord))
    )
    out_cnt = (
        F.col("capped")
        + F.expr("excess DIV n_bins")
        + F.when(F.col("rk") <= F.col("excess") % F.col("n_bins"), 1).otherwise(0)
    )
    return c.select("fmt", "bin", out_cnt.cast("long").alias("cnt"))
