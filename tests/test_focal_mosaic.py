"""Halo-exchange focal over a tiled mosaic (operators/algebra.focal_mosaic).

The decisive property: per-tile results with 1-px halo strips must be
bit-identical to evaluating the focal window on the WHOLE mosaic as one
array — i.e., tile seams are invisible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from georaster_spark import oracle
from georaster_spark.operators import algebra

NTX, NTY, TW = 3, 2, 8


def _mosaic_df(spark):
    rows = []
    for ty in range(NTY):
        for tx in range(NTX):
            tid = ty * NTX + tx
            arr = oracle.ramp_tile(7 * tid + 3, TW, TW)
            rows.append((tid, arr.tobytes(), TW, TW, "raw"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["tile_id", "bytes", "w", "h", "fmt"])
    ), rows


def _global_reference(rows):
    GH, GW = NTY * TW, NTX * TW
    M = np.zeros((GH, GW), dtype=np.int64)
    for tid, data, w, h, _ in rows:
        ty, tx = tid // NTX, tid % NTX
        M[ty * TW : (ty + 1) * TW, tx * TW : (tx + 1) * TW] = np.frombuffer(
            data, dtype=np.uint8
        ).reshape(h, w)
    box = sum(
        M[1 + di : GH - 1 + di, 1 + dj : GW - 1 + dj]
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    )
    grad = np.abs(M[1:-1, 2:] - M[1:-1, :-2]) + np.abs(M[2:, 1:-1] - M[:-2, 1:-1])
    # pad back to global coords for easy per-tile slicing
    boxg = np.zeros((GH, GW), dtype=np.int64)
    gradg = np.zeros((GH, GW), dtype=np.int64)
    boxg[1:-1, 1:-1] = box
    gradg[1:-1, 1:-1] = grad
    want = {}
    wt = np.arange(GH, dtype=np.int64)[:, None] * GW + np.arange(GW)[None, :] + 1
    inter = np.zeros((GH, GW), dtype=bool)
    inter[1:-1, 1:-1] = True
    for tid, *_ in rows:
        ty, tx = tid // NTX, tid % NTX
        sl = (slice(ty * TW, (ty + 1) * TW), slice(tx * TW, (tx + 1) * TW))
        m = inter[sl]
        want[tid] = (
            int(m.sum()),
            int((boxg[sl] * wt[sl] * m).sum()),
            int((gradg[sl] * m).sum()),
            int(gradg[sl][m].max()) if m.any() else 0,
        )
    return want


def test_focal_mosaic_matches_single_array(spark):
    df, rows = _mosaic_df(spark)
    want = _global_reference(rows)
    got = {
        r["tile_id"]: (
            r["n_interior"], r["focal_checksum"], r["grad_l1_sum"], r["grad_max"]
        )
        for r in algebra.focal_mosaic(df, NTX, NTY).collect()
    }
    assert got == want


def test_focal_mosaic_seams_need_halo(spark):
    """Sanity that the test is non-vacuous: zeroing the halo (i.e., a
    per-tile evaluation) would change seam results."""
    df, rows = _mosaic_df(spark)
    want = _global_reference(rows)
    # per-tile interior-only focal over the same payloads
    per_tile = {
        int(r["image_id"]): r["focal_checksum"]
        for r in algebra.focal_stats(
            df.withColumnRenamed("tile_id", "image_id").selectExpr(
                "CAST(image_id AS STRING) AS image_id", "bytes", "w", "h", "fmt"
            )
        ).collect()
    }
    assert any(per_tile[tid] != want[tid][1] for tid, *_ in rows)
