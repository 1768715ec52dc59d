"""Windowed distance transform with R-px halo exchange
(operators/algebra.proximity_mosaic).

Decisive property: per-tile d^2 with R-px halo strips must be
bit-identical to evaluating the windowed proximity on the WHOLE mosaic
as one array — seams invisible even when the nearest feature sits R
pixels across a tile corner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from georaster_spark import oracle
from georaster_spark.operators import algebra

NTX, NTY, TW = 3, 2, 12
R, T = 4, 250


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
    feat = M >= T
    sent = 2 * R * R + 1
    d2 = np.full((GH, GW), sent, dtype=np.int64)
    fi, fj = np.nonzero(feat)
    for i in range(GH):
        for j in range(GW):
            m = (np.abs(fi - i) <= R) & (np.abs(fj - j) <= R)
            if m.any():
                d2[i, j] = int(((fi[m] - i) ** 2 + (fj[m] - j) ** 2).min())
    wt = np.arange(GH, dtype=np.int64)[:, None] * GW + np.arange(GW)[None, :] + 1
    want = {}
    for tid, *_ in rows:
        ty, tx = tid // NTX, tid % NTX
        sl = (slice(ty * TW, (ty + 1) * TW), slice(tx * TW, (tx + 1) * TW))
        reached = d2[sl] < sent
        want[tid] = (
            int(feat[sl].sum()),
            int(reached.sum()),
            int(d2[sl][reached].sum()),
            int((d2[sl] * wt[sl]).sum()),
        )
    return want


def test_proximity_mosaic_matches_single_array(spark):
    df, rows = _mosaic_df(spark)
    want = _global_reference(rows)
    got = {
        r["tile_id"]: (r["n_feat"], r["n_reached"], r["sum_d2"], r["d2_checksum"])
        for r in algebra.proximity_mosaic(df, NTX, NTY, radius=R, threshold=T).collect()
    }
    assert got == want


def test_proximity_needs_halo(spark):
    """Non-vacuity: at least one tile's nearest feature lies across a
    seam — zeroing the halo (features only from the tile itself) would
    change its d^2 surface."""
    df, rows = _mosaic_df(spark)
    want = _global_reference(rows)
    changed = 0
    sent = 2 * R * R + 1
    for tid, data, w, h, _ in rows:
        arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w).astype(np.int64)
        feat = arr >= T
        d2 = np.full((h, w), sent, dtype=np.int64)
        fi, fj = np.nonzero(feat)
        for i in range(h):
            for j in range(w):
                m = (np.abs(fi - i) <= R) & (np.abs(fj - j) <= R)
                if m.any():
                    d2[i, j] = int(((fi[m] - i) ** 2 + (fj[m] - j) ** 2).min())
        ty, tx = tid // NTX, tid % NTX
        GW = NTX * TW
        gi = ty * TW + np.arange(h, dtype=np.int64)[:, None]
        gj = tx * TW + np.arange(w, dtype=np.int64)[None, :]
        if int((d2 * (gi * GW + gj + 1)).sum()) != want[tid][3]:
            changed += 1
    assert changed > 0


def test_proximity_threshold_guard(spark):
    df, _ = _mosaic_df(spark)
    with pytest.raises(ValueError):
        algebra.proximity_mosaic(df, NTX, NTY, threshold=0)
