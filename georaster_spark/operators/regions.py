"""Raster region labeling — connected components of a threshold mask
per tile (the `gdal_sieve` / `gdal.ConnectedComponents` analog a
georaster user reaches for after thresholding ``self.r``; upstream
georaster only exposes the raw array — `georaster/georaster.py ::
SingleBandRaster.r` ≈L600-780 ⚠ UNVERIFIED, SURVEY §0).

Semantics: foreground = pixel value >= threshold; components are
4-connected within the tile.  Every emitted surface is integer-exact and
content-derived (labels are the component's minimum linear pixel index),
so the DuckDB oracle can re-derive them with a recursive-CTE transitive
closure over the ramp-formula pixel graph — the same min-label idiom as
operators/graph.connected_components, evaluated at pixel granularity.

Algorithm: classic two-pass RUN-based union-find.  Run extraction is
whole-block vectorized NumPy (one np.diff over the padded mask of the
entire (n, h, w) batch); the union-find itself loops over RUNS, not
pixels — O(runs * alpha), and runs <= fg_pixels/1 but typically ~h per
tile, so the Python loop is over a quantity ~w times smaller than the
payload.  This is the scalable labeling scheme: per-tile work is linear
in runs, independent of component diameter (an iterative min-propagation
over pixel neighborhoods would need O(diameter) full-array passes —
worst case h*w/2 for serpentine components).

Scale shape: map-only fused mapInPandas — no shuffle, no join; pixels
cross Arrow once; output is 5 slim columns per tile.  Cross-tile region
merging (a global sieve) would compose exactly like algebra.focal_mosaic:
ship 1-px edge strips keyed to neighbors and union components whose runs
touch across the seam — the strip exchange is the same ~2%-of-payload
shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DEFAULT_THRESHOLD = 128

_REGION_SCHEMA = (
    "image_id string, n_fg long, n_regions long, max_region long, "
    "region_checksum long"
)


def _label_tile(mask: np.ndarray, w: int) -> tuple[int, int, int, int]:
    """Union-find over row runs of one boolean mask.  Returns
    (n_fg, n_regions, max_region, checksum) with checksum =
    sum over regions of (min_linear_index + 1) * size."""
    h = mask.shape[0]
    pad = np.zeros((h, w + 2), dtype=np.int8)
    pad[:, 1:-1] = mask
    d = np.diff(pad, axis=1)
    sr, sc = np.nonzero(d == 1)   # run starts (row, col)
    er, ec = np.nonzero(d == -1)  # run ends (exclusive col), same order
    nruns = len(sr)
    if nruns == 0:
        return 0, 0, 0, 0
    parent = list(range(nruns))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    row_start = np.searchsorted(sr, np.arange(h + 1))
    for r in range(1, h):
        a, b = row_start[r - 1], row_start[r]
        c, e = row_start[r], row_start[r + 1]
        i, j = a, c
        while i < b and j < e:
            # overlap of [sc[i], ec[i]) and [sc[j], ec[j]) => 4-adjacency
            if sc[i] < ec[j] and sc[j] < ec[i]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
            if ec[i] <= ec[j]:
                i += 1
            else:
                j += 1
    sizes = (ec - sc).astype(np.int64)
    first = sr.astype(np.int64) * w + sc.astype(np.int64)
    comp_size: dict[int, int] = {}
    comp_min: dict[int, int] = {}
    for k in range(nruns):
        root = find(k)
        comp_size[root] = comp_size.get(root, 0) + int(sizes[k])
        m = comp_min.get(root)
        if m is None or first[k] < m:
            comp_min[root] = int(first[k])
    n_fg = int(sizes.sum())
    checksum = sum((comp_min[r] + 1) * s for r, s in comp_size.items())
    return n_fg, len(comp_size), max(comp_size.values()), checksum


def region_stats(
    tiles: DataFrame, threshold: int = DEFAULT_THRESHOLD
) -> DataFrame:
    """Per-tile connected-component statistics of the mask
    ``pixel >= threshold`` (4-connectivity): n_fg, n_regions,
    max_region, region_checksum — all integer-exact."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _regions(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": pdf["image_id"].to_numpy(dtype=object),
                "n_fg": np.zeros(n, dtype=np.int64),
                "n_regions": np.zeros(n, dtype=np.int64),
                "max_region": np.zeros(n, dtype=np.int64),
                "region_checksum": np.zeros(n, dtype=np.int64),
            }
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (int(pdf["w"].iat[k]), int(pdf["h"].iat[k]), pdf["fmt"].iat[k])
                groups.setdefault(key, []).append(k)
            for (w, h, fmt), idx in groups.items():
                blk = np.frombuffer(
                    b"".join(pdf["bytes"].iat[k] for k in idx), dtype=dt[fmt]
                ).reshape(len(idx), h, w)
                masks = blk >= threshold
                for pos, k in enumerate(idx):
                    (
                        out["n_fg"][k],
                        out["n_regions"][k],
                        out["max_region"][k],
                        out["region_checksum"][k],
                    ) = _label_tile(masks[pos], w)
            yield pd.DataFrame(out)

    return slim.mapInPandas(_regions, schema=_REGION_SCHEMA)
