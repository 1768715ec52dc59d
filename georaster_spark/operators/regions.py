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
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 128

_REGION_SCHEMA = (
    "image_id string, n_fg long, n_regions long, max_region long, "
    "region_checksum long"
)


def _label_image(mask: np.ndarray, w: int) -> np.ndarray:
    """Label one boolean mask by run-based union-find.  Returns an
    (h, w) int64 image: -1 on background, else the component label =
    the component's minimum linear pixel index (content-derived, so two
    independent evaluations agree without any tie-break protocol)."""
    h = mask.shape[0]
    pad = np.zeros((h, w + 2), dtype=np.int8)
    pad[:, 1:-1] = mask
    d = np.diff(pad, axis=1)
    sr, sc = np.nonzero(d == 1)   # run starts (row, col)
    er, ec = np.nonzero(d == -1)  # run ends (exclusive col), same order
    nruns = len(sr)
    lbl = np.full((h, w), -1, dtype=np.int64)
    if nruns == 0:
        return lbl
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
    first = sr.astype(np.int64) * w + sc.astype(np.int64)
    comp_min: dict[int, int] = {}
    for k in range(nruns):
        root = find(k)
        m = comp_min.get(root)
        if m is None or first[k] < m:
            comp_min[root] = int(first[k])
    for k in range(nruns):
        lbl[sr[k], sc[k] : ec[k]] = comp_min[find(k)]
    return lbl


def _label_tile(mask: np.ndarray, w: int) -> tuple[int, int, int, int]:
    """(n_fg, n_regions, max_region, checksum) of one mask, with
    checksum = sum over regions of (min_linear_index + 1) * size."""
    lbl = _label_image(mask, w)
    labels, sizes = np.unique(lbl[lbl >= 0], return_counts=True)
    if len(labels) == 0:
        return 0, 0, 0, 0
    return (
        int(sizes.sum()),
        len(labels),
        int(sizes.max()),
        int(((labels + 1) * sizes).sum()),
    )


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


_GEOM_SCHEMA = (
    "image_id string, label long, n_px long, imin long, imax long, "
    "jmin long, jmax long, perimeter long"
)


def region_geometry(
    tiles: DataFrame, threshold: int = DEFAULT_THRESHOLD
) -> DataFrame:
    """Polygonize-lite (gdal_polygonize analog — the raster->vector
    direction op A9 rasterizes): one row per connected region of the
    ``pixel >= threshold`` mask carrying the integer geometry a
    vectorizer consumes — pixel count, bbox, and exposed-boundary
    perimeter (= 4*size − 2*internal 4-adjacencies, the exact length of
    the region's rasterized outline incl. holes).  Labels are
    content-derived (min linear pixel index), so the emitted relation is
    deterministic under any partitioning and SQL-checkable.

    Map-only fused Arrow pass (one hop, no pixel shuffle); per-region
    reductions are vectorized ufunc.at scatters over the label image, so
    the Python loop is per-TILE, never per-pixel."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _geom(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        cols = ("image_id", "label", "n_px", "imin", "imax", "jmin", "jmax",
                "perimeter")
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for k in range(len(pdf)):
                w = int(pdf["w"].iat[k])
                h = int(pdf["h"].iat[k])
                arr = np.frombuffer(
                    pdf["bytes"].iat[k], dtype=dt[pdf["fmt"].iat[k]]
                ).reshape(h, w)
                lbl = _label_image(arr >= threshold, w)
                fg = lbl >= 0
                if not fg.any():
                    continue
                ri, ci = np.nonzero(fg)
                labs, inv, sizes = np.unique(
                    lbl[ri, ci], return_inverse=True, return_counts=True
                )
                m = len(labs)
                imin = np.full(m, h, dtype=np.int64)
                imax = np.full(m, -1, dtype=np.int64)
                jmin = np.full(m, w, dtype=np.int64)
                jmax = np.full(m, -1, dtype=np.int64)
                np.minimum.at(imin, inv, ri)
                np.maximum.at(imax, inv, ri)
                np.minimum.at(jmin, inv, ci)
                np.maximum.at(jmax, inv, ci)
                # internal 4-adjacencies per region (right + down pairs)
                adj = np.zeros(m, dtype=np.int64)
                hpair = fg[:, :-1] & (lbl[:, :-1] == lbl[:, 1:])
                vpair = fg[:-1, :] & (lbl[:-1, :] == lbl[1:, :])
                if hpair.any():
                    hl = np.searchsorted(labs, lbl[:, :-1][hpair])
                    np.add.at(adj, hl, 1)
                if vpair.any():
                    vl = np.searchsorted(labs, lbl[:-1, :][vpair])
                    np.add.at(adj, vl, 1)
                out["image_id"].extend([pdf["image_id"].iat[k]] * m)
                out["label"].extend(labs.tolist())
                out["n_px"].extend(sizes.tolist())
                out["imin"].extend(imin.tolist())
                out["imax"].extend(imax.tolist())
                out["jmin"].extend(jmin.tolist())
                out["jmax"].extend(jmax.tolist())
                out["perimeter"].extend((4 * sizes - 2 * adj).tolist())
            yield pd.DataFrame(out, columns=cols)

    return slim.mapInPandas(_geom, schema=_GEOM_SCHEMA)


MOSAIC_THRESHOLD = 230

_PART_SCHEMA = (
    "rtype int, seam_id long, side int, pos int, label long, size long"
)
_MOSAIC_CC_SCHEMA = "component long, n_px long, n_frags long"


def mosaic_region_components(
    mosaic: DataFrame,
    ntx: int,
    nty: int,
    threshold: int = MOSAIC_THRESHOLD,
) -> DataFrame:
    """DISTRIBUTED connected components over a tiled common-grid mosaic
    — the cross-tile sieve per-tile labeling can't express: a region
    crossing a tile seam must get ONE id, identical to labeling the
    mosaic as a single array.

    Two-level union-find, the classic distributed-CC shape:
      1. map-only pass per tile: run-based local labeling
         (_label_image), labels globalized to the component's minimum
         GLOBAL linear pixel index; emits per-fragment (label, size)
         rows plus 1-px SEAM LABEL STRIPS addressed to the 4-neighbor
         seams (~2% of payload, same halo idea as algebra.focal_mosaic
         but labels instead of pixels);
      2. seam strips pair up on (seam_id, pos) into a fragment-level
         edge list — |edges| is bounded by seam pixels, orders of
         magnitude smaller than the raster — and
         operators/graph.connected_components (min-label propagation,
         O(diameter) shuffles over fragment ids only) merges fragments
         into global components.

    Output per component: component (= min global pixel index — fully
    content-derived), n_px, n_frags (tile-local fragments merged).  The
    DuckDB oracle recomputes both levels with recursive-CTE closures
    over the global mosaic pixel graph, so a hash match proves seam
    merging is exact.

    Pixels cross Arrow once (pass 1); everything after is slim integer
    relations.  `parts` is evaluated once per consumer branch — in a
    persistent pipeline, checkpoint it (plans/checkpoint) between pass 1
    and the label-graph rounds."""
    from . import graph

    slim = mosaic.select("tile_id", "bytes", "w", "h", "fmt")

    def _emit(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            rows = {k: [] for k in ("rtype", "seam_id", "side", "pos", "label", "size")}

            def put(rtype, seam_id, side, pos, label, size):
                rows["rtype"].append(rtype)
                rows["seam_id"].append(int(seam_id))
                rows["side"].append(side)
                rows["pos"].append(int(pos))
                rows["label"].append(int(label))
                rows["size"].append(int(size))

            for t in pdf.itertuples(index=False):
                w, h = int(t.w), int(t.h)
                tid = int(t.tile_id)
                tx, ty = tid % ntx, tid // ntx
                GW = ntx * w
                arr = np.frombuffer(t.bytes, dtype=dt[t.fmt]).reshape(h, w)
                lbl = _label_image(arr >= threshold, w)
                # local label (min local linear idx) -> global pixel idx:
                # row-major order within a tile agrees with global
                # row-major order, so the conversion preserves "min".
                fg = lbl >= 0
                if fg.any():
                    li = lbl // w
                    lj = lbl % w
                    glbl = np.where(fg, (ty * h + li) * GW + (tx * w + lj), -1)
                else:
                    glbl = lbl
                labels, sizes = np.unique(glbl[fg], return_counts=True)
                for lab, sz in zip(labels, sizes):
                    put(0, -1, 0, 0, lab, sz)
                # seam strips (4-connectivity: E/W/N/S only)
                strips = (
                    # (emit when, seam_id, side, labels along the seam)
                    (tx < ntx - 1, 2 * tid, 0, glbl[:, w - 1]),
                    (tx > 0, 2 * (tid - 1), 1, glbl[:, 0]),
                    (ty < nty - 1, 2 * tid + 1, 0, glbl[h - 1, :]),
                    (ty > 0, 2 * (tid - ntx) + 1, 1, glbl[0, :]),
                )
                for ok, sid, side, vec in strips:
                    if not ok:
                        continue
                    for pos in np.nonzero(vec >= 0)[0]:
                        put(1, sid, side, pos, vec[pos], 0)
            yield pd.DataFrame(rows)

    parts = slim.mapInPandas(_emit, schema=_PART_SCHEMA)
    # Pass 1 feeds four consumers (fragments, both seam sides, the final
    # join) and the CC loop's jobs — localCheckpoint materializes the
    # slim label/strip relation ONCE on first use and truncates the
    # lineage so the upstream pixel pipeline (e.g. a warp) never re-runs.
    # Production twin: a reliable checkpoint (plans/checkpoint) between
    # pass 1 and the label-graph rounds.
    parts = parts.localCheckpoint(eager=False)
    frags = parts.where(F.col("rtype") == 0).select("label", "size")
    s0 = parts.where((F.col("rtype") == 1) & (F.col("side") == 0)).select(
        "seam_id", "pos", F.col("label").alias("a_id")
    )
    s1 = parts.where((F.col("rtype") == 1) & (F.col("side") == 1)).select(
        "seam_id", "pos", F.col("label").alias("b_id")
    )
    edges = s0.join(s1, ["seam_id", "pos"]).select("a_id", "b_id").distinct()
    comp = graph.connected_components(
        edges, frags.select("label"), vertex_col="label",
        src_col="a_id", dst_col="b_id",
    )
    return (
        frags.join(comp, "label")
        .groupBy("component")
        .agg(
            F.sum("size").alias("n_px"),
            F.count(F.lit(1)).alias("n_frags"),
        )
    )


PERC_THRESHOLDS = (128, 160, 192, 224)


def percolation_sweep(tiles: DataFrame) -> DataFrame:
    """Percolation threshold sweep (site-percolation census across
    occupancy levels — where does the giant cluster break up?): the
    v >= t mask is labeled at each threshold in PERC_THRESHOLDS and
    each level reports occupancy, component count, largest cluster and
    the content-derived region checksum — the cluster-size trajectory
    as the occupied fraction falls.

    Scale shape: map-only fused mapInPandas; the same decoded block is
    re-masked per threshold (decode once, label |T| times), zero
    shuffle."""
    slim = tiles.select("image_id", "bytes", "w", "h", "fmt")

    def _sweep(batches):
        dt = {"raw": np.uint8, "qnt": np.uint8, "raw16": "<u2"}
        for pdf in batches:
            n = len(pdf)
            out = {
                "image_id": [], "threshold": [], "n_fg": [], "n_regions": [],
                "max_region": [], "region_checksum": [],
            }
            groups: dict[tuple, list[int]] = {}
            for k in range(n):
                key = (int(pdf["w"].iat[k]), int(pdf["h"].iat[k]), pdf["fmt"].iat[k])
                groups.setdefault(key, []).append(k)
            for (w, h, fmt), idx in groups.items():
                blk = np.frombuffer(
                    b"".join(pdf["bytes"].iat[k] for k in idx), dtype=dt[fmt]
                ).reshape(len(idx), h, w)
                for t in PERC_THRESHOLDS:
                    masks = blk >= t
                    for pos, k in enumerate(idx):
                        nfg, nr, mx, ck = _label_tile(masks[pos], w)
                        out["image_id"].append(pdf["image_id"].iat[k])
                        out["threshold"].append(t)
                        out["n_fg"].append(nfg)
                        out["n_regions"].append(nr)
                        out["max_region"].append(mx)
                        out["region_checksum"].append(ck)
            yield pd.DataFrame(out)

    return slim.mapInPandas(
        _sweep,
        schema=(
            "image_id string, threshold long, n_fg long, n_regions long, "
            "max_region long, region_checksum long"
        ),
    )
