"""Deterministic spatial fixture generator (FIXTURES.md).

Writes parquet tables under ``<repo>/fixtures/sf{X}/``:

* ``images``  — the authoritative input shape (BASELINE.json.input_hint):
  (image_id string, bytes binary, w int, h int, fmt string,
   caption string, phash long).  Geo columns are NOT stored — they are
  derived by ingest op E1 (operators/georegister.py), and re-derived
  independently by the DuckDB oracle from idx arithmetic.
* ``zones``   — vector rings for PIP / kNN / zonal (convex, closed, CCW).
* ``points``  — query points for value_at_coords / interp / kNN.
* ``landsat`` — the single reference-parity tile (FIXTURES.md §4), the
  stand-in for upstream's golden Landsat-7 crop
  (georaster test/test_georaster.py ⚠ — reference dir empty, SURVEY §0).

Both Spark (engine) and DuckDB (oracle) read these same files, so no
cross-engine RNG reproduction is ever needed; everything that must be
re-derivable across engines is pure integer arithmetic in ``idx``.
"""

from __future__ import annotations

import math
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import oracle
from ..constants import DEFAULT_RES

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
if not REPO_ROOT.is_dir():  # running from a --py-files zip: __file__ is inside it
    REPO_ROOT = Path.cwd()
FIXTURE_ROOT = Path(os.environ.get("SPARK_GRAFT_FIXTURES", REPO_ROOT / "fixtures"))

# sf -> (n_images, tile_w, n_zones, n_points)   (FIXTURES.md §5)
SCALES: dict[str, tuple[int, int, int, int]] = {
    "sf0.001": (1_000, 32, 16, 1_000),
    "sf0.01": (10_000, 32, 64, 10_000),
    "sf0.1": (100_000, 64, 256, 100_000),
    # scale-certification decade (VERDICT r3 item 2): 1M images; the
    # relational sf1 tables come from jobs/make_sf1.py (dist/sf1)
    "sf1": (1_000_000, 64, 1024, 1_000_000),
}

_NEAR_DUP_MASK = (1 << 5) | (1 << 17) | (1 << 41)  # 3 bits -> hamming 3 <= 4


def _scramble(idx: np.ndarray) -> np.ndarray:
    """splitmix64-ish scramble -> ~uniform positive 63-bit hash.  Uniform
    bits keep the LSH band keys balanced (operators/phash.py); a spatial
    prefix would collapse all tiles into a handful of bands."""
    h = idx.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(29)
    return (h >> np.uint64(1)).astype(np.int64)


def _phash(idx: np.ndarray) -> np.ndarray:
    """64-bit perceptual-hash stand-in: scrambled bits, with planted
    near-duplicate pairs (hamming 3 <= 4) for 1% of rows (idx%100==99
    pairs with idx-1)."""
    ph = _scramble(idx)
    dup = (idx % 100) == 99
    if dup.any():
        prev = np.where(dup, idx - 1, idx)
        ph = np.where(dup, _scramble(prev) ^ np.int64(_NEAR_DUP_MASK), ph)
    return ph


def _write_images(out: Path, n: int, w: int, chunk: int = 10_000) -> None:
    schema = pa.schema(
        [
            ("image_id", pa.string()),
            ("bytes", pa.binary()),
            ("w", pa.int32()),
            ("h", pa.int32()),
            ("fmt", pa.string()),
            ("caption", pa.string()),
            ("phash", pa.int64()),
        ]
    )
    writer = pq.ParquetWriter(out / "images.parquet", schema, compression="zstd")
    h = w
    i_ax = np.arange(h, dtype=np.int64)[None, :, None]
    j_ax = np.arange(w, dtype=np.int64)[None, None, :]
    for lo in range(0, n, chunk):
        idx = np.arange(lo, min(lo + chunk, n), dtype=np.int64)
        a, b, c = oracle.ramp_coeffs(idx)
        v = (a[:, None, None] * i_ax + b[:, None, None] * j_ax + c[:, None, None]) % 256
        v = v.astype(np.uint8)
        is_qnt = (idx % 10) == 3
        v[is_qnt] = oracle.quantize(v[is_qnt])
        geo = oracle.georegister(idx, np.full_like(idx, w))
        anchor = oracle.cell_encode(geo["gt_x0"], geo["gt_y0"], DEFAULT_RES)
        flat = v.reshape(len(idx), -1)
        batch = pa.record_batch(
            [
                pa.array([f"img{i:08d}" for i in idx]),
                pa.array([flat[k].tobytes() for k in range(len(idx))], type=pa.binary()),
                pa.array(np.full(len(idx), w, dtype=np.int32)),
                pa.array(np.full(len(idx), h, dtype=np.int32)),
                pa.array(np.where(is_qnt, "qnt", "raw")),
                pa.array([f"synthetic tile {i} over cell {cc}" for i, cc in zip(idx, anchor)]),
                pa.array(_phash(idx)),
            ],
            schema=schema,
        )
        # Small row groups (512 rows ~ 2 MB raw pixels): parquet scan
        # splits cannot subdivide a row group, so group count bounds the
        # whole engine's scan parallelism — 10k-row groups capped every
        # pixel pipeline at 10 concurrent tasks regardless of cores, and
        # 2048-row groups left the bench's 128x-amplified scan tasks so
        # coarse (49 tasks) that wave quantization alone cost ~20% at 16
        # cores.  A 100 TB table has thousands of files; this knob only
        # matters for the single-file sandbox fixtures.
        writer.write_batch(batch, row_group_size=512)
    writer.close()


def _zone_ring(z: int, cx: float, cy: float, hx: float, hy: float) -> tuple[str, list[tuple[float, float]]]:
    """Deterministic ring for zone z centered (cx, cy), half-extents hx, hy.
    Even z -> axis-aligned rect; odd z -> convex 5-8 vertex ring (points on
    an ellipse in increasing angle order are always convex).  CCW, closed."""
    if z % 2 == 0:
        pts = [(cx - hx, cy - hy), (cx + hx, cy - hy), (cx + hx, cy + hy), (cx - hx, cy + hy)]
    else:
        # vertices on an ELLIPSE (constant per-zone radii) at jitter-spaced
        # increasing angles: points on a convex curve in angle order are
        # guaranteed convex + CCW.  (Per-vertex radii would NOT be convex.)
        nv = 5 + z % 4
        rad = 0.6 + 0.4 * ((z * 11) % 10) / 10.0
        pts = []
        for i in range(nv):
            ang = 2.0 * math.pi * (i + 0.3 * ((z * 7 + i * 13) % 10) / 10.0) / nv
            pts.append((cx + hx * rad * math.cos(ang), cy + hy * rad * math.sin(ang)))
    pts.append(pts[0])
    return ("rect" if z % 2 == 0 else "convex", pts)


def _write_zones(out: Path, n_zones: int, n_images: int) -> None:
    rows_used = (n_images + 511) // 512
    dom_w = 512 * 1000.0
    dom_h = (rows_used + 2) * 1000.0
    zq = math.ceil(math.sqrt(n_zones))
    recs = []
    for z in range(n_zones):
        if z >= n_zones - 3:  # last 3 zones: rects around the hot anchors (skew!)
            ax, ay = oracle.HOT_ANCHORS[z - (n_zones - 3)]
            kind, ring = _zone_ring(0, ax + 550.0, ay - 450.0, 1500.0, 1500.0)
            kind = "rect"
        else:
            zx, zy = z % zq, z // zq
            cx = (zx + 0.5) * dom_w / zq
            cy = (zy + 0.5) * dom_h / zq
            kind, ring = _zone_ring(z, cx, cy, 0.45 * dom_w / zq, 0.45 * dom_h / zq)
        xs = [p[0] for p in ring]
        ys = [p[1] for p in ring]
        cx0 = sum(xs[:-1]) / (len(xs) - 1)
        cy0 = sum(ys[:-1]) / (len(ys) - 1)
        recs.append(
            {
                "zone_id": z,
                "kind": kind,
                "ring": [{"x": x, "y": y} for x, y in ring],
                "xmin": min(xs),
                "xmax": max(xs),
                "ymin": min(ys),
                "ymax": max(ys),
                "cx": cx0,
                "cy": cy0,
            }
        )
    schema = pa.schema(
        [
            ("zone_id", pa.int64()),
            ("kind", pa.string()),
            ("ring", pa.list_(pa.struct([("x", pa.float64()), ("y", pa.float64())]))),
            ("xmin", pa.float64()),
            ("xmax", pa.float64()),
            ("ymin", pa.float64()),
            ("ymax", pa.float64()),
            ("cx", pa.float64()),
            ("cy", pa.float64()),
        ]
    )
    pq.write_table(pa.Table.from_pylist(recs, schema=schema), out / "zones.parquet", compression="zstd")


def _write_points(out: Path, n_points: int, n_images: int, w: int) -> None:
    rng = np.random.default_rng(42)
    rows_used = (n_images + 511) // 512
    dom_w = 513 * 1000.0
    dom_h = (rows_used + 2) * 1000.0
    n_uni = int(n_points * 0.8)
    n_int = int(n_points * 0.15)
    n_edge = n_points - n_uni - n_int

    xs = [rng.uniform(0, dom_w, n_uni)]
    ys = [rng.uniform(0, dom_h, n_uni)]

    t = rng.integers(0, n_images, n_int)
    geo = oracle.georegister(t, np.full_like(t, w))
    xs.append(geo["gt_x0"] + (0.05 + 0.9 * rng.uniform(size=n_int)) * 1000.0)
    ys.append(geo["gt_y0"] - (0.05 + 0.9 * rng.uniform(size=n_int)) * 1000.0)

    t2 = rng.integers(0, n_images, n_edge)
    geo2 = oracle.georegister(t2, np.full_like(t2, w))
    pi = rng.integers(0, w, n_edge)
    pj = rng.integers(0, w, n_edge)
    on_edge = rng.uniform(size=n_edge) < 0.5  # half exactly on pixel corners
    off = np.where(on_edge, 0.0, 0.5)
    xs.append(geo2["gt_x0"] + (pj + off) * geo2["gt_xres"])
    ys.append(geo2["gt_y0"] - (pi + off) * geo2["gt_yres"])

    tbl = pa.table(
        {
            "point_id": pa.array(np.arange(n_points, dtype=np.int64)),
            "x": pa.array(np.concatenate(xs)),
            "y": pa.array(np.concatenate(ys)),
        }
    )
    pq.write_table(tbl, out / "points.parquet", compression="zstd")


def _write_landsat(out: Path) -> None:
    """FIXTURES.md §4 — hand-derivable parity tile (w=h=64, uint16 'raw16',
    gt=(500000, 30, 4200000, 30), v[i,j] = i*64+j)."""
    w = h = 64
    v = (np.arange(h, dtype=np.uint16)[:, None] * 64 + np.arange(w, dtype=np.uint16)[None, :])
    tbl = pa.table(
        {
            "image_id": pa.array(["landsat0"]),
            "bytes": pa.array([v.astype("<u2").tobytes()], type=pa.binary()),
            "w": pa.array([w], type=pa.int32()),
            "h": pa.array([h], type=pa.int32()),
            "fmt": pa.array(["raw16"]),
            "gt_x0": pa.array([500000.0]),
            "gt_y0": pa.array([4200000.0]),
            "gt_xres": pa.array([30.0]),
            "gt_yres": pa.array([30.0]),
            "crs": pa.array(["EPSG:32645"]),
            "nbands": pa.array([1], type=pa.int32()),
        }
    )
    pq.write_table(tbl, out / "landsat.parquet", compression="zstd")


def ensure_fixtures(sf: str) -> Path:
    """Generate (once, cached via _SUCCESS marker) and return the fixture dir."""
    if sf not in SCALES:
        raise ValueError(f"unknown scale factor {sf!r}; known: {sorted(SCALES)}")
    out = FIXTURE_ROOT / sf
    marker = out / "_SUCCESS"
    if marker.exists():
        return out
    out.mkdir(parents=True, exist_ok=True)
    n, w, nz, npts = SCALES[sf]
    _write_images(out, n, w)
    _write_zones(out, nz, n)
    _write_points(out, npts, n, w)
    _write_landsat(out)
    marker.write_text("ok\n")
    return out


def fixtures_for_sf_dir(sf_dir: str) -> Path:
    """Map a driver sf dir (/root/testdata/sf0.01) to our fixture dir."""
    return ensure_fixtures(Path(sf_dir).name)
