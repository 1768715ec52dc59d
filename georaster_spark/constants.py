"""Engine-wide constants (normative — SURVEY.md §1.2).

The GQK cell index operates over a fixed planar engine domain
``[0, 2**26) x [0, 2**26)`` (units are planar "meters", CRS tag
'EPSG:3857'-planar for the synthetic fixtures).  All three
implementations of every spatial primitive — Spark Column math,
the NumPy oracle (georaster_spark.oracle) and the DuckDB oracle SQL
(__spark_entry__.oracle_sql) — must agree bit-for-bit on integer
outputs derived from these constants.
"""

# World domain for the GQK cell index (x right, y up; v-axis flips y).
DOMAIN: int = 1 << 26  # 67,108,864

# Maximum cell resolution (cells are DOMAIN / 2**r units wide at res r).
MAX_RES: int = 26

# Bit position where the resolution is packed into a cell id:
# cell_id = (r << RES_SHIFT) | (iy << r) | ix   (row-major packing).
RES_SHIFT: int = 58

# Default benchmark / ingest resolution: cell edge = 2**(26-13) = 8192 units.
DEFAULT_RES: int = 13

# ---------------------------------------------------------------------------
# Deterministic fixture-synthesis parameters (FIXTURES.md §1/§3).
# Georegistration (ingest op E1) derives geo columns from the integer image
# index with *only* the arithmetic below, so the DuckDB oracle can reproduce
# tile ids without any RNG / hash reproduction across engines.
# ---------------------------------------------------------------------------

# Grid width: gx = idx % GRID_W, gy = idx // GRID_W (independent of row count
# so the formula is identical at every scale factor).
GRID_W: int = 512

# Tile footprint in world units (gt_xres = TILE_SPAN / w — exact binary
# fractions for w in {32, 64}: 31.25 / 15.625).
TILE_SPAN: float = 1000.0

# Jitter: +/-50 units, decided by modular arithmetic on idx.
JITTER_MOD: int = 101
JITTER_HALF: int = 50
JITTER_AX: int = 37
JITTER_AY: int = 53

# Base offset keeping all coordinates strictly positive after jitter.
BASE_OFF: int = 100

# Hot-cell skew plant: every idx % HOT_EVERY == HOT_PHASE image is teleported
# into one of the HOT_ANCHORS (round-robin by idx // HOT_EVERY % 3).
HOT_EVERY: int = 20
HOT_PHASE: int = 7
HOT_ANCHORS: tuple[tuple[int, int], ...] = (
    (100_000, 200_000),
    (300_000, 150_000),
    (220_000, 90_000),
)

# Pixel ramp v[i, j] = (RAMP_A(idx)*i + RAMP_B(idx)*j + RAMP_C(idx)) % 256
# (see oracle.ramp_coeffs). 'qnt' codec quantizes to step 4 mid-tread.
QNT_STEP: int = 4
