"""Deterministic sampling for corpus curation (SURVEY §2.2b tier).

A 10^12-row training-data pipeline samples constantly — heldout splits,
per-language rebalancing, ablation subsets — and at that scale the
sample must be (a) reproducible bit-for-bit across runs/cluster sizes
and (b) computable map-only from the row itself, never via a global
pass.  Spark's ``df.sample()`` fails (a): it seeds per-partition, so
the selected set changes with partitioning.  The standard fix is
content-hash bucketing: a row is in the p‰ sample iff
``h40(key) % 1000 < p`` with h40 the 40-bit md5 prefix already used by
doc_fingerprint (operators/textops.py) — uniform, deterministic, and
identically computable in DuckDB, so the oracle re-derives the exact
membership set.

Stratified variant: per-stratum rates via a tiny literal CASE/map
lookup (broadcast-free — the rate table is an expression, not a join).
Everything here is a map-only filter: no shuffle, no sort, no state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable per-row bucket in [0, 1000): 40-bit md5 prefix mod 1000.
    `salt` derives independent samples from the same keys (heldout vs
    train splits must not correlate)."""
    s = F.concat(key.cast("string"), F.lit(":" + salt)) if salt else key.cast("string")
    return (F.conv(F.substring(F.md5(s), 1, 10), 16, 10).cast("long") % _BUCKETS)


def hash_sample(df: DataFrame, key: str, per_mille: int, salt: str = "") -> DataFrame:
    """Uniform deterministic p-per-mille sample."""
    return df.where(hash_bucket(F.col(key), salt) < per_mille)


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates: dict[str, int],
    default_per_mille: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sample: stratum s keeps rates[s]‰ of its
    rows (unlisted strata keep `default_per_mille`)."""
    rate = F.lit(default_per_mille)
    for s, p in sorted(rates.items()):
        rate = F.when(F.col(strata) == s, F.lit(p)).otherwise(rate)
    return df.where(hash_bucket(F.col(key), salt) < rate)


def _sql_bucket(key: str, salt: str = "") -> str:
    s = f"CAST({key} AS VARCHAR)" + (f" || ':{salt}'" if salt else "")
    return f"(CAST('0x' || substring(md5({s}), 1, 10) AS BIGINT) % {_BUCKETS})"


def sample_sql_where(key: str, strata: str, rates: dict[str, int],
                     default_per_mille: int = 0, salt: str = "") -> str:
    """DuckDB twin of stratified_sample's predicate."""
    case = " ".join(f"WHEN {strata} = '{s}' THEN {p}" for s, p in sorted(rates.items()))
    return f"{_sql_bucket(key, salt)} < (CASE {case} ELSE {default_per_mille} END)"
