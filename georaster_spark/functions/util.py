"""Small shared plan helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ordered(df: DataFrame, *cols: str) -> DataFrame:
    """Total-order a SMALL result set without `orderBy`'s hidden cost.

    A global `orderBy` runs a RangePartitioner sampling job that
    re-executes the entire child plan when the child does not end in a
    reusable exchange (ours usually end in mapInPandas) — measured 2-3x
    wall time on the sampling operators.  Contract outputs are <= ~100k
    rows, so shuffle them to one partition (upstream parallelism intact
    — repartition is a real exchange, unlike coalesce) and sort there.
    """
    return df.repartition(1).sortWithinPartitions(*cols)
