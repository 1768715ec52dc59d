"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in the ``georaster_spark`` package (SURVEY.md);
this module only adapts it to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.4): per zone, number of images whose
    centroid lies in the zone + mean of their mean-pixel value, on the
    deterministic sf0.001 images/zones fixtures."""
    from georaster_spark.plans.pipeline import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from georaster_spark.plans import contract

    return dict(contract.spatial_queries())


def oracle_sql() -> dict[str, str]:
    from georaster_spark.plans import contract

    return dict(contract.spatial_oracles("sf0.01"))
