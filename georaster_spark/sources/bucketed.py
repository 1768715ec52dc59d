"""Bucketed tile tables — shuffle-free co-located cell joins.

At 100 TB the dominant cost of every cell-keyed join (E4 tile
assignment, E5 zone pairing, extent intersection, kNN rings) is the
shuffle of the probe side.  Pre-bucketing the tiles table BY cell_id at
write time moves that shuffle to ingest, once: two tables bucketed on
the same key with the same bucket count sort-merge-join with NO
Exchange on either side (Spark plans a per-bucket zip join), so a
steady-state pipeline that joins the same tiles table many times pays
zero repeated shuffles.

This is the parquet analog of Iceberg's `bucket(N, cell_id)` partition
transform — on a real cluster the icelite swap-in (sources/icelite.py
header) carries the same property via the table format.  Bucket count
should divide evenly into executor cores at the target scale and bound
per-bucket bytes under executor memory (SURVEY §3 sizing note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    n_buckets: int,
    key: str = "cell_id",
) -> None:
    """Write `df` as an external parquet table bucketed + sorted by
    `key`.  The sortBy makes each bucket file merge-join-ready without a
    per-task sort on read."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table WITH its bucket spec (must go through the
    catalog — `spark.read.parquet(path)` would forget the bucketing and
    reintroduce the shuffle)."""
    return spark.table(name)


def write_cell_partitioned(
    df: DataFrame,
    path: str,
    r_from: int,
    r_part: int = 6,
) -> None:
    """Directory-partitioned spatial layout: tiles written under
    `p_cell=<coarse cell>/` where p_cell is the res-`r_part` parent of
    each tile's anchor cell.  A spatial box query that constrains
    p_cell (the coarse cover of the box) then PRUNES whole directories
    at planning time — `PartitionFilters` in the scan node, zero I/O
    for non-matching regions.  This is the listing-level complement to
    bucketing: buckets kill the join shuffle, partitions kill the scan.
    (Iceberg analog: `truncate`/custom transform partition spec;
    res-6 = 4096 dirs max, bounded listing.)  Rows are clustered by
    p_cell before the write for one file per (task, partition-dir)."""
    from pyspark.sql import functions as F

    from ..functions.cells import cell_parent_chain

    part = df.withColumn("p_cell", cell_parent_chain(F.col("cell_id"), r_from, r_part))
    part.repartition(F.col("p_cell")).write.partitionBy("p_cell").mode(
        "overwrite"
    ).parquet(path)
