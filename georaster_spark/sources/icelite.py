"""icelite — minimal Iceberg-style snapshot emulation (SURVEY §7.5).

The production design targets an Iceberg catalog (the north rule's input
is "an Iceberg table of image + caption pairs"); this sandbox has no
Iceberg runtime jar and no network, so the two properties the engine
actually DEPENDS on are emulated over plain parquet:

  * snapshot pinning — a read resolves an immutable, named file list
    (so op E9's resume re-reads byte-identical input even if the table
    gains files between attempts);
  * schema-on-commit — each snapshot records the schema it was written
    with.

Layout (per table directory):

    <table>/data/part-*.parquet          the data files
    <table>/snapshots/v<N>.json          {version, parent, schema,
                                          files: [{path, rows}], ts}
    <table>/snapshots/CURRENT            text: latest version number

Commits are atomic via tmp+rename of the snapshot json, then CURRENT.
Swap-in note: on a real cluster replace write_snapshot/read_snapshot
with `df.writeTo(tbl).append()` / `spark.read.option("snapshot-id",
...).table(tbl)` — all call sites go through this module.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def _snapdir(table: str | Path) -> Path:
    return Path(table) / "snapshots"


def current_version(table: str | Path) -> int | None:
    cur = _snapdir(table) / "CURRENT"
    if not cur.exists():
        return None
    return int(cur.read_text().strip())


def snapshot_info(table: str | Path, version: int | None = None) -> dict:
    v = current_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots in {table}")
    return json.loads((_snapdir(table) / f"v{v}.json").read_text())


def write_snapshot(df: DataFrame, table: str | Path, mode: str = "append") -> int:
    """Write df's rows as new data files and commit a new snapshot whose
    file list = (parent files if append else []) + new files."""
    table = Path(table)
    data_dir = table / "data"
    data_dir.mkdir(parents=True, exist_ok=True)
    staging = table / f"_staging_{uuid.uuid4().hex[:12]}"
    df.write.mode("overwrite").parquet(str(staging))

    new_files = []
    for f in sorted(staging.glob("*.parquet")):
        dest = data_dir / f"{uuid.uuid4().hex[:12]}-{f.name}"
        os.rename(f, dest)
        new_files.append(str(dest.relative_to(table)))
    for leftover in staging.glob("*"):
        leftover.unlink()
    staging.rmdir()

    parent = current_version(table)
    files: list[str] = []
    if mode == "append" and parent is not None:
        files = [f["path"] for f in snapshot_info(table, parent)["files"]]
    files += new_files

    version = 0 if parent is None else parent + 1
    snap = {
        "version": version,
        "parent": parent,
        "ts": time.time(),
        "schema": df.schema.jsonValue(),
        "files": [{"path": p} for p in files],
    }
    sd = _snapdir(table)
    sd.mkdir(parents=True, exist_ok=True)
    tmp = sd / f".v{version}.json.tmp"
    tmp.write_text(json.dumps(snap, indent=1))
    os.rename(tmp, sd / f"v{version}.json")
    tmp2 = sd / ".CURRENT.tmp"
    tmp2.write_text(str(version))
    os.rename(tmp2, sd / "CURRENT")
    return version


def read_snapshot(
    spark: SparkSession, table: str | Path, version: int | None = None
) -> DataFrame:
    """Read the pinned file list of a snapshot (NOT 'whatever parquet is
    in the directory right now' — that is the whole point)."""
    table = Path(table)
    info = snapshot_info(table, version)
    paths = [str(table / f["path"]) for f in info["files"]]
    if not paths:
        from pyspark.sql.types import StructType

        return spark.createDataFrame([], StructType.fromJson(info["schema"]))
    return spark.read.parquet(*paths)


def merge_upsert(
    spark: SparkSession, table: str | Path, updates: DataFrame, key: str
) -> int:
    """MERGE INTO emulation (Iceberg copy-on-write merge): rows of
    `updates` REPLACE current rows with a matching `key`, unmatched
    update rows INSERT, every other current row carries over unchanged.
    Commits the merged relation as a new overwrite snapshot — prior
    versions stay readable (time travel), and a killed merge leaves the
    table at its previous CURRENT (the tmp+rename commit is the atom).

    Plan shape: `current LEFT ANTI updates-keys` + `UNION updates` — one
    anti-join shuffle on the key (broadcastable when the update batch is
    dim-sized, the common CDC case) and one write.  At 100 TB the anti
    join prunes to only the partitions updates touch when both sides are
    bucketed on the key (sources/bucketed.py); this module keeps the
    parquet emulation simple instead.

    Swap-in note (real cluster): `spark.sql("MERGE INTO t USING u ON
    t.key = u.key WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN
    INSERT *")` over an Iceberg catalog — call sites only go through
    this function."""
    cur = read_snapshot(spark, table)
    from pyspark.sql import functions as F

    kept = cur.join(updates.select(F.col(key)).distinct(), key, "left_anti")
    merged = kept.unionByName(updates.select(*cur.columns))
    return write_snapshot(merged, table, mode="overwrite")
