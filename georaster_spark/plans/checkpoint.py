"""Op E9 — checkpoint / lineage / resume (SURVEY §2.2).

A long job over a 10^12-row table WILL be killed; the north rule demands
it "resumes exactly".  Shape:

  * The output is partitioned by a bounded WORK-UNIT column (e.g. the
    res-6 parent cell of a tile — thousands of units, each a few GB at
    production scale).
  * Per completed unit, a manifest entry `_manifest/<unit>.json` is
    committed atomically (tmp+rename) recording row count, optional
    metrics (e.g. min PSNR), and the *input snapshot version* (icelite)
    it was computed from — the lineage.
  * Resume = anti-join of the unit universe against the manifest
    (driver-side set difference here; `left_anti` on a units DataFrame
    when the universe itself is table-sized), then recompute ONLY
    pending units with dynamic partition overwrite — a unit that lost
    its manifest to a kill is rewritten idempotently, so the final
    state is identical to an uninterrupted run (deterministic unit
    content; verified in tests/test_resume.py).

Kill-window audit: die during data write -> partial partition dirs,
no manifest -> rewritten next run (dynamic overwrite drops stale
files).  Die between write and manifest -> same.  Die mid-manifest ->
committed units skip, the rest rewrite.  No window duplicates rows.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class RunReport:
    processed_units: list = field(default_factory=list)
    skipped_units: list = field(default_factory=list)
    rows_written: int = 0


def _manifest_dir(out_dir: str | Path) -> Path:
    return Path(out_dir) / "_manifest"


def completed_units(out_dir: str | Path, input_snapshot=None) -> set:
    """Units with a committed manifest entry for this input snapshot."""
    md = _manifest_dir(out_dir)
    if not md.exists():
        return set()
    done = set()
    for f in md.glob("*.json"):
        try:
            e = json.loads(f.read_text())
        except json.JSONDecodeError:
            continue  # torn write from a kill -> treat as not done
        if input_snapshot is None or e.get("input_snapshot") == input_snapshot:
            done.add(e["unit"])
    return done


def _commit_manifest(out_dir: str | Path, unit, rows: int, metrics: dict, input_snapshot) -> None:
    md = _manifest_dir(out_dir)
    md.mkdir(parents=True, exist_ok=True)
    entry = {
        "unit": unit,
        "rows": rows,
        "metrics": metrics,
        "input_snapshot": input_snapshot,
        "ts": time.time(),
    }
    tmp = md / f".{unit}.json.tmp"
    tmp.write_text(json.dumps(entry))
    os.rename(tmp, md / f"{unit}.json")


def checkpointed_write(
    df: DataFrame,
    out_dir: str | Path,
    unit_col: str,
    metric_aggs: dict | None = None,
    input_snapshot=None,
) -> RunReport:
    """Write `df` partitioned by `unit_col` with per-unit manifests;
    re-invocation after a kill completes only pending units.

    metric_aggs: {name: Column-aggregate} evaluated per unit and stored
    in the manifest (lineage + verification metrics, e.g. min PSNR).
    """
    spark = df.sparkSession
    out_dir = Path(out_dir)
    report = RunReport()

    units = [r[0] for r in df.select(unit_col).distinct().collect()]
    done = completed_units(out_dir, input_snapshot)
    pending = sorted(u for u in units if u not in done)
    report.skipped_units = sorted(set(units) & done)
    if not pending:
        return report

    # Cluster rows by unit before the partitioned write: without this,
    # every input partition opens a writer for every unit it touches
    # (input_partitions x units small files — a metadata bomb at 10^12
    # rows); after, files-per-unit == tasks that own the unit (1 here).
    # Production variant with jumbo units: repartition(n, unit, salt).
    pend_df = df.where(F.col(unit_col).isin(pending)).repartition(F.col(unit_col))
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            pend_df.write.mode("overwrite")
            .partitionBy(unit_col)
            .parquet(str(out_dir / "data"))
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)

    # Manifest from the COMMITTED bytes, not the in-flight plan.
    written = spark.read.parquet(str(out_dir / "data")).where(
        F.col(unit_col).isin(pending)
    )
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        c.alias(f"__m_{name}") for name, c in (metric_aggs or {}).items()
    ]
    stats = {r[unit_col]: r.asDict() for r in written.groupBy(unit_col).agg(*aggs).collect()}
    for u in pending:
        st = stats.get(u, {"__rows": 0})
        metrics = {k[4:]: v for k, v in st.items() if k.startswith("__m_")}
        _commit_manifest(out_dir, u, st["__rows"], metrics, input_snapshot)
        report.processed_units.append(u)
        report.rows_written += st["__rows"]
    return report


def read_checkpointed(spark: SparkSession, out_dir: str | Path) -> DataFrame:
    """Read back ONLY manifest-committed units (ignores partial output
    from a killed attempt)."""
    out_dir = Path(out_dir)
    done = completed_units(out_dir)
    df = spark.read.parquet(str(out_dir / "data"))
    unit_col = [f.name for f in df.schema.fields][-1]  # partition col is appended last
    return df.where(F.col(unit_col).isin(list(done)))
