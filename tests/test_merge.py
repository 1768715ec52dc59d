"""MERGE INTO emulation (sources/icelite.merge_upsert)."""

from __future__ import annotations

from georaster_spark.sources import icelite


def test_merge_upsert_semantics(spark, tmp_path):
    tbl = tmp_path / "tbl"
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    v0 = icelite.write_snapshot(base, tbl)
    upd = spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"  # 2 updates, 4 inserts
    )
    v1 = icelite.merge_upsert(spark, tbl, upd, key="k")
    assert v1 == v0 + 1
    got = {r["k"]: r["v"] for r in icelite.read_snapshot(spark, tbl).collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}
    # time travel: the pre-merge snapshot is untouched
    old = {r["k"]: r["v"] for r in icelite.read_snapshot(spark, tbl, v0).collect()}
    assert old == {1: "a", 2: "b", 3: "c"}


def test_merge_upsert_idempotent(spark, tmp_path):
    tbl = tmp_path / "tbl"
    icelite.write_snapshot(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tbl
    )
    upd = spark.createDataFrame([(2, "B")], "k long, v string")
    icelite.merge_upsert(spark, tbl, upd, key="k")
    icelite.merge_upsert(spark, tbl, upd, key="k")  # replay changes nothing
    got = sorted(map(tuple, icelite.read_snapshot(spark, tbl).collect()))
    assert got == [(1, "a"), (2, "B")]
