"""As-of join (operators/relational.asof_join)."""

from __future__ import annotations

import datetime as dt

from georaster_spark.operators import relational as rel


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), 100), (1, _ts(5), 101), (2, _ts(7), 102), (3, _ts(1), 103)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 900, 1.5),   # simultaneous with lid=101 -> matches (<=)
            (1, _ts(9), 901, 2.5),   # latest prior for lid=100
            (1, _ts(11), 902, 3.5),  # future: never matches
            (2, _ts(7), 903, 4.0),   # equal-ts tie with 904
            (2, _ts(7), 904, 5.0),   # tiebreak: greatest first-payload wins
        ],
        "k long, ts timestamp, rid long, v double",
    )
    out = {
        r["lid"]: (r["r_rid"], r["r_v"])
        for r in rel.asof_join(left, right, key="k", ts="ts",
                               payload=("rid", "v")).collect()
    }
    assert out[100] == (901, 2.5)
    assert out[101] == (900, 1.5)
    assert out[102] == (904, 5.0)
    assert out[103] == (None, None)  # key 3 has no right rows at all


def test_asof_deterministic_across_parallelism(spark):
    td = "/root/testdata/sf0.001"
    a = rel.clicks_prior_purchase(spark, td).collect()
    b = (
        rel.clicks_prior_purchase(spark, td)
        .repartition(7)
        .repartition(1)
        .sortWithinPartitions("event_id")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_gap_fill_hourly_matches_pandas(spark):
    """gap_fill_hourly vs an explicit pandas resample+ffill."""
    import datetime

    import pandas as pd

    from georaster_spark.operators.temporal import gap_fill_hourly

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2):
        for k in (0, 1, 5, 5, 11):  # duplicate hour 5 -> max event_id wins
            rows.append(
                (eid, t0 + datetime.timedelta(hours=k, minutes=eid % 50),
                 u, "x", float(10 * u + eid))
            )
            eid += 1
    df = spark.createDataFrame(
        rows, schema="event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    got = {r["user_id"]: r for r in gap_fill_hourly(df).collect()}
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "t", "value"])
    for u in (1, 2):
        g = pdf[pdf.user_id == u].copy()
        g["h"] = g.ts.dt.floor("h")
        hv = g.sort_values("event_id").groupby("h").last()["value"] * 100
        grid = hv.resample("1h").last().ffill()
        r = got[u]
        assert r["n_slots"] == len(grid) == 12
        assert r["n_observed"] == 4  # hours 0,1,5,11
        assert r["last_val"] == int(round(grid.iloc[-1]))
        assert r["fill_checksum"] == sum(
            (i + 1) * int(round(v)) for i, v in enumerate(grid)
        )


def test_native_session_window_exact_gap_boundary(spark):
    """An exact-gap pair MERGES (Spark's session close is inclusive) —
    the oracle's strict-> rule encodes this measured semantics."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 0, 5, 0)),   # exactly 300 s later
        (1, dt.datetime(2024, 1, 1, 0, 10, 1)),  # 301 s later: new session
    ]
    df = spark.createDataFrame(rows, "user_id long, tsec timestamp")
    out = df.groupBy(
        "user_id", F.session_window("tsec", "300 seconds")
    ).count().collect()
    assert len(out) == 2
