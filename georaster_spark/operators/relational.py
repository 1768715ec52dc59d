"""Relational operator demos over the driver's TPC-H-ish tables
(SURVEY §2.3 category checklist: hash/broadcast joins, partial+final
aggregation, window top-k, sorts, semi/anti joins, date + JSON scalar
functions).  The reference has none of these (it is a raster library);
the engine gets them from stock Spark — these queries prove the wiring
and are oracle-checked against DuckDB.

Float determinism pattern: money sums go through exact integer cents
(`round(x*100)::bigint` summed, divided by 100.0 once at the end) so
results are bit-identical regardless of summation order / parallelism —
the same trick the spatial aggregates use (SURVEY §7.3 hard-part 1).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cents(col: F.Column) -> F.Column:
    return F.round(col * 100).cast("long")


def q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analog: partial+final hash aggregation with exact-integer
    money sums."""
    li = _t(spark, sf_dir, "lineitem")
    disc_cents = F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount"))).cast("long")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (F.sum(disc_cents) / 100.0).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.sum(F.col("l_quantity").cast("long")) / F.count(F.lit(1)), 6).alias("avg_qty"),
        )
        .repartition(1).sortWithinPartitions("l_returnflag", "l_linestatus")
    )


def q1_pricing_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
  SUM(CAST(round(CAST(round(l_extendedprice * 100) AS BIGINT) * (1.0 - l_discount)) AS BIGINT)) / 100.0
    AS sum_disc_price,
  COUNT(*) AS count_order,
  round(SUM(CAST(l_quantity AS BIGINT)) / COUNT(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join + window top-k (rank <= 3 per market segment)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    win = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= 3)
        .select("c_mktsegment", "rnk", "o_orderkey", "o_totalprice")
        .repartition(1).sortWithinPartitions("c_mktsegment", "rnk")
    )


def top_orders_per_segment_sql() -> str:
    return """
SELECT c_mktsegment, rnk, o_orderkey, o_totalprice FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders JOIN customer ON o_custkey = c_custkey)
WHERE rnk <= 3 ORDER BY c_mktsegment, rnk
"""


def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar functions + aggregation: monthly order count/revenue."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents(F.col("o_totalprice"))) / 100.0).alias("revenue"),
        )
        .repartition(1).sortWithinPartitions("month")
    )


def orders_by_month_sql() -> str:
    return """
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders GROUP BY 1 ORDER BY month
"""


def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (props is a JSON string) + aggregation."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            (F.sum(cents(F.col("value"))) / 100.0).alias("sum_value"),
        )
        .repartition(1).sortWithinPartitions("event_type")
    )


def events_json_stats_sql() -> str:
    return """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join (the op E9 resume primitive) + broadcast dim join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    no_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
    return (
        no_orders.join(F.broadcast(nation), no_orders.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .repartition(1).sortWithinPartitions("n_name")
    )


def customers_without_orders_sql() -> str:
    return """
SELECT n_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name ORDER BY n_name
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-sets demo: revenue by (returnflag, linestatus) with
    subtotals; NULL group keys rendered as 'ALL' for a stable contract."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg((F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
        )
        .repartition(1).sortWithinPartitions("returnflag", "linestatus")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: 3-way join (customer ⋈ orders ⋈ lineitem) with
    date predicates on both fact legs, exact-cents revenue agg, global
    top-10 — compiled by Spark to TakeOrderedAndProject (per-partition
    top-k + driver merge, no full global sort)."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-03-15"))
    disc_cents = F.round(
        cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount"))
    ).cast("long")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(disc_cents) / 100.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .repartition(1)
        .sortWithinPartitions(F.col("revenue").desc(), F.col("l_orderkey"))
    )


def shipping_priority_sql() -> str:
    return """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
       SUM(CAST(round(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (1.0 - l_discount)) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping-sets demo (all four grouping combinations of
    returnflag x linestatus), NULL keys rendered 'ALL'."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg((F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
        )
        .repartition(1).sortWithinPartitions("returnflag", "linestatus")
    )


def revenue_cube_sql() -> str:
    return """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def revenue_rollup_sql() -> str:
    return """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: tuple[str, ...],
) -> DataFrame:
    """As-of join (Spark has no native one): each left row picks the
    single right row with the same `key` and the greatest `ts` <= the
    left row's `ts`; unmatched left rows keep NULL payload (LEFT ASOF —
    the DuckDB `ASOF LEFT JOIN` semantics, which the oracle runs
    verbatim).

    Plan: the union-and-carry idiom — tag both sides, union, ONE window
    per key ordered by (ts, side) with right rows sorting before left at
    equal ts (<= semantics), then `last(payload, ignorenulls=True)` over
    the cumulative frame carries the latest prior right payload onto
    every left row.  Exactly one shuffle (the window partition) — the
    minimum any keyed as-of needs; a hot key salts the same way op E8
    salts hot cells (split the key's timeline, overlap-carry the last
    right row of the prior slice).

    Equal right timestamps within a key tie-break by the first payload
    column (greatest wins) so the result is deterministic under any
    partitioning."""
    lext = [c for c in left.columns if c not in (key, ts)]
    l = left.select(
        key, ts, F.lit(0).alias("_side"),
        *[F.col(c) for c in lext],
        *[
            F.lit(None).cast(right.schema[p].dataType).alias(f"r_{p}")
            for p in payload
        ],
    )
    r = right.select(
        key, ts, F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lext],
        *[F.col(p).alias(f"r_{p}") for p in payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").desc(), F.col(f"r_{payload[0]}").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        key, ts, "_side", *lext,
        *[
            F.last(f"r_{p}", ignorenulls=True).over(w).alias(f"r_{p}")
            for p in payload
        ],
    )
    return filled.where(F.col("_side") == 0).drop("_side")


def clicks_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of demo: every click event joined to the same user's most
    recent prior-or-simultaneous purchase."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(clicks, purchases, key="user_id", ts="ts",
                    payload=("event_id", "value"))
    return out.select(
        "event_id",
        F.col("r_event_id").alias("prior_purchase_id"),
        F.col("r_value").alias("prior_value"),
    ).repartition(1).sortWithinPartitions("event_id")


def clicks_prior_purchase_sql() -> str:
    return """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT l.event_id,
       r.event_id AS prior_purchase_id,
       r.value AS prior_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (categorical -> columns): per user_id bucket, one column per
    event_type with the event count.  `groupBy().pivot(values=...)` with
    explicit pivot values keeps the plan a single partial+final agg (no
    extra distinct-values job)."""
    ev = _t(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 10).alias("user_bucket")
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.groupBy(bucket)
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )
    return out.select(
        "user_bucket", *[F.col(t).cast("long").alias(f"n_{t}") for t in types]
    ).repartition(1).sortWithinPartitions("user_bucket")


def events_pivot_sql() -> str:
    types = ["click", "error", "purchase", "signup", "view"]
    cols = ",\n       ".join(
        f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
SELECT user_id % 10 AS user_bucket,
       {cols}
FROM events GROUP BY 1 ORDER BY 1
"""


def rolling_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame window (time-based rolling aggregate): per event, the
    count and cents-exact sum of the same user's events in the preceding
    hour (inclusive).  RANGE frames bound by the timestamp VALUE — a
    different mechanism from the ROWS frames used elsewhere — and the
    money column is summed in integer cents so the hash is exact."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") % 7 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))  # microsecond-exact: a cast to long
        .rangeBetween(-3_600_000_000, 0)  # would floor-truncate and admit
    )  # rows the oracle's INTERVAL arithmetic excludes
    return ev.select(
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_hour"),
        F.sum(cents(F.col("value"))).over(w).alias("sum_cents_hour"),
    ).repartition(1).sortWithinPartitions("event_id")


def rolling_user_value_sql() -> str:
    return """
WITH ev AS (SELECT * FROM events WHERE event_id % 7 = 0)
SELECT event_id,
       COUNT(*) OVER w AS n_hour,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS sum_cents_hour
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def revenue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form rollup/cube specialize: exactly
    three aggregation grains ((nation), (segment), ()) in one pass, with
    GROUPING() disambiguating the all-rows grain from real values.
    Catalyst expands this to a single Expand + hash-aggregate plan (one
    scan, no self-union)."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT COALESCE(n_name, '') AS nation,
               COALESCE(c_mktsegment, '') AS segment,
               GROUPING(n_name) + 2 * GROUPING(c_mktsegment) AS grain,
               COUNT(*) AS n_cust,
               SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS acctbal_cents
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
        """
    ).repartition(1).sortWithinPartitions("grain", "nation", "segment")


def revenue_grouping_sets_sql() -> str:
    return """
SELECT COALESCE(n_name, '') AS nation,
       COALESCE(c_mktsegment, '') AS segment,
       GROUPING(n_name) + 2 * GROUPING(c_mktsegment) AS grain,
       COUNT(*) AS n_cust,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
ORDER BY grain, nation, segment
"""


def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operators (the one §2.3 set-op row no
    other query exercised head-on): nations that have both customers and
    suppliers, vs customer-only nations.  Both set ops are DISTINCT
    semantics -> Catalyst plans them as left-semi / left-anti hash joins
    over the deduped children."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cn = cust.join(nation, cust.c_nationkey == nation.n_nationkey).select("n_name")
    sn = supp.join(nation, supp.s_nationkey == nation.n_nationkey).select("n_name")
    both = cn.intersect(sn).select("n_name", F.lit("both").alias("tag"))
    only = cn.distinct().subtract(sn.distinct()).select(
        "n_name", F.lit("cust_only").alias("tag")
    )
    return both.unionByName(only).repartition(1).sortWithinPartitions("tag", "n_name")


def nation_set_ops_sql() -> str:
    return """
WITH cn AS (SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
     sn AS (SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
SELECT n_name, 'both' AS tag FROM (SELECT * FROM cn INTERSECT SELECT * FROM sn)
UNION ALL
SELECT n_name, 'cust_only' AS tag FROM (SELECT * FROM cn EXCEPT SELECT * FROM sn)
ORDER BY tag, n_name
"""


def orders_above_cust_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (Catalyst decorrelates them into
    aggregate + join under the hood): per customer, how many of their
    orders are strictly above their own average order value.  The
    comparison is done as cents * count > sum_cents — integer-exact, no
    float average ever materializes."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o.o_custkey AS c_custkey, COUNT(*) AS n_above
        FROM orders o
        WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
              * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(round(i2.o_totalprice * 100) AS BIGINT))
                 FROM orders i2 WHERE i2.o_custkey = o.o_custkey)
        GROUP BY o.o_custkey
        """
    ).repartition(1).sortWithinPartitions("c_custkey")


def orders_above_cust_avg_sql() -> str:
    return """
SELECT o.o_custkey AS c_custkey, COUNT(*) AS n_above
FROM orders o
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT)
      * (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > (SELECT SUM(CAST(round(i2.o_totalprice * 100) AS BIGINT))
         FROM orders i2 WHERE i2.o_custkey = o.o_custkey)
GROUP BY o.o_custkey
ORDER BY c_custkey
"""


def order_date_string_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function suite (date + string categories of §2.3) over one
    aggregation: year/month/day extraction, date difference from an
    epoch, substring/upper parsing of the priority code — all JVM-side
    Column functions, integer-exact outputs."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        o.groupBy(F.year(d).alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.when(F.month(d) <= 3, 1).otherwise(0)).alias("n_q1"),
            F.max(F.dayofmonth(d)).alias("max_dom"),
            F.sum(F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long")).alias("sum_days"),
            F.sum(F.substring("o_orderpriority", 1, 1).cast("long")).alias("sum_prio"),
            F.min(F.upper(F.substring("o_orderpriority", 3, 20))).alias("first_prio"),
        )
        .repartition(1).sortWithinPartitions("yr")
    )


def order_date_string_stats_sql() -> str:
    return """
SELECT EXTRACT(year FROM o_orderdate) AS yr,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN EXTRACT(month FROM o_orderdate) <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_q1,
       CAST(MAX(EXTRACT(day FROM o_orderdate)) AS INTEGER) AS max_dom,
       CAST(SUM(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS sum_days,
       CAST(SUM(CAST(substr(o_orderpriority, 1, 1) AS BIGINT)) AS BIGINT) AS sum_prio,
       MIN(upper(substr(o_orderpriority, 3, 20))) AS first_prio
FROM orders
GROUP BY 1 ORDER BY yr
"""

SESSION_GAP_US = 6 * 3600 * 1_000_000  # 6h inactivity closes a session


def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization — the log-analytics operator Spark batch
    has no native primitive for (Structured Streaming's session_window
    is stream-only): per user, events ordered by timestamp start a new
    session when the inactivity gap exceeds SESSION_GAP_US, via the
    classic lag -> boundary flag -> cumulative-sum-as-session-index
    window idiom, then one partial+final aggregation per session.

    Exactly ONE shuffle: the lag window and the cumulative-sum window
    share (partitionBy user_id, orderBy ts) so Catalyst plans a single
    exchange + sort and evaluates both Window operators on it; the
    closing groupBy(user_id, sess_idx) is a prefix of the same
    partitioning, so it reuses the exchange too.  At 10^12 events the
    per-user timeline is the only data movement — the same minimum any
    keyed sessionization needs.  Timestamps compare as unix
    microseconds (exact int64, no float truncation); the money column
    sums in integer cents."""
    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        cents(F.col("value")).alias("v_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gapped = base.withColumn(
        "new_sess",
        F.when(
            F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_US, 1
        ).otherwise(0),  # first event per user: lag is NULL -> 0
    )
    sess = gapped.withColumn(
        "sess_idx",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sess.groupBy("user_id", "sess_idx")
        .agg(
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("v_cents") / 100.0).alias("sum_value"),
        )
        .repartition(1).sortWithinPartitions("user_id", "sess_idx")
    )


def user_sessions_sql() -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
), g AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
), s AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_idx
  FROM g
)
SELECT user_id, sess_idx,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       COUNT(*) AS n_events,
       CAST(SUM(v_cents) AS BIGINT) / 100.0 AS sum_value
FROM s GROUP BY user_id, sess_idx ORDER BY user_id, sess_idx
"""

SKETCH_TOL = 0.05  # both sketches must land within 5% of their exact twin


def sketch_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates with an honest accuracy gate: HLL++
    distinct counts (approx_count_distinct) and an approximate median
    (percentile_approx, the GK/KLL-family sketch) computed ALONGSIDE
    their exact twins in one aggregation; the emitted booleans assert
    the sketch error is within SKETCH_TOL and the oracle emits literal
    TRUE — a sketch regression (or a tolerance breach at a new data
    scale) turns the driver row red.  Only exact integers + booleans
    reach the hash surface; the raw sketch estimates are engine-
    specific by nature and deliberately do not.

    Scale note: this is the pattern that makes sketches USABLE at
    10^12 rows — the exact twin runs at audit scale (sf0.01 here, a
    sampled partition in production) to certify the sketch, then the
    sketch alone (one pass, mergeable partials, bounded memory) serves
    the full corpus where COUNT(DISTINCT) would need a giant shuffle."""
    ev = _t(spark, sf_dir, "events")
    v_cents = cents(F.col("value"))
    agg = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_hll"),
        F.expr(
            "percentile(CAST(round(value * 100) AS BIGINT), 0.5D)"
        ).alias("_p50_exact"),
        F.expr(
            "percentile_approx(CAST(round(value * 100) AS BIGINT), 0.5D, 10000)"
        ).alias("_p50_approx"),
    )
    tol = F.lit(float(SKETCH_TOL))
    return agg.select(
        "event_type",
        "n_users_exact",
        (
            F.abs(F.col("_hll") - F.col("n_users_exact"))
            <= tol * F.col("n_users_exact")
        ).alias("hll_ok"),
        (
            F.abs(F.col("_p50_approx") - F.col("_p50_exact"))
            <= tol * F.abs(F.col("_p50_exact"))
        ).alias("p50_ok"),
    ).repartition(1).sortWithinPartitions("event_type")


def sketch_accuracy_sql() -> str:
    return """
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users_exact,
       TRUE AS hll_ok,
       TRUE AS p50_ok
FROM events GROUP BY event_type ORDER BY event_type
"""

BIG_QTY = 45  # an order "has a big item" if any lineitem quantity >= this


def orders_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-subquery / LEFT SEMI join (the complement of
    customers_without_orders' anti join): orders having at least one
    big-quantity lineitem, rolled up per month.  The semi join keeps the
    probe side's row multiplicity (no dedup shuffle) and Catalyst pushes
    the quantity filter into the lineitem scan."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") >= BIG_QTY)
    hits = o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
    return (
        hits.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum(cents(F.col("o_totalprice"))) / 100.0).alias("revenue"),
        )
        .repartition(1).sortWithinPartitions("month")
    )


def orders_exists_semi_sql() -> str:
    return f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= {BIG_QTY})
GROUP BY 1 ORDER BY month
"""


def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-threshold outlier detection — the log-analytics anomaly
    filter: per event_type, flag events in the top 1% by value
    (percent_rank >= 0.99 with deterministic (value, event_id) order)
    and report exact flagged-set aggregates.

    Rank-based (not z-score) so the surface is EXACT: percent_rank is
    (rank-1)/(n-1) — the same pure-integer-derived double in every
    engine — and the aggregates are integer cents + an id checksum that
    pins the exact flagged SET.  ONE shuffle (the per-type window);
    the closing groupBy reuses its partitioning.  At 10^12 events the
    per-type global sort is the cost — swap to approx_percentile
    pre-thresholding at scale, keeping this as the exact twin."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", cents(F.col("value")).alias("v_cents")
    )
    w = Window.partitionBy("event_type").orderBy("v_cents", "event_id")
    flagged = ev.withColumn("pr", F.percent_rank().over(w)).where(
        F.col("pr") >= 0.99
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_outliers"),
            F.sum("v_cents").alias("cents_sum"),
            F.min("v_cents").alias("min_cents"),
            F.sum("event_id").alias("id_checksum"),
        )
        .repartition(1).sortWithinPartitions("event_type")
    )


def value_outliers_sql() -> str:
    return """
WITH e AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events
),
r AS (
  SELECT *, percent_rank() OVER (
    PARTITION BY event_type ORDER BY v_cents, event_id) AS pr
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_outliers,
       CAST(SUM(v_cents) AS BIGINT) AS cents_sum,
       CAST(MIN(v_cents) AS BIGINT) AS min_cents,
       CAST(SUM(event_id) AS BIGINT) AS id_checksum
FROM r WHERE pr >= 0.99
GROUP BY event_type ORDER BY event_type
"""


_FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase) — the product-
    analytics sequential-pattern operator: a user converts at stage k+1
    only via an event STRICTLY AFTER their stage-k conversion event
    (order on (ts, event_id), so simultaneous-timestamp ties resolve
    deterministically).

    Plan: stage k+1 = one aggregation of the events table joined to the
    stage-k per-user frontier — every shuffle is on user_id over slim
    int64 columns; K stages = K passes over the (pruned) event columns,
    never a per-user collect.  Output: one row per stage with exact
    converted-user counts and a Σuser_id checksum pinning the exact
    converted SET."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    frontier = None
    rows = []
    for stage, etype in enumerate(_FUNNEL_STAGES):
        cand = ev.where(F.col("event_type") == etype)
        if frontier is not None:
            cand = cand.join(frontier, "user_id").where(
                (F.col("ts_us") > F.col("prev_ts"))
                | ((F.col("ts_us") == F.col("prev_ts")) & (F.col("event_id") > F.col("prev_id")))
            )
        conv = cand.groupBy("user_id").agg(
            F.min(F.struct("ts_us", "event_id")).alias("first")
        )
        frontier = conv.select(
            "user_id",
            F.col("first.ts_us").alias("prev_ts"),
            F.col("first.event_id").alias("prev_id"),
        )
        rows.append(
            frontier.agg(
                F.lit(stage + 1).alias("stage"),
                F.lit(etype).alias("event_type"),
                F.count(F.lit(1)).alias("n_users"),
                F.sum("user_id").alias("user_checksum"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.repartition(1).sortWithinPartitions("stage")


def funnel_conversion_sql() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
s1f AS (
  SELECT user_id,
         MIN((ts_us, event_id)) AS frontier
  FROM e WHERE event_type = 'view' GROUP BY user_id
),
s2f AS (
  SELECT e.user_id, MIN((e.ts_us, e.event_id)) AS frontier
  FROM e JOIN s1f USING (user_id)
  WHERE e.event_type = 'click'
    AND (e.ts_us > s1f.frontier[1]
         OR (e.ts_us = s1f.frontier[1] AND e.event_id > s1f.frontier[2]))
  GROUP BY e.user_id
),
s3f AS (
  SELECT e.user_id, MIN((e.ts_us, e.event_id)) AS frontier
  FROM e JOIN s2f USING (user_id)
  WHERE e.event_type = 'purchase'
    AND (e.ts_us > s2f.frontier[1]
         OR (e.ts_us = s2f.frontier[1] AND e.event_id > s2f.frontier[2]))
  GROUP BY e.user_id
)
SELECT 1 AS stage, 'view' AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(user_id) AS BIGINT) AS user_checksum FROM s1f
UNION ALL
SELECT 2, 'click', CAST(COUNT(*) AS BIGINT), CAST(SUM(user_id) AS BIGINT) FROM s2f
UNION ALL
SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT), CAST(SUM(user_id) AS BIGINT) FROM s3f
ORDER BY stage
"""


def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-dominance query (the classic Borzsony-Kossmann-
    Stocker SKYLINE OF operator, stock SQL engines lack it): the orders
    since 1997 not dominated on (total price MAX, order date MIN,
    lineitem count MAX).  Order b dominates a iff b >= a on every
    criterion and beats it on at least one.

    Distributed shape (the standard two-phase skyline): a LOCAL Pareto
    pass inside each partition first (mapInPandas — dominated rows die
    where they live, nothing wide shuffles), then the surviving
    candidate set — empirically a tiny fraction — gathers into one
    partition for the identical final pass.  Both phases run the same
    vectorized dominance filter; money compares in exact integer cents.

    At 100 TB the local pass bounds the gather: each partition emits at
    most its own Pareto front, and fronts are small (log^(d-1) n expected
    for independent dims), so the final single-partition refine is
    metadata-sized — same posture as the planner-side collects VERDICT
    r1 green-lit."""
    import numpy as np
    import pandas as pd

    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= F.lit("1997-01-01"))
    nl = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"))
    )
    t = (
        orders.join(nl, orders.o_orderkey == nl.l_orderkey)
        .select(
            F.col("o_orderkey").cast("long").alias("o_orderkey"),
            cents(F.col("o_totalprice")).alias("price_cents"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.col("n_lines").cast("long").alias("n_lines"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")).cast("long").alias("_dd"),
        )
    )
    schema = "o_orderkey long, price_cents long, o_orderdate date, n_lines long, _dd long"

    def _sky(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            P = pdf[["price_cents", "_dd", "n_lines"]].to_numpy(dtype=np.int64)
            # scan in (price desc, date asc, n_lines desc) order: any
            # dominator of row i precedes i, so one pass suffices
            order = np.lexsort((-P[:, 2], P[:, 1], -P[:, 0]))
            kept: list[int] = []
            K = np.empty((0, 3), dtype=np.int64)
            for i in order:
                p = P[i]
                dom = (
                    (K[:, 0] >= p[0]) & (K[:, 1] <= p[1]) & (K[:, 2] >= p[2])
                    & ((K[:, 0] > p[0]) | (K[:, 1] < p[1]) | (K[:, 2] > p[2]))
                ).any()
                if not dom:
                    kept.append(i)
                    K = np.vstack([K, p[None, :]])
            yield pdf.iloc[sorted(kept)]

    local = t.mapInPandas(_sky, schema=schema)
    final = local.repartition(1).mapInPandas(_sky, schema=schema)
    return final.select(
        "o_orderkey", "price_cents", "o_orderdate", "n_lines"
    ).sortWithinPartitions("o_orderkey")


def skyline_orders_sql() -> str:
    return """
WITH t AS (
  SELECT o.o_orderkey,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(o.o_orderdate AS DATE) AS o_orderdate,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey) AS n_lines
  FROM orders o
  WHERE o.o_orderdate >= DATE '1997-01-01'
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, price_cents, o_orderdate, n_lines
FROM t a
WHERE NOT EXISTS (
  SELECT 1 FROM t b
  WHERE b.price_cents >= a.price_cents
    AND b.o_orderdate <= a.o_orderdate
    AND b.n_lines >= a.n_lines
    AND (b.price_cents > a.price_cents
         OR b.o_orderdate < a.o_orderdate
         OR b.n_lines > a.n_lines)
)
ORDER BY o_orderkey
"""


_BLOOM_BITS = 1 << 13          # m = 8192 bits -> 128 longs
_BLOOM_WORDS = _BLOOM_BITS // 64
_BLOOM_SEEDS = (1, 2, 3)       # k = 3 hash functions
_BLOOM_SEGMENT = "AUTOMOBILE"


def _bloom_probe(df: DataFrame, key: str, words: list[int]) -> F.Column:
    """AND of k membership probes of `key` against the broadcast word
    array (a pure Column expression — evaluated inside codegen)."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    cond = F.lit(True)
    for s in _BLOOM_SEEDS:
        pos = F.pmod(F.xxhash64(F.col(key), F.lit(s)), F.lit(_BLOOM_BITS))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(xxhash64({key}, {s}),"
            f" {_BLOOM_BITS}) % 64 AS INT))"
        )
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter-pruned semi join — the hand-rolled twin of
    Spark's runtime row-level filtering (`spark.sql.optimizer.runtime.
    bloomFilter.enabled`), made explicit so the pruning is testable and
    portable: orders of customers in one market segment, rolled up per
    month.

    Build side: the dim keys explode into k=3 (word, bit) probes and
    ONE `bit_or` aggregation produces the 8192-bit filter as 128 longs —
    collected to the driver (<= 128 rows: bounded planner metadata,
    same policy as the skew census) and re-broadcast as an array
    LITERAL, so the probe is pure codegen'd integer logic inside the
    fact scan, ahead of any join machinery.  False positives are then
    removed by an exact broadcast LEFT SEMI join, so the RESULT is
    hash-independent; the bloom only prunes.

    Scale shape: at 100 TB the probe eliminates most fact rows before
    the shuffle/join stage touches them — the standard big-join
    runtime-filter pattern; the filter itself costs one tiny agg of the
    dim side."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == _BLOOM_SEGMENT
    )
    keys = c.select(F.col("c_custkey").cast("long").alias("k"))

    probes = keys.select(
        "k", F.explode(F.array(*[F.lit(s) for s in _BLOOM_SEEDS])).alias("seed")
    ).select(F.pmod(F.xxhash64("k", "seed"), F.lit(_BLOOM_BITS)).alias("pos"))
    bits = probes.select(
        (F.col("pos") / 64).cast("int").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
    )
    built = bits.groupBy("word").agg(F.bit_or("mask").alias("bm")).collect()
    words = [0] * _BLOOM_WORDS
    for r in built:
        words[r["word"]] = r["bm"]

    fact = o.withColumn("ck", F.col("o_custkey").cast("long"))
    candidates = fact.where(_bloom_probe(fact, "ck", words))
    hits = candidates.join(
        F.broadcast(keys), candidates["ck"] == keys["k"], "left_semi"
    )
    return (
        hits.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).alias("cents"),
        )
        .repartition(1).sortWithinPartitions("month")
    )


def bloom_semi_sql() -> str:
    return f"""
SELECT strftime(o_orderdate, '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
FROM orders o
WHERE o_custkey IN (SELECT c_custkey FROM customer
                    WHERE c_mktsegment = '{_BLOOM_SEGMENT}')
GROUP BY 1 ORDER BY month
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics rollup:
    users are cohorted by their first-event day; each (cohort-day,
    day-offset) cell counts distinct users still active that many days
    later.  Day arithmetic is exact integer (days since epoch), so no
    date-diff float ever enters the plan.

    Scale shape: one groupBy(user) min-agg for cohorts (partial+final),
    one distinct-day projection of activity, one equi-join on user_id
    and a final count-distinct rollup — all combiner-friendly; at 10^12
    events the join is user-keyed and co-partitions with the cohort
    agg's output."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("long").alias("day"),
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    cells = (
        active.join(first, "user_id")
        .groupBy(
            F.col("cohort_day"),
            (F.col("day") - F.col("cohort_day")).cast("long").alias("offset_d"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
    return cells.repartition(1).sortWithinPartitions("cohort_day", "offset_d")


def cohort_retention_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id,
         CAST(ts::DATE - DATE '1970-01-01' AS BIGINT) AS day
  FROM events
),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, day FROM ev)
SELECT f.cohort_day,
       CAST(a.day - f.cohort_day AS BIGINT) AS offset_d,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY f.cohort_day, offset_d ORDER BY f.cohort_day, offset_d
"""


# ---------------------------------------------------------------------------
# Data-contract integrity audit (round 3)
# ---------------------------------------------------------------------------


def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity / data-contract audit — the dbt-test /
    Deequ-style validation sweep a production pipeline runs before
    promoting a snapshot: orphan foreign keys, duplicate primary keys,
    null required fields, and domain-range violations, one row per
    check with (n_violations, n_checked).

    Plan: each FK check is a broadcast-able LEFT ANTI join (the dim
    side — customer, orders keys — is the small side at any scale once
    aggregated); PK checks are one combiner-friendly groupBy-count;
    null/range checks are map-side conditional sums.  The per-check
    aggregates are single-row and union into a 6-row result — no
    global sort, no driver loop."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")

    def one(name: str, viol, checked):
        return viol.crossJoin(checked).select(
            F.lit(name).alias("check"),
            F.col("n_violations"),
            F.col("n_checked"),
        )

    orphan_cust = one(
        "orders_orphan_custkey",
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations")),
        orders.agg(F.count(F.lit(1)).alias("n_checked")),
    )
    orphan_order = one(
        "lineitem_orphan_orderkey",
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations")),
        li.agg(F.count(F.lit(1)).alias("n_checked")),
    )
    dup_cust = one(
        "customer_dup_custkey",
        cust.groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n_violations")),
        cust.agg(F.count(F.lit(1)).alias("n_checked")),
    )
    dup_line = one(
        "lineitem_dup_pk",
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("n_violations")),
        li.agg(F.count(F.lit(1)).alias("n_checked")),
    )
    null_date = one(
        "orders_null_orderdate",
        orders.agg(
            F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
            .alias("n_violations")
        ),
        orders.agg(F.count(F.lit(1)).alias("n_checked")),
    )
    qty_range = one(
        "lineitem_qty_out_of_range",
        li.agg(
            F.sum(
                F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
                .otherwise(0)
            ).alias("n_violations")
        ),
        li.agg(F.count(F.lit(1)).alias("n_checked")),
    )
    out = orphan_cust
    for part in (orphan_order, dup_cust, dup_line, null_date, qty_range):
        out = out.union(part)
    return out.repartition(1).sortWithinPartitions("check")


def integrity_audit_sql() -> str:
    return """
SELECT * FROM (
  SELECT 'orders_orphan_custkey' AS "check",
         (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS n_violations,
         (SELECT COUNT(*) FROM orders) AS n_checked
  UNION ALL
  SELECT 'lineitem_orphan_orderkey',
         (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'customer_dup_custkey',
         (SELECT COALESCE(SUM(c - 1), 0) FROM
           (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey)),
         (SELECT COUNT(*) FROM customer)
  UNION ALL
  SELECT 'lineitem_dup_pk',
         (SELECT COALESCE(SUM(c - 1), 0) FROM
           (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)),
         (SELECT COUNT(*) FROM lineitem)
  UNION ALL
  SELECT 'orders_null_orderdate',
         (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL),
         (SELECT COUNT(*) FROM orders)
  UNION ALL
  SELECT 'lineitem_qty_out_of_range',
         (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50),
         (SELECT COUNT(*) FROM lineitem)
) ORDER BY "check"
"""


# ---------------------------------------------------------------------------
# Event-sequence Markov transition census + SCD2 dimension build (round 3)
# ---------------------------------------------------------------------------


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition census over per-user event streams
    — the user-behavior transition matrix every product-analytics /
    next-event-prediction pipeline derives (the categorical twin of the
    funnel op): for each ordered pair (event_type -> next event_type)
    within a user's timeline, the transition count and how many
    distinct users exhibit it.  Ordering is the total (ts, event_id)
    key, so lag/lead is deterministic under ties.

    Scale shape: ONE shuffle on user_id for the lead() window (at
    10^12 events the stream would already be bucketed by user), then a
    partial+final count agg on the ~|types|² transition keys — the
    output is dims-sized regardless of row count."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    pairs = ev.withColumn("next_type", F.lead("event_type").over(w)).where(
        F.col("next_type").isNotNull()
    )
    return (
        pairs.groupBy(
            F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .repartition(1).sortWithinPartitions("from_type", "to_type")
    )


def event_transitions_sql() -> str:
    return """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE next_type IS NOT NULL
GROUP BY from_type, to_type ORDER BY from_type, to_type
"""


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build (the Kimball slowly-changing-dimension
    interval table every warehouse maintains): treat each customer's
    order stream as status updates and materialize the
    (customer, status, valid_from, valid_to) history — a new interval
    opens whenever o_orderstatus CHANGES vs the previous order (ordered
    by the total (o_orderdate, o_orderkey) key).  Rolled up per status:
    interval count, open intervals (valid_to IS NULL = current), and
    the exact Σdays of the closed intervals (integer date arithmetic,
    no float).

    Scale shape: one shuffle on o_custkey for the lag/lead windows —
    the standard distributed SCD2 build; the final agg has |status|
    keys.  At 10^12 updates the change-point filter drops the stream
    to the change rate before the second window runs."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ords = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_orderdate",
        F.col("o_orderdate").cast("date").alias("d"),
    )
    marked = ords.withColumn("prev_status", F.lag("o_orderstatus").over(w))
    changes = marked.where(
        F.col("prev_status").isNull()
        | (F.col("o_orderstatus") != F.col("prev_status"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    hist = changes.select(
        "o_custkey", "o_orderstatus",
        F.col("d").alias("valid_from"),
        F.lead("d").over(w2).alias("valid_to"),
    )
    return (
        hist.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("valid_to").isNull().cast("long")).alias("n_open"),
            F.coalesce(
                F.sum(F.datediff("valid_to", "valid_from")), F.lit(0)
            ).cast("long").alias("closed_days"),
        )
        .repartition(1).sortWithinPartitions("status")
    )


def scd2_history_sql() -> str:
    return """
WITH ords AS (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate::DATE AS d,
         LAG(o_orderstatus) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS prev_status
  FROM orders
),
changes AS (
  SELECT o_custkey, o_orderstatus, d,
         LEAD(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
           AS valid_to
  FROM ords
  WHERE prev_status IS NULL OR o_orderstatus <> prev_status
)
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
       CAST(COALESCE(SUM(valid_to - d), 0) AS BIGINT) AS closed_days
FROM changes GROUP BY status ORDER BY status
"""


def custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by how
    many orders they placed, INCLUDING zero-order customers — the
    aggregate-of-aggregates distribution query (outer join -> per-key
    count -> count-of-counts).

    Scale shape: LEFT OUTER join on custkey (both sides key-partitioned
    at scale), per-customer count partial+final, then a second tiny agg
    on the count value — the second shuffle carries |distinct counts|
    keys.  No window, no sort until the final |bins|-row output."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .repartition(1).sortWithinPartitions(
            F.desc("custdist"), F.desc("c_count")
        )
    )


def custdist_sql() -> str:
    return """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# --- TPC-H Q21 analog: sole late shipper -------------------------------------
# "Late" for this schema (no commit/receipt dates): shipped more than
# LATE_DAYS after the order date.
LATE_DAYS = 90


def sole_late_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (Suppliers Who Kept Orders Waiting): per supplier,
    count the multi-supplier orders where THIS supplier shipped late and
    no other supplier did — one semi join (exists: another supplier in
    the order) plus one anti join (not exists: another LATE supplier),
    then a top-k.

    Scale shape: the exists/not-exists sides reduce to two self-joins of
    lineitem on l_orderkey — both shuffle on the order key and are
    co-partitioned, so AQE plans them off one exchange; the supplier
    dim join is broadcast.  The classic Q21 plan hazard (building both
    subqueries as separate scans) is avoided by deriving both from one
    slim (orderkey, suppkey, late) projection."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    slim = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
                > LATE_DAYS
            ).alias("late"),
        )
    )
    l1 = slim.where(F.col("late"))
    l2 = slim.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    multi = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    sole = multi.join(
        l3,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    agg = sole.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("numwait"),
        F.sum("l_orderkey").alias("orderkey_checksum"),
    )
    return (
        agg.join(F.broadcast(s), agg["l_suppkey"] == s["s_suppkey"])
        .select("s_name", "numwait", "orderkey_checksum")
        .where(F.col("numwait") >= 2)
        .repartition(1).sortWithinPartitions(
            F.desc("numwait"), F.asc("s_name")
        )
    )


def sole_late_shipper_sql() -> str:
    return f"""
WITH slim AS (
  SELECT l_orderkey, l_suppkey,
         date_diff('day', o_orderdate, l_shipdate) > {LATE_DAYS} AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT s_name,
       COUNT(*) AS numwait,
       CAST(SUM(l_orderkey) AS BIGINT) AS orderkey_checksum
FROM slim l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.late
  AND EXISTS (SELECT 1 FROM slim l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM slim l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
GROUP BY s_name
HAVING COUNT(*) >= 2
ORDER BY numwait DESC, s_name
"""


# --- TPC-H Q22 analog: idle customers with above-average balance -------------

IDLE_CUTOFF = "2000-01-01"


def idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (Global Sales Opportunity): customers with
    above-average positive account balance and NO orders at all, rolled
    up per nation — a scalar aggregate subquery feeding a filter, an
    anti join against orders, and a final small-key agg.

    "Idle" = no order since IDLE_CUTOFF (the fixture's last order year
    starts 2000-08; Q22's original predicate is "no orders at all",
    which this corpus never satisfies for a rich customer).

    Scale shape: the scalar avg is one partial+final agg reduced to a
    literal-sized frame (cross-joined broadcast, not a collect); the
    anti join shuffles on custkey and the date filter is pushed into
    the orders scan; the nation rollup is a 25-key agg."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", cents(F.col("c_acctbal")).alias("bal_c")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit(IDLE_CUTOFF))
        .select("o_custkey")
    )
    avg_pos = c.where(F.col("bal_c") > 0).agg(
        F.avg("bal_c").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_pos)).where(
        F.col("bal_c") > F.col("avg_bal")
    )
    idle = rich.join(o, rich["c_custkey"] == o["o_custkey"], "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_c") / 100.0).alias("totacctbal"),
        )
        .repartition(1).sortWithinPartitions("c_nationkey")
    )


def idle_customer_balance_sql() -> str:
    return f"""
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer
)
SELECT c_nationkey,
       COUNT(*) AS numcust,
       SUM(bal_c) / 100.0 AS totacctbal
FROM c
WHERE bal_c > (SELECT AVG(bal_c) FROM c WHERE bal_c > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- distributed NTILE: order-value percentile bands --------------------------

PCT_BUCKETS = 10


def order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile banding of orders by total price — the global-ranking op
    (NTILE / percent_rank) that naive SQL executes as ONE unpartitioned
    window (single task, the classic scale cliff).  Here the global rank
    comes from spatial_index.global_rank: repartitionByRange + per-
    partition row_number + a broadcast P-row offset map, then SQL-exact
    NTILE arithmetic from the rank.  Per decile: count, exact revenue
    cents, min/max price.

    Scale shape: one range shuffle (sorted within partitions, never
    globally collected), one P-row driver materialization, one
    10-key final agg."""
    from .spatial_index import _ntile_from_rank, global_rank

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("price_c")
    )
    ranked, n_rows = global_rank(o, ["price_c", "o_orderkey"])
    banded = ranked.withColumn(
        "decile", _ntile_from_rank(F.col("rank"), n_rows, PCT_BUCKETS)
    )
    return (
        banded.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("price_c") / 100.0).alias("revenue"),
            (F.min("price_c") / 100.0).alias("min_price"),
            (F.max("price_c") / 100.0).alias("max_price"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_orders", "revenue", "min_price", "max_price",
        )
        .repartition(1).sortWithinPartitions("decile")
    )


def order_percentiles_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
  FROM orders
),
b AS (
  SELECT price_c,
         NTILE({PCT_BUCKETS}) OVER (ORDER BY price_c, o_orderkey) AS decile
  FROM o
)
SELECT CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_orders,
       SUM(price_c) / 100.0 AS revenue,
       MIN(price_c) / 100.0 AS min_price,
       MAX(price_c) / 100.0 AS max_price
FROM b GROUP BY decile ORDER BY decile
"""


# --- interval (range) join via bucket equi-join -------------------------------
# Maintenance windows: one per 12 h, starting 10 h into the bucket and
# lasting 5 h — deliberately straddling two buckets so the bucketing
# technique is actually exercised.
IVAL_N_WINDOWS = 60
IVAL_BUCKET_S = 43_200  # 12 h
IVAL_OFF_S = 36_000  # 10 h
IVAL_LEN_S = 18_000  # 5 h
IVAL_T0 = "2024-01-01 00:00:00"


def interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (events x maintenance windows) executed as a
    BUCKET EQUI-JOIN + refine — the standard rewrite for Spark's classic
    range-join cliff (a bare theta join plans as BroadcastNestedLoop /
    cartesian): both sides key by 12 h epoch bucket (each window
    explodes into the <= 2 buckets it straddles), the equi-join prunes
    candidates, and the exact ts-in-[start, end) predicate refines
    inside codegen.

    Scale shape: candidates per event = windows sharing its bucket
    (O(1) here; O(windows/bucket) generally) instead of |windows|; the
    join shuffles on the bucket key only — at 10^12 events x 10^6
    windows the nested-loop plan is infeasible, this one is linear.
    The oracle is the direct theta join, proving the rewrite exact."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", cents(F.col("value")).alias("val_c")
    )
    t0 = F.to_timestamp(F.lit(IVAL_T0))
    w = (
        spark.range(IVAL_N_WINDOWS)
        .select(
            F.col("id").alias("win_id"),
            (t0 + F.make_interval(secs=F.col("id") * IVAL_BUCKET_S + IVAL_OFF_S)).alias("w_start"),
            (t0 + F.make_interval(secs=F.col("id") * IVAL_BUCKET_S + IVAL_OFF_S + IVAL_LEN_S)).alias("w_end"),
        )
    )
    bucket_of = lambda col: F.floor(
        (F.unix_timestamp(col) - F.unix_timestamp(t0)) / IVAL_BUCKET_S
    )
    wb = w.select(
        "win_id", "w_start", "w_end",
        F.explode(
            F.sequence(
                bucket_of(F.col("w_start")),
                bucket_of(F.col("w_end") - F.expr("INTERVAL 1 MICROSECOND")),
            )
        ).alias("bucket"),
    )
    evb = ev.withColumn("bucket", bucket_of(F.col("ts")))
    hits = evb.join(F.broadcast(wb), "bucket").where(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    return (
        hits.groupBy("win_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").alias("event_checksum"),
            (F.sum("val_c") / 100.0).alias("value_sum"),
        )
        .repartition(1).sortWithinPartitions("win_id")
    )


def interval_join_sql() -> str:
    return f"""
WITH w AS (
  SELECT k AS win_id,
         TIMESTAMP '{IVAL_T0}' + to_seconds(k * {IVAL_BUCKET_S} + {IVAL_OFF_S}) AS w_start,
         TIMESTAMP '{IVAL_T0}' + to_seconds(k * {IVAL_BUCKET_S} + {IVAL_OFF_S} + {IVAL_LEN_S}) AS w_end
  FROM generate_series(0, {IVAL_N_WINDOWS - 1}) AS gs(k)
)
SELECT win_id,
       COUNT(*) AS n_events,
       CAST(SUM(event_id) AS BIGINT) AS event_checksum,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS value_sum
FROM events JOIN w ON ts >= w_start AND ts < w_end
GROUP BY win_id ORDER BY win_id
"""


# --- TPC-H Q5 analog: local supplier volume (6-way join pyramid) --------------

Q5_REGION = "ASIA"
Q5_DATE_LO = "1996-01-01"
Q5_DATE_HI = "1999-01-01"


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (Local Supplier Volume): revenue per nation from
    lineitems where the customer and the supplier sit in the SAME
    nation of one region, over a shipping-window of order dates — the
    canonical 6-way join pyramid (region -> nation -> {customer,
    supplier} -> orders -> lineitem).

    Scale shape: region⋈nation collapses to a ≤25-row broadcast dim
    applied twice (customer side and supplier side); orders⋈customer
    shuffles on custkey with the date filter PUSHED INTO the orders
    scan; lineitem⋈orders co-partitions on orderkey (the only big-big
    join); supplier is broadcast.  The c_nation = s_nation equality is
    a post-join filter on two already-attached ints — never a join key,
    so no skew surface.  Revenue is exact integer cents."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    nr = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    c = c.join(F.broadcast(nr), c["c_nationkey"] == nr["n_nationkey"]).select(
        "c_custkey", "c_nationkey", "n_name"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit(Q5_DATE_LO))
            & (F.col("o_orderdate") < F.lit(Q5_DATE_HI))
        )
        .select("o_orderkey", "o_custkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    oc = o.join(c, o["o_custkey"] == c["c_custkey"])
    lo = li.join(oc, li["l_orderkey"] == oc["o_orderkey"])
    ls = lo.join(F.broadcast(s), lo["l_suppkey"] == s["s_suppkey"]).where(
        F.col("s_nationkey") == F.col("c_nationkey")
    )
    return (
        ls.groupBy("n_name")
        .agg(
            (F.sum("disc_cents") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("l_orderkey").alias("order_checksum"),
        )
        .repartition(1).sortWithinPartitions(F.desc("revenue"), F.asc("n_name"))
    )


def local_supplier_volume_sql() -> str:
    return f"""
SELECT n_name,
       SUM(CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT)) / 100.0
         AS revenue,
       COUNT(*) AS n_lines,
       CAST(SUM(l_orderkey) AS BIGINT) AS order_checksum
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = '{Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{Q5_DATE_LO}'
  AND o_orderdate < TIMESTAMP '{Q5_DATE_HI}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --- TPC-H Q17 analog: small-quantity-order revenue ---------------------------

Q17_BRAND = "Brand#19"


def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (Small-Quantity-Order Revenue): total revenue of
    lineitems whose quantity is below 20% of the per-part average, for
    one brand — the correlated-scalar-subquery pattern decorrelated
    into a per-part aggregate joined back to the fact.

    The 0.2·avg threshold is evaluated EXACTLY in integers:
    qty < 0.2 · (sum_qty / cnt)  ⇔  5 · qty · cnt < sum_qty
    (quantities are integral in the fixture), so no float division ever
    enters the predicate and the result is reshuffle-proof.

    Scale shape: the per-part avg is ONE partial+final agg over the
    brand-filtered fact (the brand dim is a broadcast semi-filter
    applied BEFORE the agg, so the agg only sees the brand's rows);
    the join-back is co-partitioned on partkey.  Output is a 1-row
    census, so the final agg is a reduce."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        cents(F.col("l_extendedprice")).alias("price_cents"),
    )
    lb = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    g = lb.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    q = lb.join(g, "l_partkey").where(
        F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty")
    )
    return q.agg(
        F.count(F.lit(1)).alias("n_small_lines"),
        (F.sum("price_cents") / 100.0).alias("small_revenue"),
        F.sum(F.col("qty")).alias("qty_sum"),
    )


def small_qty_revenue_sql() -> str:
    return f"""
WITH lb AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
g AS (SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS cnt FROM lb GROUP BY 1)
SELECT COUNT(*) AS n_small_lines,
       SUM(price_cents) / 100.0 AS small_revenue,
       CAST(SUM(qty) AS BIGINT) AS qty_sum
FROM lb JOIN g USING (l_partkey)
WHERE 5 * qty * cnt < sum_qty
"""


# --- TPC-H Q18 analog: large-volume orders ------------------------------------

Q18_QTY = 170


def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (Large Volume Customer): orders whose total
    lineitem quantity exceeds Q18_QTY, with the customer attached — the
    HAVING-on-grouped-fact pattern (group lineitem by order, filter on
    the aggregate, join the survivors back to the dims).

    Scale shape: the quantity rollup shuffles lineitem ONCE on
    orderkey; the survivor set (the HAVING filter) is tiny, so the
    joins back to orders and customer are broadcast-able survivor-side
    lookups — Catalyst/AQE sees the post-agg size and flips them to
    broadcasts.  No global sort: deterministic presentation order via
    the single-partition sort of a small result."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("qty")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty").alias("sum_qty"))
        .where(F.col("sum_qty") > Q18_QTY)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", cents(F.col("o_totalprice")).alias("tp_c")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = big.join(o, big["l_orderkey"] == o["o_orderkey"]).join(
        c, F.col("o_custkey") == c["c_custkey"]
    )
    return (
        j.select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            (F.col("tp_c") / 100.0).alias("o_totalprice"),
            "sum_qty",
        )
        .repartition(1).sortWithinPartitions(
            F.desc("o_totalprice"), F.asc("o_orderkey")
        )
    )


def large_volume_orders_sql() -> str:
    return f"""
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_date,
       CAST(round(o_totalprice * 100) AS BIGINT) / 100.0 AS o_totalprice,
       CAST(sum_qty AS BIGINT) AS sum_qty
FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING sum_qty > {Q18_QTY}) big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey
"""


# --- per-user lag autocovariance census ---------------------------------------

ACF_MAX_LAG = 3


def autocorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-k autocovariance raw moments (the ACF numerators of
    Box-Jenkins diagnostics / seasonality detection, kept as EXACT
    integer sums — the float normalization r_k = (Σv_t·v_{t+k} −
    n·μ²)/σ² is a client-side divide): for each user's event-value
    series in time order, Σv, Σv², and Σ v_t·v_{t+k} for k = 1..3 on
    exact integer cents.

    Scale shape: ONE user-key shuffle for the ordered window; the lag
    products are lead() columns inside the same window pass (no
    self-join); final agg is per-user partial+final.  Ties on ts are
    broken by event_id so the series order is total and reshuffle-proof."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        cents(F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "v",
        *[F.lead("v", k).over(w).alias(f"v{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    return (
        lagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.sum(F.col("v") * F.col("v")).alias("sum_v2"),
            *[
                F.sum(
                    F.when(F.col(f"v{k}").isNotNull(), F.col("v") * F.col(f"v{k}"))
                    .otherwise(F.lit(0))
                ).alias(f"lag{k}_sum")
                for k in range(1, ACF_MAX_LAG + 1)
            ],
        )
        .repartition(1).sortWithinPartitions("user_id")
    )


def autocorr_lags_sql() -> str:
    lags = ",\n       ".join(
        f"CAST(SUM(COALESCE(v * v{k}, 0)) AS BIGINT) AS lag{k}_sum"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    leads = ", ".join(
        f"lead(v, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS v{k}"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    return f"""
WITH ev AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS v, {leads}
  FROM events
)
SELECT user_id,
       COUNT(*) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(v * v) AS BIGINT) AS sum_v2,
       {lags}
FROM ev GROUP BY user_id ORDER BY user_id
"""


# --- CUSUM drift detection ------------------------------------------------------


def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user CUSUM drift census (Page 1954 — the classic sequential
    change-point statistic; the monitoring primitive behind data-drift
    alerts): deviations from the user's own integer-floored mean are
    cumulatively summed in time order, and the maximum upward / minimum
    downward excursions plus their positions pin the drift profile
    exactly.

    Two-pass shape: pass 1 = per-user mean as exact integers (Σv // n);
    pass 2 = running window over the SAME user partitioning — the join
    back is co-partitioned on user_id, so pass 2 reuses pass 1's
    shuffle under AQE.  All arithmetic integer cents; no float enters
    the surface."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents(F.col("value")).alias("v")
    )
    # explicit floor in BOTH engines (a bare cast truncates in Spark but
    # ROUNDS in DuckDB); cent sums stay far below 2^53 so the double is exact
    mu = ev.groupBy("user_id").agg(
        F.floor(F.sum("v") / F.count(F.lit(1))).cast("long").alias("mu")
    )
    j = ev.join(mu, "user_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = j.select(
        "user_id",
        F.sum(F.col("v") - F.col("mu")).over(w).alias("cusum"),
        F.row_number().over(wo).alias("pos"),
    )
    return (
        c.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("cusum").alias("max_up"),
            F.min("cusum").alias("max_down"),
            # argmax pos packed as cusum*2^20 + pos (pos < 2^20, so the
            # key is strictly monotone in (cusum, pos)); floored mod
            # unpacks it identically for negative cusum in both engines
            F.pmod(F.max(F.col("cusum") * 1048576 + F.col("pos")), F.lit(1048576))
            .cast("long").alias("argmax_pos"),
            F.sum(F.abs("cusum")).alias("abs_excursion"),
        )
        .repartition(1).sortWithinPartitions("user_id")
    )


def cusum_drift_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
mu AS (
  SELECT user_id, CAST(floor(SUM(v) / COUNT(*)) AS BIGINT) AS mu
  FROM ev GROUP BY user_id
),
c AS (
  SELECT ev.user_id,
         SUM(v - mu) OVER (PARTITION BY ev.user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum,
         row_number() OVER (PARTITION BY ev.user_id ORDER BY ts, event_id) AS pos
  FROM ev JOIN mu ON ev.user_id = mu.user_id
)
SELECT user_id,
       COUNT(*) AS n,
       CAST(MAX(cusum) AS BIGINT) AS max_up,
       CAST(MIN(cusum) AS BIGINT) AS max_down,
       CAST(((MAX(cusum * 1048576 + pos) % 1048576) + 1048576) % 1048576 AS BIGINT) AS argmax_pos,
       CAST(SUM(abs(cusum)) AS BIGINT) AS abs_excursion
FROM c GROUP BY user_id ORDER BY user_id
"""


# --- TPC-H Q8 analog: national market share ------------------------------------

Q8_REGION = "ASIA"
Q8_TYPE = "ECONOMY"
Q8_NATION = "NATION_7"


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (National Market Share): within the market
    'Q8_TYPE parts bought by Q8_REGION customers', the per-order-year
    revenue share attributable to suppliers of ONE nation — the widest
    join pyramid in the suite (lineitem⋈orders⋈customer⋈nation⋈region
    ⋈part⋈supplier⋈nation) with a conditional-share rollup, reported as
    exact integer ppm (10⁶·nation_cents // total_cents).

    Scale shape: part (type-filtered), supplier, and the two nation
    dims broadcast; orders⋈customer shuffles on custkey; the
    lineitem⋈orders join is the only big-big shuffle (orderkey).  The
    share is a conditional partial+final agg on ≤|years| keys — never a
    second pass over the market."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    nr = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        F.col("n_nationkey").alias("cnat")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    c = c.join(F.broadcast(nr), c["c_nationkey"] == nr["cnat"]).select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == Q8_TYPE)
        .select("p_partkey")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snat"), "n_name"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    s = s.join(F.broadcast(sn), s["s_nationkey"] == sn["snat"]).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    oc = o.join(c, o["o_custkey"] == c["c_custkey"])
    lo = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).join(
        oc, li["l_orderkey"] == oc["o_orderkey"]
    )
    ls = lo.join(F.broadcast(s), lo["l_suppkey"] == s["s_suppkey"])
    return (
        ls.groupBy("o_year")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == Q8_NATION, F.col("disc_cents"))
                .otherwise(F.lit(0))
            ).alias("nation_cents"),
            F.sum("disc_cents").alias("total_cents"),
        )
        .select(
            F.col("o_year").cast("long").alias("o_year"),
            (F.col("nation_cents") / 100.0).alias("nation_revenue"),
            (F.col("total_cents") / 100.0).alias("total_revenue"),
            F.expr("div(1000000 * nation_cents, total_cents)").alias("share_ppm"),
        )
        .repartition(1).sortWithinPartitions("o_year")
    )


def market_share_sql() -> str:
    return f"""
WITH m AS (
  SELECT year(o_orderdate) AS o_year,
         sn.n_name AS supp_nation,
         CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT)
           AS disc_cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = '{Q8_REGION}'
  JOIN part ON l_partkey = p_partkey AND p_type = '{Q8_TYPE}'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT CAST(o_year AS BIGINT) AS o_year,
       SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN disc_cents ELSE 0 END) / 100.0
         AS nation_revenue,
       SUM(disc_cents) / 100.0 AS total_revenue,
       CAST((1000000 * SUM(CASE WHEN supp_nation = '{Q8_NATION}' THEN disc_cents ELSE 0 END))
            // SUM(disc_cents) AS BIGINT) AS share_ppm
FROM m GROUP BY o_year ORDER BY o_year
"""


# --- TPC-H Q14 analog: promotion revenue share ----------------------------------


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (Promotion Effect): per ship-month, the share of
    revenue from PROMO-type parts as exact integer ppm — the
    conditional-aggregate-over-a-dim-attribute pattern.

    Scale shape: the part dim broadcasts onto the fact scan (one map
    side hash probe); the rollup is a partial+final agg on ≤|months|
    keys.  No per-month second pass, no join after the agg."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return (
        j.groupBy("ship_month")
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("disc_cents")).otherwise(F.lit(0))
            ).alias("promo_cents"),
            F.sum("disc_cents").alias("total_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "ship_month",
            (F.col("promo_cents") / 100.0).alias("promo_revenue"),
            (F.col("total_cents") / 100.0).alias("total_revenue"),
            F.expr("div(1000000 * promo_cents, total_cents)").alias("promo_ppm"),
            "n_lines",
        )
        .repartition(1).sortWithinPartitions("ship_month")
    )


def promo_revenue_sql() -> str:
    return """
WITH j AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         p_type,
         CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT)
           AS disc_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT ship_month,
       SUM(CASE WHEN p_type = 'PROMO' THEN disc_cents ELSE 0 END) / 100.0
         AS promo_revenue,
       SUM(disc_cents) / 100.0 AS total_revenue,
       CAST((1000000 * SUM(CASE WHEN p_type = 'PROMO' THEN disc_cents ELSE 0 END))
            // SUM(disc_cents) AS BIGINT) AS promo_ppm,
       COUNT(*) AS n_lines
FROM j GROUP BY ship_month ORDER BY ship_month
"""


# --- TPC-H Q7 analog: volume shipping between two nations -----------------------

Q7_NATION_A = "NATION_2"
Q7_NATION_B = "NATION_7"


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (Volume Shipping): revenue flowing between two
    named nations in either direction, per (supp_nation, cust_nation,
    ship-year) — the symmetric two-dim filter + year rollup.

    Scale shape: both nation-keyed dims reduce to broadcast lookups on
    supplier/customer; the OR-of-two-directions predicate is applied
    AFTER both small joins as codegen'd Column logic, so it never
    degrades a join key; the only big-big join is lineitem⋈orders on
    orderkey; final agg is on ≤2·n_years keys.  Revenue exact cents."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    s = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    c = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
    )
    ab = (F.col("supp_nation") == Q7_NATION_A) & (F.col("cust_nation") == Q7_NATION_B)
    ba = (F.col("supp_nation") == Q7_NATION_B) & (F.col("cust_nation") == Q7_NATION_A)
    return (
        j.where(ab | ba)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            (F.sum("disc_cents") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "supp_nation", "cust_nation",
            F.col("l_year").cast("long").alias("l_year"),
            "revenue", "n_lines",
        )
        .repartition(1).sortWithinPartitions("supp_nation", "cust_nation", "l_year")
    )


def volume_shipping_sql() -> str:
    return f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       SUM(CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT)) / 100.0
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE (sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
   OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}')
GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


# --- KMV distinct-count sketch with exact audit ----------------------------------

KMV_K = 64


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch with an exact audit
    (Bar-Yossef et al. RANDOM'02; the bottom-k sketch inside Theta
    sketches): hash every l_orderkey to h40, keep the K smallest
    distinct hashes, estimate distinct = (K−1)·2⁴⁰ // h_K, and report
    the exact distinct count plus the signed error in ppm — the sketch,
    its audit, and its error all on one row.

    Scale shape: distinct-hash reduction is ONE partial+final agg;
    the K smallest arrive via a distributed TakeOrdered (sort+limit =
    TakeOrderedAndProject — never a global sort); the estimate is a
    1-row reduce.  At 10¹² rows the K-minimum pass is exactly how a
    Theta-sketch union would shard."""
    from .textops import h40

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    hashes = li.select(
        h40(F.col("l_orderkey").cast("string")).alias("hv")
    ).distinct()
    kmin = hashes.orderBy("hv").limit(KMV_K)
    hk = kmin.agg(F.max("hv").alias("hk"), F.count(F.lit(1)).alias("k"))
    exact = li.agg(F.countDistinct("l_orderkey").alias("exact_distinct"))
    est = F.expr(f"div(CAST({KMV_K - 1} AS BIGINT) * {1 << 40}, hk)")
    return hk.crossJoin(exact).select(
        "k",
        "hk",
        est.alias("kmv_estimate"),
        "exact_distinct",
        F.expr(
            f"div(1000000 * (CAST({KMV_K - 1} * {1 << 40} AS BIGINT) DIV hk"
            " - exact_distinct), exact_distinct)"
        ).alias("err_ppm"),
    )


def kmv_distinct_sql() -> str:
    h = "CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 10) AS BIGINT)"
    return f"""
WITH hs AS (SELECT DISTINCT {h} AS hv FROM lineitem),
km AS (SELECT hv FROM hs ORDER BY hv LIMIT {KMV_K}),
hk AS (SELECT MAX(hv) AS hk, COUNT(*) AS k FROM km),
ex AS (SELECT COUNT(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
SELECT CAST(k AS BIGINT) AS k,
       CAST(hk AS BIGINT) AS hk,
       CAST({KMV_K - 1}::BIGINT * {1 << 40} // hk AS BIGINT) AS kmv_estimate,
       CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST((1000000 * ({KMV_K - 1}::BIGINT * {1 << 40} // hk - exact_distinct))
            // exact_distinct AS BIGINT) AS err_ppm
FROM hk, ex
"""


# --- TPC-H Q19 analog: bracketed discounted revenue -------------------------------

Q19_BRACKETS = (
    ("Brand#11", 1, 5, 1, 11),    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#22", 1, 10, 10, 20),
    ("Brand#33", 1, 15, 20, 30),
)


def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (Discounted Revenue): revenue from lineitems
    matching ANY of three (brand, size-range, quantity-range) brackets
    — the OR-of-ANDs predicate that stresses a planner's disjunction
    pushdown: the common prefix (the part join key) stays a pure
    equi-join, and the disjunction evaluates post-join as codegen'd
    Column logic instead of splitting the scan three ways.

    Output: one row per bracket plus the union row, each with exact
    cents revenue and line counts (the per-bracket decomposition pins
    which arm matched — brackets here are disjoint by quantity)."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    arms = []
    for name, (brand, slo, shi, qlo, qhi) in zip("abc", Q19_BRACKETS):
        arms.append(
            (
                (F.col("p_brand") == brand)
                & F.col("p_size").between(slo, shi)
                & F.col("qty").between(qlo, qhi)
            ).alias(f"arm_{name}")
        )
    j = j.select("disc_cents", *arms)
    rows = []
    for name, (brand, *_rest) in zip("abc", Q19_BRACKETS):
        rows.append(
            j.where(F.col(f"arm_{name}"))
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                (F.sum("disc_cents") / 100.0).alias("revenue"),
            )
            .select(F.lit(f"bracket_{name}").alias("bracket"), "n_lines", "revenue")
        )
    rows.append(
        j.where(F.col("arm_a") | F.col("arm_b") | F.col("arm_c"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.sum("disc_cents") / 100.0).alias("revenue"),
        )
        .select(F.lit("union").alias("bracket"), "n_lines", "revenue")
    )
    res = rows[0]
    for df in rows[1:]:
        res = res.unionByName(df)
    return res.repartition(1).sortWithinPartitions("bracket")


def bracket_revenue_sql() -> str:
    conds = []
    for brand, slo, shi, qlo, qhi in Q19_BRACKETS:
        conds.append(
            f"(p_brand = '{brand}' AND p_size BETWEEN {slo} AND {shi}"
            f" AND l_quantity BETWEEN {qlo} AND {qhi})"
        )
    arms = " UNION ALL ".join(
        f"""
SELECT 'bracket_{name}' AS bracket, COUNT(*) AS n_lines,
       SUM(disc_cents) / 100.0 AS revenue
FROM j WHERE {cond}"""
        for name, cond in zip("abc", conds)
    )
    return f"""
WITH j AS (
  SELECT p_brand, p_size, CAST(l_quantity AS BIGINT) AS l_quantity,
         CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT)
           AS disc_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT * FROM ({arms}
UNION ALL
SELECT 'union' AS bracket, COUNT(*) AS n_lines, SUM(disc_cents) / 100.0 AS revenue
FROM j WHERE {" OR ".join(conds)})
ORDER BY bracket
"""


# --- TPC-H Q12 analog: late-shipment priority census -------------------------------

Q12_LATE_DAYS = 60


def late_priority_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (Shipping Modes and Order Priority): per order
    priority, how many lineitems shipped late (> Q12_LATE_DAYS after
    the order date) vs on time, with the late revenue — the two-way
    conditional-count pattern Q12 uses to correlate service level with
    priority class.

    Scale shape: lineitem⋈orders co-partitions on orderkey (the one
    big-big join); both counts are conditional sums in ONE partial+final
    agg on a 5-key domain — never two passes."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        (F.datediff("l_shipdate", "o_orderdate") > Q12_LATE_DAYS).alias("late"),
        "disc_cents",
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.sum(F.col("late").cast("long")).alias("n_late"),
            F.sum((~F.col("late")).cast("long")).alias("n_ontime"),
            (F.sum(F.when(F.col("late"), F.col("disc_cents")).otherwise(0)) / 100.0)
            .alias("late_revenue"),
        )
        .repartition(1).sortWithinPartitions("o_orderpriority")
    )


def late_priority_census_sql() -> str:
    return f"""
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {Q12_LATE_DAYS}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {Q12_LATE_DAYS}
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_ontime,
       SUM(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > {Q12_LATE_DAYS}
                THEN CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT)
                ELSE 0 END) / 100.0 AS late_revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- bitmap-index set operations ---------------------------------------------------

BM_WORD_BITS = 32  # pack keys into 32-bit words: 1 << (k % 32) stays positive


def bitmap_index_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-index set algebra (the Roaring/BitFunnel primitive behind
    every OLAP secondary index): per event type, the set of active
    (user, hour-of-day) slots packed into 32-bit words via bit_or, then
    every type pair answered by word-wise AND/OR + popcount — set
    intersection/union WITHOUT a distinct or a join on the raw rows.

    Output per (type_a < type_b): exact intersection, union, Jaccard
    ppm.

    Scale shape: the bitmap build is ONE combiner-friendly (type, word)
    bit_or agg — bit_or is associative, so map-side partials do almost
    all the work; the pair algebra joins the WORD relations (≤ types ×
    keyspace/32 rows — index-sized, not data-sized).  This is exactly
    why bitmap indexes win at 10¹² rows: the fact table is touched
    once."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") * 24 + F.hour("ts")).alias("k"),
    )
    words = (
        ev.select(
            "event_type",
            (F.col("k") / BM_WORD_BITS).cast("long").alias("w"),
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(k % {BM_WORD_BITS} AS INT))").alias("bv"),
        )
        .groupBy("event_type", "w")
        .agg(F.bit_or("bv").alias("bits"))
    )
    a = words.select(
        F.col("event_type").alias("type_a"), "w", F.col("bits").alias("ba")
    )
    b = words.select(
        F.col("event_type").alias("type_b"), "w", F.col("bits").alias("bb")
    )
    pairs = (
        a.join(b, ["w"]).where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb")))).alias("n_inter"),
            F.sum(F.bit_count(F.col("ba").bitwiseOR(F.col("bb")))).alias("n_union_shared"),
        )
    )
    # words present in only one bitmap still count toward the union
    tot = words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_set")
    )
    ta = tot.select(F.col("event_type").alias("type_a"), F.col("n_set").alias("na"))
    tb = tot.select(F.col("event_type").alias("type_b"), F.col("n_set").alias("nb"))
    return (
        pairs.join(ta, "type_a").join(tb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            F.expr("div(1000000 * n_inter, na + nb - n_inter)").alias("jaccard_ppm"),
        )
        .repartition(1).sortWithinPartitions("type_a", "type_b")
    )


def bitmap_index_ops_sql() -> str:
    return f"""
WITH ev AS (
  SELECT event_type, user_id * 24 + hour(ts) AS k FROM events
),
words AS (
  SELECT event_type, k // {BM_WORD_BITS} AS w,
         bit_or(1::BIGINT << (k % {BM_WORD_BITS})) AS bits
  FROM ev GROUP BY event_type, k // {BM_WORD_BITS}
),
tot AS (SELECT event_type, SUM(bit_count(bits)) AS n_set FROM words GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         SUM(bit_count(a.bits & b.bits)) AS n_inter
  FROM words a JOIN words b ON a.w = b.w AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT type_a, type_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(ta.n_set + tb.n_set - n_inter AS BIGINT) AS n_union,
       CAST((1000000 * n_inter) // (ta.n_set + tb.n_set - n_inter) AS BIGINT)
         AS jaccard_ppm
FROM pairs
JOIN tot ta ON ta.event_type = type_a
JOIN tot tb ON tb.event_type = type_b
ORDER BY type_a, type_b
"""


# --- equi-width histogram quantile sketch with exact audit --------------------------

HQ_BUCKETS = 256
HQ_QUANTS = (50, 90, 99)


def histogram_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram quantile estimation with an exact audit
    (the fixed-bucket sketch inside every profiler, vs true order
    statistics): o_totalprice in cents is bucketed into HQ_BUCKETS
    equal widths, each quantile is estimated by floor-interpolating
    inside its cumulative bucket, and the EXACT rank statistic
    (sorted(v)[q·n//100], the stretch/percentile convention) is
    reported beside it with the signed error.

    Scale shape: min/max + bucket counts are two combiner-friendly
    aggs (the histogram relation is 256 rows — broadcast scale); the
    exact side reuses the distributed global-rank idiom
    (repartitionByRange + per-partition row_number + offsets), never a
    single-task global sort."""
    o = _t(spark, sf_dir, "orders").select(
        cents(F.col("o_totalprice")).alias("v"), "o_orderkey"
    )
    mm = o.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    wb = o.crossJoin(F.broadcast(mm)).select(
        "v",
        F.expr(
            f"least(CAST(div((v - lo) * {HQ_BUCKETS}, hi - lo + 1) AS INT), {HQ_BUCKETS - 1})"
        ).alias("b"),
    )
    hist = wb.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    cum = hist.repartition(1).select(
        "b",
        "c",
        F.sum("c").over(Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    # exact ranks via range partitioning + local row numbers + offsets
    rp = o.repartitionByRange(32, "v", "o_orderkey")
    part = rp.withColumn("pid", F.spark_partition_id())
    wp = Window.partitionBy("pid").orderBy("v", "o_orderkey")
    loc = part.withColumn("lrn", F.row_number().over(wp))
    sizes = loc.groupBy("pid").agg(F.max("lrn").alias("sz"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.repartition(1).select(
        "pid", F.coalesce(F.sum("sz").over(wo), F.lit(0)).alias("off")
    )
    ranked = loc.join(F.broadcast(offs), "pid").select(
        "v", (F.col("lrn") + F.col("off")).alias("rank")
    )
    rows = []
    for q in HQ_QUANTS:
        est = (
            cum.crossJoin(F.broadcast(mm))
            .where(F.col("cum") >= F.expr(f"greatest(1, div({q} * n, 100))"))
            .orderBy("b")
            .limit(1)
            .select(
                F.expr(f"lo + div((b + 1) * (hi - lo + 1), {HQ_BUCKETS})").alias("est")
            )
        )
        exact = (
            ranked.crossJoin(F.broadcast(mm))
            .where(F.col("rank") == F.expr(f"greatest(1, div({q} * n, 100))"))
            .select(F.col("v").alias("exact"))
        )
        rows.append(
            est.crossJoin(exact).select(
                F.lit(q).cast("long").alias("q"),
                (F.col("est") / 100.0).alias("est_price"),
                (F.col("exact") / 100.0).alias("exact_price"),
                ((F.col("est") - F.col("exact")) / 100.0).alias("err"),
            )
        )
    res = rows[0]
    for df in rows[1:]:
        res = res.unionByName(df)
    return res.repartition(1).sortWithinPartitions("q")


def histogram_quantile_audit_sql() -> str:
    arms = " UNION ALL ".join(
        f"""
SELECT {q} AS q,
       (SELECT lo + ((b + 1) * (hi - lo + 1)) // {HQ_BUCKETS}
        FROM cum, mm WHERE cum >= greatest(1, ({q} * n) // 100)
        ORDER BY b LIMIT 1) AS est,
       (SELECT v FROM rk, mm WHERE rank = greatest(1, ({q} * n) // 100)) AS exact"""
        for q in HQ_QUANTS
    )
    return f"""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, o_orderkey FROM orders
),
mm AS (SELECT MIN(v) AS lo, MAX(v) AS hi, COUNT(*) AS n FROM o),
wb AS (
  SELECT v, least(CAST(((v - lo) * {HQ_BUCKETS}) // (hi - lo + 1) AS INT),
                  {HQ_BUCKETS - 1}) AS b
  FROM o, mm
),
hist AS (SELECT b, COUNT(*) AS c FROM wb GROUP BY b),
cum AS (SELECT b, SUM(c) OVER (ORDER BY b) AS cum FROM hist),
rk AS (SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rank FROM o)
SELECT CAST(q AS BIGINT) AS q,
       est / 100.0 AS est_price,
       exact / 100.0 AS exact_price,
       (est - exact) / 100.0 AS err
FROM ({arms}) ORDER BY q
"""


# --- seasonal-naive forecast backtest ------------------------------------------------

SN_SEASON_H = 24  # seasonal lag in hours


def seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest (the v̂(t) = v(t − 24h) baseline
    every forecasting eval is scored against; Hyndman's benchmark
    method): per-user hourly value sums, forecast = same hour yesterday,
    scored by exact integer MAE numerator Σ|v − v̂| and the sMAPE
    surrogate Σ 2·10³·|v−v̂| // (|v|+|v̂|) (per-term truncating division
    — identical in both engines).

    Scale shape: the hourly rollup is ONE (user, hour) agg; the
    seasonal join is a self-equi-join on (user, hour − 24) —
    co-partitioned with the rollup, so AQE plans it off the same
    exchange; final per-user rollup is combiner-friendly."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        cents(F.col("value")).alias("v"),
    )
    hourly = ev.groupBy("user_id", "h").agg(F.sum("v").alias("v"))
    cur = hourly.select("user_id", "h", "v")
    prev = hourly.select(
        "user_id", (F.col("h") + SN_SEASON_H).alias("h"), F.col("v").alias("vhat")
    )
    j = cur.join(prev, ["user_id", "h"])
    term = F.expr("div(2000 * abs(v - vhat), abs(v) + abs(vhat))")
    return (
        j.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.sum(F.abs(F.col("v") - F.col("vhat"))).alias("mae_cents_sum"),
            F.sum(F.when(F.col("v") + F.col("vhat") != 0, term).otherwise(0)).alias(
                "smape_milli_sum"
            ),
        )
        .repartition(1).sortWithinPartitions("user_id")
    )


def seasonal_backtest_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
hourly AS (SELECT user_id, h, SUM(v) AS v FROM ev GROUP BY user_id, h),
j AS (
  SELECT c.user_id, c.v, p.v AS vhat
  FROM hourly c JOIN hourly p
    ON p.user_id = c.user_id AND p.h = c.h - {SN_SEASON_H}
)
SELECT user_id,
       COUNT(*) AS n_scored,
       CAST(SUM(abs(v - vhat)) AS BIGINT) AS mae_cents_sum,
       CAST(SUM(CASE WHEN v + vhat <> 0
                     THEN (2000 * abs(v - vhat)) // (abs(v) + abs(vhat))
                     ELSE 0 END) AS BIGINT) AS smape_milli_sum
FROM j GROUP BY user_id ORDER BY user_id
"""


# --- RFM customer segmentation --------------------------------------------------------

RFM_ASOF = "2001-09-01"
RFM_R_DAYS = 365     # recent = ordered within the last year
RFM_F_MIN = 12       # frequent = at least this many orders
RFM_M_MIN = 150_000  # monetary = lifetime cents at least this


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (the classic recency/frequency/
    monetary marketing rollup): per customer, days since last order,
    order count and lifetime cents; then the 8-cell R×F×M census with
    value totals — fixed normative thresholds (quantile-free, so the
    segmentation is a pure function of the data).

    Scale shape: ONE custkey agg builds all three signals in a single
    pass; the segment census is a ≤8-key partial+final rollup."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.lit(RFM_ASOF), F.col("o_orderdate")).alias("age_d"),
        cents(F.col("o_totalprice")).alias("tp"),
    )
    per_c = o.groupBy("o_custkey").agg(
        F.min("age_d").alias("recency_d"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("tp").alias("monetary_c"),
    )
    seg = per_c.select(
        (F.col("recency_d") <= RFM_R_DAYS).cast("int").alias("r"),
        (F.col("frequency") >= RFM_F_MIN).cast("int").alias("f"),
        (F.col("monetary_c") >= RFM_M_MIN).cast("int").alias("m"),
        "monetary_c",
        "o_custkey",
    )
    return (
        seg.groupBy("r", "f", "m")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("monetary_c") / 100.0).alias("segment_value"),
            F.sum("o_custkey").alias("cust_checksum"),
        )
        .repartition(1).sortWithinPartitions("r", "f", "m")
    )


def rfm_segments_sql() -> str:
    return f"""
WITH per_c AS (
  SELECT o_custkey,
         MIN(date_diff('day', o_orderdate, TIMESTAMP '{RFM_ASOF}')) AS recency_d,
         COUNT(*) AS frequency,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS monetary_c
  FROM orders GROUP BY o_custkey
)
SELECT CAST(recency_d <= {RFM_R_DAYS} AS INT) AS r,
       CAST(frequency >= {RFM_F_MIN} AS INT) AS f,
       CAST(monetary_c >= {RFM_M_MIN} AS INT) AS m,
       COUNT(*) AS n_customers,
       SUM(monetary_c) / 100.0 AS segment_value,
       CAST(SUM(o_custkey) AS BIGINT) AS cust_checksum
FROM per_c GROUP BY 1, 2, 3 ORDER BY r, f, m
"""


# --- market-basket association rules ---------------------------------------------------

BASKET_TOPK = 20
BASKET_MIN_AB = 3  # rule support floor (co-occurrence count)


def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (Agrawal & Srikant's Apriori
    output layer; FPGrowth's rule stage): part pairs co-purchased in
    the same order with exact integer support / confidence(ppm) /
    lift(ppm), top-BASKET_TOPK by (support DESC, pair) — confidence =
    10⁶·n_ab // n_a for the a⇒b direction with a the lower key, lift
    symmetric.

    Scale shape: pair generation is the order-keyed self-join (the
    co-occurrence explode is bounded per order by basket size); both
    marginals come from ONE part census joined back broadcast; ranking
    is TakeOrdered, never a global sort."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_orders = _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    marg = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_single"))
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    ab = (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= BASKET_MIN_AB)
    )
    ma = marg.select(F.col("l_partkey").alias("pa"), F.col("n_single").alias("n_a"))
    mb = marg.select(F.col("l_partkey").alias("pb"), F.col("n_single").alias("n_b"))
    scored = (
        ab.join(F.broadcast(ma), "pa")
        .join(F.broadcast(mb), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("div(1000000 * n_ab, n_a)").alias("conf_ppm"),
            F.expr("div(1000000 * n_ab * n_orders, n_a * n_b)").alias("lift_ppm"),
        )
    )
    return scored.orderBy(
        F.desc("n_ab"), F.asc("pa"), F.asc("pb")
    ).limit(BASKET_TOPK)


def basket_rules_sql() -> str:
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
no AS (SELECT COUNT(*) AS n_orders FROM orders),
marg AS (SELECT l_partkey, COUNT(*) AS n_single FROM li GROUP BY 1),
ab AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {BASKET_MIN_AB}
)
SELECT pa, pb, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ma.n_single AS BIGINT) AS n_a,
       CAST(mb.n_single AS BIGINT) AS n_b,
       CAST((1000000 * n_ab) // ma.n_single AS BIGINT) AS conf_ppm,
       CAST((1000000 * n_ab * n_orders) // (ma.n_single * mb.n_single) AS BIGINT)
         AS lift_ppm
FROM ab JOIN marg ma ON ma.l_partkey = pa
JOIN marg mb ON mb.l_partkey = pb, no
ORDER BY n_ab DESC, pa, pb LIMIT {BASKET_TOPK}
"""


# --- decision-stump Gini split search -------------------------------------------------

GINI_THRESHOLDS = tuple(range(10, 100, 10))  # candidate value-cent thresholds (x100)


def gini_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump split search by Gini impurity (the CART/xgboost
    inner loop, one feature): for each candidate threshold on the event
    value, the weighted Gini impurity of the two sides over the
    event-type label, as exact integers — per side impurity·10⁶ =
    10⁶·(n² − Σc²) // n², weighted by side mass; the argmin row is the
    chosen stump.

    Scale shape: ONE pass builds the (threshold, side, label) counts
    via a bounded explode of the candidate list (|T| rows per event —
    the classic histogram-split trick binned ahead of time); everything
    after is dims-sized (|T|·2·|labels|) arithmetic."""
    thr = F.array(*[F.lit(t * 100) for t in GINI_THRESHOLDS])
    ev = _t(spark, sf_dir, "events").select(
        "event_type", cents(F.col("value")).alias("v")
    )
    ex = ev.select(
        "event_type",
        F.explode(thr).alias("t"),
        "v",
    ).select("event_type", "t", (F.col("v") <= F.col("t")).cast("int").alias("side"))
    counts = ex.groupBy("t", "side", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    sides = counts.groupBy("t", "side").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
    )
    per_side = sides.select(
        "t",
        "side",
        "n",
        F.expr("div(1000000 * (n * n - sum_c2), n * n)").alias("gini_ppm"),
    )
    tot = per_side.groupBy("t").agg(
        F.sum("n").alias("n_total"),
        F.sum(F.col("n") * F.col("gini_ppm")).alias("weighted"),
    )
    return (
        tot.select(
            "t",
            "n_total",
            F.expr("div(weighted, n_total)").alias("weighted_gini_ppm"),
        )
        .repartition(1).sortWithinPartitions("t")
    )


def gini_split_sql() -> str:
    tl = ", ".join(str(t * 100) for t in GINI_THRESHOLDS)
    return f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
ex AS (
  SELECT event_type, t.t AS t, CAST(v <= t.t AS INT) AS side
  FROM ev, (SELECT unnest([{tl}]) AS t) t
),
counts AS (SELECT t, side, event_type, COUNT(*) AS c FROM ex GROUP BY 1, 2, 3),
sides AS (
  SELECT t, side, SUM(c) AS n, SUM(c * c) AS sum_c2 FROM counts GROUP BY 1, 2
),
per_side AS (
  SELECT t, side, n,
         (1000000 * (n * n - sum_c2)) // (n * n) AS gini_ppm
  FROM sides
)
SELECT CAST(t AS BIGINT) AS t,
       CAST(SUM(n) AS BIGINT) AS n_total,
       CAST(SUM(n * gini_ppm) // SUM(n) AS BIGINT) AS weighted_gini_ppm
FROM per_side GROUP BY t ORDER BY t
"""


# --- chi-square independence census ----------------------------------------------------


def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence census for event_type × hour-of-day (the
    contingency-table test behind seasonality and A/B sanity checks),
    with every term exact-integer: per cell the scaled statistic
    (O·N − r·c)² // (r·c·N) — truncating in both engines — summed per
    event type, plus the marginals.

    Scale shape: ONE (type, hour) count agg; marginals are two rollups
    of that dims-sized relation; the join-back is broadcast scale."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hh")
    )
    o = ev.groupBy("event_type", "hh").agg(F.count(F.lit(1)).alias("obs"))
    r = o.groupBy("event_type").agg(F.sum("obs").alias("row_n"))
    c = o.groupBy("hh").agg(F.sum("obs").alias("col_n"))
    n = o.agg(F.sum("obs").alias("grand_n"))
    j = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "hh")
        .crossJoin(F.broadcast(n))
    )
    term = F.expr(
        "div((obs * grand_n - row_n * col_n) * (obs * grand_n - row_n * col_n),"
        " row_n * col_n * grand_n)"
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.sum("obs").alias("n_events"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(term).alias("chisq_scaled"),
        )
        .repartition(1).sortWithinPartitions("event_type")
    )


def chisq_independence_sql() -> str:
    return """
WITH o AS (
  SELECT event_type, hour(ts) AS hh, COUNT(*) AS obs
  FROM events GROUP BY 1, 2
),
r AS (SELECT event_type, SUM(obs) AS row_n FROM o GROUP BY 1),
c AS (SELECT hh, SUM(obs) AS col_n FROM o GROUP BY 1),
n AS (SELECT SUM(obs) AS grand_n FROM o)
SELECT o.event_type,
       CAST(SUM(obs) AS BIGINT) AS n_events,
       COUNT(*) AS n_cells,
       CAST(SUM(((obs * grand_n - row_n * col_n) * (obs * grand_n - row_n * col_n))
                // (row_n * col_n * grand_n)) AS BIGINT) AS chisq_scaled
FROM o JOIN r ON o.event_type = r.event_type JOIN c ON o.hh = c.hh, n
GROUP BY o.event_type ORDER BY o.event_type
"""


# --- Fano-factor overdispersion census --------------------------------------------------


def fano_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor overdispersion census (variance-to-mean of hourly
    arrival counts — the Poisson-ness probe behind burst/anomaly
    detection): per event type, over its hourly count series, the exact
    moments and F·10⁶ = 10⁶·(n·Σc² − S²) // (S·(n−1)) — Fano ≈ 1e6
    means Poisson-like, ≫ means bursty.

    Scale shape: (type, hour) count agg then a per-type rollup — both
    combiner-friendly; no joins, no windows."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
    )
    hc = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("c"))
    return (
        hc.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("c").alias("n_events"),
            F.sum(F.col("c") * F.col("c")).alias("sum_c2"),
        )
        .select(
            "event_type",
            "n_hours",
            "n_events",
            "sum_c2",
            F.expr(
                "div(1000000 * (n_hours * sum_c2 - n_events * n_events),"
                " n_events * (n_hours - 1))"
            ).alias("fano_ppm"),
        )
        .repartition(1).sortWithinPartitions("event_type")
    )


def fano_dispersion_sql() -> str:
    return """
WITH hc AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       COUNT(*) AS n_hours,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(SUM(c * c) AS BIGINT) AS sum_c2,
       CAST((1000000 * (COUNT(*) * SUM(c * c) - SUM(c) * SUM(c)))
            // (SUM(c) * (COUNT(*) - 1)) AS BIGINT) AS fano_ppm
FROM hc GROUP BY event_type ORDER BY event_type
"""


# --- time-weighted average value (TWAP) -------------------------------------------------


def twap_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value (the TWAP of market data / the
    time-weighted mean of IoT state series — the aggregate a plain AVG
    gets wrong when samples are irregular): each event's value holds
    until the next event, so the exact integer numerator is
    Σ v·Δt_seconds per user, with the trailing sample contributing
    nothing (no holding interval).  The float TWAP = num/den is a
    client-side divide; both exact moments are emitted.

    Scale shape: ONE user-key window (lead for the next timestamp) +
    combiner-friendly rollup — the autocorr_lags contract."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        "event_id",
        cents(F.col("value")).alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    ld = ev.select(
        "user_id", "v", (F.lead("t", 1).over(w) - F.col("t")).alias("dt")
    )
    return (
        ld.where(F.col("dt").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt").alias("span_s"),
            F.sum(F.col("v") * F.col("dt")).alias("vt_cents_s"),
        )
        .repartition(1).sortWithinPartitions("user_id")
    )


def twap_value_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
ld AS (
  SELECT user_id, v,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id) - t AS dt
  FROM ev
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(dt) AS BIGINT) AS span_s,
       CAST(SUM(v * dt) AS BIGINT) AS vt_cents_s
FROM ld WHERE dt IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


# --- last-touch attribution ----------------------------------------------------------------


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution (the marketing-analytics
    standard: each purchase credits the event immediately preceding
    it): per user stream in time order, every 'purchase' looks one row
    back and the census rolls up purchases by preceding event type,
    with an id checksum pinning exactly WHICH purchases landed where.
    First-event purchases attribute to '(none)'.

    Scale shape: ONE user-key window (lag of type) + a dims-sized
    (≤ types+1 keys) partial+final census — the funnel shape without a
    self-join."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_id",
        "event_type",
        F.coalesce(F.lag("event_type", 1).over(w), F.lit("(none)")).alias("prev_type"),
    )
    return (
        lagged.where(F.col("event_type") == "purchase")
        .groupBy("prev_type")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("event_id").alias("purchase_checksum"),
        )
        .repartition(1).sortWithinPartitions("prev_type")
    )


def attribution_last_touch_sql() -> str:
    return """
WITH lagged AS (
  SELECT event_id, event_type,
         COALESCE(lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                  '(none)') AS prev_type
  FROM events
)
SELECT prev_type,
       COUNT(*) AS n_purchases,
       CAST(SUM(event_id) AS BIGINT) AS purchase_checksum
FROM lagged WHERE event_type = 'purchase'
GROUP BY prev_type ORDER BY prev_type
"""


# --- compass direction rose over OD trips --------------------------------------------


def direction_rose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compass direction-rose census over per-user consecutive event
    display-position moves (the mobility-analytics rose diagram; also
    the wind-rose shape): each consecutive pair of a user's events
    yields a displacement vector on the synthetic (value, event_id)
    plane-free route — here the trip vector between consecutive events'
    (cell-free) integer coordinates derived from event ids — and the
    8-sector compass bin is decided purely by sign and |dx| vs |dy|
    comparisons (no atan2, no float): E/NE/N/NW/W/SW/S/SE.

    Output per sector: n_trips, Σ|dx|, Σ|dy|, trip checksum.

    Scale shape: ONE user-key lead() window builds the vectors; the
    sector decision is codegen'd Column logic; final agg on 8 keys."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        ((F.col("event_id") * 37) % 401 - 200).alias("x"),
        ((F.col("event_id") * 53) % 401 - 200).alias("y"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = ev.select(
        "event_id",
        (F.lead("x", 1).over(w) - F.col("x")).alias("dx"),
        (F.lead("y", 1).over(w) - F.col("y")).alias("dy"),
    ).where(F.col("dx").isNotNull() & ((F.col("dx") != 0) | (F.col("dy") != 0)))
    ax, ay = F.abs("dx"), F.abs("dy")
    diag = (F.lit(2) * F.least(ax, ay)) > F.greatest(ax, ay)
    sector = (
        F.when(diag & (F.col("dx") > 0) & (F.col("dy") > 0), "NE")
        .when(diag & (F.col("dx") < 0) & (F.col("dy") > 0), "NW")
        .when(diag & (F.col("dx") < 0) & (F.col("dy") < 0), "SW")
        .when(diag & (F.col("dx") > 0) & (F.col("dy") < 0), "SE")
        .when(ax >= ay, F.when(F.col("dx") > 0, "E").otherwise("W"))
        .otherwise(F.when(F.col("dy") > 0, "N").otherwise("S"))
    )
    return (
        d.select(sector.alias("sector"), "dx", "dy", "event_id")
        .groupBy("sector")
        .agg(
            F.count(F.lit(1)).alias("n_trips"),
            F.sum(F.abs("dx")).alias("sum_adx"),
            F.sum(F.abs("dy")).alias("sum_ady"),
            F.sum("event_id").alias("trip_checksum"),
        )
        .repartition(1).sortWithinPartitions("sector")
    )


def direction_rose_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, ts, event_id,
         (event_id * 37) % 401 - 200 AS x,
         (event_id * 53) % 401 - 200 AS y
  FROM events
),
d AS (
  SELECT event_id,
         lead(x) OVER (PARTITION BY user_id ORDER BY ts, event_id) - x AS dx,
         lead(y) OVER (PARTITION BY user_id ORDER BY ts, event_id) - y AS dy
  FROM ev
),
s AS (
  SELECT event_id, dx, dy,
         CASE
           WHEN 2 * least(abs(dx), abs(dy)) > greatest(abs(dx), abs(dy))
                AND dx > 0 AND dy > 0 THEN 'NE'
           WHEN 2 * least(abs(dx), abs(dy)) > greatest(abs(dx), abs(dy))
                AND dx < 0 AND dy > 0 THEN 'NW'
           WHEN 2 * least(abs(dx), abs(dy)) > greatest(abs(dx), abs(dy))
                AND dx < 0 AND dy < 0 THEN 'SW'
           WHEN 2 * least(abs(dx), abs(dy)) > greatest(abs(dx), abs(dy))
                AND dx > 0 AND dy < 0 THEN 'SE'
           WHEN abs(dx) >= abs(dy) THEN CASE WHEN dx > 0 THEN 'E' ELSE 'W' END
           ELSE CASE WHEN dy > 0 THEN 'N' ELSE 'S' END
         END AS sector
  FROM d
  WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)
)
SELECT sector,
       COUNT(*) AS n_trips,
       CAST(SUM(abs(dx)) AS BIGINT) AS sum_adx,
       CAST(SUM(abs(dy)) AS BIGINT) AS sum_ady,
       CAST(SUM(event_id) AS BIGINT) AS trip_checksum
FROM s GROUP BY sector ORDER BY sector
"""


# --- OLS regression moments -----------------------------------------------------------


def ols_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed simple-OLS regression moments (the map-reduce form
    of every linear fit: sufficient statistics n, Σx, Σy, Σxy, Σx² in
    one combiner-friendly pass) for quantity-on-discount over lineitem,
    per returnflag — plus slope in micro units from the exact integer
    closed form (n·Σxy − Σx·Σy)·10³ // (n·Σx² − (Σx)²).  x = discount
    in per-mille (exact), y = quantity.  Milli, not ppm: the numerator
    n·Σxy·10³ stays inside int64 through sf1 (~2e19 would overflow at
    10⁶).

    Scale shape: ONE partial+final agg; no joins, no windows — the
    canonical 'regression as aggregation' distributed shape."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_discount") * 1000).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
    )
    return (
        m.select(
            "l_returnflag",
            "n",
            "sum_x",
            "sum_y",
            "sum_xy",
            "sum_x2",
            F.expr(
                "div(1000 * (n * sum_xy - sum_x * sum_y),"
                " n * sum_x2 - sum_x * sum_x)"
            ).alias("slope_milli"),
        )
        .repartition(1).sortWithinPartitions("l_returnflag")
    )


def ols_moments_sql() -> str:
    return """
WITH li AS (
  SELECT l_returnflag,
         CAST(round(l_discount * 1000) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       CAST(SUM(x * x) AS BIGINT) AS sum_x2,
       CAST((1000 * (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)))
            // (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS BIGINT) AS slope_milli
FROM li GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- inter-arrival log2 census ----------------------------------------------------------


def interarrival_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution census in log2 buckets (the
    burstiness profile behind queueing and anomaly models — an
    exponential process fills adjacent buckets geometrically): per
    event type, Δt seconds between consecutive events of THAT type per
    user, bucketed by floor(log2(Δt)) computed EXACTLY via binary-string
    length (length(bin(Δt)) − 1) — never float log2, whose libm
    rounding differs between JVM (ln/ln) and DuckDB at exact powers.
    Zero gaps land in bucket -1.

    Scale shape: ONE (user, type)-key lead() window + a dims-sized
    (types × ~40 buckets) census."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    d = ev.select(
        "event_type", (F.lead("t", 1).over(w) - F.col("t")).alias("dt")
    ).where(F.col("dt").isNotNull())
    bucket = F.when(F.col("dt") <= 0, F.lit(-1)).otherwise(
        F.length(F.expr("bin(dt)")) - 1
    )
    return (
        d.select("event_type", bucket.cast("long").alias("log2_bucket"), "dt")
        .groupBy("event_type", "log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("dt").alias("dt_sum"),
        )
        .repartition(1).sortWithinPartitions("event_type", "log2_bucket")
    )


def interarrival_census_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id
  FROM events
),
d AS (
  SELECT event_type,
         lead(t) OVER (PARTITION BY user_id, event_type ORDER BY t, event_id) - t
           AS dt
  FROM ev
)
SELECT event_type,
       CAST(CASE WHEN dt <= 0 THEN -1
                 ELSE length(printf('%b', dt)) - 1 END AS BIGINT) AS log2_bucket,
       COUNT(*) AS n_gaps,
       CAST(SUM(dt) AS BIGINT) AS dt_sum
FROM d WHERE dt IS NOT NULL
GROUP BY event_type, 2 ORDER BY event_type, log2_bucket
"""


# --- duplicate-payment detection --------------------------------------------------------

DUP_PAY_WINDOW_D = 7
DUP_PAY_MOD = 100  # orders with key % MOD == 0 get an injected resubmission


def duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment detection (the classic AP-audit query: same
    payer, same amount, dates within a week — almost always a double
    submission).  The synthetic order book carries no natural
    duplicates (amounts are high-entropy), so every 100th order injects
    a deterministic resubmission twin — same customer, same cents,
    +3 days, key offset by 10⁹ — mirrored exactly in the oracle (the
    pii_scan injection precedent); the audited behavior is the NEEDLE
    SEARCH: the pair join must fish exactly the injected twins out of
    the clean corpus.

    Scale shape: the pair join is an EQUI-join on (custkey, cents) —
    the fuzzy-dup trick of pushing every exact attribute into the key
    so only the date window stays a theta refine; group sizes are
    bounded by per-(payer, amount) multiplicity."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        cents(F.col("o_totalprice")).alias("tp"),
    )
    twins = o.where(F.col("o_orderkey") % DUP_PAY_MOD == 0).select(
        (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
        "o_custkey",
        F.date_add("o_orderdate", 3).alias("o_orderdate"),
        "tp",
    )
    book = o.select(
        "o_orderkey", "o_custkey", F.col("o_orderdate").cast("date").alias("o_orderdate"), "tp"
    ).unionByName(twins)
    a = book.select(
        F.col("o_custkey").alias("ck"), F.col("tp").alias("amt"),
        F.col("o_orderkey").alias("k1"), F.col("o_orderdate").alias("d1"),
    )
    b = book.select(
        F.col("o_custkey").alias("ck"), F.col("tp").alias("amt"),
        F.col("o_orderkey").alias("k2"), F.col("o_orderdate").alias("d2"),
    )
    pairs = (
        a.join(b, ["ck", "amt"])
        .where(
            (F.col("k1") < F.col("k2"))
            & (F.abs(F.datediff("d2", "d1")) <= DUP_PAY_WINDOW_D)
        )
    )
    return (
        pairs.select(
            "ck",
            "k1",
            "k2",
            (F.col("amt") / 100.0).alias("amount"),
            F.abs(F.datediff("d2", "d1")).cast("long").alias("gap_days"),
        )
        .repartition(1).sortWithinPartitions("ck", "k1", "k2")
    )


def duplicate_payments_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         CAST(round(o_totalprice * 100) AS BIGINT) AS tp
  FROM orders
),
book AS (
  SELECT * FROM o
  UNION ALL
  SELECT o_orderkey + 1000000000, o_custkey, o_orderdate + 3, tp
  FROM o WHERE o_orderkey % {DUP_PAY_MOD} = 0
)
SELECT a.o_custkey AS ck,
       a.o_orderkey AS k1, b.o_orderkey AS k2,
       a.tp / 100.0 AS amount,
       CAST(abs(date_diff('day', a.o_orderdate, b.o_orderdate)) AS BIGINT)
         AS gap_days
FROM book a JOIN book b
  ON a.o_custkey = b.o_custkey AND a.tp = b.tp AND a.o_orderkey < b.o_orderkey
WHERE abs(date_diff('day', a.o_orderdate, b.o_orderdate)) <= {DUP_PAY_WINDOW_D}
ORDER BY ck, k1, k2
"""


# --- unit-price spread audit --------------------------------------------------------------

UPS_MIN_LINES = 5
UPS_TOPK = 20


def unit_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-price consistency audit (pricing-error detection: the same
    part selling at wildly different per-unit prices): per part with
    >= UPS_MIN_LINES lines, the exact integer unit price floor
    (cents // qty) min/max/spread, top-UPS_TOPK by (spread DESC,
    partkey).

    Scale shape: ONE partkey agg (min/max/count are combiner-friendly);
    ranking is TakeOrdered — never a global sort."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr(
            "div(CAST(round(l_extendedprice * 100) AS BIGINT),"
            " CAST(l_quantity AS BIGINT))"
        ).alias("ppu"),
    )
    g = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("ppu").alias("min_ppu"),
        F.max("ppu").alias("max_ppu"),
    )
    return (
        g.where(F.col("n_lines") >= UPS_MIN_LINES)
        .select(
            "l_partkey",
            "n_lines",
            "min_ppu",
            "max_ppu",
            (F.col("max_ppu") - F.col("min_ppu")).alias("spread"),
        )
        .orderBy(F.desc("spread"), F.asc("l_partkey"))
        .limit(UPS_TOPK)
    )


def unit_price_spread_sql() -> str:
    return f"""
WITH li AS (
  SELECT l_partkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) // CAST(l_quantity AS BIGINT)
           AS ppu
  FROM lineitem
)
SELECT l_partkey,
       COUNT(*) AS n_lines,
       CAST(MIN(ppu) AS BIGINT) AS min_ppu,
       CAST(MAX(ppu) AS BIGINT) AS max_ppu,
       CAST(MAX(ppu) - MIN(ppu) AS BIGINT) AS spread
FROM li GROUP BY l_partkey HAVING COUNT(*) >= {UPS_MIN_LINES}
ORDER BY spread DESC, l_partkey LIMIT {UPS_TOPK}
"""


# --- CUPED covariate-adjustment moments ---------------------------------------------------

CUPED_SPLIT = "2024-01-15"


def cuped_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduction moments (Deng et al. WSDM'13 — the
    pre-period covariate adjustment every A/B platform applies): users
    are split at CUPED_SPLIT into pre-period covariate x = Σcents and
    post-period outcome y = Σcents, and the experiment-level sufficient
    statistics n, Σx, Σy, Σxy, Σx², Σy² are emitted with
    θ = cov/var(x) in milli from the exact integer closed form — the
    moments any engine needs to compute the adjusted metric
    y − θ(x − x̄) without a second pass.

    Scale shape: ONE user agg builds both periods via conditional sums
    (no self-join of the two halves); the moment rollup is a 1-row
    reduce."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("ts") < F.lit(CUPED_SPLIT)).alias("pre"),
        cents(F.col("value")).alias("v"),
    )
    per_u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("pre"), F.col("v")).otherwise(0)).alias("x"),
        F.sum(F.when(~F.col("pre"), F.col("v")).otherwise(0)).alias("y"),
    )
    m = per_u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sum_x"),
        F.sum("y").alias("sum_y"),
        F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
        F.sum(F.col("x") * F.col("x")).alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).alias("sum_y2"),
    )
    return m.select(
        "n",
        "sum_x",
        "sum_y",
        "sum_xy",
        "sum_x2",
        "sum_y2",
        F.expr(
            "div(1000 * (n * sum_xy - sum_x * sum_y),"
            " n * sum_x2 - sum_x * sum_x)"
        ).alias("theta_milli"),
    )


def cuped_moments_sql() -> str:
    return f"""
WITH per_u AS (
  SELECT user_id,
         SUM(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS x,
         SUM(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                  THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS y
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       CAST(SUM(x * x) AS BIGINT) AS sum_x2,
       CAST(SUM(y * y) AS BIGINT) AS sum_y2,
       CAST((1000 * (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)))
            // (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)) AS BIGINT) AS theta_milli
FROM per_u
"""


# --- RANGE-frame window sums ------------------------------------------------------------

RANGE_FRAME_S = 300  # +-5 minutes of event time


def range_frame_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-range window aggregation (RANGE BETWEEN frames — the
    window class ROWS frames cannot express: 'everything within ±5
    MINUTES', however many rows that is; the rolling exposure metric of
    ops dashboards): per user and event, the count and exact cents sum
    of that user's events within ±RANGE_FRAME_S seconds, rolled up per
    user to keep the gate surface bounded (n events, Σ window counts,
    Σ window sums, max window count).

    Scale shape: ONE user-key sort feeds the RANGE frame (Spark
    evaluates range frames with a sliding pointer over the sorted
    partition — no self-join); the rollup is combiner-friendly."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("t"),
        cents(F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rangeBetween(-RANGE_FRAME_S, RANGE_FRAME_S)
    )
    per_ev = ev.select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("w_n"),
        F.sum("v").over(w).alias("w_sum"),
    )
    return (
        per_ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("w_n").alias("sum_window_n"),
            F.sum("w_sum").alias("sum_window_cents"),
            F.max("w_n").alias("max_window_n"),
        )
        .repartition(1).sortWithinPartitions("user_id")
    )


def range_frame_sums_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
per_ev AS (
  SELECT user_id,
         COUNT(*) OVER (PARTITION BY user_id ORDER BY t
           RANGE BETWEEN {RANGE_FRAME_S} PRECEDING AND {RANGE_FRAME_S} FOLLOWING)
           AS w_n,
         SUM(v) OVER (PARTITION BY user_id ORDER BY t
           RANGE BETWEEN {RANGE_FRAME_S} PRECEDING AND {RANGE_FRAME_S} FOLLOWING)
           AS w_sum
  FROM ev
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(w_n) AS BIGINT) AS sum_window_n,
       CAST(SUM(w_sum) AS BIGINT) AS sum_window_cents,
       CAST(MAX(w_n) AS BIGINT) AS max_window_n
FROM per_ev GROUP BY user_id ORDER BY user_id
"""


# --- native session_window aggregation ------------------------------------------------

NSW_GAP_S = 300


def native_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window() aggregation (the built-in
    dynamic-gap session operator — the engine feature the hand-rolled
    lag→flag→cumsum sessionizer reproduces; both now sit in the gate so
    the equivalence is oracle-checked, not just pytest-pinned): per
    user, sessions at a NSW_GAP_S inactivity gap, rolled up to per-user
    session count, event count, exact cents value and the Σ of session
    lengths in seconds (epoch-second granularity to match the oracle's
    integer replay).

    Scale shape: session_window is ONE user-key shuffle + an in-partition
    merge — the same exchange count as the manual idiom, but fused into
    a single physical aggregate."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.to_timestamp(F.from_unixtime(F.floor(F.unix_timestamp("ts")))).alias("tsec"),
        cents(F.col("value")).alias("v"),
    )
    sw = ev.groupBy(
        "user_id", F.session_window("tsec", f"{NSW_GAP_S} seconds")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v").alias("v_cents"),
    )
    span = (
        F.unix_timestamp(F.col("session_window.end"))
        - F.unix_timestamp(F.col("session_window.start"))
        - NSW_GAP_S  # session_window.end = last event + gap
    )
    return (
        sw.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum("v_cents").alias("v_cents"),
            F.sum(span).alias("span_s_sum"),
        )
        .repartition(1).sortWithinPartitions("user_id")
    )


def native_session_window_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t,
         CAST(round(value * 100) AS BIGINT) AS v,
         event_id
  FROM events
),
flagged AS (
  SELECT user_id, t, v,
         -- boundary MEASURED, not assumed: an exact-{NSW_GAP_S}s pair
         -- merges into one session in Spark 4 (close is inclusive), so
         -- a new session needs gap STRICTLY greater
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                   > {NSW_GAP_S}
              OR lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM ev
),
sess AS (
  SELECT user_id, t, v,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
),
per_s AS (
  SELECT user_id, sid, COUNT(*) AS n_events, SUM(v) AS v_cents,
         MAX(t) - MIN(t) AS span_s
  FROM sess GROUP BY user_id, sid
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(v_cents) AS BIGINT) AS v_cents,
       CAST(SUM(span_s) AS BIGINT) AS span_s_sum
FROM per_s GROUP BY user_id ORDER BY user_id
"""


# --- TPC-H Q6 analog: forecast revenue change ---------------------------------------------


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (Forecasting Revenue Change): the pure
    scan-filter-aggregate — revenue that would have been gained by
    eliminating discounts in a (year, discount band, quantity cap)
    slice; the canonical predicate-pushdown probe (every filter lands
    in the parquet scan, the agg is one reduce).

    Exactness: revenue = Σ cents·discount_permille // 1000 per line is
    a documented quantization (the fixture's discounts are exact
    multiples of 0.01, so cents·permille is integral before the
    division — no rounding ambiguity in either engine)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_shipdate",
        "l_quantity",
        cents(F.col("l_extendedprice")).alias("price_c"),
        F.round(F.col("l_discount") * 1000).cast("long").alias("disc_pm"),
    )
    f = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & F.col("disc_pm").between(50, 70)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.sum(F.expr("div(price_c * disc_pm, 1000)")) / 100.0).alias("revenue_gain"),
    )


def forecast_revenue_sql() -> str:
    return """
SELECT COUNT(*) AS n_lines,
       SUM((CAST(round(l_extendedprice * 100) AS BIGINT)
            * CAST(round(l_discount * 1000) AS BIGINT)) // 1000) / 100.0
         AS revenue_gain
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount * 1000) AS BIGINT) BETWEEN 50 AND 70
  AND l_quantity < 24
"""


# --- TPC-H Q10 analog: returned-item report -------------------------------------------------

Q10_TOPK = 20


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (Returned Item Reporting): customers ranked by
    revenue lost to returns in a quarter — join pyramid
    lineitem(R-flag)⋈orders(date slice)⋈customer⋈nation with a custkey
    rollup and a top-K.

    Scale shape: the returnflag + date filters push into both scans;
    lineitem⋈orders co-partitions on orderkey; customer join shuffles
    on custkey; nation broadcast; TakeOrdered — never a global sort."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1997-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-07-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", cents(F.col("c_acctbal")).alias("bal_c")
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name", "bal_c").agg(
        F.sum("disc_cents").alias("lost_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        agg.select(
            "c_custkey",
            "c_name",
            "n_name",
            (F.col("bal_c") / 100.0).alias("c_acctbal"),
            (F.col("lost_cents") / 100.0).alias("revenue_lost"),
            "n_lines",
        )
        .orderBy(F.desc("revenue_lost"), F.asc("c_custkey"))
        .limit(Q10_TOPK)
    )


def returned_item_report_sql() -> str:
    return f"""
SELECT c_custkey, c_name, n_name,
       CAST(round(c_acctbal * 100) AS BIGINT) / 100.0 AS c_acctbal,
       SUM(CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT))
         / 100.0 AS revenue_lost,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue_lost DESC, c_custkey LIMIT {Q10_TOPK}
"""


# --- TPC-H Q15 analog: top supplier ----------------------------------------------------------


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (Top Supplier): the view-then-max pattern —
    per-supplier revenue in a quarter, then every supplier achieving
    the global maximum (ties must ALL return, which is why Q15 can't
    be a LIMIT 1).

    Scale shape: ONE suppkey agg builds the revenue view; the max is a
    1-row broadcast joined back — no second scan, no window over the
    whole view."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .select(
            "l_suppkey",
            F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
            .cast("long")
            .alias("disc_cents"),
        )
    )
    rev = li.groupBy("l_suppkey").agg(F.sum("disc_cents").alias("total_c"))
    mx = rev.agg(F.max("total_c").alias("max_c"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_c") == F.col("max_c"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            (F.col("total_c") / 100.0).alias("total_revenue"),
        )
        .repartition(1).sortWithinPartitions("s_suppkey")
    )


def top_supplier_sql() -> str:
    return """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT))
           AS total_c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_c / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_c = (SELECT MAX(total_c) FROM rev)
ORDER BY s_suppkey
"""


# --- TPC-H Q11 shape: important parts (global-scalar HAVING) ---------------------------------

Q11_FRACTION_PPM = 500  # keep parts holding > 0.05% of total value


def important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (Important Stock Identification, adapted — the
    fixture has no partsupp, so 'stock value' = lineitem revenue): per
    part the revenue total, kept only when it exceeds a FRACTION OF THE
    GLOBAL TOTAL — the group-by with a scalar-subquery HAVING that
    forces two aggregation granularities of one fact.

    Scale shape: ONE partkey agg; the global total is a second
    partial+final reduce of the SAME pre-agg (not a rescan) broadcast
    back as a 1-row frame; threshold compare exact integer
    cross-multiplication (value·10⁶ > total·ppm)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    per_p = li.groupBy("l_partkey").agg(F.sum("disc_cents").alias("value_c"))
    per_p = per_p.localCheckpoint(eager=False)  # total reduces the pre-agg
    tot = per_p.agg(F.sum("value_c").alias("total_c"))
    return (
        per_p.crossJoin(F.broadcast(tot))
        .where(F.col("value_c") * 1_000_000 > F.col("total_c") * Q11_FRACTION_PPM)
        .select(
            "l_partkey",
            (F.col("value_c") / 100.0).alias("part_value"),
            F.expr("div(1000000 * value_c, total_c)").alias("share_ppm"),
        )
        .repartition(1).sortWithinPartitions("l_partkey")
    )


def important_parts_sql() -> str:
    return f"""
WITH per_p AS (
  SELECT l_partkey,
         SUM(CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT))
           AS value_c
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(value_c) AS total_c FROM per_p)
SELECT l_partkey,
       value_c / 100.0 AS part_value,
       CAST((1000000 * value_c) // total_c AS BIGINT) AS share_ppm
FROM per_p, tot
WHERE value_c * 1000000 > total_c * {Q11_FRACTION_PPM}
ORDER BY l_partkey
"""


# --- TPC-H Q16 shape: supplier census with NOT-IN blacklist ----------------------------------


def part_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (Parts/Supplier Relationship, adapted — supplier
    relationships come from lineitem instead of the absent partsupp):
    per (brand, size band) the count of DISTINCT suppliers, EXCLUDING a
    blacklist derived by subquery (suppliers with below-zero account
    balance — the deterministic surrogate for Q16's '%Complaints%'
    LIKE) — the NOT-IN-subquery + grouped count-distinct pattern.

    Scale shape: the blacklist is a broadcast anti-join BEFORE the
    distinct (prune early); the (brand, band, supplier) distinct is one
    shuffle; the census rollup is dims-sized."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", (F.col("p_size") / 10).cast("long").alias("size_band")
    )
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_k"))
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), li["l_suppkey"] == F.col("bad_k"), "left_anti")
    )
    return (
        j.select("p_brand", "size_band", "l_suppkey")
        .distinct()
        .groupBy("p_brand", "size_band")
        .agg(
            F.count(F.lit(1)).alias("supplier_cnt"),
            F.sum("l_suppkey").alias("supplier_checksum"),
        )
        .repartition(1).sortWithinPartitions("p_brand", "size_band")
    )


def part_supplier_census_sql() -> str:
    return """
SELECT p_brand, size_band,
       COUNT(*) AS supplier_cnt,
       CAST(SUM(l_suppkey) AS BIGINT) AS supplier_checksum
FROM (
  SELECT DISTINCT p_brand, p_size // 10 AS size_band, l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
)
GROUP BY p_brand, size_band ORDER BY p_brand, size_band
"""


# --- TPC-H Q20 shape: dominant-supplier semi chain -------------------------------------------

Q20_SHARE_PPM = 150_000  # dominant = shipped > 15% of a part's total quantity


def heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (Potential Part Promotion, adapted — the
    excess-availability predicate becomes 'this supplier shipped more
    than 15% of the part's total quantity'): the nested-aggregate +
    semi-join chain — per (part, supplier) quantity vs the per-part
    total, suppliers having ANY dominant part survive a semi join, and
    the final rollup attaches the nation.

    Scale shape: two partkey-granularity aggs off one co-partitioned
    pre-agg; the supplier survivor set is tiny → broadcast semi join;
    dominance compared exact (qty_s·10⁶ > qty_total·ppm)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("qty")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("qty").alias("qty_s"))
    ps = ps.localCheckpoint(eager=False)  # part totals reduce the pre-agg
    pt = ps.groupBy("l_partkey").agg(F.sum("qty_s").alias("qty_t"))
    dom = (
        ps.join(pt, "l_partkey")
        .where(F.col("qty_s") * 1_000_000 > F.col("qty_t") * Q20_SHARE_PPM)
    )
    surv = dom.select("l_suppkey").distinct()
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_s = dom.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_dominant_parts"),
        F.sum("l_partkey").alias("part_checksum"),
    )
    return (
        per_s.join(surv, "l_suppkey", "left_semi")
        .join(F.broadcast(s), per_s["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", "n_name", "n_dominant_parts", "part_checksum")
        .repartition(1).sortWithinPartitions("s_name")
    )


def heavy_suppliers_sql() -> str:
    return f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS qty_s
  FROM lineitem GROUP BY 1, 2
),
pt AS (SELECT l_partkey, SUM(qty_s) AS qty_t FROM ps GROUP BY 1),
dom AS (
  SELECT ps.l_partkey, ps.l_suppkey
  FROM ps JOIN pt ON ps.l_partkey = pt.l_partkey
  WHERE ps.qty_s * 1000000 > pt.qty_t * {Q20_SHARE_PPM}
)
SELECT s_name, n_name,
       COUNT(*) AS n_dominant_parts,
       CAST(SUM(l_partkey) AS BIGINT) AS part_checksum
FROM dom
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY s_name, n_name ORDER BY s_name
"""


# --- TPC-H Q9 shape: product-type profit ------------------------------------------------------


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (Product Type Profit Measure, adapted — no
    partsupp, so unit cost = half the part's retail price in exact
    cents): profit = disc revenue − qty·cost, rolled up per supplier
    nation and order year, for parts of one type — the classic
    profit-pyramid with two fact-dim joins and a conditional dim
    filter.

    Scale shape: part (type-filtered) and supplier⋈nation broadcast;
    lineitem⋈orders co-partitions on orderkey; the rollup is ≤
    |nations|·|years| keys."""
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == "STANDARD")
        .select("p_partkey", (cents(F.col("p_retailprice")) / 2).cast("long").alias("cost_c"))
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    sn = s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"]).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(sn), li["l_suppkey"] == sn["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
    )
    return (
        j.groupBy("nation", "o_year")
        .agg(
            ((F.sum(F.col("disc_cents") - F.col("qty") * F.col("cost_c"))) / 100.0)
            .alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select("nation", F.col("o_year").cast("long").alias("o_year"), "profit", "n_lines")
        .repartition(1).sortWithinPartitions("nation", F.desc("o_year"))
    )


def product_profit_sql() -> str:
    return """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       SUM(CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT)
           - CAST(l_quantity AS BIGINT)
             * (CAST(round(p_retailprice * 100) AS BIGINT) // 2)) / 100.0 AS profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY n_name, year(o_orderdate)
ORDER BY nation, o_year DESC
"""


# --- Gini concentration of customer value -------------------------------------------------


def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration coefficient of customer lifetime value (the
    Lorenz-curve inequality metric of revenue-concentration dashboards;
    '20% of customers drive 80%'): customers ranked ascending by exact
    lifetime cents (ties by custkey), G from the rank formula
    G = (2·Σi·vᵢ − (n+1)·Σv) / (n·Σv) — every moment exact int64, the
    coefficient emitted in milli by one truncating division.

    Scale shape: lifetime value = ONE custkey agg; the ascending rank
    uses the distributed global-rank idiom (repartitionByRange +
    per-partition row_number + broadcast offsets — never a single-task
    window); Σi·v is a combiner-friendly reduce of the ranked frame."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", cents(F.col("o_totalprice")).alias("tp")
    )
    per_c = o.groupBy("o_custkey").agg(F.sum("tp").alias("v"))
    from pyspark.sql import Window

    rp = per_c.repartitionByRange(16, "v", "o_custkey")
    part = rp.withColumn("pid", F.spark_partition_id())
    wp = Window.partitionBy("pid").orderBy("v", "o_custkey")
    loc = part.withColumn("lrn", F.row_number().over(wp))
    sizes = loc.groupBy("pid").agg(F.max("lrn").alias("sz"))
    wo = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.repartition(1).select(
        "pid", F.coalesce(F.sum("sz").over(wo), F.lit(0)).alias("off")
    )
    ranked = loc.join(F.broadcast(offs), "pid").select(
        "v", (F.col("lrn") + F.col("off")).alias("i")
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("sum_v"),
        F.sum(F.col("i") * F.col("v")).alias("sum_iv"),
    )
    return m.select(
        "n",
        "sum_v",
        "sum_iv",
        F.expr(
            # DECIMAL(38,0) keeps the milli numerator exact far past the
            # int64 ceiling (1000 * the rank moment overflows a long
            # already at sf0.1); numerator >= 0 by the Chebyshev sum
            # inequality, so truncating div == floor in both engines.
            "CAST(div("
            " CAST(1000 AS DECIMAL(38,0))"
            "   * (2 * CAST(sum_iv AS DECIMAL(38,0))"
            "      - (n + 1) * CAST(sum_v AS DECIMAL(38,0))),"
            " CAST(n AS DECIMAL(38,0)) * CAST(sum_v AS DECIMAL(38,0))"
            ") AS BIGINT)"
        ).alias("gini_milli"),
    )


def gini_concentration_sql() -> str:
    return """
WITH per_c AS (
  SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
  FROM orders GROUP BY o_custkey
),
rk AS (
  SELECT v, row_number() OVER (ORDER BY v, o_custkey) AS i FROM per_c
)
SELECT COUNT(*) AS n,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(i * v) AS BIGINT) AS sum_iv,
       CAST((1000 * (2 * SUM(i * v) - (COUNT(*) + 1) * SUM(v)))
            // (COUNT(*) * SUM(v)) AS BIGINT) AS gini_milli
FROM rk
"""


# --- forward as-of join ---------------------------------------------------------------------


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload: tuple[str, ...],
) -> DataFrame:
    """FORWARD as-of join: each left row picks the right row with the
    same key and the SMALLEST ts >= its own (the 'next event after'
    lookup of latency and fulfilment analytics — the mirror of
    asof_join's latest-prior semantics; DuckDB runs it natively as
    `ASOF LEFT JOIN ... ON l.ts <= r.ts`).

    Plan: the same union-and-carry idiom run over DESCENDING time —
    one window shuffle; right rows sort before left at equal ts so the
    >= boundary is inclusive.  (Equal right timestamps per key do not
    occur in the fixture; a production tie rule would mirror the
    backward join's payload tie-break.)"""
    lext = [c for c in left.columns if c not in (key, ts)]
    l = left.select(
        key, ts, F.lit(0).alias("_side"),
        *[F.col(c) for c in lext],
        *[
            F.lit(None).cast(right.schema[p].dataType).alias(f"r_{p}")
            for p in payload
        ],
    )
    r = right.select(
        key, ts, F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lext],
        *[F.col(p).alias(f"r_{p}") for p in payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).desc(), F.col("_side").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r).select(
        key, ts, "_side", *lext,
        *[
            F.last(f"r_{p}", ignorenulls=True).over(w).alias(f"r_{p}")
            for p in payload
        ],
    )
    return filled.where(F.col("_side") == 0).drop("_side")


def clicks_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of demo: every click joined to the same user's NEXT
    purchase (at-or-after) — the time-to-conversion lookup."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join_forward(
        clicks, purchases, key="user_id", ts="ts", payload=("event_id", "value")
    )
    return out.select(
        "event_id",
        F.col("r_event_id").alias("next_purchase_id"),
        F.col("r_value").alias("next_value"),
    ).repartition(1).sortWithinPartitions("event_id")


def clicks_next_purchase_sql() -> str:
    return """
WITH l AS (SELECT * FROM events WHERE event_type = 'click'),
     r AS (SELECT * FROM events WHERE event_type = 'purchase')
SELECT l.event_id,
       r.event_id AS next_purchase_id,
       r.value AS next_value
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
ORDER BY l.event_id
"""


# --- CDC latest-per-key compaction --------------------------------------------------------


def latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC latest-record-per-key compaction (the materialize step of
    every change-data-capture pipeline; Delta/Hudi snapshot reads do
    exactly this): per customer the LATEST order by (date, orderkey)
    becomes the current state — computed with ONE max(struct) aggregate
    (never a row_number window over the fact): the struct packs the
    ordering prefix first, payload after, so max() selects the whole
    winning row.

    Output: per-customer current state + a 1-row census appended via
    rollup-free columns (n_orders per customer pins the history depth).

    Scale shape: ONE custkey partial+final agg — max(struct) combines
    map-side, so the shuffle carries one candidate row per (partition,
    key), the property that makes this the 10¹²-row CDC shape (a
    window would shuffle the whole history)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.struct(
            F.col("o_orderdate").alias("d"),
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("st"),
            cents(F.col("o_totalprice")).alias("tp"),
        ).alias("s"),
    )
    g = o.groupBy("o_custkey").agg(
        F.max("s").alias("m"), F.count(F.lit(1)).alias("n_orders")
    )
    return (
        g.select(
            "o_custkey",
            F.col("m.k").alias("latest_orderkey"),
            F.date_format("m.d", "yyyy-MM-dd").alias("latest_date"),
            F.col("m.st").alias("latest_status"),
            (F.col("m.tp") / 100.0).alias("latest_price"),
            "n_orders",
        )
        .repartition(1).sortWithinPartitions("o_custkey")
    )


def latest_snapshot_sql() -> str:
    return """
SELECT o_custkey,
       CAST(m[2] AS BIGINT) AS latest_orderkey,
       strftime(CAST(m[1] AS TIMESTAMP), '%Y-%m-%d') AS latest_date,
       m[3] AS latest_status,
       CAST(m[4] AS BIGINT) / 100.0 AS latest_price,
       n_orders
FROM (
  SELECT o_custkey,
         MAX((o_orderdate, o_orderkey, o_orderstatus,
              CAST(round(o_totalprice * 100) AS BIGINT))) AS m,
         COUNT(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
ORDER BY o_custkey
"""


# Benford expected first-digit frequencies, ppm: floor(1e6*log10(1+1/d)).
BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


def benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit census over the order book — the screening
    test an auditor runs on payment amounts before anything else: the
    observed first-significant-digit distribution vs Benford's law,
    with the per-digit deviation in ppm.  Everything integer-exact:
    the first digit comes from the decimal rendering of the cents
    amount (identical in every engine for positive BIGINTs), observed
    shares are floor(1e6 * cnt / total), and the expected shares are
    pinned integer constants, so there is no float anywhere.

    Scale shape: map-only digit extraction, ONE 9-group partial+final
    agg, a single-partition 9-row window for the total — nothing else
    shuffles at any corpus size."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        cents(F.col("o_totalprice")).alias("tp")
    )
    d = o.select(
        F.substring(F.col("tp").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    total = F.sum("n_orders").over(Window.partitionBy())
    exp = F.element_at(
        F.array(*[F.lit(p) for p in BENFORD_PPM]), F.col("digit")
    ).cast("long")
    return (
        counts.withColumn("_total", total)
        .select(
            "digit",
            "n_orders",
            F.expr("(1000000 * n_orders) div _total").alias("obs_ppm"),
            exp.alias("benford_ppm"),
        )
        .withColumn(
            "dev_ppm", F.abs(F.col("obs_ppm") - F.col("benford_ppm"))
        )
        .repartition(1)
        .sortWithinPartitions("digit")
    )


def benford_digits_sql() -> str:
    vals = ", ".join(f"({i + 1}, {p})" for i, p in enumerate(BENFORD_PPM))
    return f"""
WITH tp AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS tp FROM orders
),
d AS (
  SELECT CAST(substr(CAST(tp AS VARCHAR), 1, 1) AS INT) AS digit FROM tp
),
counts AS (
  SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY digit
),
benford(digit, ppm) AS (VALUES {vals})
SELECT c.digit,
       CAST(c.n_orders AS BIGINT) AS n_orders,
       CAST(1000000 * c.n_orders // SUM(c.n_orders) OVER () AS BIGINT) AS obs_ppm,
       CAST(b.ppm AS BIGINT) AS benford_ppm,
       CAST(abs(1000000 * c.n_orders // SUM(c.n_orders) OVER () - b.ppm) AS BIGINT)
         AS dev_ppm
FROM counts c JOIN benford b ON b.digit = c.digit
ORDER BY c.digit
"""


K_ANON = 5  # the privacy bar: groups smaller than this are re-identifiable


def k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the customer table — the
    privacy gate a training-data curation pipeline runs before releasing
    quasi-identifier columns: group by the quasi-id tuple
    (nation, market segment, account-balance k$-bucket) and census the
    group-size distribution.  Groups with fewer than {K_ANON} members
    are re-identifiable and must be suppressed or generalized; the
    audit reports, per equivalence-class size, how many classes and
    rows sit at that size and whether it is below the bar.

    Scale shape: two chained partial+final hash aggs on shrinking keys
    (quasi-id tuple -> class size); no joins, no windows — the same
    plan at 10^12 rows."""
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_kb"),
    )
    classes = c.groupBy("c_nationkey", "c_mktsegment", "bal_kb").agg(
        F.count(F.lit(1)).alias("grp_size")
    )
    return (
        classes.groupBy("grp_size")
        .agg(F.count(F.lit(1)).alias("n_groups"))
        .select(
            "grp_size",
            "n_groups",
            (F.col("grp_size") * F.col("n_groups")).alias("n_rows"),
            (F.col("grp_size") < K_ANON).cast("int").alias("below_k"),
        )
        .repartition(1).sortWithinPartitions("grp_size")
    )


def k_anonymity_sql() -> str:
    return f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb,
         COUNT(*) AS grp_size
  FROM customer GROUP BY c_nationkey, c_mktsegment, bal_kb
)
SELECT CAST(grp_size AS BIGINT) AS grp_size,
       COUNT(*) AS n_groups,
       CAST(grp_size * COUNT(*) AS BIGINT) AS n_rows,
       CAST(CASE WHEN grp_size < {K_ANON} THEN 1 ELSE 0 END AS INT) AS below_k
FROM classes GROUP BY grp_size ORDER BY grp_size
"""


def ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile census of customer account balances — the
    quantile-bucket window the BI layer runs for cohort pricing: rank
    customers into 10 equal-count tiles (order: balance, custkey — fully
    deterministic) and reduce each tile to count / min / max / sum in
    exact cents (DECIMAL(15,2)·100 — no float reaches the hash).

    Scale shape: a single global NTILE is a one-partition sort at
    10^12 rows — the real plan is range-partition by balance (the E8
    range partitioner) then tile within ranges; at gate scale the
    window + one partial+final agg is exact and the semantics
    identical."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        cents(F.col("c_acctbal")).alias("cents"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cents").asc(), F.col("c_custkey").asc())
    return (
        c.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
            F.sum("cents").alias("sum_cents"),
        )
        .repartition(1).sortWithinPartitions("decile")
    )


def ntile_deciles_sql() -> str:
    return """
WITH c AS (
  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer
),
t AS (
  SELECT cents, NTILE(10) OVER (ORDER BY cents ASC, c_custkey ASC) AS decile
  FROM c
)
SELECT CAST(decile AS INT) AS decile, COUNT(*) AS n_cust,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM t GROUP BY decile ORDER BY decile
"""


# --- nonparametric rank statistics ------------------------------------------------------


def spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between a customer's account balance
    and their exact lifetime spend — the monotone-association check an
    analyst runs before trusting a Pearson number on skewed money data.
    Ranks are ROW_NUMBER with a custkey tie-break (dense/midrank ties
    would force floats; the deterministic total order keeps both engines
    bit-identical), d = rank_x - rank_y.  Emitted as the exact integer
    moments (n, sum_d2) plus the rho numerator/denominator pair
    num = n(n^2-1) - 6*sum_d2, den = n(n^2-1), so rho = num/den is
    reconstructible at any precision and nothing float ever reaches the
    hash.

    Scale shape: two global ranks.  At gate scale each is one window
    sort; at 10^12 rows each becomes the distributed-rank idiom
    (repartitionByRange + partition offsets) gini_concentration already
    ships — the moments themselves are a combiner-friendly one-row
    reduce."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", cents(F.col("o_totalprice")).alias("tp")
    )
    spend = o.groupBy("o_custkey").agg(F.sum("tp").alias("spend"))
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", cents(F.col("c_acctbal")).alias("bal")
    )
    j = c.join(spend, c.c_custkey == spend.o_custkey, "inner").select(
        "c_custkey", "bal", "spend"
    )
    wx = Window.orderBy("bal", "c_custkey")
    wy = Window.orderBy("spend", "c_custkey")
    ranked = j.select(
        F.row_number().over(wx).alias("rx"),
        F.row_number().over(wy).alias("ry"),
    )
    d2 = (F.col("rx") - F.col("ry")) * (F.col("rx") - F.col("ry"))
    m = ranked.agg(F.count(F.lit(1)).alias("n"), F.sum(d2).alias("sum_d2"))
    nn = F.col("n") * (F.col("n") * F.col("n") - 1)
    return m.select(
        "n",
        "sum_d2",
        (nn - 6 * F.col("sum_d2")).cast("long").alias("rho_num"),
        nn.cast("long").alias("rho_den"),
    )


def spearman_corr_sql() -> str:
    return """
WITH spend AS (
  SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c.c_custkey, CAST(round(c.c_acctbal * 100) AS BIGINT) AS bal, s.spend
  FROM customer c JOIN spend s ON c.c_custkey = s.o_custkey
),
rk AS (
  SELECT row_number() OVER (ORDER BY bal, c_custkey) AS rx,
         row_number() OVER (ORDER BY spend, c_custkey) AS ry
  FROM j
)
SELECT COUNT(*) AS n,
       CAST(SUM((rx - ry) * (rx - ry)) AS BIGINT) AS sum_d2,
       CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1)
            - 6 * SUM((rx - ry) * (rx - ry)) AS BIGINT) AS rho_num,
       CAST(COUNT(*) * (COUNT(*) * COUNT(*) - 1) AS BIGINT) AS rho_den
FROM rk
"""


def mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between URGENT and LOW order values — the
    nonparametric two-sample location test (does priority shift the
    price distribution?).  Kept tie-exact in integers by the doubled
    statistic 2U = 2*#{a>b} + #{a==b} over URGENT x LOW pairs, computed
    without the quadratic pair join: group by distinct cents value,
    running-sum the LOW counts strictly below each value, then one
    weighted reduce.

    Scale shape: the distinct-value census is one shuffle; the running
    sum is a single window over values (range-partitionable at scale,
    same idiom as gini's distributed rank); no pair ever materializes."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", cents(F.col("o_totalprice")).alias("v")
    ).where(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
    per_v = o.groupBy("v").agg(
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("o_orderpriority") == "5-LOW", 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_v.withColumn("cb_below", F.coalesce(F.sum("cb").over(w), F.lit(0)))
    return cum.agg(
        F.sum("ca").cast("long").alias("n_urgent"),
        F.sum("cb").cast("long").alias("n_low"),
        F.sum(F.col("ca") * (2 * F.col("cb_below") + F.col("cb")))
        .cast("long")
        .alias("u2_urgent"),
    )


def mann_whitney_sql() -> str:
    return """
WITH o AS (
  SELECT o_orderpriority AS pri, CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
),
per_v AS (
  SELECT v,
         SUM(CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN pri = '5-LOW' THEN 1 ELSE 0 END) AS cb
  FROM o GROUP BY v
),
cum AS (
  SELECT ca, cb,
         COALESCE(SUM(cb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb_below
  FROM per_v
)
SELECT CAST(SUM(ca) AS BIGINT) AS n_urgent,
       CAST(SUM(cb) AS BIGINT) AS n_low,
       CAST(SUM(ca * (2 * cb_below + cb)) AS BIGINT) AS u2_urgent
FROM cum
"""


def ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the BUILDING and
    MACHINERY segments' balance distributions — the drift test every
    data-quality monitor runs between a reference and a candidate
    slice.  Exact in integers: D = max_v |n2*F1(v) - n1*F2(v)| over the
    combined support (the ECDFs are step functions, so the sup is
    attained at a sample point); emitted as d_scaled with n1, n2 so
    D = d_scaled/(n1*n2), plus the smallest value attaining the max.

    Scale shape: distinct-value census -> one cumulative window -> one
    reduce; identical partitioning story to mann_whitney."""
    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment", cents(F.col("c_acctbal")).alias("v")
    ).where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    per_v = c.groupBy("v").agg(
        F.sum(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("c_mktsegment") == "MACHINERY", 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_v.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    cum = per_v.select(
        "v",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    ).crossJoin(F.broadcast(tot))
    gap = cum.select(
        "v",
        "n1",
        "n2",
        F.abs(F.col("n2") * F.col("f1") - F.col("n1") * F.col("f2")).alias("g"),
    )
    w_all = Window.partitionBy("n1", "n2").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        gap.withColumn("d_scaled", F.max("g").over(w_all).cast("long"))
        .where(F.col("g") == F.col("d_scaled"))
        .groupBy("n1", "n2", "d_scaled")
        .agg(F.min("v").cast("long").alias("at_v"))
        .select(
            F.col("n1").cast("long").alias("n1"),
            F.col("n2").cast("long").alias("n2"),
            "d_scaled",
            "at_v",
        )
    )


def ks_statistic_sql() -> str:
    return """
WITH c AS (
  SELECT c_mktsegment AS seg, CAST(round(c_acctbal * 100) AS BIGINT) AS v
  FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
),
per_v AS (
  SELECT v,
         SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN seg = 'MACHINERY' THEN 1 ELSE 0 END) AS c2
  FROM c GROUP BY v
),
cum AS (
  SELECT v,
         SUM(c1) OVER (ORDER BY v) AS f1,
         SUM(c2) OVER (ORDER BY v) AS f2
  FROM per_v
),
tot AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM per_v),
gap AS (
  SELECT v, n1, n2, ABS(n2 * f1 - n1 * f2) AS g FROM cum, tot
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(MAX(g) AS BIGINT) AS d_scaled,
       CAST(MIN(CASE WHEN g = (SELECT MAX(g) FROM gap) THEN v END) AS BIGINT) AS at_v
FROM gap GROUP BY n1, n2
"""


def herfindahl_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman market-concentration index over national
    order revenue — the antitrust-style concentration number next to
    gini on the revenue dashboard.  Shares are ppm-floor-quantized
    against the exact dollar total (dollars, not cents, so share_ppm's
    1e6 cross-multiply stays comfortably inside int64 past sf1), HHI is
    the integer sum of squared ppm shares (diag-exact at 1e12 * n
    ceiling).

    Scale shape: customer->nation is a broadcast dim join; one custkey
    agg feeds one 25-row nation agg; the total is a broadcast scalar."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.floor(F.col("o_totalprice")).cast("long").alias("d")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per_n = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum("d").alias("rev_dollars"))
    )
    tot = per_n.agg(F.sum("rev_dollars").alias("total"))
    shared = per_n.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "rev_dollars",
        F.floor(F.col("rev_dollars") * 1_000_000 / F.col("total"))
        .cast("long")
        .alias("share_ppm"),
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        shared.withColumn(
            "hhi", F.sum(F.col("share_ppm") * F.col("share_ppm")).over(w).cast("long")
        )
        .repartition(1)
        .sortWithinPartitions("n_name")
    )


def herfindahl_index_sql() -> str:
    return """
WITH per_n AS (
  SELECT n.n_name, SUM(CAST(floor(o.o_totalprice) AS BIGINT)) AS rev_dollars
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name
),
sh AS (
  SELECT n_name, rev_dollars,
         CAST(rev_dollars * 1000000 // (SELECT SUM(rev_dollars) FROM per_n)
              AS BIGINT) AS share_ppm
  FROM per_n
)
SELECT n_name, rev_dollars, share_ppm,
       CAST((SELECT SUM(share_ppm * share_ppm) FROM sh) AS BIGINT) AS hhi
FROM sh ORDER BY n_name
"""


EWMA_SPIKE_CENTS = 20_000  # |x_t - s_{t-1}| above this is a spike


def ewma_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart per user over the event stream — the
    exponentially-weighted moving average every monitoring stack runs
    for drift/spike detection.  Exact integer recurrence with
    lambda = 0.3 cross-multiplied to tenths: s_1 = x_1,
    s_t = (7*s_{t-1} + 3*x_t) // 10 over cents (nonnegative, so floor
    division is engine-agnostic); a spike is |x_t - s_{t-1}| >
    EWMA_SPIKE_CENTS.  Emits per user: event count, final EWMA, the
    EWMA path sum, and the spike count.  The DuckDB twin replays the
    recurrence as a recursive CTE over per-user row numbers.

    Scale shape: ONE shuffle groups each user's events; the recurrence
    is inherently sequential per key, so it runs inside applyInPandas
    with per-key numpy state — the exact batch analog of the streaming
    applyInPandasWithState operator (streaming/tile_stream.py), keys
    parallelize across executors."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents(F.col("value")).alias("x")
    )

    import numpy as np
    import pandas as pd

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        x = pdf["x"].to_numpy(dtype=np.int64)
        s = x[0]
        ssum = int(s)
        spikes = 0
        for t in range(1, len(x)):
            if abs(int(x[t]) - int(s)) > EWMA_SPIKE_CENTS:
                spikes += 1
            s = (7 * int(s) + 3 * int(x[t])) // 10
            ssum += s
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iat[0])],
                "n_events": [len(x)],
                "ewma_final": [int(s)],
                "ewma_sum": [ssum],
                "n_spikes": [spikes],
            }
        )

    out_schema = (
        "user_id long, n_events long, ewma_final long,"
        " ewma_sum long, n_spikes long"
    )
    return (
        ev.groupBy("user_id")
        .applyInPandas(_ewma, schema=out_schema)
        .repartition(1)
        .sortWithinPartitions("user_id")
    )


def ewma_drift_sql() -> str:
    return f"""
WITH RECURSIVE ev AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
),
rec(user_id, rn, s, ssum, nspike) AS (
  SELECT user_id, rn, x, x, 0 FROM ev WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.rn,
         (7 * r.s + 3 * e.x) // 10,
         r.ssum + (7 * r.s + 3 * e.x) // 10,
         r.nspike + CASE WHEN ABS(e.x - r.s) > {EWMA_SPIKE_CENTS}
                         THEN 1 ELSE 0 END
  FROM rec r JOIN ev e ON e.user_id = r.user_id AND e.rn = r.rn + 1
)
SELECT user_id,
       CAST(MAX(rn) AS BIGINT) AS n_events,
       CAST(arg_max(s, rn) AS BIGINT) AS ewma_final,
       CAST(arg_max(ssum, rn) AS BIGINT) AS ewma_sum,
       CAST(arg_max(nspike, rn) AS BIGINT) AS n_spikes
FROM rec GROUP BY user_id ORDER BY user_id
"""


KENDALL_NATION = 7


def kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b pair census between account balance and lifetime
    spend for one nation's customers — the rank-concordance statistic
    preferred over Spearman when ties matter.  All five pair classes
    are exact integer counts (concordant, discordant, x-only tie,
    y-only tie, both-tie) over unordered custkey pairs; tau-b is
    reconstructible as (nc-nd)/sqrt((n0-tx-txy)*(n0-ty-txy)) by the
    reader, nothing float ships.

    Scale shape: the demo keys one nation (~n/25 rows) and runs the
    O(n^2) pair self-join — at 10^12 rows the concordance counts come
    from the O(n log n) merge-sort inversion count (sort by x, count
    y-inversions via BIT/merge passes), which is a two-sort pipeline;
    the pair join stays the oracle shape."""
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_nationkey") == KENDALL_NATION
    ).select("c_custkey", cents(F.col("c_acctbal")).alias("bal"))
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", cents(F.col("o_totalprice")).alias("tp")
    )
    spend = o.groupBy("o_custkey").agg(F.sum("tp").alias("spend"))
    j = c.join(spend, c.c_custkey == spend.o_custkey, "inner").select(
        F.col("c_custkey").alias("k"), "bal", "spend"
    )
    a, b = j.alias("a"), j.alias("b")
    pairs = a.join(b, F.col("a.k") < F.col("b.k")).select(
        (F.col("a.bal") - F.col("b.bal")).alias("dx"),
        (F.col("a.spend") - F.col("b.spend")).alias("dy"),
    )
    sgn = lambda c: F.signum(c.cast("double")).cast("int")  # noqa: E731
    cls = pairs.select(sgn(F.col("dx")).alias("sx"), sgn(F.col("dy")).alias("sy"))
    return cls.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when((F.col("sx") * F.col("sy")) == 1, 1).otherwise(0))
        .cast("long")
        .alias("concordant"),
        F.sum(F.when((F.col("sx") * F.col("sy")) == -1, 1).otherwise(0))
        .cast("long")
        .alias("discordant"),
        F.sum(F.when((F.col("sx") == 0) & (F.col("sy") != 0), 1).otherwise(0))
        .cast("long")
        .alias("ties_x"),
        F.sum(F.when((F.col("sx") != 0) & (F.col("sy") == 0), 1).otherwise(0))
        .cast("long")
        .alias("ties_y"),
        F.sum(F.when((F.col("sx") == 0) & (F.col("sy") == 0), 1).otherwise(0))
        .cast("long")
        .alias("ties_xy"),
    )


def kendall_tau_sql() -> str:
    return f"""
WITH c AS (
  SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer WHERE c_nationkey = {KENDALL_NATION}
),
spend AS (
  SELECT o_custkey, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS spend
  FROM orders GROUP BY o_custkey
),
j AS (SELECT c.k, c.bal, s.spend FROM c JOIN spend s ON c.k = s.o_custkey),
pairs AS (
  SELECT sign(a.bal - b.bal) AS sx, sign(a.spend - b.spend) AS sy
  FROM j a JOIN j b ON a.k < b.k
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
       CAST(SUM(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
       CAST(SUM(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
       CAST(SUM(CASE WHEN sx <> 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y,
       CAST(SUM(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties_xy
FROM pairs
"""


def interval_union_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals sweep per user — the total covered time of
    overlapping activity windows (billing/occupancy dedup; the interval
    union every usage-metering pipeline needs).  Each event opens an
    interval [start, start + round(10*value)] in whole seconds; the
    classic sweep sorts by start and adds end - max(start, running max
    of prior ends), clamped at zero — one window pass, all integers.
    Also emits the merged-segment count (a new segment opens when start
    clears every prior end) and the raw span.

    Scale shape: ONE shuffle on user_id + an ordered window within the
    key (range-partition-friendly); no self-join, no explode — the
    sweep is O(n log n) global via the sort, O(1) state per row."""
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        ts_us.alias("s"),
        (ts_us + F.round(F.col("value") * 10).cast("long") * 1_000_000).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sw = ev.withColumn("pmax", F.max("e").over(w))
    contrib = F.greatest(
        F.lit(0), F.col("e") - F.greatest(F.col("s"), F.coalesce("pmax", F.col("s")))
    )
    new_seg = F.when(
        F.col("pmax").isNull() | (F.col("pmax") < F.col("s")), 1
    ).otherwise(0)
    return (
        sw.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(contrib).cast("long").alias("union_len"),
            F.sum(new_seg).cast("long").alias("n_segments"),
            (F.max("e") - F.min("s")).cast("long").alias("span"),
        )
        .repartition(1)
        .sortWithinPartitions("user_id")
    )


def interval_union_len_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS s,
         epoch_us(ts) + CAST(round(value * 10) AS BIGINT) * 1000000 AS e
  FROM events
),
sw AS (
  SELECT user_id, s, e,
         MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
  FROM ev
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(GREATEST(0, e - GREATEST(s, COALESCE(pmax, s)))) AS BIGINT)
         AS union_len,
       CAST(SUM(CASE WHEN pmax IS NULL OR pmax < s THEN 1 ELSE 0 END) AS BIGINT)
         AS n_segments,
       CAST(MAX(e) - MIN(s) AS BIGINT) AS span
FROM sw GROUP BY user_id ORDER BY user_id
"""


def value_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing run of event values per user — the
    gaps-and-islands window idiom (streak analytics: consecutive
    climbing readings, monotone KPI runs).  Events order by (ts,
    event_id); a run breaks when value (exact cents) fails to increase;
    islands come from the classic running-sum-of-breaks key, all
    integer.  Emits per user: event count, run count, longest run, and
    the 1-based start ordinal of the longest run (earliest on ties).

    Scale shape: one keyed window (lag + cumulative sum) and one
    aggregation — no self-join; identical frames on both engines."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents(F.col("value")).alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "brk",
        F.when(F.lag("x").over(w).isNull() | (F.lag("x").over(w) >= F.col("x")), 1)
        .otherwise(0),
    ).withColumn("rn", F.row_number().over(w))
    runs = flagged.withColumn(
        "run_id", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_run = runs.groupBy("user_id", "run_id").agg(
        F.count(F.lit(1)).alias("run_len"), F.min("rn").alias("run_start")
    )
    return (
        per_run.groupBy("user_id")
        .agg(
            F.sum("run_len").cast("long").alias("n_events"),
            F.count(F.lit(1)).alias("n_runs"),
            F.max("run_len").cast("long").alias("longest_run"),
            F.min(
                F.struct(
                    (-F.col("run_len")).alias("neg"),
                    F.col("run_start").alias("run_start"),
                )
            )
            .getField("run_start")
            .cast("long")
            .alias("longest_start"),
        )
        .repartition(1)
        .sortWithinPartitions("user_id")
    )


def value_runs_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         CASE WHEN lag(CAST(round(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR lag(CAST(round(value * 100) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) >= CAST(round(value * 100) AS BIGINT)
              THEN 1 ELSE 0 END AS brk
  FROM events
),
runs AS (
  SELECT user_id, rn,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM ev
),
per_run AS (
  SELECT user_id, run_id, COUNT(*) AS run_len, MIN(rn) AS run_start
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id,
       CAST(SUM(run_len) AS BIGINT) AS n_events,
       COUNT(*) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS longest_run,
       CAST(arg_max(run_start, run_len * 100000 - run_start) AS BIGINT) AS longest_start
FROM per_run GROUP BY user_id ORDER BY user_id
"""


def theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of monthly revenue — the
    median-of-pairwise-slopes estimator immune to outlier months that
    OLS (ols_moments) is not.  Slopes stay exact rationals
    (num = dollar diff, den = month diff > 0, unreduced); the global
    order is the well-defined composite (floor(1e6*num/den), num, den)
    — identical comparator on both engines, so the lower-median ELEMENT
    is identical even among equal-valued rationals — and the median's
    exact (num, den) ships with a milli-slope witness.

    Scale shape: the month census is one groupBy over orders; the pair
    set is quadratic only in MONTHS (tiny); at 10^12 rows the heavy leg
    stays the first aggregation."""
    o = _t(spark, sf_dir, "orders").select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("mx"),
        F.floor(F.col("o_totalprice")).cast("long").alias("d"),
    )
    per_m = o.groupBy("mx").agg(F.sum("d").alias("rev"))
    a, b = per_m.alias("a"), per_m.alias("b")
    pairs = a.join(b, F.col("a.mx") < F.col("b.mx")).select(
        (F.col("b.rev") - F.col("a.rev")).alias("num"),
        (F.col("b.mx") - F.col("a.mx")).alias("den"),
    )
    keyed = pairs.select(
        "num",
        "den",
        F.floor(F.col("num") * 1_000_000 / F.col("den")).cast("long").alias("vkey"),
    )
    w = Window.orderBy("vkey", "num", "den")
    ranked = keyed.withColumn("rk", F.row_number().over(w))
    # one bounded driver scalar (month count) sizes the median rank
    m = per_m.count()
    n = m * (m - 1) // 2
    med = (n + 1) // 2
    return (
        ranked.where(F.col("rk") == med)
        .select(
            F.lit(m).cast("long").alias("n_months"),
            F.lit(n).cast("long").alias("n_pairs"),
            F.col("num").cast("long").alias("med_num"),
            F.col("den").cast("long").alias("med_den"),
            F.floor(F.col("num") * 1000 / F.col("den")).cast("long").alias("slope_milli"),
        )
    )


def theil_sen_sql() -> str:
    return """
WITH per_m AS (
  SELECT year(o_orderdate) * 12 + month(o_orderdate) AS mx,
         SUM(CAST(floor(o_totalprice) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT b.rev - a.rev AS num, b.mx - a.mx AS den
  FROM per_m a JOIN per_m b ON a.mx < b.mx
),
keyed AS (
  SELECT num, den,
         CAST(floor(num * 1000000.0 / den) AS BIGINT) AS vkey
  FROM pairs
),
ranked AS (
  SELECT num, den, row_number() OVER (ORDER BY vkey, num, den) AS rk FROM keyed
)
SELECT (SELECT COUNT(*) FROM per_m) AS n_months,
       (SELECT COUNT(*) FROM keyed) AS n_pairs,
       CAST(num AS BIGINT) AS med_num,
       CAST(den AS BIGINT) AS med_den,
       CAST(floor(num * 1000.0 / den) AS BIGINT) AS slope_milli
FROM ranked
WHERE rk = ((SELECT COUNT(*) FROM keyed) + 1) // 2
"""


ALLAN_TAUS = (1, 2, 4, 8)


def allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allan-variance ladder of per-user event values — the multi-scale
    stability census (clock/sensor drift analysis): at each averaging
    window tau, adjacent full-block means are differenced and their
    squares summed.  Kept integer-exact by working in block SUMS:
    avar(tau) = sum((s_{k+1}-s_k)^2) / (2*tau^2*(M-1)) — the engine
    emits the exact numerator and block count M per (user, tau), the
    reader divides.  Block ordinals come from the same (ts, event_id)
    row numbering as the other sequence ops.

    Scale shape: one keyed window for ordinals, a 4x explode on the tau
    ladder, two keyed aggregations — no self-join; everything shuffles
    on (user_id, tau)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", cents(F.col("value")).alias("x")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rn = ev.withColumn("rn", F.row_number().over(w))
    taus = rn.withColumn(
        "tau", F.explode(F.array(*[F.lit(t) for t in ALLAN_TAUS]))
    ).withColumn("bk", F.floor((F.col("rn") - 1) / F.col("tau")))
    blocks = (
        taus.groupBy("user_id", "tau", "bk")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("c"))
        .where(F.col("c") == F.col("tau"))
    )
    wb = Window.partitionBy("user_id", "tau").orderBy("bk")
    diffs = blocks.withColumn("d", F.col("s") - F.lag("s").over(wb))
    return (
        diffs.groupBy("user_id", "tau")
        .agg(
            F.count(F.lit(1)).cast("long").alias("m_blocks"),
            F.coalesce(F.sum(F.col("d") * F.col("d")), F.lit(0))
            .cast("long")
            .alias("avar_num"),
        )
        .select("user_id", F.col("tau").cast("int").alias("tau"), "m_blocks", "avar_num")
        .repartition(1)
        .sortWithinPartitions("user_id", "tau")
    )


def allan_variance_sql() -> str:
    taus = ", ".join(f"({t})" for t in ALLAN_TAUS)
    return f"""
WITH ev AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
taus(tau) AS (VALUES {taus}),
blocks AS (
  SELECT user_id, tau, (rn - 1) // tau AS bk, SUM(x) AS s, COUNT(*) AS c
  FROM ev, taus GROUP BY user_id, tau, (rn - 1) // tau
),
diffs AS (
  SELECT user_id, tau, bk,
         s - lag(s) OVER (PARTITION BY user_id, tau ORDER BY bk) AS d
  FROM blocks WHERE c = tau
)
SELECT user_id, CAST(tau AS INT) AS tau,
       COUNT(*) AS m_blocks,
       CAST(COALESCE(SUM(d * d), 0) AS BIGINT) AS avar_num
FROM diffs GROUP BY user_id, tau ORDER BY user_id, tau
"""


def attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) marketing attribution — 40% of each
    purchase's value to the first touch, 40% to the last, 20% shared by
    the middles, in exact basis points with the integer-division
    remainder assigned to the last middle (k=1 -> 10000, k=2 ->
    5000/5000), touches = click/view since the previous purchase.  The
    complement of attribution_last_touch: same journey grouping, the
    industry's other standard credit rule, float-free by construction.
    Emits per (user, event_type): touches credited and the attributed
    value in bps*cents units (divide by 10^6 for currency).

    Scale shape: one keyed window pass builds journey groups (running
    purchase count), one join pins each journey's conversion value, two
    keyed aggs — no self-join, no explode."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", cents(F.col("value")).alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # journeys: grp = number of purchases strictly before this row
    grp = F.coalesce(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    g = ev.withColumn("grp", grp)
    conv = g.where(F.col("event_type") == "purchase").select(
        "user_id", "grp", F.col("v").alias("conv_cents")
    )
    touches = g.where(F.col("event_type").isin("click", "view"))
    wt = Window.partitionBy("user_id", "grp").orderBy("ts", "event_id")
    ranked = touches.select(
        "user_id", "grp", "event_type",
        F.row_number().over(wt).alias("pos"),
        F.count(F.lit(1)).over(
            Window.partitionBy("user_id", "grp").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("k"),
    )
    mid = F.floor(2000 / (F.col("k") - 2))
    bps = (
        F.when(F.col("k") == 1, 10000)
        .when(F.col("k") == 2, 5000)
        .when(F.col("pos") == 1, 4000)
        .when(F.col("pos") == F.col("k"), 4000)
        .when(
            F.col("pos") == F.col("k") - 1,
            F.lit(2000) - (F.col("k") - 3) * mid,
        )
        .otherwise(mid)
    )
    credited = ranked.join(conv, ["user_id", "grp"]).select(
        "user_id", "event_type", (bps * F.col("conv_cents")).alias("credit")
    )
    return (
        credited.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("credit").cast("long").alias("credit_bpc"),
        )
        .repartition(1)
        .sortWithinPartitions("user_id", "event_type")
    )


def attribution_position_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS grp
  FROM events
),
conv AS (
  SELECT user_id, grp, v AS conv_cents FROM ev WHERE event_type = 'purchase'
),
ranked AS (
  SELECT user_id, grp, event_type,
         row_number() OVER (PARTITION BY user_id, grp ORDER BY ts, event_id) AS pos,
         COUNT(*) OVER (PARTITION BY user_id, grp) AS k
  FROM ev WHERE event_type IN ('click', 'view')
),
credited AS (
  SELECT r.user_id, r.event_type,
         (CASE WHEN r.k = 1 THEN 10000
               WHEN r.k = 2 THEN 5000
               WHEN r.pos = 1 THEN 4000
               WHEN r.pos = r.k THEN 4000
               WHEN r.pos = r.k - 1
                 THEN 2000 - (r.k - 3) * CAST(floor(2000.0 / (r.k - 2)) AS BIGINT)
               ELSE CAST(floor(2000.0 / (r.k - 2)) AS BIGINT)
          END) * c.conv_cents AS credit
  FROM ranked r JOIN conv c ON c.user_id = r.user_id AND c.grp = r.grp
)
SELECT user_id, event_type,
       COUNT(*) AS n_touches,
       CAST(SUM(credit) AS BIGINT) AS credit_bpc
FROM credited GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


def revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max rise / max drawdown of the daily-revenue series — the Kadane
    max-subarray pair expressed as pure window algebra: over daily
    dollar totals r_t, max_rise = max_t (r_t - min_{s<=t} r_s) and
    max_drawdown = max_t (max_{s<=t} r_s - r_t), each with the earliest
    attaining day (ties to the smallest epoch-day).  This is the
    prefix-extremum formulation, so no self-join and no sequential scan
    — two running-extremum windows and one reduce.

    Scale shape: one day-grain aggregation then windows over a tiny
    ordered series; at any scale the heavy leg is the first groupBy."""
    o = _t(spark, sf_dir, "orders").select(
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "day"
        ),
        F.floor(F.col("o_totalprice")).cast("long").alias("d"),
    )
    daily = o.groupBy("day").agg(F.sum("d").alias("r"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    g = daily.select(
        "day",
        (F.col("r") - F.min("r").over(w)).alias("rise"),
        (F.max("r").over(w) - F.col("r")).alias("dd"),
    )
    wa = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g2 = g.select(
        "day",
        "rise",
        "dd",
        F.max("rise").over(wa).alias("max_rise"),
        F.max("dd").over(wa).alias("max_drawdown"),
        F.count(F.lit(1)).over(wa).alias("n_days"),
    )
    rise_day = (
        g2.where(F.col("rise") == F.col("max_rise"))
        .groupBy("n_days", "max_rise", "max_drawdown")
        .agg(F.min("day").alias("rise_day"))
    )
    dd_day = (
        g2.where(F.col("dd") == F.col("max_drawdown"))
        .agg(F.min("day").alias("dd_day"))
    )
    return rise_day.crossJoin(F.broadcast(dd_day)).select(
        F.col("n_days").cast("long"),
        F.col("max_rise").cast("long"),
        F.col("rise_day").cast("long"),
        F.col("max_drawdown").cast("long"),
        F.col("dd_day").cast("long"),
    )


def revenue_drawdown_sql() -> str:
    return """
WITH daily AS (
  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         SUM(CAST(floor(o_totalprice) AS BIGINT)) AS r
  FROM orders GROUP BY 1
),
g AS (
  SELECT day,
         r - MIN(r) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rise,
         MAX(r) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - r AS dd
  FROM daily
)
SELECT (SELECT COUNT(*) FROM g) AS n_days,
       (SELECT MAX(rise) FROM g) AS max_rise,
       CAST((SELECT MIN(day) FROM g WHERE rise = (SELECT MAX(rise) FROM g)) AS BIGINT) AS rise_day,
       (SELECT MAX(dd) FROM g) AS max_drawdown,
       CAST((SELECT MIN(day) FROM g WHERE dd = (SELECT MAX(dd) FROM g)) AS BIGINT) AS dd_day
"""


BOM_LEVELS = 4  # decimal-digit hierarchy: parent(k) = k // 10, root 0


def part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy (bill-of-materials-style) rollup over the implicit
    decimal part tree — parent(k) = k // 10 — the recursive subtotal
    every catalog/org-chart dashboard needs: each node's subtree count
    and retail-cents total, INCLUDING itself.  Spark has no recursive
    CTE; the engine exploits the known bounded depth and enumerates
    each node's ancestor path closed-form (k//10^e for e = 0..BOM_LEVELS)
    — a bounded explode + one aggregation, no iteration at all.  The
    DuckDB twin runs the same path enumeration (it could also recurse;
    the closed form keeps the comparison apples-to-apples).

    Scale shape: explode factor = tree depth (constant), one shuffle on
    the ancestor key; this is the standard path-enumeration rewrite
    that turns recursive rollups into joins at 10^12 rows."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", cents(F.col("p_retailprice")).alias("rp")
    )
    anc = p.select(
        F.explode(
            F.array(
                *[
                    (F.col("p_partkey") / (10**e)).cast("long").alias("a")
                    for e in range(BOM_LEVELS + 1)
                ]
            )
        ).alias("node"),
        "rp",
    )
    agg = anc.groupBy("node").agg(
        F.count(F.lit(1)).alias("subtree_n"),
        F.sum("rp").alias("subtree_cents"),
    )
    # keep only nodes that are real parts or the virtual root chain
    return (
        agg.join(
            p.select(F.col("p_partkey").alias("node")).union(
                spark.range(0, 200).select(F.col("id").alias("node"))
            ).distinct(),
            "node",
        )
        .select("node", "subtree_n", F.col("subtree_cents").cast("long"))
        .repartition(1)
        .sortWithinPartitions("node")
    )


def part_hierarchy_rollup_sql() -> str:
    return f"""
WITH p AS (
  SELECT p_partkey, CAST(round(p_retailprice * 100) AS BIGINT) AS rp FROM part
),
anc AS (
  SELECT p_partkey // CAST(power(10, g.e) AS BIGINT) AS node, rp
  FROM p, generate_series(0, {BOM_LEVELS}) AS g(e)
),
agg AS (
  SELECT node, COUNT(*) AS subtree_n, SUM(rp) AS subtree_cents
  FROM anc GROUP BY node
),
keep AS (
  SELECT p_partkey AS node FROM p
  UNION SELECT CAST(r.range AS BIGINT) FROM range(0, 200) r
)
SELECT a.node, a.subtree_n, CAST(a.subtree_cents AS BIGINT) AS subtree_cents
FROM agg a JOIN (SELECT DISTINCT node FROM keep) k ON k.node = a.node
ORDER BY a.node
"""


def part_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part dominant-supplier census (TPC-H Q20 family): for every
    part shipped by at least two suppliers, find the supplier who
    shipped the most units (ties -> lowest suppkey), then roll the
    per-part argmax slots up per supplier — how many parts each
    supplier leads, the units behind those leads, and the supplier's
    best market share in integer basis points (10000*q div total).
    The share is integer floor-division so both engines agree exactly.

    Scale shape: two key-local aggregations (part,supplier) -> part,
    one window argmax partitioned by part, one supplier rollup — three
    shuffles total, all on uniform keys; no driver collect, no UDF."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.col("l_suppkey").alias("sk"),
        F.col("l_quantity").cast("long").alias("q"),
    )
    sp = li.groupBy("pk", "sk").agg(F.sum("q").alias("q"))
    pt = sp.groupBy("pk").agg(
        F.sum("q").alias("tq"), F.count(F.lit(1)).alias("ns")
    )
    w = Window.partitionBy("pk").orderBy(F.col("q").desc(), F.col("sk"))
    top = (
        sp.join(pt, "pk")
        .where(F.col("ns") >= 2)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .withColumn("share_bp", (10000 * F.col("q") / F.col("tq")).cast("long"))
    )
    return (
        top.groupBy("sk")
        .agg(
            F.count(F.lit(1)).alias("n_top_parts"),
            F.sum("q").alias("lead_qty"),
            F.max("share_bp").alias("best_share_bp"),
        )
        .select(
            F.col("sk").alias("s_suppkey"),
            "n_top_parts",
            "lead_qty",
            "best_share_bp",
        )
        .repartition(1)
        .sortWithinPartitions("s_suppkey")
    )


def part_dominance_sql() -> str:
    return """
WITH sp AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY 1, 2
),
pt AS (
  SELECT pk, SUM(q) AS tq, COUNT(*) AS ns FROM sp GROUP BY 1
),
top AS (
  SELECT sp.sk, sp.q, 10000 * sp.q // pt.tq AS share_bp,
         ROW_NUMBER() OVER (PARTITION BY sp.pk
                            ORDER BY sp.q DESC, sp.sk) AS rn
  FROM sp JOIN pt USING (pk) WHERE pt.ns >= 2
)
SELECT sk AS s_suppkey,
       COUNT(*) AS n_top_parts,
       CAST(SUM(q) AS BIGINT) AS lead_qty,
       CAST(MAX(share_bp) AS BIGINT) AS best_share_bp
FROM top WHERE rn = 1
GROUP BY sk ORDER BY s_suppkey
"""


EDIT_PREFIX = 80  # compare a fixed prefix so pair cost is bounded per row


def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked Levenshtein near-duplicate candidates over documents:
    block on (source, n_chars) — only same-provenance, same-length
    texts can be cheap edits of each other — then score each candidate
    pair with the exact Levenshtein distance of the first EDIT_PREFIX
    chars (both engines implement standard unit-cost edit distance, so
    the integer matches bit-for-bit).

    Scale shape: the self-join is an equi-join on the block key, so
    candidate count is sum of C(block,2), not C(n,2); the distance
    runs only on survivors.  At 10^12 docs the same plan holds with a
    salted block key for hot (source,len) buckets — the LSH family
    (minhash/simhash) remains the recall path; this is the precision
    verifier."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("source").alias("src"),
        F.col("n_chars").alias("nc"),
        F.substring("text", 1, EDIT_PREFIX).alias("pfx"),
    )
    a = d.alias("a")
    b = d.alias("b")
    return (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.nc") == F.col("b.nc"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.levenshtein(F.col("a.pfx"), F.col("b.pfx")).alias("edit_dist"),
            (
                F.levenshtein(F.col("a.pfx"), F.col("b.pfx"))
                <= F.floor(F.least(F.col("a.nc"), F.lit(EDIT_PREFIX)) / 4)
            )
            .cast("int")
            .alias("near_dup"),
        )
        .repartition(1)
        .sortWithinPartitions("doc1", "doc2")
    )


def edit_distance_pairs_sql() -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source AS src, n_chars AS nc,
         substr(text, 1, {EDIT_PREFIX}) AS pfx
  FROM documents
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       levenshtein(a.pfx, b.pfx) AS edit_dist,
       CAST(levenshtein(a.pfx, b.pfx)
            <= least(a.nc, {EDIT_PREFIX}) // 4 AS INT) AS near_dup
FROM d a JOIN d b
  ON a.src = b.src AND a.nc = b.nc AND a.doc_id < b.doc_id
ORDER BY doc1, doc2
"""


RS_WINDOWS = (8, 16, 32, 64)


def rescaled_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rescaled-range ladder (the R of Hurst's R/S analysis) over the
    daily-revenue series, integer-exact.  For each window size n the
    series of complete n-day blocks is scanned; within a block with
    sum S the cumulative deviation at step k is
    D_k = n*cumsum_k - k*S (the usual cumsum-of-(x - mean) scaled by n
    so it stays in BIGINT), and the block range is max(D)-min(D).
    Long-memory series grow sum_range ~ n^(H+1); emitting the exact
    integer ladder keeps the gate bit-for-bit while the float Hurst
    slope remains a trivial client-side regression.

    Scale shape: one date rollup, a constant-factor explode (4 window
    sizes), and per-(n, block) window cumsums — all key-local, no
    iteration, no UDF."""
    days = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("x"))
        .select(
            F.row_number()
            .over(Window.orderBy("o_orderdate"))
            .alias("d"),
            "x",
        )
    )
    lad = days.crossJoin(
        spark.createDataFrame([(n,) for n in RS_WINDOWS], "n int")
    ).withColumn("blk", ((F.col("d") - 1) / F.col("n")).cast("long"))
    wb = (
        Window.partitionBy("n", "blk")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("n", "blk")
    dev = (
        lad.withColumn("k", F.row_number().over(Window.partitionBy("n", "blk").orderBy("d")))
        .withColumn("cum", F.sum("x").over(wb))
        .withColumn("s", F.sum("x").over(wall))
        .withColumn("cnt", F.count(F.lit(1)).over(wall))
        .where(F.col("cnt") == F.col("n"))
        .withColumn("dk", F.col("n") * F.col("cum") - F.col("k") * F.col("s"))
    )
    blocks = dev.groupBy("n", "blk").agg(
        (F.max("dk") - F.min("dk")).alias("r")
    )
    return (
        blocks.groupBy("n")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("r").alias("sum_range"),
            F.max("r").alias("max_range"),
        )
        .repartition(1)
        .sortWithinPartitions("n")
    )


def rescaled_range_sql() -> str:
    ns = ", ".join(f"({n})" for n in RS_WINDOWS)
    return f"""
WITH days AS (
  SELECT ROW_NUMBER() OVER (ORDER BY o_orderdate) AS d,
         CAST(SUM(round(o_totalprice * 100)) AS BIGINT) AS x
  FROM orders GROUP BY o_orderdate
),
lad AS (
  SELECT d, x, w.n, (d - 1) // w.n AS blk
  FROM days, (VALUES {ns}) AS w(n)
),
dev AS (
  SELECT n, blk,
         ROW_NUMBER() OVER (PARTITION BY n, blk ORDER BY d) AS k,
         SUM(x) OVER (PARTITION BY n, blk ORDER BY d
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(x) OVER (PARTITION BY n, blk) AS s,
         COUNT(*) OVER (PARTITION BY n, blk) AS cnt
  FROM lad
),
blocks AS (
  SELECT n, blk, MAX(n*cum - k*s) - MIN(n*cum - k*s) AS r
  FROM dev WHERE cnt = n GROUP BY n, blk
)
SELECT n, COUNT(*) AS n_blocks,
       CAST(SUM(r) AS BIGINT) AS sum_range,
       CAST(MAX(r) AS BIGINT) AS max_range
FROM blocks GROUP BY n ORDER BY n
"""


def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/95) inventory classification: rank parts by
    lineitem revenue, walk the cumulative share, and bucket A (first
    80% of revenue), B (to 95%), C (tail).  Thresholds compare
    integers cross-multiplied (5*cum <= 4*total, 20*cum <= 19*total)
    so the class boundary is exact in both engines; ties broken by
    partkey for a deterministic walk.

    Scale shape: one rollup + one global-order cumulative window.  The
    global sort is the honest cost — at 10^12 rows you'd range-
    partition by revenue first (the engine's range partitioner) so the
    cumsum is a per-range prefix plus broadcast offsets."""
    rev = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("c"))
    )
    w = Window.orderBy(F.col("c").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    classified = (
        rev.withColumn("cum", F.sum("c").over(w))
        .withColumn("tot", F.sum("c").over(Window.partitionBy()))
        .withColumn(
            "cls",
            F.when(5 * F.col("cum") <= 4 * F.col("tot"), F.lit("A"))
            .when(20 * F.col("cum") <= 19 * F.col("tot"), F.lit("B"))
            .otherwise(F.lit("C")),
        )
    )
    return (
        classified.groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("c").alias("class_cents"),
            F.min("l_partkey").alias("first_part"),
        )
        .repartition(1)
        .sortWithinPartitions("cls")
    )


def abc_classification_sql() -> str:
    return """
WITH rev AS (
  SELECT l_partkey, CAST(SUM(round(l_extendedprice * 100)) AS BIGINT) AS c
  FROM lineitem GROUP BY l_partkey
),
walk AS (
  SELECT l_partkey, c,
         SUM(c) OVER (ORDER BY c DESC, l_partkey
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS tot
  FROM rev
)
SELECT CASE WHEN 5*cum <= 4*tot THEN 'A'
            WHEN 20*cum <= 19*tot THEN 'B'
            ELSE 'C' END AS cls,
       COUNT(*) AS n_parts,
       CAST(SUM(c) AS BIGINT) AS class_cents,
       MIN(l_partkey) AS first_part
FROM walk GROUP BY 1 ORDER BY cls
"""


SLIDE_W = 3  # trailing window width in days


def sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per trailing SLIDE_W-day window, per day —
    the DAU/WAU-style rolling reach metric.  Spark cannot evaluate
    COUNT(DISTINCT) over a window frame, so the engine uses the
    contribute-explode rewrite: each (day, user) first collapses to one
    row, then fans out to the SLIDE_W window end-days it participates
    in, and a plain distinct-count per window end closes it.  Windows
    whose start precedes the series are dropped (complete windows
    only), so every engine sees the same frame.

    Scale shape: dedup shuffle on (day, user), a x SLIDE_W constant
    fan-out, one count-distinct shuffle on the window day — no window
    function at all, which is exactly why it scales: the rewrite turns
    an unsupported ordered frame into two hash aggregations."""
    ev = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    bounds = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    fan = (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(SLIDE_W - 1))
            ).alias("off"),
            "day",
            "user_id",
            "d0",
            "d1",
        )
        .withColumn("wend", F.date_add(F.col("day"), F.col("off")))
        .where(
            (F.col("wend") <= F.col("d1"))
            & (F.date_sub(F.col("wend"), SLIDE_W - 1) >= F.col("d0"))
        )
    )
    return (
        fan.groupBy("wend")
        .agg(
            F.countDistinct("user_id").alias("reach"),
            F.count(F.lit(1)).alias("user_days"),
        )
        .select(F.col("wend").cast("string").alias("win_end"), "reach", "user_days")
        .repartition(1)
        .sortWithinPartitions("win_end")
    )


def sliding_distinct_sql() -> str:
    return f"""
WITH ev AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev),
fan AS (
  SELECT ev.day + CAST(g.o AS INT) AS wend, ev.user_id
  FROM ev, generate_series(0, {SLIDE_W - 1}) AS g(o), b
  WHERE ev.day + CAST(g.o AS INT) <= b.d1
    AND ev.day + CAST(g.o AS INT) - {SLIDE_W - 1} >= b.d0
)
SELECT CAST(wend AS VARCHAR) AS win_end,
       COUNT(DISTINCT user_id) AS reach,
       COUNT(*) AS user_days
FROM fan GROUP BY wend ORDER BY win_end
"""


SAX_PAA = 4   # days per PAA block
SAX_WORD = 4  # blocks per SAX word
SAX_ALPHA = "abcd"  # quartile alphabet


def sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic words over the daily-revenue series (Lin, Keogh,
    Lonardi & Chiu 2003 — Symbolic Aggregate approXimation, the
    discretization behind time-series motif/anomaly indexing): PAA-sum
    each complete SAX_PAA-day block (integer-exact), discretize blocks
    into quartile symbols with NTILE(4) over the total order
    (sum, block) — the empirical-quantile variant, no Gaussian
    breakpoint table, so the cut is exact in both engines — and
    assemble SAX_WORD-symbol words.  Emits the word census: each
    distinct word, its frequency, and its first block position.

    Scale shape: one date rollup, one global NTILE (range-partition at
    scale), one word rollup; word assembly sorts inside a 4-element
    array, not across rows."""
    days = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("x"))
        .select(
            F.row_number().over(Window.orderBy("o_orderdate")).alias("d"), "x"
        )
    )
    blocks = (
        days.withColumn("blk", ((F.col("d") - 1) / SAX_PAA).cast("long"))
        .groupBy("blk")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") == SAX_PAA)
    )
    sym = blocks.withColumn(
        "q", F.ntile(4).over(Window.orderBy(F.col("s"), F.col("blk")))
    ).withColumn(
        "sym", F.substring(F.lit(SAX_ALPHA), F.col("q"), 1)
    )
    words = (
        sym.withColumn("wrd", (F.col("blk") / SAX_WORD).cast("long"))
        .groupBy("wrd")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("blk", "sym"))
                    ),
                    lambda st: st["sym"],
                ),
                "",
            ).alias("word"),
            F.count(F.lit(1)).alias("nblk"),
        )
        .where(F.col("nblk") == SAX_WORD)
    )
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("wrd").alias("first_word_pos"),
        )
        .repartition(1)
        .sortWithinPartitions("word")
    )


def sax_words_sql() -> str:
    return f"""
WITH days AS (
  SELECT ROW_NUMBER() OVER (ORDER BY o_orderdate) AS d,
         CAST(SUM(round(o_totalprice * 100)) AS BIGINT) AS x
  FROM orders GROUP BY o_orderdate
),
blocks AS (
  SELECT (d - 1) // {SAX_PAA} AS blk, SUM(x) AS s, COUNT(*) AS cnt
  FROM days GROUP BY 1
),
sym AS (
  SELECT blk, substr('{SAX_ALPHA}', NTILE(4) OVER (ORDER BY s, blk), 1) AS sy
  FROM blocks WHERE cnt = {SAX_PAA}
),
words AS (
  SELECT blk // {SAX_WORD} AS wrd,
         string_agg(sy, '' ORDER BY blk) AS word,
         COUNT(*) AS nblk
  FROM sym GROUP BY 1
)
SELECT word, COUNT(*) AS n, MIN(wrd) AS first_word_pos
FROM words WHERE nblk = {SAX_WORD}
GROUP BY word ORDER BY word
"""


Q2_TYPE = "STANDARD"
Q2_REGION = "EUROPE"


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (Minimum Cost Supplier, adapted — the fixture has
    no partsupp, so 'supply cost' = per-(part, supplier) average unit
    price derived from lineitem, held exact as integer cost_ppk =
    div(1e6 * disc_cents, qty)): for STANDARD parts, the EUROPE
    supplier(s) achieving the per-part minimum cost, with the correlated
    MIN subquery expressed as a per-part window minimum.

    Scale shape: ONE shuffle builds the (partkey, suppkey) cost table
    from lineitem with map-side partial aggregation; supplier and
    nation/region are broadcast dims applied before the window so the
    min runs over the already-filtered region; the per-part MIN is a
    window over the partkey hash partitioning just produced (no extra
    shuffle — partkey is a prefix of the agg key); part is a broadcast
    dim joined last on the shrunken winner set.  All comparisons exact
    integers; ties keep every min-cost supplier, as Q2 does."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.round(cents(F.col("l_extendedprice")) * (1.0 - F.col("l_discount")))
        .cast("long")
        .alias("disc_cents"),
        F.round(F.col("l_quantity")).cast("long").alias("qty"),
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("disc_cents").alias("sum_cents"),
        F.sum("qty").alias("sum_qty"),
    ).withColumn("cost_ppk", F.expr("div(1000000 * sum_cents, sum_qty)"))

    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    nr = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        "n_nationkey", "n_name"
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu = ps.join(F.broadcast(s), ps["l_suppkey"] == s["s_suppkey"])
    w = Window.partitionBy("l_partkey")
    win = eu.withColumn("min_cost", F.min("cost_ppk").over(w)).where(
        F.col("cost_ppk") == F.col("min_cost")
    )
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == Q2_TYPE)
        .select("p_partkey", "p_brand", "p_size")
    )
    return (
        win.join(F.broadcast(p), win["l_partkey"] == p["p_partkey"])
        .select(
            "p_partkey",
            "p_brand",
            F.col("p_size").cast("int").alias("p_size"),
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "n_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("acctbal_c"),
            "cost_ppk",
        )
        .repartition(1)
        .sortWithinPartitions("p_partkey", "suppkey")
    )


def min_cost_supplier_sql() -> str:
    return f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(round(round(l_extendedprice * 100) * (1 - l_discount)) AS BIGINT))
           AS sum_cents,
         SUM(CAST(round(l_quantity) AS BIGINT)) AS sum_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT ps.l_partkey, ps.l_suppkey,
         1000000 * sum_cents // sum_qty AS cost_ppk,
         s_name, n_name, s_acctbal
  FROM ps, supplier, nation, region
  WHERE ps.l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_regionkey = r_regionkey AND r_name = '{Q2_REGION}'
),
win AS (
  SELECT *, MIN(cost_ppk) OVER (PARTITION BY l_partkey) AS min_cost FROM eu
)
SELECT p_partkey, p_brand, CAST(p_size AS INT) AS p_size,
       l_suppkey AS suppkey, s_name, n_name,
       CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_c,
       CAST(cost_ppk AS BIGINT) AS cost_ppk
FROM win JOIN part ON l_partkey = p_partkey
WHERE cost_ppk = min_cost AND p_type = '{Q2_TYPE}'
ORDER BY p_partkey, suppkey
"""


# --- Gorilla timestamp compression census ----------------------------------------------------

GORILLA_BUCKETS = (  # (|D| bound as closed interval [lo, hi], encoded bits) — Pelkonen 2015 §4.1.1
    (0, 0, 1),          # '0'
    (-63, 64, 9),       # '10'  + 7
    (-255, 256, 12),    # '110' + 9
    (-2047, 2048, 16),  # '1110'+ 12
)
GORILLA_ELSE_BITS = 36  # '1111' + 32


def gorilla_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla delta-of-delta timestamp compression census (Pelkonen et
    al., VLDB 2015 §4.1.1 — the encoding behind every modern TSDB's
    timestamp stream): per user, events ordered by (ts, event_id), the
    microsecond delta-of-delta D = (t_n - t_{n-1}) - (t_{n-1} - t_{n-2})
    classified into the paper's variable-length buckets
    {1, 9, 12, 16, 36} bits, plus the exact total stream size with a
    64-bit header per first/second timestamp.  Everything is int64
    arithmetic on unix_micros — no float ever enters the plan.

    Scale shape: ONE shuffle (window partitioned by user_id) + a
    groupBy on the same key Catalyst collapses into the sorted
    partition; all expressions whole-stage-codegen'd CASE ladders."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    d = ev.withColumn("dt", F.col("t") - F.lag("t", 1).over(w)).withColumn(
        "dd", F.col("dt") - F.lag("dt", 1).over(w)
    )
    arms = F.when(F.col("dd").isNull(), F.lit(None).cast("long"))
    for lo, hi, bits in GORILLA_BUCKETS:
        arms = arms.when((F.col("dd") >= lo) & (F.col("dd") <= hi), bits)
    d = d.withColumn("bits", arms.otherwise(GORILLA_ELSE_BITS))
    return (
        d.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                F.lit(64) * F.least(F.count("*"), F.lit(2))
                + F.coalesce(F.sum("bits"), F.lit(0))
            ).alias("bits_total"),
            F.sum(F.when(F.col("bits") == 1, 1).otherwise(0)).alias("n_b1"),
            F.sum(F.when(F.col("bits") == 9, 1).otherwise(0)).alias("n_b9"),
            F.sum(F.when(F.col("bits") == 12, 1).otherwise(0)).alias("n_b12"),
            F.sum(F.when(F.col("bits") == 16, 1).otherwise(0)).alias("n_b16"),
            F.sum(F.when(F.col("bits") == 36, 1).otherwise(0)).alias("n_b36"),
            F.coalesce(F.sum(F.abs("dd")), F.lit(0)).alias("abs_dd_sum"),
        )
        .repartition(1)
        .sortWithinPartitions("user_id")
    )


def gorilla_size_sql() -> str:
    arms = " ".join(
        f"WHEN dd >= {lo} AND dd <= {hi} THEN {bits}"
        for lo, hi, bits in GORILLA_BUCKETS
    )
    return f"""
WITH d AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS dt
  FROM events
),
dd AS (
  SELECT user_id,
         dt - lag(dt) OVER (PARTITION BY user_id ORDER BY t, event_id) AS dd
  FROM d
),
bits AS (
  SELECT user_id, dd,
         CASE WHEN dd IS NULL THEN NULL {arms}
              ELSE {GORILLA_ELSE_BITS} END AS bits
  FROM dd
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(64 * least(COUNT(*), 2) + COALESCE(SUM(bits), 0) AS BIGINT) AS bits_total,
       CAST(SUM(CASE WHEN bits = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b1,
       CAST(SUM(CASE WHEN bits = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_b9,
       CAST(SUM(CASE WHEN bits = 12 THEN 1 ELSE 0 END) AS BIGINT) AS n_b12,
       CAST(SUM(CASE WHEN bits = 16 THEN 1 ELSE 0 END) AS BIGINT) AS n_b16,
       CAST(SUM(CASE WHEN bits = 36 THEN 1 ELSE 0 END) AS BIGINT) AS n_b36,
       CAST(COALESCE(SUM(abs(dd)), 0) AS BIGINT) AS abs_dd_sum
FROM bits GROUP BY user_id ORDER BY user_id
"""


# --- Bollinger band breakouts (integer-exact) -------------------------------------------------

BOLL_WIN = 20    # trailing window length (days present in the series)
BOLL_C2 = 4      # c^2 for the +/- 2 sigma band
BOLL_UNIT = 10_000  # band-test series unit: $100 in cents (quantization floor)


def bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout detection over the daily order-revenue
    series, held integer-exact: with the trailing window's cent-exact
    sums S = Σy, Q = Σy², the ±2σ breakout test

        z² > c²  ⟺  (k·y − S)² > c² · (k·Q − S²)

    never forms a float mean or stddev — the classification that a
    quant backtest needs is decided in int64.  The test series is the
    daily revenue quantized to BOLL_UNIT ($100) floors and centered on
    its global integer-floor mean (the test is shift-invariant, and a
    $100 quantum is noise against ~$1.5M daily levels): |y| stays
    ≲3e4 at sf0.01, so k·Q and S² keep ~8 decimal orders of headroom
    under 2^63 — ANSI mode overflowed on raw cents at sf0.01 already,
    and exactness beats resolution here.  Emits per day the
    revenue, the scaled deviation k·y − S, the variance numerator
    k·Q − S², and the breakout state (+1 above, −1 below, 0 inside),
    only for days with a full k = BOLL_WIN trailing window.

    Scale shape: one groupBy(day) shuffle builds the series, a scalar
    broadcast carries the global baseline, then a single rows-frame
    window over the date order — at production scale the series is tiny
    relative to the fact table, so the window runs on an
    already-collapsed aggregate."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"), cents(F.col("o_totalprice")).alias("c")
    )
    day = o.groupBy("d").agg(F.sum("c").alias("rev_c")).withColumn(
        "rq", F.expr("div(rev_c, 10000)")
    )
    base = day.agg(
        F.expr("div(sum(rq), count(*))").alias("b")
    )
    w = Window.orderBy("d").rowsBetween(-BOLL_WIN, -1)
    t = (
        day.join(F.broadcast(base))
        .withColumn("y", F.col("rq") - F.col("b"))
        .withColumn("k", F.count("y").over(w))
        .withColumn("s", F.sum("y").over(w))
        .withColumn("q", F.sum(F.col("y") * F.col("y")).over(w))
        .where(F.col("k") == BOLL_WIN)
    )
    dev = F.col("k") * F.col("y") - F.col("s")
    varn = F.col("k") * F.col("q") - F.col("s") * F.col("s")
    return (
        t.select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "rev_c",
            dev.alias("dev_num"),
            varn.alias("var_num"),
            F.when((dev * dev > BOLL_C2 * varn) & (dev > 0), 1)
            .when((dev * dev > BOLL_C2 * varn) & (dev < 0), -1)
            .otherwise(0)
            .alias("breakout"),
        )
        .repartition(1)
        .sortWithinPartitions("day")
    )


def bollinger_breakouts_sql() -> str:
    return f"""
WITH day AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY d
),
dayq AS (SELECT d, rev_c, rev_c // {BOLL_UNIT} AS rq FROM day),
base AS (SELECT SUM(rq) // COUNT(*) AS b FROM dayq),
t AS (
  SELECT d, rev_c, rq - b AS y,
         COUNT(rq) OVER w AS k,
         SUM(rq - b) OVER w AS s,
         SUM((rq - b) * (rq - b)) OVER w AS q
  FROM dayq, base
  WINDOW w AS (ORDER BY d ROWS BETWEEN {BOLL_WIN} PRECEDING AND 1 PRECEDING)
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(rev_c AS BIGINT) AS rev_c,
       CAST(k * y - s AS BIGINT) AS dev_num,
       CAST(k * q - s * s AS BIGINT) AS var_num,
       CAST(CASE WHEN (k*y - s)*(k*y - s) > {BOLL_C2}*(k*q - s*s)
                 THEN CASE WHEN k*y - s > 0 THEN 1 ELSE -1 END
                 ELSE 0 END AS INT) AS breakout
FROM t WHERE k = {BOLL_WIN} ORDER BY day
"""


# --- HyperLogLog register census --------------------------------------------------------------

HLL_P = 6                    # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_WBITS = 40 - HLL_P       # 34-bit suffix feeds the rank


def hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register census (Flajolet et al. 2007 — the sketch
    behind approx_count_distinct): every doc_id hashes to the shared
    40-bit md5 prefix h40, the top HLL_P bits pick a register, and the
    register value is the max rank (leading zeros of the 34-bit suffix
    + 1; an all-zero suffix ranks 35).  Emitting the exact integer
    REGISTERS — not the float harmonic-mean estimate — keeps the whole
    surface int64; the estimate is a pure function of them, and
    pow2_sum = Σ 2^(35−reg) is the estimate's denominator numerator
    over the common 2^35 denominator, still exact.

    Rank arithmetic is engine-portable: floor(log2(w)) =
    length(bin(w)) − 1 in both Spark and DuckDB (bin() is unpadded in
    both), so rank = 35 − length(bin(w)).

    Scale shape: map-only hash + ONE 64-group partial+final agg — the
    exact shape a distributed HLL union takes at 10¹² rows; no row
    ever carries more than (bucket, rank)."""
    from .textops import h40

    d = _t(spark, sf_dir, "documents").select(
        h40(F.col("doc_id").cast("string")).alias("hv")
    )
    w = F.col("hv") % (1 << HLL_WBITS)
    rank = F.when(w == 0, HLL_WBITS + 1).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(w))
    )
    reg = d.select(
        F.shiftright(F.col("hv"), HLL_WBITS).alias("bucket"), rank.alias("rank")
    )
    return (
        reg.groupBy("bucket")
        .agg(
            F.max("rank").cast("long").alias("register"),
            F.count("*").alias("n_items"),
        )
        .select(
            "bucket",
            "register",
            "n_items",
            F.pow(F.lit(2.0), F.lit(HLL_WBITS + 1).cast("double") - F.col("register"))
            .cast("long")
            .alias("pow2_term"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


def hll_registers_sql() -> str:
    h = "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS BIGINT)"
    return f"""
WITH hs AS (SELECT {h} AS hv FROM documents),
reg AS (
  SELECT hv >> {HLL_WBITS} AS bucket,
         CASE WHEN hv % {1 << HLL_WBITS} = 0 THEN {HLL_WBITS + 1}
              ELSE {HLL_WBITS + 1} - length(bin(hv % {1 << HLL_WBITS})) END AS rank
  FROM hs
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(MAX(rank) AS BIGINT) AS register,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(pow(2, {HLL_WBITS + 1} - MAX(rank)) AS BIGINT) AS pow2_term
FROM reg GROUP BY bucket ORDER BY bucket
"""


# --- Luhn check-digit audit --------------------------------------------------------------------

LUHN_MULT = 982_451_653      # prime mixer for the synthetic account number
LUHN_DIGITS = 12


def luhn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 check-digit audit (ISO/IEC 7812 — the validity scan
    a payments/PII pipeline runs over card-shaped columns): each order
    synthesizes the deterministic 12-digit account number
    acct = (o_orderkey·LUHN_MULT + o_custkey) mod 10¹², and the audit
    counts Luhn-valid numbers per order priority.  The doubled-digit
    sum is a statically unrolled 12-term integer expression — fully
    whole-stage-codegen'd, no UDF, no explode.

    Scale shape: map-only digit arithmetic + one tiny groupBy(priority)
    partial+final agg."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (
            (F.col("o_orderkey") * LUHN_MULT + F.col("o_custkey"))
            % (10 ** LUHN_DIGITS)
        ).alias("acct"),
    )
    total = F.lit(0)
    for i in range(LUHN_DIGITS):
        d = F.expr(f"div(acct, {10 ** i})") % 10  # exact integer division
        if i % 2 == 1:  # double every second digit from the rightmost
            dd = d * 2
            term = F.when(dd > 9, dd - 9).otherwise(dd)
        else:
            term = d
        total = total + term
    a = o.withColumn("luhn_ok", (total % 10 == 0).cast("long"))
    return (
        a.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum("luhn_ok").alias("n_valid"),
            F.sum(F.col("acct") % 10).alias("check_digit_sum"),
        )
        .repartition(1)
        .sortWithinPartitions("o_orderpriority")
    )


def luhn_audit_sql() -> str:
    terms = []
    for i in range(LUHN_DIGITS):
        d = f"(acct // {10 ** i}) % 10"
        if i % 2 == 1:
            terms.append(
                f"CASE WHEN ({d}) * 2 > 9 THEN ({d}) * 2 - 9 ELSE ({d}) * 2 END"
            )
        else:
            terms.append(f"({d})")
    s = " + ".join(terms)
    return f"""
WITH a AS (
  SELECT o_orderpriority,
         (o_orderkey * {LUHN_MULT} + o_custkey) % {10 ** LUHN_DIGITS} AS acct
  FROM orders
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN ({s}) % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
       CAST(SUM(acct % 10) AS BIGINT) AS check_digit_sum
FROM a GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- Partial autocorrelation via Durbin-Levinson ----------------------------------------------

PACF_LAGS = 4


def pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation function of the daily order-count series
    via the Durbin-Levinson recursion (Box-Jenkins model-order
    identification — the PACF cutoff picks the AR order): the
    autocovariances are EXACT integers on the n-scaled centered series
    z_t = n·x_t − S (γ_k = Σ z_t z_{t+k}, |z| ≲ n·σ so the products
    stay far inside int64 at fixture scale), and only the final
    4-level recursion divides — an identical textual float64 chain on
    both engines, rounded to 6 decimals.

    Scale shape: one groupBy(day) shuffle, one ordered window with 4
    lead columns (no self-join), one scalar agg; the recursion is a
    1-row select."""
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("d"))
    day = o.groupBy("d").agg(F.count(F.lit(1)).alias("x"))
    n_s = day.agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    w = Window.orderBy("d")
    z = (
        day.join(F.broadcast(n_s))
        .withColumn("z", F.col("n") * F.col("x") - F.col("s"))
        .select(
            "z",
            *[F.lead("z", k).over(w).alias(f"z{k}") for k in range(1, PACF_LAGS + 1)],
        )
    )
    g = z.agg(
        F.sum(F.col("z") * F.col("z")).alias("g0"),
        *[
            F.sum(F.col("z") * F.col(f"z{k}")).alias(f"g{k}")
            for k in range(1, PACF_LAGS + 1)
        ],
    )
    # Durbin-Levinson, textually identical to pacf_durbin_sql
    rec = g.selectExpr(
        "g0", "g1", "g2", "g3", "g4",
        "CAST(g1 AS DOUBLE) / g0 AS r1",
        "CAST(g2 AS DOUBLE) / g0 AS r2",
        "CAST(g3 AS DOUBLE) / g0 AS r3",
        "CAST(g4 AS DOUBLE) / g0 AS r4",
    ).selectExpr(
        "*", "r1 AS p11"
    ).selectExpr(
        "*", "1 - p11 * p11 AS v1"
    ).selectExpr(
        "*", "(r2 - p11 * r1) / v1 AS p22"
    ).selectExpr(
        "*", "p11 - p22 * p11 AS p21", "v1 * (1 - p22 * p22) AS v2"
    ).selectExpr(
        "*", "(r3 - p21 * r2 - p22 * r1) / v2 AS p33"
    ).selectExpr(
        "*", "p21 - p33 * p22 AS p31", "p22 - p33 * p21 AS p32",
        "v2 * (1 - p33 * p33) AS v3"
    ).selectExpr(
        "*", "(r4 - p31 * r3 - p32 * r2 - p33 * r1) / v3 AS p44"
    )
    out = rec.selectExpr(
        "stack(4, "
        "1L, g1, round(p11, 6), "
        "2L, g2, round(p22, 6), "
        "3L, g3, round(p33, 6), "
        "4L, g4, round(p44, 6)) AS (lag, gamma, pacf)"
    )
    return out.repartition(1).sortWithinPartitions("lag")


def pacf_durbin_sql() -> str:
    return """
WITH day AS (
  SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS x
  FROM orders GROUP BY d
),
ns AS (SELECT COUNT(*) AS n, SUM(x) AS s FROM day),
z AS (
  SELECT n * x - s AS z,
         lead(n * x - s, 1) OVER (ORDER BY d) AS z1,
         lead(n * x - s, 2) OVER (ORDER BY d) AS z2,
         lead(n * x - s, 3) OVER (ORDER BY d) AS z3,
         lead(n * x - s, 4) OVER (ORDER BY d) AS z4
  FROM day, ns
),
g AS (
  SELECT SUM(z * z) AS g0, SUM(z * z1) AS g1, SUM(z * z2) AS g2,
         SUM(z * z3) AS g3, SUM(z * z4) AS g4
  FROM z
),
r AS (
  SELECT *, CAST(g1 AS DOUBLE) / g0 AS r1, CAST(g2 AS DOUBLE) / g0 AS r2,
         CAST(g3 AS DOUBLE) / g0 AS r3, CAST(g4 AS DOUBLE) / g0 AS r4
  FROM g
),
s1 AS (SELECT *, r1 AS p11 FROM r),
s1b AS (SELECT *, 1 - p11 * p11 AS v1 FROM s1),
s2 AS (SELECT *, (r2 - p11 * r1) / v1 AS p22 FROM s1b),
s2b AS (SELECT *, p11 - p22 * p11 AS p21, v1 * (1 - p22 * p22) AS v2 FROM s2),
s3 AS (SELECT *, (r3 - p21 * r2 - p22 * r1) / v2 AS p33 FROM s2b),
s3b AS (SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32,
               v2 * (1 - p33 * p33) AS v3 FROM s3),
s4 AS (SELECT *, (r4 - p31 * r3 - p32 * r2 - p33 * r1) / v3 AS p44 FROM s3b)
SELECT lag, gamma, pacf FROM (
  SELECT 1::BIGINT AS lag, CAST(g1 AS BIGINT) AS gamma, round(p11, 6) AS pacf FROM s4
  UNION ALL SELECT 2, CAST(g2 AS BIGINT), round(p22, 6) FROM s4
  UNION ALL SELECT 3, CAST(g3 AS BIGINT), round(p33, 6) FROM s4
  UNION ALL SELECT 4, CAST(g4 AS BIGINT), round(p44, 6) FROM s4
) ORDER BY lag
"""


# --- Consistent-hashing ring audit -----------------------------------------------------------

RING_NODES = 8
RING_VNODES = 16


def hash_ring_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing ring audit (Karger et al. 1997 — the
    assignment scheme behind Dynamo/Cassandra-style sharding): 8
    storage nodes each project RING_VNODES virtual points onto the
    40-bit hash ring at h40('node<i>:<v>'); every document routes to
    the first ring point clockwise of h40(doc_id) (wrapping to the
    global minimum).  The audit emits per node: keys owned, the exact
    Σdoc_id checksum, and the number of vnodes that own at least one
    key — the balance surface a capacity planner reads.

    Scale shape: the ring is a 128-row broadcast dim; routing is a
    broadcast min-over-qualifying-points aggregation keyed by doc —
    no shuffle wider than the final 8-group rollup."""
    from .textops import h40

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", h40(F.col("doc_id").cast("string")).alias("hd")
    )
    ring = spark.createDataFrame(
        [(n, v) for n in range(RING_NODES) for v in range(RING_VNODES)],
        "node int, vnode int",
    ).select(
        "node", "vnode",
        h40(F.concat_ws(":", F.concat(F.lit("node"), F.col("node")), F.col("vnode")))
        .alias("pos"),
    )
    # clockwise successor: min pos >= hd, else global min (wrap)
    cand = docs.join(F.broadcast(ring), F.col("pos") >= F.col("hd"), "left")
    succ = cand.groupBy("doc_id", "hd").agg(
        F.min(F.struct("pos", "node", "vnode")).alias("s")
    )
    wrap = ring.orderBy("pos", "node", "vnode").limit(1).select(
        F.col("pos").alias("wpos"), F.col("node").alias("wnode"),
        F.col("vnode").alias("wvnode"),
    )
    routed = succ.join(F.broadcast(wrap)).select(
        "doc_id",
        F.coalesce(F.col("s.node"), F.col("wnode")).alias("node"),
        F.coalesce(F.col("s.vnode"), F.col("wvnode")).alias("vnode"),
    )
    return (
        routed.groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("doc_id").alias("key_checksum"),
            F.countDistinct("vnode").alias("n_active_vnodes"),
        )
        .repartition(1)
        .sortWithinPartitions("node")
    )


def hash_ring_assign_sql() -> str:
    h = "CAST('0x' || substring(md5({c}), 1, 10) AS BIGINT)"
    ring_rows = ", ".join(
        f"({n}, {v})" for n in range(RING_NODES) for v in range(RING_VNODES)
    )
    return f"""
WITH ring(node, vnode) AS (VALUES {ring_rows}),
rp AS (
  SELECT node, vnode,
         {h.format(c="'node' || CAST(node AS VARCHAR) || ':' || CAST(vnode AS VARCHAR)")} AS pos
  FROM ring
),
d AS (
  SELECT doc_id, {h.format(c="CAST(doc_id AS VARCHAR)")} AS hd FROM documents
),
succ AS (
  SELECT d.doc_id, d.hd,
         MIN(struct_pack(pos := rp.pos, node := rp.node, vnode := rp.vnode)) AS s
  FROM d LEFT JOIN rp ON rp.pos >= d.hd
  GROUP BY d.doc_id, d.hd
),
wrap AS (
  SELECT pos AS wpos, node AS wnode, vnode AS wvnode
  FROM rp ORDER BY pos, node, vnode LIMIT 1
),
routed AS (
  SELECT doc_id,
         COALESCE(s.node, wnode) AS node,
         COALESCE(s.vnode, wvnode) AS vnode
  FROM succ, wrap
)
SELECT CAST(node AS INT) AS node,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(doc_id) AS BIGINT) AS key_checksum,
       CAST(COUNT(DISTINCT vnode) AS BIGINT) AS n_active_vnodes
FROM routed GROUP BY node ORDER BY node
"""


# --- Bloom filter false-positive audit --------------------------------------------------------

BLOOM_M = 1 << 18   # bits in the filter
BLOOM_K = 3         # hash functions


def bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter false-positive audit (Bloom 1970, exact): build the
    filter over the BUYER custkey set (customers with >= 1 order) with
    k = 3 positions h40(key ':' i) mod m, then probe EVERY customer and
    count, per market segment: members, true hits, and exact false
    positives (all k bits set but not a buyer) — the measured FPR the
    capacity formula (1 - e^(-kn/m))^k only predicts.

    Scale shape: the filter is a distinct-(position) build — shuffle
    volume bounded by m regardless of input size — and the probe is a
    k-way position semi-join counted per key; exactly how a distributed
    bloom build/probe pair shards at 10^12 keys, with the final rollup
    a tiny per-segment agg."""
    from .textops import h40

    o = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    pos = [
        h40(F.concat_ws(":", F.col("o_custkey"), F.lit(i))) % BLOOM_M
        for i in range(BLOOM_K)
    ]
    bits = (
        o.select(F.explode(F.array(*pos)).alias("bit")).distinct()
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cpos = c.select(
        "c_custkey",
        "c_mktsegment",
        F.posexplode(
            F.array(
                *[
                    h40(F.concat_ws(":", F.col("c_custkey"), F.lit(i))) % BLOOM_M
                    for i in range(BLOOM_K)
                ]
            )
        ).alias("i", "bit"),
    )
    hits = (
        cpos.join(bits, "bit", "left_semi")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("k_hit"))
    )
    probe = (
        c.join(hits.select("c_custkey", "k_hit"), "c_custkey", "left")
        .withColumn("maybe", (F.coalesce("k_hit", F.lit(0)) == BLOOM_K).cast("long"))
        .join(
            o.select(F.col("o_custkey").alias("c_custkey")).withColumn(
                "is_buyer", F.lit(1)
            ),
            "c_custkey",
            "left",
        )
        .withColumn("is_buyer", F.coalesce("is_buyer", F.lit(0)))
    )
    return (
        probe.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("is_buyer").alias("n_buyers"),
            F.sum(F.col("maybe") * F.col("is_buyer")).alias("n_true_hits"),
            F.sum(F.col("maybe") * (1 - F.col("is_buyer"))).alias("n_false_pos"),
        )
        .repartition(1)
        .sortWithinPartitions("c_mktsegment")
    )


def bloom_fpr_sql() -> str:
    def h(c: str, i: int) -> str:
        return (
            f"CAST('0x' || substring(md5(CAST({c} AS VARCHAR) || ':' || '{i}'), 1, 10)"
            f" AS BIGINT) % {BLOOM_M}"
        )

    probe_pos = " UNION ALL ".join(
        f"SELECT c_custkey, {h('c_custkey', i)} AS bit FROM customer"
        for i in range(BLOOM_K)
    )
    build_pos = " UNION ".join(
        f"SELECT {h('o_custkey', i)} AS bit FROM buyers"
        for i in range(BLOOM_K)
    )
    return f"""
WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
bits AS ({build_pos}),
cpos AS ({probe_pos}),
hits AS (
  SELECT c_custkey, COUNT(*) AS k_hit
  FROM cpos WHERE EXISTS (SELECT 1 FROM bits b WHERE b.bit = cpos.bit)
  GROUP BY c_custkey
),
probe AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CASE WHEN COALESCE(h.k_hit, 0) = {BLOOM_K} THEN 1 ELSE 0 END AS maybe,
         CASE WHEN b.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS is_buyer
  FROM customer c
  LEFT JOIN hits h ON h.c_custkey = c.c_custkey
  LEFT JOIN buyers b ON b.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(is_buyer) AS BIGINT) AS n_buyers,
       CAST(SUM(maybe * is_buyer) AS BIGINT) AS n_true_hits,
       CAST(SUM(maybe * (1 - is_buyer)) AS BIGINT) AS n_false_pos
FROM probe GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --- Longest-prefix-match routing audit -------------------------------------------------------

LPM_PREFIXES: tuple[tuple[int, int], ...] = tuple(
    sorted(
        {
            # (network, length) — deterministic /8../28 lab table
            (0x0A000000, 8),          # 10.0.0.0/8
            (0x0A140000, 16),         # 10.20.0.0/16
            (0x0A142800, 24),         # 10.20.40.0/24
            (0x0A1428F0, 28),         # 10.20.40.240/28
            (0xAC100000, 12),         # 172.16.0.0/12
            (0xAC1F8000, 17),         # 172.31.128.0/17
            (0xC0A80000, 16),         # 192.168.0.0/16
            (0xC0A86400, 24),         # 192.168.100.0/24
            (0x08080000, 16),         # 8.8.0.0/16
            (0x08080800, 24),         # 8.8.8.0/24
            (0x00000000, 0),          # default route
        }
    )
)


def lpm_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix-match routing audit (the CIDR table lookup every
    flow-log / clickstream geo-enrichment pipeline runs): each order
    synthesizes the deterministic IPv4 ip = h40(o_orderkey) mod 2³²,
    routes via the longest matching prefix of the 11-entry lab table
    (ip >> (32−len) == net >> (32−len); /0 catches all), and the audit
    counts per route: flows, distinct customers, and the Σip checksum.

    Scale shape: the table is a literal broadcast dim; the theta-join
    explodes each flow into its matching prefixes (≤ table size) and
    ONE groupBy(flow).max(struct) picks the longest — then a tiny
    per-route rollup.  At 10¹² flows this is the standard broadcast
    LPM shape (real routers trie it; the relational plan need not)."""
    from .textops import h40

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (h40(F.col("o_orderkey").cast("string")) % (1 << 32)).alias("ip"),
    )
    tbl = spark.createDataFrame(
        [(int(n), int(l)) for n, l in LPM_PREFIXES], "net long, len int"
    )
    m = o.join(
        F.broadcast(tbl),
        F.expr("shiftright(ip, 32 - len) = shiftright(net, 32 - len)"),
    )
    best = m.groupBy("o_orderkey", "o_custkey", "ip").agg(
        F.max(F.struct("len", "net")).alias("r")
    )
    return (
        best.groupBy(F.col("r.net").alias("net"), F.col("r.len").alias("len"))
        .agg(
            F.count(F.lit(1)).alias("n_flows"),
            F.countDistinct("o_custkey").alias("n_custs"),
            F.sum("ip").alias("ip_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("net", "len")
    )


def lpm_route_sql() -> str:
    tbl_rows = ", ".join(f"({n}, {l})" for n, l in LPM_PREFIXES)
    h = "CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 10) AS BIGINT)"
    return f"""
WITH tbl(net, len) AS (VALUES {tbl_rows}),
o AS (
  SELECT o_orderkey, o_custkey, {h} % 4294967296 AS ip FROM orders
),
m AS (
  SELECT o.o_orderkey, o.o_custkey, o.ip, t.net, t.len
  FROM o JOIN tbl t ON (o.ip >> (32 - t.len)) = (t.net >> (32 - t.len))
),
best AS (
  SELECT o_orderkey, o_custkey, ip,
         MAX(struct_pack(len := len, net := net)) AS r
  FROM m GROUP BY o_orderkey, o_custkey, ip
)
SELECT CAST(r.net AS BIGINT) AS net, CAST(r.len AS INT) AS len,
       CAST(COUNT(*) AS BIGINT) AS n_flows,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
       CAST(SUM(ip) AS BIGINT) AS ip_checksum
FROM best GROUP BY r.net, r.len ORDER BY net, len
"""


# --- Jenks natural breaks (integer DP) --------------------------------------------------------

JENKS_K = 4
JENKS_BINS = 256
JENKS_BIN_C = 2500_00  # cents per bin: o_totalprice 0..640k -> bins 0..255


def jenks_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jenks natural-breaks classification (the GIS choropleth
    classifier — Fisher's exact optimal-partition DP) over the 256-bin
    order-value histogram, k = 4 classes, held integer-exact: segment
    badness is the n-scaled squared-deviation numerator
    (N·Q − S²) over the segment's prefix-sum differences (the float
    SSE times the segment count — same argmin ordering within a fixed
    segment, documented variant so no rational arithmetic is needed),
    ties broken toward the smallest split.  Emits one row per DP layer
    boundary: the class index, its argmin split bin, and the final
    objective — the full backtrack, not just the last break.

    Scale shape: the histogram build is the only data-sized pass (one
    partial+final 256-group agg); the DP is three 256×256 key-local
    joins over a broadcast-sized table — at any corpus scale the DP
    cost is constant."""
    o = _t(spark, sf_dir, "orders").select(
        F.least(
            F.lit(JENKS_BINS - 1),
            F.expr(f"div(CAST(round(o_totalprice * 100) AS BIGINT), {JENKS_BIN_C})"),
        ).alias("b")
    )
    hist = o.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    grid = spark.range(JENKS_BINS).select(F.col("id").alias("b"))
    h = (
        grid.join(hist, "b", "left")
        .select("b", F.coalesce("n", F.lit(0)).alias("n"))
        .select("b", "n", (F.col("n") * F.col("b")).alias("s"),
                (F.col("n") * F.col("b") * F.col("b")).alias("q"))
    )
    wnd = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    pre = h.select(
        "b",
        F.sum("n").over(wnd).alias("N"),
        F.sum("s").over(wnd).alias("S"),
        F.sum("q").over(wnd).alias("Q"),
    ).localCheckpoint(eager=True)
    zero = spark.range(1).select(
        F.lit(-1).alias("b"), F.lit(0).alias("N"), F.lit(0).alias("S"),
        F.lit(0).alias("Q"),
    )
    pz = pre.unionByName(zero)

    def cost(Ni, Qi, Si, Nj, Qj, Sj):
        return (Ni - Nj) * (Qi - Qj) - (Si - Sj) * (Si - Sj)

    # D1[i] = cost(0..i)
    d = pre.join(F.broadcast(zero.select(
        F.col("N").alias("N0"), F.col("S").alias("S0"), F.col("Q").alias("Q0"))),
    ).select(
        "b",
        cost(F.col("N"), F.col("Q"), F.col("S"),
             F.col("N0"), F.col("Q0"), F.col("S0")).alias("obj"),
        F.lit(-1).cast("long").alias("j"),
    )
    layers = [d]
    for _ in range(2, JENKS_K + 1):
        dj = layers[-1].select(
            F.col("b").alias("jb"), F.col("obj").alias("pobj")
        )
        cand = (
            pre.join(F.broadcast(dj), F.col("jb") < F.col("b"))
            .join(
                F.broadcast(pz.select(
                    F.col("b").alias("jb2"), F.col("N").alias("Nj"),
                    F.col("S").alias("Sj"), F.col("Q").alias("Qj"))),
                F.col("jb2") == F.col("jb"),
            )
            .select(
                "b",
                (F.col("pobj")
                 + cost(F.col("N"), F.col("Q"), F.col("S"),
                        F.col("Nj"), F.col("Qj"), F.col("Sj"))).alias("cobj"),
                F.col("jb"),
            )
        )
        nxt = (
            cand.groupBy("b")
            .agg(F.min(F.struct("cobj", "jb")).alias("m"))
            .select("b", F.col("m.cobj").alias("obj"), F.col("m.jb").alias("j"))
            # ckpt+cache: see graph._pin (join-stats compound per round)
            .localCheckpoint(eager=False)
            .cache()
        )
        nxt.count()
        layers.append(nxt)
    # backtrack from the last bin through each layer's argmin
    rows = []
    last_b = JENKS_BINS - 1
    out = None
    for k in range(JENKS_K, 0, -1):
        lyr = layers[k - 1].where(F.col("b") == last_b).select(
            F.lit(k).alias("class_k"),
            F.col("b").cast("long").alias("seg_end"),
            F.col("j").cast("long").alias("split_bin"),
            F.col("obj").cast("long").alias("obj"),
        )
        r = lyr.first()
        rows.append((k, int(r["seg_end"]), int(r["split_bin"]), int(r["obj"])))
        last_b = int(r["split_bin"])
    out = spark.createDataFrame(
        rows, "class_k int, seg_end long, split_bin long, obj long"
    )
    return out.repartition(1).sortWithinPartitions("class_k")


def jenks_breaks_sql() -> str:
    cost = "((N_i - N_j) * (Q_i - Q_j) - (S_i - S_j) * (S_i - S_j))"
    layer_ctes = []
    for k in range(2, JENKS_K + 1):
        layer_ctes.append(f"""
d{k} AS MATERIALIZED (
  SELECT b, MIN(struct_pack(cobj := cobj, jb := jb)) AS m
  FROM (
    SELECT p.b, d.obj + {cost
        .replace('N_i', 'p.N').replace('Q_i', 'p.Q').replace('S_i', 'p.S')
        .replace('N_j', 'z.N').replace('Q_j', 'z.Q').replace('S_j', 'z.S')} AS cobj,
           d.b AS jb
    FROM pre p
    JOIN dd{k - 1} d ON d.b < p.b
    JOIN pz z ON z.b = d.b
  ) GROUP BY b
),
dd{k} AS MATERIALIZED (SELECT b, m.cobj AS obj, m.jb AS j FROM d{k})""")
    back = []
    for k in range(JENKS_K, 0, -1):
        if k == JENKS_K:
            back.append(
                f"b{k} AS (SELECT {k} AS class_k, b AS seg_end, j AS split_bin, obj"
                f" FROM dd{k} WHERE b = {JENKS_BINS - 1})"
            )
        else:
            back.append(
                f"b{k} AS (SELECT {k} AS class_k, d.b AS seg_end, d.j AS split_bin,"
                f" d.obj FROM dd{k} d JOIN b{k + 1} nx ON d.b = nx.split_bin)"
            )
    union = " UNION ALL ".join(
        f"SELECT class_k, seg_end, split_bin, obj FROM b{k}"
        for k in range(1, JENKS_K + 1)
    )
    return f"""
WITH o AS (
  SELECT least({JENKS_BINS - 1},
               CAST(round(o_totalprice * 100) AS BIGINT) // {JENKS_BIN_C}) AS b
  FROM orders
),
hist AS (SELECT b, COUNT(*) AS n FROM o GROUP BY b),
grid AS (SELECT unnest(range(0, {JENKS_BINS})) AS b),
h AS (
  SELECT g.b, COALESCE(hist.n, 0) AS n,
         COALESCE(hist.n, 0) * g.b AS s,
         COALESCE(hist.n, 0) * g.b * g.b AS q
  FROM grid g LEFT JOIN hist ON hist.b = g.b
),
pre AS MATERIALIZED (
  SELECT b, SUM(n) OVER w AS N, SUM(s) OVER w AS S, SUM(q) OVER w AS Q
  FROM h WINDOW w AS (ORDER BY b ROWS UNBOUNDED PRECEDING)
),
pz AS (SELECT * FROM pre UNION ALL SELECT -1, 0, 0, 0),
dd1 AS MATERIALIZED (
  SELECT b, N * Q - S * S AS obj, -1::BIGINT AS j FROM pre
),{",".join(layer_ctes)},
{",".join(back)}
SELECT CAST(class_k AS INT) AS class_k, CAST(seg_end AS BIGINT) AS seg_end,
       CAST(split_bin AS BIGINT) AS split_bin, CAST(obj AS BIGINT) AS obj
FROM ({union}) ORDER BY class_k
"""


# --- Poisson bootstrap replicates -------------------------------------------------------------

POISSON_REPS = 8
# Poisson(1) CDF, exact float64 literals shared by both engines
POISSON_CDF = (
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253,
)


def poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap replicates (Chamandy et al., Google 2012 — the
    streaming-friendly bootstrap: each row independently enters
    replicate r with Poisson(1) multiplicity, so resampling needs no
    global coordination): multiplicity k = inverse-CDF of the
    deterministic hash-uniform u = h40(doc ':' r)/2^40 against the
    literal Poisson(1) CDF (identical float64 constants and dyadic
    division on both engines — comparisons are bit-reproducible).
    Emits per replicate: effective row count Σk, the k-weighted
    n_chars total (the bootstrapped statistic), and rows dropped
    (k = 0) — the spread across replicates IS the uncertainty
    estimate.

    Scale shape: map-only multiplicity arithmetic + one 8-group
    partial+final agg; exactly how a 10¹²-row pipeline bootstraps."""
    from .textops import h40

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    reps = spark.range(POISSON_REPS).select(F.col("id").cast("int").alias("r"))
    u = (
        h40(F.concat_ws(":", F.col("doc_id"), F.col("r"))).cast("double")
        / float(1 << 40)
    )
    k = F.lit(len(POISSON_CDF))
    for i in range(len(POISSON_CDF) - 1, -1, -1):
        k = F.when(u < POISSON_CDF[i], i).otherwise(k)
    x = d.crossJoin(F.broadcast(reps)).select(
        "r", "n_chars", k.cast("long").alias("k")
    )
    return (
        x.groupBy("r")
        .agg(
            F.sum("k").alias("n_effective"),
            F.sum(F.col("k") * F.col("n_chars")).alias("chars_total"),
            F.sum((F.col("k") == 0).cast("long")).alias("n_dropped"),
        )
        .repartition(1)
        .sortWithinPartitions("r")
    )


def poisson_bootstrap_sql() -> str:
    h = ("CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' ||"
         " CAST(r AS VARCHAR)), 1, 10) AS BIGINT)")
    arms = " ".join(
        f"WHEN u < {POISSON_CDF[i]!r} THEN {i}"
        for i in range(len(POISSON_CDF))
    )
    return f"""
WITH reps AS (SELECT unnest(range(0, {POISSON_REPS})) AS r),
x AS (
  SELECT r, n_chars,
         CASE {arms} ELSE {len(POISSON_CDF)} END AS k
  FROM (
    SELECT r, n_chars, {h} / {float(1 << 40)!r} AS u
    FROM documents, reps
  )
)
SELECT CAST(r AS INT) AS r,
       CAST(SUM(k) AS BIGINT) AS n_effective,
       CAST(SUM(k * n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM x GROUP BY r ORDER BY r
"""


# --- Snowflake-id monotonicity audit ----------------------------------------------------------

SNOW_WORKERS = 32


def snowflake_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake-id audit (the Twitter snowflake layout every
    distributed id generator inherits: timestamp<<22 | worker<<12 |
    sequence): each event synthesizes the deterministic id
    (epoch_ms << 22) | (worker << 12) | (event_id mod 4096) with
    worker = user_id mod SNOW_WORKERS, and the audit checks the
    invariant an id service must keep — ids strictly increase per
    worker in (ts, event_id) order.  Emits per worker: ids issued,
    monotonicity violations (id <= previous), max sequence field, and
    the id checksum.

    Scale shape: one worker-keyed window (lag) + one tiny per-worker
    rollup — the exact shard-audit a 10¹²-id ledger runs."""
    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % SNOW_WORKERS).alias("worker"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        "event_id",
    )
    sid = (
        F.shiftleft(F.col("ms"), 22)
        + F.shiftleft(F.col("worker"), 12)
        + F.col("event_id") % 4096
    )
    w = Window.partitionBy("worker").orderBy("ms", "event_id")
    d = ev.select("worker", "ms", "event_id", sid.alias("sid")).withColumn(
        "prev", F.lag("sid").over(w)
    )
    return (
        d.groupBy("worker")
        .agg(
            F.count(F.lit(1)).alias("n_ids"),
            F.sum(
                F.when(
                    F.col("prev").isNotNull() & (F.col("sid") <= F.col("prev")), 1
                ).otherwise(0)
            ).alias("n_violations"),
            F.max(F.col("sid") % 4096).alias("max_seq"),
            F.sum(F.col("sid") % 1_000_003).alias("id_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("worker")
    )


def snowflake_audit_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id % {SNOW_WORKERS} AS worker,
         epoch_ms(ts) AS ms, event_id
  FROM events
),
d AS (
  SELECT worker, ms, event_id,
         (ms << 22) + (worker << 12) + event_id % 4096 AS sid,
         lag((ms << 22) + (worker << 12) + event_id % 4096)
           OVER (PARTITION BY worker ORDER BY ms, event_id) AS prev
  FROM ev
)
SELECT worker,
       CAST(COUNT(*) AS BIGINT) AS n_ids,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND sid <= prev THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       CAST(MAX(sid % 4096) AS BIGINT) AS max_seq,
       CAST(SUM(sid % 1000003) AS BIGINT) AS id_checksum
FROM d GROUP BY worker ORDER BY worker
"""


# --- Leaky-bucket rate-limiter audit ----------------------------------------------------------

LB_COST = 1000       # milli-units added per event
LB_LEAK_DIV = 2      # leak = dt_ms // 2  (0.5 unit/ms)
LB_BURST = 5000      # violation when post-arrival level exceeds this


def leaky_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaky-bucket rate-limiter audit (the token/leaky bucket of every
    API quota layer), evaluated WITHOUT sequential state: the bucket
    recursion level_n = max(0, level_{n-1} - leak_n) + cost is a
    Lindley recursion, whose exact solution is the max-of-suffix-sums
    transform — with X_n = cost - leak_n and prefix sums S_n,
    level_n = S_n - min_{m<n} S_m (the running minimum including the
    virtual S_0 = 0).  Two window functions replace the scan, so the
    audit is one shuffle and stays whole-stage-codegen'd — no UDF, no
    applyInPandas, no recursion on either engine.

    Emits per user: events, violations (level > LB_BURST), the exact
    max and final level in milli-units.

    Scale shape: ONE user-keyed window (cumsum + running min) + a
    per-user rollup — the shape a 10¹²-event quota audit takes."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    d = ev.withColumn("dt", F.col("ms") - F.lag("ms").over(w)).withColumn(
        "x",
        F.lit(LB_COST)
        - F.coalesce(F.expr(f"div(dt, {LB_LEAK_DIV})"), F.lit(0)),
    )
    cum = Window.partitionBy("user_id").orderBy("ms", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    d = d.withColumn("s", F.sum("x").over(cum)).withColumn(
        "runmin", F.least(F.lit(0).cast("long"), F.min(F.lag("s").over(w)).over(cum))
    )
    d = d.withColumn("level", F.col("s") - F.col("runmin"))
    return (
        d.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("level") > LB_BURST).cast("long")).alias("n_violations"),
            F.max("level").alias("max_level"),
            F.max_by("level", F.col("ms") * 1_000_000 + F.col("event_id")).alias(
                "final_level"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("user_id")
    )


def leaky_bucket_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id FROM events
),
d AS (
  SELECT user_id, ms, event_id,
         {LB_COST} - COALESCE((ms - lag(ms) OVER w) // {LB_LEAK_DIV}, 0) AS x
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
),
c1 AS (
  SELECT user_id, ms, event_id,
         SUM(x) OVER (PARTITION BY user_id ORDER BY ms, event_id
                      ROWS UNBOUNDED PRECEDING) AS s
  FROM d
),
c2 AS (
  SELECT user_id, ms, event_id, s,
         lag(s) OVER (PARTITION BY user_id ORDER BY ms, event_id) AS lag_s
  FROM c1
),
c3 AS (
  SELECT user_id, ms, event_id, s,
         LEAST(0, MIN(lag_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                   ROWS UNBOUNDED PRECEDING)) AS runmin
  FROM c2
),
lv AS (SELECT user_id, ms, event_id, s - runmin AS level FROM c3)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN level > {LB_BURST} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(MAX(level) AS BIGINT) AS max_level,
       CAST(max_by(level, ms * 1000000 + event_id) AS BIGINT) AS final_level
FROM lv GROUP BY user_id ORDER BY user_id
"""


# --- Population stability index ---------------------------------------------------------------

PSI_BINS = 16
PSI_BIN_C = 4_000_000  # cents per bin over o_totalprice
PSI_SPLIT_YEAR = 1996
PSI_EPS = 1e-6


def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index (the model-monitoring drift metric
    every production-ML scorecard tracks): the order-value distribution
    before vs from PSI_SPLIT_YEAR, 16 fixed-width bins, with
    psi = Σ (p_i − q_i)·ln(p_i/q_i) Laplace-smoothed by PSI_EPS.
    Emits per bin the exact counts plus the bin's psi term (round-9);
    the scalar PSI is the SUM of the column — kept per-bin so the
    drift ATTRIBUTION (which bins moved) is part of the surface.

    Scale shape: one 16-group partial+final agg per period — a single
    scan of the fact table at any scale."""
    o = _t(spark, sf_dir, "orders").select(
        F.least(
            F.lit(PSI_BINS - 1),
            F.expr(f"div(CAST(round(o_totalprice * 100) AS BIGINT), {PSI_BIN_C})"),
        ).alias("b"),
        (F.year(F.col("o_orderdate").cast("timestamp")) >= PSI_SPLIT_YEAR)
        .cast("int")
        .alias("period"),
    )
    cnt = o.groupBy("b").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("n_b"),
    )
    grid = spark.range(PSI_BINS).select(F.col("id").alias("b"))
    full = grid.join(cnt, "b", "left").select(
        "b",
        F.coalesce("n_a", F.lit(0)).alias("n_a"),
        F.coalesce("n_b", F.lit(0)).alias("n_b"),
    )
    tot = full.agg(
        F.sum("n_a").alias("ta"), F.sum("n_b").alias("tb")
    )
    j = full.join(F.broadcast(tot))
    p = F.col("n_a") / F.col("ta") + PSI_EPS
    q = F.col("n_b") / F.col("tb") + PSI_EPS
    return (
        j.select(
            "b", "n_a", "n_b",
            F.round((p - q) * F.log(p / q), 9).alias("psi_term"),
        )
        .repartition(1)
        .sortWithinPartitions("b")
    )


def psi_drift_sql() -> str:
    return f"""
WITH o AS (
  SELECT least({PSI_BINS - 1},
               CAST(round(o_totalprice * 100) AS BIGINT) // {PSI_BIN_C}) AS b,
         CASE WHEN year(o_orderdate) >= {PSI_SPLIT_YEAR} THEN 1 ELSE 0 END AS period
  FROM orders
),
cnt AS (
  SELECT b,
         SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS n_b
  FROM o GROUP BY b
),
grid AS (SELECT unnest(range(0, {PSI_BINS})) AS b),
fl AS (
  SELECT g.b, COALESCE(cnt.n_a, 0) AS n_a, COALESCE(cnt.n_b, 0) AS n_b
  FROM grid g LEFT JOIN cnt ON cnt.b = g.b
),
tot AS (SELECT SUM(n_a) AS ta, SUM(n_b) AS tb FROM fl)
SELECT CAST(b AS BIGINT) AS b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round((n_a / ta + {PSI_EPS!r} - (n_b / tb + {PSI_EPS!r}))
             * ln((n_a / ta + {PSI_EPS!r}) / (n_b / tb + {PSI_EPS!r})), 9)
         AS psi_term
FROM fl, tot ORDER BY b
"""


def ring_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hashing rebalance audit (the MINIMAL-DISRUPTION
    theorem of Karger rings: adding a node moves only the keys the new
    node claims — nothing reshuffles between old nodes): route every
    document on the RING_NODES-node ring and again with node 8 added,
    then report per old node how many keys stayed and how many moved,
    plus the violation count — keys that changed hands between two OLD
    nodes, provably 0, pinned by the oracle rather than assumed.

    Scale shape: two broadcast ring lookups + one doc-keyed equi-join
    of the assignments + an 8-group rollup."""
    from .textops import h40

    def route(n_nodes: int, tag: str) -> DataFrame:
        docs = _t(spark, sf_dir, "documents").select(
            "doc_id", h40(F.col("doc_id").cast("string")).alias("hd")
        )
        ring = spark.createDataFrame(
            [(n, v) for n in range(n_nodes) for v in range(RING_VNODES)],
            "node int, vnode int",
        ).select(
            "node",
            h40(
                F.concat_ws(
                    ":", F.concat(F.lit("node"), F.col("node")), F.col("vnode")
                )
            ).alias("pos"),
        )
        cand = docs.join(F.broadcast(ring), F.col("pos") >= F.col("hd"), "left")
        succ = cand.groupBy("doc_id").agg(
            F.min(F.struct("pos", "node")).alias("s")
        )
        wrap = ring.orderBy("pos", "node").limit(1).select(
            F.col("node").alias("wnode")
        )
        return succ.join(F.broadcast(wrap)).select(
            "doc_id", F.coalesce(F.col("s.node"), F.col("wnode")).alias(tag)
        )

    before = route(RING_NODES, "n_old")
    after = route(RING_NODES + 1, "n_new")
    j = before.join(after, "doc_id")
    return (
        j.groupBy("n_old")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((F.col("n_new") == F.col("n_old")).cast("long")).alias("n_stayed"),
            F.sum((F.col("n_new") == RING_NODES).cast("long")).alias("n_to_new"),
            F.sum(
                (
                    (F.col("n_new") != F.col("n_old"))
                    & (F.col("n_new") != RING_NODES)
                ).cast("long")
            ).alias("n_violations"),
        )
        .repartition(1)
        .sortWithinPartitions("n_old")
    )


def ring_rebalance_sql() -> str:
    h = "CAST('0x' || substring(md5({c}), 1, 10) AS BIGINT)"

    def route(n_nodes: int, alias: str) -> str:
        ring_rows = ", ".join(
            f"({n}, {v})" for n in range(n_nodes) for v in range(RING_VNODES)
        )
        return f"""
ring_{alias}(node, vnode) AS (VALUES {ring_rows}),
rp_{alias} AS (
  SELECT node,
         {h.format(c="'node' || CAST(node AS VARCHAR) || ':' || CAST(vnode AS VARCHAR)")} AS pos
  FROM ring_{alias}
),
succ_{alias} AS (
  SELECT d.doc_id, MIN(struct_pack(pos := rp.pos, node := rp.node)) AS s
  FROM d LEFT JOIN rp_{alias} rp ON rp.pos >= d.hd
  GROUP BY d.doc_id
),
wrap_{alias} AS (
  SELECT node AS wnode FROM rp_{alias} ORDER BY pos, node LIMIT 1
),
r_{alias} AS (
  SELECT doc_id, COALESCE(s.node, wnode) AS node FROM succ_{alias}, wrap_{alias}
)"""

    return f"""
WITH d AS (
  SELECT doc_id, {h.format(c="CAST(doc_id AS VARCHAR)")} AS hd FROM documents
),{route(RING_NODES, "a")},{route(RING_NODES + 1, "b")}
SELECT CAST(ra.node AS INT) AS n_old,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN rb.node = ra.node THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stayed,
       CAST(SUM(CASE WHEN rb.node = {RING_NODES} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_to_new,
       CAST(SUM(CASE WHEN rb.node <> ra.node AND rb.node <> {RING_NODES}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM r_a ra JOIN r_b rb ON rb.doc_id = ra.doc_id
GROUP BY ra.node ORDER BY n_old
"""


# --- LRU reuse-distance miss-ratio curve ------------------------------------------------------

MRC_SIZES = (4, 8, 16, 32, 64)


def lru_mrc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LRU miss-ratio curve via exact reuse distances (Mattson et al.
    1970 — the stack-distance analysis every cache-sizing exercise
    runs) over the FULL event trace: the stream's user_id sequence is
    the access trace; an access's reuse distance is the number of
    DISTINCT other keys touched since its previous access, and under
    LRU it hits a cache of size C iff distance < C.  Emits one row per
    candidate size: hits, compulsory (first-touch) misses, capacity
    misses — the whole curve from ONE distance computation.

    Distributed-exact formulation (no range join, no global window):
    for the access at position p with previous same-key access at a,
        sd(p) = D(p) − C(p)
    where D(p) = #distinct keys seen strictly before p (= #first-touch
    accesses at positions < p, a distributed prefix sum), and
    C(p) = #accesses J with pos(J) ≤ a AND next(J) ≥ p (next = the
    same key's following access, N+1 if none) — exactly the keys seen
    by time a that are NOT touched inside (a, p); each such key is
    counted once, by its last access ≤ a.  C is a 2-D dominance count
    (nested-interval containment) solved with a block grid: interior
    blocks come from a dense (start-block × end-block) corner-sum
    table (two partitioned window cumsums, every partition one block
    row/column), and only the two boundary block lines are checked
    point-level via EQUI-joins on the block id.  Positions come from
    spatial_index.global_rank (repartitionByRange + per-partition
    row_number + broadcast offsets) — no single-task sort anywhere.

    Scale shape: with block size B ≈ n^(1/3), grid = (n/B)² cells and
    boundary joins ≈ 2·n·B rows — both ~n^(2/3)·n^(1/3) = linear-ish;
    at 10¹²-access scale the grid goes hierarchical (two block levels)
    or drops to the SHARDS sampled estimator (Waldspurger FAST'15,
    hash(key) rate-R sampling, distances scaled 1/R) — both keep this
    same equi-join skeleton."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
    )
    dist_map, n, n_compulsory = _mrc_distances(spark, ev)
    n_reuse = sum(dist_map.values())
    rows = []
    for cs in MRC_SIZES:
        hits = sum(cnt for d, cnt in dist_map.items() if d < cs)
        rows.append((cs, n, n_compulsory, hits, n_reuse - hits))
    return (
        spark.createDataFrame(
            rows,
            "cache_size int, n_accesses long, n_compulsory long, "
            "n_hits long, n_capacity_miss long",
        )
        .repartition(1)
        .sortWithinPartitions("cache_size")
    )


def _mrc_distances(
    spark: SparkSession, ev: DataFrame
) -> tuple[dict[int, int], int, int]:
    """Exact reuse-distance histogram of an access trace
    (user_id, us, event_id) — the distributed D−C machinery documented
    on lru_mrc.  Returns (distance -> count, n_accesses, n_compulsory);
    shared by the exact operator and the SHARDS sampled tier."""
    from .spatial_index import global_rank

    ranked, n = global_rank(ev, ["us", "event_id"])
    wk = Window.partitionBy("user_id").orderBy("pos")
    iv = (
        ranked.select("user_id", F.col("rank").alias("pos"))
        .withColumn("prev", F.lag("pos").over(wk))
        .withColumn("nxt", F.coalesce(F.lead("pos").over(wk), F.lit(n + 1)))
        .withColumn("isf", F.when(F.col("prev").isNull(), 1).otherwise(0))
    )
    blk = max(64, min(4096, round(n ** (1.0 / 3.0))))
    nb = (n + 1 - 1) // blk + 1  # end positions reach n+1
    iv = (
        iv.withColumn("sblk", ((F.col("pos") - 1) / blk).cast("long"))
        .withColumn("eblk", ((F.col("nxt") - 1) / blk).cast("long"))
        .localCheckpoint(eager=True)
    )
    # D: exclusive prefix sum of first-touch flags in position order —
    # per-block window cumsum + a broadcast cumulative block-offset map
    # (the order_percentiles idiom; offsets are one row per block).
    blk_counts = sorted(
        (r["sblk"], r["c"])
        for r in iv.groupBy("sblk").agg(F.sum("isf").alias("c")).collect()
    )
    offs, acc_first = [], 0
    for b, c in blk_counts:
        offs.append((b, acc_first))
        acc_first += int(c)
    n_compulsory = acc_first
    off_df = F.broadcast(
        spark.createDataFrame(offs, schema="sblk long, d_off long")
    )
    wd = Window.partitionBy("sblk").orderBy("pos")
    with_d = (
        iv.withColumn("d_loc", F.sum("isf").over(wd) - F.col("isf"))
        .join(off_df, "sblk")
        .withColumn("d_seen", F.col("d_off") + F.col("d_loc"))
    )
    q = with_d.where(F.col("prev").isNotNull()).select(
        F.col("pos").alias("qpos"),
        F.col("prev").alias("qa"),
        F.col("d_seen"),
        ((F.col("prev") - 1) / blk).cast("long").alias("qi"),
        ((F.col("pos") - 1) / blk).cast("long").alias("qj"),
    )
    j = iv.select("pos", "nxt", "sblk", "eblk")
    # interior term: corner(i, j) = #intervals with sblk < i AND eblk > j,
    # from a dense nb×nb grid via two partitioned cumsum windows.
    cc = j.groupBy("sblk", "eblk").agg(F.count(F.lit(1)).alias("cnt"))
    grid = (
        spark.range(nb * nb)
        .select(
            (F.col("id") / nb).cast("long").alias("i"),
            (F.col("id") % nb).alias("j"),
        )
        .join(
            cc.select(
                F.col("sblk").alias("i"), F.col("eblk").alias("j"), "cnt"
            ),
            ["i", "j"],
            "left",
        )
        .withColumn("cnt", F.coalesce("cnt", F.lit(0)))
    )
    w_suf = (
        Window.partitionBy("i")
        .orderBy(F.desc("j"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("j")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    corner = (
        grid.withColumn("suf", F.coalesce(F.sum("cnt").over(w_suf), F.lit(0)))
        .withColumn("corner", F.coalesce(F.sum("suf").over(w_cum), F.lit(0)))
        .select("i", "j", "corner")
    )
    c1 = q.join(
        corner,
        (q["qi"] == corner["i"]) & (q["qj"] == corner["j"]),
    ).select("qpos", "qa", "d_seen", "qj", "qi", "corner")
    # boundary lines, equi-joined on the block id (≤ blk starts per
    # start-block since positions are unique; ends likewise + the n+1
    # sentinel block):  start-line covers regions (sblk==qi, eblk>qj)
    # and the shared corner cell (sblk==qi, eblk==qj); end-line covers
    # (eblk==qj, sblk<qi).
    c24 = (
        q.join(j, j["sblk"] == q["qi"])
        .groupBy("qpos")
        .agg(
            F.sum(
                (
                    (F.col("pos") <= F.col("qa"))
                    & (
                        (F.col("eblk") > F.col("qj"))
                        | (
                            (F.col("eblk") == F.col("qj"))
                            & (F.col("nxt") >= F.col("qpos"))
                        )
                    )
                ).cast("long")
            ).alias("c24")
        )
    )
    c3 = (
        q.join(j, j["eblk"] == q["qj"])
        .groupBy("qpos")
        .agg(
            F.sum(
                (
                    (F.col("sblk") < F.col("qi"))
                    & (F.col("nxt") >= F.col("qpos"))
                ).cast("long")
            ).alias("c3")
        )
    )
    sd_df = (
        c1.join(c24, "qpos", "left")
        .join(c3, "qpos", "left")
        .select(
            (
                F.col("d_seen")
                - F.col("corner")
                - F.coalesce("c24", F.lit(0))
                - F.coalesce("c3", F.lit(0))
            ).alias("sd")
        )
    )
    dists = sd_df.groupBy("sd").agg(F.count(F.lit(1)).alias("n"))
    dist_map = {int(r["sd"]): int(r["n"]) for r in dists.collect()}
    return dist_map, n, n_compulsory


MRC_SHARDS_MOD = 4  # SHARDS sampling rate R = 1/4 (key-space partition)


def lru_mrc_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARDS sampled miss-ratio curve (Waldspurger et al., FAST'15 —
    "Efficient MRC Construction with SHARDS"): the documented 10^12
    tier of lru_mrc, now a first-class gated operator.  Spatially
    hash-sample the KEY space at rate R = 1/MRC_SHARDS_MOD (a key is
    in or out for its whole lifetime — the property that makes sampled
    reuse distances unbiased), compute EXACT distances on the sampled
    trace with the same distributed D−C machinery, then rescale:
    est_distance = d/R, est counts = n/R.  All integer arithmetic
    (distances scale by the integer MOD), deterministic (key selection
    is user_id % MOD — no RNG), so the DuckDB twin reproduces it
    bit-for-bit and the estimator itself sits under the correctness
    gate.

    Scale shape: identical to lru_mrc but on an R-fraction of the
    trace — the grid term shrinks by R^(4/3); at 10^12 accesses one
    picks R ~ 0.001 (SHARDS' published accuracy holds to R = 0.0001)
    and the whole curve costs less than 0.1% of the exact tier."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") % MRC_SHARDS_MOD == 0)
        .select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
        )
    )
    dist_map, n, n_compulsory = _mrc_distances(spark, ev)
    n_reuse = sum(dist_map.values())
    m = MRC_SHARDS_MOD
    rows = []
    for cs in MRC_SIZES:
        # hit at size C iff est_distance = d*m < C
        hits = sum(cnt for d, cnt in dist_map.items() if d * m < cs)
        rows.append(
            (cs, n * m, n_compulsory * m, hits * m, (n_reuse - hits) * m)
        )
    return (
        spark.createDataFrame(
            rows,
            "cache_size int, est_accesses long, est_compulsory long, "
            "est_hits long, est_capacity_miss long",
        )
        .repartition(1)
        .sortWithinPartitions("cache_size")
    )


def lru_mrc_shards_sql() -> str:
    m = MRC_SHARDS_MOD
    arms = " UNION ALL ".join(f"SELECT {c} AS cache_size" for c in MRC_SIZES)
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
  WHERE user_id % {m} = 0
),
p AS (
  SELECT user_id,
         row_number() OVER (ORDER BY us, event_id) AS pos
  FROM ev
),
acc AS (
  SELECT user_id, pos,
         lag(pos) OVER (PARTITION BY user_id ORDER BY pos) AS prev
  FROM p
),
sd AS (
  SELECT a.user_id, a.pos, COUNT(DISTINCT b.user_id) AS sd
  FROM acc a LEFT JOIN acc b ON b.pos > a.prev AND b.pos < a.pos
  WHERE a.prev IS NOT NULL
  GROUP BY a.user_id, a.pos
),
tot AS (
  SELECT (SELECT COUNT(*) FROM acc) AS n_accesses,
         (SELECT COUNT(*) FROM acc WHERE prev IS NULL) AS n_compulsory,
         (SELECT COUNT(*) FROM sd) AS n_reuse
),
sizes AS ({arms})
SELECT CAST(s.cache_size AS INT) AS cache_size,
       CAST(t.n_accesses * {m} AS BIGINT) AS est_accesses,
       CAST(t.n_compulsory * {m} AS BIGINT) AS est_compulsory,
       CAST((SELECT COUNT(*) FROM sd WHERE sd.sd * {m} < s.cache_size)
            * {m} AS BIGINT) AS est_hits,
       CAST((t.n_reuse
             - (SELECT COUNT(*) FROM sd WHERE sd.sd * {m} < s.cache_size))
            * {m} AS BIGINT) AS est_capacity_miss
FROM sizes s, tot t ORDER BY cache_size
"""


def lru_mrc_sql() -> str:
    arms = " UNION ALL ".join(f"SELECT {c} AS cache_size" for c in MRC_SIZES)
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
p AS (
  SELECT user_id,
         row_number() OVER (ORDER BY us, event_id) AS pos
  FROM ev
),
acc AS (
  SELECT user_id, pos,
         lag(pos) OVER (PARTITION BY user_id ORDER BY pos) AS prev
  FROM p
),
sd AS (
  SELECT a.user_id, a.pos, COUNT(DISTINCT b.user_id) AS sd
  FROM acc a LEFT JOIN acc b ON b.pos > a.prev AND b.pos < a.pos
  WHERE a.prev IS NOT NULL
  GROUP BY a.user_id, a.pos
),
tot AS (
  SELECT (SELECT COUNT(*) FROM acc) AS n_accesses,
         (SELECT COUNT(*) FROM acc WHERE prev IS NULL) AS n_compulsory,
         (SELECT COUNT(*) FROM sd) AS n_reuse
),
sizes AS ({arms})
SELECT CAST(s.cache_size AS INT) AS cache_size,
       CAST(t.n_accesses AS BIGINT) AS n_accesses,
       CAST(t.n_compulsory AS BIGINT) AS n_compulsory,
       CAST((SELECT COUNT(*) FROM sd WHERE sd.sd < s.cache_size) AS BIGINT)
         AS n_hits,
       CAST(t.n_reuse
            - (SELECT COUNT(*) FROM sd WHERE sd.sd < s.cache_size) AS BIGINT)
         AS n_capacity_miss
FROM sizes s, tot t ORDER BY cache_size
"""


def simpsons_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit (the aggregation-reversal trap every
    metrics review must check): the association between quantity and
    discount on lineitem, measured by the EXACT integer covariance
    numerator n·Σxy − Σx·Σy (its sign is the correlation sign), pooled
    vs within each order priority (via the order join).  Emits one row
    per group with its sign and the pooled sign, plus whether the
    group disagrees — a reversal-count surface with zero floats.

    Scale shape: one fact-dim join, one group agg + one scalar agg,
    broadcast back — two scans, no wide shuffle."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_quantity")).cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority", "x", "y"
    )

    def moments(df, keys):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )

    grp = moments(j, ["o_orderpriority"]).withColumn(
        "cov_num", F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    )
    pooled = moments(j, []).select(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("pooled_num")
    )
    return (
        grp.join(F.broadcast(pooled))
        .select(
            "o_orderpriority",
            "n",
            "cov_num",
            F.signum("cov_num").cast("int").alias("group_sign"),
            F.signum("pooled_num").cast("int").alias("pooled_sign"),
            (F.signum("cov_num") != F.signum("pooled_num")).cast("int")
            .alias("reversed"),
        )
        .repartition(1)
        .sortWithinPartitions("o_orderpriority")
    )


def simpsons_check_sql() -> str:
    return """
WITH j AS (
  SELECT o_orderpriority,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
grp AS (
  SELECT o_orderpriority, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy
  FROM j GROUP BY o_orderpriority
),
pooled AS (
  SELECT COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS pooled_num FROM j
)
SELECT o_orderpriority,
       CAST(n AS BIGINT) AS n,
       CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
       CAST(sign(n * sxy - sx * sy) AS INT) AS group_sign,
       CAST(sign(pooled_num) AS INT) AS pooled_sign,
       CAST(CASE WHEN sign(n * sxy - sx * sy) <> sign(pooled_num)
                 THEN 1 ELSE 0 END AS INT) AS reversed
FROM grp, pooled ORDER BY o_orderpriority
"""


# --- Columnar encoding selection --------------------------------------------------------------

ENC_COLUMNS = ("lang", "source")


def encoding_selector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar encoding selection census (the per-column decision a
    Parquet/ORC writer makes): for each candidate string column, the
    exact byte estimates of PLAIN (Σ len + 4n offsets), DICTIONARY
    (Σ distinct len + 4·distinct + n·ceil(log2 distinct)/8 indices,
    ceil in bits), and RLE over the doc_id order (runs·(4 + avg len
    via Σ run-head len)), and the argmin choice — the storage-planner
    surface, all integer arithmetic.

    Scale shape: per column one distinct agg, one lag window for runs,
    one scalar rollup — three scans of a slim projection."""
    outs = []
    for col in ENC_COLUMNS:
        d = _t(spark, sf_dir, "documents").select(
            "doc_id", F.col(col).cast("string").alias("v")
        )
        base = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("v")).alias("plain_chars"),
            F.countDistinct("v").alias("n_distinct"),
        )
        dic = d.groupBy("v").agg(F.count(F.lit(1)).alias("c")).agg(
            F.sum(F.length("v")).alias("dict_chars")
        )
        w = Window.orderBy("doc_id")
        runs = (
            d.withColumn("pv", F.lag("v").over(w))
            .withColumn(
                "is_head",
                (F.col("pv").isNull() | (F.col("v") != F.col("pv"))).cast("long"),
            )
            .agg(
                F.sum("is_head").alias("n_runs"),
                F.sum(F.when(F.col("is_head") == 1, F.length("v")).otherwise(0))
                .alias("run_head_chars"),
            )
        )
        j = base.join(F.broadcast(dic)).join(F.broadcast(runs))
        bits = F.ceil(F.log2(F.col("n_distinct")))
        enc = j.select(
            F.lit(col).alias("column"),
            "n",
            "n_distinct",
            (F.col("plain_chars") + 4 * F.col("n")).alias("plain_bytes"),
            (
                F.col("dict_chars")
                + 4 * F.col("n_distinct")
                + F.expr("div(n * CAST(ceil(log2(n_distinct)) AS BIGINT) + 7, 8)")
            ).alias("dict_bytes"),
            (F.col("run_head_chars") + 8 * F.col("n_runs")).alias("rle_bytes"),
        )
        pick = enc.select(
            "*",
            F.when(
                (F.col("dict_bytes") <= F.col("plain_bytes"))
                & (F.col("dict_bytes") <= F.col("rle_bytes")),
                "dict",
            )
            .when(F.col("rle_bytes") <= F.col("plain_bytes"), "rle")
            .otherwise("plain")
            .alias("choice"),
        )
        outs.append(pick)
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.repartition(1).sortWithinPartitions("column")


def encoding_selector_sql() -> str:
    arms = []
    for col in ENC_COLUMNS:
        arms.append(f"""
SELECT '{col}' AS "column",
       b.n, b.n_distinct,
       b.plain_chars + 4 * b.n AS plain_bytes,
       dc.dict_chars + 4 * b.n_distinct
         + (b.n * CAST(ceil(log2(b.n_distinct)) AS BIGINT) + 7) // 8 AS dict_bytes,
       r.run_head_chars + 8 * r.n_runs AS rle_bytes
FROM
 (SELECT COUNT(*) AS n, SUM(length({col})) AS plain_chars,
         COUNT(DISTINCT {col}) AS n_distinct FROM documents) b,
 (SELECT SUM(length(v)) AS dict_chars
  FROM (SELECT DISTINCT {col} AS v FROM documents)) dc,
 (SELECT SUM(is_head) AS n_runs,
         SUM(CASE WHEN is_head = 1 THEN length(v) ELSE 0 END) AS run_head_chars
  FROM (SELECT {col} AS v,
               CASE WHEN lag({col}) OVER (ORDER BY doc_id) IS NULL
                         OR {col} <> lag({col}) OVER (ORDER BY doc_id)
                    THEN 1 ELSE 0 END AS is_head
        FROM documents)) r""")
    return f"""
SELECT "column", CAST(n AS BIGINT) AS n,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(plain_bytes AS BIGINT) AS plain_bytes,
       CAST(dict_bytes AS BIGINT) AS dict_bytes,
       CAST(rle_bytes AS BIGINT) AS rle_bytes,
       CASE WHEN dict_bytes <= plain_bytes AND dict_bytes <= rle_bytes THEN 'dict'
            WHEN rle_bytes <= plain_bytes THEN 'rle'
            ELSE 'plain' END AS choice
FROM ({" UNION ALL ".join(arms)})
ORDER BY "column"
"""


# --- Kaplan-Meier survival table --------------------------------------------------------------

KM_CENSOR_S = 7 * 86400  # right-censor users active within 7 days of trace end


def kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival table (the churn/retention estimator of
    subscription analytics, kept on its exact integer surface): a
    user's observed lifetime is last−first event time in whole days;
    users still active within KM_CENSOR_S of the trace end are
    right-censored.  For every observed day d the table reports
    n_risk = users with lifetime >= d, n_died = uncensored lifetimes
    ending at d, n_censored = censored at d — the S(t) product is a
    pure function of these columns, so the estimator itself never
    leaves integers.

    Scale shape: one user rollup, one duration-keyed count, and the
    at-risk column as a reversed running sum over the (tiny) duration
    axis."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    span = ev.agg(F.max("us").alias("max_us"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("us").alias("first_us"), F.max("us").alias("last_us"))
        .join(F.broadcast(span))
        .select(
            "user_id",
            F.expr("div(last_us - first_us, 86400000000)").alias("dur_d"),
            (F.col("last_us") > F.col("max_us") - KM_CENSOR_S * 1_000_000)
            .cast("int")
            .alias("censored"),
        )
    )
    per_d = u.groupBy("dur_d").agg(
        F.sum(1 - F.col("censored")).alias("n_died"),
        F.sum("censored").alias("n_censored"),
        F.count(F.lit(1)).alias("n_at"),
    )
    w = Window.orderBy(F.col("dur_d").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_d.withColumn("n_risk", F.sum("n_at").over(w))
        .select("dur_d", "n_risk", "n_died", "n_censored")
        .repartition(1)
        .sortWithinPartitions("dur_d")
    )


def kaplan_meier_sql() -> str:
    return f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS us FROM events
),
span AS (SELECT MAX(us) AS max_us FROM ev),
u AS (
  SELECT user_id,
         (MAX(us) - MIN(us)) // 86400000000 AS dur_d,
         CASE WHEN MAX(us) > (SELECT max_us FROM span)
                              - {KM_CENSOR_S}::BIGINT * 1000000
              THEN 1 ELSE 0 END AS censored
  FROM ev GROUP BY user_id
),
per_d AS (
  SELECT dur_d, SUM(1 - censored) AS n_died, SUM(censored) AS n_censored,
         COUNT(*) AS n_at
  FROM u GROUP BY dur_d
)
SELECT CAST(dur_d AS BIGINT) AS dur_d,
       CAST(SUM(n_at) OVER (ORDER BY dur_d DESC ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS n_risk,
       CAST(n_died AS BIGINT) AS n_died,
       CAST(n_censored AS BIGINT) AS n_censored
FROM per_d ORDER BY dur_d
"""


# --- Iterative proportional fitting (raking) --------------------------------------------------

IPF_ROUNDS = 3
IPF_SCALE = 1_000_000


def ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survey raking / iterative proportional fitting (Deming-Stephan
    1940 — the weight calibration behind every post-stratified
    sample), run 3 unrolled rounds in ppm integers so both engines
    floor identically: the (order priority × order-year-bucket) count
    table is raked toward UNIFORM row and column margins; each round
    scales rows by div(target_row·10⁶, row_sum) then columns
    likewise, weights in ppm.  Emits the final per-cell ppm weight and
    the raked cell mass after the 3 rounds.

    Scale shape: the cell table aggregates once from the fact scan;
    the raking rounds are O(cells) broadcast arithmetic."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("r"),
        (F.year(F.col("o_orderdate").cast("timestamp")) % 2).alias("c"),
    )
    cells = o.groupBy("r", "c").agg(F.count(F.lit(1)).alias("n"))
    cells = cells.withColumn("wppm", F.lit(IPF_SCALE).cast("long"))
    tot = cells.agg(F.sum("n").alias("t")).first()["t"]
    n_r = cells.select("r").distinct().count()
    n_c = cells.select("c").distinct().count()
    tr = tot // n_r  # uniform row target
    tc = tot // n_c
    for _ in range(IPF_ROUNDS):
        rows = cells.groupBy("r").agg(
            F.sum(F.expr(f"div(n * wppm, {IPF_SCALE})")).alias("rs")
        )
        cells = (
            cells.join(rows, "r")
            .withColumn("wppm", F.expr(f"div(wppm * {tr}, rs)"))
            .drop("rs")
        )
        colsums = cells.groupBy("c").agg(
            F.sum(F.expr(f"div(n * wppm, {IPF_SCALE})")).alias("cs")
        )
        cells = (
            cells.join(colsums, "c")
            .withColumn("wppm", F.expr(f"div(wppm * {tc}, cs)"))
            .drop("cs")
        )
    out = cells.select(
        "r", "c", "n", "wppm",
        F.expr(f"div(n * wppm, {IPF_SCALE})").alias("raked_mass"),
    )
    return out.repartition(1).sortWithinPartitions("r", "c")


def ipf_raking_sql() -> str:
    # mirrors the unrolled rounds; targets recomputed identically
    rounds = []
    prev = "w0"
    for k in range(1, IPF_ROUNDS + 1):
        rounds.append(f"""
r{k} AS MATERIALIZED (
  SELECT w.r, w.c, w.n,
         (w.wppm * (SELECT tr FROM t)) // rs.rs AS wppm
  FROM {prev} w JOIN (
    SELECT r, SUM((n * wppm) // {IPF_SCALE}) AS rs FROM {prev} GROUP BY r
  ) rs ON rs.r = w.r
),
w{k} AS MATERIALIZED (
  SELECT w.r, w.c, w.n,
         (w.wppm * (SELECT tc FROM t)) // cs.cs AS wppm
  FROM r{k} w JOIN (
    SELECT c, SUM((n * wppm) // {IPF_SCALE}) AS cs FROM r{k} GROUP BY c
  ) cs ON cs.c = w.c
)""")
        prev = f"w{k}"
    return f"""
WITH cells AS (
  SELECT o_orderpriority AS r, year(o_orderdate) % 2 AS c, COUNT(*) AS n
  FROM orders GROUP BY r, c
),
t AS (
  SELECT SUM(n) // COUNT(DISTINCT r) AS tr,
         SUM(n) // COUNT(DISTINCT c) AS tc
  FROM cells
),
w0 AS (SELECT r, c, n, {IPF_SCALE}::BIGINT AS wppm FROM cells),{",".join(rounds)}
SELECT r, CAST(c AS BIGINT) AS c, CAST(n AS BIGINT) AS n,
       CAST(wppm AS BIGINT) AS wppm,
       CAST((n * wppm) // {IPF_SCALE} AS BIGINT) AS raked_mass
FROM w{IPF_ROUNDS} ORDER BY r, c
"""


# --- Join-cardinality histogram estimate audit ------------------------------------------------

JCA_BUCKETS = 64


def join_card_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit (the equi-width histogram
    estimator inside every cost-based optimizer, checked against
    truth): |lineitem ⋈ orders on custkey-bucket| is estimated as
    Σ_b cl_b·co_b over 64 equi-width key buckets assuming
    intra-bucket uniformity — for bucket-equi joins the estimate is
    EXACT when the join key IS the bucket, so the audit instead joins
    on o_custkey with the histogram on custkey // width: per bucket
    the estimated and exact contributions and the signed error, plus
    uniformity assumed within the bucket.

    Scale shape: two histogram aggs + one exact join count grouped by
    bucket — three scans, optimizer-shaped."""
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    maxk = c.agg(F.max("c_custkey").alias("m")).first()["m"]
    width = (maxk + JCA_BUCKETS) // JCA_BUCKETS
    ob = o.select(F.expr(f"div(o_custkey, {width})").alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("co")
    )
    cb = c.select(F.expr(f"div(c_custkey, {width})").alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("cc")
    )
    est = ob.join(cb, "b").select(
        "b",
        F.expr(f"div(co * cc, {width})").alias("est_rows"),
    )
    exact = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select(F.expr(f"div(o_custkey, {width})").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("actual_rows"))
    )
    return (
        est.join(exact, "b", "full_outer")
        .select(
            F.col("b").cast("long").alias("bucket"),
            F.coalesce("est_rows", F.lit(0)).alias("est_rows"),
            F.coalesce("actual_rows", F.lit(0)).alias("actual_rows"),
            (F.coalesce("est_rows", F.lit(0)) - F.coalesce("actual_rows", F.lit(0)))
            .alias("err"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


def join_card_audit_sql() -> str:
    return f"""
WITH mk AS (SELECT MAX(c_custkey) AS m FROM customer),
w AS (SELECT (m + {JCA_BUCKETS}) // {JCA_BUCKETS} AS width FROM mk),
ob AS (
  SELECT o_custkey // (SELECT width FROM w) AS b, COUNT(*) AS co
  FROM orders GROUP BY 1
),
cb AS (
  SELECT c_custkey // (SELECT width FROM w) AS b, COUNT(*) AS cc
  FROM customer GROUP BY 1
),
est AS (
  SELECT ob.b, (ob.co * cb.cc) // (SELECT width FROM w) AS est_rows
  FROM ob JOIN cb ON cb.b = ob.b
),
act AS (
  SELECT o_custkey // (SELECT width FROM w) AS b, COUNT(*) AS actual_rows
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
)
SELECT CAST(COALESCE(est.b, act.b) AS BIGINT) AS bucket,
       CAST(COALESCE(est.est_rows, 0) AS BIGINT) AS est_rows,
       CAST(COALESCE(act.actual_rows, 0) AS BIGINT) AS actual_rows,
       CAST(COALESCE(est.est_rows, 0) - COALESCE(act.actual_rows, 0) AS BIGINT)
         AS err
FROM est FULL OUTER JOIN act ON act.b = est.b
ORDER BY bucket
"""


def hll_union_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL mergeability invariant (the property that makes the sketch
    distributable at all: registers merge by MAX, and the merge of
    per-shard sketches must equal the whole-corpus sketch): documents
    sharded by source build per-shard registers; their MAX-merge is
    compared bucket-by-bucket to the registers built over the whole
    corpus.  Emits per bucket the merged and global registers plus the
    equality flag — 64 TRUE rows is the proof, computed not assumed."""
    from .textops import h40

    d = _t(spark, sf_dir, "documents").select(
        "source", h40(F.col("doc_id").cast("string")).alias("hv")
    )
    wv = F.col("hv") % (1 << HLL_WBITS)
    rank = F.when(wv == 0, HLL_WBITS + 1).otherwise(
        F.lit(HLL_WBITS + 1) - F.length(F.bin(wv))
    )
    reg = d.select(
        "source", F.shiftright(F.col("hv"), HLL_WBITS).alias("bucket"),
        rank.alias("rank"),
    )
    per_shard = reg.groupBy("source", "bucket").agg(F.max("rank").alias("r"))
    merged = per_shard.groupBy("bucket").agg(F.max("r").alias("merged_register"))
    globl = reg.groupBy("bucket").agg(F.max("rank").alias("global_register"))
    return (
        merged.join(globl, "bucket", "full_outer")
        .select(
            "bucket",
            F.col("merged_register").cast("long").alias("merged_register"),
            F.col("global_register").cast("long").alias("global_register"),
            (F.col("merged_register") == F.col("global_register")).cast("int")
            .alias("equal"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


def hll_union_merge_sql() -> str:
    h = "CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10) AS BIGINT)"
    return f"""
WITH d AS (SELECT source, {h} AS hv FROM documents),
reg AS (
  SELECT source, hv >> {HLL_WBITS} AS bucket,
         CASE WHEN hv % {1 << HLL_WBITS} = 0 THEN {HLL_WBITS + 1}
              ELSE {HLL_WBITS + 1} - length(bin(hv % {1 << HLL_WBITS})) END AS rank
  FROM d
),
per_shard AS (
  SELECT source, bucket, MAX(rank) AS r FROM reg GROUP BY source, bucket
),
merged AS (SELECT bucket, MAX(r) AS mr FROM per_shard GROUP BY bucket),
gl AS (SELECT bucket, MAX(rank) AS gr FROM reg GROUP BY bucket)
SELECT CAST(COALESCE(merged.bucket, gl.bucket) AS BIGINT) AS bucket,
       CAST(merged.mr AS BIGINT) AS merged_register,
       CAST(gl.gr AS BIGINT) AS global_register,
       CAST(CASE WHEN merged.mr = gl.gr THEN 1 ELSE 0 END AS INT) AS equal
FROM merged FULL OUTER JOIN gl ON gl.bucket = merged.bucket
ORDER BY bucket
"""


# --- running-record (secretary) census over customer order streams -------------


def record_breaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-record census (the classic 'records in a random
    permutation' probe, upstream of secretary-problem analytics): per
    customer an order is a *record* when its total strictly exceeds
    every earlier order's total (time order, orderkey tie-break).
    Census rolls customers up by their record count: how many
    customers broke k records, their order volume, and an orderkey
    checksum over exactly the record-breaking orders.

    Scale shape: ONE customer-key window (running max over the
    preceding frame) then two partial+final censuses; no self-join,
    no driver state — records at 10^12 rows are the same one shuffle
    as any per-key window."""
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("o_totalprice").over(w)
    rec = o.select(
        "o_custkey",
        "o_orderkey",
        F.when(prev_max.isNull() | (F.col("o_totalprice") > prev_max), 1)
        .otherwise(0)
        .alias("is_rec"),
    )
    per_cust = rec.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("is_rec").alias("n_records"),
        F.sum(F.when(F.col("is_rec") == 1, F.col("o_orderkey"))).alias("rec_ck"),
    )
    return (
        per_cust.groupBy("n_records")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_orders").alias("n_orders"),
            F.sum("rec_ck").alias("record_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("n_records")
    )


def record_breaks_sql() -> str:
    return """
WITH rec AS (
  SELECT o_custkey, o_orderkey,
         CASE WHEN max(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR o_totalprice > max(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_rec
  FROM orders
),
per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders, SUM(is_rec) AS n_records,
         SUM(CASE WHEN is_rec = 1 THEN o_orderkey END) AS rec_ck
  FROM rec GROUP BY o_custkey
)
SELECT CAST(n_records AS BIGINT) AS n_records,
       COUNT(*) AS n_customers,
       CAST(SUM(n_orders) AS BIGINT) AS n_orders,
       CAST(SUM(rec_ck) AS BIGINT) AS record_checksum
FROM per_cust GROUP BY n_records ORDER BY n_records
"""


# --- business-day (weekday) shipping latency via closed-form calendar math -----

# Weekdays in [1970-01-01, 1970-01-01 + r] for r = 0..6; day 0 was a
# Thursday, so the r-prefix pattern is Thu Fri Sat Sun Mon Tue Wed.
_BDAY_PREFIX = (1, 2, 2, 2, 3, 4, 5)


def business_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day shipping-latency census: weekday-only (Mon-Fri)
    days between order date and ship date, by order priority — the SLA
    metric ops teams actually track. No calendar dim table and no
    per-day explode: W(d) = 5*div(n,7) + prefix[n % 7] counts weekdays
    from the epoch in closed form (epoch day 0 = Thursday), and the
    latency is W(ship) - W(order). Exact integers end-to-end.

    Scale shape: map-only calendar math + one orderkey equi-join +
    a 5-key census; the closed form replaces the usual 10^12-row ×
    calendar-dim range join."""

    pre = ",".join(str(v) for v in _BDAY_PREFIX)

    def wdays(name: str):
        return F.expr(
            f"5 * div(datediff({name}, '1970-01-01'), 7)"
            f" + element_at(array({pre}),"
            f"   CAST(datediff({name}, '1970-01-01') % 7 AS INT) + 1)"
        )

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        (wdays("l_shipdate") - wdays("o_orderdate")).alias("bdays"),
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("bdays").alias("sum_bdays"),
            F.max("bdays").alias("max_bdays"),
            F.expr("div(1000000 * sum(bdays), count(1))").alias("mean_bdays_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("o_orderpriority")
    )


def business_latency_sql() -> str:
    pre = ", ".join(str(v) for v in _BDAY_PREFIX)
    wd = (
        "(5 * (date_diff('day', DATE '1970-01-01', {c}) // 7)"
        f" + ([{pre}])[date_diff('day', DATE '1970-01-01', {{c}}) % 7 + 1])"
    )
    w_ship = wd.format(c="l_shipdate")
    w_ord = wd.format(c="o_orderdate")
    return f"""
WITH j AS (
  SELECT o_orderpriority, {w_ship} - {w_ord} AS bdays
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(bdays) AS BIGINT) AS sum_bdays,
       CAST(MAX(bdays) AS BIGINT) AS max_bdays,
       CAST((1000000 * SUM(bdays)) // COUNT(*) AS BIGINT) AS mean_bdays_ppm
FROM j GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --- exact Shapley-value conversion attribution ---------------------------------

# Channel bits in sorted-name order; purchases carry no bit.
_SHAP_CHANNELS = (("click", 1), ("error", 2), ("signup", 4), ("view", 8))
# |S|!(n-|S|-1)! for n = 4 channels, |S| = 0..3 — Shapley weights
# scaled by n! = 24 so every credit is an exact integer.
_SHAP_W = (6, 2, 2, 6)


def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value conversion attribution (Shapley 1953; the
    marketing-science gold standard that last-touch and position-based
    rules approximate): each purchase's journey is the SET of distinct
    channel types the user touched before it; the characteristic
    function v(S) counts purchases whose journey is contained in S,
    and each channel's credit is its exact Shapley value scaled by
    n! = 24 so everything stays integer (weights |S|!(n-|S|-1)!).
    First-event purchases (empty journey) are excluded; with
    v(empty) = 0 the 24-scaled credits sum to 24 * v(allchannels).

    Scale shape: journey masks from 4 per-user window maxes (one
    shuffle); everything after lives on a 16-row subset lattice × 4
    channels — the 2^n enumeration is over CHANNELS, never rows, so
    10^12 events cost one window + one 16-key census."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mask = reduce(
        lambda a, b: a + b,
        [
            F.lit(bit)
            * F.coalesce(
                F.max(F.when(F.col("event_type") == name, 1).otherwise(0)).over(w),
                F.lit(0),
            )
            for name, bit in _SHAP_CHANNELS
        ],
    )
    journeys = (
        ev.select("event_type", mask.alias("jmask"))
        .where((F.col("event_type") == "purchase") & (F.col("jmask") > 0))
        .groupBy("jmask")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    subsets = spark.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        subsets.join(
            journeys, F.expr("(s & jmask) = jmask"), "left"
        )
        .groupBy("s")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("v"))
    )
    chan = spark.createDataFrame(list(_SHAP_CHANNELS), "channel string, bit int")
    pairs = chan.join(subsets, F.expr("(s & bit) = 0"))
    vS = v.select(F.col("s").alias("s1"), F.col("v").alias("v_s"))
    vSb = v.select(F.col("s").alias("s2"), F.col("v").alias("v_sb"))
    pc = F.expr(
        "(s & 1) + (shiftright(s,1) & 1) + (shiftright(s,2) & 1) + (shiftright(s,3) & 1)"
    )
    marg = (
        pairs.join(vS, F.expr("s1 = s"))
        .join(vSb, F.expr("s2 = (s | bit)"))
        .select(
            "channel",
            F.element_at(
                F.array(*[F.lit(x) for x in _SHAP_W]), pc.cast("int") + 1
            ).alias("wt"),
            (F.col("v_sb") - F.col("v_s")).alias("dv"),
        )
    )
    touched = (
        chan.join(journeys, F.expr("(jmask & bit) != 0"), "left")
        .groupBy("channel")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_touched"))
    )
    out = (
        marg.groupBy("channel")
        .agg(F.sum(F.col("wt") * F.col("dv")).alias("credit24"))
        .join(touched, "channel")
    )
    return out.repartition(1).sortWithinPartitions("channel")


def shapley_attribution_sql() -> str:
    chan_rows = ", ".join(f"('{n}', {b})" for n, b in _SHAP_CHANNELS)
    wts = ", ".join(str(x) for x in _SHAP_W)
    return f"""
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         1 * COALESCE(max(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END) OVER pre, 0)
       + 2 * COALESCE(max(CASE WHEN event_type = 'error'  THEN 1 ELSE 0 END) OVER pre, 0)
       + 4 * COALESCE(max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER pre, 0)
       + 8 * COALESCE(max(CASE WHEN event_type = 'view'   THEN 1 ELSE 0 END) OVER pre, 0)
         AS jmask
  FROM events
  WINDOW pre AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
journeys AS (
  SELECT jmask, COUNT(*) AS c FROM ev
  WHERE event_type = 'purchase' AND jmask > 0 GROUP BY jmask
),
subsets AS (SELECT CAST(r AS INT) AS s FROM range(16) t(r)),
v AS (
  SELECT s, COALESCE(SUM(c), 0) AS v
  FROM subsets LEFT JOIN journeys ON (s & jmask) = jmask
  GROUP BY s
),
chan AS (SELECT * FROM (VALUES {chan_rows}) AS t(channel, bit)),
marg AS (
  SELECT channel,
         ([{wts}])[((subsets.s & 1) + ((subsets.s >> 1) & 1) + ((subsets.s >> 2) & 1) + ((subsets.s >> 3) & 1)) + 1]
           * (vb.v - va.v) AS contrib
  FROM chan JOIN subsets ON (subsets.s & bit) = 0
  JOIN v va ON va.s = subsets.s
  JOIN v vb ON vb.s = (subsets.s | bit)
),
touched AS (
  SELECT channel, COALESCE(SUM(c), 0) AS n_touched
  FROM chan LEFT JOIN journeys ON (jmask & bit) != 0
  GROUP BY channel
)
SELECT m.channel, CAST(SUM(contrib) AS BIGINT) AS credit24,
       CAST(ANY_VALUE(n_touched) AS BIGINT) AS n_touched
FROM marg m JOIN touched USING (channel)
GROUP BY m.channel ORDER BY m.channel
"""


# --- absorbing Markov chain: expected steps to conversion (exact Cramer) -------

_ABS_STATES = ("click", "error", "signup", "view")


def _det3_str(m) -> str:
    return (
        f"({m[0][0]})*(({m[1][1]})*({m[2][2]}) - ({m[1][2]})*({m[2][1]}))"
        f" - ({m[0][1]})*(({m[1][0]})*({m[2][2]}) - ({m[1][2]})*({m[2][0]}))"
        f" + ({m[0][2]})*(({m[1][0]})*({m[2][1]}) - ({m[1][1]})*({m[2][0]}))"
    )


def _det4_str(m) -> str:
    terms = []
    for j in range(4):
        minor = [[m[r][c] for c in range(4) if c != j] for r in range(1, 4)]
        sign = "+" if j % 2 == 0 else "-"
        terms.append(f"{sign} ({m[0][j]})*({_det3_str(minor)})")
    return "(" + " ".join(terms) + ")"


def _abs_chain_dets(cast: str):
    """The shared arithmetic text for both engines: A = diag(n) - T on
    the 4 transient states, b = n, detA plus the four Cramer column
    replacements det(A_j). `cast` is the wide-integer type each engine
    uses (DECIMAL(38,0) for Spark, HUGEINT for DuckDB)."""
    a = [
        [
            f"CAST({f'n{i} - t{i}{j}' if i == j else f'0 - t{i}{j}'} AS {cast})"
            for j in range(4)
        ]
        for i in range(4)
    ]
    b = [f"CAST(n{i} AS {cast})" for i in range(4)]
    dets = {"detA": _det4_str(a)}
    for j in range(4):
        aj = [[b[i] if c == j else a[i][c] for c in range(4)] for i in range(4)]
        dets[f"det{j}"] = _det4_str(aj)
    return dets


def absorbing_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps to conversion from each funnel state, computed
    EXACTLY on the absorbing Markov chain the event stream defines
    (Kemeny-Snell fundamental matrix t = (I-Q)^-1 1): transitions are
    consecutive per-user events, 'purchase' absorbs. Clearing each
    row's denominator turns (I-Q)t = 1 into the INTEGER system
    (diag(n) - T) t = n, solved by Cramer's rule with 4x4 integer
    determinants in DECIMAL(38,0) — no floats, no iteration; t in ppm
    by exact floor division (A is a nonsingular M-matrix, so det > 0,
    pinned by the det_pos column).

    Scale shape: one user-key lead() window + a 20-key census; the
    linear algebra lives on a single 4x4 integer matrix regardless of
    row count — the 10^12-row chain costs one window + one tiny agg."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(w).alias("t"),
    ).where((F.col("f") != "purchase") & F.col("t").isNotNull())
    aggs = []
    for i, si in enumerate(_ABS_STATES):
        aggs.append(
            F.sum(F.when(F.col("f") == si, 1).otherwise(0)).alias(f"n{i}")
        )
        aggs.append(
            F.sum(
                F.when((F.col("f") == si) & (F.col("t") == "purchase"), 1).otherwise(0)
            ).alias(f"p{i}")
        )
        for j, sj in enumerate(_ABS_STATES):
            aggs.append(
                F.sum(
                    F.when((F.col("f") == si) & (F.col("t") == sj), 1).otherwise(0)
                ).alias(f"t{i}{j}")
            )
    mat = tr.agg(*aggs)
    dets = _abs_chain_dets("DECIMAL(38,0)")
    passthrough = [c for i in range(4) for c in (f"n{i}", f"p{i}")]
    solved = mat.select(
        *passthrough,
        *[F.expr(sql).alias(name) for name, sql in dets.items()],
    )
    stack_args = ", ".join(
        f"'{s}', n{i}, p{i}, det{i}" for i, s in enumerate(_ABS_STATES)
    )
    rows = solved.selectExpr(
        "detA",
        f"stack(4, {stack_args}) AS (state, n_out, n_to_purchase, detj)",
    )
    return (
        rows.select(
            "state",
            F.col("n_out").cast("long").alias("n_out"),
            F.col("n_to_purchase").cast("long").alias("n_to_purchase"),
            F.expr(
                "CAST((detj * CAST(1000000 AS DECIMAL(38,0))) div detA AS BIGINT)"
            ).alias("t_ppm"),
            F.when(F.col("detA") > 0, 1).otherwise(0).cast("int").alias("det_pos"),
        )
        .repartition(1)
        .sortWithinPartitions("state")
    )


def absorbing_chain_sql() -> str:
    dets = _abs_chain_dets("HUGEINT")
    det_cols = ",\n         ".join(f"{sql} AS {name}" for name, sql in dets.items())
    agg_cols = []
    for i, si in enumerate(_ABS_STATES):
        agg_cols.append(f"SUM(CASE WHEN f = '{si}' THEN 1 ELSE 0 END) AS n{i}")
        agg_cols.append(
            f"SUM(CASE WHEN f = '{si}' AND t = 'purchase' THEN 1 ELSE 0 END) AS p{i}"
        )
        for j, sj in enumerate(_ABS_STATES):
            agg_cols.append(
                f"SUM(CASE WHEN f = '{si}' AND t = '{sj}' THEN 1 ELSE 0 END) AS t{i}{j}"
            )
    outs = "\n  UNION ALL\n".join(
        f"  SELECT '{s}' AS state, n{i} AS n_out, p{i} AS n_to_purchase,"
        f" CAST((det{i} * CAST(1000000 AS HUGEINT)) // detA AS BIGINT) AS t_ppm,"
        f" CAST(CASE WHEN detA > 0 THEN 1 ELSE 0 END AS INT) AS det_pos FROM dets"
        for i, s in enumerate(_ABS_STATES)
    )
    return f"""
WITH tr AS (
  SELECT event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events
  QUALIFY f != 'purchase' AND t IS NOT NULL
),
mat AS (
  SELECT {", ".join(agg_cols)} FROM tr
),
dets AS (
  SELECT n0, p0, n1, p1, n2, p2, n3, p3,
         {det_cols}
  FROM mat
)
SELECT * FROM (
{outs}
) ORDER BY state
"""


# --- zone-map (row-group min/max) pruning effectiveness audit -------------------

_RG_SPAN = 512  # orderkeys per simulated row group (ingestion-ordered files)
_RG_PREDS = (
    ("ship_1994", "l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'"),
    ("qty_ge_45", "l_quantity >= 45"),
    ("price_gt_50k", "l_extendedprice > 50000"),
)


def rowgroup_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruning effectiveness audit — the min/max row-group
    statistics every Parquet/ORC scan planner consults, measured
    exactly: lineitem is laid out in ingestion-ordered row groups
    (orderkey div 512), each group publishes min/max for shipdate,
    quantity and price, and for each of three canonical predicates the
    audit reports groups kept by stats vs groups truly containing
    matches — the false-positive pruning overhead and the scan-volume
    ratio that decides whether a sort/cluster layout is worth it.

    Scale shape: ONE pass builds per-group stats AND per-group exact
    match counts (conditional aggs), then a 3-key census; the row-group
    key is pure arithmetic on the storage key, so the audit is the
    same two shuffles at any scale."""
    li = _t(spark, sf_dir, "lineitem")
    rg = li.select(
        F.expr(f"div(l_orderkey, {_RG_SPAN})").alias("rg"),
        "l_shipdate", "l_quantity", "l_extendedprice",
    )
    matches = [
        F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0 END")).alias(f"m{i}")
        for i, (_, cond) in enumerate(_RG_PREDS)
    ]
    stats = rg.groupBy("rg").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
        F.max("l_quantity").alias("max_qty"),
        F.max("l_extendedprice").alias("max_price"),
        *matches,
    )
    kept = [
        "max_ship >= TIMESTAMP '1994-01-01 00:00:00' AND min_ship < TIMESTAMP '1995-01-01 00:00:00'",
        "max_qty >= 45",
        "max_price > 50000",
    ]
    stack_args = ", ".join(
        f"'{name}', CASE WHEN {kept[i]} THEN 1 ELSE 0 END, m{i}"
        for i, (name, _) in enumerate(_RG_PREDS)
    )
    per_pred = stats.selectExpr(
        "rg", "n_rows", f"stack(3, {stack_args}) AS (pred, kept, n_match)"
    )
    return (
        per_pred.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("kept").alias("kept_groups"),
            F.sum(F.when(F.col("n_match") > 0, 1).otherwise(0)).alias("hit_groups"),
            F.sum(F.col("kept") * F.col("n_rows")).alias("rows_scanned"),
            F.sum("n_match").alias("rows_matched"),
            F.sum("n_rows").alias("rows_total"),
        )
        .select(
            "pred", "n_groups", "kept_groups", "hit_groups",
            (F.col("kept_groups") - F.col("hit_groups")).alias("false_pos_groups"),
            "rows_scanned", "rows_matched",
            F.expr("CAST(div(1000000 * rows_scanned, rows_total) AS BIGINT)").alias(
                "scan_ratio_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("pred")
    )


def rowgroup_pruning_sql() -> str:
    m_cols = ",\n         ".join(
        f"SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS m{i}"
        for i, (_, cond) in enumerate(_RG_PREDS)
    )
    kept = [
        "max_ship >= TIMESTAMP '1994-01-01 00:00:00' AND min_ship < TIMESTAMP '1995-01-01 00:00:00'",
        "max_qty >= 45",
        "max_price > 50000",
    ]
    rows = "\n  UNION ALL\n".join(
        f"  SELECT rg, n_rows, '{name}' AS pred,"
        f" CASE WHEN {kept[i]} THEN 1 ELSE 0 END AS kept, m{i} AS n_match FROM stats"
        for i, (name, _) in enumerate(_RG_PREDS)
    )
    return f"""
WITH stats AS (
  SELECT l_orderkey // {_RG_SPAN} AS rg,
         COUNT(*) AS n_rows,
         MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship,
         MAX(l_quantity) AS max_qty, MAX(l_extendedprice) AS max_price,
         {m_cols}
  FROM lineitem GROUP BY 1
),
per_pred AS (
{rows}
)
SELECT pred, COUNT(*) AS n_groups,
       CAST(SUM(kept) AS BIGINT) AS kept_groups,
       CAST(SUM(CASE WHEN n_match > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hit_groups,
       CAST(SUM(kept) - SUM(CASE WHEN n_match > 0 THEN 1 ELSE 0 END) AS BIGINT) AS false_pos_groups,
       CAST(SUM(kept * n_rows) AS BIGINT) AS rows_scanned,
       CAST(SUM(n_match) AS BIGINT) AS rows_matched,
       CAST((1000000 * SUM(kept * n_rows)) // SUM(n_rows) AS BIGINT) AS scan_ratio_ppm
FROM per_pred GROUP BY pred ORDER BY pred
"""


# --- exact-SAD matrix profile over the daily-revenue series ---------------------

_MP_M = 7       # window length (days of the ranked trading-day series)
_MP_EXCL = 3    # exclusion zone: |i - j| > m div 2 avoids trivial matches


def sad_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix profile over the daily-revenue series with the exact
    integer SAD distance (the motif-discovery primitive of Yeh et al.
    2016, computed definitionally rather than with floating MASS):
    revenue per order date in exact cents, ranked into a gapless
    trading-day index; every length-7 window is compared against every
    other window outside the +-3 exclusion zone and the profile keeps
    each window's minimum SAD and its earliest matching position.

    Scale shape: the series is an AGGREGATE of the fact table (days,
    not rows), so the quadratic pair join is over #days^2 windows —
    bounded by the calendar, not by 10^12 rows; the heavy input pass
    is one date-key census."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents")
    )
    idx = daily.select(
        F.row_number()
        .over(Window.orderBy("o_orderdate"))
        .alias("i"),
        "o_orderdate",
        "cents",
    )
    win = (
        idx.select(
            "i",
            "o_orderdate",
            F.collect_list("cents")
            .over(Window.orderBy("i").rowsBetween(0, _MP_M - 1))
            .alias("wv"),
        )
        .where(F.size("wv") == _MP_M)
    )
    a = win.select(F.col("i").alias("ia"), F.col("o_orderdate").alias("da"), F.col("wv").alias("va"))
    b = win.select(F.col("i").alias("ib"), F.col("wv").alias("vb"))
    # SAD unrolled over the FIXED window length: element_at arithmetic
    # stays inside whole-stage codegen, where the zip_with/aggregate
    # lambda form is CodegenFallback — interpreted per pair, it was the
    # whole cost of the #days² profile (5.8M pairs at sf0.1).
    sad = sum(
        (
            F.abs(F.element_at("va", k) - F.element_at("vb", k))
            for k in range(2, _MP_M + 1)
        ),
        F.abs(F.element_at("va", 1) - F.element_at("vb", 1)),
    )
    pairs = a.join(b, F.abs(F.col("ia") - F.col("ib")) > _MP_EXCL).select(
        "ia", "da", "ib", sad.alias("sad")
    )
    # one-pass argmin: min(struct(sad, ib)) = (min SAD, earliest ib at
    # that SAD) — replaces the recompute-pairs-and-join-back two-pass.
    out = (
        pairs.groupBy("ia", "da")
        .agg(F.min(F.struct("sad", "ib")).alias("m"))
        .select("ia", "da", F.col("m.ib").alias("best_j"), F.col("m.sad").alias("mp_sad"))
    )
    return (
        out.select(
            F.col("ia").alias("i"),
            F.col("da").alias("window_start"),
            "best_j",
            "mp_sad",
        )
        .repartition(1)
        .sortWithinPartitions("i")
    )


def sad_matrix_profile_sql() -> str:
    return f"""
WITH daily AS (
  SELECT o_orderdate, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_orderdate
),
idx AS (
  SELECT row_number() OVER (ORDER BY o_orderdate) AS i, o_orderdate, cents
  FROM daily
),
win AS (
  SELECT i, o_orderdate,
         list(cents) OVER (ORDER BY i ROWS BETWEEN CURRENT ROW AND {_MP_M - 1} FOLLOWING) AS wv
  FROM idx
  QUALIFY len(wv) = {_MP_M}
),
pairs AS (
  SELECT a.i AS ia, a.o_orderdate AS da, b.i AS ib,
         abs(a.wv[1] - b.wv[1]) + abs(a.wv[2] - b.wv[2]) + abs(a.wv[3] - b.wv[3]) + abs(a.wv[4] - b.wv[4]) + abs(a.wv[5] - b.wv[5]) + abs(a.wv[6] - b.wv[6]) + abs(a.wv[7] - b.wv[7]) AS sad
  FROM win a JOIN win b ON abs(a.i - b.i) > {_MP_EXCL}
),
best AS (
  SELECT ia, da, MIN(sad) AS mp_sad FROM pairs GROUP BY ia, da
)
SELECT p.ia AS i, p.da AS window_start,
       CAST(MIN(p.ib) AS BIGINT) AS best_j,
       CAST(MIN(p.sad) AS BIGINT) AS mp_sad
FROM pairs p JOIN best ON best.ia = p.ia AND p.sad = best.mp_sad
GROUP BY p.ia, p.da ORDER BY i
"""


# --- calibration audit (reliability diagram + exact integer ECE) ----------------


def calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-calibration audit with an exact integer ECE (the
    reliability-diagram check every scored pipeline runs before
    shipping a ranking model): users split train/test by user-id
    parity; the 'model' is the train-side empirical purchase rate of
    each activity bin (views capped into 10 bins), quoted in ppm; the
    test side then reports, per bin, predicted-ppm vs observed
    purchase counts — and each bin's |predicted - observed| gap
    weighted by test mass is the Expected Calibration Error numerator,
    all in exact integer arithmetic (ECE_ppm = sum(gap*n)/N).

    Scale shape: two user-key censuses (train, test) joined on 10 bin
    keys — partial+final aggs end-to-end, no window, no float."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_views"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
    )
    binned = per_user.select(
        "user_id", "converted",
        F.least(F.expr("div(n_views, 2)"), F.lit(9)).alias("bin"),
    )
    train = (
        binned.where(F.col("user_id") % 2 == 0)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum("converted").alias("pos_train"),
        )
        .select(
            "bin", "n_train",
            F.expr("CAST(div(1000000 * pos_train, n_train) AS BIGINT)").alias(
                "pred_ppm"
            ),
        )
    )
    test = (
        binned.where(F.col("user_id") % 2 == 1)
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum("converted").alias("pos_test"),
        )
    )
    j = train.join(test, "bin").select(
        "bin", "n_train", "pred_ppm", "n_test", "pos_test",
        F.expr("CAST(div(1000000 * pos_test, n_test) AS BIGINT)").alias("obs_ppm"),
    )
    return (
        j.select(
            "*",
            (F.abs(F.col("pred_ppm") - F.col("obs_ppm")) * F.col("n_test")).alias(
                "ece_contrib"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("bin")
    )


def calibration_bins_sql() -> str:
    return """
WITH per_user AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_views,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
binned AS (
  SELECT user_id, converted, least(n_views // 2, 9) AS bin FROM per_user
),
train AS (
  SELECT bin, COUNT(*) AS n_train,
         (1000000 * SUM(converted)) // COUNT(*) AS pred_ppm
  FROM binned WHERE user_id % 2 = 0 GROUP BY bin
),
test AS (
  SELECT bin, COUNT(*) AS n_test, SUM(converted) AS pos_test
  FROM binned WHERE user_id % 2 = 1 GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(n_train AS BIGINT) AS n_train,
       CAST(pred_ppm AS BIGINT) AS pred_ppm,
       CAST(n_test AS BIGINT) AS n_test,
       CAST(pos_test AS BIGINT) AS pos_test,
       CAST((1000000 * pos_test) // n_test AS BIGINT) AS obs_ppm,
       CAST(abs(pred_ppm - (1000000 * pos_test) // n_test) * n_test AS BIGINT) AS ece_contrib
FROM train JOIN test USING (bin)
ORDER BY bin
"""


# --- l-diversity privacy audit --------------------------------------------------

_LDIV_L = 3


def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, the follow-up
    to k-anonymity): quasi-identifier groups are (market segment,
    order priority, order year) after joining orders to customers;
    the sensitive attribute is order status. Each group reports its
    size, its count of DISTINCT sensitive values, the dominant
    status's share in ppm, and whether it violates distinct
    l-diversity at l = 3 — the release-gate table a privacy review
    signs off on.

    Scale shape: one fact-dim equi-join + one QI-key census with a
    distinct-count and a max-share (two-level partial agg); QI keys
    are low-cardinality, so the census is tiny at any scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment", "o_orderpriority",
        F.year("o_orderdate").alias("o_year"),
        "o_orderstatus",
    )
    per_status = j.groupBy(
        "c_mktsegment", "o_orderpriority", "o_year", "o_orderstatus"
    ).agg(F.count(F.lit(1)).alias("ns"))
    g = per_status.groupBy("c_mktsegment", "o_orderpriority", "o_year").agg(
        F.sum("ns").alias("group_size"),
        F.count(F.lit(1)).alias("distinct_sensitive"),
        F.max("ns").alias("max_status"),
    )
    return (
        g.select(
            "c_mktsegment", "o_orderpriority", "o_year",
            "group_size", "distinct_sensitive",
            F.expr("CAST(div(1000000 * max_status, group_size) AS BIGINT)").alias(
                "dominant_share_ppm"
            ),
            F.when(F.col("distinct_sensitive") < _LDIV_L, 1)
            .otherwise(0)
            .cast("int")
            .alias("violates_l3"),
        )
        .repartition(1)
        .sortWithinPartitions("c_mktsegment", "o_orderpriority", "o_year")
    )


def l_diversity_sql() -> str:
    return f"""
WITH j AS (
  SELECT c_mktsegment, o_orderpriority,
         EXTRACT(year FROM o_orderdate) AS o_year, o_orderstatus
  FROM orders JOIN customer ON c_custkey = o_custkey
),
per_status AS (
  SELECT c_mktsegment, o_orderpriority, o_year, o_orderstatus, COUNT(*) AS ns
  FROM j GROUP BY ALL
),
g AS (
  SELECT c_mktsegment, o_orderpriority, o_year,
         SUM(ns) AS group_size, COUNT(*) AS distinct_sensitive, MAX(ns) AS max_status
  FROM per_status GROUP BY ALL
)
SELECT c_mktsegment, o_orderpriority, CAST(o_year AS INT) AS o_year,
       CAST(group_size AS BIGINT) AS group_size,
       CAST(distinct_sensitive AS BIGINT) AS distinct_sensitive,
       CAST((1000000 * max_status) // group_size AS BIGINT) AS dominant_share_ppm,
       CAST(CASE WHEN distinct_sensitive < {_LDIV_L} THEN 1 ELSE 0 END AS INT) AS violates_l3
FROM g ORDER BY c_mktsegment, o_orderpriority, o_year
"""


# --- deterministic weighted sampling (integer A-ES priorities) ------------------

_WSAMPLE_K = 100


def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling with deterministic integer priorities — the
    exponential-clocks / A-ES family (Efraimidis & Spirakis 2006) made
    reproducible: each order's pseudo-random draw is a 40-bit md5 hash
    of its key, its priority the exact integer div(2^20 * h40, cents)
    (monotone in h/w, the rank statistic A-ES orders by), and the
    sample is the k = 100 smallest priorities (hash tie-break). Output
    pins the selected set plus each row's priority — a weighted
    reservoir any engine can replay bit-for-bit.

    Scale shape: map-only hash + priority arithmetic, then a global
    top-k (rank + filter) — the same single ordered shuffle as any
    top-k; no per-row Python, no RNG state."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 10), 16, 10)
        .cast("long")
        .alias("h40"),
    )
    pri = o.select(
        "o_orderkey", "cents", "h40",
        F.expr("div(1048576 * h40, cents)").alias("priority"),
    )
    # TakeOrderedAndProject (per-partition top-k + merge), NOT a global
    # row_number window: the k-row cut never sorts the full table, so
    # the plan survives 10^12 rows; ranks are assigned on the k rows.
    topk = pri.orderBy("priority", "h40", "o_orderkey").limit(_WSAMPLE_K)
    w = Window.orderBy("priority", "h40", "o_orderkey")
    return (
        topk.select("*", F.row_number().over(w).alias("rk"))
        .select("rk", "o_orderkey", "cents", "priority")
        .repartition(1)
        .sortWithinPartitions("rk")
    )


def weighted_sample_ares_sql() -> str:
    return f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 10) AS BIGINT) AS h40
  FROM orders
),
pri AS (
  SELECT o_orderkey, cents, h40, (1048576 * h40) // cents AS priority FROM o
),
rk AS (
  SELECT *, row_number() OVER (ORDER BY priority, h40, o_orderkey) AS rk FROM pri
)
SELECT CAST(rk AS BIGINT) AS rk, o_orderkey, cents,
       CAST(priority AS BIGINT) AS priority
FROM rk WHERE rk <= {_WSAMPLE_K} ORDER BY rk
"""


# --- keyed-watermark late-data census -------------------------------------------

_WM_DELAY_S = 600


def watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data census — the batch-replayable audit of what
    a streaming watermark policy WOULD drop (the sizing question every
    withWatermark() delay answers): per user stream, events arrive in
    event_id order, the keyed watermark is the running max event time
    over earlier arrivals minus a 600 s allowed delay, and an arrival
    is late when its event time falls behind that watermark. Census by
    event type: arrivals, late drops, drop rate ppm, and the maximum
    observed lateness in seconds — exactly the table that picks the
    delay before the streaming job ships.

    Scale shape: one user-key running-max window + a 5-key census —
    the same keyed-state shape the streaming engine maintains, with
    integer epoch seconds end-to-end."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    x = ev.select(
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        (F.max(F.unix_timestamp("ts")).over(w) - F.lit(_WM_DELAY_S)).alias("wm"),
    )
    return (
        x.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("wm").isNotNull() & (F.col("sec") < F.col("wm")), 1)
                .otherwise(0)
            ).alias("n_late"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("wm").isNotNull() & (F.col("sec") < F.col("wm")),
                        F.col("wm") - F.col("sec"),
                    )
                ),
                F.lit(0),
            ).alias("max_lateness_s"),
        )
        .select(
            "event_type", "n_events", "n_late", "max_lateness_s",
            F.expr("CAST(div(1000000 * n_late, n_events) AS BIGINT)").alias(
                "late_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


def watermark_audit_sql() -> str:
    return f"""
WITH x AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         MAX(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) - {_WM_DELAY_S} AS wm
  FROM events
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN wm IS NOT NULL AND sec < wm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(CASE WHEN wm IS NOT NULL AND sec < wm THEN wm - sec END), 0) AS BIGINT) AS max_lateness_s,
       CAST((1000000 * SUM(CASE WHEN wm IS NOT NULL AND sec < wm THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS late_ppm
FROM x GROUP BY event_type ORDER BY event_type
"""


# --- Roaring-bitmap container sizing census -------------------------------------

# Down-scaled container geometry so fixture-scale universes exercise the
# selector: 12-bit containers (4096 ids), array->bitmap threshold 256.
_ROAR_BITS = 12
_ROAR_THRESH = 256


def roaring_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roaring-bitmap sizing census (Chambi, Lemire et al. 2016 — the
    container-per-2^k-range format every OLAP bitmap index ships):
    per supplier the set of order keys it appears in is split into
    12-bit containers; each container stores its cardinality, its
    run count (consecutive-id runs), and the byte cost of the three
    physical encodings — array (2B/id), bitmap (fixed 2^12/8 B), run
    (4B/run) — and the census reports per supplier the container mix
    the format's min-cost rule would pick and the exact total bytes
    vs the plain 8B/id baseline. Container width is down-scaled from
    Roaring's 16 bits so fixture-scale universes still split (the
    selector logic is width-independent).

    Scale shape: one (supplier, container) census with a run count
    from a key-local lag window, then a supplier rollup — the
    index-build shape, no hot keys."""
    li = _t(spark, sf_dir, "lineitem").select("l_suppkey", "l_orderkey").distinct()
    c = li.select(
        "l_suppkey",
        F.expr(f"CAST(shiftright(l_orderkey, {_ROAR_BITS}) AS BIGINT)").alias("container"),
        (F.col("l_orderkey") % (1 << _ROAR_BITS)).alias("lo"),
    )
    w = Window.partitionBy("l_suppkey", "container").orderBy("lo")
    runs = c.select(
        "l_suppkey", "container", "lo",
        F.when(
            F.lag("lo").over(w).isNull() | (F.lag("lo").over(w) != F.col("lo") - 1), 1
        ).otherwise(0).alias("run_start"),
    )
    per_cont = runs.groupBy("l_suppkey", "container").agg(
        F.count(F.lit(1)).alias("card"),
        F.sum("run_start").alias("n_runs"),
    )
    sized = per_cont.select(
        "l_suppkey",
        (F.lit(2) * F.col("card")).alias("array_b"),
        F.lit((1 << _ROAR_BITS) // 8).alias("bitmap_b"),
        (F.lit(4) * F.col("n_runs")).alias("run_b"),
        "card",
    ).select(
        "l_suppkey", "card",
        F.least("array_b", "bitmap_b", "run_b").alias("best_b"),
        F.when(
            (F.col("run_b") <= F.col("array_b")) & (F.col("run_b") <= F.col("bitmap_b")),
            F.lit("run"),
        )
        .when(F.col("array_b") <= F.col("bitmap_b"), F.lit("array"))
        .otherwise(F.lit("bitmap"))
        .alias("kind"),
    )
    return (
        sized.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_containers"),
            F.sum(F.when(F.col("kind") == "array", 1).otherwise(0)).alias("n_array"),
            F.sum(F.when(F.col("kind") == "bitmap", 1).otherwise(0)).alias("n_bitmap"),
            F.sum(F.when(F.col("kind") == "run", 1).otherwise(0)).alias("n_run"),
            F.sum("best_b").alias("roaring_bytes"),
            (F.lit(8) * F.sum("card")).alias("plain_bytes"),
        )
        .repartition(1)
        .sortWithinPartitions("l_suppkey")
    )


def roaring_size_sql() -> str:
    return f"""
WITH li AS (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem),
c AS (
  SELECT l_suppkey, l_orderkey >> {_ROAR_BITS} AS container,
         l_orderkey % {1 << _ROAR_BITS} AS lo
  FROM li
),
runs AS (
  SELECT l_suppkey, container, lo,
         CASE WHEN lag(lo) OVER (PARTITION BY l_suppkey, container ORDER BY lo) IS NULL
                OR lag(lo) OVER (PARTITION BY l_suppkey, container ORDER BY lo) != lo - 1
              THEN 1 ELSE 0 END AS run_start
  FROM c
),
per_cont AS (
  SELECT l_suppkey, container, COUNT(*) AS card, SUM(run_start) AS n_runs
  FROM runs GROUP BY l_suppkey, container
),
sized AS (
  SELECT l_suppkey, card,
         least(2 * card, {(1 << _ROAR_BITS) // 8}, 4 * n_runs) AS best_b,
         CASE WHEN 4 * n_runs <= 2 * card AND 4 * n_runs <= {(1 << _ROAR_BITS) // 8} THEN 'run'
              WHEN 2 * card <= {(1 << _ROAR_BITS) // 8} THEN 'array'
              ELSE 'bitmap' END AS kind
  FROM per_cont
)
SELECT l_suppkey,
       COUNT(*) AS n_containers,
       CAST(SUM(CASE WHEN kind = 'array' THEN 1 ELSE 0 END) AS BIGINT) AS n_array,
       CAST(SUM(CASE WHEN kind = 'bitmap' THEN 1 ELSE 0 END) AS BIGINT) AS n_bitmap,
       CAST(SUM(CASE WHEN kind = 'run' THEN 1 ELSE 0 END) AS BIGINT) AS n_run,
       CAST(SUM(best_b) AS BIGINT) AS roaring_bytes,
       CAST(8 * SUM(card) AS BIGINT) AS plain_bytes
FROM sized GROUP BY l_suppkey ORDER BY l_suppkey
"""


# --- funnel time-to-convert log2 buckets ----------------------------------------


def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution in log2 buckets: per user the
    seconds between the FIRST view and the first purchase AFTER it,
    bucketed by floor(log2(s+1)) — computed as length(bin(s+1))-1,
    integer-exact, no log() float — the latency histogram growth teams
    read before resizing attribution windows (log buckets because
    conversion lags span seconds to months).

    Scale shape: two user-key min-aggregates (no window), one bucket
    census; converts-only inner join keeps the census tiny."""
    ev = _t(spark, sf_dir, "events")
    first_view = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_timestamp("ts")).alias("t_view"))
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_timestamp("ts").alias("t_p")
    )
    conv = (
        purch.join(first_view, "user_id")
        .where(F.col("t_p") >= F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min(F.col("t_p") - F.col("t_view")).alias("lag_s"))
    )
    b = conv.select(
        "user_id", "lag_s",
        (F.length(F.expr("bin(lag_s + 1)")) - 1).alias("bucket"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("lag_s").alias("min_s"),
            F.max("lag_s").alias("max_s"),
            F.sum("user_id").alias("user_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


def time_to_convert_sql() -> str:
    return """
WITH first_view AS (
  SELECT user_id, MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
purch AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t_p
  FROM events WHERE event_type = 'purchase'
),
conv AS (
  SELECT p.user_id, MIN(t_p - t_view) AS lag_s
  FROM purch p JOIN first_view v ON v.user_id = p.user_id
  WHERE t_p >= t_view GROUP BY p.user_id
),
b AS (
  SELECT user_id, lag_s, length(bin(lag_s + 1)) - 1 AS bucket FROM conv
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       COUNT(*) AS n_users,
       CAST(MIN(lag_s) AS BIGINT) AS min_s,
       CAST(MAX(lag_s) AS BIGINT) AS max_s,
       CAST(SUM(user_id) AS BIGINT) AS user_checksum
FROM b GROUP BY bucket ORDER BY bucket
"""


# --- System-R join-order enumeration audit --------------------------------------


def join_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-order enumeration audit on the customer-orders-lineitem
    chain (the System R / Selinger playbook, Selinger et al. 1979):
    for each of the three pair-first plans the estimated intermediate
    cardinality under the uniformity assumption |R JOIN S| =
    |R|*|S| / max(ndv_R(k), ndv_S(k)) — including the Cartesian
    (lineitem x customer) plan every optimizer must price and reject —
    against the EXACT intermediate sizes from really running the
    joins. Output ranks plans by estimate and by truth; agreement of
    the two rank columns is the audit (estimates are exact integer
    floor divisions, so both engines price identically).

    Scale shape: stats are one aggregate per base table; exact pair
    sizes are two equi-join counts (the cross size is arithmetic, not
    executed); the plan lattice is 3 rows regardless of data size."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    stats_l = li.agg(
        F.count(F.lit(1)).alias("n_l"),
        F.countDistinct("l_orderkey").alias("d_l_ok"),
    )
    stats_o = o.agg(
        F.count(F.lit(1)).alias("n_o"),
        F.countDistinct("o_orderkey").alias("d_o_ok"),
        F.countDistinct("o_custkey").alias("d_o_ck"),
    )
    stats_c = c.agg(
        F.count(F.lit(1)).alias("n_c"),
        F.countDistinct("c_custkey").alias("d_c_ck"),
    )
    exact_lo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("x_lo")
    )
    exact_oc = o.join(c, o["o_custkey"] == c["c_custkey"]).agg(
        F.count(F.lit(1)).alias("x_oc")
    )
    exact_loc = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .agg(F.count(F.lit(1)).alias("x_loc"))
    )
    one = (
        stats_l.crossJoin(stats_o).crossJoin(stats_c)
        .crossJoin(exact_lo).crossJoin(exact_oc).crossJoin(exact_loc)
    )
    est = one.selectExpr(
        "*",
        "div(n_l * n_o, greatest(d_l_ok, d_o_ok)) AS e_lo",
        "div(n_o * n_c, greatest(d_o_ck, d_c_ck)) AS e_oc",
        "n_l * n_c AS e_lc",
    ).selectExpr(
        "*",
        "e_lo + div(e_lo * n_c, greatest(d_o_ck, d_c_ck)) AS cost_est_lo_c",
        "e_oc + div(e_oc * n_l, greatest(d_o_ok, d_l_ok)) AS cost_est_oc_l",
        "e_lc + div(div(e_lc * n_o, greatest(d_l_ok, d_o_ok)), greatest(d_c_ck, d_o_ck))"
        " AS cost_est_lc_o",
        "x_lo + x_loc AS cost_x_lo_c",
        "x_oc + x_loc AS cost_x_oc_l",
        "n_l * n_c + x_loc AS cost_x_lc_o",
    )
    plans = est.selectExpr(
        "stack(3,"
        " 'lineitem_orders_then_customer', e_lo, cost_est_lo_c, x_lo, cost_x_lo_c,"
        " 'orders_customer_then_lineitem', e_oc, cost_est_oc_l, x_oc, cost_x_oc_l,"
        " 'lineitem_x_customer_then_orders', e_lc, cost_est_lc_o, e_lc, cost_x_lc_o"
        ") AS (plan, est_pair, est_cost, exact_pair, exact_cost)"
    )
    w_est = Window.orderBy("est_cost", "plan")
    w_x = Window.orderBy("exact_cost", "plan")
    return (
        plans.select(
            "plan", "est_pair", "est_cost", "exact_pair", "exact_cost",
            F.row_number().over(w_est).cast("long").alias("rank_by_est"),
            F.row_number().over(w_x).cast("long").alias("rank_by_exact"),
        )
        .repartition(1)
        .sortWithinPartitions("plan")
    )


def join_order_audit_sql() -> str:
    return """
WITH sl AS (SELECT COUNT(*) AS n_l, COUNT(DISTINCT l_orderkey) AS d_l_ok FROM lineitem),
so AS (SELECT COUNT(*) AS n_o, COUNT(DISTINCT o_orderkey) AS d_o_ok,
              COUNT(DISTINCT o_custkey) AS d_o_ck FROM orders),
sc AS (SELECT COUNT(*) AS n_c, COUNT(DISTINCT c_custkey) AS d_c_ck FROM customer),
xlo AS (SELECT COUNT(*) AS x_lo FROM lineitem JOIN orders ON o_orderkey = l_orderkey),
xoc AS (SELECT COUNT(*) AS x_oc FROM orders JOIN customer ON c_custkey = o_custkey),
xloc AS (SELECT COUNT(*) AS x_loc FROM lineitem
         JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey),
one AS (SELECT * FROM sl, so, sc, xlo, xoc, xloc),
est AS (
  SELECT *,
         (n_l * n_o) // greatest(d_l_ok, d_o_ok) AS e_lo,
         (n_o * n_c) // greatest(d_o_ck, d_c_ck) AS e_oc,
         n_l * n_c AS e_lc
  FROM one
),
plans AS (
  SELECT 'lineitem_orders_then_customer' AS plan, e_lo AS est_pair,
         e_lo + (e_lo * n_c) // greatest(d_o_ck, d_c_ck) AS est_cost,
         x_lo AS exact_pair, x_lo + x_loc AS exact_cost
  FROM est
  UNION ALL
  SELECT 'orders_customer_then_lineitem', e_oc,
         e_oc + (e_oc * n_l) // greatest(d_o_ok, d_l_ok),
         x_oc, x_oc + x_loc
  FROM est
  UNION ALL
  SELECT 'lineitem_x_customer_then_orders', e_lc,
         e_lc + ((e_lc * n_o) // greatest(d_l_ok, d_o_ok)) // greatest(d_c_ck, d_o_ck),
         e_lc, n_l * n_c + x_loc
  FROM est
)
SELECT plan,
       CAST(est_pair AS BIGINT) AS est_pair,
       CAST(est_cost AS BIGINT) AS est_cost,
       CAST(exact_pair AS BIGINT) AS exact_pair,
       CAST(exact_cost AS BIGINT) AS exact_cost,
       CAST(row_number() OVER (ORDER BY est_cost, plan) AS BIGINT) AS rank_by_est,
       CAST(row_number() OVER (ORDER BY exact_cost, plan) AS BIGINT) AS rank_by_exact
FROM plans ORDER BY plan
"""


# --- FIFO lot allocation via prefix-sum interval join ---------------------------


def fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO cost-basis allocation (the accounting-engine primitive:
    each sale consumes the oldest open purchase lots first), computed
    WITHOUT sequential state: running-quantity prefix sums turn lots
    and sales into half-open intervals on the cumulative-units axis,
    and FIFO matching is exactly their interval overlap — a part-local
    range join, alloc = min(hi,hi') - max(lo,lo').  Per part: lots,
    sales, matched units, the exact cost basis in cents (allocated
    units x lot unit price), and unmatched sale units.  Lots are the
    odd line numbers of the part's lineitems, sales the even ones,
    both in (shipdate, orderkey, linenumber) FIFO order.

    Scale shape: two part-key cumsum windows + one part-local range
    join — nothing crosses parts, so 10^12 rows shard cleanly by
    part; the classic sequential scan becomes two shuffles."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_shipdate",
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        F.expr(
            "div(CAST(round(100 * l_extendedprice) AS BIGINT),"
            " CAST(l_quantity AS BIGINT))"
        ).alias("unit_cents"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lots = li.where(F.col("l_linenumber") % 2 == 1).select(
        "l_partkey", "q", "unit_cents",
        F.coalesce(F.sum("q").over(w), F.lit(0)).alias("lo"),
    ).select(
        "l_partkey", "unit_cents", "lo", (F.col("lo") + F.col("q")).alias("hi")
    )
    sales = li.where(F.col("l_linenumber") % 2 == 0).select(
        "l_partkey", "q",
        F.coalesce(F.sum("q").over(w), F.lit(0)).alias("slo"),
    ).select("l_partkey", "slo", (F.col("slo") + F.col("q")).alias("shi"))
    alloc = lots.join(
        sales,
        (lots["l_partkey"] == sales["l_partkey"])
        & (F.col("hi") > F.col("slo"))
        & (F.col("lo") < F.col("shi")),
    ).drop(sales["l_partkey"]).select(
        "l_partkey", "unit_cents",
        (
            F.least(F.col("hi"), F.col("shi"))
            - F.greatest(F.col("lo"), F.col("slo"))
        ).alias("a"),
    )
    lot_tot = lots.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_lots"), F.max("hi").alias("units_bought")
    )
    sale_tot = sales.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_sales"), F.max("shi").alias("units_sold")
    )
    am = alloc.groupBy("l_partkey").agg(
        F.sum("a").alias("matched_units"),
        F.sum(F.col("a") * F.col("unit_cents")).alias("cost_basis_cents"),
    )
    return (
        lot_tot.join(sale_tot, "l_partkey")
        .join(am, "l_partkey", "left")
        .select(
            "l_partkey", "n_lots", "n_sales", "units_bought", "units_sold",
            F.coalesce(F.col("matched_units"), F.lit(0)).alias("matched_units"),
            F.coalesce(F.col("cost_basis_cents"), F.lit(0)).alias("cost_basis_cents"),
            F.greatest(
                F.col("units_sold")
                - F.coalesce(F.col("matched_units"), F.lit(0)),
                F.lit(0),
            ).alias("unmatched_units"),
        )
        .repartition(1)
        .sortWithinPartitions("l_partkey")
    )


def fifo_allocation_sql() -> str:
    return """
WITH li AS (
  SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(round(100 * l_extendedprice) AS BIGINT) // CAST(l_quantity AS BIGINT) AS unit_cents
  FROM lineitem
),
lots AS (
  SELECT l_partkey, unit_cents,
         COALESCE(SUM(q) OVER (PARTITION BY l_partkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
         COALESCE(SUM(q) OVER (PARTITION BY l_partkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + q AS hi
  FROM li WHERE l_linenumber % 2 = 1
),
sales AS (
  SELECT l_partkey,
         COALESCE(SUM(q) OVER (PARTITION BY l_partkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS slo,
         COALESCE(SUM(q) OVER (PARTITION BY l_partkey
            ORDER BY l_shipdate, l_orderkey, l_linenumber
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + q AS shi
  FROM li WHERE l_linenumber % 2 = 0
),
alloc AS (
  SELECT lots.l_partkey, unit_cents,
         least(hi, shi) - greatest(lo, slo) AS a
  FROM lots JOIN sales
    ON sales.l_partkey = lots.l_partkey AND hi > slo AND lo < shi
),
lot_tot AS (
  SELECT l_partkey, COUNT(*) AS n_lots, MAX(hi) AS units_bought
  FROM lots GROUP BY l_partkey
),
sale_tot AS (
  SELECT l_partkey, COUNT(*) AS n_sales, MAX(shi) AS units_sold
  FROM sales GROUP BY l_partkey
),
am AS (
  SELECT l_partkey, SUM(a) AS matched_units,
         SUM(a * unit_cents) AS cost_basis_cents
  FROM alloc GROUP BY l_partkey
)
SELECT lot_tot.l_partkey,
       CAST(n_lots AS BIGINT) AS n_lots,
       CAST(n_sales AS BIGINT) AS n_sales,
       CAST(units_bought AS BIGINT) AS units_bought,
       CAST(units_sold AS BIGINT) AS units_sold,
       CAST(COALESCE(matched_units, 0) AS BIGINT) AS matched_units,
       CAST(COALESCE(cost_basis_cents, 0) AS BIGINT) AS cost_basis_cents,
       CAST(greatest(units_sold - COALESCE(matched_units, 0), 0) AS BIGINT) AS unmatched_units
FROM lot_tot
JOIN sale_tot ON sale_tot.l_partkey = lot_tot.l_partkey
LEFT JOIN am ON am.l_partkey = lot_tot.l_partkey
ORDER BY lot_tot.l_partkey
"""


# --- Copeland tournament ranking over suppliers ---------------------------------


def copeland_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copeland tournament ranking (social-choice theory's pairwise
    method, Copeland 1951): suppliers play one 'match' per calendar
    month in which both shipped — won by the higher exact monthly
    revenue in cents — and each supplier's Copeland score is wins
    minus losses over all pairwise month-matches. The rank-aggregation
    primitive leaderboards use when a single global sum would be
    dominated by volume months.

    Scale shape: one (supplier, month) census, then a month-keyed
    self-join over supplier pairs — bounded by suppliers-per-month
    squared, month-local; the final census is per supplier."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)")).alias("cents")
    )
    a = monthly.select(
        F.col("l_suppkey").alias("sa"), "m", F.col("cents").alias("ca")
    )
    b = monthly.select(
        F.col("l_suppkey").alias("sb"), F.col("m").alias("mb"),
        F.col("cents").alias("cb"),
    )
    duels = a.join(b, (F.col("m") == F.col("mb")) & (F.col("sa") != F.col("sb")))
    per = duels.groupBy("sa").agg(
        F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0)).alias("wins"),
        F.sum(F.when(F.col("ca") < F.col("cb"), 1).otherwise(0)).alias("losses"),
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)).alias("ties"),
    )
    return (
        per.select(
            F.col("sa").alias("l_suppkey"), "wins", "losses", "ties",
            (F.col("wins") - F.col("losses")).alias("copeland"),
        )
        .repartition(1)
        .sortWithinPartitions("l_suppkey")
    )


def copeland_ranking_sql() -> str:
    return """
WITH monthly AS (
  SELECT l_suppkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(round(100 * l_extendedprice) AS BIGINT)) AS cents
  FROM lineitem GROUP BY l_suppkey, m
)
SELECT a.l_suppkey,
       CAST(SUM(CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END) AS BIGINT) AS wins,
       CAST(SUM(CASE WHEN a.cents < b.cents THEN 1 ELSE 0 END) AS BIGINT) AS losses,
       CAST(SUM(CASE WHEN a.cents = b.cents THEN 1 ELSE 0 END) AS BIGINT) AS ties,
       CAST(SUM(CASE WHEN a.cents > b.cents THEN 1 ELSE 0 END)
          - SUM(CASE WHEN a.cents < b.cents THEN 1 ELSE 0 END) AS BIGINT) AS copeland
FROM monthly a JOIN monthly b ON b.m = a.m AND b.l_suppkey != a.l_suppkey
GROUP BY a.l_suppkey ORDER BY a.l_suppkey
"""


# --- max-min fair water-filling allocation --------------------------------------


def waterfill_fairshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair water-filling (the progressive-filling allocation
    of datacenter schedulers and congestion control, Bertsekas &
    Gallager 1992 §6.5.2), computed in closed form — no iteration:
    per month the suppliers' revenue demands (cents) share a budget
    C = total DIV 2; sorting demands ascending with prefix sums, the
    integer water level is L = (C - prefix_below) DIV remaining at
    the FIRST position where the segment can absorb the rest. Per
    month: suppliers, demand, budget, level, fully-satisfied count,
    the exact allocated sum min(d_i, L), and the sub-L slack (< n,
    the units a remainder rule would hand out).

    Scale shape: one (supplier, month) census, one month-key sort
    window for prefix sums, one month census — the sequential
    progressive-filling loop becomes two shuffles."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)")).alias("d")
    )
    wm = Window.partitionBy("m").orderBy("d", "l_suppkey")
    wall = Window.partitionBy("m")
    x = monthly.select(
        "m", "d",
        F.row_number().over(wm).alias("k"),
        F.coalesce(
            F.sum("d").over(wm.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("pre"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.expr("div(sum(d) OVER (PARTITION BY m), 2)").alias("c"),
    )
    lvl = (
        x.where(F.col("pre") + (F.col("n") - F.col("k") + 1) * F.col("d") >= F.col("c"))
        .groupBy("m")
        .agg(F.min("k").alias("k0"))
    )
    level = (
        x.join(lvl, "m")
        .where(F.col("k") == F.col("k0"))
        .select(
            "m", "n", "c",
            F.expr("div(c - pre, n - k + 1)").alias("level"),
        )
    )
    out = (
        monthly.join(level, "m")
        .groupBy("m")
        .agg(
            F.max("n").alias("n_suppliers"),
            F.sum("d").alias("total_demand"),
            F.max("c").alias("budget"),
            F.max("level").alias("level"),
            F.sum(F.when(F.col("d") <= F.col("level"), 1).otherwise(0)).alias(
                "n_satisfied"
            ),
            F.sum(F.least(F.col("d"), F.col("level"))).alias("allocated"),
        )
        .select(
            "*", (F.col("budget") - F.col("allocated")).alias("slack")
        )
    )
    return (
        out.withColumn("m", F.col("m").cast("date"))
        .repartition(1)
        .sortWithinPartitions("m")
    )


def waterfill_fairshare_sql() -> str:
    return """
WITH monthly AS (
  SELECT l_suppkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(round(100 * l_extendedprice) AS BIGINT)) AS d
  FROM lineitem GROUP BY l_suppkey, m
),
x AS (
  SELECT m, d,
         row_number() OVER (PARTITION BY m ORDER BY d, l_suppkey) AS k,
         COALESCE(SUM(d) OVER (PARTITION BY m ORDER BY d, l_suppkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
         COUNT(*) OVER (PARTITION BY m) AS n,
         SUM(d) OVER (PARTITION BY m) // 2 AS c
  FROM monthly
),
lvl AS (
  SELECT m, MIN(k) AS k0 FROM x
  WHERE pre + (n - k + 1) * d >= c GROUP BY m
),
level AS (
  SELECT x.m, n, c, (c - pre) // (n - k + 1) AS level
  FROM x JOIN lvl ON lvl.m = x.m AND x.k = lvl.k0
),
out_ AS (
  SELECT monthly.m,
         MAX(n) AS n_suppliers,
         SUM(d) AS total_demand,
         MAX(c) AS budget,
         MAX(level) AS level,
         SUM(CASE WHEN d <= level THEN 1 ELSE 0 END) AS n_satisfied,
         SUM(least(d, level)) AS allocated
  FROM monthly JOIN level ON level.m = monthly.m
  GROUP BY monthly.m
)
SELECT m, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       CAST(total_demand AS BIGINT) AS total_demand,
       CAST(budget AS BIGINT) AS budget,
       CAST(level AS BIGINT) AS level,
       CAST(n_satisfied AS BIGINT) AS n_satisfied,
       CAST(allocated AS BIGINT) AS allocated,
       CAST(budget - allocated AS BIGINT) AS slack
FROM out_ ORDER BY m
"""


# --- bullwhip variance-amplification census -------------------------------------


def bullwhip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect census (Lee, Padmanabhan & Whang 1997 — demand
    variance amplification up the supply chain) in exact integers: per
    part brand, monthly ordered units (by order date) vs monthly
    shipped units (by ship date) on the SAME zero-filled calendar
    grid, and the M-scaled variance numerators V = M*sum(x^2) -
    (sum x)^2 for both series — the shift-invariant integer variance
    surface — with the amplification ratio in ppm. Ratio > 1e6 means
    shipments swing harder than demand: the bullwhip.

    Scale shape: two (brand, month) censuses + a broadcast part dim
    join + a zero-fill grid join on brand x month — all small keys;
    the fact table is read twice, shuffled on tiny keys only."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).join(
        o, li["l_orderkey"] == o["o_orderkey"]
    )
    demand = base.groupBy(
        "p_brand", F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("d"))
    supply = base.groupBy(
        "p_brand", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("s"))
    months = demand.select("m").union(supply.select("m")).distinct()
    brands = p.select("p_brand").distinct()
    grid = brands.crossJoin(months)
    g = (
        grid.join(demand, ["p_brand", "m"], "left")
        .join(supply, ["p_brand", "m"], "left")
        .select(
            "p_brand", "m",
            F.coalesce(F.col("d"), F.lit(0)).alias("d"),
            F.coalesce(F.col("s"), F.lit(0)).alias("s"),
        )
    )
    agg = g.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("d").alias("sum_demand"),
        F.sum("s").alias("sum_supply"),
        (
            F.count(F.lit(1)) * F.sum(F.col("d") * F.col("d"))
            - F.sum("d") * F.sum("d")
        ).alias("v_demand"),
        (
            F.count(F.lit(1)) * F.sum(F.col("s") * F.col("s"))
            - F.sum("s") * F.sum("s")
        ).alias("v_supply"),
    )
    return (
        agg.select(
            "p_brand", "n_months", "sum_demand", "sum_supply",
            "v_demand", "v_supply",
            F.expr(
                "CAST(CASE WHEN v_demand > 0 THEN div(1000000 * v_supply, v_demand)"
                " ELSE 0 END AS BIGINT)"
            ).alias("bullwhip_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("p_brand")
    )


def bullwhip_sql() -> str:
    return """
WITH base AS (
  SELECT p_brand, l_quantity, o_orderdate, l_shipdate
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
),
demand AS (
  SELECT p_brand, date_trunc('month', o_orderdate) AS m,
         SUM(CAST(l_quantity AS BIGINT)) AS d
  FROM base GROUP BY p_brand, m
),
supply AS (
  SELECT p_brand, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(l_quantity AS BIGINT)) AS s
  FROM base GROUP BY p_brand, m
),
months AS (SELECT m FROM demand UNION SELECT m FROM supply),
brands AS (SELECT DISTINCT p_brand FROM part),
g AS (
  SELECT brands.p_brand, months.m,
         COALESCE(d, 0) AS d, COALESCE(s, 0) AS s
  FROM brands CROSS JOIN months
  LEFT JOIN demand ON demand.p_brand = brands.p_brand AND demand.m = months.m
  LEFT JOIN supply ON supply.p_brand = brands.p_brand AND supply.m = months.m
),
agg AS (
  SELECT p_brand, COUNT(*) AS n_months,
         SUM(d) AS sum_demand, SUM(s) AS sum_supply,
         COUNT(*) * SUM(d * d) - SUM(d) * SUM(d) AS v_demand,
         COUNT(*) * SUM(s * s) - SUM(s) * SUM(s) AS v_supply
  FROM g GROUP BY p_brand
)
SELECT p_brand, CAST(n_months AS BIGINT) AS n_months,
       CAST(sum_demand AS BIGINT) AS sum_demand,
       CAST(sum_supply AS BIGINT) AS sum_supply,
       CAST(v_demand AS BIGINT) AS v_demand,
       CAST(v_supply AS BIGINT) AS v_supply,
       CAST(CASE WHEN v_demand > 0 THEN (1000000 * v_supply) // v_demand
                 ELSE 0 END AS BIGINT) AS bullwhip_ppm
FROM agg ORDER BY p_brand
"""


# --- bounded exhaustive 0/1 knapsack census -------------------------------------

_KNAP_MAXN = 8


def knapsack_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """0/1 knapsack solved EXHAUSTIVELY per customer (the
    promotion-budget selection: which orders to discount under a
    capacity cap), for customers with at most 8 orders so the 2^n
    lattice is constant-bounded: weight = the order's total lineitem
    units, value = order cents, budget = half the customer's total
    units; the best feasible subset maximizes value with the smallest
    bitmask breaking ties. The brute lattice IS the oracle here — the
    DP would be sequential, the 2^n join is not.

    Scale shape: orders ranked per customer (one window), masks
    joined customer-locally (<= 256 x 8 rows per customer), two
    key-local argmax censuses — embarrassingly parallel at any
    customer count."""
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("wt")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_custkey", "o_orderkey", "o_orderdate", "wt",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v"),
        )
    )
    wn = Window.partitionBy("o_custkey")
    wo = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = o.select(
        "o_custkey", "wt", "v",
        (F.row_number().over(wo) - 1).alias("k"),
        F.count(F.lit(1)).over(wn).alias("n"),
        F.expr("div(sum(wt) OVER (PARTITION BY o_custkey), 2)").alias("budget"),
    ).where(F.col("n") <= _KNAP_MAXN)
    masks = spark.range(1, 1 << _KNAP_MAXN).select(
        F.col("id").cast("long").alias("m")
    )
    cand = (
        ranked.join(masks, F.expr("m < shiftleft(1, CAST(n AS INT))"))
        .where(F.expr("(shiftright(m, CAST(k AS INT)) & 1) = 1"))
        .groupBy("o_custkey", "m")
        .agg(
            F.sum("wt").alias("w_sum"),
            F.sum("v").alias("v_sum"),
            F.max("budget").alias("budget"),
            F.max("n").alias("n"),
        )
        .where(F.col("w_sum") <= F.col("budget"))
    )
    base = ranked.groupBy("o_custkey").agg(
        F.max("n").alias("n_orders"), F.max("budget").alias("budget")
    )
    best_v = cand.groupBy("o_custkey").agg(F.max("v_sum").alias("best_value"))
    best = (
        cand.join(best_v, "o_custkey")
        .where(F.col("v_sum") == F.col("best_value"))
        .groupBy("o_custkey")
        .agg(F.min("m").alias("best_mask"), F.max("best_value").alias("bv"))
    )
    wsel = cand.select(
        F.col("o_custkey").alias("ck2"), F.col("m").alias("m2"),
        F.col("w_sum").alias("best_weight"),
    )
    joined = base.join(best, "o_custkey", "left")
    return (
        joined.join(
            wsel,
            (joined["o_custkey"] == wsel["ck2"]) & (joined["best_mask"] == wsel["m2"]),
            "left",
        )
        .select(
            "o_custkey", "n_orders", "budget",
            F.coalesce(F.col("bv"), F.lit(0)).alias("best_value_cents"),
            F.coalesce(F.col("best_weight"), F.lit(0)).alias("best_weight"),
            F.coalesce(F.col("best_mask"), F.lit(0)).alias("best_mask"),
        )
        .repartition(1)
        .sortWithinPartitions("o_custkey")
    )


def knapsack_census_sql() -> str:
    return f"""
WITH li AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS wt
  FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT o_custkey, o_orderkey, o_orderdate, wt,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders JOIN li ON l_orderkey = o_orderkey
),
ranked AS (
  SELECT o_custkey, wt, v,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) - 1 AS k,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n,
         SUM(wt) OVER (PARTITION BY o_custkey) // 2 AS budget
  FROM o QUALIFY n <= {_KNAP_MAXN}
),
cand AS (
  SELECT o_custkey, m,
         SUM(wt) AS w_sum, SUM(v) AS v_sum,
         MAX(budget) AS budget, MAX(n) AS n
  FROM ranked, (SELECT unnest(range(1, {1 << _KNAP_MAXN})) AS m)
  WHERE m < (1 << n) AND ((m >> k) & 1) = 1
  GROUP BY o_custkey, m
  HAVING SUM(wt) <= MAX(budget)
),
base AS (
  SELECT o_custkey, MAX(n) AS n_orders, MAX(budget) AS budget
  FROM ranked GROUP BY o_custkey
),
best_v AS (SELECT o_custkey, MAX(v_sum) AS best_value FROM cand GROUP BY o_custkey),
best AS (
  SELECT cand.o_custkey, MIN(m) AS best_mask, MAX(best_value) AS bv
  FROM cand JOIN best_v ON best_v.o_custkey = cand.o_custkey
   AND cand.v_sum = best_v.best_value
  GROUP BY cand.o_custkey
)
SELECT base.o_custkey,
       CAST(n_orders AS BIGINT) AS n_orders,
       CAST(base.budget AS BIGINT) AS budget,
       CAST(COALESCE(bv, 0) AS BIGINT) AS best_value_cents,
       CAST(COALESCE(ws.w_sum, 0) AS BIGINT) AS best_weight,
       CAST(COALESCE(best_mask, 0) AS BIGINT) AS best_mask
FROM base
LEFT JOIN best ON best.o_custkey = base.o_custkey
LEFT JOIN cand ws ON ws.o_custkey = base.o_custkey AND ws.m = best.best_mask
ORDER BY base.o_custkey
"""


# --- Wald-Wolfowitz runs test components ----------------------------------------


def runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs-test components over the daily-revenue
    series, exact: each day is above (+) or at-or-below (-) the exact
    integer median-of-cents (lower median: the value at ceil(n/2) in
    sort order — no float percentile); R = number of sign runs, n1/n2
    the sign counts, and the expected-runs mean mu = 1 + 2*n1*n2/n in
    exact ppm. The distribution-free randomness check a forecasting
    pipeline runs on residual signs — everything integer so both
    engines agree bit-for-bit.

    Scale shape: the series is a date census; the median is one
    ordered rank pick; runs are one lag() window — no float and no
    global state beyond the tiny aggregated series."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents")
    )
    wmed = Window.orderBy("cents", "o_orderdate")
    wn = Window.partitionBy()
    med = (
        daily.select(
            "cents",
            F.row_number().over(wmed).alias("rk"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .where(F.col("rk") == F.expr("CAST(ceil(n / 2.0) AS BIGINT)"))
        .select(F.col("cents").alias("median_cents"))
    )
    signed = daily.crossJoin(med).select(
        "o_orderdate",
        F.when(F.col("cents") > F.col("median_cents"), 1).otherwise(0).alias("sgn"),
        "median_cents",
    )
    wt = Window.orderBy("o_orderdate")
    runs = signed.select(
        "sgn", "median_cents",
        F.when(
            F.lag("sgn").over(wt).isNull() | (F.lag("sgn").over(wt) != F.col("sgn")),
            1,
        ).otherwise(0).alias("new_run"),
    )
    return runs.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("sgn").alias("n_above"),
        F.sum(F.lit(1) - F.col("sgn")).alias("n_below"),
        F.sum("new_run").alias("n_runs"),
        F.max("median_cents").alias("median_cents"),
    ).select(
        "n_days", "n_above", "n_below", "n_runs", "median_cents",
        F.expr(
            "CAST(1000000 + div(2000000 * n_above * n_below, n_days) AS BIGINT)"
        ).alias("expected_runs_ppm"),
    )


def runs_test_sql() -> str:
    return """
WITH daily AS (
  SELECT o_orderdate, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_orderdate
),
med AS (
  SELECT cents AS median_cents
  FROM (
    SELECT cents,
           row_number() OVER (ORDER BY cents, o_orderdate) AS rk,
           COUNT(*) OVER () AS n
    FROM daily
  )
  WHERE rk = CAST(ceil(n / 2.0) AS BIGINT)
),
signed_ AS (
  SELECT o_orderdate,
         CASE WHEN cents > median_cents THEN 1 ELSE 0 END AS sgn,
         median_cents
  FROM daily, med
),
runs AS (
  SELECT sgn, median_cents,
         CASE WHEN lag(sgn) OVER (ORDER BY o_orderdate) IS NULL
                OR lag(sgn) OVER (ORDER BY o_orderdate) != sgn
              THEN 1 ELSE 0 END AS new_run
  FROM signed_
)
SELECT COUNT(*) AS n_days,
       CAST(SUM(sgn) AS BIGINT) AS n_above,
       CAST(SUM(1 - sgn) AS BIGINT) AS n_below,
       CAST(SUM(new_run) AS BIGINT) AS n_runs,
       CAST(MAX(median_cents) AS BIGINT) AS median_cents,
       CAST(1000000 + (2000000 * SUM(sgn) * SUM(1 - sgn)) // COUNT(*) AS BIGINT) AS expected_runs_ppm
FROM runs
"""


# --- as-of linear interpolation at grid timestamps ------------------------------

_AI_STEP_DAYS = 30


def asof_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation at grid timestamps between as-of
    neighbors, EXACT rational (the resample primitive under every
    time-series alignment: y = (y0*(t1-tq) + y1*(tq-t0)) / (t1-t0),
    held as integer numerator/denominator plus the floored ppm-free
    cents value): daily revenue is sampled every 30 days from the
    series start; each grid point takes its backward and forward
    as-of neighbors (exact-hit grid points interpolate trivially).

    Scale shape: the grid is a range over the aggregated date span;
    neighbors come from two as-of window max/min passes over the
    date census — no per-row state, both joins key-local on the grid
    point."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("cents")
    ).select(F.expr("CAST(datediff(o_orderdate, '1970-01-01') AS BIGINT)").alias("d"), "cents")
    span = daily.agg(F.min("d").alias("dmin"), F.max("d").alias("dmax"))
    grid = span.select(
        F.explode(
            F.expr(f"sequence(dmin, dmax, {_AI_STEP_DAYS})")
        ).alias("tq")
    )
    lo = (
        grid.join(daily, F.col("d") <= F.col("tq"))
        .groupBy("tq")
        .agg(F.max("d").alias("t0"))
        .join(daily.select(F.col("d").alias("t0"), F.col("cents").alias("y0")), "t0")
    )
    hi = (
        grid.join(daily, F.col("d") >= F.col("tq"))
        .groupBy("tq")
        .agg(F.min("d").alias("t1"))
        .join(daily.select(F.col("d").alias("t1"), F.col("cents").alias("y1")), "t1")
    )
    j = lo.join(hi, "tq")
    return (
        j.select(
            "tq", "t0", "t1", "y0", "y1",
            F.when(F.col("t1") == F.col("t0"), F.col("y0"))
            .otherwise(
                F.expr("div(y0 * (t1 - tq) + y1 * (tq - t0), t1 - t0)")
            )
            .alias("interp_cents"),
        )
        .repartition(1)
        .sortWithinPartitions("tq")
    )


def asof_interp_sql() -> str:
    return f"""
WITH daily AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS d,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_orderdate
),
span AS (SELECT MIN(d) AS dmin, MAX(d) AS dmax FROM daily),
grid AS (
  SELECT unnest(range(dmin, dmax + 1, {_AI_STEP_DAYS})) AS tq FROM span
),
lo AS (
  SELECT tq, MAX(d) AS t0 FROM grid JOIN daily ON d <= tq GROUP BY tq
),
lov AS (SELECT tq, t0, cents AS y0 FROM lo JOIN daily ON daily.d = lo.t0),
hi AS (
  SELECT tq, MIN(d) AS t1 FROM grid JOIN daily ON d >= tq GROUP BY tq
),
hiv AS (SELECT tq, t1, cents AS y1 FROM hi JOIN daily ON daily.d = hi.t1)
SELECT lov.tq, t0, t1, y0, y1,
       CAST(CASE WHEN t1 = t0 THEN y0
                 ELSE (y0 * (t1 - lov.tq) + y1 * (lov.tq - t0)) // (t1 - t0)
            END AS BIGINT) AS interp_cents
FROM lov JOIN hiv ON hiv.tq = lov.tq
ORDER BY lov.tq
"""


# --- Hamilton largest-remainder apportionment with Alabama-paradox audit --------

_APP_SEATS = 100


def apportionment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment (the proportional
    allocation rule of electoral systems and pro-rata billing) with
    an ALABAMA-PARADOX audit: per month each supplier's exact revenue
    quota at 100 seats is floor(seats*rev/total) plus one bonus seat
    for the largest remainders (remainder then supplier tie-break),
    recomputed at 101 seats — and the audit flags any supplier whose
    seat count DROPS when the house grows, Hamilton's famous
    monotonicity failure, caught here exactly.

    Scale shape: month-key censuses + two month-local rank windows;
    the paradox check is a self-aligned join on (month, supplier) —
    all small keys."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)")).alias("rev")
    )
    tot = monthly.groupBy("m").agg(
        F.sum("rev").alias("total"), F.count(F.lit(1)).alias("n_sup")
    )
    base = monthly.join(tot, "m")

    def seats(n_seats):
        q = F.expr(f"div({n_seats} * rev, total)")
        r = F.expr(f"({n_seats} * rev) % total")
        x = base.select(
            "m", "l_suppkey", q.alias("q"), r.alias("r"),
            (F.lit(n_seats) - F.sum(q).over(Window.partitionBy("m"))).alias("bonus"),
        )
        wr = Window.partitionBy("m").orderBy(F.col("r").desc(), "l_suppkey")
        return x.select(
            "m", "l_suppkey",
            (
                F.col("q")
                + F.when(F.row_number().over(wr) <= F.col("bonus"), 1).otherwise(0)
            ).alias(f"seats{n_seats}"),
        )
    s100 = seats(_APP_SEATS)
    s101 = seats(_APP_SEATS + 1)
    j = s100.join(s101, ["m", "l_suppkey"])
    return (
        j.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.sum(f"seats{_APP_SEATS}").alias("seats_total_100"),
            F.sum(f"seats{_APP_SEATS + 1}").alias("seats_total_101"),
            F.sum(
                F.when(
                    F.col(f"seats{_APP_SEATS + 1}") < F.col(f"seats{_APP_SEATS}"), 1
                ).otherwise(0)
            ).alias("alabama_months"),
        )
        .repartition(1)
        .sortWithinPartitions("l_suppkey")
    )


def apportionment_census_sql() -> str:
    def seats_cte(n_seats, name):
        return f"""
{name}_x AS (
  SELECT m, l_suppkey,
         ({n_seats} * rev) // total AS q,
         ({n_seats} * rev) % total AS r,
         {n_seats} - SUM(({n_seats} * rev) // total) OVER (PARTITION BY m) AS bonus
  FROM base
),
{name} AS (
  SELECT m, l_suppkey,
         q + CASE WHEN row_number() OVER (PARTITION BY m ORDER BY r DESC, l_suppkey)
                       <= bonus THEN 1 ELSE 0 END AS seats
  FROM {name}_x
)"""
    return f"""
WITH monthly AS (
  SELECT l_suppkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(round(100 * l_extendedprice) AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_suppkey, m
),
tot AS (
  SELECT m, SUM(rev) AS total, COUNT(*) AS n_sup FROM monthly GROUP BY m
),
base AS (SELECT monthly.*, total, n_sup FROM monthly JOIN tot USING (m)),
{seats_cte(_APP_SEATS, 's100')},
{seats_cte(_APP_SEATS + 1, 's101')}
SELECT s100.l_suppkey,
       COUNT(*) AS n_months,
       CAST(SUM(s100.seats) AS BIGINT) AS seats_total_100,
       CAST(SUM(s101.seats) AS BIGINT) AS seats_total_101,
       CAST(SUM(CASE WHEN s101.seats < s100.seats THEN 1 ELSE 0 END) AS BIGINT) AS alabama_months
FROM s100 JOIN s101 ON s101.m = s100.m AND s101.l_suppkey = s100.l_suppkey
GROUP BY s100.l_suppkey ORDER BY s100.l_suppkey
"""


# --- Johnson's rule 2-machine flow-shop makespan --------------------------------


def johnson_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson's-rule flow-shop audit (Johnson 1954, the only
    polynomially-optimal scheduling classic): each supplier's orders
    are 2-machine jobs (machine 1 time = total units, machine 2 time
    = cents div 1000), sequenced by Johnson's rule — p1 <= p2 jobs
    first ascending p1, then the rest descending p2 — and the exact
    makespan comes from the CLOSED FORM C_max = max over k of
    (prefix_p1(k) + suffix_p2(k)): the sequential machine-2 recurrence
    is a Lindley max, so prefix sums replace iteration.  Reported
    against the FIFO (date-order) makespan with the saving in ppm.

    Scale shape: two supplier-key sort windows (Johnson key, FIFO
    key) + one census — the scheduling loop becomes two shuffles."""
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("p1")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_custkey", "o_orderkey", "o_orderdate", "p1",
            F.expr("div(CAST(round(o_totalprice * 100) AS BIGINT), 1000)").alias("p2"),
        )
        .select(
            F.col("o_custkey").alias("g"), "o_orderkey", "o_orderdate", "p1", "p2",
            F.when(F.col("p1") <= F.col("p2"), F.struct(F.lit(0).alias("grp"), F.col("p1").alias("a"), (-F.col("p2")).alias("b")))
            .otherwise(F.struct(F.lit(1).alias("grp"), (-F.col("p2")).alias("a"), F.col("p1").alias("b")))
            .alias("jkey"),
        )
    )

    def makespan(df, order_cols, label):
        w = Window.partitionBy("g").orderBy(*order_cols)
        x = df.select(
            "g", "p1", "p2",
            F.sum("p1").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("pre1"),
            F.sum("p2").over(w.rowsBetween(0, Window.unboundedFollowing)).alias("suf2"),
        )
        return x.groupBy("g").agg(
            F.max(F.col("pre1") + F.col("suf2")).alias(label),
            F.sum("p1").alias("sum_p1_" + label),
        )
    jm = makespan(o, [F.col("jkey.grp"), F.col("jkey.a"), F.col("jkey.b"), F.col("o_orderkey")], "johnson_makespan")
    fm = makespan(o, [F.col("o_orderdate"), F.col("o_orderkey")], "fifo_makespan")
    j = jm.join(fm, "g").select(
        F.col("g").alias("o_custkey"),
        "johnson_makespan", "fifo_makespan",
        F.expr(
            "CAST(div(1000000 * (fifo_makespan - johnson_makespan), fifo_makespan)"
            " AS BIGINT)"
        ).alias("saving_ppm"),
    )
    return j.repartition(1).sortWithinPartitions("o_custkey")


def johnson_schedule_sql() -> str:
    return """
WITH li AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS p1
  FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT o_custkey AS g, o_orderkey, o_orderdate, p1,
         CAST(round(o_totalprice * 100) AS BIGINT) // 1000 AS p2,
         CASE WHEN p1 <= CAST(round(o_totalprice * 100) AS BIGINT) // 1000 THEN 0 ELSE 1 END AS grp,
         CASE WHEN p1 <= CAST(round(o_totalprice * 100) AS BIGINT) // 1000
              THEN p1 ELSE -(CAST(round(o_totalprice * 100) AS BIGINT) // 1000) END AS ka,
         CASE WHEN p1 <= CAST(round(o_totalprice * 100) AS BIGINT) // 1000
              THEN -(CAST(round(o_totalprice * 100) AS BIGINT) // 1000) ELSE p1 END AS kb
  FROM orders JOIN li ON l_orderkey = o_orderkey
),
jm AS (
  SELECT g, MAX(pre1 + suf2) AS johnson_makespan
  FROM (
    SELECT g,
           SUM(p1) OVER (PARTITION BY g ORDER BY grp, ka, kb, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre1,
           SUM(p2) OVER (PARTITION BY g ORDER BY grp, ka, kb, o_orderkey
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suf2
    FROM o
  ) GROUP BY g
),
fm AS (
  SELECT g, MAX(pre1 + suf2) AS fifo_makespan
  FROM (
    SELECT g,
           SUM(p1) OVER (PARTITION BY g ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre1,
           SUM(p2) OVER (PARTITION BY g ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS suf2
    FROM o
  ) GROUP BY g
)
SELECT jm.g AS o_custkey,
       CAST(johnson_makespan AS BIGINT) AS johnson_makespan,
       CAST(fifo_makespan AS BIGINT) AS fifo_makespan,
       CAST((1000000 * (fifo_makespan - johnson_makespan)) // fifo_makespan AS BIGINT) AS saving_ppm
FROM jm JOIN fm ON fm.g = jm.g
ORDER BY o_custkey
"""


# --- D'Hondt highest-averages apportionment vs Hamilton -------------------------


def dhondt_seats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D'Hondt highest-averages apportionment (the divisor method of
    most parliamentary systems) against Hamilton largest-remainder on
    the same monthly revenue: a supplier's D'Hondt seats are how many
    of its quotients rev/1, rev/2, ... land in the month's top-100
    quotients (IEEE-double quotient ordering with (supplier, divisor)
    tie-break — both engines sort the identical doubles, so the rank
    is reproducible bit-for-bit), and the audit counts months where
    the two methods hand a supplier different seat counts — the
    divisor-vs-remainder bias (D'Hondt favors large parties) made
    exact.

    Scale shape: a bounded 100-divisor explode per (supplier, month)
    + one month-key rank window + the Hamilton windows — all
    month-local."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)")).alias("rev")
    )
    quot = monthly.select(
        "l_suppkey", "m", "rev",
        F.explode(F.expr(f"sequence(1, {_APP_SEATS})")).alias("d"),
    ).select(
        "l_suppkey", "m", "d",
        (F.col("rev").cast("double") / F.col("d")).alias("q"),
    )
    wq = Window.partitionBy("m").orderBy(
        F.col("q").desc(), F.col("l_suppkey"), F.col("d")
    )
    dh = (
        quot.select("l_suppkey", "m", F.row_number().over(wq).alias("rk"))
        .where(F.col("rk") <= _APP_SEATS)
        .groupBy("l_suppkey", "m")
        .agg(F.count(F.lit(1)).alias("dhondt"))
    )
    tot = monthly.groupBy("m").agg(F.sum("rev").alias("total"))
    base = monthly.join(tot, "m")
    q = F.expr(f"div({_APP_SEATS} * rev, total)")
    r = F.expr(f"({_APP_SEATS} * rev) % total")
    hx = base.select(
        "m", "l_suppkey", q.alias("q"), r.alias("r"),
        (F.lit(_APP_SEATS) - F.sum(q).over(Window.partitionBy("m"))).alias("bonus"),
    )
    wr = Window.partitionBy("m").orderBy(F.col("r").desc(), "l_suppkey")
    ham = hx.select(
        "m", "l_suppkey",
        (
            F.col("q")
            + F.when(F.row_number().over(wr) <= F.col("bonus"), 1).otherwise(0)
        ).alias("hamilton"),
    )
    j = ham.join(dh, ["m", "l_suppkey"], "left").select(
        "m", "l_suppkey", "hamilton",
        F.coalesce(F.col("dhondt"), F.lit(0)).alias("dhondt"),
    )
    return (
        j.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_months"),
            F.sum("hamilton").alias("hamilton_seats"),
            F.sum("dhondt").alias("dhondt_seats"),
            F.sum(
                F.when(F.col("hamilton") != F.col("dhondt"), 1).otherwise(0)
            ).alias("months_disagree"),
        )
        .repartition(1)
        .sortWithinPartitions("l_suppkey")
    )


def dhondt_seats_sql() -> str:
    return f"""
WITH monthly AS (
  SELECT l_suppkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(round(100 * l_extendedprice) AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_suppkey, m
),
quot AS (
  SELECT l_suppkey, m, d, CAST(rev AS DOUBLE) / d AS q
  FROM monthly, unnest(range(1, {_APP_SEATS + 1})) t(d)
),
dh AS (
  SELECT l_suppkey, m, COUNT(*) AS dhondt
  FROM (
    SELECT l_suppkey, m,
           row_number() OVER (PARTITION BY m ORDER BY q DESC, l_suppkey, d) AS rk
    FROM quot
  ) WHERE rk <= {_APP_SEATS}
  GROUP BY l_suppkey, m
),
tot AS (SELECT m, SUM(rev) AS total FROM monthly GROUP BY m),
base AS (SELECT monthly.*, total FROM monthly JOIN tot USING (m)),
hx AS (
  SELECT m, l_suppkey,
         ({_APP_SEATS} * rev) // total AS q,
         ({_APP_SEATS} * rev) % total AS r,
         {_APP_SEATS} - SUM(({_APP_SEATS} * rev) // total) OVER (PARTITION BY m) AS bonus
  FROM base
),
ham AS (
  SELECT m, l_suppkey,
         q + CASE WHEN row_number() OVER (PARTITION BY m ORDER BY r DESC, l_suppkey)
                       <= bonus THEN 1 ELSE 0 END AS hamilton
  FROM hx
),
j AS (
  SELECT ham.m, ham.l_suppkey, hamilton, COALESCE(dhondt, 0) AS dhondt
  FROM ham LEFT JOIN dh ON dh.m = ham.m AND dh.l_suppkey = ham.l_suppkey
)
SELECT l_suppkey,
       COUNT(*) AS n_months,
       CAST(SUM(hamilton) AS BIGINT) AS hamilton_seats,
       CAST(SUM(dhondt) AS BIGINT) AS dhondt_seats,
       CAST(SUM(CASE WHEN hamilton != dhondt THEN 1 ELSE 0 END) AS BIGINT) AS months_disagree
FROM j GROUP BY l_suppkey ORDER BY l_suppkey
"""


# --- exact expected maximum of two draws (order statistics) ---------------------


def max2_expectation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact expected maximum of two uniform draws from the empirical
    order-value distribution (the order-statistics identity
    E[max2] = sum v * (F(v)^2 - F(v-)^2) / n^2, with the difference
    of squares expanded to c*(F + F_prev) so everything stays int64):
    the auction/pricing primitive ('expected best of two quotes')
    evaluated without sampling, plus the plain mean for contrast —
    numerator/denominator exact, floored cents alongside.

    Scale shape: one value census + one cumulative window over the
    distinct-value table — distribution-sized, not row-sized."""
    o = _t(spark, sf_dir, "orders")
    dist = o.groupBy(
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy("v")
    x = dist.select(
        "v", "c",
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cf"),
    ).select(
        "v", "c", "cf", (F.col("cf") - F.col("c")).alias("cf_prev")
    )
    return x.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("v") * F.col("c")).alias("sum_v"),
        F.sum(F.col("v") * F.col("c") * (F.col("cf") + F.col("cf_prev"))).alias(
            "e2_num"
        ),
    ).select(
        "n", "sum_v", "e2_num",
        (F.col("n") * F.col("n")).alias("e2_den"),
        F.expr("CAST(div(sum_v, n) AS BIGINT)").alias("mean_cents"),
        F.expr("CAST(div(e2_num, n * n) AS BIGINT)").alias("emax2_cents"),
    )


def max2_expectation_sql() -> str:
    return """
WITH dist AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v, COUNT(*) AS c
  FROM orders GROUP BY 1
),
x AS (
  SELECT v, c,
         SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cf
  FROM dist
)
SELECT CAST(SUM(c) AS BIGINT) AS n,
       CAST(SUM(v * c) AS BIGINT) AS sum_v,
       CAST(SUM(v * c * (cf + cf - c)) AS BIGINT) AS e2_num,
       CAST(SUM(c) * SUM(c) AS BIGINT) AS e2_den,
       CAST(SUM(v * c) // SUM(c) AS BIGINT) AS mean_cents,
       CAST(SUM(v * c * (cf + cf - c)) // (SUM(c) * SUM(c)) AS BIGINT) AS emax2_cents
FROM x
"""


# --- Soundex phonetic blocking census -------------------------------------------

_SOUNDEX_MAP = (
    ("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
    ("l", "4"), ("mn", "5"), ("r", "6"),
)


def _soundex_code_case(ch: str) -> str:
    """Shared CASE expression text mapping a 1-char column to its
    Soundex digit ('0' for vowels/h/w: the separator class)."""
    whens = " ".join(
        f"WHEN {ch} IN ({', '.join(repr(c) for c in grp)}) THEN {d}"
        for grp, d in _SOUNDEX_MAP
    )
    return f"(CASE {whens} ELSE 0 END)"


def soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic blocking census (the 1918 Russell/Odell code,
    still the default blocking key of record-linkage systems): each
    part's second name word is coded from scratch — first letter +
    the first three nonzero digits after collapsing adjacent equal
    codes (simplified Soundex: no h/w bridging, documented deviation),
    zero-padded — and the census reports per code its block size, the
    candidate pair count C(n,2) a linkage join would generate, and a
    partkey checksum. Blocking-cost analysis with zero library
    dependence: the code is built from a positional explode + one lag
    window, identical in both engines.

    Scale shape: bounded per-word explode (word length), one word-key
    lag window, one code census."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.lower(F.element_at(F.split(F.col("p_name"), " "), 2)).alias("w"),
    )
    pos = p.select(
        "p_partkey", "w",
        F.explode(F.expr("sequence(1, length(w))")).alias("i"),
    ).select(
        "p_partkey", "w", "i",
        F.expr(_soundex_code_case("substring(w, CAST(i AS INT), 1)")).alias("code"),
    )
    wlag = Window.partitionBy("p_partkey").orderBy("i")
    kept = pos.select(
        "p_partkey", "w", "i", "code",
        F.lag("code").over(wlag).alias("prev"),
    ).where(
        (F.col("i") > 1) & (F.col("code") > 0)
        & (F.col("prev").isNull() | (F.col("code") != F.col("prev")))
    )
    wrk = Window.partitionBy("p_partkey").orderBy("i")
    digits = (
        kept.select("p_partkey", "i", "code", F.row_number().over(wrk).alias("rk"))
        .where(F.col("rk") <= 3)
        .groupBy("p_partkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "code"))),
                    lambda s: s["code"].cast("string"),
                ),
                "",
            ).alias("dg")
        )
    )
    sx = p.join(digits, "p_partkey", "left").select(
        "p_partkey",
        F.concat(
            F.upper(F.substring("w", 1, 1)),
            F.rpad(F.coalesce(F.col("dg"), F.lit("")), 3, "0"),
        ).alias("soundex"),
    )
    return (
        sx.groupBy("soundex")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.expr("div(count(1) * (count(1) - 1), 2)").alias("block_pairs"),
            F.sum("p_partkey").alias("part_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("soundex")
    )


def soundex_blocking_sql() -> str:
    code = _soundex_code_case("substring(w, CAST(i AS INT), 1)")
    return f"""
WITH p AS (
  SELECT p_partkey, lower(string_split(p_name, ' ')[2]) AS w FROM part
),
pos AS (
  SELECT p_partkey, w, i, {code} AS code
  FROM p, unnest(range(1, length(w) + 1)) t(i)
),
kept AS (
  SELECT p_partkey, i, code,
         lag(code) OVER (PARTITION BY p_partkey ORDER BY i) AS prev
  FROM pos
  QUALIFY i > 1 AND code > 0 AND (prev IS NULL OR code != prev)
),
digits AS (
  SELECT p_partkey, string_agg(CAST(code AS VARCHAR), '' ORDER BY i) AS dg
  FROM (
    SELECT p_partkey, i, code,
           row_number() OVER (PARTITION BY p_partkey ORDER BY i) AS rk
    FROM kept
  ) WHERE rk <= 3
  GROUP BY p_partkey
),
sx AS (
  SELECT p.p_partkey,
         upper(substring(w, 1, 1)) || rpad(COALESCE(dg, ''), 3, '0') AS soundex
  FROM p LEFT JOIN digits ON digits.p_partkey = p.p_partkey
)
SELECT soundex, COUNT(*) AS n_parts,
       CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS block_pairs,
       CAST(SUM(p_partkey) AS BIGINT) AS part_checksum
FROM sx GROUP BY soundex ORDER BY soundex
"""


# --- greedy-density knapsack vs the exact lattice --------------------------------


def knapsack_greedy_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-by-density knapsack vs the exact optimum (the
    approximation-quality audit textbooks hand-wave and this census
    measures): on the same per-customer instances as knapsack_census
    (<= 8 orders, budget = half the units), greedy takes orders in
    decreasing value/weight density — ppm-scaled integer density with
    a deterministic (value, weight) tie-break, no float — skipping
    any that no longer fit is NOT prefix-expressible, so greedy is the
    take-while-it-fits PREFIX rule (first-fit-by-density, the
    streaming variant), and the gap to the exhaustive optimum is
    reported in ppm with a per-customer optimality flag.

    Scale shape: a customer-key density-sort window + prefix sums
    against the knapsack_census lattice — both customer-local."""
    li = _t(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("wt")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_custkey", "o_orderkey", "o_orderdate", "wt",
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("v"),
        )
    )
    wn = Window.partitionBy("o_custkey")
    ranked = o.select(
        "o_custkey", "wt", "v",
        F.count(F.lit(1)).over(wn).alias("n"),
        F.expr("div(sum(wt) OVER (PARTITION BY o_custkey), 2)").alias("budget"),
    ).where(F.col("n") <= 8)
    # density sort: v/wt desc == order by (v * 10^6) div wt desc with
    # (v, orderkey-free) tie-break on exact cross-mult not needed per
    # row ordering: use scaled integer density + exact tie-breaks
    dens = ranked.select(
        "o_custkey", "wt", "v", "budget",
        F.expr("div(1000000 * v, wt)").alias("density"),
    )
    wd = Window.partitionBy("o_custkey").orderBy(
        F.col("density").desc(), F.col("v").desc(), F.col("wt")
    )
    pre = dens.select(
        "o_custkey", "v", "budget",
        F.sum("wt").over(wd.rowsBetween(Window.unboundedPreceding, 0)).alias("wsum"),
    )
    greedy = (
        pre.where(F.col("wsum") <= F.col("budget"))
        .groupBy("o_custkey")
        .agg(F.sum("v").alias("greedy_value"))
    )
    exact = knapsack_census(spark, sf_dir).select(
        "o_custkey", "n_orders", "best_value_cents"
    )
    return (
        exact.join(greedy, "o_custkey", "left")
        .select(
            "o_custkey", "n_orders", "best_value_cents",
            F.coalesce(F.col("greedy_value"), F.lit(0)).alias("greedy_value"),
            F.expr(
                "CAST(CASE WHEN best_value_cents > 0 THEN"
                " div(1000000 * (best_value_cents - coalesce(greedy_value, 0)),"
                " best_value_cents) ELSE 0 END AS BIGINT)"
            ).alias("gap_ppm"),
            F.when(
                F.coalesce(F.col("greedy_value"), F.lit(0))
                == F.col("best_value_cents"),
                1,
            ).otherwise(0).cast("int").alias("greedy_optimal"),
        )
        .repartition(1)
        .sortWithinPartitions("o_custkey")
    )


def knapsack_greedy_gap_sql() -> str:
    exact = knapsack_census_sql().strip().rstrip()
    # reuse the full exact-lattice statement as a subquery
    return f"""
WITH li AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS wt
  FROM lineitem GROUP BY l_orderkey
),
o AS (
  SELECT o_custkey, o_orderkey, o_orderdate, wt,
         CAST(round(o_totalprice * 100) AS BIGINT) AS v
  FROM orders JOIN li ON l_orderkey = o_orderkey
),
ranked AS (
  SELECT o_custkey, wt, v,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n,
         SUM(wt) OVER (PARTITION BY o_custkey) // 2 AS budget
  FROM o QUALIFY n <= 8
),
dens AS (
  SELECT o_custkey, wt, v, budget, (1000000 * v) // wt AS density FROM ranked
),
pre AS (
  SELECT o_custkey, v, budget,
         SUM(wt) OVER (PARTITION BY o_custkey
            ORDER BY density DESC, v DESC, wt
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wsum
  FROM dens
),
greedy AS (
  SELECT o_custkey, SUM(v) AS greedy_value
  FROM pre WHERE wsum <= budget GROUP BY o_custkey
),
exact AS (
{exact}
)
SELECT exact.o_custkey, n_orders, best_value_cents,
       CAST(COALESCE(greedy_value, 0) AS BIGINT) AS greedy_value,
       CAST(CASE WHEN best_value_cents > 0 THEN
            (1000000 * (best_value_cents - COALESCE(greedy_value, 0))) // best_value_cents
            ELSE 0 END AS BIGINT) AS gap_ppm,
       CAST(CASE WHEN COALESCE(greedy_value, 0) = best_value_cents THEN 1 ELSE 0 END AS INT) AS greedy_optimal
FROM exact LEFT JOIN greedy ON greedy.o_custkey = exact.o_custkey
ORDER BY exact.o_custkey
"""


# --- randomized response debiasing audit ----------------------------------------


def randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized-response mechanism audit (Warner 1965, the original
    local-differential-privacy estimator): each user's true bit is
    'converted buyer' (any purchase); with a deterministic hash coin
    the user reports TRUTH on heads and a second hash coin on tails.
    E[obs] = n/2 * rate + n/4, so the unbiased estimate of the true
    count is 2*obs - n/2 — audited here EXACTLY: true count, observed
    count, the debiased estimate in quarters (4*est = 8*obs - 2*n, so
    no division at all), and the signed error — the
    privacy-mechanism-vs-utility table a DP rollout publishes.

    Scale shape: one user-key census + single-row arithmetic."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("t")
    )
    from ..operators.textops import h40

    x = users.select(
        "user_id", "t",
        (h40(F.concat(F.lit("rr1:"), F.col("user_id").cast("string"))) % 2).alias("c1"),
        (h40(F.concat(F.lit("rr2:"), F.col("user_id").cast("string"))) % 2).alias("c2"),
    ).select(
        "t",
        F.when(F.col("c1") == 1, F.col("t")).otherwise(F.col("c2")).alias("resp"),
    )
    return x.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("t").alias("true_count"),
        F.sum("resp").alias("observed"),
    ).select(
        "n_users", "true_count", "observed",
        (F.lit(8) * F.col("observed") - F.lit(2) * F.col("n_users")).alias(
            "estimate_x4"
        ),
        (
            F.lit(8) * F.col("observed")
            - F.lit(2) * F.col("n_users")
            - F.lit(4) * F.col("true_count")
        ).alias("error_x4"),
    )


def randomized_response_sql() -> str:
    h1 = "CAST('0x' || substring(md5('rr1:' || CAST(user_id AS VARCHAR)), 1, 10) AS BIGINT) % 2"
    h2 = "CAST('0x' || substring(md5('rr2:' || CAST(user_id AS VARCHAR)), 1, 10) AS BIGINT) % 2"
    return f"""
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS t
  FROM events GROUP BY user_id
),
x AS (
  SELECT t,
         CASE WHEN {h1} = 1 THEN t ELSE {h2} END AS resp
  FROM users
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(t) AS BIGINT) AS true_count,
       CAST(SUM(resp) AS BIGINT) AS observed,
       CAST(8 * SUM(resp) - 2 * COUNT(*) AS BIGINT) AS estimate_x4,
       CAST(8 * SUM(resp) - 2 * COUNT(*) - 4 * SUM(t) AS BIGINT) AS error_x4
FROM x
"""


# --- ABC-XYZ inventory classification matrix ------------------------------------


def abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory matrix (the two-axis SKU segmentation of
    operations planning): ABC by cumulative revenue share — exact
    integer cross-multiplied thresholds at 80% / 95% of total cents,
    rank order by (revenue desc, partkey) — crossed with XYZ demand
    VARIABILITY classes from the zero-filled monthly quantity series:
    the squared-CV proxy n*sum(q^2)*1e6 / (sum q)^2 - 1e6 in exact
    ppm, X <= 250000 (cv <= 0.5), Y <= 1000000, else Z.  The 9-cell
    census (parts, revenue, units per cell) is the stock-policy
    planning table, floats nowhere.

    Scale shape: one part census + one global revenue-rank window +
    one month-grid zero-fill — the ABC window is the only global
    sort, over the part dimension (not the fact rows)."""
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)")).alias("rev"),
        F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("units"),
    )
    wcum = Window.orderBy(F.col("rev").desc(), "l_partkey")
    tot = Window.partitionBy()
    abc = per_part.select(
        "l_partkey", "rev", "units",
        F.sum("rev").over(wcum.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("rev").over(tot).alias("total"),
    ).select(
        "l_partkey", "rev", "units",
        F.when(F.lit(100) * F.col("cum") <= F.lit(80) * F.col("total"), "A")
        .when(F.lit(100) * F.col("cum") <= F.lit(95) * F.col("total"), "B")
        .otherwise("C")
        .alias("abc"),
    )
    monthly = li.groupBy(
        "l_partkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(F.sum(F.expr("CAST(l_quantity AS BIGINT)")).alias("q"))
    months = monthly.select("m").distinct()
    grid = per_part.select("l_partkey").crossJoin(months)
    filled = grid.join(monthly, ["l_partkey", "m"], "left").select(
        "l_partkey", F.coalesce(F.col("q"), F.lit(0)).alias("q")
    )
    vari = filled.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("nm"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
    ).select(
        "l_partkey",
        F.expr(
            "CASE WHEN sq = 0 THEN 2000000"
            " ELSE div(1000000 * nm * sq2, sq * sq) - 1000000 END"
        ).alias("cv2_ppm"),
    ).select(
        "l_partkey",
        F.when(F.col("cv2_ppm") <= 250000, "X")
        .when(F.col("cv2_ppm") <= 1000000, "Y")
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(vari, "l_partkey")
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").alias("revenue_cents"),
            F.sum("units").alias("units"),
        )
        .repartition(1)
        .sortWithinPartitions("abc", "xyz")
    )


def abc_xyz_sql() -> str:
    return """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(round(100 * l_extendedprice) AS BIGINT)) AS rev,
         SUM(CAST(l_quantity AS BIGINT)) AS units
  FROM lineitem GROUP BY l_partkey
),
abc AS (
  SELECT l_partkey, rev, units,
         CASE WHEN 100 * SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                <= 80 * SUM(rev) OVER () THEN 'A'
              WHEN 100 * SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                <= 95 * SUM(rev) OVER () THEN 'B'
              ELSE 'C' END AS abc
  FROM per_part
),
monthly AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(l_quantity AS BIGINT)) AS q
  FROM lineitem GROUP BY l_partkey, m
),
months AS (SELECT DISTINCT m FROM monthly),
grid AS (SELECT l_partkey, m FROM per_part CROSS JOIN months),
filled AS (
  SELECT grid.l_partkey, COALESCE(q, 0) AS q
  FROM grid LEFT JOIN monthly ON monthly.l_partkey = grid.l_partkey AND monthly.m = grid.m
),
vari AS (
  SELECT l_partkey,
         CASE WHEN SUM(q) = 0 THEN 2000000
              ELSE (1000000 * COUNT(*) * SUM(q * q)) // (SUM(q) * SUM(q)) - 1000000
         END AS cv2_ppm
  FROM filled GROUP BY l_partkey
),
xyz AS (
  SELECT l_partkey,
         CASE WHEN cv2_ppm <= 250000 THEN 'X'
              WHEN cv2_ppm <= 1000000 THEN 'Y' ELSE 'Z' END AS xyz
  FROM vari
)
SELECT abc, xyz, COUNT(*) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS revenue_cents,
       CAST(SUM(units) AS BIGINT) AS units
FROM abc JOIN xyz USING (l_partkey)
GROUP BY abc, xyz ORDER BY abc, xyz
"""


# --- t-closeness privacy audit (exact EMD) --------------------------------------


def t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007 — the
    third rung after k-anonymity and l-diversity): for each
    quasi-identifier group (market segment, order year), the Earth
    Mover's Distance between the group's order-status distribution
    and the global one, over the ordered status alphabet, computed
    EXACTLY: EMD = sum over statuses of |cumulative difference|, with
    fractions cleared to the common denominator n_g * n_total — the
    numerator sum(|cum_g * N - cum_N * n_g|) and denominator
    (m-1) * n_g * N reported as integers plus their floor-divided
    ppm. The release gate that catches groups whose sensitive-value
    MIX leaks even when l-diversity passes.

    Scale shape: one (QI, status) census + a status-ordered cumsum
    window per group + the global census broadcast by join — all
    small keys."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        "c_mktsegment",
        F.year("o_orderdate").alias("o_year"),
        "o_orderstatus",
    )
    per = j.groupBy("c_mktsegment", "o_year", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cg")
    )
    glob = j.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cn"))
    m = glob.agg(
        F.count(F.lit(1)).alias("m"), F.sum("cn").alias("nn")
    )
    grp_tot = per.groupBy("c_mktsegment", "o_year").agg(F.sum("cg").alias("ng"))
    # status grid per group (zero-fill absent statuses)
    grid = grp_tot.crossJoin(glob.select("o_orderstatus", "cn"))
    filled = grid.join(
        per, ["c_mktsegment", "o_year", "o_orderstatus"], "left"
    ).select(
        "c_mktsegment", "o_year", "o_orderstatus", "ng", "cn",
        F.coalesce(F.col("cg"), F.lit(0)).alias("cg"),
    )
    wcum = (
        Window.partitionBy("c_mktsegment", "o_year")
        .orderBy("o_orderstatus")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = filled.select(
        "c_mktsegment", "o_year", "ng",
        F.sum("cg").over(wcum).alias("cum_g"),
        F.sum("cn").over(wcum).alias("cum_n"),
    )
    agg = cums.crossJoin(m).groupBy("c_mktsegment", "o_year").agg(
        F.max("ng").alias("group_size"),
        F.sum(
            F.abs(F.col("cum_g") * F.col("nn") - F.col("cum_n") * F.col("ng"))
        ).alias("emd_num"),
        (F.max(F.col("m") - 1) * F.max("ng") * F.max("nn")).alias("emd_den"),
    )
    return (
        agg.select(
            "c_mktsegment", "o_year", "group_size", "emd_num", "emd_den",
            F.expr("CAST(div(1000000 * emd_num, emd_den) AS BIGINT)").alias(
                "t_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("c_mktsegment", "o_year")
    )


def t_closeness_sql() -> str:
    return """
WITH j AS (
  SELECT c_mktsegment, EXTRACT(year FROM o_orderdate) AS o_year, o_orderstatus
  FROM orders JOIN customer ON c_custkey = o_custkey
),
per AS (
  SELECT c_mktsegment, o_year, o_orderstatus, COUNT(*) AS cg
  FROM j GROUP BY ALL
),
gstat AS (SELECT o_orderstatus, COUNT(*) AS cn FROM j GROUP BY o_orderstatus),
m AS (SELECT COUNT(*) AS m, SUM(cn) AS nn FROM gstat),
grp_tot AS (
  SELECT c_mktsegment, o_year, SUM(cg) AS ng FROM per GROUP BY ALL
),
filled AS (
  SELECT g.c_mktsegment, g.o_year, s.o_orderstatus, g.ng, s.cn,
         COALESCE(per.cg, 0) AS cg
  FROM grp_tot g CROSS JOIN gstat s
  LEFT JOIN per ON per.c_mktsegment = g.c_mktsegment
   AND per.o_year = g.o_year AND per.o_orderstatus = s.o_orderstatus
),
cums AS (
  SELECT c_mktsegment, o_year, ng,
         SUM(cg) OVER (PARTITION BY c_mktsegment, o_year ORDER BY o_orderstatus
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g,
         SUM(cn) OVER (PARTITION BY c_mktsegment, o_year ORDER BY o_orderstatus
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
  FROM filled
)
SELECT c_mktsegment, CAST(o_year AS INT) AS o_year,
       CAST(MAX(ng) AS BIGINT) AS group_size,
       CAST(SUM(abs(cum_g * nn - cum_n * ng)) AS BIGINT) AS emd_num,
       CAST(MAX(m - 1) * MAX(ng) * MAX(nn) AS BIGINT) AS emd_den,
       CAST((1000000 * SUM(abs(cum_g * nn - cum_n * ng)))
            // (MAX(m - 1) * MAX(ng) * MAX(nn)) AS BIGINT) AS t_ppm
FROM cums, m GROUP BY c_mktsegment, o_year
ORDER BY c_mktsegment, o_year
"""


# --- sort-key layout what-if: pruning ROI of re-clustering ----------------------


def layout_whatif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-key layout what-if (the re-clustering ROI table behind
    every OPTIMIZE ... ZORDER decision): the SAME shipdate-range
    predicates are priced against zone maps of TWO physical layouts —
    ingestion order (row groups by orderkey ranges) vs shipdate-sorted
    (row groups by shipdate rank ranges) — reporting per predicate and
    layout the groups kept and rows scanned, exactly.  The sorted
    layout's scan fraction approaches predicate selectivity; the
    ingestion layout scans nearly everything: that gap, in ppm, is
    the re-clustering payoff quantified before anyone rewrites 100 TB.

    Scale shape: one rank window (the simulated re-sort) + two
    group-stats censuses + a tiny predicate sweep."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    both = li.select(
        "l_shipdate",
        F.expr("div(l_orderkey, 512)").alias("rg_ingest"),
        F.expr("div(row_number() OVER (ORDER BY l_shipdate, l_orderkey) - 1, 2048)").alias(
            "rg_sorted"
        ),
    )
    preds = [
        ("y1993", "1993-01-01", "1994-01-01"),
        ("y1995h1", "1995-01-01", "1995-07-01"),
        ("y1997q1", "1997-01-01", "1997-04-01"),
    ]

    def stats(col, layout):
        g = both.groupBy(F.col(col).alias("rg")).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("l_shipdate").alias("lo"),
            F.max("l_shipdate").alias("hi"),
        )
        rows = []
        for name, a, b in preds:
            agg = g.agg(
                    F.count(F.lit(1)).alias("n_groups"),
                    F.sum(
                        F.expr(
                            f"CASE WHEN hi >= TIMESTAMP '{a} 00:00:00'"
                            f" AND lo < TIMESTAMP '{b} 00:00:00' THEN 1 ELSE 0 END"
                        )
                    ).alias("kept_groups"),
                    F.sum(
                        F.expr(
                            f"CASE WHEN hi >= TIMESTAMP '{a} 00:00:00'"
                            f" AND lo < TIMESTAMP '{b} 00:00:00' THEN n_rows ELSE 0 END"
                        )
                    ).alias("rows_scanned"),
                    F.sum("n_rows").alias("rows_total"),
            )
            rows.append(
                agg.select(
                    F.lit(layout).alias("layout"), F.lit(name).alias("pred"), "*"
                )
            )
        out = rows[0]
        for r in rows[1:]:
            out = out.unionByName(r)
        return out
    u = stats("rg_ingest", "ingest").unionByName(stats("rg_sorted", "sorted"))
    return (
        u.select(
            "layout", "pred", "n_groups", "kept_groups", "rows_scanned",
            "rows_total",
            F.expr("CAST(div(1000000 * rows_scanned, rows_total) AS BIGINT)").alias(
                "scan_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("layout", "pred")
    )


def layout_whatif_sql() -> str:
    preds = [
        ("y1993", "1993-01-01", "1994-01-01"),
        ("y1995h1", "1995-01-01", "1995-07-01"),
        ("y1997q1", "1997-01-01", "1997-04-01"),
    ]

    def block(col, layout):
        parts = []
        for name, a, b in preds:
            parts.append(f"""
  SELECT '{layout}' AS layout, '{name}' AS pred,
         COUNT(*) AS n_groups,
         SUM(CASE WHEN hi >= TIMESTAMP '{a} 00:00:00'
                   AND lo < TIMESTAMP '{b} 00:00:00' THEN 1 ELSE 0 END) AS kept_groups,
         SUM(CASE WHEN hi >= TIMESTAMP '{a} 00:00:00'
                   AND lo < TIMESTAMP '{b} 00:00:00' THEN n_rows ELSE 0 END) AS rows_scanned,
         SUM(n_rows) AS rows_total
  FROM g_{col}""")
        return "\n  UNION ALL\n".join(parts)
    return f"""
WITH both_ AS (
  SELECT l_shipdate,
         l_orderkey // 512 AS rg_ingest,
         (row_number() OVER (ORDER BY l_shipdate, l_orderkey) - 1) // 2048 AS rg_sorted
  FROM lineitem
),
g_rg_ingest AS (
  SELECT rg_ingest AS rg, COUNT(*) AS n_rows,
         MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi
  FROM both_ GROUP BY rg_ingest
),
g_rg_sorted AS (
  SELECT rg_sorted AS rg, COUNT(*) AS n_rows,
         MIN(l_shipdate) AS lo, MAX(l_shipdate) AS hi
  FROM both_ GROUP BY rg_sorted
),
u AS (
{block('rg_ingest', 'ingest')}
  UNION ALL
{block('rg_sorted', 'sorted')}
)
SELECT layout, pred, CAST(n_groups AS BIGINT) AS n_groups,
       CAST(kept_groups AS BIGINT) AS kept_groups,
       CAST(rows_scanned AS BIGINT) AS rows_scanned,
       CAST(rows_total AS BIGINT) AS rows_total,
       CAST((1000000 * rows_scanned) // rows_total AS BIGINT) AS scan_ppm
FROM u ORDER BY layout, pred
"""


# --- item-item squared-cosine similarity on the co-purchase graph ---------------

_IC_MIN_CO = 3


def item_cosine2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item cosine similarity on co-purchase counts WITHOUT the
    square root (the recsys neighborhood model of Sarwar et al. 2001,
    ranked by the exact SQUARED cosine in ppm: cos^2 = 1e6*c_ij^2 /
    (c_i*c_j) is monotone in cosine, so top-k and thresholds agree
    bit-for-bit while staying integer): per part pair sharing >= 3
    orders, the co-count, each part's order count, and cos2_ppm —
    the 'customers also bought' table with exact arithmetic.

    Scale shape: order-key self-join bounded by basket size, one
    pair census, broadcast part-count joins — the classic item-item
    shape with no floats."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    cnt = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    co = (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("cij"))
        .where(F.col("cij") >= _IC_MIN_CO)
    )
    ca = cnt.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))
    cb = cnt.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))
    return (
        co.join(ca, "pa").join(cb, "pb")
        .select(
            "pa", "pb", "cij", "ca", "cb",
            F.expr("CAST(div(1000000 * cij * cij, ca * cb) AS BIGINT)").alias(
                "cos2_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("pa", "pb")
    )


def item_cosine2_sql() -> str:
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
cnt AS (SELECT l_partkey, COUNT(*) AS c FROM li GROUP BY l_partkey),
co AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS cij
  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY pa, pb HAVING COUNT(*) >= {_IC_MIN_CO}
)
SELECT pa, pb, CAST(cij AS BIGINT) AS cij,
       CAST(ca.c AS BIGINT) AS ca, CAST(cb.c AS BIGINT) AS cb,
       CAST((1000000 * cij * cij) // (ca.c * cb.c) AS BIGINT) AS cos2_ppm
FROM co JOIN cnt ca ON ca.l_partkey = pa JOIN cnt cb ON cb.l_partkey = pb
ORDER BY pa, pb
"""


# --- NPV census with a shared integer discount table ----------------------------

# Monthly discount factors at 1%/month in parts-per-billion, computed
# once HERE by integer recurrence f_k = (f_{k-1} * 100) // 101 and
# embedded verbatim in both engines' queries — no pow(), no float, no
# cross-engine libm drift.
_NPV_MONTHS = 96
_NPV_PPB = [10**9]
for _ in range(_NPV_MONTHS - 1):
    _NPV_PPB.append(_NPV_PPB[-1] * 100 // 101)


def npv_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-present-value census with an INTEGER discount table: every
    order discounts at 1%/month from the corpus's first order month,
    factors from the shared parts-per-billion recurrence table (same
    constants in both engines, so libm pow() drift can't split them);
    per customer the undiscounted cents, the NPV in cents (floored
    per-order: div(cents * f_k, 1e9)), and the discount haircut in
    ppm — the cohort-value table finance reads, exact.

    Scale shape: month index is closed-form date math; the factor
    table is a broadcast 96-row array lookup; one customer census."""
    o = _t(spark, sf_dir, "orders")
    t0 = o.agg(F.min(F.date_trunc("month", "o_orderdate")).alias("m0"))
    arr = F.array(*[F.lit(v) for v in _NPV_PPB])
    x = o.crossJoin(t0).select(
        "o_custkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.least(
            F.expr(
                "CAST(months_between(date_trunc('month', o_orderdate), m0) AS INT)"
            ),
            F.lit(_NPV_MONTHS - 1),
        ).alias("k"),
    ).select(
        "o_custkey", "cents",
        F.element_at(arr, F.col("k") + 1).alias("f"),
    )
    return (
        x.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("cents"),
            F.sum(F.expr("div(cents * f, 1000000000)")).alias("npv_cents"),
        )
        .select(
            "o_custkey", "n_orders", "cents", "npv_cents",
            F.expr(
                "CAST(div(1000000 * (cents - npv_cents), cents) AS BIGINT)"
            ).alias("haircut_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("o_custkey")
    )


def npv_census_sql() -> str:
    factors = ", ".join(str(v) for v in _NPV_PPB)
    return f"""
WITH t0 AS (SELECT MIN(date_trunc('month', o_orderdate)) AS m0 FROM orders),
x AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         least(CAST(datediff('month', m0, date_trunc('month', o_orderdate)) AS INT),
               {_NPV_MONTHS - 1}) AS k
  FROM orders, t0
),
f AS (
  SELECT o_custkey, cents, ([{factors}])[k + 1] AS f FROM x
)
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(SUM((cents * f) // 1000000000) AS BIGINT) AS npv_cents,
       CAST((1000000 * (SUM(cents) - SUM((cents * f) // 1000000000))) // SUM(cents) AS BIGINT) AS haircut_ppm
FROM f GROUP BY o_custkey ORDER BY o_custkey
"""


# --- VAT rounding-strategy drift census -----------------------------------------

_VAT_NUM, _VAT_DEN = 7, 100  # 7% tax as an exact fraction


def vat_rounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VAT rounding-strategy drift census (the accounting identity
    every invoicing system must pick a side on: round tax per LINE or
    per INVOICE?): 7% tax on exact line cents, per-line tax =
    half-up-rounded per lineitem then summed, per-invoice tax =
    half-up-rounded once on the order's cent total — both as pure
    integer arithmetic div((7*c*2 + 100), 200) (half-up without any
    float round()), and the census rolls orders up by their drift in
    cents. Auditors read exactly this table.

    Scale shape: one order-key census then one tiny drift census —
    two shuffles, integer arithmetic only."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)").alias("c"),
    )
    hu = f"div({_VAT_NUM} * {{x}} * 2 + {_VAT_DEN}, {2 * _VAT_DEN})"
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.expr(hu.format(x="c"))).alias("tax_by_line"),
        F.sum("c").alias("total_c"),
    ).select(
        "l_orderkey", "tax_by_line",
        F.expr(hu.format(x="total_c")).alias("tax_by_invoice"),
    )
    drift = per_order.select(
        (F.col("tax_by_line") - F.col("tax_by_invoice")).alias("drift_cents"),
        "l_orderkey",
    )
    return (
        drift.groupBy("drift_cents")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("l_orderkey").alias("order_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("drift_cents")
    )


def vat_rounding_sql() -> str:
    hu = f"(({_VAT_NUM} * {{x}} * 2 + {_VAT_DEN}) // {2 * _VAT_DEN})"
    return f"""
WITH li AS (
  SELECT l_orderkey, CAST(round(100 * l_extendedprice) AS BIGINT) AS c
  FROM lineitem
),
per_order AS (
  SELECT l_orderkey,
         SUM({hu.format(x='c')}) AS tax_by_line,
         SUM(c) AS total_c
  FROM li GROUP BY l_orderkey
),
drift AS (
  SELECT l_orderkey,
         tax_by_line - {hu.format(x='total_c')} AS drift_cents
  FROM per_order
)
SELECT CAST(drift_cents AS BIGINT) AS drift_cents,
       COUNT(*) AS n_orders,
       CAST(SUM(l_orderkey) AS BIGINT) AS order_checksum
FROM drift GROUP BY drift_cents ORDER BY drift_cents
"""


# --- inversion / presortedness census -------------------------------------------


def inversions_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presortedness census of the daily-revenue series (the
    adaptive-sorting metrics: exact inversion count |{i<j: v_i>v_j}|,
    its share of all pairs in ppm, and the longest strictly-
    descending run): how far from sorted a time series is decides
    whether a Timsort-style merge or a full sort is worth it; here
    the metric surface is exact.

    Scale shape: the series is a date census (bounded by calendar);
    the inversion pair join is over days^2, not fact rows; the run
    length is one lag window."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("v")
    )
    idx = daily.select(
        F.row_number().over(Window.orderBy("o_orderdate")).alias("i"), "v"
    )
    a = idx.select(F.col("i").alias("ia"), F.col("v").alias("va"))
    b = idx.select(F.col("i").alias("ib"), F.col("v").alias("vb"))
    inv = a.join(
        b, (F.col("ia") < F.col("ib")) & (F.col("va") > F.col("vb"))
    ).agg(F.count(F.lit(1)).alias("inversions"))
    wrun = Window.orderBy("i")
    runs = idx.select(
        "i", "v",
        F.when(
            F.lag("v").over(wrun).isNull() | (F.lag("v").over(wrun) <= F.col("v")), 1
        ).otherwise(0).alias("brk"),
    ).select(
        "*",
        F.sum("brk").over(
            wrun.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("run_id"),
    )
    longest = (
        runs.groupBy("run_id").agg(F.count(F.lit(1)).alias("rl"))
        .agg(F.max("rl").alias("longest_desc_run"))
    )
    n = idx.agg(F.count(F.lit(1)).alias("n_days"))
    one = n.crossJoin(inv).crossJoin(longest)
    return one.select(
        "n_days", "inversions", "longest_desc_run",
        F.expr(
            "CAST(div(1000000 * inversions, div(n_days * (n_days - 1), 2))"
            " AS BIGINT)"
        ).alias("inversion_ppm"),
    )


def inversions_census_sql() -> str:
    return """
WITH daily AS (
  SELECT o_orderdate, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
  FROM orders GROUP BY o_orderdate
),
idx AS (
  SELECT row_number() OVER (ORDER BY o_orderdate) AS i, v FROM daily
),
inv AS (
  SELECT COUNT(*) AS inversions
  FROM idx a JOIN idx b ON a.i < b.i AND a.v > b.v
),
brk AS (
  SELECT i, v,
         CASE WHEN lag(v) OVER (ORDER BY i) IS NULL
                OR lag(v) OVER (ORDER BY i) <= v THEN 1 ELSE 0 END AS b
  FROM idx
),
runs AS (
  SELECT i, v,
         SUM(b) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM brk
),
longest AS (
  SELECT MAX(rl) AS longest_desc_run
  FROM (SELECT run_id, COUNT(*) AS rl FROM runs GROUP BY run_id)
),
n AS (SELECT COUNT(*) AS n_days FROM idx)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(inversions AS BIGINT) AS inversions,
       CAST(longest_desc_run AS BIGINT) AS longest_desc_run,
       CAST((1000000 * inversions) // (n_days * (n_days - 1) // 2) AS BIGINT) AS inversion_ppm
FROM n, inv, longest
"""


# --- stationary distribution of the full event-type chain (exact Cramer) --------

_SD_STATES = ("click", "error", "purchase", "signup", "view")


def _detn_str(m) -> str:
    """Cofactor-expansion determinant expression for an NxN matrix of
    SQL expression strings (shared text across engines)."""
    n = len(m)
    if n == 1:
        return f"({m[0][0]})"
    if n == 2:
        return f"(({m[0][0]})*({m[1][1]}) - ({m[0][1]})*({m[1][0]}))"
    terms = []
    for j in range(n):
        minor = [[m[r][c] for c in range(n) if c != j] for r in range(1, n)]
        sign = "+" if j % 2 == 0 else "-"
        terms.append(f"{sign} ({m[0][j]})*({_detn_str(minor)})")
    return "(" + " ".join(terms) + ")"


def _sd_dets(cast: str):
    """Shared det expressions for the stationary system B q = e5:
    B rows 0..3 from A = N^T - diag(n), row 4 the normalization
    sum(n_j q_j) = 1; B_i replaces column i with (0,0,0,0,1)."""
    k = len(_SD_STATES)
    b = [
        [
            f"CAST({f't{j}{i}' + (f' - n{i}' if i == j else '')} AS {cast})"
            for j in range(k)
        ]
        for i in range(k - 1)
    ] + [[f"CAST(n{j} AS {cast})" for j in range(k)]]
    dets = {"detB": _detn_str(b)}
    rhs = ["0"] * (k - 1) + ["1"]
    for i in range(k):
        bi = [
            [f"CAST({rhs[r]} AS {cast})" if c == i else b[r][c] for c in range(k)]
            for r in range(k)
        ]
        dets[f"det{i}"] = _detn_str(bi)
    return dets


def stationary_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the full 5-state event-type Markov
    chain, EXACT (the long-run state occupancy a funnel model quotes):
    with q_i = pi_i / n_i the balance equations clear ALL denominators
    into the integer system (N^T - diag(n)) q = 0 plus the
    normalization sum(n_i q_i) = 1, solved by Cramer's rule with 5x5
    integer determinants in DECIMAL(38,0); pi_i = n_i q_i lands in
    sign-aware exact ppm. The companion of absorbing_chain for the
    recurrent chain — no iteration, no floats, no spectral anything.

    Scale shape: one user-key lead() window + a 25-key census; the
    5x5 Cramer solve is constant-size single-row arithmetic."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(w).alias("t"),
    ).where(F.col("t").isNotNull())
    aggs = []
    for i, si in enumerate(_SD_STATES):
        aggs.append(F.sum(F.when(F.col("f") == si, 1).otherwise(0)).alias(f"n{i}"))
        for j, sj in enumerate(_SD_STATES):
            aggs.append(
                F.sum(
                    F.when((F.col("f") == si) & (F.col("t") == sj), 1).otherwise(0)
                ).alias(f"t{i}{j}")
            )
    mat = tr.agg(*aggs)
    dets = _sd_dets("DECIMAL(38,0)")
    passthrough = [f"n{i}" for i in range(len(_SD_STATES))]
    solved = mat.select(
        *passthrough,
        *[F.expr(sql).alias(name) for name, sql in dets.items()],
    )
    stack_args = ", ".join(
        f"'{s}', n{i}, det{i}" for i, s in enumerate(_SD_STATES)
    )
    rows = solved.selectExpr(
        "detB", f"stack({len(_SD_STATES)}, {stack_args}) AS (state, n_out, deti)"
    )
    return (
        rows.select(
            "state",
            F.col("n_out").cast("long").alias("n_out"),
            F.expr(
                "CAST(CAST(sign(deti) * sign(detB) AS BIGINT)"
                " * (CAST(abs(deti * n_out * 1000000) AS DECIMAL(38,0))"
                "    div CAST(abs(detB) AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("pi_ppm"),
            F.when(F.col("detB") != 0, 1).otherwise(0).cast("int").alias("solvable"),
        )
        .repartition(1)
        .sortWithinPartitions("state")
    )


def stationary_dist_sql() -> str:
    dets = _sd_dets("HUGEINT")
    det_cols = ",\n         ".join(f"{sql} AS {name}" for name, sql in dets.items())
    agg_cols = []
    for i, si in enumerate(_SD_STATES):
        agg_cols.append(f"SUM(CASE WHEN f = '{si}' THEN 1 ELSE 0 END) AS n{i}")
        for j, sj in enumerate(_SD_STATES):
            agg_cols.append(
                f"SUM(CASE WHEN f = '{si}' AND t = '{sj}' THEN 1 ELSE 0 END) AS t{i}{j}"
            )
    outs = "\n  UNION ALL\n".join(
        f"  SELECT '{s}' AS state, n{i} AS n_out,"
        f" CAST(CAST(sign(det{i}) * sign(detB) AS BIGINT)"
        f" * (abs(det{i} * n{i} * 1000000) // abs(detB)) AS BIGINT) AS pi_ppm,"
        f" CAST(CASE WHEN detB != 0 THEN 1 ELSE 0 END AS INT) AS solvable FROM dets"
        for i, s in enumerate(_SD_STATES)
    )
    return f"""
WITH tr AS (
  SELECT event_type AS f,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS t
  FROM events
  QUALIFY t IS NOT NULL
),
mat AS (
  SELECT {", ".join(agg_cols)} FROM tr
),
dets AS (
  SELECT n0, n1, n2, n3, n4,
         {det_cols}
  FROM mat
)
SELECT * FROM (
{outs}
) ORDER BY state
"""


# --- interval stabbing census ---------------------------------------------------

_STAB_DATES = tuple(f"199{y}-0{m}-01" for y in range(3, 8) for m in (1, 7))


def interval_stabbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-stabbing census (the temporal-database point query:
    how many order->ship intervals COVER instant t): for ten fixed
    query dates, the count of lineitems whose [order date, ship date)
    interval stabs the date, the distinct orders among them, and an
    orderkey checksum — the open-orders-at-midnight table, computed
    set-at-a-time rather than via an interval tree.

    Scale shape: a 10-row broadcast date dim x fact comparisons —
    map-side predicate per date, one tiny census; no index structure
    to maintain."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "o_orderdate", "l_shipdate"
    )
    dates = spark.createDataFrame(
        [(d,) for d in _STAB_DATES], "qd string"
    ).select(F.to_timestamp("qd").alias("qd"))
    stab = j.crossJoin(F.broadcast(dates)).where(
        (F.col("o_orderdate") <= F.col("qd")) & (F.col("l_shipdate") > F.col("qd"))
    )
    return (
        stab.groupBy("qd")
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.sum("l_orderkey").alias("order_checksum"),
        )
        .select(F.col("qd").cast("date").alias("qd"), "n_lineitems", "n_orders", "order_checksum")
        .repartition(1)
        .sortWithinPartitions("qd")
    )


def interval_stabbing_sql() -> str:
    dates = ", ".join(f"(TIMESTAMP '{d} 00:00:00')" for d in _STAB_DATES)
    return f"""
WITH dates AS (SELECT * FROM (VALUES {dates}) AS t(qd)),
j AS (
  SELECT l_orderkey, o_orderdate, l_shipdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
stab AS (
  SELECT qd, l_orderkey FROM j, dates
  WHERE o_orderdate <= qd AND l_shipdate > qd
)
SELECT CAST(qd AS DATE) AS qd,
       COUNT(*) AS n_lineitems,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       CAST(SUM(l_orderkey) AS BIGINT) AS order_checksum
FROM stab GROUP BY qd ORDER BY qd
"""


# --- integer-sqrt kernel audit (unrolled Newton) --------------------------------


def isqrt_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-square-root kernel audit: floor(sqrt(n)) for each
    month's revenue cents by SIX unrolled Newton steps from the
    bit-length seed 2^ceil(bits/2) (monotone-decreasing from above,
    quadratic convergence — 6 steps suffice for 63-bit inputs), then
    the DEFINITIONAL verification q^2 <= n < (q+1)^2 as an output
    column. This pins an exact isqrt kernel both engines agree on —
    the prerequisite for any future stddev-style surface — with the
    convergence proof in-band rather than assumed.

    Scale shape: map-only arithmetic on a month census."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("n")
    )
    seed = "CAST(shiftleft(CAST(1 AS BIGINT), CAST(div(length(bin(n)) + 1, 2) AS INT)) AS BIGINT)"
    sel = m.select("m", "n", F.expr(seed).alias("x0"))
    for k in range(6):
        sel = sel.withColumn(
            f"x{k + 1}", F.expr(f"least(x{k}, div(x{k} + div(n, x{k}), 2))")
        )
    return (
        sel.select(
            F.col("m").cast("date").alias("m"),
            "n",
            F.col("x6").alias("isqrt"),
            F.expr(
                "CAST(CASE WHEN x6 * x6 <= n AND (x6 + 1) * (x6 + 1) > n"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("verified"),
        )
        .repartition(1)
        .sortWithinPartitions("m")
    )


def isqrt_audit_sql() -> str:
    seed = "(1::BIGINT << CAST((length(bin(n)) + 1) // 2 AS INT))"
    lines = [f"SELECT m, n, {seed} AS x0 FROM mo"]
    sql = f"WITH mo AS (\n  SELECT date_trunc('month', o_orderdate) AS m,\n         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS n\n  FROM orders GROUP BY 1\n),\ns0 AS ({lines[0]})"
    for k in range(6):
        sql += (
            f",\ns{k + 1} AS (SELECT m, n, least(x{k}, (x{k} + n // x{k}) // 2) AS x{k + 1}"
            f" FROM s{k})"
        )
    sql += """
SELECT CAST(m AS DATE) AS m, CAST(n AS BIGINT) AS n,
       CAST(x6 AS BIGINT) AS isqrt,
       CAST(CASE WHEN x6 * x6 <= n AND (x6 + 1) * (x6 + 1) > n
                 THEN 1 ELSE 0 END AS INT) AS verified
FROM s6 ORDER BY m
"""
    return sql


# --- Little's law exact accounting audit ----------------------------------------

_LL_START = "1994-01-01"
_LL_END = "1996-01-01"  # [start, end) audit window


def littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's-law accounting audit (L = lambda * W), held as the
    EXACT finite-window identity it really is: over [1994, 1996) the
    time-integral of work-in-process equals the summed in-window
    sojourn of all items — sum over days of open-order count =
    sum over lineitems of overlap([order, ship), window) — two
    completely different aggregations of the same integral, computed
    WITHOUT a day explode (the overlap is closed-form date
    arithmetic) and pinned equal. Queueing dashboards that report L,
    lambda and W separately are audited by exactly this identity.

    Scale shape: both sides are one map-only pass + one census; the
    identity check is a single-row join."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.expr("CAST(datediff(o_orderdate, '1970-01-01') AS BIGINT)").alias("a"),
        F.expr("CAST(datediff(l_shipdate, '1970-01-01') AS BIGINT)").alias("b"),
    )
    s = f"CAST(datediff('{_LL_START}', '1970-01-01') AS BIGINT)"
    e = f"CAST(datediff('{_LL_END}', '1970-01-01') AS BIGINT)"
    ov = F.expr(f"greatest(0, least(b, {e}) - greatest(a, {s}))")
    rhs = j.agg(
        F.sum(ov).alias("sojourn_days"),
        F.sum(F.expr(f"CASE WHEN a >= {s} AND a < {e} THEN 1 ELSE 0 END")).alias(
            "arrivals"
        ),
    )
    # LHS through the DAY dimension (a genuinely different path: each
    # item explodes into its in-window days, the per-day open counts
    # are materialized, and their sum is the WIP time-integral) — so
    # the identity check exercises real day-level accounting rather
    # than restating the overlap arithmetic.
    ev = j.where((F.col("b") > F.expr(s)) & (F.col("a") < F.expr(e))).select(
        F.expr(f"greatest(a, {s})").alias("d_in"),
        F.expr(f"least(b, {e})").alias("d_out"),
    )
    per_day = (
        ev.where(F.col("d_out") > F.col("d_in"))
        .select(F.explode(F.expr("sequence(d_in, d_out - 1)")).alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("open_cnt"))
    )
    lhs = per_day.agg(F.sum("open_cnt").alias("wip_integral")).crossJoin(
        ev.agg(F.count(F.lit(1)).alias("n_items_window"))
    )
    one = lhs.crossJoin(rhs)
    return one.select(
        "wip_integral", "sojourn_days", "n_items_window", "arrivals",
        F.when(F.col("wip_integral") == F.col("sojourn_days"), 1)
        .otherwise(0)
        .cast("int")
        .alias("identity_holds"),
        F.expr(
            "CAST(div(1000000 * sojourn_days, arrivals) AS BIGINT)"
        ).alias("mean_sojourn_udays"),
    )


def littles_law_sql() -> str:
    s = f"CAST(date_diff('day', DATE '1970-01-01', DATE '{_LL_START}') AS BIGINT)"
    e = f"CAST(date_diff('day', DATE '1970-01-01', DATE '{_LL_END}') AS BIGINT)"
    return f"""
WITH j AS (
  SELECT CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) AS a,
         CAST(date_diff('day', DATE '1970-01-01', l_shipdate) AS BIGINT) AS b
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
rhs AS (
  SELECT SUM(greatest(0, least(b, {e}) - greatest(a, {s}))) AS sojourn_days,
         SUM(CASE WHEN a >= {s} AND a < {e} THEN 1 ELSE 0 END) AS arrivals
  FROM j
),
ev AS (
  SELECT greatest(a, {s}) AS d_in, least(b, {e}) AS d_out
  FROM j WHERE b > {s} AND a < {e}
),
per_day AS (
  SELECT day, COUNT(*) AS open_cnt
  FROM (SELECT unnest(range(d_in, d_out)) AS day FROM ev WHERE d_out > d_in)
  GROUP BY day
),
lhs AS (
  SELECT (SELECT SUM(open_cnt) FROM per_day) AS wip_integral,
         COUNT(*) AS n_items_window
  FROM ev
)
SELECT CAST(wip_integral AS BIGINT) AS wip_integral,
       CAST(sojourn_days AS BIGINT) AS sojourn_days,
       CAST(n_items_window AS BIGINT) AS n_items_window,
       CAST(arrivals AS BIGINT) AS arrivals,
       CAST(CASE WHEN wip_integral = sojourn_days THEN 1 ELSE 0 END AS INT) AS identity_holds,
       CAST((1000000 * sojourn_days) // arrivals AS BIGINT) AS mean_sojourn_udays
FROM lhs, rhs
"""


# --- Zeller congruence calendar-kernel differential audit -----------------------


def zeller_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zeller's congruence audit: day-of-week for every distinct order
    date computed from scratch by Zeller's 1882 formula (pure integer
    arithmetic on y/m/d with the Jan/Feb year shift) and cross-checked
    against the engine's own dayofweek — a calendar-kernel
    differential census (n_dates per weekday, disagreements must be
    zero). The sort of independent cross-check a date-dimension build
    ships with.

    Scale shape: one distinct-date census + map-only arithmetic."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(F.to_date("o_orderdate").alias("d")).distinct()
    x = d.select(
        "d",
        F.expr("year(d)").alias("y0"),
        F.expr("month(d)").alias("m0"),
        F.expr("day(d)").alias("q"),
    ).select(
        "d", "q",
        F.expr("CASE WHEN m0 <= 2 THEN m0 + 12 ELSE m0 END").alias("m"),
        F.expr("CASE WHEN m0 <= 2 THEN y0 - 1 ELSE y0 END").alias("y"),
    ).select(
        "d",
        # Zeller: h = (q + 13(m+1)/5 + K + K/4 + J/4 + 5J) mod 7,
        # h: 0=Saturday ... 6=Friday
        F.expr(
            "pmod(q + div(13 * (m + 1), 5) + pmod(y, 100) + div(pmod(y, 100), 4)"
            " + div(div(y, 100), 4) + 5 * div(y, 100), 7)"
        ).alias("h"),
        # engine: dayofweek() 1=Sunday ... 7=Saturday -> Zeller h
        F.expr("pmod(dayofweek(d), 7)").alias("eng"),
    )
    return (
        x.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_dates"),
            F.sum(
                F.when(F.col("eng") != F.col("h"), 1).otherwise(0)
            ).alias("n_disagree"),
        )
        .repartition(1)
        .sortWithinPartitions("h")
    )


def zeller_audit_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders),
x AS (
  SELECT d, EXTRACT(day FROM d) AS q,
         CASE WHEN EXTRACT(month FROM d) <= 2
              THEN EXTRACT(month FROM d) + 12 ELSE EXTRACT(month FROM d) END AS m,
         CASE WHEN EXTRACT(month FROM d) <= 2
              THEN EXTRACT(year FROM d) - 1 ELSE EXTRACT(year FROM d) END AS y
  FROM d
),
z AS (
  SELECT d,
         (q + (13 * (m + 1)) // 5 + (y % 100) + (y % 100) // 4
            + (y // 100) // 4 + 5 * (y // 100)) % 7 AS h,
         -- DuckDB dayofweek: 0=Sunday..6=Saturday; Zeller h: 0=Saturday..6=Friday
         (dayofweek(d) + 1) % 7 AS eng
  FROM x
)
SELECT CAST(h AS BIGINT) AS h,
       COUNT(*) AS n_dates,
       CAST(SUM(CASE WHEN eng != h THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree
FROM z GROUP BY h ORDER BY h
"""


# --- regression-to-the-mean decile transition census ----------------------------

_MR_SPLIT = "1998-01-01"


def mean_reversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-to-the-mean census (the winner's-curse table every
    cohort review needs): customers are ranked into spend deciles in
    period 1 (orders before 1998) and again in period 2 (1998 on,
    customers active in both), and the decile->decile transition
    matrix is emitted with exact counts and a custkey checksum. Top
    deciles bleeding downward IS the mean-reversion signal, pinned
    here without a single float.

    Scale shape: two customer censuses + two global decile windows
    over the customer DIM (not fact rows) + one 10x10 census."""
    o = _t(spark, sf_dir, "orders")
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")

    def decile(df, alias):
        return df.select(
            "o_custkey",
            F.expr(
                "CAST(div(10 * (row_number() OVER (ORDER BY spend DESC, o_custkey) - 1),"
                " count(1) OVER ()) AS BIGINT)"
            ).alias(alias),
        )
    p1 = decile(
        o.where(F.col("o_orderdate") < _MR_SPLIT)
        .groupBy("o_custkey").agg(F.sum(cents).alias("spend")),
        "d1",
    )
    p2 = decile(
        o.where(F.col("o_orderdate") >= _MR_SPLIT)
        .groupBy("o_custkey").agg(F.sum(cents).alias("spend")),
        "d2",
    )
    return (
        p1.join(p2, "o_custkey")
        .groupBy("d1", "d2")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("o_custkey").alias("cust_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("d1", "d2")
    )


def mean_reversion_sql() -> str:
    return f"""
WITH p1 AS (
  SELECT o_custkey,
         (10 * (row_number() OVER (ORDER BY SUM(CAST(round(o_totalprice * 100) AS BIGINT)) DESC, o_custkey) - 1))
           // COUNT(*) OVER () AS d1
  FROM orders WHERE o_orderdate < TIMESTAMP '{_MR_SPLIT} 00:00:00'
  GROUP BY o_custkey
),
p2 AS (
  SELECT o_custkey,
         (10 * (row_number() OVER (ORDER BY SUM(CAST(round(o_totalprice * 100) AS BIGINT)) DESC, o_custkey) - 1))
           // COUNT(*) OVER () AS d2
  FROM orders WHERE o_orderdate >= TIMESTAMP '{_MR_SPLIT} 00:00:00'
  GROUP BY o_custkey
)
SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
       COUNT(*) AS n_customers,
       CAST(SUM(o_custkey) AS BIGINT) AS cust_checksum
FROM p1 JOIN p2 USING (o_custkey)
GROUP BY d1, d2 ORDER BY d1, d2
"""


# --- median-of-medians pivot-guarantee audit ------------------------------------


def median_of_medians(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-of-medians pivot audit (Blum-Floyd-Pratt-Rivest-Tarjan
    1973): the classic groups-of-5 pivot is built with THREE unrolled
    levels (n -> n/5 -> n/25 medians, then the exact median of the
    ~n/25 survivors) over the distinct daily-revenue values, and the
    audit reports the chosen pivot's exact rank position in ppm of n
    plus the textbook 30-70% guarantee flag — the selection-algorithm
    invariant, demonstrated on real data instead of asserted.

    Scale shape: two rank-window levels over value censuses (each 5x
    smaller) + one exact median pick + one rank lookup."""
    o = _t(spark, sf_dir, "orders")
    vals = o.groupBy("o_orderdate").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("v")
    ).select("v")

    def level(df):
        w = Window.orderBy("v")
        g = df.select(
            "v", F.expr("div(row_number() OVER (ORDER BY v) - 1, 5)").alias("g")
        )
        wg = Window.partitionBy("g").orderBy("v")
        return (
            g.select(
                "v", "g",
                F.row_number().over(wg).alias("r"),
                F.count(F.lit(1)).over(Window.partitionBy("g")).alias("gn"),
            )
            .where(F.col("r") == F.expr("CAST(ceil(gn / 2.0) AS BIGINT)"))
            .select("v")
        )
    l1 = level(vals)
    l2 = level(l1)
    wmed = Window.orderBy("v")
    pivot = (
        l2.select(
            "v",
            F.row_number().over(wmed).alias("rk"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n2"),
        )
        .where(F.col("rk") == F.expr("CAST(ceil(n2 / 2.0) AS BIGINT)"))
        .select(F.col("v").alias("pivot"))
    )
    n = vals.agg(F.count(F.lit(1)).alias("n"))
    rank = (
        vals.crossJoin(pivot)
        .agg(
            F.sum(F.when(F.col("v") < F.col("pivot"), 1).otherwise(0)).alias("n_below"),
            F.max("pivot").alias("pivot"),
        )
    )
    one = rank.crossJoin(n)
    return one.select(
        "n", "pivot", "n_below",
        F.expr("CAST(div(1000000 * n_below, n) AS BIGINT)").alias("rank_ppm"),
        F.expr(
            "CAST(CASE WHEN 10 * n_below >= 3 * n - 30 AND 10 * n_below <= 7 * n + 30"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("within_guarantee"),
    )


def median_of_medians_sql() -> str:
    def level(src):
        return f"""
  SELECT v FROM (
    SELECT v, g, row_number() OVER (PARTITION BY g ORDER BY v) AS r,
           COUNT(*) OVER (PARTITION BY g) AS gn
    FROM (
      SELECT v, (row_number() OVER (ORDER BY v) - 1) // 5 AS g FROM {src}
    )
  ) WHERE r = CAST(ceil(gn / 2.0) AS BIGINT)"""
    return f"""
WITH vals AS (
  SELECT SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
  FROM orders GROUP BY o_orderdate
),
l1 AS ({level('vals')}),
l2 AS ({level('l1')}),
pv AS (
  SELECT v AS pval FROM (
    SELECT v, row_number() OVER (ORDER BY v) AS rk, COUNT(*) OVER () AS n2
    FROM l2
  ) WHERE rk = CAST(ceil(n2 / 2.0) AS BIGINT)
),
n AS (SELECT COUNT(*) AS n FROM vals),
rank_ AS (
  SELECT SUM(CASE WHEN v < pval THEN 1 ELSE 0 END) AS n_below,
         MAX(pval) AS pval
  FROM vals, pv
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(pval AS BIGINT) AS pivot,
       CAST(n_below AS BIGINT) AS n_below,
       CAST((1000000 * n_below) // n AS BIGINT) AS rank_ppm,
       CAST(CASE WHEN 10 * n_below >= 3 * n - 30 AND 10 * n_below <= 7 * n + 30
                 THEN 1 ELSE 0 END AS INT) AS within_guarantee
FROM rank_, n
"""


# --- two-hop neighborhood census on the co-purchase graph -----------------------


def two_hop_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop neighborhood census (the friend-of-friend reach that
    drives recommendation candidate pools): on the distinct
    co-purchase graph, each part's degree and its EXACT 2-hop
    neighborhood size (distinct parts reachable in <= 2 edges, self
    excluded) — the reach-vs-degree table that shows where the
    candidate pool explodes, rolled up by degree bucket
    (floor-log2) with exact counts.

    Scale shape: one basket self-join (bounded by basket size) builds
    edges; one edge-edge join builds 2-hop candidates; two distinct
    censuses close — the standard candidate-generation shape."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    # support-thresholded graph (>= 3 shared orders, as item_cosine2):
    # the raw co-purchase graph's 2-hop join is sum-of-degrees-squared
    # — quadratic in basket volume — while the support cut keeps the
    # recommendation-relevant core and bounds the join at any sf.
    edges = (
        a.join(b, "k")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cij"))
        .where(F.col("cij") >= 3)
        .select("u", "v")
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    e2 = edges.select(F.col("u").alias("m"), F.col("v").alias("w2"))
    two = (
        edges.join(e2, F.col("v") == F.col("m"))
        .where(F.col("w2") != F.col("u"))
        .select("u", "w2")
        .union(edges.select("u", F.col("v").alias("w2")))
        .distinct()
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("n2"))
    )
    x = deg.join(two, "u").select(
        "u", "deg", "n2",
        (F.length(F.expr("bin(deg)")) - 1).alias("deg_bucket"),
    )
    return (
        x.groupBy("deg_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("deg").alias("sum_deg"),
            F.sum("n2").alias("sum_reach2"),
            F.max("n2").alias("max_reach2"),
        )
        .repartition(1)
        .sortWithinPartitions("deg_bucket")
    )


def two_hop_census_sql() -> str:
    return """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey
   AND a.l_partkey != b.l_partkey
  GROUP BY u, v HAVING COUNT(*) >= 3
),
deg AS (SELECT u, COUNT(*) AS deg FROM edges GROUP BY u),
two AS (
  SELECT u, COUNT(*) AS n2 FROM (
    SELECT e1.u, e2.v AS w2
    FROM edges e1 JOIN edges e2 ON e2.u = e1.v AND e2.v != e1.u
    UNION
    SELECT u, v AS w2 FROM edges
  ) GROUP BY u
),
x AS (
  SELECT deg.u, deg, n2, length(bin(deg)) - 1 AS deg_bucket
  FROM deg JOIN two ON two.u = deg.u
)
SELECT CAST(deg_bucket AS BIGINT) AS deg_bucket,
       COUNT(*) AS n_parts,
       CAST(SUM(deg) AS BIGINT) AS sum_deg,
       CAST(SUM(n2) AS BIGINT) AS sum_reach2,
       CAST(MAX(n2) AS BIGINT) AS max_reach2
FROM x GROUP BY deg_bucket ORDER BY deg_bucket
"""


# --- difference-in-differences cell table ---------------------------------------

_DID_SPLIT = "1998-01-01"


def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences cell table (the econometric workhorse
    for promo evaluation), held exact: treatment = parts whose type
    contains 'PROMO'-ish marker (here p_type's first word as the
    deterministic arm), periods split at 1998; the four cells report
    exact lineitem counts and cent sums, and the DiD estimator
    (m11 - m10) - (m01 - m00) is emitted as an exact integer after
    clearing the four denominators (milli-cents per item, floor by
    the common denominator product — both engines divide the same
    positives, sign carried separately).

    Scale shape: one broadcast part-dim join + a 4-cell census +
    single-row arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.split(F.col("p_type"), " ").getItem(0) == "PROMO", 1)
        .otherwise(0)
        .alias("treated"),
    )
    x = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"]).select(
        "treated",
        F.when(F.col("l_shipdate") >= _DID_SPLIT, 1).otherwise(0).alias("post"),
        F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)").alias("cents"),
    )
    cells = x.groupBy("treated", "post").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
    )
    piv = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("treated") == t) & (F.col("post") == q), F.col(c)
                )
            ).alias(f"{c}{t}{q}")
            for t in (0, 1)
            for q in (0, 1)
            for c in ("n", "cents")
        ]
    )
    did = (
        "CAST(sign((CAST(cents11 AS DECIMAL(38,0)) * CAST(n10 AS DECIMAL(38,0)) - CAST(cents10 AS DECIMAL(38,0)) * CAST(n11 AS DECIMAL(38,0))) * CAST(n00 AS DECIMAL(38,0)) * CAST(n01 AS DECIMAL(38,0)) - (CAST(cents01 AS DECIMAL(38,0)) * CAST(n00 AS DECIMAL(38,0)) - CAST(cents00 AS DECIMAL(38,0)) * CAST(n01 AS DECIMAL(38,0))) * CAST(n10 AS DECIMAL(38,0)) * CAST(n11 AS DECIMAL(38,0))) AS BIGINT)"
        " * (CAST(abs(((CAST(cents11 AS DECIMAL(38,0)) * CAST(n10 AS DECIMAL(38,0)) - CAST(cents10 AS DECIMAL(38,0)) * CAST(n11 AS DECIMAL(38,0))) * CAST(n00 AS DECIMAL(38,0)) * CAST(n01 AS DECIMAL(38,0)) - (CAST(cents01 AS DECIMAL(38,0)) * CAST(n00 AS DECIMAL(38,0)) - CAST(cents00 AS DECIMAL(38,0)) * CAST(n01 AS DECIMAL(38,0))) * CAST(n10 AS DECIMAL(38,0)) * CAST(n11 AS DECIMAL(38,0))) * 1000) AS DECIMAL(38,0))"
        "    div CAST(CAST(n00 AS DECIMAL(38,0)) * CAST(n01 AS DECIMAL(38,0)) * CAST(n10 AS DECIMAL(38,0)) * CAST(n11 AS DECIMAL(38,0)) AS DECIMAL(38,0)))"
    )
    out = piv.select(
        "n00", "cents00", "n01", "cents01", "n10", "cents10", "n11", "cents11",
        F.expr(f"CAST({did} AS BIGINT)").alias("did_millicents"),
    )
    return out


def diff_in_diff_sql() -> str:
    did = (
        "CAST(sign((CAST(cents11 AS HUGEINT) * CAST(n10 AS HUGEINT) - CAST(cents10 AS HUGEINT) * CAST(n11 AS HUGEINT)) * CAST(n00 AS HUGEINT) * CAST(n01 AS HUGEINT) - (CAST(cents01 AS HUGEINT) * CAST(n00 AS HUGEINT) - CAST(cents00 AS HUGEINT) * CAST(n01 AS HUGEINT)) * CAST(n10 AS HUGEINT) * CAST(n11 AS HUGEINT)) AS BIGINT)"
        " * ((abs(((CAST(cents11 AS HUGEINT) * CAST(n10 AS HUGEINT) - CAST(cents10 AS HUGEINT) * CAST(n11 AS HUGEINT)) * CAST(n00 AS HUGEINT) * CAST(n01 AS HUGEINT) - (CAST(cents01 AS HUGEINT) * CAST(n00 AS HUGEINT) - CAST(cents00 AS HUGEINT) * CAST(n01 AS HUGEINT)) * CAST(n10 AS HUGEINT) * CAST(n11 AS HUGEINT)) * 1000))"
        " // (CAST(n00 AS HUGEINT) * CAST(n01 AS HUGEINT) * CAST(n10 AS HUGEINT) * CAST(n11 AS HUGEINT)))"
    )
    return f"""
WITH p AS (
  SELECT p_partkey,
         CASE WHEN string_split(p_type, ' ')[1] = 'PROMO'
              THEN 1 ELSE 0 END AS treated
  FROM part
),
x AS (
  SELECT treated,
         CASE WHEN l_shipdate >= TIMESTAMP '{_DID_SPLIT} 00:00:00' THEN 1 ELSE 0 END AS post,
         CAST(round(100 * l_extendedprice) AS BIGINT) AS cents
  FROM lineitem JOIN p ON p_partkey = l_partkey
),
cells AS (
  SELECT treated, post, COUNT(*) AS n, SUM(cents) AS cents
  FROM x GROUP BY treated, post
),
piv AS (
  SELECT
    MAX(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n00,
    MAX(CASE WHEN treated = 0 AND post = 0 THEN cents END) AS cents00,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n01,
    MAX(CASE WHEN treated = 0 AND post = 1 THEN cents END) AS cents01,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n10,
    MAX(CASE WHEN treated = 1 AND post = 0 THEN cents END) AS cents10,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n11,
    MAX(CASE WHEN treated = 1 AND post = 1 THEN cents END) AS cents11
  FROM cells
)
SELECT CAST(n00 AS BIGINT) AS n00, CAST(cents00 AS BIGINT) AS cents00,
       CAST(n01 AS BIGINT) AS n01, CAST(cents01 AS BIGINT) AS cents01,
       CAST(n10 AS BIGINT) AS n10, CAST(cents10 AS BIGINT) AS cents10,
       CAST(n11 AS BIGINT) AS n11, CAST(cents11 AS BIGINT) AS cents11,
       CAST({did} AS BIGINT) AS did_millicents
FROM piv
"""


# --- classical seasonal index (ratio to centered moving average) ----------------


def seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal index (the ratio-to-centered-moving-average
    step of time-series decomposition): monthly revenue cents over the
    2x12 centered MA (the textbook half-weight-endpoints window,
    denominator 24), each month's ratio in exact ppm by integer cross
    multiplication div(1e6 * 24 * v, ma24), then per calendar month
    the mean ratio ppm over all full-window years — the seasonal
    profile a demand planner reads, floats nowhere.

    Scale shape: one month census + one 13-row sliding window + a
    12-key rollup."""
    o = _t(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("m")).agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("v")
    )
    w = Window.orderBy("m").rowsBetween(-6, 6)
    wn = Window.orderBy("m")
    x = m.select(
        "m", "v",
        F.count(F.lit(1)).over(w).alias("span"),
        (
            F.sum("v").over(w) * 2
            - F.first("v").over(w)
            - F.last("v").over(w)
        ).alias("ma24"),
    ).where(F.col("span") == 13)
    ratios = x.select(
        F.month("m").alias("cal_month"),
        F.expr("CAST(div(1000000 * 24 * v, ma24) AS BIGINT)").alias("ratio_ppm"),
    )
    return (
        ratios.groupBy("cal_month")
        .agg(
            F.count(F.lit(1)).alias("n_years"),
            F.expr("CAST(div(sum(ratio_ppm), count(1)) AS BIGINT)").alias(
                "seasonal_index_ppm"
            ),
            F.min("ratio_ppm").alias("min_ratio_ppm"),
            F.max("ratio_ppm").alias("max_ratio_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("cal_month")
    )


def seasonal_index_sql() -> str:
    return """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
  FROM orders GROUP BY 1
),
x AS (
  SELECT m, v,
         COUNT(*) OVER win AS span,
         SUM(v) OVER win * 2 - first_value(v) OVER win - last_value(v) OVER win AS ma24
  FROM m
  WINDOW win AS (ORDER BY m ROWS BETWEEN 6 PRECEDING AND 6 FOLLOWING)
),
ratios AS (
  SELECT EXTRACT(month FROM m) AS cal_month,
         (1000000 * 24 * v) // ma24 AS ratio_ppm
  FROM x WHERE span = 13
)
SELECT CAST(cal_month AS BIGINT) AS cal_month,
       COUNT(*) AS n_years,
       CAST(SUM(ratio_ppm) // COUNT(*) AS BIGINT) AS seasonal_index_ppm,
       CAST(MIN(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
       CAST(MAX(ratio_ppm) AS BIGINT) AS max_ratio_ppm
FROM ratios GROUP BY cal_month ORDER BY cal_month
"""


# --- DAU/WAU/MAU stickiness census ----------------------------------------------


def stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics stickiness census (the DAU/MAU ratio every
    growth dashboard leads with), exact: per calendar month the
    distinct monthly actives (MAU), the SUM of daily distinct actives
    (so avg DAU = that sum over active days, kept as exact integers),
    active days, and stickiness ppm = div(1e6 * dau_sum, days * mau).

    Scale shape: two user-key distinct censuses (day grain, month
    grain) + a month rollup — the standard engagement shape."""
    ev = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"),
        F.date_trunc("month", "ts").alias("m"),
        "user_id",
    )
    dau = ev.groupBy("m", "d").agg(F.countDistinct("user_id").alias("dau"))
    per_m = dau.groupBy("m").agg(
        F.count(F.lit(1)).alias("active_days"),
        F.sum("dau").alias("dau_sum"),
    )
    mau = ev.groupBy("m").agg(F.countDistinct("user_id").alias("mau"))
    return (
        per_m.join(mau, "m")
        .select(
            F.col("m").cast("date").alias("m"),
            "active_days", "dau_sum", "mau",
            F.expr(
                "CAST(div(1000000 * dau_sum, active_days * mau) AS BIGINT)"
            ).alias("stickiness_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("m")
    )


def stickiness_sql() -> str:
    return """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS d, date_trunc('month', ts) AS m, user_id
  FROM events
),
dau AS (SELECT m, d, COUNT(DISTINCT user_id) AS dau FROM ev GROUP BY m, d),
per_m AS (
  SELECT m, COUNT(*) AS active_days, SUM(dau) AS dau_sum FROM dau GROUP BY m
),
mau AS (SELECT m, COUNT(DISTINCT user_id) AS mau FROM ev GROUP BY m)
SELECT CAST(per_m.m AS DATE) AS m,
       CAST(active_days AS BIGINT) AS active_days,
       CAST(dau_sum AS BIGINT) AS dau_sum,
       CAST(mau AS BIGINT) AS mau,
       CAST((1000000 * dau_sum) // (active_days * mau) AS BIGINT) AS stickiness_ppm
FROM per_m JOIN mau ON mau.m = per_m.m
ORDER BY m
"""


# --- lifetime-value accumulation curve ------------------------------------------


def ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value accumulation curve (the 'how much of a user's
    value lands by their k-th purchase' table subscription businesses
    plan around): per user, purchases in time order accumulate exact
    cents; at each purchase index k the cumulative share of that
    user's final total in ppm; the census reports per k the user
    count still active and the mean share — monetization front-
    loading, exact.

    Scale shape: one user-key window (cumsum + total) + a k-key
    census."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wt = Window.partitionBy("user_id")
    x = ev.select(
        "user_id",
        F.row_number().over(w).alias("k"),
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("cents").over(wt).alias("total"),
    ).where(F.col("total") > 0)
    shares = x.select(
        "k", F.expr("div(1000000 * cum, total)").alias("share_ppm")
    )
    return (
        shares.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("CAST(div(sum(share_ppm), count(1)) AS BIGINT)").alias(
                "mean_share_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("k")
    )


def ltv_curve_sql() -> str:
    return """
WITH ev AS (
  SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
x AS (
  SELECT user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS k,
         SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cents) OVER (PARTITION BY user_id) AS total
  FROM ev
),
shares AS (
  SELECT k, (1000000 * cum) // total AS share_ppm FROM x WHERE total > 0
)
SELECT CAST(k AS BIGINT) AS k,
       COUNT(*) AS n_users,
       CAST(SUM(share_ppm) // COUNT(*) AS BIGINT) AS mean_share_ppm
FROM shares GROUP BY k ORDER BY k
"""


# --- k-anonymity suppression-cost what-if ---------------------------------------

_SUPC_KS = (2, 5, 10)


def suppression_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression-cost what-if (the release-planning
    question after the audit says 'not k-anonymous': how many records
    must be suppressed?): quasi-identifier groups are (market segment,
    priority, order year); for each k in {2, 5, 10} the groups below
    k, the records those groups hold (the minimal row-suppression
    cost for group-level k-anonymity), and the cost share in ppm —
    the utility price of each privacy level, exact.

    Scale shape: one QI census + a 3-row threshold sweep over group
    sizes."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    g = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            "c_mktsegment", "o_orderpriority", F.year("o_orderdate").alias("y")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ks = spark.createDataFrame([(k,) for k in _SUPC_KS], "k long")
    tot = g.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_groups"))
    sweep = (
        ks.crossJoin(g)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("n") < F.col("k"), 1).otherwise(0)).alias(
                "groups_below"
            ),
            F.coalesce(
                F.sum(F.when(F.col("n") < F.col("k"), F.col("n"))), F.lit(0)
            ).alias("rows_suppressed"),
        )
        .crossJoin(tot)
    )
    return (
        sweep.select(
            "k", "n_groups", "groups_below", "rows_suppressed", "total",
            F.expr(
                "CAST(div(1000000 * rows_suppressed, total) AS BIGINT)"
            ).alias("cost_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("k")
    )


def suppression_cost_sql() -> str:
    ks = ", ".join(f"({k})" for k in _SUPC_KS)
    return f"""
WITH g AS (
  SELECT c_mktsegment, o_orderpriority, EXTRACT(year FROM o_orderdate) AS y,
         COUNT(*) AS n
  FROM orders JOIN customer ON c_custkey = o_custkey
  GROUP BY ALL
),
tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_groups FROM g),
ks AS (SELECT * FROM (VALUES {ks}) AS t(k)),
sweep AS (
  SELECT k,
         SUM(CASE WHEN n < k THEN 1 ELSE 0 END) AS groups_below,
         COALESCE(SUM(CASE WHEN n < k THEN n END), 0) AS rows_suppressed
  FROM ks, g GROUP BY k
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(groups_below AS BIGINT) AS groups_below,
       CAST(rows_suppressed AS BIGINT) AS rows_suppressed,
       CAST(total AS BIGINT) AS total,
       CAST((1000000 * rows_suppressed) // total AS BIGINT) AS cost_ppm
FROM sweep, tot ORDER BY k
"""


# --- open-order backlog age pyramid ---------------------------------------------

_BACKLOG_DATES = ("1995-12-31", "1996-12-31", "1997-12-31", "1998-12-31")


def backlog_age(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog age pyramid (the ops-review table: of the lineitems
    still open at each year-end, how OLD are they?): for four year-end
    instants, open items (ordered on or before, shipped strictly
    after) bucketed by floor-log2 of their age in days — exact via
    length(bin(age)) — with counts and an orderkey checksum per
    (date, bucket).

    Scale shape: a 4-row broadcast date dim x one fact pass + a tiny
    census — interval_stabbing's time axis crossed with an age
    histogram."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"])
    dates = spark.createDataFrame(
        [(d,) for d in _BACKLOG_DATES], "qd string"
    ).select(F.to_timestamp("qd").alias("qd"))
    open_ = j.crossJoin(F.broadcast(dates)).where(
        (F.col("o_orderdate") <= F.col("qd")) & (F.col("l_shipdate") > F.col("qd"))
    ).select(
        F.col("qd").cast("date").alias("qd"),
        "l_orderkey",
        F.expr("CAST(datediff(qd, o_orderdate) AS BIGINT) + 1").alias("age_days"),
    )
    return (
        open_.select(
            "qd", "l_orderkey",
            (F.length(F.expr("bin(age_days)")) - 1).alias("age_bucket"),
        )
        .groupBy("qd", "age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_orderkey").alias("order_checksum"),
        )
        .repartition(1)
        .sortWithinPartitions("qd", "age_bucket")
    )


def backlog_age_sql() -> str:
    dates = ", ".join(f"(TIMESTAMP '{d} 00:00:00')" for d in _BACKLOG_DATES)
    return f"""
WITH dates AS (SELECT * FROM (VALUES {dates}) AS t(qd)),
j AS (
  SELECT l_orderkey, o_orderdate, l_shipdate
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
),
open_ AS (
  SELECT CAST(qd AS DATE) AS qd, l_orderkey,
         CAST(date_diff('day', o_orderdate, qd) AS BIGINT) + 1 AS age_days
  FROM j, dates
  WHERE o_orderdate <= qd AND l_shipdate > qd
)
SELECT qd,
       CAST(length(bin(age_days)) - 1 AS BIGINT) AS age_bucket,
       COUNT(*) AS n_items,
       CAST(SUM(l_orderkey) AS BIGINT) AS order_checksum
FROM open_ GROUP BY qd, age_bucket ORDER BY qd, age_bucket
"""


# --- decimal-vs-integer money-path drift audit ----------------------------------


def decimal_drift_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money-path policy audit: the engine's canonical integer-cents
    path (CAST(round(100 * x) AS BIGINT)) against the DECIMAL(18,2)
    path (cast the double price to exact decimal, sum, scale) — per
    order-year both totals and a drift column that MUST be zero while
    prices carry two decimals (the audit that catches a source
    switching to sub-cent pricing before it silently floors).  Both
    engines' double->decimal casts round the same two-decimal values
    exactly, so the identity is cross-engine-stable.

    Scale shape: one year census, two summation paths in the same
    agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.expr("CAST(round(100 * o_totalprice) AS BIGINT)")).alias(
                "int_cents"
            ),
            F.expr(
                "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
            ).alias("dec_cents"),
        )
        .select(
            "y", "n_orders", "int_cents", "dec_cents",
            (F.col("int_cents") - F.col("dec_cents")).alias("drift_cents"),
        )
        .repartition(1)
        .sortWithinPartitions("y")
    )


def decimal_drift_audit_sql() -> str:
    return """
SELECT EXTRACT(year FROM o_orderdate) AS y,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT) AS int_cents,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS dec_cents,
       CAST(SUM(CAST(round(100 * o_totalprice) AS BIGINT))
            - CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS BIGINT) AS drift_cents
FROM orders GROUP BY y ORDER BY y
"""


# --- turning-point randomness census --------------------------------------------


def turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turning-point test components (the second classic
    distribution-free randomness check next to runs_test): over the
    daily-revenue series, exact counts of strict local maxima and
    minima (both neighbors strictly lower/higher), the interior day
    count, and the expected turning-point rate 2/3 scaled —
    observed_ppm vs 666666 is the read.

    Scale shape: one date census + one lag/lead window + single-row
    arithmetic."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy("o_orderdate").agg(
        F.sum(F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")).alias("v")
    )
    w = Window.orderBy("o_orderdate")
    x = daily.select(
        "v",
        F.lag("v").over(w).alias("p"),
        F.lead("v").over(w).alias("nx"),
    ).where(F.col("p").isNotNull() & F.col("nx").isNotNull())
    return x.agg(
        F.count(F.lit(1)).alias("n_interior"),
        F.sum(
            F.when((F.col("v") > F.col("p")) & (F.col("v") > F.col("nx")), 1)
            .otherwise(0)
        ).alias("n_maxima"),
        F.sum(
            F.when((F.col("v") < F.col("p")) & (F.col("v") < F.col("nx")), 1)
            .otherwise(0)
        ).alias("n_minima"),
    ).select(
        "n_interior", "n_maxima", "n_minima",
        F.expr(
            "CAST(div(1000000 * (n_maxima + n_minima), n_interior) AS BIGINT)"
        ).alias("observed_ppm"),
        F.lit(666666).cast("long").alias("expected_ppm"),
    )


def turning_points_sql() -> str:
    return """
WITH daily AS (
  SELECT o_orderdate, SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS v
  FROM orders GROUP BY o_orderdate
),
x AS (
  SELECT v,
         lag(v) OVER (ORDER BY o_orderdate) AS p,
         lead(v) OVER (ORDER BY o_orderdate) AS nx
  FROM daily
  QUALIFY p IS NOT NULL AND nx IS NOT NULL
)
SELECT COUNT(*) AS n_interior,
       CAST(SUM(CASE WHEN v > p AND v > nx THEN 1 ELSE 0 END) AS BIGINT) AS n_maxima,
       CAST(SUM(CASE WHEN v < p AND v < nx THEN 1 ELSE 0 END) AS BIGINT) AS n_minima,
       CAST((1000000 * (SUM(CASE WHEN v > p AND v > nx THEN 1 ELSE 0 END)
            + SUM(CASE WHEN v < p AND v < nx THEN 1 ELSE 0 END))) // COUNT(*) AS BIGINT) AS observed_ppm,
       CAST(666666 AS BIGINT) AS expected_ppm
FROM x
"""


# --- clustering spectrum c(k) on the thresholded co-purchase graph --------------


def clustering_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-resolved clustering spectrum c(k) (hierarchical-network
    diagnostic, Ravasz & Barabási 2003): on the support >= 3
    co-purchase graph, each node's local clustering coefficient as the
    exact fraction 2*T / (d*(d-1)) — triangles T from one edge-edge-
    edge join — averaged per degree with the mean in ppm via summed
    exact per-node ppm (floor) — falling c(k) is the hierarchy
    signature; flat is random.

    Scale shape: the thresholded graph is small by construction (the
    support cut); triangle counting is two key-local joins."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "k")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 3)
        .select("u", "v")
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e2 = edges.select(F.col("u").alias("v"), F.col("v").alias("w2"))
    e3 = edges.select(F.col("u").alias("tu"), F.col("v").alias("tw"))
    tri = (
        edges.join(e2, "v")
        .join(e3, (F.col("u") == F.col("tu")) & (F.col("w2") == F.col("tw")))
        .groupBy("u")
        .agg((F.count(F.lit(1)) / 2).cast("long").alias("t"))
    )
    x = deg.join(tri, "u", "left").select(
        "u", "d", F.coalesce(F.col("t"), F.lit(0)).alias("t")
    ).where(F.col("d") >= 2)
    per = x.select(
        "d", F.expr("div(1000000 * 2 * t, d * (d - 1))").alias("cc_ppm")
    )
    return (
        per.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.expr("CAST(div(sum(cc_ppm), count(1)) AS BIGINT)").alias(
                "mean_cc_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("d")
    )


def clustering_spectrum_sql() -> str:
    return """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey
   AND a.l_partkey != b.l_partkey
  GROUP BY u, v HAVING COUNT(*) >= 3
),
deg AS (SELECT u, COUNT(*) AS d FROM edges GROUP BY u),
tri AS (
  SELECT e1.u, CAST(COUNT(*) // 2 AS BIGINT) AS t
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.v
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
  GROUP BY e1.u
),
x AS (
  SELECT deg.u, d, COALESCE(t, 0) AS t
  FROM deg LEFT JOIN tri ON tri.u = deg.u
  WHERE d >= 2
),
per AS (
  SELECT d, (1000000 * 2 * t) // (d * (d - 1)) AS cc_ppm FROM x
)
SELECT CAST(d AS BIGINT) AS d,
       COUNT(*) AS n_nodes,
       CAST(SUM(cc_ppm) // COUNT(*) AS BIGINT) AS mean_cc_ppm
FROM per GROUP BY d ORDER BY d
"""


# --- triangle-counting orientation work audit -----------------------------------


def triangle_orientation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle-counting orientation audit (the degree-ordering trick
    that makes trillion-edge triangle counts feasible — Chiba-Nishizeki
    / the 'forward' algorithm): on the support >= 3 co-purchase graph,
    count triangles TWICE — via the naive undirected wedge join and
    via edges oriented from lower (degree, id) to higher — prove the
    counts equal, and report both strategies' EXACT intermediate wedge
    sizes: the naive sum d*(d-1)/2 against the oriented sum
    outdeg*(outdeg-1)/2, whose ratio is the work saved at any scale.

    Scale shape: degree census + two bounded wedge joins on the
    thresholded graph; the lesson (orientation caps out-degree) is
    scale-free."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("v"))
    und = (
        a.join(b, "k")
        .where(F.col("u") != F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 3)
        .select("u", "v")
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    dv = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    ori = (
        und.join(deg, "u")
        .join(dv, "v")
        .where(
            (F.col("d") < F.col("dv"))
            | ((F.col("d") == F.col("dv")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )
    # naive triangle count: sum over undirected wedges closed, / 6
    w2 = und.select(F.col("u").alias("v"), F.col("v").alias("w2"))
    w3 = und.select(F.col("u").alias("tu"), F.col("v").alias("tw"))
    tri_naive = (
        und.join(w2, "v")
        .where(F.col("w2") != F.col("u"))
        .join(w3, (F.col("tu") == F.col("u")) & (F.col("tw") == F.col("w2")))
        .agg((F.count(F.lit(1)) / 6).cast("long").alias("tri_naive"))
    )
    o2 = ori.select(F.col("u").alias("ou"), F.col("v").alias("ov"))
    o3 = ori.select(F.col("u").alias("pu"), F.col("v").alias("pv"))
    tri_ori = (
        ori.join(o2, F.col("v") == F.col("ou"))
        .join(o3, (F.col("pu") == F.col("u")) & (F.col("pv") == F.col("ov")))
        .agg(F.count(F.lit(1)).alias("tri_oriented"))
    )
    work_naive = deg.agg(
        F.sum(F.expr("div(d * (d - 1), 2)")).alias("wedges_naive")
    )
    odeg = ori.groupBy("u").agg(F.count(F.lit(1)).alias("od"))
    work_ori = odeg.agg(
        F.sum(F.expr("div(od * (od - 1), 2)")).alias("wedges_oriented")
    )
    one = tri_naive.crossJoin(tri_ori).crossJoin(work_naive).crossJoin(work_ori)
    return one.select(
        "tri_naive", "tri_oriented",
        F.when(F.col("tri_naive") == F.col("tri_oriented"), 1)
        .otherwise(0).cast("int").alias("counts_agree"),
        "wedges_naive", "wedges_oriented",
        F.expr(
            "CAST(CASE WHEN wedges_naive > 0 THEN"
            " div(1000000 * wedges_oriented, wedges_naive) ELSE 0 END AS BIGINT)"
        ).alias("work_ratio_ppm"),
    )


def triangle_orientation_audit_sql() -> str:
    return """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
und AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey
   AND a.l_partkey != b.l_partkey
  GROUP BY u, v HAVING COUNT(*) >= 3
),
deg AS (SELECT u, COUNT(*) AS d FROM und GROUP BY u),
ori AS (
  SELECT und.u, und.v
  FROM und JOIN deg du ON du.u = und.u JOIN deg dv ON dv.u = und.v
  WHERE du.d < dv.d OR (du.d = dv.d AND und.u < und.v)
),
tri_naive AS (
  SELECT CAST(COUNT(*) // 6 AS BIGINT) AS tri_naive
  FROM und e1
  JOIN und e2 ON e2.u = e1.v AND e2.v != e1.u
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
tri_ori AS (
  SELECT COUNT(*) AS tri_oriented
  FROM ori e1
  JOIN ori e2 ON e2.u = e1.v
  JOIN ori e3 ON e3.u = e1.u AND e3.v = e2.v
),
wn AS (SELECT SUM(d * (d - 1) // 2) AS wedges_naive FROM deg),
odeg AS (SELECT u, COUNT(*) AS od FROM ori GROUP BY u),
wo AS (SELECT SUM(od * (od - 1) // 2) AS wedges_oriented FROM odeg)
SELECT CAST(tri_naive AS BIGINT) AS tri_naive,
       CAST(tri_oriented AS BIGINT) AS tri_oriented,
       CAST(CASE WHEN tri_naive = tri_oriented THEN 1 ELSE 0 END AS INT) AS counts_agree,
       CAST(wedges_naive AS BIGINT) AS wedges_naive,
       CAST(wedges_oriented AS BIGINT) AS wedges_oriented,
       CAST(CASE WHEN wedges_naive > 0
                 THEN (1000000 * wedges_oriented) // wedges_naive ELSE 0 END AS BIGINT) AS work_ratio_ppm
FROM tri_naive, tri_ori, wn, wo
"""


# --- deterministic birthday-collision census ------------------------------------

_BDAY_DRAWS = (100, 500, 1000)
_BDAY_N = 4096


def birthday_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Birthday-collision census with deterministic hash draws (the
    load-factor intuition behind every hash-table and shard-placement
    sizing decision, demonstrated instead of quoted): for k in
    {100, 500, 1000} deterministic draws h40('bd:'||i) % 4096, the
    exact distinct-bucket count, collision count, and max bucket
    occupancy — reproducible, no RNG state.

    Scale shape: a bounded draw explode + three bucket censuses."""
    mx = max(_BDAY_DRAWS)
    draws = spark.range(mx).select(
        F.col("id").alias("i"),
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit("bd:"), F.col("id").cast("string"))), 1, 10),
                16, 10,
            ).cast("long")
            % _BDAY_N
        ).alias("b"),
    )
    ks = spark.createDataFrame([(k,) for k in _BDAY_DRAWS], "k long")
    x = ks.crossJoin(draws).where(F.col("i") < F.col("k"))
    per = x.groupBy("k", "b").agg(F.count(F.lit(1)).alias("c"))
    return (
        per.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("distinct_buckets"),
            F.max("c").alias("max_bucket"),
        )
        .select(
            "k", "distinct_buckets",
            (F.col("k") - F.col("distinct_buckets")).alias("collisions"),
            "max_bucket",
        )
        .repartition(1)
        .sortWithinPartitions("k")
    )


def birthday_census_sql() -> str:
    ks = ", ".join(f"({k})" for k in _BDAY_DRAWS)
    mx = max(_BDAY_DRAWS)
    return f"""
WITH draws AS (
  SELECT i,
         CAST('0x' || substring(md5('bd:' || CAST(i AS VARCHAR)), 1, 10) AS BIGINT)
           % {_BDAY_N} AS b
  FROM (SELECT unnest(range({mx})) AS i)
),
ks AS (SELECT * FROM (VALUES {ks}) AS t(k)),
per AS (
  SELECT k, b, COUNT(*) AS c FROM ks, draws WHERE i < k GROUP BY k, b
)
SELECT CAST(k AS BIGINT) AS k,
       COUNT(*) AS distinct_buckets,
       CAST(k - COUNT(*) AS BIGINT) AS collisions,
       CAST(MAX(c) AS BIGINT) AS max_bucket
FROM per GROUP BY k ORDER BY k
"""


# --- Markov context-order predictability gain -----------------------------------


def markov_order_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-order predictability audit (the model-order question
    every sequence model starts with, answered with counts instead of
    entropy): predict each event's type from its 1-event and 2-event
    context by the exact MAJORITY rule (ties broken lexicographically),
    and report per order the context count, predictable events, and
    accuracy in ppm — the order-2 lift over order-1 is the memory in
    the stream, measured without a single logarithm.

    Scale shape: two user-key lag windows + two context censuses +
    one majority argmax per context (struct max) — all small keys."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    x = ev.select(
        F.col("event_type").alias("y"),
        F.lag("event_type", 1).over(w).alias("c1"),
        F.lag("event_type", 2).over(w).alias("c2"),
    )

    def order_row(df, ctx_cols, label):
        d = df
        for c in ctx_cols:
            d = d.where(F.col(c).isNotNull())
        cnt = d.groupBy(*ctx_cols, "y").agg(F.count(F.lit(1)).alias("n"))
        # majority with lexicographic tie-break, two-step (max n per
        # context, then min y among the tied) — struct-extremum argmax
        # orderings are a known cross-engine hazard
        mx = cnt.groupBy(*ctx_cols).agg(F.max("n").alias("mx"))
        pick = (
            cnt.join(mx, ctx_cols)
            .where(F.col("n") == F.col("mx"))
            .groupBy(*ctx_cols)
            .agg(F.min("y").alias("pred"), F.max("mx").alias("mx"))
        )
        tot = cnt.groupBy(*ctx_cols).agg(F.sum("n").alias("tot"))
        agg = (
            pick.join(tot, ctx_cols)
            .agg(
                F.count(F.lit(1)).alias("n_contexts"),
                F.sum("mx").alias("correct"),
                F.sum("tot").alias("events"),
            )
        )
        return agg.select(
            F.lit(label).cast("long").alias("order"),
            "n_contexts", "correct", "events",
            F.expr("CAST(div(1000000 * correct, events) AS BIGINT)").alias(
                "accuracy_ppm"
            ),
        )
    o1 = order_row(x, ["c1"], 1)
    o2 = order_row(x, ["c1", "c2"], 2)
    return o1.unionByName(o2).repartition(1).sortWithinPartitions("order")


def markov_order_gain_sql() -> str:
    def block(ctx, label):
        cols = ", ".join(ctx)
        notnull = " AND ".join(f"{c} IS NOT NULL" for c in ctx)
        return f"""
  SELECT {label} AS ord, COUNT(*) AS n_contexts,
         SUM(mx) AS correct, SUM(tot) AS events,
         (1000000 * SUM(mx)) // SUM(tot) AS accuracy_ppm
  FROM (
    SELECT {cols}, MAX(n) AS mx, SUM(n) AS tot
    FROM (SELECT {cols}, y, COUNT(*) AS n FROM x WHERE {notnull} GROUP BY {cols}, y)
    GROUP BY {cols}
  )"""
    return f"""
WITH x AS (
  SELECT event_type AS y,
         lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c1,
         lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS c2
  FROM events
)
SELECT CAST(ord AS BIGINT) AS "order",
       CAST(n_contexts AS BIGINT) AS n_contexts,
       CAST(correct AS BIGINT) AS correct,
       CAST(events AS BIGINT) AS events,
       CAST(accuracy_ppm AS BIGINT) AS accuracy_ppm
FROM (
{block(['c1'], 1)}
  UNION ALL
{block(['c1', 'c2'], 2)}
) ORDER BY "order"
"""


# --- repeat-purchase rate by first-order size decile ----------------------------


def repeat_by_first_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase behavioral cohort (does a big first order
    predict retention?): customers bucketed into deciles of their
    FIRST order's value (order by date then key, decile by global
    rank over the customer dim), each decile reporting customers,
    repeaters (>= 2 orders), repeat rate ppm, and mean first-order
    cents — the acquisition-quality table growth teams argue over,
    exact.

    Scale shape: one customer-key first-order pick (min struct), one
    customer-dim decile window, one 10-key census."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min(
            F.struct(
                "o_orderdate", "o_orderkey",
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
            )
        ).alias("first"),
    ).select(
        "o_custkey", "n_orders", F.col("first.cents").alias("first_cents")
    )
    x = per_cust.select(
        "o_custkey", "n_orders", "first_cents",
        F.expr(
            "CAST(div(10 * (row_number() OVER (ORDER BY first_cents DESC, o_custkey) - 1),"
            " count(1) OVER ()) AS BIGINT)"
        ).alias("decile"),
    )
    return (
        x.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.when(F.col("n_orders") >= 2, 1).otherwise(0)).alias("repeaters"),
            F.sum("first_cents").alias("first_cents_sum"),
        )
        .select(
            "decile", "n_customers", "repeaters",
            F.expr("CAST(div(1000000 * repeaters, n_customers) AS BIGINT)").alias(
                "repeat_ppm"
            ),
            F.expr("CAST(div(first_cents_sum, n_customers) AS BIGINT)").alias(
                "mean_first_cents"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("decile")
    )


def repeat_by_first_size_sql() -> str:
    return """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         MIN(struct_pack(d := o_orderdate, k := o_orderkey,
                         cents := CAST(round(o_totalprice * 100) AS BIGINT))) AS first
  FROM orders GROUP BY o_custkey
),
x AS (
  SELECT o_custkey, n_orders, first.cents AS first_cents,
         (10 * (row_number() OVER (ORDER BY first.cents DESC, o_custkey) - 1))
           // COUNT(*) OVER () AS decile
  FROM per_cust
)
SELECT CAST(decile AS BIGINT) AS decile,
       COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS repeaters,
       CAST((1000000 * SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS repeat_ppm,
       CAST(SUM(first_cents) // COUNT(*) AS BIGINT) AS mean_first_cents
FROM x GROUP BY decile ORDER BY decile
"""


# --- year-end event-study day-offset profile ------------------------------------


def event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-study day-offset profile (the +-7-day revenue shape
    around a recurring calendar event, here year-end): for each day
    offset -7..+7 from any December 31, the exact summed order cents
    across all years, order counts, and the offset's share of the
    15-day window in ppm — the seasonality microscope zoomed to one
    event, exact.

    Scale shape: map-only offset computation (day-of-year arithmetic,
    no calendar join) + a 15-key census."""
    o = _t(spark, sf_dir, "orders")
    doy = F.expr("dayofyear(o_orderdate)")
    yl = F.expr(
        "CASE WHEN (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 != 0)"
        " OR year(o_orderdate) % 400 = 0 THEN 366 ELSE 365 END"
    )
    off = F.expr(
        "CASE WHEN dayofyear(o_orderdate) <= 7 THEN dayofyear(o_orderdate)"
        " ELSE dayofyear(o_orderdate) - (CASE WHEN (year(o_orderdate) % 4 = 0"
        " AND year(o_orderdate) % 100 != 0) OR year(o_orderdate) % 400 = 0"
        " THEN 366 ELSE 365 END) END"
    )
    x = o.select(
        off.alias("offset"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    ).where((F.col("offset") >= -7) & (F.col("offset") <= 7))
    tot = x.agg(F.sum("cents").alias("wtot"))
    return (
        x.groupBy("offset")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("cents").alias("cents"))
        .crossJoin(tot)
        .select(
            "offset", "n_orders", "cents",
            F.expr("CAST(div(1000000 * cents, wtot) AS BIGINT)").alias("share_ppm"),
        )
        .repartition(1)
        .sortWithinPartitions("offset")
    )


def event_study_sql() -> str:
    leap = ("CASE WHEN (EXTRACT(year FROM o_orderdate) % 4 = 0 AND"
            " EXTRACT(year FROM o_orderdate) % 100 != 0) OR"
            " EXTRACT(year FROM o_orderdate) % 400 = 0 THEN 366 ELSE 365 END")
    return f"""
WITH x AS (
  SELECT CASE WHEN dayofyear(o_orderdate) <= 7 THEN dayofyear(o_orderdate)
              ELSE dayofyear(o_orderdate) - ({leap}) END AS offset_,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
f AS (SELECT * FROM x WHERE offset_ BETWEEN -7 AND 7),
tot AS (SELECT SUM(cents) AS wtot FROM f)
SELECT CAST(offset_ AS BIGINT) AS "offset",
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST((1000000 * SUM(cents)) // (SELECT wtot FROM tot) AS BIGINT) AS share_ppm
FROM f GROUP BY offset_ ORDER BY offset_
"""


# --- split-shipment span census -------------------------------------------------


def shipment_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-shipment span census (the fulfillment-quality pyramid:
    how many days separate an order's first and last shipment?): per
    order the exact ship-date span, rolled up by floor-log2(span+1)
    bucket with order counts, lineitem counts, and the span-days sum
    — single-shipment orders land in bucket 0.

    Scale shape: one order-key min/max census + a bucket rollup."""
    li = _t(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(
            "CAST(datediff(MAX(l_shipdate), MIN(l_shipdate)) AS BIGINT)"
        ).alias("span_days"),
    )
    return (
        per.select(
            "l_orderkey", "n_items", "span_days",
            (F.length(F.expr("bin(span_days + 1)")) - 1).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").alias("n_items"),
            F.sum("span_days").alias("span_days_sum"),
        )
        .repartition(1)
        .sortWithinPartitions("bucket")
    )


def shipment_span_sql() -> str:
    return """
WITH per AS (
  SELECT l_orderkey, COUNT(*) AS n_items,
         CAST(date_diff('day', MIN(l_shipdate), MAX(l_shipdate)) AS BIGINT) AS span_days
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(length(bin(span_days + 1)) - 1 AS BIGINT) AS bucket,
       COUNT(*) AS n_orders,
       CAST(SUM(n_items) AS BIGINT) AS n_items,
       CAST(SUM(span_days) AS BIGINT) AS span_days_sum
FROM per GROUP BY bucket ORDER BY bucket
"""


# --- dormancy / reactivation census ---------------------------------------------

_DORMANT_DAYS = 180


def reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy-reactivation census (the winback table lifecycle
    marketing plans against): per customer the LONGEST gap between
    consecutive orders; customers bucket by floor-log2 of that gap in
    days, with counts, how many came back after a 180+ day dormancy
    (gap >= 180 with a later order — by construction every max gap
    has one), and revenue after the longest gap's end in exact cents.

    Scale shape: one customer-key lag window + one customer census +
    a bucket rollup."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    x = o.select(
        "o_custkey", "o_orderdate", "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
        F.expr(
            "CAST(datediff(o_orderdate, lag(o_orderdate) OVER"
            " (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS BIGINT)"
        ).alias("gap"),
    )
    per = x.where(F.col("gap").isNotNull()).groupBy("o_custkey").agg(
        F.max("gap").alias("max_gap"),
        F.sum(F.when(F.col("gap") >= _DORMANT_DAYS, F.col("cents"))).alias(
            "reactivation_cents"
        ),
        F.sum(F.when(F.col("gap") >= _DORMANT_DAYS, 1).otherwise(0)).alias(
            "n_reactivations"
        ),
    )
    return (
        per.select(
            (F.length(F.expr("bin(max_gap + 1)")) - 1).alias("gap_bucket"),
            "n_reactivations",
            F.coalesce(F.col("reactivation_cents"), F.lit(0)).alias("rc"),
        )
        .groupBy("gap_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("n_reactivations").alias("reactivations"),
            F.sum("rc").alias("reactivation_cents"),
        )
        .repartition(1)
        .sortWithinPartitions("gap_bucket")
    )


def reactivation_sql() -> str:
    return f"""
WITH x AS (
  SELECT o_custkey,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         CAST(date_diff('day',
              lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              o_orderdate) AS BIGINT) AS gap
  FROM orders
),
per AS (
  SELECT o_custkey, MAX(gap) AS max_gap,
         SUM(CASE WHEN gap >= {_DORMANT_DAYS} THEN cents END) AS reactivation_cents,
         SUM(CASE WHEN gap >= {_DORMANT_DAYS} THEN 1 ELSE 0 END) AS n_reactivations
  FROM x WHERE gap IS NOT NULL GROUP BY o_custkey
)
SELECT CAST(length(bin(max_gap + 1)) - 1 AS BIGINT) AS gap_bucket,
       COUNT(*) AS n_customers,
       CAST(SUM(n_reactivations) AS BIGINT) AS reactivations,
       CAST(SUM(COALESCE(reactivation_cents, 0)) AS BIGINT) AS reactivation_cents
FROM per GROUP BY gap_bucket ORDER BY gap_bucket
"""


# --- event-type streak census ---------------------------------------------------


def event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type streak census (the gaps-and-islands classic applied
    to behavior: how long do users stay in one activity mode?): per
    user stream, maximal runs of the same event type (run ids from a
    prefix sum of type-change flags), then per type the run count,
    longest run, and mean run length in ppm.

    Scale shape: two user-key windows (change flag, run id) + one run
    census + a 5-key rollup."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flag = ev.select(
        "user_id", "event_type",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0).alias("brk"),
        F.col("ts"), F.col("event_id"),
    )
    runs = flag.select(
        "user_id", "event_type",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("run_id"),
    )
    per_run = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.count(F.lit(1)).alias("len")
    )
    return (
        per_run.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.max("len").alias("max_len"),
            F.sum("len").alias("total_events"),
        )
        .select(
            "event_type", "n_runs", "max_len", "total_events",
            F.expr("CAST(div(1000000 * total_events, n_runs) AS BIGINT)").alias(
                "mean_len_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


def event_streaks_sql() -> str:
    return """
WITH flag AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w != event_type THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
runs AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM flag
),
per_run AS (
  SELECT user_id, run_id, event_type, COUNT(*) AS len
  FROM runs GROUP BY user_id, run_id, event_type
)
SELECT event_type,
       COUNT(*) AS n_runs,
       CAST(MAX(len) AS BIGINT) AS max_len,
       CAST(SUM(len) AS BIGINT) AS total_events,
       CAST((1000000 * SUM(len)) // COUNT(*) AS BIGINT) AS mean_len_ppm
FROM per_run GROUP BY event_type ORDER BY event_type
"""


# --- monthly leaderboard churn --------------------------------------------------

_LB_K = 20


def leaderboard_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leaderboard-churn census (how stable is a monthly top-20?): per
    consecutive month pair, the exact overlap of the top-20 supplier
    sets (revenue rank, supplier tie-break), the Jaccard in ppm, and
    the count of new entrants — the ranking-volatility series an ops
    report tracks; high churn means the leaderboard is noise.

    Scale shape: one (supplier, month) census + a month-local rank
    window + a self-join on adjacent months over k-sized sets."""
    li = _t(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        "l_suppkey", F.date_trunc("month", "l_shipdate").alias("m")
    ).agg(
        F.sum(F.expr("CAST(round(100 * l_extendedprice) AS BIGINT)")).alias("rev")
    )
    w = Window.partitionBy("m").orderBy(F.col("rev").desc(), "l_suppkey")
    top = monthly.select(
        "m", "l_suppkey", F.row_number().over(w).alias("rk")
    ).where(F.col("rk") <= _LB_K)
    nxt = top.select(
        F.expr("add_months(m, -1)").alias("m"), F.col("l_suppkey").alias("s2")
    )
    ov = (
        top.join(nxt, (top["m"] == nxt["m"]) & (top["l_suppkey"] == nxt["s2"]))
        .groupBy(top["m"].alias("m"))
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    months = top.select("m").distinct()
    pairs = months.join(
        nxt.select("m").distinct(), "m"
    )  # months that HAVE a successor month in the data
    out = pairs.join(ov, "m", "left").select(
        F.col("m").cast("date").alias("m"),
        F.coalesce(F.col("overlap"), F.lit(0)).alias("overlap"),
        F.expr(
            f"CAST(div(1000000 * coalesce(overlap, 0), {2 * _LB_K} - coalesce(overlap, 0))"
            " AS BIGINT)"
        ).alias("jaccard_ppm"),
        (F.lit(_LB_K) - F.coalesce(F.col("overlap"), F.lit(0))).alias("new_entrants"),
    )
    return out.repartition(1).sortWithinPartitions("m")


def leaderboard_churn_sql() -> str:
    return f"""
WITH monthly AS (
  SELECT l_suppkey, date_trunc('month', l_shipdate) AS m,
         SUM(CAST(round(100 * l_extendedprice) AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_suppkey, m
),
top AS (
  SELECT m, l_suppkey FROM (
    SELECT m, l_suppkey,
           row_number() OVER (PARTITION BY m ORDER BY rev DESC, l_suppkey) AS rk
    FROM monthly
  ) WHERE rk <= {_LB_K}
),
nxt AS (SELECT m - INTERVAL 1 MONTH AS m, l_suppkey AS s2 FROM top),
ov AS (
  SELECT top.m, COUNT(*) AS overlap
  FROM top JOIN nxt ON nxt.m = top.m AND nxt.s2 = top.l_suppkey
  GROUP BY top.m
),
pairs AS (
  SELECT DISTINCT top.m FROM top JOIN (SELECT DISTINCT m FROM nxt) x ON x.m = top.m
)
SELECT CAST(pairs.m AS DATE) AS m,
       CAST(COALESCE(overlap, 0) AS BIGINT) AS overlap,
       CAST((1000000 * COALESCE(overlap, 0)) // ({2 * _LB_K} - COALESCE(overlap, 0)) AS BIGINT) AS jaccard_ppm,
       CAST({_LB_K} - COALESCE(overlap, 0) AS BIGINT) AS new_entrants
FROM pairs LEFT JOIN ov ON ov.m = pairs.m
ORDER BY m
"""


# --- peak-hour census per event type --------------------------------------------


def peak_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-hour census (the capacity-planning table: when does each
    event type spike?): per event type the exact hour-of-day counts
    reduced to the peak hour (max count, earliest hour tie-break),
    its count, the quietest hour, and the peak-to-trough ratio in ppm.

    Scale shape: one (type, hour) census + two key-local argmax
    picks."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("h")
    )
    cnt = ev.groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n"))
    mx = cnt.groupBy("event_type").agg(
        F.max("n").alias("mxn"), F.min("n").alias("mnn")
    )
    peak = (
        cnt.join(mx, "event_type")
        .where(F.col("n") == F.col("mxn"))
        .groupBy("event_type")
        .agg(F.min("h").alias("peak_hour"), F.max("mxn").alias("peak_n"))
    )
    trough = (
        cnt.join(mx, "event_type")
        .where(F.col("n") == F.col("mnn"))
        .groupBy("event_type")
        .agg(F.min("h").alias("trough_hour"), F.max("mnn").alias("trough_n"))
    )
    return (
        peak.join(trough, "event_type")
        .select(
            "event_type", "peak_hour", "peak_n", "trough_hour", "trough_n",
            F.expr("CAST(div(1000000 * peak_n, trough_n) AS BIGINT)").alias(
                "ratio_ppm"
            ),
        )
        .repartition(1)
        .sortWithinPartitions("event_type")
    )


def peak_hours_sql() -> str:
    return """
WITH cnt AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS h, COUNT(*) AS n
  FROM events GROUP BY event_type, h
),
mx AS (
  SELECT event_type, MAX(n) AS mxn, MIN(n) AS mnn FROM cnt GROUP BY event_type
),
peak AS (
  SELECT cnt.event_type, MIN(h) AS peak_hour, MAX(mxn) AS peak_n
  FROM cnt JOIN mx ON mx.event_type = cnt.event_type AND cnt.n = mx.mxn
  GROUP BY cnt.event_type
),
trough AS (
  SELECT cnt.event_type, MIN(h) AS trough_hour, MAX(mnn) AS trough_n
  FROM cnt JOIN mx ON mx.event_type = cnt.event_type AND cnt.n = mx.mnn
  GROUP BY cnt.event_type
)
SELECT peak.event_type,
       CAST(peak_hour AS BIGINT) AS peak_hour,
       CAST(peak_n AS BIGINT) AS peak_n,
       CAST(trough_hour AS BIGINT) AS trough_hour,
       CAST(trough_n AS BIGINT) AS trough_n,
       CAST((1000000 * peak_n) // trough_n AS BIGINT) AS ratio_ppm
FROM peak JOIN trough ON trough.event_type = peak.event_type
ORDER BY peak.event_type
"""


# --- acquisition-cohort LTV triangle --------------------------------------------


def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-cohort LTV triangle (the finance twin of the
    retention triangle: revenue by WHO was acquired when x HOW old
    the relationship was): customers cohort by first-order quarter;
    every order lands in (cohort quarter, age in quarters) with exact
    cents and order counts — the table LTV projections integrate.

    Scale shape: one customer-key first-order census + a broadcast
    cohort join + one (cohort, age) census."""
    o = _t(spark, sf_dir, "orders")
    first = o.groupBy("o_custkey").agg(
        F.min(F.date_trunc("quarter", "o_orderdate")).alias("cohort_q")
    )
    x = o.join(first, "o_custkey").select(
        F.col("cohort_q"),
        F.expr(
            "CAST(months_between(date_trunc('quarter', o_orderdate), cohort_q)"
            " / 3 AS BIGINT)"
        ).alias("age_q"),
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    return (
        x.groupBy("cohort_q", "age_q")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("cents"),
        )
        .select(
            F.col("cohort_q").cast("date").alias("cohort_q"),
            "age_q", "n_orders", "cents",
        )
        .repartition(1)
        .sortWithinPartitions("cohort_q", "age_q")
    )


def cohort_ltv_sql() -> str:
    return """
WITH first AS (
  SELECT o_custkey, MIN(date_trunc('quarter', o_orderdate)) AS cohort_q
  FROM orders GROUP BY o_custkey
),
x AS (
  SELECT cohort_q,
         CAST(datediff('month', cohort_q, date_trunc('quarter', o_orderdate)) // 3 AS BIGINT) AS age_q,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN first USING (o_custkey)
)
SELECT CAST(cohort_q AS DATE) AS cohort_q,
       CAST(age_q AS BIGINT) AS age_q,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM x GROUP BY cohort_q, age_q ORDER BY cohort_q, age_q
"""


# --- purchase-value tail ratios (exact order statistics) ------------------------


def purchase_tails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-value tail table by exact discrete order statistics
    (P50 / P90 / P99 / max in cents, each the literal element at rank
    ceil(q*n) — no interpolation, engine-identical): plus the
    P99-to-P50 tail ratio in ppm, the concentration signal pricing
    and fraud teams watch.

    Scale shape: one global rank window over the purchase subset +
    three rank picks — purchase-count sized."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase").select(
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        "event_id",
    )
    w = Window.orderBy("cents", "event_id")
    wn = Window.partitionBy()
    x = ev.select(
        "cents",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(qnum, qden, name):
        return x.where(
            F.col("rk") == F.expr(f"CAST(ceil({qnum} * n / {qden}.0) AS BIGINT)")
        ).select(F.col("cents").alias(name), F.col("n").alias(f"n_{name}"))
    p50 = pick(1, 2, "p50")
    p90 = pick(9, 10, "p90")
    p99 = pick(99, 100, "p99")
    mx = ev.agg(F.max("cents").alias("max_cents"), F.count(F.lit(1)).alias("n"))
    return (
        p50.crossJoin(p90).crossJoin(p99).crossJoin(mx)
        .select(
            "n", F.col("p50").alias("p50_cents"), F.col("p90").alias("p90_cents"),
            F.col("p99").alias("p99_cents"), "max_cents",
            F.expr("CAST(div(1000000 * p99, p50) AS BIGINT)").alias(
                "tail_ratio_ppm"
            ),
        )
    )


def purchase_tails_sql() -> str:
    return """
WITH ev AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id
  FROM events WHERE event_type = 'purchase'
),
x AS (
  SELECT cents, row_number() OVER (ORDER BY cents, event_id) AS rk,
         COUNT(*) OVER () AS n
  FROM ev
),
p50 AS (SELECT cents AS p50 FROM x WHERE rk = CAST(ceil(n / 2.0) AS BIGINT)),
p90 AS (SELECT cents AS p90 FROM x WHERE rk = CAST(ceil(9 * n / 10.0) AS BIGINT)),
p99 AS (SELECT cents AS p99 FROM x WHERE rk = CAST(ceil(99 * n / 100.0) AS BIGINT)),
mx AS (SELECT MAX(cents) AS max_cents, COUNT(*) AS n FROM ev)
SELECT CAST(n AS BIGINT) AS n,
       CAST(p50 AS BIGINT) AS p50_cents,
       CAST(p90 AS BIGINT) AS p90_cents,
       CAST(p99 AS BIGINT) AS p99_cents,
       CAST(max_cents AS BIGINT) AS max_cents,
       CAST((1000000 * p99) // p50 AS BIGINT) AS tail_ratio_ppm
FROM p50, p90, p99, mx
"""
