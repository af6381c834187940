"""Relational dataset-plane queries over the TPC-H-ish tables + events:
aggregation, broadcast joins, window ranking, tumbling windows, and
sessionization (gaps-and-islands). These exercise the Spark primitives the
extraction pipeline relies on (D7 hash aggregate, D10 broadcast join) at
query scale.

Float discipline: money math in DECIMAL(18,4) on both engines so parallel
sum order cannot perturb the result; timestamps diffed in microseconds.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from . import QuerySpec, table


def pricing_summary(spark, sf_dir):
    """TPC-H Q1-style pricing summary on lineitem (exact decimal sums)."""
    li = table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    # scales chosen so no rounding ever occurs (prices have 2 decimals,
    # discounts 2, so the product has exactly 4): engines agree bit-exactly
    # internal math stays DECIMAL (exact, order-insensitive); only the
    # OUTPUT column is cast to double/rounded so both engines' client fetch
    # paths materialize the identical float64 (DuckDB renders any SUM as
    # HUGEINT/DECIMAL(38,x) -> float64 through pandas; Spark would return
    # Decimal objects — same value, different repr, hash mismatch)
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum(dec("l_quantity")).cast("double"), 2)
                .alias("sum_qty"),
                F.round(F.sum(dec("l_extendedprice")).cast("double"), 2)
                .alias("sum_base_price"),
                F.round(F.sum((dec("l_extendedprice")
                               * (F.lit(1).cast("decimal(18,4)")
                                  - dec("l_discount"))).cast("decimal(18,4)"))
                        .cast("double"), 4).alias("sum_disc_price"),
                F.count("*").alias("count_order")))


PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS sum_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS sum_base_price,
       ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
                     (CAST(1 AS DECIMAL(18,4)) -
                      CAST(l_discount AS DECIMAL(18,4)))
                     AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark, sf_dir):
    """Order revenue per nation/region: fact table joined to broadcast
    dimensions (customer -> nation -> region)."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return (orders
            .join(F.broadcast(customer),
                  orders.o_custkey == customer.c_custkey)
            .join(F.broadcast(nation),
                  customer.c_nationkey == nation.n_nationkey)
            .join(F.broadcast(region),
                  nation.n_regionkey == region.r_regionkey)
            .groupBy(F.col("r_name").alias("region_name"),
                     F.col("n_name").alias("nation_name"))
            .agg(
                F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                        .cast("double"), 2).alias("revenue"),
                F.count("*").alias("n_orders"),
                F.countDistinct("o_custkey").alias("n_customers")))


REVENUE_SQL = """
SELECT r_name AS region_name, n_name AS nation_name,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS revenue,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def top_orders_per_segment(spark, sf_dir):
    """Window ranking: top-3 orders by price inside each market segment."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    joined = orders.join(F.broadcast(customer),
                         orders.o_custkey == customer.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .where("rank <= 3")
            .select(F.col("c_mktsegment").alias("segment"), "rank",
                    "o_orderkey",
                    F.round(F.col("o_totalprice").cast("double"), 2)
                    .alias("total_price")))


TOP_ORDERS_SQL = """
WITH ranked AS (
  SELECT c_mktsegment AS segment, o_orderkey,
         ROUND(CAST(o_totalprice AS DOUBLE), 2) AS total_price,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC)
           AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT segment, rank, o_orderkey, total_price FROM ranked WHERE rank <= 3
"""


def events_hourly(spark, sf_dir):
    """Tumbling 1-hour windows over the events stream table (the batch
    shape of the Structured Streaming aggregation)."""
    ev = table(spark, sf_dir, "events")
    # hour_start is emitted as epoch MICROS (bigint), not a timestamp: the
    # parquet column is TIMESTAMP_NTZ and a naked timestamp would collect
    # in whatever session timezone the driver happens to run under.
    # timestampdiff from the NTZ epoch is pure wall-clock arithmetic.
    return (ev.groupBy(
        F.window("ts", "1 hour")["start"].alias("hs"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,4)"))
                     .cast("double"), 4).alias("value_sum"),
             F.countDistinct("user_id").alias("n_users"))
        .select(
            F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00', hs)")
            .alias("hour_start_us"),
            "event_type", "n_events", "value_sum", "n_users"))


EVENTS_HOURLY_SQL = """
SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS value_sum,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def sessionize(spark, sf_dir):
    """Sessionization via gaps-and-islands: a new session starts after a
    30-minute silence; microsecond-exact on both engines."""
    ev = table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, 0)
    flagged = (ev
               .withColumn("prev_ts", F.lag("ts").over(order_w))
               .withColumn(
                   "is_new",
                   (F.col("prev_ts").isNull()
                    | (F.col("ts") - F.col("prev_ts")
                       > F.expr("INTERVAL '30' MINUTE"))).cast("long"))
               .withColumn("session_seq", F.sum("is_new").over(run_w)))
    return (flagged.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.expr("timestampdiff(MICROSECOND, "
                        "TIMESTAMP_NTZ '1970-01-01 00:00:00', min(ts))")
                 .alias("session_start_us"),
                 F.round(F.expr(
                     "timestampdiff(MICROSECOND, min(ts), max(ts))")
                     / 1000000.0, 6).alias("duration_sec")))


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL '30' MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM flagged
)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       epoch_us(MIN(ts)) AS session_start_us,
       ROUND(date_diff('microsecond', MIN(ts), MAX(ts)) / 1000000.0, 6)
         AS duration_sec
FROM sessions GROUP BY user_id, session_seq
"""


def sessionize_native(spark, sf_dir):
    """The same sessionization computed with Spark's BUILT-IN
    session_window operator (dynamic-gap session merging) instead of
    hand-rolled gaps-and-islands — the two must agree, and the oracle pins
    the shared semantic: a gap >= 30 minutes starts a new session
    (session_window ends are exclusive, so an event landing exactly at
    start+gap opens a new window)."""
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,4)"))
                     .cast("double"), 4).alias("value_sum"),
             F.expr("timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', min(ts))")
             .alias("session_start_us"))
        .select("user_id", "session_start_us", "n_events", "value_sum"))


SESSIONIZE_NATIVE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL '30' MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, epoch_us(MIN(ts)) AS session_start_us,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS value_sum
FROM sessions GROUP BY user_id, session_seq
"""


def pricing_cube(spark, sf_dir):
    """Grouping sets: CUBE over (returnflag, linestatus) with decimal-exact
    sums and grouping-id markers."""
    li = table(spark, sf_dir, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                         .cast("double"), 2).alias("sum_qty"),
                 F.count("*").alias("n_items"),
                 F.grouping("l_returnflag").cast("int").alias("g_flag"),
                 F.grouping("l_linestatus").cast("int").alias("g_status")))


PRICING_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS sum_qty,
       COUNT(*) AS n_items,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def order_key_set_ops(spark, sf_dir):
    """Set operations: customers ordering in the URGENT tier INTERSECT the
    high-value tier, minus the LOW tier (intersect/except on key sets)."""
    orders = table(spark, sf_dir, "orders")
    urgent = orders.where("o_orderpriority like '1%'") \
        .select("o_custkey").distinct()
    high_value = orders.where("o_totalprice > 200000") \
        .select("o_custkey").distinct()
    low = orders.where("o_orderpriority like '5%'") \
        .select("o_custkey").distinct()
    return (urgent.intersect(high_value).exceptAll(low)
            .select(F.col("o_custkey").alias("custkey")))


SET_OPS_SQL = """
SELECT o_custkey AS custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority LIKE '1%'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority LIKE '5%'
)
"""


def asof_attribution(spark, sf_dir):
    """AS-OF JOIN, composed from Spark primitives: every purchase event is
    attributed to the same user's most recent click at-or-before it
    (classic attribution / point-in-time-correct feature lookup).

    Scale shape: NOT a range join (which Spark would plan as a per-key
    cross product) — clicks and purchases are unioned and a single
    partitionBy(user) orderBy(ts) running last_value(click, ignorenulls)
    window does the as-of matching in ONE shuffle, O(n log n_partition)
    sort, no pair blow-up even for hot users. The oracle is DuckDB's
    NATIVE ASOF LEFT JOIN operator — two independent as-of
    implementations (composed window vs built-in physical operator) must
    agree row-for-row.

    Equal-ts semantics (r3 ADVICE): the ASOF bound p.ts >= c.ts is
    INCLUSIVE, so a click at exactly the purchase's ts must attribute.
    The window orders (ts, type_rank, event_id) with clicks ranked
    BEFORE purchases, so the running last at the purchase row has
    already seen any co-timed click regardless of event_id ordering —
    cross-engine agreement no longer rests on the synthetic table's
    (user_id, ts) uniqueness (which tests/test_relational.py still
    asserts, since equal-ts click pairs would remain engine-ambiguous
    in the oracle's ASOF operator itself)."""
    ev = (table(spark, sf_dir, "events")
          .where(F.col("event_type").isin("click", "purchase"))
          .select("event_id", "user_id", "ts", "event_type"))
    marked = ev.select(
        "event_id", "user_id", "ts", "event_type",
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(1)
        .alias("type_rank"),
        F.when(F.col("event_type") == "click", F.col("event_id"))
        .alias("c_id"),
        F.when(F.col("event_type") == "click", F.col("ts")).alias("c_ts"))
    w = (Window.partitionBy("user_id")
         .orderBy("ts", "type_rank", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    att = (marked
           .withColumn("click_id", F.last("c_id", ignorenulls=True).over(w))
           .withColumn("click_ts", F.last("c_ts", ignorenulls=True).over(w))
           .where(F.col("event_type") == "purchase"))
    us = ("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
          " %s)")
    # unattributed purchases use a -1 sentinel, not NULL: nullable bigint
    # columns come back float64 through pandas (fetch-stable-type rule)
    return att.select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.expr(us % "ts").alias("purchase_ts_us"),
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce(F.expr(us % "ts") - F.expr(us % "click_ts"),
                   F.lit(-1)).alias("lag_us"))


ASOF_SQL = """
SELECT p.event_id AS purchase_id, p.user_id,
       epoch_us(p.ts) AS purchase_ts_us,
       COALESCE(c.event_id, -1) AS click_id,
       COALESCE(epoch_us(p.ts) - epoch_us(c.ts), -1) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def events_sliding_3h(spark, sf_dir):
    """Sliding windows (3-hour span, 1-hour slide): each event lands in 3
    overlapping windows — Spark's window() generates the replicas before
    one hash aggregate (map-side combinable; state is 3x the tumbling
    equivalent, not per-event)."""
    ev = table(spark, sf_dir, "events")
    return (ev.groupBy(
        F.window("ts", "3 hours", "1 hour")["start"].alias("ws"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum(F.col("value").cast("decimal(18,4)"))
                     .cast("double"), 4).alias("value_sum"))
        .select(
            F.expr("timestampdiff(MICROSECOND, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00', ws)")
            .alias("window_start_us"),
            "n_events", "value_sum"))


EVENTS_SLIDING_SQL = """
SELECT epoch_us(date_trunc('hour', ts) - INTERVAL (k) HOUR)
         AS window_start_us,
       COUNT(*) AS n_events,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
         AS value_sum
FROM events, (SELECT unnest(generate_series(0, 2)) AS k) g
GROUP BY 1
"""


def min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-flavored correlated-min: per part, the supplier with the
    cheapest observed supply (min lineitem extendedprice per (part,
    supplier)), winner picked by row_number over (cost, s_suppkey) — a
    deterministic tie-break, so the result is exact, not 'any min'.

    Scale shape: lineitem -> one hash aggregate on the composite key
    (map-side combinable), then a window over l_partkey (same hash
    partitioning, AQE coalesces); supplier and nation broadcast; the
    part join is key-partitioned both sides (sort-merge at 100 TB — part
    grows with SF, never broadcast it)."""
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part")
    cost = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice").cast("decimal(18,4)"))
                 .alias("cost")))
    w = Window.partitionBy("l_partkey").orderBy("cost", "l_suppkey")
    best = cost.withColumn("rn", F.row_number().over(w)).where("rn = 1")
    return (best
            .join(part, best["l_partkey"] == part["p_partkey"])
            .join(F.broadcast(sup), best["l_suppkey"] == sup["s_suppkey"])
            .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
            .select("p_partkey", "p_brand", "s_name",
                    F.col("n_name").alias("supplier_nation"),
                    F.round(F.col("cost").cast("double"), 2)
                    .alias("min_supply_cost")))


MIN_COST_SQL = """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS cost
  FROM lineitem GROUP BY 1, 2
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY l_partkey
                               ORDER BY cost, l_suppkey) AS rn
  FROM cost
)
SELECT p_partkey, p_brand, s_name, n_name AS supplier_nation,
       ROUND(CAST(cost AS DOUBLE), 2) AS min_supply_cost
FROM best
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE rn = 1
"""


def market_share(spark, sf_dir):
    """TPC-H Q8-flavored market share: per order-year, each supplier
    nation's slice of ASIA-region revenue. Revenue stays exact DECIMAL
    through both aggregates; the share is one double division of two
    identical exact values (IEEE-deterministic), rounded at the edge.

    Scale shape: the only big-big join is lineitem->orders on orderkey
    (sort-merge); supplier/nation/region are broadcast; the year total
    reuses the groupBy output via a window over o_year instead of a
    second scan-and-join."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    sup = table(spark, sf_dir, "supplier")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    supnat = (sup
              .join(F.broadcast(nat),
                    sup["s_nationkey"] == nat["n_nationkey"])
              .join(F.broadcast(reg.where("r_name = 'ASIA'")),
                    nat["n_regionkey"] == reg["r_regionkey"])
              .select("s_suppkey", F.col("n_name").alias("supp_nation")))
    rev = li.select(
        "l_orderkey", "l_suppkey",
        (dec("l_extendedprice")
         * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("decimal(18,4)").alias("r"))
    joined = (rev
              .join(F.broadcast(supnat),
                    rev["l_suppkey"] == supnat["s_suppkey"])
              .join(orders.select(
                  "o_orderkey", F.year("o_orderdate").alias("o_year")),
                  rev["l_orderkey"] == F.col("o_orderkey")))
    by_nation = (joined.groupBy("o_year", "supp_nation")
                 .agg(F.sum("r").alias("nrev")))
    year_w = Window.partitionBy("o_year")
    return (by_nation
            .withColumn("yrev", F.sum("nrev").over(year_w))
            .select(F.col("o_year").cast("int").alias("o_year"),
                    "supp_nation",
                    # round AT the sum's intrinsic scale (4): no value
                    # changes, so the Spark-vs-DuckDB double HALF_UP
                    # tie divergence (1.005 -> 1.01 vs 1.00) cannot fire
                    F.round(F.col("nrev").cast("double"), 4)
                    .alias("nation_revenue"),
                    F.round(F.col("nrev").cast("double")
                            / F.col("yrev").cast("double"), 6)
                    .alias("mkt_share")))


MARKET_SHARE_SQL = """
WITH rev AS (
  SELECT year(o_orderdate) AS o_year, n_name AS supp_nation,
         CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
              (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
              AS DECIMAL(18,4)) AS r
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
by_nation AS (
  SELECT o_year, supp_nation, SUM(r) AS nrev FROM rev GROUP BY 1, 2
)
SELECT CAST(o_year AS INT) AS o_year, supp_nation,
       ROUND(CAST(nrev AS DOUBLE), 4) AS nation_revenue,
       ROUND(CAST(nrev AS DOUBLE) /
             CAST(SUM(nrev) OVER (PARTITION BY o_year) AS DOUBLE), 6)
         AS mkt_share
FROM by_nation
"""


def latest_event_per_user(spark, sf_dir):
    """Keep-latest compaction — the web-crawl 'latest snapshot per url'
    / CDC-upsert pattern: one row per (user_id, event_type), keeping the
    most recent event by (ts, event_id). One hash shuffle on the key; at
    100 TB this is the standard row_number compaction (with AQE handling
    hot keys; no sort of the whole table, only within key groups)."""
    ev = table(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id", "event_type")
         .orderBy(F.desc("ts"), F.desc("event_id")))
    return (ev.withColumn("rn", F.row_number().over(w)).where("rn = 1")
            .select("user_id", "event_type", "event_id",
                    F.expr("timestampdiff(MICROSECOND, "
                           "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
                    .alias("ts_us"),
                    F.round(F.col("value").cast("decimal(18,4)")
                            .cast("double"), 4).alias("value")))


LATEST_EVENT_SQL = """
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us,
       ROUND(CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE), 4) AS value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY ts DESC, event_id DESC) = 1
"""


def user_state_intervals(spark, sf_dir):
    """SCD2 history build — latest_event_per_user's keep-ALL sibling:
    each event opens a validity interval for that user's state (the
    event_type), closed by the user's next event; the newest interval
    stays open (valid_to_us = -1 sentinel, is_current = true — nullable
    bigints come back float64 through pandas, the fetch-stable rule).
    ONE shuffle (window partitionBy user, sort within key groups only)
    — the standard dimension-history derivation from a CDC event log at
    any scale. Deterministic: (user_id, ts) is unique and event_id
    breaks any residual tie in both engines."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = ("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
          "00:00:00', %s)")
    return (ev
            .withColumn("nxt", F.lead("ts").over(w))
            .select(
                "user_id", "event_id", "event_type",
                F.expr(us % "ts").alias("valid_from_us"),
                F.coalesce(F.expr(us % "nxt"), F.lit(-1))
                .alias("valid_to_us"),
                F.col("nxt").isNull().alias("is_current")))


USER_STATE_INTERVALS_SQL = """
SELECT user_id, event_id, event_type,
       epoch_us(ts) AS valid_from_us,
       COALESCE(epoch_us(lead(ts) OVER w), -1) AS valid_to_us,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


QUERIES = {
    "asof_attribution": QuerySpec(asof_attribution, ASOF_SQL),
    "events_sliding_3h": QuerySpec(events_sliding_3h, EVENTS_SLIDING_SQL),
    "pricing_summary": QuerySpec(pricing_summary, PRICING_SQL),
    "pricing_cube": QuerySpec(pricing_cube, PRICING_CUBE_SQL),
    "order_key_set_ops": QuerySpec(order_key_set_ops, SET_OPS_SQL),
    "revenue_by_nation": QuerySpec(revenue_by_nation, REVENUE_SQL),
    "top_orders_per_segment": QuerySpec(top_orders_per_segment,
                                        TOP_ORDERS_SQL),
    "events_hourly": QuerySpec(events_hourly, EVENTS_HOURLY_SQL),
    "sessionize": QuerySpec(sessionize, SESSIONIZE_SQL),
    "sessionize_native": QuerySpec(sessionize_native, SESSIONIZE_NATIVE_SQL),
    "min_cost_supplier": QuerySpec(min_cost_supplier, MIN_COST_SQL),
    "market_share": QuerySpec(market_share, MARKET_SHARE_SQL),
    "latest_event_per_user": QuerySpec(latest_event_per_user,
                                       LATEST_EVENT_SQL),
    "user_state_intervals": QuerySpec(user_state_intervals,
                                      USER_STATE_INTERVALS_SQL),
}
