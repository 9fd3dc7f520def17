"""Relational operator coverage (SURVEY.md §2.2-2.8) on the TPC-H-ish
testdata tables. Each query is idiomatic DataFrame API — Catalyst gets
the declarative plan (pushdown, pruning, join selection run free) —
with an equivalent DuckDB oracle.

Scale notes are attached per query: which joins broadcast, where the
shuffles are, why the plan survives 100x data.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from qwery_spark.suite import load, register


# --- aggregation (reference §2.4: global + grouped agg) ----------------
@register(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: scan -> partial agg -> final agg. One shuffle on "
    "2 low-cardinality keys; map-side combine reduces 100TB to KBs.",
)
def q01_pricing_summary(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc), 4).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- joins (reference §2.3 — only nested-loop inner join existed; we do
# the full broadcast/shuffle-hash family) --------------------------------
@register(
    "q03_segment_revenue",
    """
    SELECT o.o_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-03-15'
    GROUP BY o.o_orderkey
    HAVING sum(l.l_extendedprice * (1 - l.l_discount)) > 1000
    """,
    doc="3-way join + agg + HAVING. customer filter broadcast into orders; "
    "orders->lineitem shuffles on orderkey (co-partitioned at scale via "
    "bucketing on orderkey).",
)
def q03_segment_revenue(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # lineitem must be the STREAM side: its column-pruned size estimate
    # (3 of 16 columns) sneaks under the broadcast threshold, and the
    # planner otherwise broadcasts the 6M-row fact table — a driver-built
    # multi-100MB hash relation — while streaming the ~300k-row filtered
    # orders⋈customer side. Broadcasting the small dimension result
    # keeps the one exchange at the final aggregation (guide §3.1:
    # estimates are often badly wrong after filters; hint explicitly).
    dims = F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey))
    return (
        li.join(dims, li.l_orderkey == o.o_orderkey)
        .groupBy(o.o_orderkey.alias("orderkey"))
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
        .filter(F.col("revenue") > 1000)
    )


@register(
    "q05_nation_revenue",
    """
    SELECT n.n_name AS nation, r.r_name AS region,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name, r.r_name
    """,
    doc="5-way star join. nation/region/customer broadcast (dims); the one "
    "real shuffle is lineitem->orders on orderkey.",
)
def q05_nation_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(F.round(F.sum(rev), 4).alias("revenue"))
    )


@register(
    "q06_forecast_revenue",
    """
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
    """,
    doc="Pure scan+filter+global agg: all predicates push to the parquet "
    "reader (PushedFilters), zero shuffle.",
)
def q06_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- projection / filter / CASE / CAST / LIKE (reference §2.2) ---------
@register(
    "q_filter_case_cast",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CASE WHEN l_returnflag = 'R' THEN 'returned'
                WHEN l_tax > 0.05 THEN 'taxed' ELSE 'ok' END AS status,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    WHERE l_linestatus LIKE 'F%' AND l_quantity >= 30
    """,
    doc="SELECT-list projection with searched CASE (reference Case.scala), "
    "CAST (Cast.scala, sane non-lenient), LIKE (correct SQL semantics vs "
    "the reference's unescaped-regex translate, Condition.scala:31-38).",
)
def q_filter_case_cast(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_linestatus").like("F%") & (F.col("l_quantity") >= 30)).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.when(F.col("l_returnflag") == "R", "returned")
        .when(F.col("l_tax") > 0.05, "taxed")
        .otherwise("ok")
        .alias("status"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
    )


# --- sort / limit / top-k (reference §2.6: ORDER BY parsed-not-executed;
# we implement it for real, with deterministic tiebreaks) ----------------
@register(
    "q_top10_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 4) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="Top-K: Spark's TakeOrderedAndProject — per-partition heap + driver "
    "merge, no global sort even at 10^10 rows.",
)
def q_top10_orders(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("total"))
        .limit(10)
    )


# --- window functions (§2.5 — absent in reference; core to our CDC) ----
@register(
    "q_window_top3_per_cust",
    """
    SELECT custkey, orderkey, rn FROM (
      SELECT o_custkey AS custkey, o_orderkey AS orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    doc="Top-N per group via ranking window — the same shape as the CDC "
    "LWW dedup (row_number over ordinal desc).",
)
def q_window_top3_per_cust(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("orderkey"), "rn"
        )
    )


@register(
    "q_window_running_sum",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
    FROM events WHERE user_id < 10
    """,
    doc="Frame-spec window (running total) — event-stream sessionization "
    "building block.",
)
def q_window_running_sum(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id", F.round(F.sum("value").over(w), 4).alias("running_value")
    )


# --- set ops (§2.7: reference UNION = UNION ALL only) -------------------
@register(
    "q_union_all",
    """
    SELECT kind, count(*) AS n FROM (
      SELECT 'high_bal' AS kind FROM customer WHERE c_acctbal > 7000
      UNION ALL
      SELECT 'big_supp' AS kind FROM supplier WHERE s_acctbal > 7000
    ) u GROUP BY kind
    """,
    doc="UNION ALL (iterator-concat semantics of reference Union.scala) + "
    "a grouped count to make the result stable.",
)
def q_union_all(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7000).select(
        F.lit("high_bal").alias("kind")
    )
    s = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 7000).select(
        F.lit("big_supp").alias("kind")
    )
    return c.unionAll(s).groupBy("kind").agg(F.count("*").alias("n"))


@register(
    "q_intersect_except",
    """
    SELECT 'both' AS which, count(*) AS n FROM (
      SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS which, count(*) AS n FROM (
      SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    """,
    doc="INTERSECT/EXCEPT — absent in the reference (§2.7), built-in here.",
)
def q_intersect_except(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select("c_nationkey")
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("c_nationkey"))
    both = c.intersect(s).agg(F.count("*").alias("n")).select(F.lit("both").alias("which"), "n")
    only = c.subtract(s).agg(F.count("*").alias("n")).select(
        F.lit("cust_only").alias("which"), "n"
    )
    return both.unionAll(only)


# --- distinct / semi / anti (absent in reference; §2.3/§2.4) ------------
@register(
    "q_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    doc="DISTINCT = groupBy under the hood; partial-agg dedup before shuffle.",
)
def q_distinct(spark, sf_dir):
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_anti_join",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Anti join (customers without orders). Broadcast-able when the "
    "right side's distinct keys are small.",
)
def q_anti_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "q_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 50000)
    """,
    doc="Semi join with pushed predicate on the probe side.",
)
def q_semi_join(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 50000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


# --- scalar functions (reference §2.8 table) ----------------------------
@register(
    "q_scalar_strings",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           substr(c_name, 1, 8) AS name_left8,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_padded,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           trim(concat(' ', c_mktsegment, ' ')) AS seg_trim
    FROM customer WHERE c_custkey <= 200
    """,
    doc="Scalar string surface: LEN/TRIM/LEFT/CONCAT/PADLEFT per reference "
    "builtins (Len.scala, Trim.scala, Left.scala, Concat.scala, "
    "PadLeft.scala) — Spark builtins, whole-stage codegen.",
)
def q_scalar_strings(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_left8"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_padded"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
    )


@register(
    "q_scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 6) AS qty_sqrt,
           round(pow(1 + l_tax, 2), 6) AS tax_sq,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
    FROM lineitem WHERE l_orderkey <= 100
    """,
    doc="Math builtins: SQRT/POW/SIGN (reference Sqrt.scala, Pow.scala, "
    "Sign.scala).",
)
def q_scalar_math(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("disc_sign"),
    )


@register(
    "q_date_funcs",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           count(*) AS n_orders,
           round(sum(o_totalprice), 4) AS month_total
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY 1
    """,
    doc="DATE_FORMAT/DATE_PARSE surface (reference DateFormat.scala, "
    "DateParse.scala) as date_format + grouped rollup by month.",
)
def q_date_funcs(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
    )
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("month_total"),
        )
    )


@register(
    "q_conditional_agg",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           round(avg(CASE WHEN o_totalprice > 10000 THEN o_totalprice END), 4) AS avg_big
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Pivot-style conditional aggregation (sum-of-CASE).",
)
def q_conditional_agg(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.round(
            F.avg(F.when(F.col("o_totalprice") > 10000, F.col("o_totalprice"))), 4
        ).alias("avg_big"),
    )


@register(
    "q_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets — beyond the reference's single-key GROUP BY "
    "(Select.scala:75-76 groups on only the first key).",
)
def q_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
    )


# --- percentiles (exact; interpolated identically in both engines) -----
@register(
    "q_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact percentiles per group (Spark `percentile`; at 100TB the "
    "approx_percentile sketch replaces it — same query shape).",
)
def q_percentiles(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
    )


# --- pivot ---------------------------------------------------------------
@register(
    "q_pivot_returnflag",
    """
    SELECT l_linestatus,
           round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 4) AS A,
           round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 4) AS N,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 4) AS R
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Pivot: groupBy().pivot() with an explicit value list (no extra "
    "pass to discover values; one shuffle).",
)
def q_pivot_returnflag(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )


# --- cube ----------------------------------------------------------------
@register(
    "q_cube",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (cross of all subtotal combinations).",
)
def q_cube(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
        )
    )


# --- sessionization (gap-based) -------------------------------------------
@register(
    "q_sessionize",
    """
    WITH gaps AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 600000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM gaps
    )
    SELECT user_id, session_id, count(*) AS n_events, min(event_id) AS first_event
    FROM sess GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization: lag + running-sum windows then a "
    "grouped rollup — the classic event-stream pattern (streaming "
    "equivalent: session_window(ts, gap)).",
)
def q_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gaps = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            # exact microseconds on both engines (truncated seconds would
            # disagree with the oracle on boundary gaps)
            | (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
                )
                > 600_000_000
            ),
            1,
        ).otherwise(0),
    )
    sess = gaps.withColumn("session_id", F.sum("new_session").over(wsum))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"), F.min("event_id").alias("first_event")
    )


# --- more window/analytic coverage -----------------------------------------
@register(
    "q_lead_lag",
    """
    SELECT user_id, event_id,
           lag(event_id) OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           round(value - lag(value) OVER w, 4) AS value_delta
    FROM events WHERE user_id < 5
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
    doc="lead/lag analytics — event-stream delta computation.",
)
def q_lead_lag(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("value_delta"),
    )


@register(
    "q_ntile_quartiles",
    """
    SELECT quartile, count(*) AS n,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM (
      SELECT o_totalprice, ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
      FROM orders) t
    GROUP BY quartile
    """,
    doc="ntile bucketing (quartile stats) via the distributed "
    "range-partition + offset ranker (operators.rank.with_ntile) — exact "
    "SQL ntile semantics with NO single-task global window (round-1 "
    "verdict: Window.orderBy funnels all rows through one task at scale).",
)
def q_ntile_quartiles(spark, sf_dir):
    from qwery_spark.operators.rank import with_ntile

    o = load(spark, sf_dir, "orders").select("o_totalprice", "o_orderkey")
    tiled = with_ntile(o, 4, ["o_totalprice", "o_orderkey"], tile_col="quartile")
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
            F.round(F.max("o_totalprice"), 4).alias("max_price"),
        )
    )


@register(
    "q_string_agg",
    """
    SELECT c_nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_custkey <= 50
    GROUP BY c_nationkey
    """,
    doc="Ordered string aggregation: sort_array(collect_list) + array_join "
    "(collect_list alone is order-nondeterministic — the sort makes it "
    "reproducible, matching string_agg ... ORDER BY).",
)
def q_string_agg(spark, sf_dir):
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 50)
    return c.groupBy("c_nationkey").agg(
        F.array_join(F.sort_array(F.collect_list("c_name")), ",").alias("names")
    )


@register(
    "q_corr_scalar_subquery",
    """
    SELECT o.o_orderkey, round(o.o_totalprice, 4) AS total
    FROM orders o
    WHERE o.o_totalprice > 2 * (
      SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
    doc="Correlated scalar subquery (each order vs its customer's average) "
    "— Catalyst decorrelates it into an aggregate + join; the reference "
    "had no subquery support at all.",
)
def q_corr_scalar_subquery(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    avg_per_cust = o.groupBy("o_custkey").agg(F.avg("o_totalprice").alias("cust_avg"))
    return (
        o.join(avg_per_cust, "o_custkey")
        .filter(F.col("o_totalprice") > 2 * F.col("cust_avg"))
        .select("o_orderkey", F.round("o_totalprice", 4).alias("total"))
    )


@register(
    "q04_priority_with_lineitem",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
                  AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: date-ranged EXISTS semi join + grouped count.",
)
def q04_priority_with_lineitem(spark, sf_dir):
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    semi = o.join(
        li,
        (li.l_orderkey == o.o_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q_grouping_sets",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n,
           round(sum(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (the general form behind ROLLUP/CUBE) — "
    "one Expand + single aggregation shuffle, not one scan per set.",
)
def q_grouping_sets(spark, sf_dir):
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gsets")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS rf,
               coalesce(l_linestatus, 'ALL') AS ls,
               count(*) AS n,
               round(sum(l_quantity), 4) AS qty
        FROM li_gsets
        GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        """
    )


@register(
    "q_first_last_value",
    """
    SELECT user_id, event_id,
           round(first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS first_val,
           round(last_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 4) AS last_val,
           round(value - first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS drift
    FROM events WHERE user_id < 5
    """,
    doc="first_value/last_value window frames: per-entity baseline and "
    "final reading plus drift-from-first (default frame vs explicit "
    "unbounded-following frame).",
)
def q_first_last_value(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.first("value").over(w), 4).alias("first_val"),
        F.round(F.last("value").over(wfull), 4).alias("last_val"),
        F.round(F.col("value") - F.first("value").over(w), 4).alias("drift"),
    )


@register(
    "q10_returned_revenue",
    """
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item revenue per customer): 4-way "
    "join with broadcast dims, date-range pushdown on orders, top-20 via "
    "TakeOrderedAndProject.",
)
def q10_returned_revenue(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q_range_frame_10min",
    """
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_10min,
           round(sum(value) OVER w, 4) AS sum_last_10min
    FROM (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us FROM events)
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
    """,
    doc="Time-based RANGE frame: per-entity rolling 10-minute count/sum "
    "ordered by microsecond epoch (the streaming sliding-window "
    "aggregation, batch form). RANGE (value-based) vs ROWS (count-based) "
    "frames both covered.",
)
def q_range_frame_10min(spark, sf_dir):
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_10min"),
        F.round(F.sum("value").over(w), 4).alias("sum_last_10min"),
    )
