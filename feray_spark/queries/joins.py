"""Join operators (SURVEY §2.3 J1-J10).

Star-schema joins broadcast the small dimension side (region=5,
nation=25 rows — replicating them is free, shuffling the fact table
is not); the as-of/point-in-time joins delegate to
:mod:`feray_spark.operators.asof`; the salted join to
:mod:`feray_spark.operators.skew`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.operators.asof import asof_join, point_in_time_join
from feray_spark.operators.skew import salted_join
from feray_spark.queries import register
from feray_spark.queries.util import dsum, sql_dsum


@register(
    "j1_inner_join",
    oracle="""
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join", "J1"),
)
def j1_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner equi-join. Catalyst/AQE picks broadcast-hash here
    (customer is far under the 10MB threshold at test SF; at 100 TB it
    becomes a shuffled hash/sort-merge on o_custkey automatically)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "j2_left_outer",
    oracle="""
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    tags=("join", "J2"),
)
def j2_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: left outer join; COUNT over the nullable side keeps
    customers with zero orders at 0."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "j2b_full_outer",
    oracle="""
        SELECT
            COALESCE(a.o_custkey, b.c_custkey) AS custkey,
            a.n_orders,
            b.c_acctbal
        FROM (SELECT o_custkey, COUNT(*) AS n_orders
              FROM orders GROUP BY o_custkey) a
        FULL JOIN (SELECT c_custkey, c_acctbal FROM customer
                   WHERE c_acctbal > 5000) b
          ON a.o_custkey = b.c_custkey
    """,
    tags=("join", "J2"),
)
def j2b_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: full outer join with null-extension on both sides."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    a = o.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey", "c_acctbal")
    return a.join(b, a.o_custkey == b.c_custkey, "outer").select(
        F.coalesce(a.o_custkey, b.c_custkey).alias("custkey"),
        "n_orders",
        "c_acctbal",
    )


@register(
    "j3_cross_join",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tags=("join", "J3"),
)
def j3_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: Cartesian product (5 × 25). Only ever sane when one side is
    tiny — Spark plans BroadcastNestedLoopJoin."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "j4_left_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_totalprice > 200000)
    """,
    tags=("join", "J4"),
)
def j4_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-semi = EXISTS; no right columns, no duplicate blowup."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "j4b_left_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    tags=("join", "J4"),
)
def j4b_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: left-anti = NOT EXISTS."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j5_broadcast_star",
    oracle=f"""
        SELECT r_name, n_name,
               {sql_dsum('o_totalprice')} AS total_revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
    tags=("join", "J5"),
)
def j5_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: star-schema rollup with explicit broadcast of every
    dimension — the fact table never shuffles for the joins; the only
    exchange is the final 125-group aggregation."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum("o_totalprice").alias("total_revenue"), F.count("*").alias("n_orders"))
    )


@register(
    "j6_theta_join",
    oracle=f"""
        SELECT p_brand, COUNT(*) AS n,
               {sql_dsum('l_quantity')} AS total_qty
        FROM lineitem JOIN part
          ON l_partkey = p_partkey AND l_quantity < p_size
        GROUP BY p_brand
    """,
    tags=("join", "J6"),
)
def j6_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: mixed equi + theta predicate — Catalyst keys the hash join
    on the equality and evaluates the inequality as a post-join
    residual (no nested-loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.l_quantity < p.p_size))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("total_qty"))
    )


@register(
    "j6b_nested_loop",
    oracle="""
        SELECT r_name, n_name FROM region JOIN nation
          ON r_regionkey < n_regionkey
    """,
    tags=("join", "J6"),
)
def j6b_nested_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: pure non-equi predicate -> BroadcastNestedLoopJoin. Kept to
    dimension tables; a fact-scale NLJ is a plan bug, not a feature."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.join(n, r.r_regionkey < n.n_regionkey).select("r_name", "n_name")


@register(
    "j7_range_join",
    oracle=f"""
        SELECT o_orderpriority, COUNT(*) AS n,
               {sql_dsum('l_extendedprice')} AS revenue
        FROM lineitem JOIN orders
          ON l_orderkey = o_orderkey
         AND l_shipdate >= o_orderdate
         AND l_shipdate < o_orderdate + INTERVAL 90 DAY
        GROUP BY o_orderpriority
    """,
    tags=("join", "J7"),
)
def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: interval/range join — equi key + time-window residual.
    The equi key carries the join; the range condition filters
    post-match, so no range-explosion at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("revenue"))
    )


@register(
    "j8_asof_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts,
               p.value AS prev_value, p.event_type AS prev_type
        -- ts IS NOT NULL on the probe side, BOTH engines: DuckDB's
        -- native ASOF seats a NULL probe time after every quote
        -- (matches the latest event) while the operator follows
        -- polars join_asof (a NULL time matches nothing) — a
        -- NULL-time probe is excluded rather than given either
        -- engine's arbitrary answer
        FROM (SELECT * FROM events WHERE ts IS NOT NULL) e
        ASOF LEFT JOIN events p
          ON e.user_id = p.user_id AND e.ts > p.ts
    """,
    tags=("join", "J8", "asof"),
)
def j8_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: as-of join — latest strictly-prior event per user (self
    as-of). Implemented by operators.asof.asof_join (union + window);
    oracle is DuckDB's native ASOF LEFT JOIN."""
    e = load_table(spark, sf_dir, "events")
    prev = e.select("user_id", "ts", "value", "event_type")
    joined = asof_join(
        e.select("event_id", "user_id", "ts").filter(
            F.col("ts").isNotNull()
        ),
        prev,
        on=["user_id"],
        left_ts="ts",
        allow_exact_matches=False,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").alias("prev_value"),
        F.col("event_type").alias("prev_type"),
    )


@register(
    "j9_point_in_time_spine",
    oracle="""
        SELECT s.event_id AS spine_id, s.user_id, s.ts,
               e.value AS last_value, e.event_type AS last_type,
               c.c_acctbal AS acctbal
        -- ts IS NOT NULL: the j8 NULL-probe-time pin (DuckDB ASOF
        -- treats NULL time as +inf, the operator as no-match)
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_id % 10 = 0 AND ts IS NOT NULL) s
        ASOF LEFT JOIN events e
          ON s.user_id = e.user_id AND s.ts > e.ts
        LEFT JOIN customer c ON s.user_id = c.c_custkey
    """,
    tags=("join", "J9", "asof"),
)
def j9_point_in_time_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9: training-set spine — (entity, ts) rows point-in-time joined
    to an event feature table (strictly-prior, no leakage) plus a
    static entity feature. FS8's assembly surface."""
    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer")
    spine = e.filter(
        (F.col("event_id") % 10 == 0) & F.col("ts").isNotNull()
    ).select("event_id", "user_id", "ts")
    feats = point_in_time_join(
        spine,
        {"_f": (e.select("user_id", "ts", "value", "event_type"), ["user_id"], "ts")},
        spine_ts="ts",
        allow_exact_matches=False,
    )
    return feats.join(
        F.broadcast(c.select("c_custkey", "c_acctbal")),
        feats.user_id == F.col("c_custkey"),
        "left",
    ).select(
        F.col("event_id").alias("spine_id"),
        "user_id",
        "ts",
        F.col("value_f").alias("last_value"),
        F.col("event_type_f").alias("last_type"),
        F.col("c_acctbal").alias("acctbal"),
    )


@register(
    "j10_salted_join",
    oracle="""
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
    """,
    tags=("join", "J10", "skew"),
)
def j10_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10: salted skew join — must produce byte-identical results to
    the plain inner join (same oracle as J1's shape)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = salted_join(
        o, c.select("o_custkey", "c_name"), on=["o_custkey"], salts=8
    )
    return joined.select("o_orderkey", "c_name", "o_totalprice")


@register(
    "j7b_interval_join",
    oracle=f"""
        SELECT p.event_id AS purchase_id,
               COUNT(*) AS n_events,
               {sql_dsum('e.value')} AS total_value
        FROM (SELECT event_id, ts FROM events
              WHERE event_type = 'purchase') p
        JOIN events e
          ON e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
         AND e.event_id != p.event_id
        GROUP BY p.event_id
    """,
    tags=("join", "J7"),
)
def j7b_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 keyless form: every event landing in the hour AFTER any
    purchase, matched purely on the time interval — no equi key
    anywhere in the predicate. Runs as a bin join
    (operators.rangejoin.point_interval_join): intervals explode
    into covered 1-hour bins, points tag their single bin, one
    equi-shuffle on the bin id, exact residual re-check — instead of
    the O(points x intervals) broadcast-nested-loop Catalyst would
    otherwise pick. Aggregate is the usual exact-decimal money sum."""
    from feray_spark.operators.rangejoin import point_interval_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("win_lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_hi"),
    )
    pts = e.select(F.col("event_id"), F.col("ts"), F.col("value"))
    joined = point_interval_join(
        pts,
        purchases,
        point_ts="ts",
        interval_lo="win_lo",
        interval_hi="win_hi",
        bin_width_sec=3600,
    ).filter(F.col("event_id") != F.col("purchase_id"))
    # dsum: scaled-long accumulation (codegen longs, ~3x a decimal
    # accumulator over the ~30x-exploded pair stream), one exact
    # decimal divide at the end — identical IEEE result to the
    # oracle's decimal sum
    return joined.groupBy("purchase_id").agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("total_value"),
    )
