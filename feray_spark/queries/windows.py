"""Window functions (SURVEY §2.5 W1-W8) and sorts/limits (§2.6 O1-O3).

Window partitioning is always by a real key (never a global window
over the fact table — that's a single-reducer sort at scale). Every
orderBy includes a unique tiebreaker so ranks and running aggregates
are deterministic across engines and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.operators.topk import top_k_per_group
from feray_spark.queries import register
from feray_spark.queries.util import dsum, dwsum

_BY_PRICE = "ORDER BY o_totalprice DESC, o_orderkey"


@register(
    "w1_ranking",
    oracle=f"""
        SELECT o_orderkey, o_custkey, o_totalprice,
               ROW_NUMBER()  OVER (PARTITION BY o_custkey {_BY_PRICE}) AS rn,
               RANK()        OVER (PARTITION BY o_custkey {_BY_PRICE}) AS rnk,
               DENSE_RANK()  OVER (PARTITION BY o_custkey {_BY_PRICE}) AS drnk
        FROM orders
    """,
    tags=("window", "W1"),
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: row_number / rank / dense_rank per customer."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "w2_ntile_percent_rank",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               NTILE(4) OVER w AS quartile,
               percent_rank() OVER w AS pr
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice ASC NULLS LAST,
                              o_orderkey ASC NULLS LAST)
    """,
    tags=("window", "W2"),
)
def w2_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: distribution ranks within each priority class. The window
    order pins NULLS LAST on both sides (Spark bare ASC is NULLS
    FIRST, DuckDB's is NULLS LAST — a NULL price would otherwise
    land in opposite quartiles and shift every rank)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc_nulls_last(),
        F.col("o_orderkey").asc_nulls_last(),
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )


@register(
    "w3_lag_lead",
    oracle="""
        SELECT event_id, user_id, value,
               LAG(value)     OVER w AS prev_value,
               LEAD(value)    OVER w AS next_value,
               LAG(value, 2)  OVER w AS prev2_value
        FROM events
        -- ts NULLS LAST pinned on both sides (Spark bare ASC is
        -- NULLS FIRST, DuckDB's is NULLS LAST): a NULL-event-time
        -- row must hold the SAME timeline slot in both engines
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC NULLS LAST, event_id)
    """,
    tags=("window", "W3"),
)
def w3_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: offset access within each user's event timeline."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.lag("value", 2).over(w).alias("prev2_value"),
    )


@register(
    "w4_running_agg",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_spend,
               COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n_so_far
        FROM orders
    """,
    tags=("window", "W4"),
)
def w4_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: cumulative aggregates (running spend per customer)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        dwsum("o_totalprice", w).alias("running_spend"),
        F.count("*").over(w).alias("n_so_far"),
    )


@register(
    "w5_sliding_rows",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
                   / COUNT(value) OVER w AS moving_avg3
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC NULLS LAST, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "W5"),
)
def w5_sliding_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: 3-row moving average (exact decimal sum / count so the
    float division is the only FP op — identical on both engines)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        (dwsum("value", w) / F.count("value").over(w)).alias(
            "moving_avg3"
        ),
    )


@register(
    "w6_time_range_frame",
    oracle="""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS sum_7d,
               COUNT(*) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW
               ) AS n_7d
        FROM events
    """,
    tags=("window", "W6", "feature"),
)
def w6_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: time-range frame — "sum of the last 7 days" per entity, the
    feature-store staple. Spark range frames need a numeric ordering
    key, so the timestamp is ordered as epoch microseconds with the
    frame in the same unit."""
    e = load_table(spark, sf_dir, "events")
    seven_days_us = 7 * 86400 * 1_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-seven_days_us, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        dwsum("value", w).alias("sum_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


@register(
    "w7_first_last_value",
    oracle="""
        SELECT event_id, user_id,
               FIRST_VALUE(event_type) OVER w AS first_type,
               LAST_VALUE(event_type)  OVER w AS latest_type,
               NTH_VALUE(event_type, 2) OVER w AS second_type
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY ts ASC NULLS LAST, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "W7"),
)
def w7_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: frame boundary values — first/latest/nth event type as of
    each row."""
    e = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc_nulls_last(), "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("latest_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@register(
    "w8_top_k_per_group",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders) t
        WHERE rn <= 2
    """,
    tags=("window", "W8"),
)
def w8_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: top-2 orders per customer via operators.topk (rank+filter;
    Spark's WindowGroupLimit keeps per-partition state at k rows)."""
    o = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        o.select("o_custkey", "o_orderkey", "o_totalprice"),
        partition_by=["o_custkey"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=2,
    )


# ------------------------------------------------------ sorts / limits


@register(
    "o1_multikey_sort",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        ORDER BY o_orderstatus ASC NULLS LAST,
                 o_totalprice DESC NULLS LAST,
                 o_orderkey ASC NULLS LAST
        LIMIT 100
    """,
    tags=("sort", "O1"),
)
def o1_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2: multi-key sort with explicit null placement, limited so
    the ordering is observable in the result set. EVERY key pins its
    null placement on BOTH sides: Spark's bare ASC is NULLS FIRST
    while DuckDB's is NULLS LAST, so an unpinned ASC key over a
    nullable column would select different top-100 row sets."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.col("o_orderstatus").asc_nulls_last(),
            F.col("o_totalprice").desc_nulls_last(),
            F.col("o_orderkey").asc_nulls_last(),
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .limit(100)
    )


@register(
    "o2_limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 10
    """,
    tags=("sort", "O2"),
)
def o2_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: limit + offset under a unique total order."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10)
        .limit(10)
    )


@register(
    "o3_global_topk",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("sort", "O3"),
)
def o3_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: global top-k — Spark plans TakeOrderedAndProject (per-
    partition heaps + driver merge), never a full sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@register(
    "w9_resample_gap_fill",
    oracle="""
        WITH daily AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                       AS day_total
            FROM events GROUP BY user_id, CAST(ts AS DATE)
        ),
        span AS (
            SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
            FROM daily GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, CAST(t.d AS DATE) AS day
            FROM span, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) t(d)
        ),
        j AS (
            SELECT g.user_id, g.day, d.day_total
            FROM grid g LEFT JOIN daily d USING (user_id, day)
        )
        SELECT user_id, CAST(day AS TIMESTAMP) AS day,
               LAST_VALUE(day_total IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS filled_total,
               day_total IS NULL AS is_gap
        FROM j
    """,
    tags=("window", "W9", "timeseries"),
)
def w9_resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 (beyond the brief): time-series resample + gap fill — the
    polars ``upsample``/``fill_null(strategy='forward')`` surface:
    per-user daily totals re-gridded onto a dense day calendar over
    each user's active span, with missing days FORWARD-FILLED from
    the last observed day and flagged. The feature-store shape
    behind "latest value as of day D" training matrices (FS8's
    spine, densified).

    Scale shape: the daily rollup is one hash-agg (exact-decimal
    money sum); the calendar comes from ``sequence()`` exploded
    per user — rows generated ON the user's partition, no
    driver-side calendar, no cross join against a global date dim;
    the gap join is keyed on (user, day) — broadcast at fixture
    scale, SMJ at 100 TB — and the forward fill is a running
    ``last(ignorenulls)`` frame over the user partitioning the grid
    side already has, so the dense grid shuffles once."""
    e = load_table(spark, sf_dir, "events")

    daily = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(dsum("value").alias("day_total"))
    grid = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day"),
        )
    )
    j = grid.join(daily, ["user_id", "day"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # DATE output is cast to TIMESTAMP on both sides (the
    # f_datetime_family discipline): bare DATE pandas-converts to
    # `object`-of-date on the Spark side but datetime64 on the DuckDB
    # side, which flips the driver's value hash.
    return j.select(
        "user_id",
        F.col("day").cast("timestamp").alias("day"),
        F.last("day_total", ignorenulls=True).over(w).alias("filled_total"),
        F.col("day_total").isNull().alias("is_gap"),
    )
