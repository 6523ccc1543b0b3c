"""Feature-store query surface (SURVEY §2.11) — the oracle-gated
subset: FS1 record versioning (hash parity with an independent
engine) and FS8 training-set assembly (spine + point-in-time
features). FS2/FS3/FS5-FS7 are materialization-time behaviors
covered by tests/test_features.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.queries.util import fan_out
from feray_spark.functions.hashing import row_version
from feray_spark.operators.asof import point_in_time_join
from feray_spark.queries import register


@register(
    "fs1_record_versions",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               sha256(concat_ws(chr(31),
                   CAST(l_orderkey AS VARCHAR),
                   CAST(l_partkey AS VARCHAR),
                   CAST(l_suppkey AS VARCHAR),
                   CAST(l_linenumber AS VARCHAR),
                   CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR),
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
                   CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR),
                   CAST(CAST(l_tax AS DECIMAL(18,2)) AS VARCHAR),
                   l_returnflag, l_linestatus,
                   CAST(epoch_us(l_shipdate) AS VARCHAR)
               )) AS _data_version
        FROM lineitem
    """,
    tags=("feature", "FS1"),
)
def fs1_record_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FS1: the full-row record version over canonicalized lineitem —
    money via decimal, timestamps via epoch-microseconds, 0x1f field
    separator. The DuckDB oracle recomputes the identical sha256,
    proving the version is engine-independent (reference README.md:23;
    polars-hash parity per SURVEY §2.8 hashing row)."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return li.select(
        "l_orderkey",
        "l_linenumber",
        row_version(
            [
                F.col("l_orderkey"),
                F.col("l_partkey"),
                F.col("l_suppkey"),
                F.col("l_linenumber"),
                d("l_quantity"),
                d("l_extendedprice"),
                d("l_discount"),
                d("l_tax"),
                F.col("l_returnflag"),
                F.col("l_linestatus"),
                F.unix_micros(F.col("l_shipdate").cast("timestamp")),
            ]
        ).alias("_data_version"),
    )


@register(
    "fs8_training_set",
    oracle="""
        SELECT s.event_id AS spine_id, s.user_id, s.ts,
               a.value AS f_last_value,
               p.value AS f_last_purchase,
               p.ts    AS f_last_purchase_ts
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_id % 7 = 0) s
        ASOF LEFT JOIN events a
          ON s.user_id = a.user_id AND s.ts > a.ts
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'purchase') p
          ON s.user_id = p.user_id AND s.ts > p.ts
    """,
    tags=("feature", "FS8", "asof"),
)
def fs8_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FS8: training-set assembly — a spine of (entity, ts) rows with
    two point-in-time features (latest prior event value; latest prior
    purchase value+time), each strictly before the spine timestamp so
    no label leakage. Composition of J8 per feature table (SURVEY
    §2.3 J9), one key-shuffle per feature table."""
    e = load_table(spark, sf_dir, "events")
    spine = e.filter(F.col("event_id") % 7 == 0).select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("p_ts"),
        "value",
        F.col("ts").alias("purchase_ts"),  # ts also carried as payload
    )
    out = point_in_time_join(
        spine,
        {
            "_a": (e.select("user_id", "ts", "value"), ["user_id"], "ts"),
            "_p": (purchases, ["user_id"], "p_ts"),
        },
        spine_ts="ts",
        allow_exact_matches=False,
    )
    return out.select(
        F.col("event_id").alias("spine_id"),
        "user_id",
        "ts",
        F.col("value_a").alias("f_last_value"),
        F.col("value_p").alias("f_last_purchase"),
        F.col("purchase_ts_p").alias("f_last_purchase_ts"),
    )


@register(
    "fs5_asset_checks",
    oracle="""
        SELECT 'not_null_custkey' AS check_name,
               COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) = 0 AS passed,
               CAST(COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS DOUBLE)
                   AS violations
        FROM orders
        UNION ALL
        SELECT 'positive_totalprice',
               COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) = 0,
               CAST(COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS DOUBLE)
        FROM orders
        UNION ALL
        SELECT 'known_orderstatus',
               COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                          THEN 1 END) = 0,
               CAST(COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                          THEN 1 END) AS DOUBLE)
        FROM orders
    """,
    tags=("feature", "FS5"),
)
def fs5_asset_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FS5: declarative data-quality checks attached to a feature
    table (the asset-check model of reference ``definitions.py:32``)
    — each check is a boolean aggregate; output is one row per check
    with its violation count. All checks evaluate in ONE pass over
    the table (a single aggregate row, unpivoted with ``stack``), so
    adding checks never adds scans. The FeatureStore runs the same
    shape at materialize time and records failures in commit
    metadata (feray_spark/features/store.py)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_custkey"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpos_price"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("bad_status"),
    )
    stacked = agg.selectExpr(
        "stack(3, "
        "'not_null_custkey', null_custkey, "
        "'positive_totalprice', nonpos_price, "
        "'known_orderstatus', bad_status) AS (check_name, n_bad)"
    )
    return stacked.select(
        "check_name",
        (F.col("n_bad") == 0).alias("passed"),
        F.col("n_bad").cast("double").alias("violations"),
    )
