"""Batch-parity twins of the streaming operators (SURVEY §2.9).

The same plan builders from :mod:`feray_spark.streaming.fastlane` run
here on the bounded events table and are gated against DuckDB; the
streaming executions of the identical plans are smoke-tested in
tests/test_streaming.py (file source, availableNow trigger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.queries import register
from feray_spark.queries.util import sql_dsum
from feray_spark.streaming.fastlane import (
    sessionized,
    sliding_counts,
    tumbling_counts,
)


@register(
    "t1_tumbling_window",
    oracle=f"""
        SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS win_start,
               time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE
                   AS win_end,
               event_type,
               COUNT(*) AS n,
               {sql_dsum('value')} AS total
        -- ts IS NOT NULL matches Spark's F.window, which injects an
        -- implicit isnotnull(ts) and DROPS null-event-time rows; a
        -- bare GROUP BY would keep them as a NULL-window group
        FROM events WHERE ts IS NOT NULL GROUP BY 1, 2, 3
    """,
    tags=("streaming", "T1"),
)
def t1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: tumbling event-time windows (batch parity)."""
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "t2_sliding_window",
    oracle="""
        WITH hops AS (SELECT * FROM (VALUES (0), (1)) AS t(k))
        SELECT time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE
                   AS win_start,
               time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE
                   + INTERVAL 10 MINUTE AS win_end,
               COUNT(*) AS n
        FROM events CROSS JOIN hops
        WHERE ts >= time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE
          AND ts <  time_bucket(INTERVAL 5 MINUTE, ts) - k * INTERVAL 5 MINUTE
                    + INTERVAL 10 MINUTE
        GROUP BY 1, 2
    """,
    tags=("streaming", "T2"),
)
def t2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: sliding windows, 10-minute width / 5-minute hop — every
    event contributes to 2 windows (oracle expands the hops
    explicitly)."""
    return sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "t3_session_window",
    oracle="""
        WITH marked AS (
            -- ts IS NOT NULL matches Spark's session_window, which
            -- (like F.window) drops null-event-time rows
            SELECT user_id, ts,
                   CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                        OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
            FROM events WHERE ts IS NOT NULL
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), sessions AS (
            SELECT user_id, ts,
                   SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS session_id
            FROM marked
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    """,
    tags=("streaming", "T3"),
)
def t3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: session windows (30-minute gap) per user; the oracle
    sessionizes classically (lag + gap-flag + cumulative sum) and must
    produce the same [min_ts, max_ts + gap) sessions."""
    return sessionized(load_table(spark, sf_dir, "events"))


@register(
    "t4_watermark_latedata",
    oracle="""
        SELECT event_type,
               COUNT(*) AS n_total,
               COUNT(CASE WHEN ts < (SELECT max(ts) - INTERVAL 1 HOUR
                                     FROM events) THEN 1 END) AS n_late,
               COUNT(CASE WHEN ts >= (SELECT max(ts) - INTERVAL 1 HOUR
                                      FROM events) THEN 1 END) AS n_kept
        FROM events GROUP BY event_type
    """,
    tags=("streaming", "T4"),
)
def t4_watermark_latedata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: late-data policy, batch twin. In streaming, rows behind
    ``max(event time) - horizon`` are dropped by the watermark; the
    batch twin labels each event against the final watermark position
    (global max ts - 1 hour) and counts late vs kept per type. The
    single-row max aggregate broadcast-joins onto the stream — no
    shuffle of the fact side."""
    e = load_table(spark, sf_dir, "events")
    horizon = e.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("__watermark")
    )
    labeled = e.join(F.broadcast(horizon))
    late = F.col("ts") < F.col("__watermark")
    return labeled.groupBy("event_type").agg(
        F.count("*").alias("n_total"),
        F.count(F.when(late, 1)).alias("n_late"),
        F.count(F.when(~late, 1)).alias("n_kept"),
    )


@register(
    "t6_stateful_running",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_value,
               -- event_type itself is the FINAL ordering key: rows
               -- tied on (ts, event_id) — duplicate ids in dirty
               -- data — would otherwise make "last" an arbitrary
               -- pick on each engine (the t5 tie discipline)
               last(event_type ORDER BY ts, event_id, event_type)
                   AS last_event_type
        FROM events GROUP BY user_id
    """,
    tags=("streaming", "T6"),
)
def t6_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: custom stateful per-key operator, batch twin. The same
    per-key fold the streaming side runs in applyInPandasWithState
    (tests/test_streaming.py::test_stateful_running_count) executes
    here: per user, fold events in (ts, event_id) order into
    (count, exact total, last type) — the final state after the
    stream drains. Money totals accumulate as scaled integer cents
    (exact, order-independent) and divide once at the end, matching
    the oracle's decimal sum bit-for-bit.

    Shape: repartition on the key, then ONE vectorized pandas
    groupby per partition via mapInPandas — per-key cost is a few
    nanoseconds, where per-group applyInPandas pays ~ms of pandas
    setup per key (~7x slower on the fixtures' key cardinality, and
    worse as keys grow). Partition state is bounded by the shuffle
    partition size; the unbounded-stream variant of the same fold is
    the applyInPandasWithState path."""
    import numpy as np
    import pandas as pd

    def fold(batches):
        chunks = [c for c in batches if len(c)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        # event_type joins the sort so a (ts, event_id) tie cannot
        # make the positional "last" pick engine-arbitrary;
        # na_position='last' matches the oracle's NULLS LAST default
        pdf = pdf.sort_values(
            ["ts", "event_id", "event_type"], na_position="last"
        )
        # nullable Int64 BEFORE the groupby: a NULL user_id arrives
        # as float64 NaN, and a NaN group key flowing into the
        # 'user_id long' output schema becomes a garbage long under
        # Spark's unsafe pandas->Arrow cast (the oracle's GROUP BY
        # keeps a NULL group) — pd.NA round-trips to a true NULL
        pdf["user_id"] = pdf["user_id"].astype("Int64")
        # HALF-UP (away from zero) cents, the scaled_long/F.round
        # discipline — pandas .round() is banker's half-EVEN, which
        # disagrees with the oracle's decimal cast on every exact
        # half-cent. NULLs ride through as NA (nullable Int64).
        v = pdf["value"].to_numpy(dtype="float64")
        cents = np.where(v >= 0, np.floor(v * 100 + 0.5), np.ceil(v * 100 - 0.5))
        pdf["__cents"] = pd.Series(cents, index=pdf.index).astype("Int64")
        g = pdf.groupby("user_id", sort=False, dropna=False)
        out = pd.DataFrame(
            {
                # min_count=1: SQL SUM over an all-NULL group is NULL;
                # pandas' default min_count=0 would fabricate 0.0
                "n_events": g.size(),
                "total_value": g["__cents"].sum(min_count=1) / 100.0,
                # POSITIONAL last (the oracle's last(x ORDER BY ...)
                # returns the final value even when it is NULL);
                # groupby.last() skips NULLs and would resurrect an
                # earlier value
                "last_event_type": g["event_type"].agg(
                    lambda s: s.iloc[-1]
                ),
            }
        ).reset_index()
        yield out[["user_id", "n_events", "total_value", "last_event_type"]]

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value", "event_type"
    )
    return e.repartition("user_id").mapInPandas(
        fold,
        "user_id long, n_events long, total_value double, last_event_type string",
    )


@register(
    "t5_dedup",
    oracle="""
        SELECT event_id, user_id, event_type FROM (
            SELECT event_id, user_id, event_type,
                   -- (ts IS NULL) leads: Spark's struct ordering is
                   -- NULLS FIRST where DuckDB's bare ASC is NULLS
                   -- LAST, so the flag pins NULL-ts rows LAST on both
                   -- sides. The surrogate carries explicit null FLAGS
                   -- (never a sentinel string — a real '__null__'
                   -- payload must not collide with an actual NULL).
                   ROW_NUMBER() OVER (PARTITION BY event_id
                       ORDER BY (ts IS NULL), ts,
                       md5(concat(
                           CAST(CAST(user_id IS NULL AS INT) AS VARCHAR),
                           '|', coalesce(CAST(user_id AS VARCHAR), ''),
                           '|',
                           CAST(CAST(event_type IS NULL AS INT) AS VARCHAR),
                           '|', coalesce(event_type, '')))) AS rn
            FROM events) t
        WHERE rn = 1
    """,
    tags=("streaming", "T5"),
)
def t5_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: dedup by event_id (batch twin of
    dropDuplicatesWithinWatermark). The batch twin pins the
    EARLIEST-ts survivor (min_by) so its output is deterministic and
    matches the oracle's ROW_NUMBER-ORDER-BY-ts rule even when real
    duplicates appear — stream dedup keeps the first-ARRIVING row,
    which in an event-time-ordered replay is the same row; the real
    streaming leg (arbitrary arrival, replay across restarts) is
    tests/test_streaming.py's replay-dedup tests. event_id is unique
    in the fixtures, so parity additionally proves nothing is
    dropped."""
    e = load_table(spark, sf_dir, "events")
    # ONE min_by over the whole payload struct: per-column min_bys
    # could mix columns from different rows on a ts tie. The ordering
    # key carries a deterministic payload surrogate (the asof.py
    # tiebreak pattern, md5 = engine-portable) so a (event_id, ts)
    # tie between rows with DIFFERENT payloads still picks the same
    # winner in both engines and across runs. Null handling pinned:
    # the leading (ts IS NULL) flag seats NULL-ts rows LAST on both
    # engines (struct ordering is NULLS FIRST, DuckDB ASC is NULLS
    # LAST), and the surrogate encodes explicit null FLAGS so a real
    # '__null__'-like payload string can never collide with NULL.
    tiebreak = F.md5(
        F.concat(
            F.col("user_id").isNull().cast("int").cast("string"),
            F.lit("|"),
            F.coalesce(F.col("user_id").cast("string"), F.lit("")),
            F.lit("|"),
            F.col("event_type").isNull().cast("int").cast("string"),
            F.lit("|"),
            F.coalesce(F.col("event_type"), F.lit("")),
        )
    )
    return (
        e.groupBy("event_id")
        .agg(
            F.min_by(
                F.struct("user_id", "event_type"),
                F.struct(
                    F.col("ts").isNull().cast("int").alias("ts_null"),
                    F.col("ts").alias("ts"),
                    tiebreak.alias("tb"),
                ),
            ).alias("p")
        )
        .select("event_id", "p.user_id", "p.event_type")
    )


@register(
    "t7_stream_static_join",
    oracle="""
        SELECT event_id, user_id, event_type, c_mktsegment AS segment
        FROM events LEFT JOIN customer ON user_id = c_custkey
    """,
    tags=("streaming", "T7"),
)
def t7_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: enrich the event stream with a static dimension (broadcast
    left join — stream side never shuffles)."""
    from feray_spark.streaming.fastlane import enrich_with_static

    e = load_table(spark, sf_dir, "events")
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return enrich_with_static(e, c, on="user_id").select(
        "event_id", "user_id", "event_type", F.col("c_mktsegment").alias("segment")
    )


@register(
    "t8_stream_stream_join",
    oracle="""
        SELECT a.event_id AS click_id, b.event_id AS purchase_id,
               a.user_id, b.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') a
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
          ON a.user_id = b.user_id
         AND b.ts >= a.ts AND b.ts < a.ts + INTERVAL 1 HOUR
    """,
    tags=("streaming", "T8"),
)
def t8_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: stream-stream join with time bounds — purchases within one
    hour after a click, per user. The time-range predicate is what
    lets streaming bound both sides' state (with watermarks)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (clicks.user_id == purchases.p_user)
        & (purchases.p_ts >= clicks.c_ts)
        & (purchases.p_ts < clicks.c_ts + F.expr("INTERVAL 1 HOUR"))
    )
    return clicks.join(purchases, cond).select(
        "click_id", "purchase_id", "user_id", "purchase_value"
    )
