"""docs/USAGE.md, executed — the quickstart cannot rot.

Each test mirrors one numbered section of the doc with the same code
(fixture-scoped paths substituted)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from feray_spark.catalog import load_table


@pytest.fixture
def root():
    d = tempfile.mkdtemp(prefix="usage_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_feature_views_materialize_and_sync(spark, sf_dir, root):
    from feray_spark.features.store import FeatureStore

    fs = FeatureStore(
        spark, root, sources={"events": f"{sf_dir}/events.parquet"}
    )

    @fs.feature_view(
        inputs=["events"],
        entities=["user_id"],
        checks={"nonempty": lambda df: F.count("*") > 0},
    )
    def user_totals(spark, inputs):
        return (
            inputs["events"]
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("total_value"),
            )
        )

    @fs.feature_view(inputs=["user_totals"], entities=["user_id"])
    def user_flags(spark, inputs):
        return inputs["user_totals"].withColumn(
            "is_heavy", F.col("n_events") > 10
        )

    df, recomputed = fs.materialize("user_flags")
    df2, recomputed2 = fs.materialize("user_flags")
    assert recomputed and not recomputed2
    assert df.count() == df2.count() > 0
    assert "is_heavy" in df.columns

    report = fs.sync()
    assert not any(report.values())  # nothing stale -> zero recomputes


def test_point_in_time_training_set(spark, sf_dir):
    from feray_spark.operators.asof import asof_join_multi

    events = load_table(spark, sf_dir, "events")
    spine = events.select("user_id", "ts").limit(1000)
    training = asof_join_multi(
        spine,
        events.select("user_id", "ts", "event_type", "value"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        features={
            "last": (None, ["value"]),
            "last_purchase": (F.col("event_type") == "purchase", ["value"]),
        },
    )
    assert training.count() == spine.count()
    assert "last_value" in training.columns or "last" in str(training.columns)


def test_table_store_surface(spark, root):
    from feray_spark.sources.table_store import TableStore

    df = spark.range(100).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("ts"),
        F.lit("2024-01-01").alias("day"),
    )
    more = spark.range(100, 150).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 7).alias("ts"),
        F.lit("2024-01-02").alias("day"),
    )
    ts = TableStore(root)
    ts.write(df, "t", mode="overwrite")
    ts.write(more, "t", mode="append")
    old = ts.read(spark, "t", version=0)
    assert old.count() == 100 and ts.read(spark, "t").count() == 150

    updates = spark.range(5).select(
        F.col("id").alias("user_id"),
        F.lit(99).alias("ts"),
        F.lit("2024-01-01").alias("day"),
    )
    ts.merge(spark, "t", updates, keys=["user_id"])
    assert ts.read(spark, "t").filter("ts = 99").count() == 5

    slice_df = ts.read(spark, "t").filter("day = '2024-01-01'").withColumn(
        "ts", F.lit(0).cast("long")
    )
    ts.replace_where(spark, "t", slice_df, "day = '2024-01-01'")
    ts.optimize(spark, "t", zorder_by=["user_id", "ts"], n_files=2)
    assert ts.read(spark, "t").count() == 150

    # schema evolution: new column appends; old rows read it as NULL
    wider_df = spark.range(150, 160).select(
        F.col("id").alias("user_id"),
        F.lit(0).cast("long").alias("ts"),
        F.lit("2024-01-03").alias("day"),
        F.lit(1.0).alias("score"),
    )
    ts.write(wider_df, "t", mode="append", merge_schema=True)
    assert ts.read(spark, "t").filter("score IS NULL").count() == 150

    # change feed over the whole history
    feed = ts.changes(spark, "t", from_version=0, keys=["user_id"])
    kinds = {r._change_type for r in feed.select("_change_type").distinct().collect()}
    assert "insert" in kinds

    # incremental consumption needs an append-only table
    ts.write(df, "append_only_table", mode="overwrite")
    stream = ts.read_stream(spark, "append_only_table")
    assert stream.isStreaming

    recent = ts.read_range(spark, "t", "ts", lo=0)
    assert recent.count() == ts.read(spark, "t").filter("ts >= 0").count()


def test_catalog_entry_point(spark, sf_dir):
    from feray_spark.queries import load_all

    registry = load_all()
    out = registry["l2_minhash_lsh_neardups"].fn(spark, sf_dir)
    assert registry["l2_minhash_lsh_neardups"].oracle is not None
    assert out.columns == ["id_a", "id_b"] or len(out.columns) >= 2


def test_incremental_sketch_rollup(spark, sf_dir, root):
    """USAGE §11: per-batch HLL sketch state persisted in the table
    store answers a coarser-grain distinct rollup within sketch error,
    without rescanning raw rows."""
    from feray_spark.sources.table_store import TableStore

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    ts = TableStore(root)
    for parity in (0, 1):  # two ingest batches
        batch = ev.filter(F.col("user_id") % 2 == parity)
        ts.write(
            batch.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk")),
            "daily_user_sketches",
            mode="append",
        )
    month = F.date_trunc("month", F.col("day").cast("timestamp")).alias("month")
    rolled = (
        ts.read(spark, "daily_user_sketches")
        .groupBy(month)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
    )
    exact = ev.groupBy(month).agg(F.countDistinct("user_id").alias("exact_users"))
    rows = rolled.join(exact, "month").collect()
    assert rows
    for r in rows:
        assert abs(r.approx_users / r.exact_users - 1.0) <= 0.15, (
            r.month, r.approx_users, r.exact_users,
        )
