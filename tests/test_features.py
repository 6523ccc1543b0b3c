"""Feature-store layer tests (SURVEY §5.2 items 2/6): memoization
hit/miss behavior, versioned store semantics, checks, backfill."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from feray_spark.features.store import CheckFailure, FeatureStore, FeatureView
from feray_spark.features.versioning import DATA_VERSION_COL
from feray_spark.sources.table_store import TableStore
from tests.conftest import SF_DIR


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="feray_store_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# ------------------------------------------------------- table store


def test_table_store_versions_and_time_travel(spark, tmp_root):
    ts = TableStore(tmp_root)
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    ts.write(df1, "t", mode="overwrite")
    df2 = spark.createDataFrame([(3, "c")], "id int, v string")
    ts.write(df2, "t", mode="append")

    assert ts.latest_version("t") == 1
    assert ts.read(spark, "t").count() == 3
    assert ts.read(spark, "t", version=0).count() == 2  # time travel
    assert ts.commit_info("t").row_count == 3


def test_table_store_merge_upsert(spark, tmp_root):
    ts = TableStore(tmp_root)
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    ts.write(base, "t", mode="overwrite")
    src = spark.createDataFrame([(2, "B"), (3, "c")], "id int, v string")
    ts.merge(spark, "t", src, keys=["id"])
    got = {(r.id, r.v) for r in ts.read(spark, "t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_replace_where_backfill_scope(spark, tmp_root):
    ts = TableStore(tmp_root)
    base = spark.createDataFrame(
        [(1, "x", 10.0), (2, "x", 20.0), (3, "y", 30.0)], "id int, part string, v double"
    )
    ts.write(base, "t", mode="overwrite")
    repl = spark.createDataFrame([(9, "x", 99.0)], "id int, part string, v double")
    ts.replace_where(spark, "t", repl, "part = 'x'")
    got = {(r.id, r.part) for r in ts.read(spark, "t").collect()}
    assert got == {(9, "x"), (3, "y")}
    # replacement rows violating the predicate are rejected
    bad = spark.createDataFrame([(8, "z", 1.0)], "id int, part string, v double")
    with pytest.raises(ValueError):
        ts.replace_where(spark, "t", bad, "part = 'x'")


# ----------------------------------------------------- feature store


def _make_store(spark, root):
    return FeatureStore(
        spark,
        root,
        sources={"orders": f"{SF_DIR}/orders.parquet"},
    )


def test_memoization_hit_and_code_bust(spark, tmp_root):
    fs = _make_store(spark, tmp_root)

    @fs.feature_view(name="spend", inputs=["orders"], entities=["o_custkey"])
    def spend(spark, inputs):
        return (
            inputs["orders"]
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"))
        )

    _, recomputed1 = fs.materialize("spend")
    assert recomputed1 is True
    _, recomputed2 = fs.materialize("spend")
    assert recomputed2 is False  # FS3 cache hit — no job ran

    # changing the code busts the cache
    fs.views.pop("spend")

    @fs.feature_view(name="spend", inputs=["orders"], entities=["o_custkey"])
    def spend_v2(spark, inputs):
        return (
            inputs["orders"]
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n_orders"), F.max("o_totalprice").alias("max_p"))
        )

    _, recomputed3 = fs.materialize("spend")
    assert recomputed3 is True


def test_version_columns_injected(spark, tmp_root):
    fs = _make_store(spark, tmp_root)

    @fs.feature_view(name="v", inputs=["orders"], version_cols=["o_orderkey"])
    def v(spark, inputs):
        return inputs["orders"].select("o_orderkey", "o_totalprice")

    df, _ = fs.materialize("v")
    assert DATA_VERSION_COL in df.columns and "_code_version" in df.columns
    row = df.limit(1).collect()[0]
    assert len(row[DATA_VERSION_COL]) == 64  # sha256 hex


def test_upstream_view_chain_and_propagation(spark, tmp_root):
    fs = _make_store(spark, tmp_root)

    @fs.feature_view(name="base", inputs=["orders"])
    def base(spark, inputs):
        return inputs["orders"].select("o_custkey", "o_totalprice")

    @fs.feature_view(name="derived", inputs=["base"])
    def derived(spark, inputs):
        return (
            inputs["base"]
            .groupBy("o_custkey")
            .agg(F.count("*").alias("n"))
        )

    _, r1 = fs.materialize("derived")
    assert r1 is True
    _, r2 = fs.materialize("derived")
    assert r2 is False

    # bust only the upstream → downstream must recompute too
    fs.views.pop("base")

    @fs.feature_view(name="base", inputs=["orders"])
    def base_v2(spark, inputs):
        return inputs["orders"].select("o_custkey", "o_totalprice", "o_orderstatus")

    _, r3 = fs.materialize("derived")
    assert r3 is True


def test_asset_checks(spark, tmp_root):
    fs = _make_store(spark, tmp_root)

    @fs.feature_view(
        name="checked",
        inputs=["orders"],
        checks={
            "positive_prices": lambda df: F.min("o_totalprice") > 0,
            "nonempty": lambda df: F.count("*") > 0,
        },
    )
    def checked(spark, inputs):
        return inputs["orders"].select("o_orderkey", "o_totalprice")

    _, _ = fs.materialize("checked")
    meta = fs.store.commit_info("checked").user_metadata
    assert meta["checks"] == {"positive_prices": True, "nonempty": True}

    fs2 = FeatureStore(spark, tmp_root + "_2", sources={"orders": f"{SF_DIR}/orders.parquet"})

    @fs2.feature_view(
        name="failing",
        inputs=["orders"],
        checks={"impossible": lambda df: F.max("o_totalprice") < 0},
    )
    def failing(spark, inputs):
        return inputs["orders"].select("o_orderkey", "o_totalprice")

    with pytest.raises(CheckFailure):
        fs2.materialize("failing")


def test_backfill_replaces_only_slice(spark, tmp_root):
    fs = _make_store(spark, tmp_root)

    @fs.feature_view(name="by_status", inputs=["orders"])
    def by_status(spark, inputs):
        return inputs["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")

    fs.materialize("by_status")
    before = fs.store.read(spark, "by_status").count()
    fs.backfill("by_status", "o_orderstatus = 'F'")
    after = fs.store.read(spark, "by_status").count()
    assert before == after  # same data recomputed in place
    assert fs.store.commit_info("by_status").user_metadata["backfill"]
