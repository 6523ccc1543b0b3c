"""S4/S5 connector plumbing tests (no external services in this
environment — option construction and path handling only)."""

from __future__ import annotations

import pytest

from feray_spark.sources.connectors import (
    configure_s3,
    jdbc_reader,
    jdbc_upsert,
    jdbc_writer,
    s3_path,
)

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def _require_derby(spark):
    try:
        spark._jvm.java.lang.Class.forName(DERBY)
    except Exception:
        pytest.skip("derby embedded driver not on the classpath")


def test_s3_path_normalization():
    assert s3_path("bucket", "a/b.parquet") == "s3a://bucket/a/b.parquet"
    assert s3_path("bucket/", "/a/b.parquet") == "s3a://bucket/a/b.parquet"


def test_configure_s3_sets_hadoop_conf(spark):
    configure_s3(
        spark,
        endpoint="http://minio.local:9000",
        access_key="ak",
        secret_key="sk",
        path_style=True,
    )
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.endpoint") == "http://minio.local:9000"
    assert hc.get("fs.s3a.path.style.access") == "true"
    assert hc.get("fs.s3a.access.key") == "ak"


def test_jdbc_reader_builds_partitioned_options(spark):
    r = jdbc_reader(
        spark,
        "jdbc:postgresql://db:5432/registry",
        "features",
        user="u",
        password="p",
        num_partitions=8,
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
    )
    # DataFrameReader keeps options private; building without error and
    # returning a reader primed with format=jdbc is the contract here.
    assert r is not None


def test_jdbc_reader_rejects_partial_partitioning(spark):
    with pytest.raises(ValueError, match="partitioned JDBC read"):
        jdbc_reader(
            spark,
            "jdbc:postgresql://db:5432/registry",
            "features",
            num_partitions=8,
        )


def test_jdbc_writer_builds(spark):
    df = spark.range(3)
    w = jdbc_writer(df, "jdbc:postgresql://db:5432/registry", "t", mode="overwrite")
    assert w is not None


# ------------------------------------------- live S4 round-trip (real)


def test_jdbc_partitioned_round_trip_live(spark):
    """S4 executed for real, zero external services: Spark's own Hive
    Thrift server is started in-process over the test session, a
    fixture slice is exposed as a global temp view, and
    ``jdbc_reader`` pulls it back over genuine JDBC (hive-jdbc driver,
    TCP, wire types) as a PARTITIONED read — 3 parallel range scans.

    Two environment-specific requirements, both discovered the hard
    way: (1) the generic JDBC dialect double-quotes identifiers,
    which a Spark server only parses as identifiers under
    ``ansi.enabled`` + ``ansi.doubleQuotedIdentifiers`` — shipped as
    URL session confs so only the server-side sessions flip; (2) the
    scan tasks occupy executor slots while the server needs slots to
    answer, so num_partitions must stay below the local[] core count
    or the read deadlocks (real clusters: reader and server are
    different executors)."""
    import time

    from feray_spark.sources.connectors import jdbc_reader

    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName("org.apache.hive.jdbc.HiveDriver")
    except Exception:
        pytest.skip("hive-jdbc driver not on the classpath")
    if not spark._jsparkSession.sqlContext():
        pytest.skip("no sqlContext")

    src = (
        spark.range(1000)
        .selectExpr("id", "cast(id * 7 as double) as amount")
    )
    src.createOrReplaceGlobalTempView("s4_roundtrip")

    try:
        jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
            spark._jsparkSession.sqlContext()
        )
    except Exception as exc:  # port bound by a parallel run, jars absent…
        pytest.skip(f"thrift server unavailable: {exc}")

    url = (
        "jdbc:hive2://localhost:10000/default"
        "?spark.sql.ansi.enabled=true"
        ";spark.sql.ansi.doubleQuotedIdentifiers=true"
    )
    # wait for the listener (the server binds asynchronously)
    deadline = time.time() + 60
    last = None
    while time.time() < deadline:
        try:
            conn = jvm.java.sql.DriverManager.getConnection(url)
            conn.close()
            break
        except Exception as exc:
            last = exc
            time.sleep(1)
    else:
        pytest.skip(f"thrift server never came up: {last}")

    got = jdbc_reader(
        spark,
        url,
        "global_temp.s4_roundtrip",
        driver="org.apache.hive.jdbc.HiveDriver",
        num_partitions=3,
        partition_column="id",
        lower_bound=0,
        upper_bound=1000,
    ).load()
    assert got.rdd.getNumPartitions() == 3
    assert got.count() == 1000
    spark_sum = got.agg({"amount": "sum"}).collect()[0][0]
    assert spark_sum == sum(i * 7.0 for i in range(1000))


def test_jdbc_writer_round_trip_live_derby(spark, tmp_path):
    """S4 WRITE path executed for real: ``jdbc_writer`` saves to an
    embedded Apache Derby database (the derby jars ship inside the
    pyspark wheel for the Hive metastore, so this runs with zero
    external services), then ``jdbc_reader`` pulls the rows back —
    partitioned — and a filtered read asserts the predicate reached
    the database (``PushedFilters`` on the JDBC scan), i.e. the
    registry-table path does not full-scan-then-filter.

    Embedded Derby accepts many connections from ONE JVM (local mode:
    driver and executors share it); on a real cluster S4 targets a
    networked database, so the concurrency shape is the same."""
    jvm = spark._jvm
    try:
        jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    except Exception:
        pytest.skip("derby embedded driver not on the classpath")

    url = f"jdbc:derby:{tmp_path}/s4db;create=true"
    src = spark.range(200).selectExpr(
        "id", "cast(id % 7 as double) as amount", "concat('s', id) as tag"
    )
    jdbc_writer(
        src,
        url,
        "registry_features",
        mode="overwrite",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).save()

    got = jdbc_reader(
        spark,
        url,
        "registry_features",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        num_partitions=4,
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
    ).load()
    assert got.rdd.getNumPartitions() == 4
    assert got.count() == 200
    assert got.agg({"amount": "sum"}).collect()[0][0] == sum(
        i % 7 for i in range(200)
    )

    # append mode lands on the existing table instead of recreating it
    jdbc_writer(
        src.filter("id >= 195"),
        url,
        "registry_features",
        mode="append",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    ).save()

    filtered = (
        jdbc_reader(
            spark,
            url,
            "registry_features",
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        )
        .load()
        .filter("id >= 190")
    )
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "190" in plan, plan
    assert filtered.count() == 15  # 10 originals + 5 appended dupes


def test_python_datasource_history(spark, tmp_path):
    """Spark 4 Python DataSource API: the commit log reads as a
    format — lazily (new commits visible at next query), one
    partition per commit, metadata JSON intact."""
    import json

    from pyspark.sql import functions as F

    from feray_spark.sources import pydatasource
    from feray_spark.sources.table_store import TableStore

    root = str(tmp_path / "store")
    ts = TableStore(root)
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    ts.write(df, "t", mode="overwrite", user_metadata={"run": "r1"})

    pydatasource.register(spark)
    hist = (
        spark.read.format("feray_history")
        .option("root", root)
        .option("table", "t")
        .load()
    )
    rows = hist.orderBy("version").collect()
    assert [(r.version, r.mode) for r in rows] == [(0, "overwrite")]
    assert json.loads(rows[0].user_metadata) == {"run": "r1"}

    # lazy: a commit made AFTER the plan was built shows on re-read
    ts.write(df, "t", mode="append", user_metadata={"run": "r2"})
    again = (
        spark.read.format("feray_history")
        .option("root", root)
        .option("table", "t")
        .load()
    )
    assert again.count() == 2
    assert again.filter(F.col("mode") == "append").count() == 1


def test_history_datasource_survives_vacuumed_commit(spark, tmp_path):
    """A commit file deleted (vacuum) between planning and executor
    read must drop out of the feed, not fail the query."""
    import os

    from feray_spark.sources.pydatasource import _CommitPartition, _HistoryReader

    from feray_spark.sources.table_store import TableStore

    ts = TableStore(str(tmp_path))
    df = spark.range(3)
    ts.write(df, "t", mode="overwrite")
    ts.write(df, "t", mode="append")
    reader = _HistoryReader({"root": str(tmp_path), "table": "t"})
    parts = reader.partitions()
    assert len(parts) == 2
    os.remove(parts[0].log_path)  # the vacuum race
    rows = [r for p in parts for r in reader.read(p)]
    assert len(rows) == 1 and rows[0][0] == 1  # surviving version only


def test_jdbc_upsert_merge_semantics_live_derby(spark, tmp_path):
    """S4 UPSERT executed for real: stage + one transactional ANSI
    MERGE inside embedded Derby. Updates hit matched keys, inserts
    land new keys, order_by resolves in-batch duplicates to the
    latest row, and the Delta-aligned guards raise on duplicate keys
    without order_by and on NULL merge keys."""
    _require_derby(spark)
    url = f"jdbc:derby:{tmp_path}/updb;create=true"

    base = spark.createDataFrame(
        [(1, 10.0, "a", 0), (2, 20.0, "b", 0)],
        "id long, amount double, tag string, seq long",
    )
    assert jdbc_upsert(base, url, "registry", ["id"], driver=DERBY) is True

    # update id=2, insert id=3; in-batch dup for id=3 resolved by seq
    batch = spark.createDataFrame(
        [(2, 21.0, "b2", 1), (3, 30.0, "c-old", 1), (3, 31.0, "c-new", 2)],
        "id long, amount double, tag string, seq long",
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        jdbc_upsert(batch, url, "registry", ["id"], driver=DERBY)

    # MERGE: 2 updated, 3's latest-by-seq inserted, 1 untouched
    assert jdbc_upsert(
        batch, url, "registry", ["id"], order_by=["seq"], driver=DERBY
    ) is True
    got = {
        r.id: (r.amount, r.tag)
        for r in jdbc_reader(spark, url, "registry", driver=DERBY)
        .load().collect()
    }
    assert got == {1: (10.0, "a"), 2: (21.0, "b2"), 3: (31.0, "c-new")}

    # target schema is invariant: a source with a column the target
    # lacks fails the (empty) staging append, mirroring store.merge
    with pytest.raises(Exception, match="extra|not defined|COLUMN"):
        jdbc_upsert(
            batch.withColumn("extra", batch.seq * 2),
            url, "registry", ["id"], order_by="seq", driver=DERBY,
        )

    with pytest.raises(ValueError, match="NULL merge key"):
        jdbc_upsert(
            spark.createDataFrame(
                [(None, 1.0, "x", 1)],
                "id long, amount double, tag string, seq long",
            ),
            url, "registry", ["id"], order_by="seq", driver=DERBY,
        )


def test_jdbc_upsert_epoch_guard_is_exactly_once_derby(spark, tmp_path):
    """The epoch guard makes replays no-ops: the same epoch commits
    once (second call returns False and changes nothing — even with
    DIFFERENT data, the replay contract), a new epoch applies, and a
    fresh table sees the guard table created on demand."""
    _require_derby(spark)
    url = f"jdbc:derby:{tmp_path}/epochdb;create=true"

    b0 = spark.createDataFrame([(1, 1.0)], "id long, v double")
    assert jdbc_upsert(b0, url, "serving", ["id"], driver=DERBY, epoch_id=0)
    # replay of epoch 0 with drifted content must NOT apply
    drift = spark.createDataFrame([(1, 99.0)], "id long, v double")
    assert (
        jdbc_upsert(drift, url, "serving", ["id"], driver=DERBY, epoch_id=0)
        is False
    )
    rows = jdbc_reader(spark, url, "serving", driver=DERBY).load().collect()
    assert [(r.id, r.v) for r in rows] == [(1, 1.0)]

    assert jdbc_upsert(
        spark.createDataFrame([(1, 2.0), (2, 5.0)], "id long, v double"),
        url, "serving", ["id"], driver=DERBY, epoch_id=1,
    ) is True
    got = {r.id: r.v for r in
           jdbc_reader(spark, url, "serving", driver=DERBY).load().collect()}
    assert got == {1: 2.0, 2: 5.0}


def test_jdbc_upsert_sink_survives_checkpoint_replay_derby(spark, tmp_path):
    """The streaming wrapper end-to-end: an availableNow stream lands
    batches in Derby through jdbc_upsert_sink; re-invoking the sink
    with an already-committed epoch (what a checkpoint recovery does
    after a post-commit crash) is a no-op, so the serving table holds
    exactly one row per key with the latest values."""
    _require_derby(spark)
    from feray_spark.streaming.fastlane import jdbc_upsert_sink

    url = f"jdbc:derby:{tmp_path}/streamdb;create=true"
    src = f"{tmp_path}/in"
    spark.createDataFrame(
        [(1, 100, 1.0), (2, 101, 2.0), (1, 102, 3.0)],
        "id long, event_id long, v double",
    ).coalesce(1).write.parquet(src)

    sink = jdbc_upsert_sink(
        url, "served", ["id"], order_by=["event_id"], driver=DERBY
    )
    stream = spark.readStream.schema(
        "id long, event_id long, v double"
    ).parquet(src)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r.id: (r.event_id, r.v) for r in
           jdbc_reader(spark, url, "served", driver=DERBY).load().collect()}
    assert got == {1: (102, 3.0), 2: (101, 2.0)}

    # post-commit crash recovery: same epoch replays through the sink
    replay = spark.createDataFrame(
        [(1, 102, 3.0), (2, 101, 2.0)], "id long, event_id long, v double"
    )
    sink(replay, 0)
    rows = jdbc_reader(spark, url, "served", driver=DERBY).load().collect()
    assert len(rows) == 2


def test_publish_registry_live_derby(spark, tmp_path):
    """The sqlmodel/Postgres registry analog end-to-end: materialize
    a feature view, publish its commit history into Derby, query it
    back over JDBC; re-publishing is idempotent (MERGE no-op), and a
    new materialization publishes as an additional version row with
    its check verdicts both as JSON and a pre-aggregated boolean."""
    _require_derby(spark)
    import pyspark.sql.functions as F

    from feray_spark.features.registry import publish_registry
    from feray_spark.features.store import FeatureStore
    from tests.conftest import SF_DIR

    url = f"jdbc:derby:{tmp_path}/regdb;create=true"
    fs = FeatureStore(
        spark, f"{tmp_path}/store",
        sources={"orders": f"{SF_DIR}/orders.parquet"},
    )

    @fs.feature_view(
        name="spend", inputs=["orders"], entities=["o_custkey"],
        checks={"nonempty": lambda df: F.count("*") > 0},
    )
    def spend(spark_, inputs):
        return inputs["orders"].groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("total")
        )

    fs.materialize("spend")
    assert publish_registry(fs, url, driver=DERBY) == 1
    assert publish_registry(fs, url, driver=DERBY) == 1  # idempotent

    reg = jdbc_reader(spark, url, "feature_registry", driver=DERBY).load()
    rows = reg.collect()
    assert len(rows) == 1
    r0 = rows[0]
    assert r0.view_name == "spend" and r0.version == 0
    assert r0.checks_passed is True and '"nonempty": true' in r0.checks
    assert r0.entities == "o_custkey" and r0.inputs == "orders"
    assert r0.fingerprint  # memo fingerprint mirrors outward

    fs.materialize("spend", force=True)  # version 1
    assert publish_registry(fs, url, driver=DERBY) == 2
    versions = sorted(
        r.version
        for r in jdbc_reader(spark, url, "feature_registry", driver=DERBY)
        .load().collect()
    )
    assert versions == [0, 1]
