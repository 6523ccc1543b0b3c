"""External connectors — SURVEY §2.1 S4 (JDBC/Postgres) and S5
(S3-compatible object stores).

The reference's stack claims Postgres for metadata (`README.md:16`,
sqlmodel dep `projects/feray/pyproject.toml:27`, dagster-postgres
`examples/pyproject.toml:66`) and S3-compatible object stores for
data (`README.md:17`). Spark natively speaks both; this module is
the one place the connection plumbing lives so jobs never
hand-assemble options.

No external services exist in the test environment, but S4 is still
exercised live two ways: the reader against Spark's own in-process
Hive Thrift server (real TCP JDBC, partitioned range scans) and the
writer+reader against embedded Apache Derby (jars ship inside the
pyspark wheel), with predicate pushdown asserted on the JDBC scan —
see tests/test_connectors.py. S5 tests cover option construction and
path handling only (no s3a jars in-image).

Scale notes (S4): JDBC reads default to ONE partition — a silent
single-thread bottleneck. :func:`jdbc_reader` therefore requires
partitioning info for anything but tiny registry tables
(numPartitions + partitionColumn bounds → parallel range scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

#: hadoop-conf template for S3A (S5). Endpoint-style (path vs vhost)
#: and credentials provider vary by store; these are the settings that
#: matter for any S3-compatible target (MinIO, Ceph, AWS).
S3A_CONF_KEYS = (
    "fs.s3a.endpoint",
    "fs.s3a.access.key",
    "fs.s3a.secret.key",
    "fs.s3a.path.style.access",
    "fs.s3a.connection.maximum",
)


def configure_s3(
    spark: SparkSession,
    *,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
    max_connections: int = 64,
) -> None:
    """S5: point the Hadoop S3A filesystem at an S3-compatible store.
    After this, every source/sink accepts ``s3a://bucket/key`` paths
    unchanged — the engine's path abstraction is the URI scheme."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    if endpoint:
        hc.set("fs.s3a.endpoint", endpoint)
    if access_key:
        hc.set("fs.s3a.access.key", access_key)
    if secret_key:
        hc.set("fs.s3a.secret.key", secret_key)
    hc.set("fs.s3a.path.style.access", "true" if path_style else "false")
    hc.set("fs.s3a.connection.maximum", str(max_connections))


def s3_path(bucket: str, key: str) -> str:
    """Canonical object-store path (S5)."""
    return f"s3a://{bucket.strip('/')}/{key.lstrip('/')}"


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrameReader:
    """S4: configured JDBC reader (call ``.load()`` to execute).

    For registry-sized tables the default single partition is fine;
    for anything larger pass (num_partitions, partition_column,
    lower/upper_bound) so Spark issues parallel range queries instead
    of one full scan through a single connection.

    ``driver`` pins the JDBC driver class when the URL scheme isn't
    auto-registered (e.g. ``org.apache.hive.jdbc.HiveDriver`` for
    ``jdbc:hive2://`` endpoints — exercised end-to-end in
    tests/test_connectors.py against an in-process Thrift server).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    parts = (num_partitions, partition_column, lower_bound, upper_bound)
    if any(p is not None for p in parts):
        if any(p is None for p in parts):
            raise ValueError(
                "partitioned JDBC read needs all of num_partitions, "
                "partition_column, lower_bound, upper_bound"
            )
        reader = (
            reader.option("numPartitions", str(num_partitions))
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 10_000,
    driver: str | None = None,
):
    """S4: configured JDBC writer (call ``.save()`` to execute).
    ``driver`` pins the JDBC driver class for endpoints that don't
    auto-register from the URL (e.g. hive2) — the same knob
    :func:`jdbc_reader` exposes; the pair stays symmetric."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if driver is not None:
        writer = writer.option("driver", driver)
    return writer
