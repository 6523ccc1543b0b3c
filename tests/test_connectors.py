"""S4/S5 connector plumbing tests (no external services in this
environment — option construction and path handling only)."""

from __future__ import annotations

import pytest

from feray_spark.sources.connectors import (
    configure_s3,
    jdbc_reader,
    jdbc_writer,
    s3_path,
)


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
