"""Session-factory contracts: semantic configs and the cluster
sizing profile (the knobs local mode can't exercise are still unit-
checkable as pure conf derivation)."""

from __future__ import annotations

from feray_spark.session import SEMANTIC_CONF, cluster_profile


def test_cluster_profile_derives_from_topology():
    p = cluster_profile(executors=1000, cores_per_executor=4)
    assert p["spark.sql.shuffle.partitions"] == str(2 * 1000 * 4)
    assert p["spark.dynamicAllocation.maxExecutors"] == "1000"
    assert p["spark.sql.files.maxPartitionBytes"] == "128m"
    small = cluster_profile(executors=10, cores_per_executor=8,
                            target_partition_mb=256)
    assert small["spark.sql.shuffle.partitions"] == "160"
    assert small["spark.sql.files.maxPartitionBytes"] == "256m"


def test_cluster_profile_never_overrides_semantics():
    """Sizing must stay disjoint from the semantics contract — a
    deployment applying both dicts can't silently flip ANSI/TZ/AQE."""
    assert not set(cluster_profile()) & set(SEMANTIC_CONF)


def test_session_semantics_applied(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
