"""Differential tests: every catalog query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from feray_spark.queries import load_all
from tests.oracle_utils import assert_parity

QUERIES = list(load_all().values())


@pytest.mark.parametrize("query", QUERIES, ids=[q.name for q in QUERIES])
def test_query_parity(spark, sf_dir, query):
    assert_parity(spark, sf_dir, query)


def test_a5_error_bound(spark, sf_dir):
    """Independent of a5's invariant oracle (which pins a 15 % bound
    inside the hashed row), assert the raw HLL estimate lands within
    3x the configured rsd of exact — the tighter statistical claim."""
    from pyspark.sql import functions as F

    from feray_spark.catalog import load_table
    from feray_spark.queries.aggregates import A5_BOUND, A5_RSD

    row = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.approx_count_distinct("o_custkey", A5_RSD).alias("approx_custs"),
            F.countDistinct("o_custkey").alias("exact_custs"),
        )
        .collect()[0]
    )
    assert abs(row.approx_custs - row.exact_custs) <= A5_BOUND * row.exact_custs


def test_register_views_cache_tracks_sf_dir(spark):
    """register_views is a no-op for a repeat (session, sf_dir) but
    must re-register when the fixture dir changes — the SQL surface
    would otherwise silently query the previous scale factor."""
    from feray_spark.catalog import register_views

    register_views(spark, "/root/testdata/sf0.001")
    n_small = spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n
    register_views(spark, "/root/testdata/sf0.01")
    n_big = spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n
    assert n_big > n_small
    # repeat registration is served from cache (same result, no swap)
    register_views(spark, "/root/testdata/sf0.01")
    assert spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n == n_big


def test_driver_window_is_the_priority_rotation():
    """The driver's correctness runner checks only the FIRST 50
    entries of queries(); this round's goal is verifying the
    never-yet-checked queries, so the window must be exactly the
    rotation list — in order. Any rows-only member must be listed
    here explicitly (each with a compensating assert). Round 9
    promoted a3b/a5/l5b and round 10 promoted l22 to full invariant
    oracles, so only the genuinely engine-specific output remains
    rows-only: f_hash_native xxhash64/murmur values."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_entry",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    q = entry.queries()
    osql = entry.oracle_sql()
    window = list(q)[:50]
    assert window == entry._DRIVER_PRIORITY[:50]
    rows_only: set[str] = {
        # engine-native hash values are Spark-internal by definition;
        # compensated by its own determinism/reference-vector asserts
        # (VERDICT r7 table)
        "f_hash_native",
    }
    assert all(n in osql for n in window if n not in rows_only), [
        n for n in window if n not in osql and n not in rows_only
    ]
    # ordering helper must keep every registry entry exactly once
    assert sorted(q) == sorted(set(q)) and len(q) == len(osql) + sum(
        1 for n in q if n not in osql
    )


def test_ep4_bounds_its_temp_views(spark, sf_dir):
    """Repeated ep4 invocations must not accumulate temp views (each
    pins a localCheckpoint for the session's lifetime)."""
    from feray_spark.queries import load_all

    fn = load_all()["ep4_recursive_cte"].fn
    for _ in range(3):
        fn(spark, sf_dir).collect()
    views = [
        t.name for t in spark.catalog.listTables()
        if t.isTemporary and t.name.startswith("__ep4_seq_")
    ]
    assert len(views) <= 1, views


@pytest.mark.parametrize(
    "attr",
    [
        "_ROUND5_PRIORITY",
        "_ROUND6_PRIORITY",
        "_ROUND7_PRIORITY",
        "_ROUND8_PRIORITY",
        "_ROUND9_PRIORITY",
        "_ROUND10_PRIORITY",
    ],
)
def test_staged_rotation_names_resolve(attr):
    """The rotation lists are hand-maintained; a typo'd name would
    silently fall out of _ordered() and the intended query would miss
    its driver window next round. Every staged name must exist in the
    registry, exactly once."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "spark_entry_rot",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    registry = set(load_all())
    staged = getattr(entry, attr)
    unknown = [n for n in staged if n not in registry]
    assert not unknown, unknown
    assert len(staged) == len(set(staged)), "duplicate staged names"
    # the driver window is 50 slots; the staged list must fill it
    # EXACTLY — a longer list silently drops its tail out of the
    # window (round-4 lesson: 7 appended names pushed entries the
    # comment claimed were "kept IN the window" to positions 51+)
    assert len(staged) == 50, len(staged)
