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
    """A5 has no value oracle (sketches are engine-specific); assert
    the HLL estimate lands within 3x the configured rsd of exact."""
    row = load_all()["a5_approx_count_distinct"].fn(spark, sf_dir).collect()[0]
    assert abs(row.approx_custs - row.exact_custs) <= 3 * 0.05 * row.exact_custs


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
