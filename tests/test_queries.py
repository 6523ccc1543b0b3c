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
