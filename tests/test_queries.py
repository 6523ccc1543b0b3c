"""Differential tests: every catalog query vs its DuckDB oracle."""

from __future__ import annotations

import pytest

from feray_spark.queries import load_all
from tests.oracle_utils import assert_parity

QUERIES = list(load_all().values())


@pytest.mark.parametrize("query", QUERIES, ids=[q.name for q in QUERIES])
def test_query_parity(spark, sf_dir, query):
    assert_parity(spark, sf_dir, query)
