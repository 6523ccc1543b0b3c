"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full oracle-gated catalog
from :mod:`feray_spark.queries` (one entry per implemented SURVEY §2
operator). See feray_spark/queries/* for implementations.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from feray_spark.queries import load_all  # noqa: E402
from feray_spark.session import apply_semantics  # noqa: E402

FLAGSHIP = "a1_groupby_q1"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    apply_semantics(spark)
    registry = load_all()
    return registry[FLAGSHIP].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry = load_all()

    def wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_semantics(spark)
            return q.fn(spark, sf_dir)

        run.__doc__ = q.doc
        return run

    return {name: wrap(q) for name, q in registry.items()}


def oracle_sql() -> dict[str, str]:
    registry = load_all()
    return {name: q.oracle for name, q in registry.items() if q.oracle is not None}
