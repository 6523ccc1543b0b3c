"""Bucketed (co-located) joins — the SURVEY §4.3 scale path for hot
join keys ("sort-merge/hash shuffles; bucketing on hot join keys at
scale").

At 100 TB the dominant cost of a fact-fact equi-join is shuffling
both sides. Writing both tables bucketed by the join key with the
same bucket count makes every future join on that key shuffle-FREE:
each task sort-merges bucket i of A with bucket i of B. Pay one
shuffle at write time, amortize it over every downstream join /
aggregation on the key.

This module is the one place bucket layout decisions live:

- :func:`write_bucketed` — materialize a DataFrame as a bucketed,
  bucket-sorted parquet table registered in the session catalog
  (bucketed reads need catalog metadata; a bare parquet path loses
  the bucket spec).
- :func:`bucketed_join` — join two catalog tables, asserting (via
  plan inspection, optional) that no Exchange was inserted.

tests/test_plans.py::test_bucketed_join_no_shuffle proves the plan:
two tables bucketed on the key join with ZERO Exchange operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_by: Sequence[str],
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed parquet table in the session
    catalog. ``sort=True`` additionally sorts within buckets on the
    bucket keys, letting downstream sort-merge joins skip the sort.

    Sizing rule for ``num_buckets`` at scale: total table size /
    bucket count should land in the 100-500 MB per-bucket-file range
    per partition writer; too few buckets caps join parallelism, too
    many produces small files.
    """
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_by)
    )
    if sort:
        writer = writer.sortBy(*bucket_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
    *,
    require_no_exchange: bool = False,
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket keys. When
    both sides share bucket count and keys, Catalyst plans a
    SortMergeJoin with no Exchange on either side.

    ``require_no_exchange=True`` asserts that promise against the
    physical plan and raises if any Exchange was inserted — the
    mis-bucketing tripwire (mismatched bucket counts silently
    re-introduce the full shuffle this module exists to eliminate)."""
    joined = spark.table(left_table).join(
        spark.table(right_table), list(on), how
    )
    if require_no_exchange:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # SHUFFLE exchanges only: a BroadcastExchange (Catalyst chose
        # to broadcast a small bucketed side — no shuffle at all) is
        # exactly what bucketing exists to allow, not a mis-bucketing
        if "Exchange hashpartitioning" in plan or "ShuffleExchange" in plan:
            raise ValueError(
                f"bucketed_join({left_table}, {right_table}) planned a "
                "shuffle Exchange — bucket counts/keys do not line up:\n"
                + plan
            )
    return joined
