"""Top-k per group — SURVEY §2.5 W8 (polars ``top_k_by``).

Window rank + filter: Spark pushes the ``rn <= k`` predicate into the
window's sort as a group-limit (WindowGroupLimit physical rule), so
each partition only materializes k rows per key rather than ranking
everything — the right shape at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str | None = "rn",
) -> DataFrame:
    """k best rows per key under a total order. Pass fully
    deterministic ``order_by`` (include a unique tiebreaker) or ranks
    are run-dependent."""
    # collisions corrupt silently (an input __rn would be overwritten;
    # an input column named rank_col would leave TWO identically-named
    # columns after the rename, failing any later select) — reject
    if "__rn" in df.columns:
        raise ValueError("input already has a __rn column; rename it first")
    if rank_col and rank_col in df.columns:
        raise ValueError(
            f"input already has a {rank_col!r} column; pass a different "
            "rank_col (or None to drop the rank)"
        )
    w = W.partitionBy(*partition_by).orderBy(*order_by)
    ranked = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col:
        return ranked.withColumnRenamed("__rn", rank_col)
    return ranked.drop("__rn")


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Exactly one row per key — the FIRST under ``order_by`` (pass
    ``F.col(c).desc()`` columns for "latest wins"). The shared
    upsert-dedup primitive behind jdbc_upsert, the fastlane serving
    sink, and the feature-store streaming sink: an ``availableNow``
    micro-batch routinely drains many commits and carries several
    rows per key, while merge/insert paths need exactly one.

    Same WindowGroupLimit shape as :func:`top_k_per_group` with k=1
    (each shuffle partition materializes one row per key, not the
    whole group). The internal rank column is collision-proofed
    against payload columns. Pass a total order (include a unique
    tiebreaker) or the winner is run-dependent."""
    rn = "__rn"
    while rn in df.columns:  # never clobber a real payload column
        rn += "_"
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rn, F.row_number().over(w))
        .filter(F.col(rn) == 1)
        .drop(rn)
    )
