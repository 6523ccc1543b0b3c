"""Skew-resilient salted join — SURVEY §2.3 J10 (north-star scale).

At 100 TB a single hot join key overwhelms one reducer. The classic
fix: append a salt in [0, S) to the large side's key, replicate the
small side S times (once per salt value), and join on (key, salt).
Result is identical to the plain equi-join; the hot key's rows now
spread across S reducers.

AQE's skew-join splitting (enabled in session.SEMANTIC_CONF) handles
moderate skew automatically; explicit salting is for the pathological
keys AQE can't split (e.g. a single key larger than executor memory).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on ``on`` with the large side's hot
    keys spread over ``salts`` sub-partitions.

    The salt on the large side is derived from a hash of the whole row
    (xxhash64 of all columns) so it is deterministic across retries —
    a requirement for idempotent task re-execution — while still
    spreading rows with identical join keys.

    ``how`` is restricted to join types whose result is provably
    identical to the unsalted join: inner/left/left_semi/left_anti
    (the large side keeps exactly one salt per row; semi/anti
    existence checks are per-(key, salt) but replication puts the
    small side under EVERY salt). right/full would emit one
    null-padded copy of each unmatched SMALL row per salt —
    ``salts``× duplication, silently wrong — so they are rejected;
    salt the other side's frame for those.

    Residual skew caveat: rows that are BYTE-IDENTICAL across all
    columns share a salt (same content hash), so a hot key made of
    exact duplicate rows stays on one reducer. That is the price of
    a deterministic salt; if exact-duplicate floods are your skew,
    aggregate them to (row, count) first and join the distinct rows.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower().replace("_", "") not in {
        a.replace("_", "") for a in allowed
    }:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, got {how!r}: "
            "right/full would duplicate unmatched small-side rows "
            "once per salt"
        )
    if salts < 1:
        # pmod(x, 0) is NULL under the non-ANSI session and range(0)
        # is empty — the join would silently return zero rows (inner)
        # or all-null padding (left) instead of erroring
        raise ValueError(f"salts must be >= 1, got {salts}")
    on = list(on)
    overlapping = [c for c in small.columns if c in large.columns and c not in on]
    if overlapping:
        raise ValueError(f"ambiguous non-key columns: {overlapping}")
    if _SALT in large.columns or _SALT in small.columns:
        # withColumn would silently OVERWRITE (and the final drop
        # discard) a real user column of that name
        raise ValueError(
            f"salted_join reserves the column name {_SALT!r}; rename it"
        )
    # the salt MUST be deterministic per row content, never a per-row
    # counter: monotonically_increasing_id / rand re-derive different
    # values when a lost map output is recomputed while other reduce
    # tasks already consumed the old output (fetch-failure partial
    # recompute, the SPARK-23207 corruption class) — a row would then
    # join under TWO salts (duplicate) or none (loss). xxhash64 over
    # every column is stable under any recompute; distinct rows of a
    # hot key still spread across salts (see the docstring's
    # exact-duplicate caveat).
    salted_large = large.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(salts))
    )
    replicated_small = small.crossJoin(
        F.broadcast(
            salted_large.sparkSession.range(salts).select(
                F.col("id").cast("int").alias(_SALT)
            )
        )
    ).withColumn(_SALT, F.col(_SALT).cast("bigint"))
    joined = salted_large.join(replicated_small, [*on, _SALT], how)
    return joined.drop(_SALT)
