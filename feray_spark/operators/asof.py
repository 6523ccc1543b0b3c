"""As-of (point-in-time) join — SURVEY §2.3 J8/J9.

THE feature-store correctness join (reference concept: record-level
versioning + single-row serving, reference ``README.md:23,47-55``;
declared engine surface: polars ``join_asof``). For each left row,
find the latest right row whose timestamp is ``<`` (strict) or ``<=``
(inclusive) the left timestamp, per key — preventing feature leakage
when assembling training sets.

Spark has no native as-of join, so this is a documented DataFrame
rewrite (SURVEY §4.3): tag both sides, union them, and run a single
``last(..., ignorenulls=True)`` window per key ordered by
``(ts, side)``; left rows then carry the most recent right payload.

Scale properties (100 TB posture):
- exactly ONE shuffle: the window's hash partition on the join key —
  the same cost as the shuffle any equi-join would pay; no
  per-key cross product, no range explosion.
- state per key is O(1) within the window frame (running ``last``),
  so skewed keys degrade to a sort, not a blow-up; AQE skew handling
  applies to the exchange.
- tie-breaking is deterministic: right rows at the same timestamp are
  ordered by the tuple of ORDERABLE payload columns (map-typed
  payload columns ride along without entering the ordering, which
  would be unplannable) so reruns give identical output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RPAY = "__asof_rpay"
_TS = "__asof_ts"
_TB = "__asof_tb"


def _orderable(dt) -> bool:
    """Whether a type can appear in a window ORDER BY (maps cannot,
    nor can containers holding one)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _orderable(dt.elementType)
    return True


def _orderable_cols(df: DataFrame, cols: Sequence[str]) -> list[str]:
    """The subset of ``cols`` usable as a deterministic tiebreaker:
    ordering by the whole payload struct would make the join
    unplannable the moment a payload column is a map."""
    types = {f.name: f.dataType for f in df.schema.fields}
    return [c for c in cols if _orderable(types[c])]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    *,
    allow_exact_matches: bool = False,
    suffix: str = "",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts < left.ts`` (or ``<=`` when ``allow_exact_matches``),
    matching on the equi-key(s) ``on``. Unmatched left rows keep NULL
    right columns (left-outer semantics, like polars ``join_asof`` and
    DuckDB ``ASOF LEFT JOIN``).

    ``right_cols`` — right payload columns to attach (default: all
    non-key, non-ts columns). Appended with ``suffix``.
    """
    right_ts = right_ts or left_ts
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (*on, right_ts)]
    out_names = [c + suffix for c in right_cols]
    clash = sorted(set(out_names) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join output columns {clash} collide with left columns; "
            "pass a suffix or narrow right_cols"
        )

    # Common frame: key cols, event time, side tag, payload structs.
    # side orders rows at EQUAL timestamps: for strict matching the
    # left row sorts BEFORE same-ts right rows (so it cannot see
    # them); for inclusive matching, after.
    left_side, right_side = (0, 1) if not allow_exact_matches else (1, 0)
    # SQL ASOF semantics (polars join_asof, DuckDB ASOF JOIN): a right
    # row with a NULL key or NULL timestamp can never match — drop them
    # up front, or NULLS-FIRST ordering would sort a NULL-ts right row
    # before every left row (visible to all of them) and NULL keys
    # would equi-match each other.
    rf = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        rf = rf.filter(F.col(k).isNotNull())
    # deterministic tiebreaker for same-(key, ts) right rows: the
    # ORDERABLE payload columns only — ordering by the whole payload
    # struct would be unplannable the moment a payload column is a map
    tb_cols = _orderable_cols(rf, right_cols)
    if tb_cols:
        tb_struct = F.struct(*[F.col(c) for c in tb_cols])
    else:
        # every payload column is unorderable (all maps): an empty
        # struct would silently degrade the documented deterministic
        # tie-breaking to arbitrary order. Fall back to a
        # deterministic surrogate — a hash of the JSON-serialized
        # payload — so same-(key, ts) winners are stable across runs.
        # Spark guarantees no canonical entry order for equal maps
        # built in different orders, so top-level map columns are
        # canonicalized to key-sorted entry arrays before hashing
        # (comparator touches only the key — values may themselves be
        # unorderable). Residual caveat: maps nested INSIDE a value
        # still serialize in construction order; determinism there
        # holds only for identical physical construction.
        from pyspark.sql import types as T

        def _canon(c: str):
            if isinstance(rf.schema[c].dataType, T.MapType):
                return F.expr(
                    f"array_sort(map_entries(`{c}`), (a, b) -> "
                    "CASE WHEN a.key < b.key THEN -1 "
                    "WHEN a.key > b.key THEN 1 ELSE 0 END)"
                ).alias(c)
            return F.col(c)

        tb_struct = F.struct(
            F.md5(
                F.to_json(F.struct(*[_canon(c) for c in right_cols]))
            ).alias("__payload_hash")
        )
    rf = rf.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        F.struct(*[F.col(c) for c in right_cols]).alias(_RPAY),
        tb_struct.alias(_TB),
    )
    rpay_type = rf.schema[_RPAY].dataType
    lf = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_lpay"),
        # typed NULL up front (unionByName needs identical schemas)
        F.lit(None).cast(rpay_type).alias(_RPAY),
        F.lit(None).cast(rf.schema[_TB].dataType).alias(_TB),
    )
    rf = rf.withColumn(
        "__asof_lpay", F.lit(None).cast(lf.schema["__asof_lpay"].dataType)
    )

    unioned = lf.unionByName(rf)
    w = (
        W.partitionBy(*on)
        .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_TB).asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = unioned.withColumn(_RPAY, F.last(_RPAY, ignorenulls=True).over(w))
    out = matched.filter(F.col("__asof_lpay").isNotNull())
    return out.select(
        *[F.col(f"__asof_lpay.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"{_RPAY}.{src}").alias(dst)
            for src, dst in zip(right_cols, out_names)
        ],
    )


def asof_join_multi(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    features: dict[str, tuple[F.Column | None, Sequence[str]]],
    *,
    allow_exact_matches: bool = False,
) -> DataFrame:
    """N as-of features from ONE right-side event stream in ONE
    union + window pass.

    ``features`` maps a suffix to ``(condition, payload_cols)``: each
    feature is "the latest right row satisfying ``condition`` (None =
    all rows) strictly before (or at, with ``allow_exact_matches``)
    the left timestamp", keyed on ``on``. Equivalent to chaining
    :func:`asof_join` once per feature against filtered copies of
    ``right`` — but the chained form pays one key-shuffle + sort PER
    feature and re-scans the event table per feature, while this
    shape pays exactly ONE shuffle and ONE sort total: each feature
    is just another ``last(payload_f, ignorenulls=True)`` over the
    same window, and a right row outside a feature's condition
    carries a NULL payload for it (invisible to that feature's
    ``last``). At 100 TB this is the difference between O(features)
    and O(1) passes over the event log — the standard feature-store
    "N aggregates off one event stream" pattern.

    Tie rule: right rows sharing (key, ts) are ordered by the frozen
    tuple of ALL features' (pre-fill) tiebreaker structs — each the
    feature's ORDERABLE payload columns under the same NULL pattern
    as its payload — and every feature's ``last`` is evaluated in one
    projection over that untouched ordering. Tie resolution is
    deterministic, consistent across features, and matches the
    chained :func:`asof_join` form whenever features share payload
    columns (each asof_join breaks ties the same way)."""
    on = list(on)
    out_cols = [c + sfx for sfx, (_, cols) in features.items() for c in cols]
    clash = sorted(set(out_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join_multi output columns {clash} collide with left "
            "columns; adjust the feature suffixes"
        )
    left_side, right_side = (0, 1) if not allow_exact_matches else (1, 0)
    pay_names = {sfx: f"__asof_pay{sfx}" for sfx in features}
    lf = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_lpay"),
    )
    # SQL ASOF semantics: NULL-key / NULL-ts right rows never match
    # (see asof_join)
    right = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    # per-feature tiebreakers over the ORDERABLE payload columns only
    # (same null pattern as the payload structs, so tie resolution is
    # unchanged for orderable payloads; map-typed payload columns ride
    # along without making the window unplannable)
    tb_names = {sfx: f"__asof_tb{sfx}" for sfx in features}
    tb_cols = {
        sfx: _orderable_cols(right, cols)
        for sfx, (_, cols) in features.items()
    }
    rf = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        *[
            (
                F.when(cond, F.struct(*[F.col(c) for c in cols]))
                if cond is not None
                else F.struct(*[F.col(c) for c in cols])
            ).alias(pay_names[sfx])
            for sfx, (cond, cols) in features.items()
        ],
        *[
            (
                F.when(cond, F.struct(*[F.col(c) for c in tb_cols[sfx]]))
                if cond is not None
                else F.struct(*[F.col(c) for c in tb_cols[sfx]])
            ).alias(tb_names[sfx])
            for sfx, (cond, _) in features.items()
        ],
    )
    lpay_type = lf.schema["__asof_lpay"].dataType
    for sfx in features:
        lf = lf.withColumn(
            pay_names[sfx], F.lit(None).cast(rf.schema[pay_names[sfx]].dataType)
        )
        lf = lf.withColumn(
            tb_names[sfx], F.lit(None).cast(rf.schema[tb_names[sfx]].dataType)
        )
    rf = rf.withColumn("__asof_lpay", F.lit(None).cast(lpay_type))

    unioned = lf.unionByName(rf)
    w = (
        W.partitionBy(*on)
        .orderBy(
            F.col(_TS).asc(),
            F.col(_SIDE).asc(),
            *[F.col(tb_names[s]).asc() for s in features],
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # All features' ``last`` must be evaluated in ONE select over the
    # untouched union: chained withColumn would overwrite pay columns the
    # shared window's orderBy still references, so later features could
    # resolve (ts, side)-ties against a different right row than earlier
    # ones. A single projection keeps tie resolution consistent across
    # features (and identical to the chained asof_join form).
    payset = set(pay_names.values())
    matched = unioned.select(
        *[F.col(c) for c in unioned.columns if c not in payset],
        *[
            F.last(pay_names[sfx], ignorenulls=True).over(w).alias(pay_names[sfx])
            for sfx in features
        ],
    )
    out = matched.filter(F.col("__asof_lpay").isNotNull())
    return out.select(
        *[F.col(f"__asof_lpay.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"{pay_names[sfx]}.{c}").alias(c + sfx)
            for sfx, (_, cols) in features.items()
            for c in cols
        ],
    )


def point_in_time_join(
    spine: DataFrame,
    feature_tables: dict[str, tuple[DataFrame, Sequence[str], str]],
    spine_ts: str,
    *,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """J9: assemble a training set — a spine of (entity, ts) rows
    as-of joined to N feature tables (reference raison d'être:
    "Memoization-enabled feature store",
    ``projects/feray/pyproject.toml:4``).

    ``feature_tables`` maps a suffix to ``(table, key_cols, ts_col)``;
    each is attached with :func:`asof_join` in turn. Chained as-of
    joins each cost one key-partition shuffle; tables sharing the same
    entity key reuse the partitioning across stages under AQE.
    """
    out = spine
    for suffix, (table, keys, ts_col) in feature_tables.items():
        out = asof_join(
            out,
            table,
            on=keys,
            left_ts=spine_ts,
            right_ts=ts_col,
            allow_exact_matches=allow_exact_matches,
            suffix=suffix,
        )
    return out
