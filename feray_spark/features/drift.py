"""Distribution drift report between two relation snapshots — the
monitoring half of FS5's asset checks: checks gate a single
materialization, drift compares one against a baseline (yesterday's
table, the training snapshot, another environment) and flags the
columns whose distribution moved.

Shape: BOTH sides' per-column summaries computed in one single
grouped-aggregate job (snapshots union under a side tag) (count/nulls/min/max/exact-decimal mean —
the A12 statistics, but all columns in one aggregate because drift
reports want a fixed row per column, not per-value NDV), then a
driver-side pivot of the two tiny summary rows into a per-column
report. Nothing but the two aggregates ever runs on data; at 100 TB
the cost is two scans, and on `TableStore` tables the baseline side
can come from time travel for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _summaries(
    baseline: DataFrame, current: DataFrame, cols: Sequence[str], decimal: str
):
    """Both sides' per-column summaries in ONE job: the snapshots
    union under a side tag and a single grouped aggregate computes
    every statistic — identical arithmetic to two separate
    aggregates (the tag partitions the rows), half the job count."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            # order-independent exact mean (the queries/util.py dsum
            # discipline, but with a caller-chosen scale: money wants
            # (18,2); normalized features need fractional digits or
            # small shifts quantize to zero). Rounded to 6 decimals:
            # DuckDB's decimal(…,9)→double cast is not correctly
            # rounded (scale multiply after int conversion), so the
            # raw quotient drifts by ~1 ulp between engines and a
            # value hash would flip; 6-decimal rounding on BOTH sides
            # absorbs that while staying far above alert thresholds.
            F.round(
                F.sum(F.col(c).cast(decimal)).cast("double") / F.count(c), 6
            ).alias(f"{c}__mean"),
        ]
    tagged = baseline.select(F.lit("b").alias("__side"), *cols).unionByName(
        current.select(F.lit("c").alias("__side"), *cols)
    )
    by_side = {
        r["__side"]: r
        for r in tagged.groupBy("__side").agg(*aggs).collect()
    }
    empty = {"__n": 0, **{k: None for c in cols for k in (
        f"{c}__nulls", f"{c}__min", f"{c}__max", f"{c}__mean")}}
    return by_side.get("b", empty), by_side.get("c", empty)


def drift_report(
    baseline: DataFrame,
    current: DataFrame,
    cols: Sequence[str],
    decimal: str = "decimal(28,9)",
) -> DataFrame:
    """Per-column drift between two snapshots: row counts, null
    rates, min/max ranges and exact-decimal means on both sides,
    plus the deltas monitoring rules alert on (mean shift, null-rate
    shift, range expansion). Exact decimal arithmetic end to end —
    two runs over identical data report EXACTLY zero drift, so
    alert thresholds never fight float noise.

    ``decimal`` sets the mean accumulator's type: the (28,9) default
    keeps 9 fractional digits (normalized features don't quantize to
    zero) with integer headroom to ~1e19; values beyond the chosen
    precision cast to NULL under non-ANSI semantics and silently
    leave the mean — widen the type for such columns."""
    spark = baseline.sparkSession
    b, c = _summaries(baseline, current, cols, decimal)
    rows = []
    for col in cols:
        b_n, c_n = b["__n"], c["__n"]
        b_mean, c_mean = b[f"{col}__mean"], c[f"{col}__mean"]
        rows.append(
            (
                col,
                int(b_n),
                int(c_n),
                float(b[f"{col}__nulls"]) / b_n if b_n else None,
                float(c[f"{col}__nulls"]) / c_n if c_n else None,
                b_mean,
                c_mean,
                (c_mean - b_mean) if (b_mean is not None and c_mean is not None) else None,
                b[f"{col}__min"],
                c[f"{col}__min"],
                b[f"{col}__max"],
                c[f"{col}__max"],
                # expanded: current has values outside the baseline's
                # range — including the case where the baseline had NO
                # values at all (a range appearing IS an expansion)
                bool(
                    c[f"{col}__min"] is not None
                    and (
                        b[f"{col}__min"] is None
                        or c[f"{col}__min"] < b[f"{col}__min"]
                        or c[f"{col}__max"] > b[f"{col}__max"]
                    )
                ),
            )
        )
    return spark.createDataFrame(
        rows,
        "col_name string, n_baseline bigint, n_current bigint, "
        "null_rate_baseline double, null_rate_current double, "
        "mean_baseline double, mean_current double, mean_shift double, "
        "min_baseline double, min_current double, "
        "max_baseline double, max_current double, range_expanded boolean",
    )
