"""Distribution drift report between two relation snapshots — the
monitoring half of FS5's asset checks: checks gate a single
materialization, drift compares one against a baseline (yesterday's
table, the training snapshot, another environment) and flags the
columns whose distribution moved.

Shape: ONE lazy aggregate job. The snapshots union under a side tag
and a single global aggregate computes every per-column statistic
for both sides at once via side-conditional aggregates
(count/nulls/min/max/exact-decimal mean — the A12 statistics, but
all columns in one aggregate because drift reports want a fixed row
per column, not per-value NDV); the one summary row then explodes
into per-column report rows without ever touching the driver. The
whole report is a single DataFrame lineage, so callers pay exactly
one job at action time; at 100 TB the cost is the two input scans
feeding one partial+final aggregate, and on `TableStore` tables the
baseline side can come from time travel for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    leave the mean — widen the type for such columns. Means are
    rounded to 6 decimals: DuckDB's decimal(…,9)→double cast is not
    correctly rounded, so the raw quotient drifts ~1 ulp between
    engines; 6-decimal rounding on BOTH sides absorbs that while
    staying far above alert thresholds.

    Fully lazy: returns an unevaluated DataFrame whose plan is one
    global aggregate (both sides' statistics as side-conditional
    aggregates over the tagged union — identical arithmetic to two
    separate per-side aggregates) followed by a driverless explode
    of the summary row into per-column rows."""
    if not cols:
        # zero columns profiled (e.g. an empty schema intersection):
        # an empty, correctly-typed report — F.array() of zero structs
        # would fail analysis instead
        return baseline.sparkSession.createDataFrame(
            [],
            "col_name string, n_baseline bigint, n_current bigint, "
            "null_rate_baseline double, null_rate_current double, "
            "mean_baseline double, mean_current double, mean_shift double, "
            "min_baseline double, min_current double, "
            "max_baseline double, max_current double, range_expanded boolean",
        )
    tagged = baseline.select(F.lit("b").alias("__side"), *cols).unionByName(
        current.select(F.lit("c").alias("__side"), *cols)
    )
    # Hoist the decimal cast into ONE unconditional projection column
    # per profiled column. Inlined as `when(side, cast(...))` inside
    # the sum AND count aggregates, the cast sits in a conditional
    # branch, which codegen subexpression elimination skips — every
    # row paid the non-long-backed decimal conversion twice (p > 18
    # decimals allocate a BigDecimal per conversion). Measured at the
    # 64x probe corpus this cast work dominated the whole report
    # (~8 s of ~10 s; the same aggregate with double means runs
    # 1.4 s). As a projection field it is evaluated once per row and
    # the aggregates reference the attribute; CollapseProject cannot
    # inline it back (two non-cheap references).
    dec_names: dict[str, str] = {}
    for c in cols:
        d = f"__dec_{c}"
        while d in tagged.columns:  # never clobber a profiled column
            d += "_"
        dec_names[c] = d
    tagged = tagged.select(
        "*", *[F.col(c).cast(decimal).alias(dec_names[c]) for c in cols]
    )
    aggs = []
    for s in ("b", "c"):
        side = F.col("__side") == s
        aggs.append(F.count(F.when(side, 1)).alias(f"{s}__n"))
        for c in cols:
            v = F.when(side, F.col(c))
            dv = F.when(side, F.col(dec_names[c]))
            aggs += [
                F.count(F.when(side & F.col(c).isNull(), 1)).alias(
                    f"{s}_{c}__nulls"
                ),
                F.min(v).cast("double").alias(f"{s}_{c}__min"),
                F.max(v).cast("double").alias(f"{s}_{c}__max"),
                # denominator counts the CASTABLE values only: a value
                # overflowing the decimal cast leaves the numerator as
                # NULL, so it must leave the denominator too — else the
                # mean is sum-of-some over count-of-all (neither the
                # true mean nor the mean of castables)
                F.round(
                    F.sum(dv).cast("double") / F.count(dv),
                    6,
                ).alias(f"{s}_{c}__mean"),
            ]
    summary = tagged.agg(*aggs)

    per_col = []
    for c in cols:
        b_n, c_n = F.col("b__n"), F.col("c__n")
        b_min, c_min = F.col(f"b_{c}__min"), F.col(f"c_{c}__min")
        b_max, c_max = F.col(f"b_{c}__max"), F.col(f"c_{c}__max")
        b_mean, c_mean = F.col(f"b_{c}__mean"), F.col(f"c_{c}__mean")
        per_col.append(
            F.struct(
                F.lit(c).alias("col_name"),
                b_n.cast("bigint").alias("n_baseline"),
                c_n.cast("bigint").alias("n_current"),
                F.when(
                    b_n > 0, F.col(f"b_{c}__nulls").cast("double") / b_n
                ).alias("null_rate_baseline"),
                F.when(
                    c_n > 0, F.col(f"c_{c}__nulls").cast("double") / c_n
                ).alias("null_rate_current"),
                b_mean.alias("mean_baseline"),
                c_mean.alias("mean_current"),
                (c_mean - b_mean).alias("mean_shift"),
                b_min.alias("min_baseline"),
                c_min.alias("min_current"),
                b_max.alias("max_baseline"),
                c_max.alias("max_current"),
                # expanded: current has values outside the baseline's
                # range — including the case where the baseline had NO
                # values at all (a range appearing IS an expansion;
                # b_min NULL short-circuits the three-valued OR to
                # TRUE before the NULL comparisons can poison it)
                F.when(
                    c_min.isNotNull(),
                    b_min.isNull() | (c_min < b_min) | (c_max > b_max),
                )
                .otherwise(F.lit(False))
                .alias("range_expanded"),
            )
        )
    return summary.select(F.explode(F.array(*per_col)).alias("__r")).select(
        "__r.*"
    )
