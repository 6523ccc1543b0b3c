"""A/B: a12_table_profile's per-column union-of-branches vs a
single-pass posexplode form (VERDICT r7 item 5).

The union form runs one (value-groupBy -> tiny final agg) branch per
column; columnar pruning means each branch reads only its own pages,
so total I/O matches the single-pass form — the question is purely
whether the 4-branch job floor (~0.25 s/job measured on this box)
loses to ONE job that posexplodes the 4 columns into (idx, value)
pairs (4x the rows into the first hash agg, but one lineage).

Run: python scripts/a12_single_job_ab.py [--runs 5]
Prints one JSON line with medians; interleaved A/B so box phase
cancels.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from feray_spark.catalog import load_table  # noqa: E402
from feray_spark.queries import load_all  # noqa: E402
from feray_spark.queries.aggregates import _PROFILE_COLS  # noqa: E402
from feray_spark.queries.util import dec  # noqa: E402
from feray_spark.session import apply_semantics, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One job: posexplode the profiled columns into (idx, v) pairs,
    groupBy (idx, v) with map-side combine, then one tiny final agg
    per column and a name lookup."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.posexplode(
            F.array(*[F.col(c).cast("double") for c in _PROFILE_COLS])
        ).alias("idx", "v")
    )
    vc = pairs.groupBy("idx", "v").agg(F.count("*").alias("__n"))
    names = F.array(*[F.lit(c) for c in _PROFILE_COLS])
    return (
        vc.groupBy("idx")
        .agg(
            F.sum(F.when(F.col("v").isNull(), F.col("__n")).otherwise(0))
            .cast("bigint")
            .alias("n_nulls"),
            F.count("v").alias("n_distinct"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            (
                F.sum(dec("v") * F.col("__n")).cast("double")
                / F.sum(
                    F.when(F.col("v").isNotNull(), F.col("__n")).otherwise(0)
                )
            ).alias("mean_v"),
        )
        .select(
            F.element_at(names, F.col("idx") + 1).alias("col_name"),
            "n_nulls",
            "n_distinct",
            "min_v",
            "max_v",
            "mean_v",
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf-dir", default=SF_DIR)
    args = ap.parse_args()

    spark = get_spark(app_name="a12-ab")
    apply_semantics(spark)
    spark.sparkContext.setLogLevel("ERROR")
    union_fn = load_all()["a12_table_profile"].fn

    # equality first: both forms must produce identical rows
    a = sorted(map(tuple, union_fn(spark, args.sf_dir).collect()))
    b = sorted(map(tuple, single_pass(spark, args.sf_dir).collect()))
    assert a == b, (a, b)

    times: dict[str, list[float]] = {"union": [], "single": []}
    for _ in range(args.runs):
        for key, fn in (
            ("union", lambda: union_fn(spark, args.sf_dir)),
            ("single", lambda: single_pass(spark, args.sf_dir)),
        ):
            df = fn()  # rebuild per run: same-object re-collect reuses shuffles
            t = time.time()
            df.collect()
            times[key].append(time.time() - t)

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "runs": args.runs,
                "union_median_s": round(statistics.median(times["union"]), 3),
                "single_median_s": round(
                    statistics.median(times["single"]), 3
                ),
                "union_all": [round(t, 3) for t in times["union"]],
                "single_all": [round(t, 3) for t in times["single"]],
            }
        )
    )


if __name__ == "__main__":
    main()
