"""Interleaved A/B: ep6's per-orderkey quantity aggregate — the
two-level (orderkey, partition_id) long-partial + decimal-combine
shape (exact_grouped_sums pattern, shipped r7–r9) vs a single plain
``groupBy(l_orderkey).agg(sum(scaled_long))`` long aggregate.

Why the question exists: the two-level shape pays a SECOND exchange
(the (key, pid) partials reshuffle onto the key) to make the combine
overflow-safe for UNBOUNDED rows-per-key. ep6's key is the orders
primary key: lineitems per order are bounded by order size (≤ 7 in
TPC-H-shaped data at ANY scale factor — corpus growth adds orders,
not lines per order), so the plain long sum is overflow-safe by
construction (≤ 7 × 5 000 per key, nowhere near 2^63) and the
second exchange buys nothing. The round-10 64× probe measured ep6
at 51.5 s Spark vs 13.3 s DuckDB — the worst absolute loss in the
probed SQL family — making the extra exchange worth re-litigating
at probe scale (CLAUDE.md: multi-consumer/shape decisions must be
measured at probe scale, not sf0.1).

Usage: python scripts/ep6_agg_ab.py [--runs 3] [--dir <scaled dir>]
Prints one JSON line with interleaved medians + row counts.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feray_spark.catalog import load_table  # noqa: E402
from feray_spark.queries.util import scaled_long  # noqa: E402
from feray_spark.session import apply_semantics, get_spark  # noqa: E402


def two_level(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    partial = li.groupBy(
        "l_orderkey", F.spark_partition_id().alias("__pid")
    ).agg(F.sum(scaled_long("l_quantity")).alias("__p"))
    qty = partial.groupBy("l_orderkey").agg(
        F.sum(F.col("__p").cast("decimal(38,0)")).alias("q2")
    )
    big = qty.filter(F.col("q2") > F.lit(200 * 100))
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "o_orderkey", "o_orderdate",
            (F.col("q2") / F.lit(100)).cast("double").alias("total_qty"),
        )
    )


def single_agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    qty = li.groupBy("l_orderkey").agg(
        F.sum(scaled_long("l_quantity")).alias("q2")
    )
    big = qty.filter(F.col("q2") > F.lit(200 * 100))
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey", "o_orderkey", "o_orderdate",
            (F.col("q2") / F.lit(100)).cast("double").alias("total_qty"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--dir",
        default="/tmp/feray_scale_probe_root_testdata_sf0.1/f64",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="feray-ep6-ab")
    apply_semantics(spark)

    # warm both lineages off the clock + equality check (sorted
    # collect is too big at 64x; compare counts and total_qty sums)
    na = two_level(spark, args.dir).count()
    nb = single_agg(spark, args.dir).count()
    assert na == nb, (na, nb)
    sa = two_level(spark, args.dir).agg(F.sum("total_qty")).collect()[0][0]
    sb = single_agg(spark, args.dir).agg(F.sum("total_qty")).collect()[0][0]
    assert abs(sa - sb) < 1e-6 * max(abs(sa), 1.0), (sa, sb)

    ta, tb = [], []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        two_level(spark, args.dir).count()
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        single_agg(spark, args.dir).count()
        tb.append(time.perf_counter() - t0)
    print(json.dumps({
        "dir": args.dir,
        "rows": na,
        "runs": args.runs,
        "two_level_sec": round(statistics.median(ta), 3),
        "single_agg_sec": round(statistics.median(tb), 3),
        "all_two_level": [round(t, 3) for t in ta],
        "all_single": [round(t, 3) for t in tb],
    }))


if __name__ == "__main__":
    main()
