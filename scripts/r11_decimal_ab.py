"""Round-11 interleaved A/B harnesses for the per-row-decimal-cast
class (OPTIMIZATION_r11.md): rebuilds every DataFrame per run, times
noop writes (guide §1.4), interleaves variants so box phases taint
at most one sample each, and value-checks the variants equal.

Usage:
    python scripts/r11_decimal_ab.py fs10|a1|ep13 [--sf-dir DIR] [--runs N]

Variants:
- fs10: drift_report typed fast paths vs the generic
  cast-to-decimal(28,9) leg (the committed code's `_force_generic`
  hook). Round-11 64x result: 8.34 -> 2.51 s median, outputs equal.
- a1:   the flagship Q1 shape with the committed scaled_long
  (money_fast_parts fast leg) vs an inline clone using the original
  per-row ROUND. Round-11 64x result: 5.61 -> 2.08 s, outputs equal.
- ep13: the committed single-level long aggregate vs an inline clone
  of the removed (l_partkey, partition_id) two-level shape.
  Round-11 64x result: 6.48 -> 5.29 s, outputs equal.

The 64x corpus is the shared scale_probe cache
(`scale_probe.scaled_dirs(sf_dir, 64)[1]`); build it with
`python scripts/scale_probe.py --factor 64 --runs 1 --queries
a1_groupby_q1` or pass any directory of fixture-shaped parquet via
--sf-dir.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feray_spark.catalog import load_table  # noqa: E402
from feray_spark.session import get_spark  # noqa: E402


def _timed(spark, tag, build, runs, out):
    sc = spark.sparkContext
    for i in range(runs):
        df = build()
        sc.setJobDescription(f"{tag}-{i}")
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.setdefault(tag, []).append(time.perf_counter() - t0)
        sc.setJobDescription(None)


def fs10_builders(spark, sf_dir):
    from feray_spark.features.drift import drift_report

    def build(force):
        orders = load_table(spark, sf_dir, "orders")
        baseline = orders.filter(F.col("o_orderkey") % 3 != 0)
        return drift_report(
            baseline, orders, ["o_totalprice", "o_custkey"],
            _force_generic=force,
        )

    return {"generic": lambda: build(True), "fast": lambda: build(False)}


def a1_builders(spark, sf_dir):
    from feray_spark.queries.util import exact_grouped_sums, scaled_long

    def old_sl(col, decimals=2):
        # the pre-r11 scaled_long: per-row BigDecimal ROUND
        return F.round(F.col(col) * (10 ** decimals)).cast("long")

    def build(sl):
        li = load_table(spark, sf_dir, "lineitem")
        qty, price = sl("l_quantity"), sl("l_extendedprice")
        disc, tax = sl("l_discount"), sl("l_tax")
        agg = exact_grouped_sums(
            li.filter(
                F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
            ),
            ["l_returnflag", "l_linestatus"],
            money={
                "sum_qty": (qty, 100),
                "sum_base_price": (price, 100),
                "sum_disc_price": (price * (100 - disc), 100 * 100),
                "sum_charge": (
                    price * (100 - disc) * (100 + tax), 100 * 100 * 100
                ),
                "__sum_disc": (disc, 100),
            },
            counts={
                "__n_qty": F.col("l_quantity"),
                "__n_price": F.col("l_extendedprice"),
                "__n_disc": F.col("l_discount"),
            },
            count_star="count_order",
        )
        return (
            agg.withColumn("avg_qty", F.col("sum_qty") / F.col("__n_qty"))
            .withColumn(
                "avg_price", F.col("sum_base_price") / F.col("__n_price")
            )
            .withColumn("avg_disc", F.col("__sum_disc") / F.col("__n_disc"))
            .drop("__sum_disc", "__n_qty", "__n_price", "__n_disc")
            .orderBy("l_returnflag", "l_linestatus")
        )

    return {
        "old_round": lambda: build(old_sl),
        "fast_leg": lambda: build(scaled_long),
    }


def ep13_builders(spark, sf_dir):
    from feray_spark.queries import load_all
    from feray_spark.queries.util import scaled_long

    def build_two():
        # the removed two-level shape, inlined for the A/B
        li = load_table(spark, sf_dir, "lineitem")
        row_v4 = scaled_long("l_extendedprice") * (
            F.lit(100) - scaled_long("l_discount")
        )
        partial = li.groupBy(
            "l_partkey", F.spark_partition_id().alias("__pid")
        ).agg(F.sum(row_v4).alias("__p"))
        g = partial.groupBy("l_partkey").agg(
            F.sum(F.col("__p").cast("decimal(38,0)")).alias("v4")
        )
        totals = g.agg(F.count("*").alias("__n"), F.sum("v4").alias("__tot"))
        shared = g.crossJoin(F.broadcast(totals))
        return (
            shared.filter(
                F.lit(2) * F.col("v4") * F.col("__n")
                > F.lit(3) * F.col("__tot")
            )
            .select(
                "l_partkey",
                (F.col("v4") / F.lit(10000))
                .cast("double")
                .alias("part_value"),
            )
            .orderBy(F.desc("part_value"), "l_partkey")
        )

    reg = load_all()
    return {
        "two_level": build_two,
        "single": lambda: reg["ep13_value_share"].fn(spark, sf_dir),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", choices=["fs10", "a1", "ep13"])
    ap.add_argument("--sf-dir", default=None,
                    help="defaults to the shared 64x scale_probe cache")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()
    sf_dir = args.sf_dir
    if sf_dir is None:
        import scale_probe

        sf_dir = scale_probe.scaled_dirs("/root/testdata/sf0.1", 64)[1]
        if not os.path.isdir(sf_dir):
            raise SystemExit(
                f"64x cache missing ({sf_dir}); build it via scale_probe"
            )

    spark = get_spark(app_name=f"r11-ab-{args.which}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, sf_dir, "orders").count()
    load_table(spark, sf_dir, "lineitem").count()

    builders = {
        "fs10": fs10_builders, "a1": a1_builders, "ep13": ep13_builders
    }[args.which](spark, sf_dir)
    out: dict[str, list[float]] = {}
    for _ in range(args.runs):
        for tag, b in builders.items():
            _timed(spark, tag, b, 1, out)
    for tag, ts in out.items():
        ss = sorted(ts)
        print(f"{tag}: median {ss[(len(ss) - 1) // 2]:.2f}s "
              f"all {['%.2f' % t for t in ts]}")
    frames = [b().collect() for b in builders.values()]
    print("outputs equal:", all(f == frames[0] for f in frames[1:]))
    spark.stop()


if __name__ == "__main__":
    main()
