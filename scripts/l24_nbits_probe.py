"""L24 scale-knob probe: semantic_dedup growth WITH the documented
n_bits scaling, not just the catalog query's fixed n_bits=8.

The catalog entry l24_semantic_dedup pins n_bits=8 (256 buckets) so
its DuckDB oracle can replay the exact rule. At a fixed bucket count
the same-bucket pair work grows ~K² on K× data for ANY engine —
the operator's documented scale path is raising n_bits ≈ log2(n /
target_cluster_size) with the corpus (operators/dedup.py
semantic_dedup docstring). This script measures both on the
scale-probe's decorrelated data (format v5 sign-flip replicas: each
replica keeps the fixture's cosine structure exactly, cross-replica
matches vanish):

  - factor 1, n_bits=8   (the fixture shape)
  - factor K, n_bits=8   (the fixed-knob curve the main probe records)
  - factor K, n_bits=8+log2(K)  (the documented knob: buckets stay
    fixture-sized, so pair work — and wall-clock — should grow ~K,
    not K²)

Usage: python scripts/l24_nbits_probe.py [--factor 8] [--runs 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feray_spark.operators.dedup import semantic_dedup  # noqa: E402
from feray_spark.session import get_spark  # noqa: E402
from scripts.scale_probe import build_scaled, scaled_dirs  # noqa: E402


def median_time(spark, sf_dir: str, n_bits: int, runs: int) -> float:
    samples = []
    for _ in range(runs):
        df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        t0 = time.perf_counter()
        semantic_dedup(df, n_bits=n_bits).write.format("noop").mode(
            "overwrite"
        ).save()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[(len(samples) - 1) // 2], 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--skip-fixed",
        action="store_true",
        help="skip the fixed-knob factor-K leg: at fixed n_bits the "
        "pair work grows ~K^2 (the documented anti-pattern this "
        "probe exists to show), which at K=64 is ~4096x the factor-1 "
        "work — measure the fixed curve at small K and only the "
        "scaled knob at large K",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="l24-nbits-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    d1, dk = scaled_dirs(args.sf_dir, args.factor)
    build_scaled(spark, args.sf_dir, d1, 1)
    build_scaled(spark, args.sf_dir, dk, args.factor)

    scaled_bits = 8 + round(math.log2(args.factor))
    t1 = median_time(spark, d1, 8, args.runs)
    tk_fixed = (
        None if args.skip_fixed else median_time(spark, dk, 8, args.runs)
    )
    tk_scaled = median_time(spark, dk, scaled_bits, args.runs)
    print(
        json.dumps(
            {
                "factor": args.factor,
                "runs": args.runs,
                "t1_bits8": t1,
                "tk_bits8": tk_fixed,
                "tk_scaled_bits": tk_scaled,
                "scaled_bits": scaled_bits,
                "growth_fixed_knob": (
                    None if tk_fixed is None else round(tk_fixed / t1, 2)
                ),
                "growth_scaled_knob": round(tk_scaled / t1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
