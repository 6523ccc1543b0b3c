"""Interleaved A/B at probe scale: does `fan_out` pay for l15 / l16 /
l29 the way it does for l4?

Round-10 context: the second 64x probe wave measured these three
document queries losing absolutely to DuckDB at 64x (l15 27.8 vs
4.1 s; l16 45.2 vs 14.8 s; l29 27.8 vs 10.2 s) while the scaled
corpus arrives as ONE 47 MB parquet file — a single scan partition,
so every per-row regex/tokenize pass runs on one core while 31 idle.
`fan_out` exists precisely for this (provably-small local inputs;
no-op at 100 TB where scans carry thousands of splits), and l4
already uses it. l16's committed "no fan_out" comment cites an
sf0.1-only measurement (0.72 vs 1.02 s) — the exact class of
fixture-scale decision CLAUDE.md's timing rule now flags; this
script re-litigates it at 64x.

Method: B-variant is produced by monkeypatching
`feray_spark.queries.llm.load_table` to wrap the documents table in
`fan_out` (so the committed query code itself is what runs, with the
one-line difference under test). Output equality is asserted on
content (sorted collect for the small outputs, count + checksum for
the per-doc l16) before any timing. Runs interleave A/B to cancel
box phase.

Usage: python scripts/fanout_64x_ab.py [--runs 3]
       [--dir /tmp/feray_scale_probe_root_testdata_sf0.1/f64]
       [--queries l15_source_cap l16_unigram_logprob ...]
Prints one JSON line per query.
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

import feray_spark.queries.llm as llm  # noqa: E402
from feray_spark.catalog import load_table as real_load_table  # noqa: E402
from feray_spark.queries import load_all  # noqa: E402
from feray_spark.queries.util import fan_out  # noqa: E402
from feray_spark.session import apply_semantics, get_spark  # noqa: E402


def fanned_load_table(spark, sf_dir, table):
    df = real_load_table(spark, sf_dir, table)
    return fan_out(df) if table == "documents" else df


def checksum(df):
    """Order-independent content fingerprint: count + sum of a
    per-row hash over every column (rendered as strings)."""
    cols = [F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in df.columns]
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 8), 16, 10)
    row = df.agg(
        F.count("*").alias("n"), F.sum(h.cast("bigint")).alias("s")
    ).collect()[0]
    return (row.n, row.s)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--dir", default="/tmp/feray_scale_probe_root_testdata_sf0.1/f64"
    )
    ap.add_argument(
        "--queries",
        nargs="*",
        default=["l15_source_cap", "l16_unigram_logprob",
                 "l29_temperature_mixture"],
    )
    args = ap.parse_args()
    spark = get_spark(app_name="feray-fanout-ab")
    apply_semantics(spark)
    registry = load_all()
    out = {"dir": args.dir, "runs": args.runs, "queries": {}}

    for name in args.queries:
        fn = registry[name].fn

        def run_a():
            llm.load_table = real_load_table
            return fn(spark, args.dir)

        def run_b():
            llm.load_table = fanned_load_table
            try:
                return fn(spark, args.dir)
            finally:
                llm.load_table = real_load_table

        # content equality before timing (checksum is cheap relative
        # to the lineages and order-independent)
        ca, cb = checksum(run_a()), checksum(run_b())
        assert ca == cb, (name, ca, cb)

        ta, tb = [], []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            run_a().count()
            ta.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_b().count()
            tb.append(time.perf_counter() - t0)
        out["queries"][name] = {
            "rows": ca[0],
            "no_fanout_sec": round(statistics.median(ta), 3),
            "fanout_sec": round(statistics.median(tb), 3),
            "all_no_fanout": [round(t, 3) for t in ta],
            "all_fanout": [round(t, 3) for t in tb],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
