"""Adversarial skew probe for the dedup-family valves (VERDICT r8
item 5): the 8x/64x growth curves run on benign (fixture-shaped)
skew, while the valve claims — "AQE-splittable", "pairs bounded per
bucket" — are about ADVERSARIAL skew. This script builds exactly the
corpora the valves exist for and measures each valve ON vs OFF on
identical data, asserting output equality alongside the wall-clock:

1. **L2 hot-bucket valve** (``minhash_lsh_pairs`` /
   ``max_bucket_ids``): B identical boilerplate docs collide into ONE
   bucket per band. Valve OFF expands an O(B^2) struct array inside
   a single task per band; valve ON diverts the bucket to an
   equi-self-join whose probe side AQE skew-splits. Same pair set by
   construction.

2. **L20 hot-span valve** (``span_first_occurrence_flags`` /
   ``max_span_df``): one span text repeated H times is ONE window
   partition (windows cannot be AQE-split). Valve ON diverts hot
   chunks to a map-side-combining MIN aggregate + join. Same keep
   flags by construction.

The tail of each corpus is Zipf-distributed so the cold path stays
populated (the valve must not degrade the healthy part). j10's skew
defense (AQE OptimizeSkewedJoin) is already plan-asserted with
lowered thresholds in tests/test_plans.py::test_aqe_splits_skewed_
join_partition; a13's defense is map-side partial aggregation
(no valve to toggle).

Run: python scripts/valve_skew_probe.py [--boiler 5000]
     [--tail 50000] [--span-hot 2000000] [--runs 3]
Prints one JSON line (PROBE_r09 carries the results).
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

from feray_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
    span_first_occurrence_flags,
)
from feray_spark.session import apply_semantics, get_spark  # noqa: E402


def build_lsh_corpus(spark, boiler: int, tail: int):
    """boiler identical docs (one mega-bucket per band) + a Zipf tail
    of distinct docs. Deterministic: content derives from ids."""
    base = spark.range(boiler + tail).withColumnRenamed("id", "doc_id")
    # Zipf-ish tail: word w_k appears with frequency ~ 1/k via
    # modular striding on the doc id; 12 words per doc, 3-shingles
    tail_text = F.concat_ws(
        " ",
        *[
            F.concat(
                F.lit("w"),
                ((F.col("doc_id") * (i + 7)) % (1 + F.col("doc_id") % 997))
                .cast("string"),
            )
            for i in range(12)
        ],
    )
    boiler_text = F.lit(
        "cookie banner accept all terms of service apply click here now"
    )
    return base.withColumn(
        "text",
        F.when(F.col("doc_id") < boiler, boiler_text).otherwise(tail_text),
    )


def build_span_rows(spark, hot: int, cold_chunks: int):
    """hot rows of ONE chunk text (a single window partition) + a
    Zipf-ish cold tail. (doc_id, pos) is UNIQUE by construction —
    matching l20's span generator contract (unique_rows=True)."""
    rows = spark.range(hot + cold_chunks * 8).withColumnRenamed("id", "rid")
    is_hot = F.col("rid") < hot
    cold_k = ((F.col("rid") - hot) % cold_chunks) + 1
    return rows.select(
        (F.col("rid") / 17).cast("bigint").alias("doc_id"),
        (F.col("rid") % 17).cast("bigint").alias("pos"),
        F.when(is_hot, F.lit("BOILER SPAN eight tokens wide cookie banner text"))
        .otherwise(F.concat(F.lit("cold chunk "), cold_k.cast("string")))
        .alias("chunk"),
    )


def median_time(fn, runs: int) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--boiler", type=int, default=5000)
    ap.add_argument("--tail", type=int, default=50000)
    ap.add_argument("--span-hot", type=int, default=2_000_000)
    ap.add_argument("--span-cold-chunks", type=int, default=20000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--valve", type=int, default=4096)
    ap.add_argument("--span-valve", type=int, default=4096)
    ap.add_argument("--skip-lsh", action="store_true")
    ap.add_argument("--skip-span", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="feray-valve-probe")
    apply_semantics(spark)
    out = {"boiler": args.boiler, "tail": args.tail,
           "span_hot": args.span_hot, "runs": args.runs, "probes": {}}

    # ---- L2 hot-bucket valve -------------------------------------
    if args.skip_lsh:
        docs = None
    else:
        docs = build_lsh_corpus(spark, args.boiler, args.tail)
    if not args.skip_lsh:
        docs.count()  # warm page cache / codegen off the clock

        def lsh(valve):
            return minhash_lsh_pairs(
                docs, "text", "doc_id", max_bucket_ids=valve
            )

        n_on = lsh(args.valve).count()
        n_off = lsh(None).count()
        assert n_on == n_off, (n_on, n_off)
        # CONTENT equality, not just cardinality (ADVICE r9): a valve
        # bug that permuted or swapped pair endpoints at equal count
        # would pass a count check; exceptAll both ways is the real
        # multiset assertion the published evidence claims
        on_df, off_df = lsh(args.valve), lsh(None)
        outputs_equal = (
            on_df.exceptAll(off_df).isEmpty()
            and off_df.exceptAll(on_df).isEmpty()
        )
        assert outputs_equal, "valve on/off pair CONTENTS diverge"
        out["probes"]["l2_hot_bucket"] = {
            "mega_bucket_ids": args.boiler,
            "pairs": n_on,
            "valve_on_sec": median_time(
                lambda: lsh(args.valve).count(), args.runs
            ),
            "valve_off_sec": median_time(lambda: lsh(None).count(), args.runs),
            "outputs_equal": outputs_equal,
        }

    # ---- L20 hot-span valve --------------------------------------
    if not args.skip_span:
        spans = build_span_rows(spark, args.span_hot, args.span_cold_chunks)
        spans.count()

        def span_flagged(valve):
            return span_first_occurrence_flags(
                spans, max_span_df=valve, unique_rows=True
            )

        def span_flags(valve):
            # consume ALL rows + flags (one aggregate over the full
            # window output), exactly how l20 consumes the flags for
            # its per-doc reassembly. A bare filter(keep) consumer
            # would trigger WindowGroupLimit's map-side rank pre-cut
            # and never materialize the hot partition at all
            # (measured: 60M hot rows, 1.7 s — a different query).
            return span_flagged(valve).agg(
                F.sum(F.col("keep").cast("int")).alias("kept"),
                F.count("*").alias("n"),
            ).collect()[0]

        r_on = span_flags(args.span_valve)
        r_off = span_flags(None)
        assert (r_on.kept, r_on.n) == (r_off.kept, r_off.n), (r_on, r_off)
        # CONTENT equality (ADVICE r9): per-row (chunk, doc, pos,
        # keep) flags must match, not just the aggregate — a valve
        # that kept the WRONG occurrence at equal kept-count would
        # pass the aggregate check
        f_on, f_off = span_flagged(args.span_valve), span_flagged(None)
        outputs_equal = (
            f_on.exceptAll(f_off).isEmpty()
            and f_off.exceptAll(f_on).isEmpty()
        )
        assert outputs_equal, "valve on/off span flag CONTENTS diverge"
        out["probes"]["l20_hot_span"] = {
            "hot_span_rows": args.span_hot,
            "kept": r_on.kept,
            "valve_on_sec": median_time(
                lambda: span_flags(args.span_valve), args.runs
            ),
            "valve_off_sec": median_time(
                lambda: span_flags(None), args.runs
            ),
            "outputs_equal": outputs_equal,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
