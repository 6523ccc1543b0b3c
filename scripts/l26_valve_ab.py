"""A/B the LSH hot-bucket valve's cost INSIDE the curation pipeline.

Round 6 measured the valve at the OPERATOR level (+~0.5 s on l2 at
sf0.1: two near-empty agg re-reads of the reused band exchange) but
l26_curation_pipeline — which embeds minhash_lsh_pairs between a
checkpointed dedup stage and the clustering fixpoint — regressed
6.13→7.79 s in the same sweep without a pipeline-context datapoint
(VERDICT r6 item 4). This script measures exactly that: the SAME
curate_corpus flow the l26 entry runs, interleaved with
``max_bucket_ids=4096`` (the catalog default) vs ``None`` (valve
off), fresh DataFrame per run (same-object re-collect reuses shuffle
files — CLAUDE.md timing rule).

Usage:
    python scripts/l26_valve_ab.py [--runs 5]
        [--sf-dir /root/testdata/sf0.1]

Prints one JSON line with per-arm medians and the delta. The result
is recorded in docs/BENCH_NOTES.md §2.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feray_spark.catalog import load_table  # noqa: E402
from feray_spark.pipeline import curate_corpus  # noqa: E402
from feray_spark.queries.llm import _PACK_CTX, _PACK_SHARDS  # noqa: E402
from feray_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    spark = get_spark(app_name="feray-l26-valve-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    load_table(spark, args.sf_dir, "documents").count()  # warm cache

    arms = {"valve_4096": 4096, "valve_off": None}
    samples = {a: [] for a in arms}
    for _ in range(args.runs):
        for arm, knob in arms.items():
            d = load_table(spark, args.sf_dir, "documents")
            t0 = time.perf_counter()
            curate_corpus(
                d,
                pack_ctx=_PACK_CTX,
                pack_shards=_PACK_SHARDS,
                max_bucket_ids=knob,
            ).packs.write.format("noop").mode("overwrite").save()
            samples[arm].append(time.perf_counter() - t0)
    med = {
        a: round(sorted(s)[(len(s) - 1) // 2], 3) for a, s in samples.items()
    }
    print(json.dumps({
        "runs": args.runs,
        "medians": med,
        "valve_delta_sec": round(med["valve_4096"] - med["valve_off"], 3),
        "samples": {a: [round(x, 3) for x in s] for a, s in samples.items()},
    }))


if __name__ == "__main__":
    main()
