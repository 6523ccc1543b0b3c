"""LSH recall growth-knob probe (VERDICT r7 item 4): does l3b's
recall restore under corpus growth when n_planes/n_tables scale, and
at what candidate-work cost?

PROBE_r07's ann_recall row showed the FIXED-knob curve: recall
0.88 -> 0.84 at 8x corpus (above the 0.6 floor, trend unbounded).
This probe mirrors scripts/l24_nbits_probe.py: fixed query set
(replica-0, the catalog's own vec_id % 50 rule), corpus grown Kx by
the scale-probe's sign-flip replication (within-replica cosine
structure preserved exactly), exact brute-force ground truth at each
factor, and a knob GRID at factor K:

  - (3 planes, 6 tables)        — the catalog default, fixed-knob row
  - (3, 6+log2(K) tables)       — more OR-chances: recall UP,
                                  candidates UP ~ +tables
  - (3+log2(K) planes, 6)       — finer buckets: candidates DOWN
                                  ~ /K (occupancy restored), recall
                                  DOWN per table
  - (3+log2(K), 6+log2(K))      — the documented compound rule:
                                  occupancy flat AND recall restored

Usage: python scripts/l3b_knob_probe.py [--factor 8] [--k 3]
Prints one JSON line; the knob rule this measures is documented in
lsh_bucketed_topk / l3b's docstrings.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feray_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    lsh_bucketed_topk,
)
from feray_spark.queries.llm import ANN_RECALL_FLOOR  # noqa: E402
from feray_spark.session import get_spark  # noqa: E402
from scripts.scale_probe import (  # noqa: E402
    KEYSPACE,
    build_scaled,
    scaled_dirs,
)


def _sides(spark, sf_dir: str):
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = e.filter(
        (F.col("vec_id") < KEYSPACE) & (F.col("vec_id") % 50 == 0)
    ).select(F.col("vec_id").alias("q_id"), "embedding")
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")
    return q, c


def _measure(spark, sf_dir: str, k: int, grid):
    q, c = _sides(spark, sf_dir)
    exact = brute_force_topk(q, c, k=k).select("q_id", "c_id").persist()
    rows = []
    try:
        expected = exact.count()
        for n_planes, n_tables in grid:
            t0 = time.perf_counter()
            approx = lsh_bucketed_topk(
                q, c, k=k, n_planes=n_planes, n_tables=n_tables
            ).select("q_id", "c_id")
            hits = approx.join(exact, ["q_id", "c_id"], "left_semi").count()
            secs = time.perf_counter() - t0
            rows.append(
                {
                    "n_planes": n_planes,
                    "n_tables": n_tables,
                    "recall": round(hits / expected if expected else 1.0, 4),
                    "secs": round(secs, 3),
                }
            )
    finally:
        exact.unpersist()
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="feray-l3b-knob-probe")
    spark.sparkContext.setLogLevel("ERROR")
    d1, dk = scaled_dirs(args.sf_dir, args.factor)
    build_scaled(spark, args.sf_dir, d1, 1)
    build_scaled(spark, args.sf_dir, dk, args.factor)

    lg = max(1, round(math.log2(args.factor)))
    base = _measure(spark, d1, args.k, [(3, 6)])
    grid = [(3, 6), (3, 6 + lg), (3 + lg, 6), (3 + lg, 6 + lg)]
    grown = _measure(spark, dk, args.k, grid)
    print(
        json.dumps(
            {
                "factor": args.factor,
                "k": args.k,
                "recall_floor": ANN_RECALL_FLOOR,
                "factor_1_default": base[0],
                "factor_k_grid": grown,
            }
        )
    )


if __name__ == "__main__":
    main()
