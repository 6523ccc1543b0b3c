"""ANN recall under data growth (VERDICT r6 item 7).

l3b/l3c assert recall >= ANN_RECALL_FLOOR on the driver fixtures;
the fractional-nprobe claim — "recall holds as the corpus grows"
(SURVEY L3) — had no measured datapoint. This probe measures it:

- Corpus: the scale_probe factor-K replication of the embeddings
  table (per-replica diagonal SIGN FLIP — an orthogonal transform,
  so every within-replica cosine/neighborhood is preserved exactly
  while cross-replica cosines collapse to noise).
- Query side: FIXED — replica-0 vectors with the catalog's own
  ``vec_id % 50 == 0`` selection rule. This is the publishing rule
  scale_probe's UNSAFE note prescribes for similarity ops: corpus
  grows Kx, query set does not, so the measured work is the honest
  "find neighbors for this batch in a growing corpus" deployment,
  not a manufactured K^2.
- Ground truth: exact brute-force cosine top-k over the FULL
  factor-K corpus (computable directly — the sign flip preserves
  per-replica neighborhoods, so truth at K is as well-defined as at
  1).
- Measured: corpus-level recall of lsh_bucketed_topk and ivf_topk
  at factor 1 and factor K, catalog parameters (k=3, operator
  defaults — ivf_topk's nprobe is the FRACTIONAL rule under test:
  it probes a fixed fraction of cells as the cell count grows).

Usage:
    python scripts/ann_recall_probe.py [--factor 8] [--k 3]
        [--sf-dir /root/testdata/sf0.1]

Prints one JSON line; exits nonzero if either operator's factor-K
recall drops below ANN_RECALL_FLOOR (the fixture bound l3b/l3c
gate on).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from feray_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
)
from feray_spark.queries.llm import ANN_RECALL_FLOOR  # noqa: E402
from feray_spark.session import get_spark  # noqa: E402
from scripts.scale_probe import (  # noqa: E402
    KEYSPACE,
    build_scaled,
    scaled_dirs,
)


def _recall(spark, sf_dir: str, ann, k: int) -> tuple[float, int, int]:
    """Corpus-level recall of ``ann`` vs exact top-k, fixed query set."""
    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    # replica-0 only: the fixed query side (identical at every factor)
    q = e.filter(
        (F.col("vec_id") < KEYSPACE) & (F.col("vec_id") % 50 == 0)
    ).select(F.col("vec_id").alias("q_id"), "embedding")
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")
    # persist the ground truth: the exact brute-force scan is the
    # probe's most expensive computation and feeds BOTH the expected
    # count and the hit join — without the pin it would run twice
    exact = brute_force_topk(q, c, k=k).select("q_id", "c_id").persist()
    try:
        approx = ann(q, c).select("q_id", "c_id")
        expected = exact.count()
        hits = approx.join(exact, ["q_id", "c_id"], "left_semi").count()
    finally:
        exact.unpersist()
    return (hits / expected if expected else 1.0), hits, expected


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--k", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name="feray-ann-recall-probe")
    d1, dk = scaled_dirs(args.sf_dir, args.factor)
    build_scaled(spark, args.sf_dir, d1, 1)
    build_scaled(spark, args.sf_dir, dk, args.factor)

    ops = {
        "l3b_lsh": lambda q, c: lsh_bucketed_topk(q, c, k=args.k),
        "l3c_ivf": lambda q, c: ivf_topk(q, c, k=args.k),
    }
    out = {
        "factor": args.factor,
        "k": args.k,
        "recall_floor": ANN_RECALL_FLOOR,
        "ops": {},
    }
    failed = []
    for name, ann in ops.items():
        r1, h1, e1 = _recall(spark, d1, ann, args.k)
        rk, hk, ek = _recall(spark, dk, ann, args.k)
        out["ops"][name] = {
            "recall_1": round(r1, 4),
            "recall_k": round(rk, 4),
            "hits_k": hk,
            "expected_k": ek,
        }
        if rk < ANN_RECALL_FLOOR:
            failed.append(name)
    print(json.dumps(out))
    if failed:
        raise SystemExit(
            f"factor-{args.factor} recall below {ANN_RECALL_FLOOR}: {failed}"
        )


if __name__ == "__main__":
    main()
