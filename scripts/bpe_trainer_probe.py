"""BPE trainer driver-cost probe (VERDICT r8 item 6).

``learn_bpe`` runs on the driver over the ``word_types`` table — the
standard trainer layout (Sennrich; GPT-2/SentencePiece train the
same way), bounded by ``word_types``' hard cap plus ``learn_bpe``'s
own ``max_types`` refusal. This script turns "bounded" into NUMBERS:
at each probe factor it measures the type-table size, the Spark-side
collect time, the driver-side merge-learning time, and the driver
RSS growth, at the trainer's ceiling (cap = MAX_TRAINER_TYPES, so
the measurement is the worst case the guard admits).

The factor-K corpora are the shared scale_probe caches (token-level
replica suffixing grows the TYPE table ~K×, the realistic worst case
for a trainer: vocabulary growth, not just frequency growth). Run
scripts/scale_probe.py first (it builds the caches), then:

    python scripts/bpe_trainer_probe.py [--factors 1 64]
        [--n-merges 1000] [--sf-dir /root/testdata/sf0.1]

Prints one JSON line; docs/SCALE.md carries the resulting bound row.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feray_spark.catalog import load_table  # noqa: E402
from feray_spark.functions.bpe import (  # noqa: E402
    MAX_TRAINER_TYPES,
    learn_bpe,
    word_types,
)
from feray_spark.session import apply_semantics, get_spark  # noqa: E402
from scripts.scale_probe import build_scaled, scaled_dirs  # noqa: E402


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--factors", type=int, nargs="*", default=[1, 64])
    ap.add_argument("--n-merges", type=int, default=1000)
    args = ap.parse_args()

    spark = get_spark(app_name="feray-bpe-probe")
    apply_semantics(spark)
    out = {"n_merges": args.n_merges, "cap": MAX_TRAINER_TYPES,
           "factors": {}}
    for k in args.factors:
        d1, dk = scaled_dirs(args.sf_dir, k)
        d = d1 if k == 1 else dk
        build_scaled(spark, args.sf_dir, d, k)
        docs = load_table(spark, d, "documents")
        rss0 = rss_mb()
        t0 = time.perf_counter()
        types = word_types(docs, "text", max_types=MAX_TRAINER_TYPES)
        t_collect = time.perf_counter() - t0
        t0 = time.perf_counter()
        merges = learn_bpe(types, args.n_merges)
        t_learn = time.perf_counter() - t0
        out["factors"][str(k)] = {
            "n_types": len(types),
            "collect_sec": round(t_collect, 2),
            "learn_sec": round(t_learn, 2),
            "driver_rss_growth_mb": round(rss_mb() - rss0, 1),
            "n_merges_learned": len(merges),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
