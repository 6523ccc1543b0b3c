"""Dump formatted physical plans for the headline catalog queries to
docs/PLANS.md — the ``.explain("formatted")`` evidence behind the
scale claims, regenerable with one command:

    python scripts/explain_catalog.py [--sf-dir DIR]

Each section highlights what to look for (pushdown, broadcast,
partial aggregation, WindowGroupLimit, TakeOrderedAndProject) so a
reader can audit the 100 TB posture without running anything.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: (query, what the plan must show)
HEADLINERS = [
    ("p3_filter_comparison", "filter + projection pushed to the scan: PushedFilters + pruned ReadSchema"),
    ("a1_groupby_q1", "flagship Q1: partial_* aggregation before the exchange; scaled-long money sums inside WholeStageCodegen"),
    ("j5_broadcast_star", "star join: every dim side is BroadcastHashJoin — the fact table never shuffles for a dim"),
    ("j8_asof_join", "as-of join: ONE exchange per side, then a single sort + window — no range explosion"),
    ("j7b_interval_join", "keyless interval join as a bin join: equi Exchange on the bin id instead of BroadcastNestedLoop"),
    ("w8_top_k_per_group", "top-k per key: WindowGroupLimit Partial before the exchange, Final after"),
    ("l15_source_cap", "domain cap: same WindowGroupLimit pre-cut guarding the mega-domain skew case"),
    ("a13_heavy_hitters", "heavy hitters: TakeOrderedAndProject (per-partition k-heaps), no global Sort"),
    ("l12_contamination_check", "decontamination: probe set broadcast; the corpus n-gram stream never shuffles"),
    ("l14_quality_weighted_sample", "hash-acceptance sampling: pure scan-level Filter, zero exchanges beyond the rebalance"),
    ("l16_unigram_logprob", "unigram LM score: vocab-sized tf table broadcast onto the token stream"),
    ("l2_minhash_lsh_neardups", "MinHash LSH: explode → single signature hash-agg → band-key join, no all-pairs"),
    ("ep3b_subquery_decorrelation", "EXISTS → left-semi join; scalar subquery → one-row broadcast (Catalyst decorrelation)"),
    ("ep9_disjunctive_join", "Q19 OR-of-conjuncts: each side's implied disjunction extracted and pushed to its scan; residual OR after the broadcast join"),
    ("ep10_sole_late_supplier", "Q21 EXISTS/NOT-EXISTS pair: LeftSemi + LeftAnti on the orderkey correlation with the suppkey <> residual; top-25 via TakeOrderedAndProject"),
    ("ep3d_tpch_q5", "six-table join: dim chain broadcasts, only the fact keys shuffle"),
    ("ep11_excluded_suppliers", "Q16 NOT IN: exclusion set broadcast as a plain LeftAnti (keys proven non-null, the null-aware nested-loop case never planned); brand/size pushed to the part scan"),
    ("ep13_value_share", "Q11 share-of-total: analytic window over the grouped aggregate — ONE lineitem scan, no join (the canonical HAVING-subquery text replans the fact per scalar subquery)"),
    ("ep15_order_count_distribution", "Q13 histogram-of-group-sizes: the exclusion predicate lives in the outer join's ON clause yet still pushes to the orders scan; match-less customers survive as zero counts"),
    ("ep17_majority_supplier", "Q20 correlated-scalar-in-HAVING-in-IN: fully decorrelated to Inner + Inner + LeftSemi — never a per-group re-execution"),
    ("a14_exact_quantiles", "exact quantiles: rank windows + pick-aggregate all reuse ONE hash partitioning"),
    ("l19_fuzzy_blocked_pairs", "fuzzy pairs: equi join on the (lang, prefix) block key — never a nested loop"),
    ("l20_span_dedup", "span dedup: one rank window on the span key marks first occurrences; two keyed shuffles total"),
    ("l21_embedding_outliers", "embedding outliers: centroids broadcast; WindowGroupLimit pre-cuts the bottom-k before the only rank exchange"),
    ("w9_resample_gap_fill", "resample: calendar rows generated on the user's partition; gap join + forward fill share it"),
    ("l24_semantic_dedup", "semantic dedup: ONE bucket-keyed self-join bounds all cosine work to same-bucket pairs; left-anti keep-list — no all-pairs"),
    ("l1b_canonical_dedup", "canonical dedup: partial_min(struct)/partial_count before the only exchange — the boilerplate mega-group never colocates"),
    ("l25_stratified_sample", "stratified sample: WindowGroupLimit pre-cut on the stratum key — N rows per stratum per partition reach the exchange"),
    ("l29_temperature_mixture", "temperature rebalance: #sources rate table BroadcastHashJoin'd onto the scan — nothing document-sized exchanges"),
    ("l30_length_bucket_batches", "length-grouped batching: ONE hash exchange on (bucket, shard); the per-batch aggregate reuses the window partitioning"),
    ("l31_split_leakage", "split-leakage audit (r9 form): one explode lineage, one exchange on the md5-prefix gram key, window leaked-flag in place, 2-role explode instead of a 4x countDistinct Expand"),
    ("l26b_curation_attrition", "attrition funnel: stage memberships as FLAGS in one pass — one conditional global aggregate + stack unpivot; no per-stage corpus scan"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "PLANS.md"))
    args = ap.parse_args()

    from feray_spark.queries import load_all
    from feray_spark.session import get_spark

    spark = get_spark(app_name="explain-catalog")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    sections = []
    for name, claim in HEADLINERS:
        df = registry[name].fn(spark, args.sf_dir)
        plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        sections.append(f"## {name}\n\n*{claim}*\n\n```\n{plan.strip()}\n```\n")

    header = (
        "# Physical plans — the headline queries' `.explain(\"formatted\")`\n\n"
        f"Generated by `scripts/explain_catalog.py` at {args.sf_dir} "
        "(plan shapes are SF-independent; AQE may re-plan exchanges at "
        "runtime). Each section states the property the plan is asserted "
        "to have — the same properties tests/test_plans.py locks in CI.\n\n"
    )
    with open(args.out, "w") as f:
        f.write(header + "\n".join(sections))
    print(f"wrote {args.out} ({len(sections)} plans)")


if __name__ == "__main__":
    main()
