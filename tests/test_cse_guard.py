"""Codegen subexpression-elimination regression guards.

Round 7 found (by profiling, twice) that Spark's whole-stage-codegen
subexpression elimination SKIPS conditional branches and does not
apply to filter predicates at all: a CaseWhen-wrapped quality_score
re-evaluated its canon_lower+regex tree up to 6x per row, and the
same tree inlined into a scan filter (predicate pushdown substitutes
projection aliases back into the condition) re-evaluated 7x per
scanned row. Both were fixed structurally — the COALESCE-first form
in quality_score, the util.fence project-then-filter shape in
l14/l26 — but nothing stopped the next `F.when(expensive)` or
`.filter(expensive)` from landing silently. These tests pin the
fixed shapes at the artifact level:

- the CODEGEN text of a quality_score projection contains exactly
  one canon_lower chain's worth of StringTranslate references (and a
  deliberately-regressed CaseWhen twin proves the counter detects
  the defect — a canary against the measurement going vacuous on a
  Spark upgrade);
- each hot text-path catalog query stays at its known evaluation-
  site count;
- no Filter node (or scan-pushed DataFilter) in the text path
  carries two or more canon_lower chains — the no-CSE-in-predicates
  shape that cost l14 5x.

The technique mirrors tests/test_plans.py (string-level assertions
on the executed plan / generated code); AQE is disabled per-test
because an un-executed AdaptiveSparkPlan reports zero codegen
subtrees.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

import pytest
from pyspark.sql import functions as F

from feray_spark.functions.text import canon_lower, quality_score
from feray_spark.queries import load_all

#: one canon_lower chain = translate(lower(translate(..))) — two
#: StringTranslate expressions, each referenced twice in generated
#: code (declaration + invocation) on Spark 4.1, so ONE evaluation
#: site == 4 textual `StringTranslate` references in its codegen
#: dump. The unit is MEASURED from a by-construction single-site
#: projection rather than hard-coded (ADVICE r8): a Spark upgrade
#: that changes the codegen text layout recalibrates the unit
#: instead of failing every guard while behavior is fine.
_refs_per_site_cache: dict[int, int] = {}


def _refs_per_site(spark) -> int:
    key = id(spark)
    if key not in _refs_per_site_cache:
        unit_df = spark.createDataFrame([("x",)], "text string").select(
            canon_lower("text").alias("c")
        )
        unit = _codegen(unit_df).count("StringTranslate")
        # sanity: the chain's two StringTranslates must each appear
        # at least once; if the dump stops mentioning them at all the
        # counters below would go vacuously green
        assert unit >= 2, _codegen(unit_df)[:2000]
        _refs_per_site_cache[key] = unit
    return _refs_per_site_cache[key]

#: the plan-string form of one canon_lower evaluation
_CHAIN = "translate(lower(translate("


def _codegen(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "codegen"
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextmanager
def _no_aqe(spark):
    old = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)


def test_quality_score_projection_single_evaluation(spark):
    """A quality_score projection must codegen exactly ONE
    canon_lower chain (CSE collapses every internal reference), and
    the counter must be able to tell: the deliberately-regressed
    CaseWhen twin of the same score — the exact round-7 defect
    shape — must show strictly more evaluation sites."""
    df = spark.createDataFrame(
        [("hello world the of and to in them",)], "text string"
    )
    good = df.select(quality_score("text").alias("q"))
    n_good = _codegen(good).count("StringTranslate")
    assert n_good == _refs_per_site(spark), _codegen(good)[:2000]

    # the regressed shape: same algebra, but the score tree sits in
    # CaseWhen branches, which codegen CSE skips
    c = F.col("text")
    low = canon_lower(c)
    n = F.regexp_count(low, F.lit(r"\S+"))
    stop = F.regexp_count(low, F.lit(r"(?<!\S)(?:the|of)(?!\S)"))
    score = (
        ((F.length(c) >= 20) & (F.length(c) <= 100000)).cast("int")
        + ((stop.cast("double") / n) >= 0.05).cast("int")
        + (
            (F.length(F.regexp_replace(low, r"\s+", "")).cast("double") / n)
            .between(2.0, 12.0)
        ).cast("int")
    ).cast("double") / 3.0
    bad = df.select(F.when(n == 0, F.lit(0.0)).otherwise(score).alias("q"))
    n_bad = _codegen(bad).count("StringTranslate")
    assert n_bad > n_good, (n_bad, n_good)  # canary: counter detects it


#: hot text-path queries and their known canon_lower evaluation-site
#: counts (sites = StringTranslate refs / _refs_per_site, measured
#: round 8):
#: l14/l15/l13 evaluate the score/tokens ONCE in a projection
#: (l14 behind util.fence); l17/l29 are the documented 2-pass +
#: final-rollup designs — one site per pass, never per reference.
#: l4/l16 are 0: their projections contain higher-order functions,
#: which are CodegenFallback, so the whole stage leaves codegen (the
#: filter-shape test below still covers them).
_SITE_CEILINGS = {
    "l14_quality_weighted_sample": 1,
    "l15_source_cap": 1,
    "l13_sequence_packing": 1,
    "l17_mixture_sampling": 3,
    "l29_temperature_mixture": 3,
    "l4_text_stats": 0,
    "l16_unigram_logprob": 0,
}


@pytest.mark.parametrize("name", sorted(_SITE_CEILINGS))
def test_hot_text_query_site_count(spark, sf_dir, name):
    q = load_all()[name]
    unit = _refs_per_site(spark)
    with _no_aqe(spark):
        df = q.fn(spark, sf_dir)
        refs = _codegen(df).count("StringTranslate")
    assert refs <= _SITE_CEILINGS[name] * unit, (
        f"{name}: {refs} StringTranslate refs "
        f"(~{refs / unit:.1f} canon_lower evaluation sites, "
        f"ceiling {_SITE_CEILINGS[name]}) — an expensive expression "
        "regressed into a conditional branch or gained a new "
        "evaluation site"
    )


#: text-path queries whose plans must never carry a multi-reference
#: canon_lower tree inside a filter predicate (no CSE there at all).
#: Excludes the eager-fixpoint pipelines (l26* builds run jobs at
#: plan time; their gate shape is pinned by
#: test_plans.test_curation_packs_plan_pushes_gate_and_bounds_exchanges).
_FILTER_GUARD = [
    "l14_quality_weighted_sample",
    "l15_source_cap",
    "l17_mixture_sampling",
    "l4_text_stats",
    "l16_unigram_logprob",
    "l13_sequence_packing",
    "l29_temperature_mixture",
    "l7_quality_filter_pipeline",
    "l25_stratified_sample",
    "l31_split_leakage",
]

#: queries whose plans must carry ZERO canon_lower chains in ANY
#: Filter line (incl. scan PushedFilters) — the round-9 fence-field
#: fixes: a single tokenizer chain in a filter means the min-length
#: test was alias-substituted into the scan and every row tokenizes
#: twice (filter + projection), the l20/l12/l8/l5b defect shape.
#: Stricter than the >=2-chains test below (which allows the
#: single-chain double-tokenization through).
_ZERO_CHAIN_FILTERS = [
    "l20_span_dedup",
    "l12_contamination_check",
    "l8_doc_chunking",
    "l5b_ml_tfidf",
    "l31_split_leakage",
]


@pytest.mark.parametrize("name", _ZERO_CHAIN_FILTERS)
def test_no_tokenizer_chain_in_any_filter(spark, sf_dir, name):
    q = load_all()[name]
    plan = _plan(q.fn(spark, sf_dir))
    offenders = [
        ln.strip()[:160]
        for ln in plan.splitlines()
        if ("Filter" in ln or "PushedFilters" in ln) and _CHAIN in ln
    ]
    assert not offenders, offenders


@pytest.mark.parametrize("name", _FILTER_GUARD)
def test_no_multi_chain_filter_predicate(spark, sf_dir, name):
    """No Filter line (incl. the FileScan's pushed DataFilters) may
    contain >= 2 canon_lower chains: filter predicates get no codegen
    CSE, so every textual chain is a per-row re-evaluation."""
    q = load_all()[name]
    plan = _plan(q.fn(spark, sf_dir))
    offenders = [
        ln.strip()[:160]
        for ln in plan.splitlines()
        if ("Filter" in ln) and ln.count(_CHAIN) >= 2
    ]
    assert not offenders, offenders


#: per-evaluation signatures of the catalog's expensive expressions:
#: ONE occurrence in a predicate node is one per-row/per-pair
#: evaluation (zip_with == one cosine fold; md5( == one digest).
#: Two or more of the SAME signature in one Filter/Join line means
#: the predicate re-evaluates it — the l31 pre-fix shape (md5 x2,
#: the split CASE inlined into the scan filter).
_EXPENSIVE = ("translate(lower(translate(", "zip_with(", "md5(")

#: predicate-position sweep: the text/ANN path plus the queries the
#: round-8 audit flagged. Excludes the eager-fixpoint pipelines
#: (l26*, l2e — they run jobs at plan-build time; their shapes are
#: pinned by their own plan tests).
_PREDICATE_SWEEP = _FILTER_GUARD + [
    "l24_semantic_dedup",
    "l2d_embedding_neardup",
    "l3_embedding_topk",
    "l3b_lsh_topk",
    "l3c_ivf_topk",
    "l9_deterministic_split",
    "l12_contamination_check",
]


@pytest.mark.parametrize("name", sorted(set(_PREDICATE_SWEEP)))
def test_no_repeated_expensive_expression_in_predicates(spark, sf_dir, name):
    """No Filter or join-condition line may carry the SAME expensive
    signature twice — predicates get no CSE, so each textual copy is
    a separate per-row (or per-candidate-pair) evaluation. One copy
    is allowed: a bucketed pair filter legitimately evaluates one
    cosine per pair (semantic_dedup's join condition)."""
    import re

    q = load_all()[name]
    plan = _plan(q.fn(spark, sf_dir))
    node = re.compile(r"^[\s*+\-:()0-9]*(Filter|\w*Join\w*|CartesianProduct)")
    offenders = [
        (marker, ln.strip()[:140])
        for ln in plan.splitlines()
        if node.match(ln)
        for marker in _EXPENSIVE
        if ln.count(marker) >= 2
    ]
    assert not offenders, offenders


#: per-ELEMENT accessors with a tokenizer chain as their direct
#: argument: the plan shape of a higher-order-function lambda that
#: re-tokenizes the document once per element access (doc_fingerprint
#: re-lowered per character window — 2.17 vs 0.27 s; l12's shingles
#: re-split per element after CollapseProject inlined its __w).
#: Fixed shapes read `element_at(lambda x…` / `substr(lambda x…` /
#: `slice(__w#…` — variable or attribute reads. element_at/substr
#: only occur per-element here (shingle window / char window); bare
#: slice is also a legitimate ONE-per-row projection op (l12's probe
#: prefix), so the slice form is matched only in its lambda shape,
#: array_join(slice(tokenizer…)) — the pre-fix l20 span generator.
_PER_ELEMENT_RETOKENIZE = re.compile(
    r"(element_at|substr)\(\s*"
    r"(filter\(split\(|split\(translate|translate\(lower\()"
    r"|array_join\(slice\(filter\(split\("
)

#: every query whose plan builds shingles/grams/fingerprints
_HOF_TEXT_QUERIES = [
    "l4_text_stats",
    "l12_contamination_check",
    "l13_sequence_packing",
    "l19_fuzzy_blocked_pairs",
    "l20_span_dedup",
    "l2_minhash_lsh_neardups",
    "l2b_simhash",
    "l2c_ngram_jaccard",
    "l31_split_leakage",
    "l8_doc_chunking",
]


@pytest.mark.parametrize("name", _HOF_TEXT_QUERIES)
def test_no_per_element_retokenization(spark, sf_dir, name):
    """No per-element accessor may take the word-split/canon_lower
    chain as its direct argument: HOF lambdas re-evaluate embedded
    subtrees once per element, so that shape re-tokenizes the whole
    document per element access (O(len²) text work). The fixed shapes
    let-bind the array (functions.text) or materialize it as a
    multi-referenced column."""
    q = load_all()[name]
    plan = _plan(q.fn(spark, sf_dir))
    m = _PER_ELEMENT_RETOKENIZE.search(plan)
    assert not m, plan[max(0, m.start() - 60): m.end() + 60]


def test_brute_force_join_condition_carries_no_fold(spark):
    """The l3 defect shape crossed NODES: the cosine isNotNull filter
    inlined into the nested-loop join condition, so each pair paid
    the fold in the CONDITION and again in the output projection.
    Pin the fixed shape: the join condition is the cheap id
    inequality only — zero folds."""
    from feray_spark.operators.similarity import brute_force_topk

    rows = [(i, [float(i), 1.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.selectExpr("vec_id as q_id", "embedding")
    c = df.selectExpr("vec_id as c_id", "embedding")
    plan = _plan(brute_force_topk(q, c, k=2))
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert join_lines, plan
    assert all("zip_with" not in ln for ln in join_lines), join_lines
