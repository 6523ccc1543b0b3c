"""End-to-end corpus curation — the composition the individual LLM
operators exist for: raw documents → quality/language gate →
canonical exact dedup → MinHash near-dup clustering → n-gram
decontamination → deterministic split → sharded sequence packing.
This is the "switch your pipeline to this engine" artifact: every
stage is one of the catalog's operators applied with its documented
100 TB posture, chained on lazy DataFrames so Catalyst plans each
output end to end. One stage is necessarily eager: near-dup
CLUSTERING is an iterative fixpoint whose per-round convergence
check is an action, so building the result executes the flow up
through pair generation; everything downstream (decontamination,
split, packing) stays lazy until a sink runs.

Stage order follows the standard curation argument (C4/RefinedWeb/
Dolma): cheap row-local gates first (quality, language — zero
shuffle, prunes the corpus before anything pays a shuffle), exact
dedup before fuzzy (sha keys are cheaper than signatures; canonical
form collapses re-encodings so MinHash sees each surface form once),
decontamination after dedup (fewer docs to probe), split before
packing (packs must not straddle splits or eval leaks into train).

Determinism end to end: every decision — dedup winners, cluster
labels, the split draw, pack assignment — derives from content
hashes or document ids, never from partitioning, timing or RNG
state, so two runs over the same corpus (or the same run on a
different cluster layout) curate the SAME training set. That is the
property that makes a 100 TB curation re-run auditable.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from feray_spark.functions.text import (
    md5_bucket,
    quality_score,
    shingles_from_words,
    token_count,
    words,
)
from feray_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
)
from feray_spark.queries.util import fence


@dataclass(frozen=True)
class CurationResult:
    """Handles on every stage boundary plus the packed output. All
    are lazy DataFrames, but constructing the result has already
    executed up through near-dup clustering (its fixpoint check is
    an action); stages after it run at the caller's sink.
    ``counts()`` runs one count job per stage — a test/report
    convenience; production flows attach ``df.observe`` to the
    stages they ship."""

    raw: DataFrame
    gated: DataFrame          # quality/language gate survivors
    deduped: DataFrame        # canonical exact-dedup winners
    neardup_free: DataFrame   # one doc per MinHash cluster
    clean: DataFrame          # decontaminated (== neardup_free if no probes)
    split_docs: DataFrame     # clean + split column
    packs: DataFrame          # (split, shard, pack_id, n_docs, pack_tokens)
    # the checkpoint-PRODUCING plan behind ``deduped``: the lazy
    # localCheckpoint truncates every downstream lineage to a
    # Scan ExistingRDD, so the gate-pushdown / fence / dedup-exchange
    # contract is only auditable on this pre-checkpoint handle
    # (tests/test_plans.py pins it here, not on ``packs``)
    deduped_source: DataFrame

    def counts(self) -> dict[str, int]:
        return {
            "raw": self.raw.count(),
            "gated": self.gated.count(),
            "deduped": self.deduped.count(),
            "neardup_free": self.neardup_free.count(),
            "clean": self.clean.count(),
            "packs": self.packs.count(),
        }


def curate_corpus(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.35,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 12,
    bands: int = 4,
    probe_texts: Sequence[str] | None = None,
    probe_ngram: int = 8,
    split_salt: str = "split42:",
    split_pct: tuple[int, int] = (80, 90),
    pack_ctx: int = 256,
    pack_shards: int = 8,
    max_bucket_ids: int | None = 4096,
) -> CurationResult:
    """Run the full curation flow over ``documents``. Returns lazy
    stage handles — callers pick the sink (table store write,
    parquet, registry publication).

    - **Gate** (zero shuffle): non-NULL text and
      ``quality_score >= quality_min`` fused into the scan filter.
    - **Canonical exact dedup** (1 shuffle): L1b's normalize → hash,
      lowest id wins (:func:`exact_dedup` ``canonical=True``).
    - **Near-dup clustering** (bounded): L2 MinHash banding produces
      candidate PAIRS from bucket collisions only; L2e connected
      components turns pairs into clusters; the keep rule is
      min-id-per-cluster — so the survivors are independent of how
      pairs happened to be discovered.
    - **Decontamination** (≤1 broadcast): benchmark ``probe_texts``
      become a broadcast set of ``probe_ngram``-gram keys; any doc
      sharing one n-gram is dropped (L12's posture: the corpus
      stream is scanned once and never shuffled for this).
    - **Split** (zero shuffle): L9's md5 draw in [0,100) against
      ``split_pct`` fences → train/val/test, stable under appends.
    - **Packing** (1 shuffle per split): L13's sharded running-sum —
      packs never straddle a split boundary because the window is
      partitioned by (split, shard).
    """
    d = documents
    # project-then-filter with a fence, NOT a bare .filter: filter
    # predicates get no codegen CSE, so the quality tree inlined into
    # the scan filter re-evaluates once per reference per row (the
    # plan showed 7 canon_lower chains); the fence stops Catalyst
    # from substituting the alias back into the predicate (measured
    # 6.4 -> 1.0 s at sf0.1). The isNotNull conjunct goes BELOW the
    # fenced projection — a non-deterministic project field blocks
    # ALL pushdown through it, so the null filter must already sit on
    # the scan to keep its PushedFilters row-group skip.
    qcol = "__q"
    while qcol in d.columns:  # never clobber a caller's column
        qcol += "_"
    gated = (
        d.filter(F.col(text_col).isNotNull())
        .withColumn(qcol, fence(quality_score(text_col), "double"))
        .filter(F.col(qcol) >= F.lit(quality_min))
        .drop(qcol)
    )

    # LAZY localCheckpoint on deduped: it feeds FOUR lineages — the
    # minhash signatures, the verify-join's shingle sets (inside
    # minhash_lsh_pairs), the left-anti survivor join, and the packs
    # flow — so without the pin the gate's quality regex + the
    # canonical-hash dedup re-execute once per consumer. At sf0.1
    # that was noise (4.62 vs 4.68 s, the round-5 measurement that
    # kept this off); at the 64× probe corpus the decision INVERTS:
    # 156–177 s → 55–64 s (2.8×, interleaved A/B, runs=2). The lazy
    # form materializes on first use and costs nothing extra at
    # small scale; a 100 TB flow phases this boundary through
    # storage, which is the same shape with durability.
    deduped_source = exact_dedup(gated, text_col, id_col, canonical=True)
    deduped = deduped_source.localCheckpoint(eager=False)

    pairs = minhash_lsh_pairs(
        deduped,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        max_bucket_ids=max_bucket_ids,
    )
    labels = connected_components(pairs)
    losers = labels.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col)
    )
    neardup_free = deduped.join(losers, id_col, "left_anti")

    if probe_texts:
        spark = documents.sparkSession
        probe = spark.createDataFrame(
            [(t,) for t in probe_texts], f"{text_col} string"
        )
        # materialize the word array before shingling (the l31/l20
        # pattern): inlined, the regex tokenizer re-runs per shingle
        # element access inside the HOF lambda
        wcol = "__w"
        while wcol in neardup_free.columns:
            wcol += "_"
        probe_grams = (
            probe.withColumn(wcol, words(text_col))
            .select(
                F.explode(
                    shingles_from_words(F.col(wcol), probe_ngram)
                ).alias("gram")
            )
            .distinct()
        )
        contaminated = (
            neardup_free.withColumn(wcol, words(text_col))
            .select(
                id_col,
                F.explode(
                    shingles_from_words(F.col(wcol), probe_ngram)
                ).alias("gram"),
            )
            .join(F.broadcast(probe_grams), "gram", "left_semi")
            .select(id_col)
            .distinct()
        )
        clean = neardup_free.join(contaminated, id_col, "left_anti")
    else:
        clean = neardup_free

    draw = md5_bucket(split_salt, id_col, 100)
    split_docs = clean.withColumn(
        "split",
        F.when(draw < split_pct[0], "train")
        .when(draw < split_pct[1], "val")
        .otherwise("test"),
    )

    shard = md5_bucket("pack13:", id_col, pack_shards)
    toks = split_docs.select(
        id_col,
        "split",
        shard.alias("shard"),
        token_count(text_col).alias("n_tokens"),
    )
    w = (
        W.partitionBy("split", "shard")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packs = (
        toks.withColumn(
            "pack_id",
            F.floor(
                (F.sum("n_tokens").over(w) - F.col("n_tokens")) / pack_ctx
            ),
        )
        .groupBy("split", "shard", "pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        )
    )

    return CurationResult(
        raw=d,
        gated=gated,
        deduped=deduped,
        neardup_free=neardup_free,
        clean=clean,
        split_docs=split_docs,
        packs=packs,
        deduped_source=deduped_source,
    )


def attrition_flags(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.35,
) -> DataFrame:
    """The checkpoint-PRODUCING flagged pass behind
    :func:`attrition_report`: one corpus scan + ONE canonical-hash
    window computing every stage membership as a flag
    (``__gated``, ``__winner``) plus the token count. Factored out so
    the plan contract — single window, single exchange — stays
    auditable after :func:`attrition_report` truncates the lineage
    with its lazy localCheckpoint (tests/test_plans.py pins it)."""
    from feray_spark.functions.text import with_canonical_text
    from feray_spark.operators.dedup import content_keep_flag

    gate = F.col(text_col).isNotNull() & (
        quality_score(text_col) >= F.lit(quality_min)
    )
    # Canonicalization via the size-gated helper (r10): the Arrow
    # utf8proc+RE2 leg on big inputs (l26 measured 45.7 -> 31.7 s at
    # the 64x corpus from the same swap in exact_dedup), the Column
    # leg on fixtures. Project to the two consumed columns FIRST —
    # mapInArrow defeats column pruning.
    ccol = "__canon"
    while ccol in (id_col, text_col):  # never clobber a caller column
        ccol += "_"
    src = with_canonical_text(
        documents.select(id_col, text_col), text_col, ccol
    )
    # THE exact_dedup winner rule, shared (operators.dedup): ungated
    # rows key on their own id, so they pass through the winner
    # window without contending with any canonical group — the
    # funnel's counts can never drift from the pipeline it audits
    keep = content_keep_flag(F.col(ccol), id_col, gate)
    return src.select(
        F.col(id_col),
        F.col(text_col),
        token_count(text_col).alias("__n_tok"),
        gate.alias("__gated"),
        (gate & keep).alias("__winner"),
    )


def attrition_report(
    documents: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_min: float = 0.35,
    jaccard_threshold: float = 0.5,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket_ids: int | None = 4096,
) -> DataFrame:
    """The per-stage attrition FUNNEL for :func:`curate_corpus`'s
    gate → canonical exact dedup → near-dup clustering prefix: one
    ``(stage, n_docs, n_tokens)`` row per stage, counts identical to
    the stage handles' (regression-tested against ``counts()``).

    Shape: rather than counting each stage handle separately (which
    replays the gate/dedup lineage once PER stage), every stage
    membership is computed as a FLAG in one pass — the gate is a
    scan-side predicate, the exact-dedup winner is ``rn = 1`` over
    the canonical-hash window (ungated rows ride along under their
    own unique keys, so they never contend), and the near-dup
    survivor is a left-anti flag against the cluster losers — then
    ONE conditional global aggregate + ``stack`` unpivots the funnel
    to rows. Costs one corpus scan + the dedup window per consumer
    (two lineages: the pair generator and the final aggregate) +
    the clustering fixpoint the pipeline pays anyway; nothing is
    counted corpus-scan-per-stage."""
    # pin the flagged pass: it feeds BOTH the pair generator and the
    # final aggregate, and the clustering in between is eager anyway —
    # without the checkpoint the scan + canonical window re-execute
    # once per consumer (measured 7.8 vs 5.4 s at sf0.1)
    flagged = attrition_flags(
        documents,
        id_col=id_col,
        text_col=text_col,
        quality_min=quality_min,
    ).localCheckpoint(eager=False)

    ded = flagged.filter(F.col("__winner")).select(id_col, text_col)
    pairs = minhash_lsh_pairs(
        ded,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        jaccard_threshold=jaccard_threshold,
        max_bucket_ids=max_bucket_ids,
    )
    labels = connected_components(pairs)
    losers = labels.filter(F.col("id") != F.col("comp")).select(
        F.col("id").alias(id_col), F.lit(True).alias("__loser")
    )
    rep = flagged.join(losers, id_col, "left")

    def _docs(flag):
        return F.sum(F.when(flag, 1).otherwise(0)).cast("bigint")

    def _toks(flag):
        return F.sum(F.when(flag, F.col("__n_tok"))).cast("bigint")

    survivor = F.col("__winner") & F.col("__loser").isNull()
    agg = rep.agg(
        F.count("*").cast("bigint").alias("d0"),
        F.sum("__n_tok").cast("bigint").alias("t0"),
        _docs(F.col("__gated")).alias("d1"),
        _toks(F.col("__gated")).alias("t1"),
        _docs(F.col("__winner")).alias("d2"),
        _toks(F.col("__winner")).alias("t2"),
        _docs(survivor).alias("d3"),
        _toks(survivor).alias("t3"),
    )
    return agg.select(
        F.expr(
            "stack(4, '0_raw', d0, t0, '1_gated', d1, t1,"
            " '2_exact_dedup', d2, t2, '3_neardup_free', d3, t3)"
            " AS (stage, n_docs, n_tokens)"
        )
    )
