"""LLM-data-pipeline operators (SURVEY §2.12 L1-L7) over the
``documents`` and ``embeddings`` fixtures.

The DuckDB oracles recompute MinHash signatures, fingerprints and
cosine scores bit-for-bit (md5-prefix hash basis, sequential-fold
float math), so even the approximate operators are gated exactly.
Oracle SQL for the MinHash pipeline is generated programmatically to
stay in lock-step with the Spark-side parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W_llm
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.functions.text import (
    MINHASH_COEFFS,
    MINHASH_P,
    bpe_ish_token_count,
    canon_lower,
    doc_fingerprint,
    lang_id,
    md5_bucket,
    md5_rank,
    quality_score,
    token_count,
    words,
)
from feray_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    span_first_occurrence_flags,
)
from feray_spark.operators.similarity import (
    brute_force_topk,
    exact_scan_topk,  # noqa: F401 - vectorized twin, re-exported for users
    embedding_neardup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
)
from feray_spark.queries import register
from feray_spark.queries.util import fan_out, fence, sql_portable_double

# MinHash/LSH parameters shared by the Spark operator and the oracle
MH_NUM_HASHES = 12
MH_BANDS = 4
MH_ROWS = MH_NUM_HASHES // MH_BANDS
JACCARD_T = 0.5

#: DuckDB twin of functions.text.canon_lower — engine-portable
#: lowercasing with the İ (U+0130) and final-sigma special-casing
#: pins (see canon_lower's docstring for why bare lower() diverges
#: between Java and utf8proc on Turkish/Greek text)
def _canon_lower_sql(expr: str = "text") -> str:
    return f"replace(lower(replace({expr}, 'İ', 'I')), 'ς', 'σ')"


_WORDS_SQL = (
    "list_filter(string_split_regex("
    f"{_canon_lower_sql('text')}, '\\s+'), x -> x != '')"
)

# DuckDB twin of functions.text.quality_score (same integer/ratio
# arithmetic, same IEEE ops) — shared by l4 and the sampling/cap oracles.
_QUALITY_SQL = f"""(CASE WHEN len({_WORDS_SQL}) = 0 THEN 0.0
               ELSE (CAST((length(text) BETWEEN 20 AND 100000) AS INT)
                + CAST((len(list_filter({_WORDS_SQL},
                       x -> list_contains(['the','a','of','and','to','in'], x)
                       ))::DOUBLE / len({_WORDS_SQL}) >= 0.05) AS INT)
                + CAST((list_sum(list_transform({_WORDS_SQL},
                        x -> length(x)))::DOUBLE
                        / len({_WORDS_SQL}) BETWEEN 2.0 AND 12.0) AS INT)
               )::DOUBLE / 3.0 END)"""

_SHINGLES_SQL = (
    "list_transform(generate_series(1, len(w) - 2), "
    "i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
)


def _minhash_sql(j: int) -> str:
    """Twin of functions.text.minhash_value over the base-hash list:
    one md5 per shingle, 12 affine-mod-P derivations."""
    a, b = MINHASH_COEFFS[j]
    return f"list_min(list_transform(xs, x -> (x * {a} + {b}) % {MINHASH_P}))"


def _bands_cte_sql(source: str = "documents") -> str:
    """CTE producing (doc_id, band_idx, band_hash) for every doc with
    >= 3 words — the exact twin of operators.dedup.minhash_bands.
    ``source`` lets a composed oracle (l26) band over an upstream CTE
    instead of the raw table."""
    mh = ", ".join(f"{_minhash_sql(j)} AS mh{j}" for j in range(MH_NUM_HASHES))
    band_rows = "\n            UNION ALL ".join(
        "SELECT doc_id, {b} AS band_idx, md5(concat_ws('|', {parts})) AS band_hash "
        "FROM sigs".format(
            b=b,
            parts=", ".join(f"mh{b * MH_ROWS + r}" for r in range(MH_ROWS)),
        )
        for b in range(MH_BANDS)
    )
    return f"""
        words AS (SELECT doc_id, text, {_WORDS_SQL} AS w FROM {source}),
        shingled AS (SELECT doc_id, {_SHINGLES_SQL} AS sh
                     FROM words WHERE len(w) >= 3),
        xs AS (SELECT doc_id, list_transform(sh, s ->
                   ('0x' || substr(md5(s), 1, 12))::BIGINT % {MINHASH_P}) AS xs
               FROM shingled),
        sigs AS (SELECT doc_id, {mh} FROM xs),
        banded AS ({band_rows})
    """


@register(
    "l1_exact_dedup",
    oracle="""
        SELECT doc_id, lang, source FROM (
            -- NULL texts are not duplicates of each other: key each
            -- on its own id (the operator's coalesce rule)
            SELECT doc_id, lang, source,
                   ROW_NUMBER() OVER (
                       PARTITION BY coalesce(sha256(text),
                                    '__null__' || CAST(doc_id AS VARCHAR))
                       ORDER BY doc_id) AS rn
            FROM documents) t
        WHERE rn = 1
    """,
    tags=("llm", "L1"),
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: exact dedup by content sha256, lowest doc_id wins."""
    d = load_table(spark, sf_dir, "documents")
    return exact_dedup(d, "text", "doc_id").select("doc_id", "lang", "source")


_CANON_SQL = (
    "trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))"
)


@register(
    "l1b_canonical_dedup",
    oracle=f"""
        WITH c AS (
            SELECT doc_id, lang, source,
                   md5({_CANON_SQL}) AS canon_md5
            FROM documents)
        SELECT doc_id, lang, source, canon_md5, n_variants FROM (
            SELECT doc_id, lang, source, canon_md5,
                   ROW_NUMBER() OVER (
                       PARTITION BY coalesce(canon_md5,
                                    '__null__' || CAST(doc_id AS VARCHAR))
                       ORDER BY doc_id) AS rn,
                   CAST(COUNT(*) OVER (
                       PARTITION BY coalesce(canon_md5,
                                    '__null__' || CAST(doc_id AS VARCHAR))
                   ) AS BIGINT) AS n_variants
            FROM c) t
        WHERE rn = 1
    """,
    tags=("llm", "L1", "dedup"),
)
def l1b_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1 variant: CANONICAL exact dedup — dedup after text
    normalization (lowercase, strip non-alphanumerics, collapse
    whitespace), the "fuzzy-exact" pass C4/Dolma-style pipelines run
    between byte-exact dedup (L1) and shingle methods (L2): it
    collapses re-encodings, case flips, and whitespace-only variants
    that sha256 treats as distinct, at exact-dedup cost — no
    shingles, no candidate pairs. Winner = lowest doc_id; output
    carries ``n_variants`` (how many raw docs collapsed onto each
    canonical form — the duplication-factor signal per kept doc) and
    the canonical md5. NULL texts keep L1's rule: each is its own
    group (NULL canon_md5, n_variants = 1). The normalization is
    ASCII-scoped by construction (everything outside [a-z0-9\\s] is
    stripped AFTER lowercasing), which keeps the two engines'
    lowercase/regex semantics bit-identical; a production Unicode
    fold (NFKC) slots into the same key expression.

    Scale shape: ONE shuffle on the canonical hash, as a HASH
    AGGREGATE, not a window — ``min(struct(doc_id, ...))`` picks the
    winner row (doc_id leads the struct and is unique, so struct
    ordering IS doc_id ordering) and ``count(*)`` rides the same
    aggregate. Map-side partial aggregation collapses each scan
    partition to one row per canonical form BEFORE the exchange, so
    the mega-group this op exists to find (a boilerplate form
    repeated billions of times) ships at most one partial row per
    partition — a rank window over the same key would colocate the
    entire group on one executor. Per-row normalization is three
    codegen'd string expressions, zero UDFs."""
    from feray_spark.functions.text import with_canonical_text

    d = load_table(spark, sf_dir, "documents")
    # r10: canonicalize via with_canonical_text — the size-gated
    # Arrow batch path (utf8proc + RE2, the oracle's own engines).
    # Java's regex measured ~40× more core-seconds on the strip
    # pass; whole query at the 64× probe corpus 13.4 → 6.5 s
    # (noop-write A/B), now at DuckDB's absolute level there (6.3 s),
    # while fixture-scale inputs stay on the Column leg (0.34 s at
    # sf0.1 — the Python boundary's fixed ~0.3 s exceeds the whole
    # regex bill below the ~2 MB crossover). Project to the four
    # consumed columns FIRST — mapInArrow defeats column pruning.
    canon = F.col("__canon")
    key = F.coalesce(
        F.md5(canon),
        F.concat(F.lit("__null__"), F.col("doc_id").cast("string")),
    )
    return (
        with_canonical_text(
            d.select("doc_id", "lang", "source", "text"), "text", "__canon"
        )
        .select(
            "doc_id",
            "lang",
            "source",
            F.md5(canon).alias("canon_md5"),
            key.alias("k"),
        )
        .groupBy("k")
        .agg(
            F.min(F.struct("doc_id", "lang", "source", "canon_md5")).alias("w"),
            F.count("*").cast("bigint").alias("n_variants"),
        )
        .select(
            F.col("w.doc_id").alias("doc_id"),
            F.col("w.lang").alias("lang"),
            F.col("w.source").alias("source"),
            F.col("w.canon_md5").alias("canon_md5"),
            "n_variants",
        )
    )


@register(
    "l2_minhash_lsh_neardups",
    oracle=f"""
        WITH {_bands_cte_sql()},
        pairs AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        ),
        shsets AS (SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
                   FROM words WHERE len(w) >= 3)
        SELECT id_a, id_b,
               len(list_intersect(sa.sh, sb.sh))::DOUBLE
                   / len(list_distinct(sa.sh || sb.sh)) AS jaccard
        FROM pairs JOIN shsets sa ON id_a = sa.doc_id
                   JOIN shsets sb ON id_b = sb.doc_id
        WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                  / len(list_distinct(sa.sh || sb.sh)) >= {JACCARD_T}
    """,
    tags=("llm", "L2", "dedup"),
)
def l2_minhash_lsh_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: MinHash+LSH near-duplicate pairs (shingle→minhash→band→
    bucket-join→exact-Jaccard verify ≥ 0.5). The oracle regenerates
    the identical 12-hash / 4-band pipeline in SQL. The fixtures
    contain planted near-dup pairs (J≈0.97) over ~0.02 background."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d,
        "text",
        "doc_id",
        shingle_n=3,
        num_hashes=MH_NUM_HASHES,
        bands=MH_BANDS,
        jaccard_threshold=JACCARD_T,
    )


@register(
    "l2b_simhash",
    oracle=f"""
        WITH w AS (
            SELECT doc_id,
                   list_distinct({_WORDS_SQL}) AS ws
            FROM documents WHERE text IS NOT NULL
        ), h AS (
            SELECT doc_id, len(ws) AS n,
                   list_transform(ws, s ->
                       ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
            FROM w
        )
        SELECT doc_id,
               CAST(list_aggregate(list_transform(generate_series(0, 59), b ->
                   CASE WHEN 2 * len(list_filter(hs,
                                x -> (x >> b) & 1 = 1)) > n
                        THEN (1::BIGINT << b) ELSE 0::BIGINT END),
                   'sum') AS BIGINT) AS simhash
        FROM h
    """,
    tags=("llm", "L2", "dedup"),
)
def l2b_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 variant: 60-bit SimHash sketch per document — per-bit
    majority vote over md5-prefix word hashes (operators/dedup.py
    ``simhash``), near-dup Hamming behavior unit-tested in
    test_llm.py. Promoted from rows-only to a FULL value oracle: the
    md5 basis means DuckDB can replay every bit (distinct word set →
    15-hex-prefix hash per word → per-bit majority → bit sum), so
    the sketch itself is hash-gated, not just its row count. NULL
    texts drop on both sides (a missing extraction has no sketch);
    zero-word texts keep sketch 0 identically in both engines (an
    empty majority vote sets no bits — the fold's initial state).

    Scale shape: zero shuffle — the sketch is one projection with a
    single aggregate fold over the per-row word-hash array
    (``fan_out`` justified by measurement: 0.59 s vs 1.60 s at
    sf0.1, the 60-bit per-word fold is hot). The NULL gate is a
    scan-pushed predicate, deliberately NOT a word-array emptiness
    check — that would pay the regex split + array_distinct a second
    time outside the operator's materialized ``__w`` (Catalyst does
    not CSE across the filter/project boundary)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    return simhash(d, "text", "doc_id")


@register(
    "l2c_ngram_jaccard",
    oracle=f"""
        WITH words_t AS (SELECT doc_id, {_WORDS_SQL} AS w
                         FROM documents),
        shsets AS (SELECT doc_id,
                          list_distinct(CASE WHEN len(w) >= 3
                              THEN {_SHINGLES_SQL}
                              ELSE [] END) AS sh
                   FROM words_t),
        tok AS (SELECT doc_id, unnest(sh) AS s FROM shsets),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         COUNT(*) AS i
                  FROM tok a JOIN tok b
                    ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT id_a, id_b,
               i::DOUBLE / (na.n + nb.n - i) AS jaccard
        FROM inter JOIN sizes na ON id_a = na.doc_id
                   JOIN sizes nb ON id_b = nb.doc_id
        WHERE i::DOUBLE / (na.n + nb.n - i) >= {JACCARD_T}
    """,
    tags=("llm", "L2", "dedup"),
)
def l2c_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 exact tier: n-gram (3-word shingle) Jaccard near-dup pairs
    as an exact inverted-index count join — no hash approximation;
    shingle arrays never travel through a join. See operators.dedup
    .ngram_jaccard_pairs for the shape and its 100 TB posture
    (max_df stop-shingle cutoff). The oracle replays the identical
    count scheme in SQL."""
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", threshold=JACCARD_T)


@register(
    "l2d_embedding_neardup",
    oracle="""
        SELECT id_a, id_b, ROUND(cosine, 9) AS cosine FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_reduce(list_transform(
                   list_zip(a.embedding, b.embedding),
                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                   (acc, x) -> acc + x)
               / (sqrt(list_reduce(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                      (acc, x) -> acc + x))
                  * sqrt(list_reduce(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                      (acc, x) -> acc + x))) AS cosine
        FROM (SELECT * FROM embeddings WHERE len(embedding) > 0) a
        JOIN (SELECT * FROM embeddings WHERE len(embedding) > 0) b
          ON a.vec_id < b.vec_id
        WHERE list_reduce(list_transform(
                  list_zip(a.embedding, b.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                  (acc, x) -> acc + x)
              / (sqrt(list_reduce(list_transform(a.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (acc, x) -> acc + x))
                 * sqrt(list_reduce(list_transform(b.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (acc, x) -> acc + x))) >= 0.4
        ) t
    """,
    tags=("llm", "L2", "L3", "dedup", "similarity"),
)
def l2d_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 embedding tier: exact cosine near-dup pairs (cosine >= 0.4,
    the fixtures' neighbor band) via the broadcast-index scan of
    operators.similarity.embedding_neardup_pairs — zero shuffles; the
    oracle brute-forces all pairs. Threshold margin vs float noise:
    nearest fixture cosine to 0.4 is >= 1e-5, float64-vs-fold
    disagreement is ~1e-15; the OUTPUT cosine rounds to 9 decimals on
    both sides (threshold/ranking stay full-precision) so the ulp
    drift can't flip a strict value hash."""
    e = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(e, id_col="vec_id", vec_col="embedding", tau=0.4)
    return pairs.withColumn("cosine", F.round("cosine", 9))


@register(
    "l3_embedding_topk",
    oracle="""
        WITH scored AS (
            SELECT q.vec_id AS q_id, c.vec_id AS c_id,
                   list_reduce(list_transform(
                       list_zip(q.embedding, c.embedding),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                       (acc, x) -> acc + x)
                   / (sqrt(list_reduce(list_transform(q.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                          (acc, x) -> acc + x))
                      * sqrt(list_reduce(list_transform(c.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                          (acc, x) -> acc + x))) AS cosine
            FROM (SELECT * FROM embeddings
                  WHERE vec_id % 50 = 0 AND len(embedding) > 0) q
            CROSS JOIN (SELECT * FROM embeddings
                        WHERE len(embedding) > 0) c
            WHERE q.vec_id != c.vec_id
        )
        -- + 0.0 after the round: normalizes IEEE -0.0 (a tiny
        -- negative cosine rounds to it) to +0.0 on BOTH engines —
        -- the Spark side's fence term already does this pre-round,
        -- so without the pin the two sides could disagree on the
        -- zero's sign (repr-level hash divergence)
        SELECT q_id, c_id, ROUND(cosine, 9) + 0.0 AS cosine, rank FROM (
            SELECT q_id, c_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY cosine DESC, c_id) AS rank
            FROM scored) t
        WHERE rank <= 3
    """,
    tags=("llm", "L3", "similarity"),
)
def l3_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: exact cosine top-3 neighbors for a query subset (every
    50th vector) — broadcast queries against the corpus scan, scored
    by the SEQUENTIAL-FOLD cosine (codegen zip_with/aggregate),
    bit-identical to the oracle's list_reduce: ranks can never flip
    on near-ties, not just values (the matmul-vectorized twin
    exact_scan_topk is ~1 ulp off per pair, which is enough to
    reorder a near-tied (cosine DESC, id) rank between engines).
    Both sides exclude NULL/empty embeddings (cosine undefined; the
    Spark guard is operators.similarity.drop_invalid_vecs, the oracle's
    is len(embedding) > 0 — DuckDB's seedless list_reduce would
    otherwise RAISE on the empty norm fold).
    Output cosine additionally rounds to 9 decimals on both sides.
    Corpus never shuffles; only the partial top-k ranks exchange.
    l3b/l3c carry the vectorized + ANN scale tiers."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") % 50 == 0)
    topk = brute_force_topk(
        queries.select(F.col("vec_id").alias("q_id"), "embedding"),
        e.select(F.col("vec_id").alias("c_id"), "embedding"),
        k=3,
    )
    # rank -> BIGINT: DuckDB ROW_NUMBER is int64 where Spark
    # row_number is int32, and the driver's value hash is
    # dtype-sensitive (the l15 discipline). + 0.0 after the round
    # mirrors the oracle's -0.0 -> +0.0 pin (a tiny negative cosine
    # rounds to IEEE -0.0; the fence in brute_force_topk normalizes
    # only the PRE-round value, and only on this side).
    return topk.withColumn(
        "cosine", F.round("cosine", 9) + F.lit(0.0)
    ).withColumn("rank", F.col("rank").cast("bigint"))


#: Aggregate-recall floor the ANN tiers must clear against exact
#: brute-force top-3 — the bound the pre-existing unit tests assert
#: (measured: LSH 0.70 / IVF 0.73 at sf0.001, both 0.90 at sf0.01;
#: all deterministic — fixed RNG seed, fixed fixtures).
ANN_RECALL_FLOOR = 0.6

# l3b/l3c ANN ORACLE (shared): the LSH planes / IVF centroids come
# from a seeded driver-side RNG, so DuckDB cannot replay the ANN
# itself — instead the Spark side computes the exact brute-force
# top-k ALONGSIDE the ANN and emits one row per query vector whose
# booleans verify the ANN against it; the oracle pins the invariants
# (the l4 n_chars_ok discipline). A recall regression or a scoring
# bug flips real computed booleans and fails the value hash — this
# is a full value gate, not a rows-only count.
_ANN_ORACLE = """
    SELECT vec_id AS q_id,
           TRUE AS returned_le_k,
           TRUE AS cosine_consistent,
           TRUE AS recall_ok
    FROM embeddings WHERE vec_id % 50 = 0
"""


def _ann_verified(spark: SparkSession, sf_dir: str, ann) -> DataFrame:
    """Shared l3b/l3c harness: run ``ann(queries, corpus)``, join its
    pairs against the exact top-3 and a fold-cosine recompute, and
    emit per-query verification booleans.

    - ``returned_le_k``: the ANN never exceeds k rows for a query.
    - ``cosine_consistent``: every returned pair's matmul-vectorized
      cosine is within 1e-9 of the sequential-fold cosine (the l3
      scorer) for the same pair — catches scoring/normalization bugs.
    - ``recall_ok``: corpus-level recall vs exact top-3 is >=
      ANN_RECALL_FLOOR (per-query recall is legitimately lumpy for
      LSH — a query whose bucket is sparse can miss all 3 — so the
      gate is the aggregate, matching the published LSH guarantee
      shape).

    Scale shape: the ANN and the exact scan are each one corpus pass
    with broadcast queries (no corpus shuffle); the verification
    joins touch only |queries| x k rows; the recall total is a
    one-row aggregate broadcast back onto the per-query frame."""
    from feray_spark.functions.vectors import cosine_similarity

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    c = e.select(F.col("vec_id").alias("c_id"), "embedding")
    approx = ann(q, c)
    exact = brute_force_topk(q, c, k=3)
    rescored = (
        approx.join(
            e.select(F.col("vec_id").alias("q_id"),
                     F.col("embedding").alias("__qv")),
            "q_id",
        )
        .join(
            e.select(F.col("vec_id").alias("c_id"),
                     F.col("embedding").alias("__cv")),
            "c_id",
        )
        .withColumn("__ref", cosine_similarity("__qv", "__cv"))
    )
    per_q = rescored.groupBy("q_id").agg(
        F.count("*").alias("__n"),
        F.max(F.abs(F.col("cosine") - F.col("__ref"))).alias("__dev"),
    )
    hits = approx.join(
        exact.select("q_id", "c_id"), ["q_id", "c_id"], "left_semi"
    )
    totals = exact.groupBy().agg(F.count("*").alias("__expected")).crossJoin(
        hits.groupBy().agg(F.count("*").alias("__hits"))
    )
    return (
        q.select("q_id")
        .join(per_q, "q_id", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "q_id",
            (F.coalesce(F.col("__n"), F.lit(0)) <= F.lit(3)).alias(
                "returned_le_k"
            ),
            (F.coalesce(F.col("__dev"), F.lit(0.0)) < F.lit(1e-9)).alias(
                "cosine_consistent"
            ),
            # zero-guard: an exact top-k of ZERO pairs (every corpus
            # vector is a query's self-match) makes the recall bound
            # vacuous — 0/0 would collect as NULL where the oracle
            # pins TRUE
            F.when(F.col("__expected") == 0, F.lit(True))
            .otherwise(
                F.col("__hits") / F.col("__expected")
                >= F.lit(ANN_RECALL_FLOOR)
            )
            .alias("recall_ok"),
        )
    )


@register("l3b_lsh_topk", oracle=_ANN_ORACLE, tags=("llm", "L3", "similarity"))
def l3b_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: hyperplane-LSH bucketed ANN re-ranked by exact
    cosine, value-gated against the exact top-3 via the shared
    :func:`_ann_verified` harness (recall floor + per-pair cosine
    consistency + k-bound). See operators.similarity
    .lsh_bucketed_topk for the one-pass broadcast-index shape.

    Growth knob (measured, scripts/l3b_knob_probe.py at 8x corpus):
    recall at the fixture defaults (3 planes, 6 tables) drifts
    0.88 -> 0.84; raising ``n_tables`` by +log2(K) RESTORES it to
    0.92 at the same wall cost, while raising ``n_planes`` collapses
    it (0.42 at 6 planes — each extra plane halves a near-pair's
    per-table collision odds at dim=64). Scale rule: grow tables
    with the corpus, touch planes only if per-bucket candidate
    volume, not recall, becomes the bottleneck."""
    return _ann_verified(
        spark, sf_dir, lambda q, c: lsh_bucketed_topk(q, c, k=3)
    )


@register("l3c_ivf_topk", oracle=_ANN_ORACLE, tags=("llm", "L3", "similarity"))
def l3c_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path #2: IVF coarse-quantizer ANN — corpus shuffles
    once on its cell id, queries probe their nprobe nearest cells,
    exact cosine re-ranks — value-gated against the exact top-3 via
    the shared :func:`_ann_verified` harness. See
    operators.similarity.ivf_topk."""
    return _ann_verified(spark, sf_dir, lambda q, c: ivf_topk(q, c, k=3))


@register(
    "l4_text_stats",
    oracle=f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_computed,
               -- coalesce: a NULL-text row must yield a REAL boolean
               -- (NULL booleans reach pandas as None on the Spark
               -- side but NaN from DuckDB — an untyped mismatch)
               coalesce(length(text) = n_chars, FALSE) AS n_chars_ok,
               CAST(len({_WORDS_SQL}) AS INT) AS n_tokens,
               CAST(len(regexp_extract_all(text,
                   '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS INT)
                   AS n_bpe_tokens,
               CASE WHEN len(list_intersect(
                        list_distinct({_WORDS_SQL}),
                        ['the','a','of','and','to','in'])) >= 2
                    THEN 'en' ELSE 'und' END AS lang_guess,
               {_QUALITY_SQL} AS quality,
               -- NULL text -> NULL fingerprint (the Spark hash64
               -- NULL-propagates; DuckDB's concat_ws would otherwise
               -- collapse every NULL doc to md5('0'))
               CASE WHEN text IS NULL THEN NULL
               ELSE list_min(list_transform(
                   generate_series(1,
                       greatest(length({_canon_lower_sql('text')}) - 7, 1)),
                   i -> substr(md5(concat_ws('|', '0',
                        substr({_canon_lower_sql('text')}, i, 8))),
                        1, 16))) END AS fingerprint
        FROM documents
    """,
    tags=("llm", "L4"),
)
def l4_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: per-document text statistics — char/token counts (plus a
    cross-check against the fixture's n_chars), BPE-ish token count,
    heuristic language ID, composite quality score, rolling-hash
    fingerprint. One projection; fan_out spreads the per-row hash
    work across cores when the scan arrives under-partitioned
    (measured: 0.90 s with vs 5.86 s without at sf0.1, local[32] —
    the heaviest per-row expression chain in the catalog)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.coalesce(
            F.length("text") == F.col("n_chars"), F.lit(False)
        ).alias("n_chars_ok"),
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_tokens"),
        lang_id("text").alias("lang_guess"),
        quality_score("text").alias("quality"),
        doc_fingerprint("text").alias("fingerprint"),
    )


@register(
    "l4b_lang_rollup",
    oracle="""
        SELECT lang, source, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang, source
    """,
    tags=("llm", "L4"),
)
def l4b_lang_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: corpus rollup by language and source. SUM is cast to BIGINT
    on BOTH sides: DuckDB SUM(int) yields HUGEINT where Spark yields
    LONG, and the driver's value hash does not coerce the types (the
    l22 discipline)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "l5_token_df_idf",
    oracle=f"""
        WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
        exploded AS (SELECT doc_id, unnest(list_distinct(w)) AS token
                     FROM words)
        SELECT token, COUNT(*) AS df,
               ROUND(ln((SELECT COUNT(*) FROM documents)::DOUBLE / COUNT(*)), 9) AS idf
        FROM exploded GROUP BY token
    """,
    tags=("llm", "L5"),
)
def l5_token_df_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: document frequency + IDF per token (explode distinct
    tokens → count → ln(N/df)). The exact-arithmetic path for term
    weighting; Spark ML HashingTF/IDF variant is l5b."""
    from feray_spark.functions.text import words as words_fn

    base = load_table(spark, sf_dir, "documents")
    # count() on the raw scan is answered from parquet footer metadata —
    # no text bytes move; counting the fanned-out frame would shuffle
    # every document first
    n_docs = base.count()
    # no fan_out: the explode itself multiplies rows before the
    # hash-agg, so the extra exchange only adds latency (measured
    # 0.34 s without vs 0.48 s with at sf0.1, local[32])
    tokens = base.select(
        F.explode(F.array_distinct(words_fn("text"))).alias("token")
    )
    return tokens.groupBy("token").agg(
        F.count("*").alias("df"),
        F.round(F.log(F.lit(float(n_docs)) / F.count("*")), 9).alias("idf"),
    )


#: the EXACT Java ``\\s`` set ([ \\t\\n\\x0B\\f\\r]) spelled out so the
#: Spark-side normalization covers everything the ML Tokenizer can
#: split on, and the DuckDB twin names the same set explicitly — the
#: engines' ``\\s`` differ (RE2's lacks \\x0B: the PORTABLE_DOUBLE_RE
#: lesson). The class holds the REAL control characters (the trailing
#: one is a literal VT).
_L5B_WS = "[ \t\n\r\f]"


@register(
    "l5b_ml_tfidf",
    oracle=f"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[^ \t\n\r\f\\x0B]+'))
                    AS INT) AS n_tokens,
               TRUE AS dim_ok, TRUE AS nnz_ok, TRUE AS idf_nonneg
        FROM documents
        WHERE text IS NOT NULL
          AND regexp_matches(text, '[^ \t\n\r\f\\x0B]')
    """,
    tags=("llm", "L5"),
)
def l5b_ml_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5 (ML path): Spark ML Tokenizer → HashingTF → IDF pipeline.

    FULL invariant oracle (promoted round 9 — the a3b/a5/l3b
    pattern): the hashed feature INDICES are Spark-internal, but the
    pipeline's observable contract is not. The hashed row is
    (doc_id, n_tokens, dim_ok, nnz_ok, idf_nonneg):

    - ``n_tokens`` cross-checks the engines exactly: the text is
      whitespace-normalized (ASCII class, spelled out — Java ``\\s``
      includes \\x0B, RE2's does not) to single spaces before the
      Tokenizer, so Java's ``split("\\s")`` yields exactly the
      non-whitespace runs the DuckDB twin counts with
      ``regexp_extract_all``. Zero-token docs are absent on both
      sides (Java's ``"".split`` would report one empty token).
    - ``dim_ok``: the TF-IDF vector has exactly numFeatures (4096)
      slots; ``nnz_ok``: 1 ≤ nonzeros ≤ n_tokens **on the TF
      vector** (hash collisions only ever merge slots — the TF-IDF
      vector would violate the lower bound on a defined input: IDF
      zeroes any slot whose df == m, so e.g. a single-document
      corpus has an all-zero weighted vector; ADVICE r9);
      ``idf_nonneg``: every component ≥ 0 (tf counts and smoothed
      IDF are nonnegative). Computed genuinely Spark-side via
      ``vector_to_array``; the oracle pins them TRUE."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

    norm = F.trim(
        F.regexp_replace(canon_lower("text"), _L5B_WS + "+", " ")
    )
    d = (
        load_table(spark, sf_dir, "documents")
        # the ML Tokenizer's java UDF raises on NULL input (no SQL
        # NULL-propagation); NULL-text docs have no tokens — absent
        # from the result, exactly like the exact path's explode
        .filter(F.col("text").isNotNull())
        .select("doc_id", norm.alias("text"))
        # fenced project field (the l20/l12/l8 r9 pattern): a bare
        # filter(text != '') is alias-substituted into the scan and
        # re-runs the canon+normalize chain on every row
        .withColumn("__ne", fence(F.length("text"), "int"))
        .filter(F.col("__ne") > 0)
        .drop("__ne")
    )
    tok = Tokenizer(inputCol="text", outputCol="tokens")
    tf = HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 12)
    # No persist: IDF.fit is the FIRST materialization (one pass for doc
    # frequencies) and the caller's collection of `out` is the second.
    # Caching between them would have to stay pinned past return to help,
    # leaking storage memory per run; re-tokenizing once is cheaper.
    tfd = tf.transform(tok.transform(d))
    empty_schema = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.expr("size(tokens)").cast("int").alias("n_tokens"),
        F.lit(True).alias("dim_ok"),
        F.lit(True).alias("nnz_ok"),
        F.lit(True).alias("idf_nonneg"),
    )
    if tfd.isEmpty():
        # IDF.fit refuses a zero-document corpus (mllib requirement);
        # an empty backfill window / fully-filtered input is a defined
        # empty result, not a crash
        return empty_schema(tfd)
    idf = IDF(inputCol="tf", outputCol="tfidf").fit(tfd)
    arr = vector_to_array(F.col("tfidf"))
    # nnz bound holds on the TF vector only: IDF legitimately zeroes
    # df==m slots (all-zero output for a 1-doc corpus), so the
    # weighted vector has no nonzero LOWER bound on defined inputs
    tf_nnz = F.size(
        F.filter(vector_to_array(F.col("tf")), lambda x: x != 0.0)
    )
    n_tok = F.size("tokens").cast("int")
    return idf.transform(tfd).select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (F.size(arr) == (1 << 12)).alias("dim_ok"),
        ((tf_nnz >= 1) & (tf_nnz <= n_tok)).alias("nnz_ok"),
        F.forall(arr, lambda x: x >= 0.0).alias("idf_nonneg"),
    )


@register(
    "l6_multimodal_payloads",
    oracle="""
        SELECT doc_id,
               'text/plain' AS mime,
               'synthetic://' || CAST(doc_id AS VARCHAR) AS uri,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               sha256(text) AS payload_sha256
        FROM documents
    """,
    tags=("llm", "L6", "multimodal"),
)
def l6_multimodal_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: multimodal column plumbing — pack a binary payload into the
    typed media struct {mime, uri, data}, then account for it (byte
    length + sha256 of the raw bytes). Decode/feature-extraction over
    the same structs runs as mapInPandas (stubbed codec) in
    test_llm.py."""
    from feray_spark.multimodal import attach_media

    d = load_table(spark, sf_dir, "documents")
    with_media = attach_media(
        d.withColumn("payload", F.encode("text", "UTF-8")), "payload", "text/plain"
    )
    return with_media.select(
        "doc_id",
        F.col("media.mime").alias("mime"),
        F.col("media.uri").alias("uri"),
        F.length(F.col("media.data")).cast("int").alias("n_bytes"),
        F.sha2(F.col("media.data"), 256).alias("payload_sha256"),
    )


@register(
    "l6b_frame_sample",
    oracle="""
        WITH frames AS (
            -- the ORACLE char-slices VARCHAR, which equals the byte
            -- chunking the engine does only when every char is one
            -- byte — so the GATE restricts to ASCII payloads on both
            -- sides (DuckDB 1.0 cannot slice/sha256 BLOBs). The
            -- engine path itself is byte-generic; its non-ASCII
            -- byte-exactness is pinned by the multimodal unit tests.
            SELECT doc_id,
                   CAST(i AS INT) AS frame_idx,
                   substring(text, CAST(i * 32 + 1 AS BIGINT), 32) AS frame
            FROM (SELECT * FROM documents
                  WHERE length(text) = octet_length(encode(text))) documents,
                 LATERAL unnest(generate_series(0,
                     CAST(ceil(octet_length(encode(text)) / 32.0) AS BIGINT)
                         - 1)) AS t(i)
        )
        SELECT doc_id, frame_idx,
               CAST(octet_length(encode(frame)) AS INT) AS frame_n_bytes,
               sha256(frame) AS frame_sha256
        FROM frames WHERE frame_idx % 4 = 0
    """,
    tags=("llm", "L6", "multimodal"),
)
def l6b_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: frame sampling plumbing — every payload expands to frames
    inside mapInPandas and every 4th is kept (one output row per
    frame). The codec is the deterministic chunk stand-in
    (fake_chunk_frames) so the EXPANSION itself — schema, batch
    iteration, sampling arithmetic, per-frame hashing — is
    oracle-gated; a real video decoder drops into the same
    frame_extractor slot (multimodal.extract_video_frames stub)."""
    from feray_spark.multimodal import attach_media, fake_chunk_frames, sample_frames

    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") == F.octet_length("text")
    )
    with_media = attach_media(
        d.withColumn("payload", F.encode("text", "UTF-8")), "payload", "video/fake"
    )
    frames = sample_frames(
        with_media, every=4, frame_extractor=fake_chunk_frames
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bytes").cast("int").alias("frame_n_bytes"),
        "frame_sha256",
    )


@register(
    "l7_quality_filter_pipeline",
    oracle="""
        WITH s0 AS (SELECT * FROM documents),
        s1 AS (SELECT * FROM s0 WHERE length(text) BETWEEN 50 AND 100000),
        s2 AS (SELECT * FROM s1 WHERE lang IN ('en', 'de')),
        s3 AS (SELECT * FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY sha256(text)
                       ORDER BY doc_id) AS rn FROM s2) t WHERE rn = 1)
        SELECT 'raw' AS stage, (SELECT COUNT(*) FROM s0) AS n_kept
        UNION ALL SELECT 'length', (SELECT COUNT(*) FROM s1)
        UNION ALL SELECT 'lang', (SELECT COUNT(*) FROM s2)
        UNION ALL SELECT 'dedup', (SELECT COUNT(*) FROM s3)
    """,
    tags=("llm", "L7"),
)
def l7_quality_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: composable quality-filter chain (length bounds → language
    allowlist → exact dedup) with per-stage retention counts — the
    drop accounting a production pipeline must log.

    Scale shape: ONE scan + ONE narrow shuffle, not four scans. Each
    stage's predicate becomes a flag in a single projection (text
    bytes are read once), the dedup winner comes from one window over
    (content hash, doc_id) — rows outside the lang stage get a
    per-row key so they never co-partition — and every stage count is
    a conditional aggregate over the ranked rows. At 100 TB the
    four-union shape re-reads the corpus per stage; this reads it
    once and shuffles only (hash, flags, id)."""
    d = load_table(spark, sf_dir, "documents")
    len_ok = F.length("text").between(50, 100000)
    lang_ok = F.col("lang").isin("en", "de")
    content_h = F.coalesce(
        F.sha2(F.col("text"), 256),
        F.concat(F.lit("__null__"), F.col("doc_id").cast("string")),
    )
    flags = d.select(
        "doc_id",
        len_ok.alias("__len"),
        (len_ok & lang_ok).alias("__s2"),
        F.when(len_ok & lang_ok, content_h)
        .otherwise(F.concat(F.lit("__out__"), F.col("doc_id").cast("string")))
        .alias("__h"),
    )
    w = W_llm.partitionBy("__h").orderBy("doc_id")
    ranked = flags.withColumn("__rn", F.row_number().over(w))
    agg = ranked.agg(
        F.count("*").alias("raw"),
        F.count(F.when(F.col("__len"), 1)).alias("length"),
        F.count(F.when(F.col("__s2"), 1)).alias("lang"),
        F.count(
            F.when(F.col("__s2") & (F.col("__rn") == 1), 1)
        ).alias("dedup"),
    )
    return agg.selectExpr(
        "stack(4, 'raw', raw, 'length', length, 'lang', lang, "
        "'dedup', dedup) AS (stage, n_kept)"
    )


@register(
    "l6c_audio_features",
    oracle="""
        SELECT doc_id,
               'audio/wav' AS mime,
               CAST(44 + 2 * (800 + (doc_id % 5) * 80) AS BIGINT) AS n_bytes,
               CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
               CAST(800 + (doc_id % 5) * 80 AS DOUBLE)
                   / (8000 + (doc_id % 3) * 4000) AS duration_s,
               (1000 + (doc_id % 7) * 100) / 32768.0 AS rms
        FROM documents
    """,
    tags=("llm", "L6", "multimodal"),
)
def l6c_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 audio path — REAL decode, closed-form oracle: each doc gets
    a genuine PCM16 WAV payload (RIFF bytes from
    multimodal.synth_wav: a ±amp square wave whose rate/length/
    amplitude derive from doc_id), and the mapInPandas extractor runs
    the real RIFF parser (multimodal.decode_wav — numpy, no codec
    library). The oracle recomputes every feature analytically:
    n_bytes = 44-byte header + 2·n samples, duration = n/sr, and the
    square wave makes rms = amp/32768 BIT-EXACT in IEEE doubles (all
    intermediate values are representable), so the hash gate pins the
    decoder itself, not a fake. Compressed formats (mp3/flac) remain
    honestly stubbed behind NotImplementedError in
    multimodal.decode_audio."""
    import numpy as np

    from feray_spark.multimodal import extract_audio_features, synth_wav

    d = load_table(spark, sf_dir, "documents")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                sr = 8000 + (i % 3) * 4000
                n = 800 + (i % 5) * 80
                amp = 1000 + (i % 7) * 100
                wave = np.where(np.arange(n) % 2 == 0, amp, -amp)
                out.append(
                    {
                        "mime": "audio/wav",
                        "uri": f"synthetic://{i}",
                        "data": synth_wav(wave, sr),
                    }
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": out})

    # no fan_out: synthesis + decode are cheap per row and the scan
    # feeds a single mapInPandas chain — the extra exchange measured
    # SLOWER (0.67 s without vs 1.01 s with at sf0.1, local[32])
    with_media = d.select("doc_id").mapInPandas(
        gen, "doc_id long, media struct<mime:string,uri:string,data:binary>"
    )
    return extract_audio_features(with_media)


_L6D_W, _L6D_H, _L6D_EVERY = 16, 8, 2
# P6 header "P6\n16 8\n255\n" = 12 bytes + 16*8*3 pixel bytes
_L6D_FRAME_BYTES = 12 + _L6D_W * _L6D_H * 3


@register(
    "l6d_video_frame_split",
    oracle=f"""
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST({_L6D_FRAME_BYTES} AS INT) AS frame_n_bytes
        FROM documents,
             LATERAL unnest(generate_series(0, 2 + doc_id % 5)) AS t(i)
        WHERE i % {_L6D_EVERY} = 0
    """,
    tags=("llm", "L6", "multimodal"),
)
def l6d_video_frame_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6 video path — REAL container splitting, closed-form oracle:
    each doc gets a genuine concatenated-netpbm stream (3 + doc_id%5
    P6 frames of 16×8, the format ffmpeg's image2pipe/ppm emits),
    and sample_frames runs the real self-delimiting splitter
    (multimodal.split_netpbm_stream) keeping every 2nd frame. The
    oracle recomputes frame indices and byte sizes analytically, so
    the hash gate pins the splitter's framing arithmetic — not a
    fake chunker (that plumbing twin is l6b). Compressed video stays
    honestly stubbed."""
    import numpy as np
    import pandas as pd

    from feray_spark.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    header = f"P6\n{_L6D_W} {_L6D_H}\n255\n".encode()
    npix = _L6D_W * _L6D_H * 3

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            media = []
            for i in pdf["doc_id"]:
                i = int(i)
                frames = [
                    header + bytes(np.full(npix, (i + f) % 256, dtype=np.uint8))
                    for f in range(3 + i % 5)
                ]
                media.append(
                    {
                        "mime": "video/x-netpbm",
                        "uri": f"synthetic://{i}",
                        "data": b"".join(frames),
                    }
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": media})

    # no fan_out: measured 0.75 s without vs 0.86 s with (sf0.1,
    # local[32]) — frame synthesis is cheap per row and the payloads
    # then re-exchange into sample_frames
    with_media = d.select("doc_id").mapInPandas(
        gen, "doc_id long, media struct<mime:string,uri:string,data:binary>"
    )
    frames = sample_frames(with_media, every=_L6D_EVERY)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bytes").cast("int").alias("frame_n_bytes"),
    )


@register(
    "l8_doc_chunking",
    oracle=f"""
        WITH words_t AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents
                         WHERE len({_WORDS_SQL}) > 0),
        chunks AS (
            SELECT doc_id,
                   CAST(i AS INT) AS chunk_idx,
                   array_to_string(w[(i * 24 + 1):(i * 24 + 32)], ' ')
                       AS chunk_text,
                   CAST(len(w[(i * 24 + 1):(i * 24 + 32)]) AS INT)
                       AS n_tokens
            FROM words_t,
                 LATERAL unnest(generate_series(0,
                     CAST(ceil(greatest(len(w) - 8, 1) / 24.0) AS BIGINT) - 1))
                     AS t(i)
        )
        SELECT doc_id, chunk_idx, chunk_text, n_tokens FROM chunks
    """,
    tags=("llm", "L8", "chunking"),
)
def l8_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline staple beyond the reference surface: split
    each document into overlapping word-window chunks (32-word
    windows, stride 24 → 8-word overlap) — the standard pre-embedding
    chunker. Pure higher-order expressions (sequence → transform →
    slice) exploded JVM-side: no UDF, no Python, chunk text never
    leaves codegen until the explode. One narrow stage, S = 0.
    fan_out measured: 0.38 s with vs 0.45 s without (sf0.1, local[32])."""
    from feray_spark.functions.text import words as words_fn

    d = fan_out(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
    )
    window, stride = 32, 24
    # the shared tokenizer, so this oracle can never desynchronize
    # from _WORDS_SQL behind a private copy
    w = words_fn("text")
    n_chunks = F.greatest(
        F.ceil((F.greatest(F.size("__w") - (window - stride), F.lit(1)))
               / F.lit(float(stride))).cast("int"),
        F.lit(1),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(
                F.slice(F.col("__w"), i * stride + 1, window), " "
            ).alias("chunk_text"),
            F.size(F.slice(F.col("__w"), i * stride + 1, window)).alias(
                "n_tokens"
            ),
        ),
    )
    return (
        d.select("doc_id", w.alias("__w"))
        # zero-word docs (NULL or empty text) chunk to NOTHING on
        # both sides; unguarded, Spark would emit ('' , 0) while
        # DuckDB emits (NULL, 0) — and legacy size(NULL) = -1 would
        # poison n_chunks for NULL texts. The min-length test reads
        # the materialized __w through a FENCED project field (the
        # l20/l12 r9 pattern) — a bare filter(size(__w)) is alias-
        # substituted into the scan and re-tokenizes every row; the
        # pushable isNotNull conjunct stays on the scan above.
        .withColumn("__nw", fence(F.size(F.col("__w")), "int"))
        .filter(F.col("__nw") > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_text").alias("chunk_text"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
    )


@register(
    "l9_deterministic_split",
    oracle="""
        WITH assigned AS (
            SELECT doc_id,
                   ('0x' || substr(md5('split42:' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % 100 AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs
        FROM assigned GROUP BY 1
    """,
    tags=("llm", "L9", "sampling"),
)
def l9_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline staple: deterministic train/val/test
    assignment — bucket = md5-prefix of a salted doc id, 80/10/10.
    Hash-based (never random()): assignments are reproducible across
    runs, engines and cluster topologies, and stable under
    re-partitioning — the property row-level random sampling lacks.
    The md5 basis is engine-portable (the oracle recomputes identical
    buckets), unlike xxhash64/murmur whose seeds differ per engine.
    One narrow projection + tiny aggregate."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        md5_bucket("split42:", "doc_id", 100)
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.select(split.alias("split")).groupBy("split").agg(
        F.count("*").alias("n_docs")
    )


@register(
    "l2e_neardup_clusters",
    oracle=f"""
        WITH RECURSIVE {_bands_cte_sql()},
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        ),
        shsets AS (SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
                   FROM words WHERE len(w) >= 3),
        verified AS (
            SELECT id_a, id_b
            FROM cand JOIN shsets sa ON id_a = sa.doc_id
                      JOIN shsets sb ON id_b = sb.doc_id
            WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                      / len(list_distinct(sa.sh || sb.sh)) >= {JACCARD_T}
        ),
        edges AS (SELECT id_a AS a, id_b AS b FROM verified
                  UNION SELECT id_b, id_a FROM verified),
        reach AS (
            SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        )
        SELECT src AS doc_id, min(dst) AS component
        FROM reach GROUP BY src
    """,
    tags=("llm", "L2", "dedup", "clustering"),
)
def l2e_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 final step: near-duplicate CLUSTERS from the verified
    MinHash pair graph — (doc_id, component) with component = the
    smallest reachable doc id, i.e. the survivor a keep-one-per-
    cluster dedup retains. Distributed min-label propagation
    (operators.dedup.connected_components: one equi-shuffle per
    round, early exit at fixpoint — near-dup graphs are clique-like,
    diameter ≤ 2). The oracle computes the identical components via
    a recursive transitive-closure CTE over the same verified
    pairs."""
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        d,
        "text",
        "doc_id",
        shingle_n=3,
        num_hashes=MH_NUM_HASHES,
        bands=MH_BANDS,
        jaccard_threshold=JACCARD_T,
    )
    from feray_spark.operators.dedup import connected_components

    return connected_components(pairs).select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component")
    )


# --------------------------------------------------- L10/L11 text ops

#: PII patterns shared verbatim by the Spark expressions and the
#: DuckDB oracle — both engines run RE2-compatible syntax, so one
#: pattern string serves Java regex and DuckDB alike.
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "\\+1-[0-9]{3}-[0-9]{4}"


@register(
    "l10_pii_redaction",
    oracle=f"""
        WITH planted AS (
            SELECT doc_id,
                   text || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.com or call +1-555-0142'
                       ELSE '' END AS t
            FROM documents
        ), red AS (
            SELECT doc_id, t,
                   regexp_replace(
                       regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                       '{_PHONE_RE}', '<PHONE>', 'g') AS r
            FROM planted
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(t, '{_PHONE_RE}')) AS BIGINT)
                   AS n_phones,
               CAST(length(r) AS BIGINT) AS redacted_len,
               md5(r) AS redacted_md5
        FROM red
    """,
    tags=("llm", "L10", "pii"),
)
def l10_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10: PII detection + redaction — the compliance pass every
    training-data pipeline runs before anything else. Emails and
    phone numbers are regex-counted and replaced with typed
    placeholder tags; the md5 of the redacted text pins the exact
    output byte-for-byte against the oracle.

    The fixture corpus contains no natural PII, so a deterministic
    contact line is planted for doc_id % 7 == 0 INSIDE the query
    (identically on both engines) — the redaction regexes then have
    real ground truth to hit, and every other doc proves the
    no-false-positive side.

    Scale shape: one projection, zero shuffles — regexp_count /
    regexp_replace / md5 are all JVM-side codegen'd expressions, so
    the pass runs at scan speed and pushes nothing to Python."""
    # fan_out measured: 0.23 s with vs 0.49 s without (sf0.1, local[32])
    d = fan_out(load_table(spark, sf_dir, "documents"))
    planted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call +1-555-0142"),
            ),
        ).otherwise(F.lit("")),
    )
    red = F.regexp_replace(
        F.regexp_replace(planted, F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(_PHONE_RE),
        F.lit("<PHONE>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(planted, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(planted, F.lit(_PHONE_RE)).alias("n_phones"),
        F.length(red).cast("bigint").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )


@register(
    "l11_repetition_signals",
    oracle=f"""
        WITH words AS (
            SELECT doc_id, unnest({_WORDS_SQL}) AS w FROM documents
        ), wc AS (
            SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w
        ), agg AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n_words,
                   COUNT(*) AS n_distinct_words,
                   1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                       AS dup_word_ratio,
                   CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                       AS top_word_share
            FROM wc GROUP BY doc_id
        )
        -- LEFT JOIN from documents: a zero-word doc has no exploded
        -- rows, but the per-row Spark side still emits it (n_words 0,
        -- NULL ratios) — the oracle must emit the same row
        SELECT d.doc_id,
               CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
               CAST(coalesce(a.n_distinct_words, 0) AS BIGINT)
                   AS n_distinct_words,
               a.dup_word_ratio AS dup_word_ratio,
               a.top_word_share AS top_word_share
        FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    tags=("llm", "L11", "quality"),
)
def l11_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11: within-document repetition signals (the Gopher-rules
    family): duplicate-word ratio (1 - distinct/total) and top-word
    dominance (mode frequency / total) — the standard filters for
    boilerplate, keyword stuffing and degenerate generations.

    Scale shape: fully PER-ROW — repetition is a per-document
    statistic, so shuffling every corpus token through a
    (doc_id, word) hash-agg (the obvious explode pipeline) moves
    token-count rows for nothing. Instead the word array is sorted
    in place and the mode frequency read off as the max equal-run
    length via one ``aggregate`` fold; distinct/total come from
    array ops. Zero shuffles, embarrassingly parallel, per-doc cost
    O(len · log len) bounded by the document itself — measured 3×
    faster than the explode shape at sf0.1 and strictly better at
    100 TB (nothing corpus-sized ever exchanges)."""
    from feray_spark.functions.text import words as words_fn

    # fan_out measured: 0.42 s with vs 0.80 s without (sf0.1, local[32])
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # NULL text folds into the zero-word case ((0, 0, NULL, NULL) row)
    # exactly like the oracle's LEFT JOIN — without the coalesce,
    # size(NULL array) would emit -1/NULL counts instead
    w = words_fn(F.coalesce(F.col("text"), F.lit("")))
    sorted_w = F.array_sort(w)
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def merge(acc, x):
        run = F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc.best, run).alias("best")
        )

    top = F.aggregate(sorted_w, init, merge, lambda acc: acc.best)
    return d.select(
        "doc_id",
        F.size(w).cast("bigint").alias("n_words"),
        F.size(F.array_distinct(w)).cast("bigint").alias("n_distinct_words"),
        (F.lit(1.0) - F.size(F.array_distinct(w)) / F.size(w)).alias(
            "dup_word_ratio"
        ),
        (top / F.size(w)).alias("top_word_share"),
    )


_CONTAM_N = 12  # words per probe n-gram (GPT-3-style decontamination uses 13)


@register(
    "l12_contamination_check",
    oracle=f"""
        WITH words AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
        grams AS (
            SELECT doc_id, unnest(list_distinct(
                list_transform(range(1, len(w) - {_CONTAM_N} + 2),
                    i -> list_aggregate(w[i:i+{_CONTAM_N}-1], 'string_agg', ' '))))
                AS g
            FROM words WHERE len(w) >= {_CONTAM_N}
        ),
        probes AS (
            SELECT doc_id AS eval_id,
                   list_aggregate(w[1:{_CONTAM_N}], 'string_agg', ' ') AS g
            FROM words WHERE doc_id % 97 = 0 AND len(w) >= {_CONTAM_N}
        )
        SELECT p.eval_id,
               COUNT(DISTINCT g.doc_id) AS n_docs_containing,
               CAST(MAX(CASE WHEN g.doc_id = p.eval_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS self_hit
        FROM probes p JOIN grams g USING (g)
        GROUP BY p.eval_id
    """,
    tags=("llm", "L12", "dedup", "contamination"),
)
def l12_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12: train/eval contamination check — for every benchmark
    probe (here: the first 12 words of each doc_id % 97 == 0 doc,
    so each probe has guaranteed ground truth in its source doc),
    find every corpus document containing that n-gram. The
    GPT-3-style decontamination pass, word-n-gram variant.

    Scale shape: the PRODUCTION shape for decontamination — the
    benchmark probe set is small by construction (benchmarks are
    MBs; the corpus is the 100 TB side), so probes broadcast and the
    corpus n-gram stream map-side joins against them: the corpus is
    scanned ONCE, nothing corpus-sized ever shuffles, and the only
    exchange is the final tiny per-eval-item aggregate."""
    from feray_spark.functions.text import shingles_from_words
    from feray_spark.functions.text import words as words_fn

    d = load_table(spark, sf_dir, "documents")
    # fan_out measured: 0.69 s with vs 1.14 s without (sf0.1, local[32])
    # min-length filters read the materialized __w through a FENCED
    # project field (the l20 r9 pattern): written as a bare
    # filter(size(words(text))), the tokenizer was alias-substituted
    # into the scan DataFilters on BOTH branches — every document
    # tokenized twice (plan showed 6 canon_lower sites; 4 after).
    # The cheap pushable conjuncts (isNotNull, doc_id % 97) stay
    # below the fence so scan pruning keeps them.
    grams = (
        fan_out(d.filter(F.col("text").isNotNull()))
        .withColumn("__w", words_fn("text"))
        .withColumn("__nw", fence(F.size(F.col("__w")), "int"))
        .filter(F.col("__nw") >= _CONTAM_N)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles_from_words(F.col("__w"), _CONTAM_N))
            ).alias("g"),
        )
    )
    probes = (
        d.filter((F.col("doc_id") % 97 == 0) & F.col("text").isNotNull())
        .withColumn("__w", words_fn("text"))
        .withColumn("__nw", fence(F.size(F.col("__w")), "int"))
        .filter(F.col("__nw") >= _CONTAM_N)
        .select(
            F.col("doc_id").alias("eval_id"),
            F.concat_ws(" ", F.slice("__w", 1, _CONTAM_N)).alias("g"),
        )
    )
    joined = grams.join(F.broadcast(probes), "g")
    return joined.groupBy("eval_id").agg(
        F.countDistinct("doc_id").alias("n_docs_containing"),
        F.max(F.when(F.col("doc_id") == F.col("eval_id"), 1).otherwise(0))
        .cast("bigint")
        .alias("self_hit"),
    )


_PACK_CTX = 2048  # tokens per packed training sequence
_PACK_SHARDS = 32  # deterministic packing shards (parallelism unit)


@register(
    "l13_sequence_packing",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   ('0x' || substr(md5('pack13:' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % {_PACK_SHARDS} AS shard,
                   len({_WORDS_SQL}) AS n_tokens
            FROM documents
        ), packed AS (
            SELECT shard, n_tokens,
                   CAST(floor((SUM(n_tokens) OVER (
                            PARTITION BY shard ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        - n_tokens) / {_PACK_CTX}) AS BIGINT) AS pack_id
            FROM toks
        )
        SELECT shard, pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY shard, pack_id
    """,
    tags=("llm", "L13", "packing"),
)
def l13_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L13: sequence packing — assign every document to a fixed-size
    training context window (concat-and-split packing: documents are
    concatenated in a deterministic order and cut every ``_PACK_CTX``
    tokens; a document belongs to the pack holding its first token).
    The step that turns a filtered corpus into trainer-ready rows.

    Scale shape: packing needs a total order, and a single global
    ORDER BY is the one window Spark cannot parallelize — so the
    corpus is first split into ``_PACK_SHARDS`` deterministic
    md5-bucket shards and packed independently per shard (exactly how
    a real pretraining pipeline shards its data files). The running
    token count is then a PARTITIONED window — every shard packs in
    parallel, one shuffle on the shard id, and the shard count (not
    the corpus size) bounds the serial work. Assignments are
    hash-derived, so stable across runs, engines and repartitioning.
    """
    d = load_table(spark, sf_dir, "documents")
    shard = (
        md5_bucket("pack13:", "doc_id", _PACK_SHARDS)
    )
    toks = d.select(
        "doc_id", shard.alias("shard"), token_count("text").alias("n_tokens")
    )
    w = (
        W_llm.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W_llm.unboundedPreceding, W_llm.currentRow)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / _PACK_CTX),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


@register(
    "l14_quality_weighted_sample",
    oracle=f"""
        SELECT doc_id, lang, source, {_QUALITY_SQL} AS quality
        FROM documents
        WHERE ('0x' || substr(md5('sample7:' || CAST(doc_id AS VARCHAR)),
                   1, 8))::BIGINT % 1000000
              < {_QUALITY_SQL} * 1000000.0
    """,
    tags=("llm", "L14", "sampling"),
)
def l14_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L14: quality-weighted corpus sampling — keep each document
    with probability equal to its quality score (the CCNet/refined-web
    pattern: low-quality text is downsampled, not hard-dropped, so
    the trained model still sees some of the distribution's tail).

    Hash-acceptance, never ``rand()``: the acceptance draw is an
    md5-derived uniform in [0,1) per doc id, so the SAMPLE ITSELF is
    reproducible across runs, engines and cluster topologies, and a
    re-run after adding documents keeps every previous decision (the
    property random sampling lacks, and the reason every production
    pipeline samples by hash). One narrow projection + filter, zero
    shuffles. fan_out measured: 0.70 s with vs 0.99 s without
    (sf0.1, local[32]) — the quality expression is regex-heavy per
    row.

    The draw column carries a :func:`~feray_spark.queries.util.fence`
    so the acceptance filter stays ABOVE the projection: pushed into
    the scan filter the quality tree re-evaluates once per reference
    per row (filter predicates get no codegen CSE — the plan showed
    7 canon_lower chains), and the md5 draw is unusable for row-group
    skipping anyway, so the fence costs nothing. Measured:
    1.01 -> 0.37 s median at sf0.1 (rebuilt DataFrame per run)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    u = md5_bucket("sample7:", "doc_id", 1_000_000)
    q = quality_score("text")
    return (
        d.select(
            "doc_id", "lang", "source",
            q.alias("quality"), fence(u, "bigint").alias("__u"),
        )
        .filter(F.col("__u") < F.col("quality") * 1_000_000.0)
        .drop("__u")
    )


_SOURCE_CAP = 20  # max docs kept per source


@register(
    "l15_source_cap",
    oracle=f"""
        SELECT doc_id, source, rn FROM (
            SELECT doc_id, source,
                   ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY {_QUALITY_SQL} DESC, doc_id) AS rn
            FROM documents) t
        WHERE rn <= {_SOURCE_CAP}
    """,
    tags=("llm", "L15", "dedup", "sampling"),
)
def l15_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L15: per-source document cap — keep the ``_SOURCE_CAP``
    highest-quality documents per source/domain. The domain-balancing
    pass every web-scale corpus runs so a handful of boilerplate-heavy
    domains can't dominate the training mix (the C4/RefinedWeb
    "domain cap").

    Scale shape: one window partitioned by source — shuffles on the
    domain key only, parallel across domains. The ``rn <= cap``
    filter triggers Spark's WindowGroupLimit rule (plan-asserted:
    Partial BEFORE the exchange, Final after), so each scan partition
    pre-cuts to ``cap`` rows per domain before anything shuffles —
    the mega-domain skew case (one domain = billions of rows) moves
    at most cap × partitions rows for that domain, not the domain.
    Deterministic tie-break (quality desc, doc_id) so the kept set is
    reproducible. fan_out (r10): the 64× probe corpus arrives as ONE
    47 MB file = one scan partition, serializing the quality regex +
    pre-cut sort on one core — 17.3 → 2.4 s with the spread
    (noop-write interleaved A/B, scripts/fanout_64x_ab.py),
    sf0.1-neutral (0.52/0.52 s), no-op at 100 TB where the scan
    carries thousands of splits."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    w = W_llm.partitionBy("source").orderBy(
        quality_score("text").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _SOURCE_CAP)
        .select("doc_id", "source", "rn")
    )


@register(
    "l16_unigram_logprob",
    oracle=f"""
        WITH toks AS (SELECT doc_id, unnest({_WORDS_SQL}) AS token
                      FROM documents),
        tf AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
               FROM toks GROUP BY token),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tf)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               ROUND(AVG(ln(c::DOUBLE / t)), 6) AS avg_logprob
        FROM toks JOIN tf USING (token) CROSS JOIN tot
        GROUP BY doc_id
    """,
    tags=("llm", "L16", "quality"),
)
def l16_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L16: unigram language-model score — per-document mean token
    log-probability under the corpus's own unigram distribution (the
    CCNet-style LM quality signal: gibberish and boilerplate score
    far from the corpus mode; a KenLM-grade model drops into the
    same dataflow with the tf table swapped for its vocab).

    Scale shape: two passes. Pass 1 builds the term-frequency table —
    explode + hash-agg on token, where map-side partial aggregation
    collapses each partition to its vocabulary before the ONLY
    corpus-sized shuffle. Pass 2 re-explodes and BROADCASTS the tf
    table onto the token stream (web-scale vocab follows Zipf: ~10M
    types ≈ a few hundred MB — broadcastable; an unbounded vocab
    falls back to a shuffle join on token), then per-doc aggregation
    partial-aggregates map-side because exploded tokens stay inside
    their document's partition. The corpus total is attached as a
    global window over the VOCAB-SIZED tf table (a single-partition
    exchange of vocab rows — the identical boundedness assumption the
    broadcast already makes), so the explode+agg lineage is computed
    ONCE, not re-derived for a separate total aggregation. Output
    rounded to 6 dp: the per-token terms are IEEE-identical across
    engines, but summation order inside AVG is not — rounding removes
    the ~1e-13 association noise."""
    from feray_spark.functions.text import words as words_fn

    # fan_out (r10, reversing the r7 sf0.1-only call of 0.72-vs-1.02 s
    # that did not reproduce): both lineages (tf build + scoring)
    # re-tokenize the corpus, and on the 64× probe's one-file scan
    # that work serialized on one core — 35.5 → 4.4 s with the spread
    # (noop-write interleaved A/B, scripts/fanout_64x_ab.py),
    # sf0.1-neutral now (1.00/0.94 s), no-op at 100 TB. The two
    # consumers share the repartition exchange (ReusedExchange), so
    # the text ships once.
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(words_fn("text")).alias("token")
    )
    tf = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("c"))
    tfw = tf.withColumn("t", F.sum("c").over(W_llm.partitionBy()).cast("bigint"))
    scored = toks.join(F.broadcast(tfw), "token")
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tokens"),
        F.round(F.avg(F.log(F.col("c").cast("double") / F.col("t"))), 6).alias(
            "avg_logprob"
        ),
    )


_MIX_BUDGET_FRAC = 0.5  # token budget as a fraction of the corpus


@register(
    "l17_mixture_sampling",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source,
                   ('0x' || substr(md5('mix17:' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % 1000000 AS u,
                   len({_WORDS_SQL}) AS n_tok
            FROM documents
        ), per_src AS (
            -- TRY_CAST + coalesce: a source id without a numeric
            -- suffix must yield a defined weight (DuckDB's plain
            -- CAST raises where Spark's returns NULL)
            SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens,
                   1 + coalesce(TRY_CAST(trunc({sql_portable_double(
                           "substr(source, 4)")}) AS INT), 0) % 5
                       AS w_raw
            FROM tok GROUP BY source
        ), tot AS (
            SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
                   CAST(SUM(w_raw) AS BIGINT) AS total_w
            FROM per_src
        ), ratios AS (
            SELECT source, src_tokens,
                   least(1.0, ((CAST(w_raw AS DOUBLE) / total_w)
                       * ({_MIX_BUDGET_FRAC} * total_tokens)) / src_tokens)
                       AS keep_ratio
            FROM per_src CROSS JOIN tot
        )
        SELECT t.source,
               COUNT(*) AS n_docs_kept,
               CAST(SUM(t.n_tok) AS BIGINT) AS tokens_kept,
               ROUND(MIN(r.keep_ratio), 9) AS keep_ratio
        FROM tok t JOIN ratios r USING (source)
        WHERE t.u < r.keep_ratio * 1000000.0
        GROUP BY t.source
    """,
    tags=("llm", "L17", "sampling"),
)
def l17_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L17: data-mixture sampling — resample every source toward
    declared mixture weights under a global token budget (the
    Pile/DoReMi pretraining step: per-source acceptance ratio =
    min(1, weight-share of budget / source tokens), then a
    reproducible hash draw per document). Weights here derive from
    the source id so the oracle computes them identically.

    Determinism: the acceptance threshold is a double computed with
    IDENTICAL operation order on both engines (weight/total, times
    budget, over source tokens), the draw is an exact md5 rational,
    and both sides of the comparison are bit-equal — so even the
    boundary documents match exactly.

    Scale shape: two passes over a two-column projection of the
    corpus. Pass 1 aggregates per-source token counts (shuffle of
    #sources rows); the ratio table (#sources rows) then BROADCASTS
    onto pass 2's scan, the acceptance filter runs scan-side, and
    the summary agg shuffles #sources rows again. Nothing
    document-sized ever exchanges, and the same plan serves the
    keep-the-rows variant (drop the final agg)."""
    d = load_table(spark, sf_dir, "documents")
    u = (
        md5_bucket("mix17:", "doc_id", 1_000_000)
    )
    # no fan_out: the scan feeds two lineages (stats + filter) and
    # per-row work is one md5 — the extra exchange measured SLOWER
    # (0.77 s without vs 1.12 s with at sf0.1, local[32])
    tok = d.select(
        "doc_id", "source", u.alias("u"), token_count("text").alias("n_tok")
    )
    # weight suffix routes through the GRAMMAR-GUARDED double parse
    # then trunc → INT on BOTH sides (util.portable_double +
    # trunc_int32, the f_json_family discipline): Spark's direct
    # string→int cast truncates '3.7' to 3 and rejects '1e3' where
    # DuckDB's TRY_CAST rounds to 4 and accepts, and the bare double
    # casts themselves diverge outside the shared grammar ('1.5d'
    # parses only on Spark, '1_000' only on DuckDB).
    from feray_spark.queries.util import portable_double, trunc_int32

    w_raw = (
        1
        + F.coalesce(
            trunc_int32(portable_double(F.expr("substring(source, 4)"))),
            F.lit(0),
        )
        % 5
    )
    per_src = tok.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("src_tokens")
    ).withColumn("w_raw", w_raw)
    tot = per_src.agg(
        F.sum("src_tokens").cast("bigint").alias("total_tokens"),
        F.sum("w_raw").cast("bigint").alias("total_w"),
    )
    ratios = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            (
                (F.col("w_raw").cast("double") / F.col("total_w"))
                * (F.lit(_MIX_BUDGET_FRAC) * F.col("total_tokens"))
            )
            / F.col("src_tokens"),
        ).alias("keep_ratio"),
    )
    kept = tok.join(F.broadcast(ratios), "source").filter(
        F.col("u") < F.col("keep_ratio") * 1_000_000.0
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs_kept"),
        F.sum("n_tok").cast("bigint").alias("tokens_kept"),
        F.round(F.min("keep_ratio"), 9).alias("keep_ratio"),
    )


@register(
    "l18_incremental_dedup",
    oracle="""
        SELECT doc_id,
               CAST(doc_id % 2 AS BIGINT) AS ingest_batch
        FROM (
            -- NULL texts are not duplicates of each other (the l1 /
            -- exact_dedup coalesce rule): key each on its own id
            SELECT doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY coalesce(sha256(text),
                                    '__null__' || CAST(doc_id AS VARCHAR))
                       ORDER BY (doc_id % 2), doc_id) AS rn
            FROM documents) t
        WHERE rn = 1
    """,
    tags=("llm", "L18", "dedup"),
)
def l18_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L18: incremental corpus ingestion — dedup NEW batches against
    everything already accepted, the way a production corpus is
    actually built (it arrives in crawls, not at once). Two batches
    (even doc ids, then odd) really flow through a persistent
    content-hash index in the table store: each batch dedups within
    itself, left-anti-joins the stored index, appends its survivors,
    and commits its hashes. The oracle states the END-TO-END
    invariant instead of replaying the mechanics: incremental
    ingestion must equal global first-seen dedup (winner = earliest
    batch, then lowest id) — so a hash match proves the state
    round-trip through the store, not just the plan.

    Scale shape: the hash index is the ONLY state — 32-byte sha256
    rows, O(distinct docs), uniform by construction. Per batch: one
    within-batch dedup shuffle on the hash, one anti-join shuffle
    against the index (bloom-prunable — the runtime-filter plan
    test), one append. Nothing text-sized persists; the index append
    is idempotent per batch for exactly-once re-runs."""
    from feray_spark.queries.util import scratch_store

    store, root = scratch_store("l18_store", sf_dir)
    d = load_table(spark, sf_dir, "documents")

    first = True
    for batch_tag in (0, 1):
        batch = d.filter(F.col("doc_id") % 2 == batch_tag)
        accepted = exact_dedup(batch, "text", "doc_id").select(
            "doc_id",
            F.sha2(F.col("text"), 256).alias("h"),
            F.lit(batch_tag).cast("bigint").alias("ingest_batch"),
        )
        if not first:
            seen = store.read(spark, "hash_index")
            accepted = accepted.join(seen, "h", "left_anti")
        store.write(
            accepted.select("h"),
            "hash_index",
            mode="overwrite" if first else "append",
        )
        store.write(
            accepted.select("doc_id", "ingest_batch"),
            "accepted_docs",
            mode="overwrite" if first else "append",
        )
        first = False
    return store.read(spark, "accepted_docs")


def _l18b_oracle_sql() -> str:
    """DuckDB twin of l18b's pessimistic two-batch rule. The rule is
    NOT recursive for a fixed batch count: batch 0's accepted set is a
    plain anti-join (the pessimistic in-batch rule never consults
    acceptance), and batch 1 references only that closed set — so the
    whole replay is two stacked CTE levels, the same reason l18's
    invariant was SQL-expressible. Signatures are the md5-affine
    family (8 hashes, 4 bands of 2), bit-for-bit the Spark build."""
    nh, bands, rows = 8, 4, 2
    need = 4  # est >= 0.5 over 8 positions → ≥4 equal minhashes
    mh = ", ".join(f"{_minhash_sql(j)} AS mh{j}" for j in range(nh))
    band_rows = "\n            UNION ALL ".join(
        "SELECT doc_id, doc_id % 2 AS bt, {b} AS band_idx, "
        "md5(concat_ws('|', {parts})) AS band_hash FROM sigs".format(
            b=b, parts=", ".join(f"mh{b * rows + r}" for r in range(rows))
        )
        for b in range(bands)
    )
    eq = " + ".join(f"CAST(sa.mh{j} = sb.mh{j} AS INT)" for j in range(nh))
    return f"""
        WITH words_t AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents),
        shingled AS (SELECT doc_id, {_SHINGLES_SQL} AS sh
                     FROM words_t WHERE len(w) >= 3),
        xs AS (SELECT doc_id, list_transform(sh, s ->
                   ('0x' || substr(md5(s), 1, 12))::BIGINT % {MINHASH_P}) AS xs
               FROM shingled),
        sigs AS (SELECT doc_id, {mh} FROM xs),
        banded AS ({band_rows}),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, a.bt AS bt_a,
                        b.doc_id AS id_b, b.bt AS bt_b
                 FROM banded a JOIN banded b
                   ON a.band_idx = b.band_idx
                  AND a.band_hash = b.band_hash
                  AND a.doc_id <> b.doc_id),
        ver AS (SELECT c.id_a, c.bt_a, c.id_b, c.bt_b
                FROM cand c JOIN sigs sa ON c.id_a = sa.doc_id
                            JOIN sigs sb ON c.id_b = sb.doc_id
                WHERE {eq} >= {need}),
        drop0 AS (SELECT DISTINCT id_a FROM ver
                  WHERE bt_a = 0 AND bt_b = 0 AND id_b < id_a),
        acc0 AS (SELECT doc_id FROM sigs WHERE doc_id % 2 = 0
                 AND doc_id NOT IN (SELECT id_a FROM drop0)),
        drop1 AS (SELECT DISTINCT id_a FROM ver
                  WHERE bt_a = 1 AND (
                        (bt_b = 1 AND id_b < id_a)
                     OR (bt_b = 0 AND id_b IN (SELECT doc_id FROM acc0))))
        SELECT doc_id, CAST(0 AS BIGINT) AS ingest_batch FROM acc0
        UNION ALL
        SELECT doc_id, CAST(1 AS BIGINT) AS ingest_batch FROM sigs
        WHERE doc_id % 2 = 1
          AND doc_id NOT IN (SELECT id_a FROM drop1)
    """


@register(
    "l18b_incremental_neardup",
    oracle=_l18b_oracle_sql(),
    tags=("llm", "L18", "L2", "dedup"),
)
def l18b_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L18b: incremental NEAR-dup ingestion — L18's stateful shape,
    but the index holds MinHash SIGNATURES instead of content hashes,
    so each new crawl batch drops fuzzy duplicates of everything
    already accepted without the corpus text ever persisting or
    re-scanning. Per batch (pessimistic one-pass rule, documented):
    a doc is dropped iff some smaller-id same-batch doc OR some
    indexed doc collides in ≥1 LSH band AND the signature-estimated
    Jaccard (fraction of equal minhash positions — the standard
    estimator) is ≥ 0.5; survivors append their (id, signature,
    bands) to the index. Pessimistic = the smaller-id doc counts
    even if it was itself dropped: never keeps a dup, may drop a
    chain member a sequential greedy would keep — the standard
    trade for a one-pass distributed rule.

    Scale shape: state is O(accepted) × (8 longs + 4 band rows) —
    vectors, never text; per batch ONE signature pass (explode →
    hash-agg), one band-keyed equi-join against the index, one
    in-batch band aggregation, and bounded-size appends. The
    estimator needs no text round-trip, which is what makes the
    INDEX (not the corpus) the only long-lived state at 100 TB."""
    from feray_spark.operators.dedup import band_hash_array, minhash_signatures
    from feray_spark.queries.util import scratch_store

    NUM_HASHES, BANDS, TAU = 8, 4, 0.5
    store, root = scratch_store("l18b_store", sf_dir)
    d = load_table(spark, sf_dir, "documents")

    def est(a_sig, b_sig):
        eq = F.zip_with(a_sig, b_sig, lambda x, y: x == y)
        return F.size(F.filter(eq, lambda v: v)) / F.lit(NUM_HASHES)

    first = True
    for batch_tag in (0, 1):
        batch = d.filter(F.col("doc_id") % 2 == batch_tag)
        sigs = minhash_signatures(
            batch, "text", "doc_id", num_hashes=NUM_HASHES
        )
        bands = sigs.select(
            "doc_id",
            "sig",
            F.posexplode(
                band_hash_array("sig", num_hashes=NUM_HASHES, bands=BANDS)
            ).alias("band_idx", "band_hash"),
        )
        # in-batch collisions: larger id drops on a verified smaller id
        in_pairs = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("b.doc_id") < F.col("a.doc_id")),
            )
            .filter(est(F.col("a.sig"), F.col("b.sig")) >= TAU)
            .select(F.col("a.doc_id").alias("doc_id"))
        )
        dropped = in_pairs
        if not first:
            idx = store.read(spark, "nd_bands").alias("i")
            vs_index = (
                bands.alias("a")
                .join(
                    idx,
                    (F.col("a.band_idx") == F.col("i.band_idx"))
                    & (F.col("a.band_hash") == F.col("i.band_hash")),
                )
                .filter(est(F.col("a.sig"), F.col("i.sig")) >= TAU)
                .select(F.col("a.doc_id").alias("doc_id"))
            )
            dropped = dropped.unionByName(vs_index)
        accepted = sigs.join(dropped, "doc_id", "left_anti").select(
            "doc_id", "sig", F.lit(batch_tag).cast("bigint").alias("ingest_batch")
        )
        acc_bands = accepted.select(
            "doc_id",
            "sig",
            F.posexplode(
                band_hash_array("sig", num_hashes=NUM_HASHES, bands=BANDS)
            ).alias("band_idx", "band_hash"),
        ).select("doc_id", "band_idx", "band_hash", "sig")
        store.write(
            acc_bands, "nd_bands", mode="overwrite" if first else "append"
        )
        store.write(
            accepted.select("doc_id", "ingest_batch"),
            "accepted_docs",
            mode="overwrite" if first else "append",
        )
        first = False
    return store.read(spark, "accepted_docs")


@register(
    "l19_fuzzy_blocked_pairs",
    oracle="""
        WITH b AS (
            SELECT doc_id, lang,
                   substr(text, 1, 24) AS pfx,
                   substr(text, 1, 80) AS head
            FROM documents
        )
        SELECT x.doc_id AS id_a, y.doc_id AS id_b,
               CAST(levenshtein(x.head, y.head) AS BIGINT) AS edit_dist
        FROM b x JOIN b y
          ON x.lang = y.lang AND x.pfx = y.pfx AND x.doc_id < y.doc_id
        WHERE levenshtein(x.head, y.head) <= 20
    """,
    tags=("llm", "L19", "dedup"),
)
def l19_fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L19 (beyond the brief): fuzzy near-duplicate pairs by EDIT
    DISTANCE under blocking — the record-linkage workhorse for typo-
    grade duplicates that hash-based dedup (L1) misses and shingle
    methods (L2/L2c) over-segment: block on (lang, 24-char prefix),
    compare candidates by Levenshtein over the 80-char head, keep
    pairs within distance 20.

    Scale shape: the O(n²) comparison NEVER materializes — the block
    self-join shuffles once on the (lang, prefix) block key and edit
    distance (a JVM built-in, quadratic in the CAPPED head length
    only) runs on Σ C(block_size, 2) candidate pairs. Blocking
    choice is the recall/cost dial: longer prefixes → smaller blocks
    → fewer candidates (miss pairs differing in the first chars);
    production stacks add a second pass blocked on a suffix or a
    sorted-token key to recover prefix-divergent pairs — same plan,
    different key. Degenerate mega-blocks (empty prefix, boilerplate
    headers) are the L2c ``max_df`` stop-shingle situation: cap or
    drop blocks past a bound before the join."""
    d = load_table(spark, sf_dir, "documents")
    b = d.select(
        "doc_id",
        "lang",
        F.substring("text", 1, 24).alias("pfx"),
        F.substring("text", 1, 80).alias("head"),
    )
    x, y = b.alias("x"), b.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.lang") == F.col("y.lang"))
            & (F.col("x.pfx") == F.col("y.pfx"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("x.head"), F.col("y.head")).cast("bigint"),
        )
        .filter(F.col("edit_dist") <= 20)
    )
    return pairs.select(
        F.col("x.doc_id").alias("id_a"),
        F.col("y.doc_id").alias("id_b"),
        "edit_dist",
    )


_LINE_W = 8  # tokens per span for the span-dedup query


@register(
    "l20_span_dedup",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_WORDS_SQL} AS w FROM documents
                      WHERE len({_WORDS_SQL}) > 0),
        chunks AS (
          SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos,
                 array_to_string(
                     w[(pos-1)*{_LINE_W}+1 : (pos-1)*{_LINE_W}+{_LINE_W}],
                     ' ') AS chunk
          FROM toks,
               UNNEST(range(1, greatest(CAST(ceil(len(w)/{_LINE_W}.0)
                   AS BIGINT), 1) + 1)) AS t(pos)
        ),
        kept AS (
          SELECT doc_id, pos, chunk,
                 ROW_NUMBER() OVER (PARTITION BY chunk
                                    ORDER BY doc_id, pos) = 1 AS keep
          FROM chunks
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_kept,
               md5(string_agg(CASE WHEN keep THEN chunk END,
                   ' ' ORDER BY pos)) AS kept_md5
        FROM kept GROUP BY doc_id
    """,
    tags=("llm", "L20", "dedup"),
)
def l20_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L20 (beyond the brief): duplicated-SPAN removal — the
    C4/RefinedWeb cleaning step that exact-doc dedup (L1) cannot do:
    a span (here: an ``_LINE_W``-token (8) window; a line/3-sentence
    span in prose corpora) repeated ANYWHERE in the corpus is
    removed from every document except its first occurrence
    (winner = smallest (doc_id, position)), and each document is
    reassembled from its surviving spans in order. Output per doc:
    span counts + an md5 of the reassembled text, so the oracle
    hash-checks the exact surviving content.

    Scale shape: two key-shuffles — explode to spans (map-side),
    ONE rank window on the span key marks first occurrences (the
    winner is defined by the composite (doc_id, pos) sort order, so
    it cannot collide at any document size), then the per-doc
    reassembly agg. A boilerplate mega-span (cookie banners) is one
    hot window key — operators.dedup.span_first_occurrence_flags'
    ``max_span_df`` valve diverts spans past the bound to an
    AQE-splittable aggregate/join path with identical semantics
    (valve off here: the fixtures are skew-free, and one oracle
    covers both physical paths — tests/test_llm.py asserts the
    valve path's output equality on a planted mega-span)."""
    from feray_spark.functions.text import words as words_fn

    d = load_table(spark, sf_dir, "documents")
    # zero-word docs (NULL/empty text) have no spans — absent from
    # the output on both sides. Unfiltered, Spark manufactures a ''
    # chunk (array_join of an empty slice) where DuckDB manufactures
    # NULL, and NULL chunks from DIFFERENT docs would share one
    # dedup partition — three divergences from one degenerate row.
    # The cheap pushable conjunct (text IS NOT NULL) goes BELOW at
    # the scan; the tokenizing part reads the materialized __w ABOVE
    # the projection through a FENCED PROJECT FIELD (__nw). The fence
    # must be in the projection, not the predicate: Spark's
    # PushPredicateThroughNonJoin Project case gates on the project
    # FIELDS' determinism and pushes the condition wholesale — a
    # fenced predicate over a deterministic projection still gets the
    # alias substituted back and pushed to the scan (measured here:
    # the tokenizer re-appeared inline in the pushed Filter), which
    # was the round-8 ADVICE residual: 2x per-row tokenization.
    # Interleaved A/B vs the old scan-level size(words(text))>0 form
    # (sf0.1, local[32], rebuilt per run): 0.93 -> 0.85 s median,
    # and the plan's canon_lower site count drops 2 -> 1.
    d = d.filter(F.col("text").isNotNull())
    # fan_out measured: 0.85-1.01 s vs 1.08-1.17 s without (sf0.1,
    # local[32]) — the tokenize+explode is CPU-bound while the
    # fixture scan yields only 3 partitions.
    # __w materialized ONCE per doc (the l31 projection pattern):
    # inlined, the canon_lower+split tokenizer re-ran inside the
    # explode lambda — once per SPAN, K+1 tokenizations per doc
    # (the round-8 audit's only Generate-node hit; 1.04 -> 0.82 s
    # median at sf0.1, back-to-back sessions).
    base = (
        fan_out(d)
        .withColumn("__w", words_fn("text"))
        .withColumn("__nw", fence(F.size(F.col("__w")), "int"))
        .filter(F.col("__nw") > 0)
    )
    n = F.greatest(
        F.ceil(F.size(F.col("__w")) / F.lit(_LINE_W)), F.lit(1)
    ).cast("int")
    spans = base.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 1),
                lambda i: F.struct(
                    i.cast("bigint").alias("pos"),
                    F.array_join(
                        F.slice(F.col("__w"), i * _LINE_W + 1, _LINE_W), " "
                    ).alias("chunk"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.chunk").alias("chunk"))
    # default valve-off path = the plain rank window; operators.dedup
    # .span_first_occurrence_flags carries the max_span_df hot-span
    # valve (agg-path winner for boilerplate mega-spans) with
    # identical semantics — this oracle covers both physical paths
    # unique_rows: (doc_id, pos) is unique by construction (pos
    # enumerates each doc's span sequence once), so a valve-on run
    # takes the window-free hot path (operators/dedup.py)
    kept = span_first_occurrence_flags(spans, unique_rows=True)
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_chunks"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        # NULL (not md5('')) when every span was removed: the
        # oracle's string_agg over zero kept chunks aggregates to
        # NULL — array_join would emit md5('') instead (zero-word
        # docs never reach here; they are filtered on both sides)
        F.when(
            F.sum(
                F.when(F.col("keep") & F.col("chunk").isNotNull(), 1).otherwise(0)
            )
            > 0,
            F.md5(
                F.array_join(
                    F.transform(
                        F.filter(
                            F.array_sort(
                                F.collect_list(F.struct("pos", "keep", "chunk"))
                            ),
                            lambda x: x["keep"],
                        ),
                        lambda x: x["chunk"],
                    ),
                    " ",
                )
            ),
        ).alias("kept_md5"),
    )


@register(
    "l21_embedding_outliers",
    oracle="""
        WITH dims AS (
            SELECT label, i AS d, CAST(embedding[i] AS DOUBLE) AS x
            FROM embeddings,
                 UNNEST(range(1, len(embedding) + 1)) t(i)
        ),
        cent AS (
            SELECT label, d, ROUND(AVG(x), 9) AS m
            FROM dims GROUP BY label, d
        ),
        carr AS (
            SELECT label, list(m ORDER BY d) AS c FROM cent GROUP BY label
        ),
        scored AS (
            SELECT e.vec_id, e.label,
                   list_reduce(list_transform(list_zip(e.embedding, a.c),
                       p -> CAST(p[1] AS DOUBLE) * p[2]),
                       (acc, x) -> acc + x)
                   / (sqrt(list_reduce(list_transform(e.embedding,
                          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                          (acc, x) -> acc + x))
                      * sqrt(list_reduce(list_transform(a.c, x -> x * x),
                          (acc, x) -> acc + x))) AS cosine
            FROM (SELECT * FROM embeddings
                  WHERE len(embedding) > 0) e
            JOIN carr a USING (label)
        )
        SELECT label, vec_id,
               ROUND(cosine, 6) AS cos_centroid, rank
        FROM (SELECT label, vec_id, cosine,
                     -- NULLS LAST pinned on both sides: a vector
                     -- with a NULL element slips past the len()>0
                     -- guard, scores a NULL cosine on BOTH engines,
                     -- and Spark's bare ASC would seat it at rank 1
                     -- while DuckDB ranks it last
                     ROW_NUMBER() OVER (PARTITION BY label
                         ORDER BY cosine ASC NULLS LAST, vec_id)
                         AS rank
              FROM scored) t
        WHERE rank <= 5
    """,
    tags=("llm", "L21", "similarity", "quality"),
)
def l21_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L21 (beyond the brief): embedding outlier detection — the 5
    vectors LEAST similar to their own label's centroid, per label
    (the curation step behind CLIP-score-style filtering: items far
    from their cluster center are mislabeled/noise candidates for
    human review, FS6's annotation queue).

    Determinism across engines: the per-dimension centroid mean is
    rounded to 9 dp on BOTH sides (summation order differs between
    engines; the round collapses the ~1e-15 association drift), after
    which every downstream value — sequential-fold dot, norms,
    cosine — is computed bit-identically, so even the RANKING
    matches without a rounding hedge (the L3 fold-parity pattern).

    Scale shape: centroids are one explode + hash-agg (labels×dims
    rows after map-side combine — KB-sized for any corpus), re-packed
    to arrays and BROADCAST onto the corpus scan; scoring is a
    zero-shuffle codegen projection, and only the per-label bottom-5
    rank shuffles (WindowGroupLimit pre-cuts partitions)."""
    # no fan_out: the scan feeds two lineages (centroid build +
    # scoring) and an extra round-robin exchange on both measured
    # SLOWER (0.93-0.97 s vs 0.50-0.74 s at sf0.1, local[32])
    d = load_table(spark, sf_dir, "embeddings")
    dims = d.select(
        "label", F.posexplode("embedding").alias("d", "x")
    ).groupBy("label", "d").agg(
        F.round(F.avg(F.col("x").cast("double")), 9).alias("m")
    )
    carr = dims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "m"))), lambda s: s["m"]
        ).alias("c")
    )
    from feray_spark.functions.vectors import cosine_similarity
    from feray_spark.operators.similarity import drop_invalid_vecs

    # NULL/empty vectors have no defined centroid cosine — they are
    # invalid inputs (FS5 null-rate territory), not "outliers", and
    # Spark's NULLS-FIRST ASC rank would otherwise seat them in the
    # bottom-5 while the oracle's fold RAISES on the empty list
    scored = drop_invalid_vecs(d, "embedding").join(
        F.broadcast(carr), "label"
    ).withColumn("cosine", cosine_similarity("embedding", "c"))
    w = W_llm.partitionBy("label").orderBy(
        F.col("cosine").asc_nulls_last(), "vec_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "label",
            "vec_id",
            F.round("cosine", 6).alias("cos_centroid"),
            # BIGINT like the oracle's ROW_NUMBER (the l15 discipline)
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


@register(
    "l22_bpe_tokens",
    oracle=f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len({_WORDS_SQL})) AS BIGINT) AS ws_tokens,
               TRUE AS bpe_bounds_ok,
               TRUE AS roundtrip_ok
        FROM documents GROUP BY source
    """,
    tags=("llm", "L22", "tokenizer"),
)
def l22_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L22 (beyond the brief): REAL subword token accounting — learn
    a BPE vocabulary from the corpus (40 merges) and audit the
    encoder per source. This is the machinery every token-budget
    decision (L13 packing, L17 mixture, pretraining cost) actually
    needs; whitespace counts (L4) are a proxy.

    FULL invariant oracle (promoted round 10, the a3b/a5/l5b
    pattern): the learned merge ids are engine-specific, so the raw
    BPE totals can't hash cross-engine — but the hashed row
    (source, n_docs, ws_tokens, bpe_bounds_ok, roundtrip_ok) is a
    real cross-engine contract: doc and whitespace-token counts
    cross-check exactly (the l4 twin pair), and each boolean is
    computed GENUINELY Spark-side over every encoded word —
    1 <= len(encode(w)) <= len(w)+1, and concat(encode(w)) == w+EOW
    (decode-is-concat, the reconstruction property) — then pinned
    TRUE in SQL. Raw per-doc BPE counts remain available via
    functions.bpe.bpe_token_count (unit-tested on the classic corpus
    incl. trainer determinism, tests/test_llm.py::TestBPE).

    Scale shape (functions/bpe.py): ONE corpus-sized pass builds the
    word-type table (map-side combine), collected under a HARD
    top-k cap (never trust Zipf against web garbage); merge learning
    runs on the weighted TYPE table (driver, O(types × merges) — the
    standard trainer layout, never corpus-sized); application
    broadcasts the merge ranks and encodes per Arrow batch with a
    word cache, zero shuffle beyond the final per-source rollup."""
    from feray_spark.functions.bpe import bpe_invariants, learn_bpe, word_types

    d = load_table(spark, sf_dir, "documents")
    # hard-capped driver collect (functions/bpe.py word_types): top
    # 200k types by frequency — far above the fixtures' vocabulary
    # (result-identical here) and a bounded heap-top-k at 100 TB
    types = word_types(d, "text", max_types=200_000)
    merges = learn_bpe(types, n_merges=40)
    scored = d.select(
        "source",
        token_count("text").alias("ws_tokens"),
        bpe_invariants("text", merges).alias("inv"),
    )
    # coalesce-to-TRUE: every() skips NULL (NULL-text) rows and is
    # NULL on an all-NULL group, where the oracle's pinned TRUE must
    # still match (the a5 empty-input discipline)
    return scored.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").cast("bigint").alias("ws_tokens"),
        F.coalesce(F.every(F.col("inv.bounds_ok")), F.lit(True)).alias(
            "bpe_bounds_ok"
        ),
        F.coalesce(F.every(F.col("inv.roundtrip_ok")), F.lit(True)).alias(
            "roundtrip_ok"
        ),
    )


_IMG_PATTERNS = 7  # distinct base images in the synthetic gallery


@register(
    "l23_image_phash_dedup",
    oracle=f"""
        WITH reps AS (
            SELECT doc_id % {_IMG_PATTERNS} AS g,
                   CAST(MIN(doc_id) AS BIGINT) AS cluster_rep
            FROM documents GROUP BY doc_id % {_IMG_PATTERNS}
        )
        SELECT d.doc_id, r.cluster_rep
        FROM documents d JOIN reps r ON d.doc_id % {_IMG_PATTERNS} = r.g
    """,
    tags=("llm", "L23", "multimodal", "dedup"),
)
def l23_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23 (beyond the brief): IMAGE near-duplicate dedup through a
    REAL decode→perceptual-hash→cluster pipeline — the multimodal
    twin of L1/L2. Each doc carries a synthetic 16×16 netpbm image:
    one of {_IMG_PATTERNS} base patterns (doc_id mod {_IMG_PATTERNS})
    re-exposed with a per-doc brightness shift, so every payload's
    BYTES differ (sha256 dedup finds nothing) while the picture is
    the same. The pipeline dHashes every payload
    (multimodal.dhash_image: decode → grayscale → 9×8 resize →
    gradient bits) and groups by the hash; the oracle recomputes the
    ground-truth clustering from the construction — a hash match
    proves the perceptual hash recovered exactly the true clusters
    THROUGH the brightness nuisance, no more, no fewer.

    Scale shape: payload→hash is mapInPandas (Arrow batches, the L6
    decode slot — a codec drops in for compressed formats); the
    cluster representative is ONE hash-agg on the 64-bit dhash
    (uniform key, the L1 shape); per-doc assignment is a broadcast
    join of the cluster table."""
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")

    def hash_images(batches):
        from feray_spark.multimodal import dhash_image

        # every payload is REALLY encoded to netpbm bytes and REALLY
        # decoded+hashed by dhash_image; the cache only collapses
        # byte-identical payloads (<= patterns x brightness levels
        # distinct images), the same economy a production pipeline
        # gets from content-addressed media stores
        bases = {
            g: np.random.default_rng(g).integers(0, 180, (16, 16))
            for g in range(_IMG_PATTERNS)
        }
        cache: dict[tuple[int, int], int] = {}

        def one(doc_id: int) -> int:
            key = (doc_id % _IMG_PATTERNS, (doc_id * 13) % 60)
            hit = cache.get(key)
            if hit is None:
                g, bright = key  # brightness never clips (max 239)
                px = (bases[g] + bright).astype(np.uint8)
                payload = b"P5\n16 16\n255\n" + px.tobytes()
                hit = cache[key] = dhash_image(payload)
            return hit

        for chunk in batches:
            if not len(chunk):
                continue
            ids = [int(i) for i in chunk["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series([one(i) for i in ids], dtype="int64"),
                }
            )

    # no fan_out: with the payload cache the per-row work is a dict
    # hit, and the extra exchange measured SLOWER (1.06 s vs 0.66 s
    # median at sf0.1, local[32])
    hashed = d.select("doc_id").mapInPandas(
        hash_images, "doc_id long, dhash long"
    )
    reps = hashed.groupBy("dhash").agg(
        F.min("doc_id").cast("bigint").alias("cluster_rep")
    )
    return hashed.join(F.broadcast(reps), "dhash").select(
        "doc_id", "cluster_rep"
    )


_L24_BITS_SQL = ", ".join(
    f"CASE WHEN CAST(embedding[{i + 1}] AS DOUBLE) >= 0 "
    "THEN '1' ELSE '0' END"
    for i in range(8)
)
_L24_COS_SQL = """
    list_reduce(list_transform(
        list_zip(a.embedding, b.embedding),
        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
        (acc, x) -> acc + x)
    / (sqrt(list_reduce(list_transform(a.embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
          (acc, x) -> acc + x))
       * sqrt(list_reduce(list_transform(b.embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
          (acc, x) -> acc + x)))
"""


@register(
    "l24_semantic_dedup",
    oracle=f"""
        WITH tagged AS (
            SELECT vec_id, embedding,
                   concat({_L24_BITS_SQL}) AS bucket
            FROM embeddings
        ),
        -- NULL/empty vectors have no defined cosine: they can neither
        -- drop nor be dropped (always kept). The split keeps the fold
        -- away from empty lists — DuckDB's seedless list_reduce
        -- RAISES there (and SQL AND gives no short-circuit guarantee)
        valid AS (SELECT * FROM tagged WHERE len(embedding) > 0),
        invalid AS (SELECT * FROM tagged
                    WHERE embedding IS NULL OR len(embedding) = 0)
        SELECT a.vec_id AS vec_id, a.bucket AS bucket
        FROM valid a
        WHERE NOT EXISTS (
            SELECT 1 FROM valid b
            WHERE b.bucket = a.bucket AND b.vec_id < a.vec_id
              AND {_L24_COS_SQL} >= 0.4
        )
        UNION ALL
        SELECT vec_id, bucket FROM invalid
    """,
    tags=("llm", "L24", "dedup", "similarity"),
)
def l24_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L24 (beyond the brief): SemDeDup-style semantic dedup — the
    keep-list after coarse clustering (deterministic sign-bucket
    quantization over the first 8 components) and within-cluster
    keep-lowest-id pruning of cosine-≥-0.4 semantic duplicates
    (operators.dedup.semantic_dedup; the oracle replays the exact
    rule as a NOT EXISTS anti-join). Scale shape: ONE bucket-keyed
    self-join bounds all pairwise cosine work to same-bucket pairs
    (O(Σ|bucket|²), n_bits grows with the corpus), one left-anti
    join back; at 1B+ vectors the bucketer swaps for the trained
    IVF centroid assignment with the same pruning contract."""
    from feray_spark.operators.dedup import semantic_dedup

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(e, id_col="vec_id", vec_col="embedding", tau=0.4)


_STRAT_N = 25  # sample size per (lang, source) stratum
_STRAT_DRAW_SQL = (
    "substr(md5('strat42:' || CAST(doc_id AS VARCHAR)), 1, 16)"
)


@register(
    "l25_stratified_sample",
    oracle=f"""
        SELECT doc_id, lang, source, draw, rn FROM (
            SELECT doc_id, lang, source,
                   {_STRAT_DRAW_SQL} AS draw,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY lang, source
                       ORDER BY {_STRAT_DRAW_SQL}, doc_id) AS BIGINT) AS rn
            FROM documents) t
        WHERE rn <= {_STRAT_N}
    """,
    tags=("llm", "L25", "sampling"),
)
def l25_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L25 (beyond the brief): stratified EXACT sampling — exactly
    ``min(|stratum|, _STRAT_N)`` documents per (lang, source) stratum,
    selected by md5-hash rank. The eval-set/ablation primitive the
    two existing samplers don't give: L14's Bernoulli acceptance
    yields a BINOMIAL per-stratum count (±√n noise), L15 ranks by
    quality (a cap, not a sample); here every stratum lands the same
    fixed budget and the draw is a uniform hash, so the sample is
    unbiased within the stratum, reproducible across engines/runs
    (md5 basis, same discipline as L9's split), and stable under
    corpus re-partitioning — appending new docs only displaces rows
    whose hash outranks an existing winner, so successive snapshots
    share most of the sample (a low-churn eval set).

    Scale shape: identical to L15's — ONE shuffle on the stratum key,
    and the ``rn <= N`` filter triggers WindowGroupLimit (plan-
    asserted: Partial before the exchange), so each scan partition
    pre-cuts to N rows per stratum before anything moves; a
    billion-row stratum ships at most N x partitions rows. The draw
    string is 16 hex chars — lexicographic order on it is identical
    in every engine, no numeric conversion needed."""
    d = load_table(spark, sf_dir, "documents")
    draw = F.substring(
        F.md5(F.concat(F.lit("strat42:"), F.col("doc_id").cast("string"))), 1, 16
    )
    w = W_llm.partitionBy("lang", "source").orderBy(
        F.col("draw").asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "lang", "source", draw.alias("draw"))
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= _STRAT_N)
    )


_L26_CANON_MD5 = (
    "md5(trim(regexp_replace(regexp_replace(lower(text),"
    " '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')))"
)


# The curation pipeline's stage CTEs (gate → canonical exact dedup →
# MinHash banding → candidate verify → transitive closure → per-
# cluster keep), shared verbatim by the l26 end-to-end oracle and the
# l26b attrition oracle so both replay the SAME stage semantics.
_L26_STAGES_CTE_SQL = f"""
        gated AS (
            SELECT doc_id, text FROM documents
            WHERE text IS NOT NULL AND {_QUALITY_SQL} >= 0.35
        ),
        deduped AS (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       ROW_NUMBER() OVER (
                           PARTITION BY {_L26_CANON_MD5}
                           ORDER BY doc_id) AS rn
                FROM gated) t
            WHERE rn = 1
        ),
        {_bands_cte_sql(source="deduped")},
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
        ),
        shsets AS (SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS sh
                   FROM words WHERE len(w) >= 3),
        verified AS (
            SELECT id_a, id_b
            FROM cand JOIN shsets sa ON id_a = sa.doc_id
                      JOIN shsets sb ON id_b = sb.doc_id
            WHERE len(list_intersect(sa.sh, sb.sh))::DOUBLE
                      / len(list_distinct(sa.sh || sb.sh)) >= {JACCARD_T}
        ),
        edges AS (SELECT id_a AS a, id_b AS b FROM verified
                  UNION SELECT id_b, id_a FROM verified),
        reach AS (
            SELECT a AS src, a AS dst FROM (SELECT DISTINCT a FROM edges)
            UNION
            SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
        ),
        comp AS (SELECT src AS doc_id, min(dst) AS comp
                 FROM reach GROUP BY src),
        clean AS (
            SELECT d.doc_id, d.text FROM deduped d LEFT JOIN comp c USING (doc_id)
            WHERE c.doc_id IS NULL OR c.comp = d.doc_id
        )"""


@register(
    "l26_curation_pipeline",
    oracle=f"""
        WITH RECURSIVE
        {_L26_STAGES_CTE_SQL},
        labeled AS (
            SELECT doc_id, text,
                   CASE WHEN draw < 80 THEN 'train'
                        WHEN draw < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, text,
                         ('0x' || substr(md5('split42:'
                             || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                             % 100 AS draw
                  FROM clean) t
        ),
        toks AS (
            SELECT doc_id, split,
                   ('0x' || substr(md5('pack13:'
                       || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                       % {_PACK_SHARDS} AS shard,
                   len({_WORDS_SQL}) AS n_tokens
            FROM labeled
        ),
        packed AS (
            SELECT split, shard, n_tokens,
                   CAST(floor((SUM(n_tokens) OVER (
                            PARTITION BY split, shard ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW)
                        - n_tokens) / {_PACK_CTX}) AS BIGINT) AS pack_id
            FROM toks
        )
        SELECT split, shard, pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY split, shard, pack_id
    """,
    tags=("llm", "L26", "pipeline"),
)
def l26_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L26 (beyond the brief): the END-TO-END curation pipeline —
    quality gate → canonical exact dedup → MinHash near-dup
    clustering (keep one per component) → deterministic split →
    sharded sequence packing, composed from the catalog's operators
    by :func:`feray_spark.pipeline.curate_corpus` and verified as a
    WHOLE against one DuckDB oracle that replays every stage
    (including the transitive closure, via a recursive CTE). The
    single strongest correctness statement in the catalog: if any
    stage's semantics drifted, the pack accounting downstream would
    hash-mismatch.

    Scale posture is the sum of its parts (each documented on its
    operator): zero-shuffle gate, one hash-agg dedup, bucket-bounded
    pair generation, O(diameter) clustering, scan-level split,
    per-(split, shard) windowed packing. Composition adds NO new
    shuffle — stages hand off lazy DataFrames and Catalyst plans the
    flow end to end (pushing the gate INTO the dedup scan); the one
    eager point is the clustering fixpoint, whose per-round
    convergence check is an action by nature."""
    from feray_spark.pipeline import curate_corpus

    d = load_table(spark, sf_dir, "documents")
    return curate_corpus(d, pack_ctx=_PACK_CTX, pack_shards=_PACK_SHARDS).packs


@register(
    "l26b_curation_attrition",
    oracle=f"""
        WITH RECURSIVE
        {_L26_STAGES_CTE_SQL}
        SELECT '0_raw' AS stage, COUNT(*) AS n_docs,
               CAST(SUM(len({_WORDS_SQL})) AS BIGINT) AS n_tokens
        FROM documents
        UNION ALL
        SELECT '1_gated', COUNT(*),
               CAST(SUM(len({_WORDS_SQL})) AS BIGINT) FROM gated
        UNION ALL
        SELECT '2_exact_dedup', COUNT(*),
               CAST(SUM(len({_WORDS_SQL})) AS BIGINT) FROM deduped
        UNION ALL
        SELECT '3_neardup_free', COUNT(*),
               CAST(SUM(len({_WORDS_SQL})) AS BIGINT) FROM clean
    """,
    tags=("llm", "L26", "pipeline"),
)
def l26b_curation_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L26b (beyond the brief): the curation ATTRITION report — the
    per-stage funnel (documents and tokens surviving raw → quality
    gate → canonical exact dedup → near-dup clustering) every
    production curation run publishes next to its output, because
    "the gate dropped 40%" vs "dedup dropped 40%" call for opposite
    fixes. Stage rules are :func:`feray_spark.pipeline.curate_corpus`'s
    own (counts regression-tested identical to its handles), and the
    oracle replays the SAME stage CTEs l26 is gated on (shared SQL
    constant), so the two entries gate each other: l26 proves the
    survivors' downstream accounting, l26b proves each stage's exact
    drop size.

    Scale shape (:func:`feray_spark.pipeline.attrition_report`):
    stage memberships are FLAGS computed in one pass — gate
    predicate scan-side, dedup winner from the canonical-hash
    window, near-dup survivor from a left-anti flag — folded by ONE
    conditional global aggregate and unpivoted with ``stack``; a
    stage never costs its own corpus scan. Production flows attach
    `observe()` to the stages they ship for a zero-extra-job funnel
    (see pipeline.CurationResult)."""
    from feray_spark.pipeline import attrition_report

    d = load_table(spark, sf_dir, "documents")
    return attrition_report(d)


@register(
    "l27_embedding_quantize",
    oracle="""
        SELECT vec_id,
               scale,
               -- empty-vs-NULL pinned: Spark array_join([]) is ''
               -- while DuckDB array_to_string([]) is NULL; a NULL
               -- embedding stays NULL on both sides
               CASE WHEN embedding IS NULL THEN NULL
                    WHEN len(embedding) = 0 THEN ''
                    ELSE array_to_string(list_transform(embedding, x ->
                        CAST(CAST(floor(CAST(x AS DOUBLE) * scale + 0.5)
                             AS INT) AS VARCHAR)), ',') END AS q_csv,
               CASE WHEN scale = 0.0 THEN 0.0
                    ELSE ROUND(list_max(list_transform(embedding, x ->
                        abs(CAST(x AS DOUBLE)
                            - floor(CAST(x AS DOUBLE) * scale + 0.5)
                              / scale))), 9)
               END AS max_abs_err
        FROM (
            SELECT vec_id, embedding,
                   CASE WHEN amax = 0.0 THEN 0.0 ELSE 127.0 / amax END AS scale
            FROM (
                SELECT vec_id, embedding,
                       list_max(list_transform(embedding,
                           x -> abs(CAST(x AS DOUBLE)))) AS amax
                FROM embeddings) a) s
    """,
    tags=("llm", "L27", "similarity", "storage"),
)
def l27_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L27 (beyond the brief): symmetric int8 QUANTIZATION of the
    embedding column — per-vector max-abs scaling to [-127, 127],
    the 4x storage/bandwidth lever every 100 TB embedding estate
    pulls before building ANN indexes (and the input format IVF/PQ
    engines expect). Emits the scale, the quantized codes and the
    per-vector max reconstruction error, so a curation run can gate
    on quantization loss the same way FS5 gates on null rates.

    Portability: rounding is floor(x*scale + 0.5) — written out
    explicitly because engines disagree on round()'s half-away vs
    banker's tie rule, while floor over IEEE doubles is bit-identical
    everywhere; the scale itself is one double division (identical),
    and the error metric re-derives the code from x instead of
    zipping two arrays (same value, no zip_with portability
    surface). All-zero vectors take scale 0.0 / zero codes / zero
    error rather than dividing by zero. Codes leave as a CSV string:
    the driver canonicalizer cannot hash raw array cells (the
    round-1 a7 lesson recorded on f_array_strings).

    Scale shape: a pure zero-shuffle projection — three higher-order
    folds per row, all JVM codegen, no UDF, no state. Pairs with
    L3c/L24: quantized codes feed the IVF scan at a quarter of the
    IO."""
    e = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    amax = F.array_max(F.transform("embedding", lambda x: F.abs(xd(x))))
    scale = F.when(amax == 0.0, F.lit(0.0)).otherwise(F.lit(127.0) / amax)
    with_scale = e.select("vec_id", "embedding", scale.alias("scale"))
    code = lambda x: F.floor(xd(x) * F.col("scale") + F.lit(0.5))  # noqa: E731
    return with_scale.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(
                "embedding", lambda x: code(x).cast("int").cast("string")
            ),
            ",",
        ).alias("q_csv"),
        F.when(F.col("scale") == 0.0, F.lit(0.0))
        .otherwise(
            F.round(
                F.array_max(
                    F.transform(
                        "embedding",
                        lambda x: F.abs(xd(x) - code(x) / F.col("scale")),
                    )
                ),
                9,
            )
        )
        .alias("max_abs_err"),
    )


_EPOCH_SHARDS = 16  # training shard count (files written per epoch)


@register(
    "l28_epoch_shuffle",
    oracle=f"""
        WITH h AS (
            SELECT doc_id,
                   ('0x' || substr(md5('epoch7|' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT AS hk
            FROM documents)
        SELECT doc_id,
               CAST(hk % {_EPOCH_SHARDS} AS BIGINT) AS shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY hk % {_EPOCH_SHARDS}
                    ORDER BY hk, doc_id) AS BIGINT) AS pos
        FROM h
    """,
    tags=("llm", "L28", "sampling"),
)
def l28_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pipeline staple: the reproducible EPOCH SHUFFLE —
    every document gets a (shard, pos) slot for the epoch, fully
    determined by (salt, doc_id): shard = md5-bucket, pos = rank of
    the raw md5 draw within the shard (doc_id tie-break makes the
    order total). Changing the epoch salt re-permutes everything;
    re-running, re-partitioning or changing cluster width changes
    NOTHING — the property torch-style seeded shuffles lose the
    moment topology shifts, and the md5 basis makes the oracle
    reproduce every slot bit-for-bit (functions/text.py md5_rank /
    md5_bucket).

    Scale shape: a true uniform permutation needs a global sort on
    random keys — rangepartitioning + total sort, the most expensive
    shape there is. This runs as ONE hash exchange on the shard id
    + an in-partition sort (plan-asserted: no rangepartitioning):
    shard files write independently, stragglers don't serialize, and
    at 100 TB the epoch order costs exactly one shuffle of the
    (doc_id, hk) pairs — the text itself can stay columnar-pruned
    until the shard writer joins it back by doc_id."""
    d = load_table(spark, sf_dir, "documents")
    hk = md5_rank("epoch7|", "doc_id")
    keyed = d.select(
        "doc_id",
        hk.alias("__hk"),
        (hk % _EPOCH_SHARDS).cast("bigint").alias("shard"),
    )
    w = W_llm.partitionBy("shard").orderBy("__hk", "doc_id")
    return keyed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "l29_temperature_mixture",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, source,
                   ('0x' || substr(md5('temp29:' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % 1000000 AS u,
                   len({_WORDS_SQL}) AS n_tok
            FROM documents WHERE text IS NOT NULL
        ), per_src AS (
            SELECT source,
                   CAST(SUM(n_tok) AS BIGINT) AS src_tokens,
                   CAST(floor(sqrt(CAST(SUM(n_tok) AS DOUBLE))) AS BIGINT)
                       AS w
            FROM tok GROUP BY source
        ), tot AS (
            SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
                   CAST(SUM(w) AS BIGINT) AS total_w
            FROM per_src
        ), rates AS (
            SELECT source, src_tokens,
                   ((CAST(w AS DOUBLE) / total_w) * total_tokens)
                       / src_tokens AS rate
            FROM per_src CROSS JOIN tot
        )
        SELECT t.source,
               COUNT(*) AS n_docs_in,
               CAST(SUM(CAST(floor(r.rate) AS BIGINT)
                    + CASE WHEN t.u < (r.rate - floor(r.rate)) * 1000000.0
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_out,
               CAST(SUM((CAST(floor(r.rate) AS BIGINT)
                    + CASE WHEN t.u < (r.rate - floor(r.rate)) * 1000000.0
                           THEN 1 ELSE 0 END) * t.n_tok) AS BIGINT)
                   AS tokens_out,
               ROUND(MIN(r.rate), 9) AS rate
        FROM tok t JOIN rates r USING (source)
        GROUP BY t.source
    """,
    tags=("llm", "L29", "sampling"),
)
def l29_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L29 (beyond the brief): TEMPERATURE rebalancing — resample
    every source toward w_s ∝ sqrt(n_s) (alpha = 0.5, the XLM-R /
    mT5 multilingual recipe) under the SAME total token budget. The
    op L17 deliberately is not: L17 downsamples toward externally
    declared ratios (rate capped at 1), while temperature balancing
    derives the weights FROM the corpus and UPSAMPLES the tail —
    a low-resource source gets rate > 1, realized as whole-corpus
    repeats (floor(rate)) plus a reproducible md5 draw for the
    fractional epoch, so expected output tokens = rate x n_s per
    source with zero RNG state. The summary reports per-source
    in/out document and token counts plus the rate; the row-level
    variant is one extra line (explode(sequence(1, n_copies)))
    noted below.

    Exactness across engines, by construction: the weight is an
    INTEGER (floor(sqrt(bigint)) — IEEE sqrt is correctly rounded,
    so both engines floor the same double), the totals are BIGINT
    sums, and the rate is derived with one fixed operation order
    ((w / total_w) * total_tokens) / n_s — bit-equal doubles on both
    sides, so even boundary documents (u within 1 of the fractional
    cut) agree. Same discipline as L17/L9.

    Scale shape (same as L17's two-pass broadcast): pass 1 is one
    hash agg of #sources rows; the #sources-row rate table
    broadcasts onto pass 2's scan; copies are computed scan-side and
    the summary shuffles #sources rows. Nothing document-sized ever
    exchanges. The materializing variant stays shuffle-free too:
    ``explode(sequence(1, n_copies))`` fans each row out in place,
    so an epoch-balanced 100 TB corpus writes straight from the scan
    stage."""
    # text IS NOT NULL on BOTH sides: under the repo's non-ANSI
    # session size(NULL array) is -1, which would silently decrement
    # src_tokens per missing-text doc (the oracle's SUM skips NULLs).
    # fan_out (r10): token_count runs in BOTH lineages (per-source
    # totals + the output join), and the 64× probe's one-file scan
    # serialized it on one core — 23.1 → 4.0 s with the spread
    # (noop-write interleaved A/B, scripts/fanout_64x_ab.py) against
    # a measured +0.2 s at sf0.1 (1.12 → 1.35 s — the shared
    # repartition exchange's fixed cost, ReusedExchange across the
    # two consumers); the scale term wins, and at 100 TB the
    # repartition is a no-op. isnotnull still reaches the scan
    # (PushDownPredicates crosses Repartition).
    d = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    u = md5_bucket("temp29:", "doc_id", 1_000_000)
    tok = d.select(
        "doc_id", "source", u.alias("u"), token_count("text").alias("n_tok")
    )
    per_src = tok.groupBy("source").agg(
        F.sum("n_tok").cast("bigint").alias("src_tokens")
    ).withColumn(
        "w", F.floor(F.sqrt(F.col("src_tokens").cast("double"))).cast("bigint")
    )
    # totals via agg + broadcast crossJoin (l17's shape) — the global-
    # window alternative measured SLOWER (1.55 vs 1.07 s at sf0.1)
    tot = per_src.agg(
        F.sum("src_tokens").cast("bigint").alias("total_tokens"),
        F.sum("w").cast("bigint").alias("total_w"),
    )
    rates = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            (F.col("w").cast("double") / F.col("total_w"))
            * F.col("total_tokens")
            / F.col("src_tokens")
        ).alias("rate"),
    )
    copies = (
        F.floor(F.col("rate")).cast("bigint")
        + F.when(
            F.col("u") < (F.col("rate") - F.floor(F.col("rate"))) * 1_000_000.0,
            F.lit(1),
        ).otherwise(F.lit(0))
    )
    out = tok.join(F.broadcast(rates), "source").withColumn("n_copies", copies)
    return out.groupBy("source").agg(
        F.count("*").alias("n_docs_in"),
        F.sum("n_copies").cast("bigint").alias("n_docs_out"),
        F.sum(F.col("n_copies") * F.col("n_tok")).cast("bigint").alias(
            "tokens_out"
        ),
        F.round(F.min("rate"), 9).alias("rate"),
    )


_LB_WIDTH = 16  # token-length bucket width
_LB_CAP = 7  # highest bucket id (everything >= cap*width lands here)
_LB_BATCH = 8  # documents per batch
_LB_SHARDS = 8  # md5 shards bounding each window partition


@register(
    "l30_length_bucket_batches",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id,
                   least(CAST(floor(len({_WORDS_SQL}) / {_LB_WIDTH})
                              AS BIGINT),
                         {_LB_CAP}) AS bucket,
                   ('0x' || substr(md5('lbb30:' || CAST(doc_id AS VARCHAR)),
                        1, 8))::BIGINT % {_LB_SHARDS} AS shard,
                   len({_WORDS_SQL}) AS n_tok
            FROM documents WHERE text IS NOT NULL
        ), batched AS (
            SELECT bucket, shard, n_tok,
                   CAST(floor((ROW_NUMBER() OVER (
                            PARTITION BY bucket, shard
                            ORDER BY n_tok, doc_id) - 1)
                        / {_LB_BATCH}) AS BIGINT) AS batch_id
            FROM tok
        )
        SELECT bucket, shard, batch_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS batch_tokens,
               CAST(MAX(n_tok) AS BIGINT) AS max_len,
               CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT)
                   AS pad_waste
        FROM batched GROUP BY bucket, shard, batch_id
    """,
    tags=("llm", "L30", "packing", "sampling"),
)
def l30_length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L30 (beyond the brief): LENGTH-GROUPED BATCHING — the
    padding-side twin of L13's packing. Packing concatenates
    documents into fixed token windows (pretraining); fine-tuning /
    inference batches instead PAD every sequence in a batch to its
    longest member, so batching similar lengths together is what
    bounds the waste (fairseq/HF ``group_by_length``). Each document
    gets an integer length bucket (width ``_LB_WIDTH`` = 16, capped
    at ``_LB_CAP`` = 7 — production picks boundaries from the
    corpus's length profile), an md5 shard, and a batch of
    ``_LB_BATCH`` = 8 docs formed
    in (n_tok, doc_id) order WITHIN (bucket, shard) — the sort packs
    near-equal lengths adjacently, so per-batch padding waste
    (max_len x n_docs - tokens) is near-minimal while the output
    stays deterministic: every assignment derives from token counts
    and ids, never partitioning or RNG. The report grain is one row
    per batch with its padding accounting — the thing you audit
    before burning GPU-hours on a padded fine-tune.

    Scale shape (same skeleton as L13, plan-asserted): bucket and
    shard are scan-side integer arithmetic (zero shuffle); the ONE
    exchange hashes (bucket, shard) — bounded-width partitions by
    construction, since ``_LB_SHARDS`` = 8 shards split every
    bucket — and
    the batch window sorts in-partition, never range-partitioning.
    The final per-batch aggregate groups on a SUPERSET of the window
    key, so it reuses the window's partitioning with no second
    exchange; at 100 TB the whole report costs one shuffle of
    (doc_id, two ints)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    n_tok = token_count("text")
    tok = d.select(
        "doc_id",
        F.least(
            (n_tok / _LB_WIDTH).cast("bigint"), F.lit(_LB_CAP).cast("bigint")
        ).alias("bucket"),
        md5_bucket("lbb30:", "doc_id", _LB_SHARDS).alias("shard"),
        n_tok.alias("n_tok"),
    )
    w = W_llm.partitionBy("bucket", "shard").orderBy("n_tok", "doc_id")
    batched = tok.withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / _LB_BATCH).cast("bigint"),
    )
    return batched.groupBy("bucket", "shard", "batch_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("batch_tokens"),
        F.max("n_tok").cast("bigint").alias("max_len"),
        (F.max("n_tok") * F.count("*") - F.sum("n_tok"))
        .cast("bigint")
        .alias("pad_waste"),
    )


_LEAK_N = 8  # leakage-audit n-gram width (L12's probe width)
_LEAK_SPLIT_SQL = (
    "CASE WHEN ('0x' || substr(md5('split42:' || CAST(doc_id AS VARCHAR)),"
    " 1, 8))::BIGINT % 100 < 80 THEN 'train'"
    " WHEN ('0x' || substr(md5('split42:' || CAST(doc_id AS VARCHAR)),"
    " 1, 8))::BIGINT % 100 < 90 THEN 'val' ELSE 'test' END"
)
_LEAK_GRAMS_SQL = (
    f"list_transform(generate_series(1, len(w) - {_LEAK_N - 1}), "
    "i -> concat_ws(' ', "
    + ", ".join(f"w[i+{k}]" for k in range(_LEAK_N))
    + "))"
)


@register(
    "l31_split_leakage",
    oracle=f"""
        WITH w AS (
            SELECT doc_id, {_LEAK_SPLIT_SQL} AS split, {_WORDS_SQL} AS w
            FROM documents WHERE text IS NOT NULL
        ), grams AS (
            SELECT DISTINCT doc_id, split,
                   ('0x' || substr(md5(gram), 1, 15))::BIGINT AS g
            FROM (SELECT doc_id, split, unnest({_LEAK_GRAMS_SQL}) AS gram
                  FROM w WHERE len(w) >= {_LEAK_N})
        ), train_grams AS (
            SELECT DISTINCT g FROM grams WHERE split = 'train'
        ), flagged AS (
            SELECT gr.split, gr.doc_id, gr.g,
                   (t.g IS NOT NULL) AS leaked
            FROM grams gr LEFT JOIN train_grams t USING (g)
            WHERE gr.split <> 'train'
        )
        SELECT split,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs_with_grams,
               CAST(COUNT(DISTINCT g) AS BIGINT) AS gram_types,
               CAST(COUNT(DISTINCT CASE WHEN leaked THEN g END)
                    AS BIGINT) AS leaked_gram_types,
               CAST(COUNT(DISTINCT CASE WHEN leaked THEN doc_id END)
                    AS BIGINT) AS leaked_docs
        FROM flagged GROUP BY split
    """,
    tags=("llm", "L31", "contamination"),
)
def l31_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L31 (beyond the brief): SPLIT-LEAKAGE audit — after L9's
    deterministic split, measure how much eval-set content the
    training split already contains: for each eval split, the
    distinct ``_LEAK_N``-gram (8-gram) types shared with train and the eval
    documents carrying at least one shared gram. L12 checks the
    corpus against an EXTERNAL benchmark probe set; this audits the
    corpus against ITSELF — the number that tells you whether your
    held-out perplexity is measuring generalization or memorized
    near-duplicates (the reason C4/Dolma dedup BEFORE splitting).
    Same md5 split basis as L9/L26, so the audit covers exactly the
    split the pipeline ships.

    Scale shape (round-9 redesign — the round-8 join form silently
    ran the whole tokenize+shingle+md5 lineage TWICE: the split
    filters pushed through the pair-level distinct, leaving two full
    explode lineages with only the cheap repartition exchange
    reused): ONE explode lineage → ONE exchange on the hashed gram
    key → a window ``max(split='train')`` over the gram partition
    computes the leaked flag in place (no join, no train-types
    build) → each eval row explodes into its two counting roles
    (gram-keyed, doc-keyed — 2x cheap long rows, NOT a 4x Expand
    from multi-countDistinct) → one two-level hash agg with
    map-side partials. Interleaved A/B at sf0.1 (rebuilt per run,
    same session): 1.68 → 1.03 s median, plan canon_lower lineages
    2 → 1, Expand nodes 1 → 0. At 100 TB the window is the only
    correct shape for the train-membership probe: 8-gram TYPES are
    near-corpus-sized for diverse text (never broadcastable), a
    gram's window partition is bounded by its document frequency,
    and the 8-gram width makes stop-gram hot keys rare by
    construction (same argument as L12's probe width). The split
    draw is materialized per DOC below the Generate (the CASE's
    double-md5 residual ran per GRAM in the old form) and needs no
    fence: the only split filter sits above the window, which
    pushdown cannot cross (split is not the partition key)."""
    from feray_spark.functions.text import shingles_from_words

    # fan_out + a materialized word array: shingling + per-gram md5
    # is CPU-heavy per-row work (Catalyst re-inlines the regex split
    # into every element_at without the projection barrier — the
    # minhash_bands lesson), and a single-file local input must not
    # pin it to one core
    d = fan_out(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull()
        )
    ).withColumn("__w", words("text"))

    draw = md5_bucket("split42:", "doc_id", 100)
    split = (
        F.when(draw < 80, "train").when(draw < 90, "val").otherwise("test")
    )
    gram = F.explode(shingles_from_words(F.col("__w"), _LEAK_N)).alias(
        "gram"
    )
    # grams shuffle as 60-bit md5-prefix longs, never as strings —
    # identical hashing on the oracle side keeps the counts exact
    # (collision-free at vocabulary scale by the birthday bound)
    gram_h = F.conv(F.substring(F.md5(F.col("gram")), 1, 15), 16, 10).cast(
        "bigint"
    )
    # split materialized BEFORE the explode select keeps its Project
    # below the Generate — written inside the same select, the CASE
    # (and its up-to-2x md5 draw) evaluated once per GRAM row
    pairs = (
        d.withColumn("split", split)
        .select("doc_id", "split", gram)
        .select("doc_id", "split", gram_h.alias("g"))
    )
    # no pre-distinct: the role-level groupBy below dedups (its keys
    # subsume the pair identity), so a distinct here would only add
    # a second full shuffle of the same rows
    flagged = pairs.withColumn(
        "leaked",
        F.max(F.when(F.col("split") == "train", 1).otherwise(0)).over(
            W_llm.partitionBy("g")
        )
        == 1,
    ).filter(F.col("split") != "train")
    # each surviving row feeds BOTH counts via a 2-element explode —
    # Spark's 4-way multi-countDistinct would Expand to 4x rows and
    # hash-distinct the full set per distinct-expression group
    roles = flagged.select(
        "split",
        "leaked",
        F.explode(
            F.array(
                F.struct(F.lit("g").alias("role"), F.col("g").alias("k")),
                F.struct(
                    F.lit("d").alias("role"), F.col("doc_id").alias("k")
                ),
            )
        ).alias("r"),
    ).select("split", "r.role", "r.k", "leaked")
    lvl1 = roles.groupBy("split", "role", "k").agg(
        F.max("leaked").alias("lk")
    )
    lvl2 = lvl1.groupBy("split", "role").agg(
        F.count("*").alias("cnt"), F.count_if("lk").alias("lcnt")
    )
    return lvl2.groupBy("split").agg(
        F.max(F.when(F.col("role") == "d", F.col("cnt")))
        .cast("bigint")
        .alias("docs_with_grams"),
        F.max(F.when(F.col("role") == "g", F.col("cnt")))
        .cast("bigint")
        .alias("gram_types"),
        F.max(F.when(F.col("role") == "g", F.col("lcnt")))
        .cast("bigint")
        .alias("leaked_gram_types"),
        F.max(F.when(F.col("role") == "d", F.col("lcnt")))
        .cast("bigint")
        .alias("leaked_docs"),
    )
