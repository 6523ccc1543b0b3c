"""Deduplication family — SURVEY §2.12 L1/L2 (north-star: the core
of a 100 TB training-data pipeline).

Four tiers, cheapest first:

- :func:`exact_dedup` — content-hash groupBy; one shuffle on the
  64-hex sha256 (uniform keys → no skew), keeps the lowest doc id
  per hash deterministically.
- :func:`minhash_lsh_pairs` — near-dup candidates with Jaccard ≥ τ
  over word shingles: explode shingles → ONE hash-aggregate builds
  the per-doc MinHash signature (map-side partial mins), band into
  ``bands`` hashes, self-join on (band_idx, band_hash). Join key is
  a hash → uniform; candidate verification (exact Jaccard) touches
  only colliding pairs.
- :func:`simhash` — 60-bit per-doc sketch where near-identical docs
  differ in few bits; Hamming-ball lookup joins on rotated prefix
  blocks (here: sketch only; the banding trick reuses
  minhash_lsh_pairs' machinery).
- embedding cosine near-dup — see operators.similarity.

All hash bases are md5-prefix so the DuckDB oracle can recompute
signatures bit-for-bit; MinHash derives all hash functions from ONE
md5 per shingle via an affine-mod-P family (functions.text
.shingle_base_hash / minhash_value).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from feray_spark.functions.text import (
    minhash_value,
    shingle_base_hash,
    shingles_from_words,
    words,
)
from feray_spark.queries.util import fan_out


def content_keep_flag(
    content: F.Column, id_col: str, eligible: F.Column
) -> F.Column:
    """THE exact-dedup winner rule, shared by :func:`exact_dedup` and
    the pipeline attrition funnel so the two can never drift: True
    iff the row is the deterministic keeper of its content group —
    the lowest ``id_col`` among ELIGIBLE rows sharing
    ``sha2(content, 256)``. Ineligible rows (NULL text, gate-failed)
    key on their own id, so they never contend with any content
    group and flag True trivially; callers that also want them
    dropped AND the flag with their eligibility predicate."""
    key = F.when(eligible, F.sha2(content, 256)).otherwise(
        F.concat(F.lit("__solo__"), F.col(id_col).cast("string"))
    )
    w = W.partitionBy(key).orderBy(F.col(id_col))
    return F.row_number().over(w) == 1


def exact_dedup(
    df: DataFrame, text_col: str, id_col: str, *, canonical: bool = False
) -> DataFrame:
    """L1: drop byte-identical texts, keeping the lowest id per
    content hash (deterministic winner — required for reproducible
    pipelines). NULL texts are NOT duplicates of each other (a failed
    extraction is missing data, not identical content): each NULL row
    keys on its own id and passes through — a bare sha2 partition
    would group every NULL together and silently discard all but
    one.

    ``canonical=True`` hashes :func:`feray_spark.functions.text.
    canonical_text` instead of the raw bytes — L1b's "fuzzy exact"
    pass (case/punctuation/whitespace variants collapse; NULL still
    passes through since the normalization NULL-propagates). Prefer
    the L1b catalog query when the per-form variant COUNT matters:
    it uses the skew-immune hash-aggregate shape; this flag keeps the
    operator's keep-every-column contract."""
    if canonical:
        # canonicalize through the size-gated helper (r10): big
        # inputs take the mapInArrow utf8proc+RE2 leg (~2x the whole
        # l1b query at the 64x probe corpus — Java regex measured
        # ~40x RE2's core-seconds on the strip pass), small local
        # inputs keep the Column expression, value-identical by the
        # pinned corner set. The canon column is materialized, the
        # winner window keys on the attribute, and it is dropped
        # before returning (keep-every-column contract).
        from feray_spark.functions.text import with_canonical_text

        ccol = "__canon"
        while ccol in df.columns:  # never clobber a caller's column
            ccol += "_"
        content = F.col(ccol)
        keyed = with_canonical_text(df, text_col, ccol)
    else:
        content = F.col(text_col)
        ccol = None
        keyed = df
    keep = content_keep_flag(content, id_col, content.isNotNull())
    out = (
        keyed.withColumn("__keep", keep)
        .filter(F.col("__keep"))
        .drop("__keep")
    )
    return out.drop(ccol) if ccol else out


def minhash_bands(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band_idx, band_hash) rows for every doc with at least
    ``shingle_n`` words (shorter docs have no shingles and drop out
    of LSH).

    Scale shape — the classic explode->groupBy MinHash: explode
    shingles, hash each shingle exactly once per seed, take per-doc
    mins in ONE hash aggregate (map-side partials apply), then emit
    ``bands`` band hashes per doc. One shuffle on the doc id. The
    tempting explode-free alternative (signature as a nested
    higher-order expression feeding band hashes) re-evaluates the
    whole signature once per reference — Catalyst does not CSE
    across lambda functions — and is ~30x slower at sf0.001.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must divide evenly into bands")
    from feray_spark.functions.text import MINHASH_COEFFS

    if num_hashes > len(MINHASH_COEFFS):
        raise ValueError(
            f"num_hashes={num_hashes} exceeds the fixed universal-hash "
            f"family ({len(MINHASH_COEFFS)} coefficient pairs); extend "
            "functions.text.MINHASH_COEFFS (and its oracle twin) first"
        )
    sig = minhash_signatures(
        df, text_col, id_col, shingle_n=shingle_n, num_hashes=num_hashes
    )
    return sig.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            band_hash_array("sig", num_hashes=num_hashes, bands=bands)
        ).alias("band_idx", "band_hash"),
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(id, sig array<bigint>) MinHash signatures — the factored
    signature pass of :func:`minhash_bands`, exposed so stateful
    consumers (the L18b incremental index) can PERSIST signatures and
    later estimate Jaccard from them without ever re-touching text:
    est_jaccard(a, b) = fraction of equal positions (the standard
    MinHash estimator).

    Scale shape — the classic explode->groupBy MinHash: explode
    shingles, hash each shingle exactly once per seed, take per-doc
    mins in ONE hash aggregate (map-side partials apply). One shuffle
    on the doc id. The tempting explode-free alternative (signature
    as a nested higher-order expression feeding band hashes)
    re-evaluates the whole signature once per reference — Catalyst
    does not CSE across lambda functions — and is ~30x slower at
    sf0.001. Docs with fewer than ``shingle_n`` words have no
    shingles and drop out (no signature, never near-anything)."""
    # Materialize the word array BEFORE shingling: the shingle
    # expression references it ~shingle_n times per element and
    # Catalyst doesn't CSE across lambdas — as a real column the
    # regex split runs once per row instead of once per reference.
    # fan_out measured via l2: 1.65 s with vs 2.03 s without (sf0.1,
    # local[32]) — per-row shingle+md5 work dominates
    shingled = (
        fan_out(df)
        .select(F.col(id_col).alias("__id"), words(text_col).alias("__w"))
        .select(
            "__id",
            F.explode(shingles_from_words(F.col("__w"), shingle_n)).alias("__s"),
        )
        .select("__id", shingle_base_hash(F.col("__s")).alias("__x"))
    )
    return shingled.groupBy("__id").agg(
        F.array(
            *[
                F.min(minhash_value(F.col("__x"), j))
                for j in range(num_hashes)
            ]
        ).alias("sig")
    ).select(F.col("__id").alias(id_col), "sig")


def band_hash_array(
    sig_col: str | F.Column, *, num_hashes: int = 8, bands: int = 4
) -> F.Column:
    """array<string> of ``bands`` md5 band hashes over a signature
    array column (rows-per-band consecutive positions, matching
    :func:`minhash_bands`' banding exactly)."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    rows = num_hashes // bands
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    *[
                        F.element_at(sig, b * rows + r + 1).cast("string")
                        for r in range(rows)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float | None = None,
    max_bucket_ids: int | None = 4096,
) -> DataFrame:
    """L2: candidate near-duplicate pairs (id_a < id_b) that collide
    in at least one LSH band; optionally verified with exact shingle
    Jaccard >= ``jaccard_threshold``.

    Returns columns: ``id_a, id_b`` (+ ``jaccard`` when verifying).
    Texts are joined back only for colliding pairs, so the exact-
    Jaccard verification cost scales with candidates, not the
    corpus.

    ``max_bucket_ids`` is the hot-bucket valve (L20's ``max_span_df``
    sibling): LSH design bounds bucket width — but at web scale a
    degenerate band (empty-ish docs sharing one signature, an
    adversarial shingle) can collect millions of ids in ONE bucket,
    and the array pair expansion below would then materialize an
    O(B^2) struct array in a single task. Buckets wider than the
    valve are diverted to an equi-self-join on (band_idx, band_hash):
    the SAME pair set, but produced by a shuffle join whose probe
    side AQE can skew-split across tasks instead of one row exploding
    quadratically. Semantics are identical either way, so the l2
    oracle needs no variant. ``None`` disables the valve."""
    banded = minhash_bands(
        df,
        text_col,
        id_col,
        shingle_n=shingle_n,
        num_hashes=num_hashes,
        bands=bands,
    )
    # Pairs come from ONE aggregation: gather each bucket's ids and
    # expand the in-bucket pairs with higher-order functions. A
    # banded-self-join would run the whole shingle->minhash pipeline
    # once per side (exchange reuse is best-effort, and the probe
    # side shuffles regardless); this shape computes signatures once
    # and shuffles only (band, id) rows. In-bucket width is bounded
    # by the valve above, so the quadratic expansion is safe; only
    # over-valve buckets pay a join.
    ids = F.array_sort(F.collect_list("__id"))
    pair_structs = F.flatten(
        F.transform(
            F.col("__ids"),
            lambda x, i: F.transform(
                F.slice(F.col("__ids"), i + 2, F.size(F.col("__ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    grouped = (
        banded.groupBy("band_idx", "band_hash")
        .agg(ids.alias("__ids"))
        .filter(F.size("__ids") > 1)
    )
    in_valve = grouped
    if max_bucket_ids is not None:
        in_valve = grouped.filter(F.size("__ids") <= max_bucket_ids)
    pairs = (
        in_valve.select(F.explode(pair_structs).alias("__p"))
        .select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
    )
    if max_bucket_ids is not None:
        # Diverted hot buckets. NO checkpoint here: the hot branch
        # shares the small branch's aggregation exchange (identical
        # subplan → ReusedExchange), so in the healthy case the
        # valve's cost is two near-empty agg re-reads of the same
        # shuffle files — a localCheckpoint would instead run the
        # whole minhash pipeline again as its own job (measured 2x
        # on l2 at sf0.1).
        hot_ids = grouped.filter(F.size("__ids") > max_bucket_ids).select(
            "band_idx", "band_hash", F.explode("__ids").alias("__id")
        )
        hot_pairs = (
            hot_ids.select("band_idx", "band_hash", F.col("__id").alias("id_a"))
            .join(
                hot_ids.select(
                    "band_idx", "band_hash", F.col("__id").alias("id_b")
                ),
                ["band_idx", "band_hash"],
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        pairs = pairs.unionByName(hot_pairs)
    pairs = pairs.distinct()
    if jaccard_threshold is None:
        return pairs
    # Exact-Jaccard verify: shingle ONLY the docs that appear in a
    # candidate pair (left-semi prune) — verification cost scales
    # with candidates, not the corpus. The candidate set feeds both
    # the prune and the final join; localCheckpoint materializes it
    # once (it is small by LSH design) instead of re-running the
    # whole shingle->minhash->band pipeline per consumer (exchange
    # reuse does not deduplicate across these branches under AQE).
    pairs = pairs.localCheckpoint(eager=False)
    cand_ids = pairs.select(
        F.explode(F.array("id_a", "id_b")).alias(id_col)
    ).distinct()
    pruned = df.select(F.col(id_col), F.col(text_col)).join(
        cand_ids, id_col, "leftsemi"
    )
    # fan_out measured via l2 (with the signatures site): see above
    shsets = (
        fan_out(pruned)
        .select(F.col(id_col).alias("__tid"), words(text_col).alias("__w"))
        .select(
            "__tid",
            F.array_distinct(
                shingles_from_words(F.col("__w"), shingle_n)
            ).alias("__sh"),
        )
    )
    pairs = pairs.join(
        shsets.select(F.col("__tid").alias("id_a"), F.col("__sh").alias("sh_a")),
        "id_a",
    ).join(
        shsets.select(F.col("__tid").alias("id_b"), F.col("__sh").alias("sh_b")),
        "id_b",
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 60) -> DataFrame:
    """L2 variant: SimHash sketch (60 bits, md5-prefix-derived) —
    per-bit majority vote over the hashes of the doc's distinct
    words. Near-identical docs land within a few bits of Hamming
    distance.

    Single-pass shape: ONE aggregate over the word-hash array keeps
    a ``bits``-wide counter vector (zip_with add of each hash's bit
    pattern), then one reduce folds the majority votes into the
    final integer. No explode, no shuffle, and the word-hash array
    is evaluated once per row (inlining it per bit would blow up
    codegen ``bits``-fold)."""
    # Materialized per-row word array (see minhash_bands: Catalyst
    # won't CSE the regex split across the references below).
    # fan_out measured via l2b: 0.59 s with vs 1.60 s without (sf0.1,
    # local[32]) — the 60-bit per-word fold is hot
    df = fan_out(df).withColumn("__w", F.array_distinct(words(text_col)))
    w = F.col("__w")
    # per-word value from the md5 prefix (15 hex chars = 60 bits)
    hashes = F.transform(
        w, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    )
    masks = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                masks,
                lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(0)),
            ),
            lambda a, x: a + x,
        ),
    )
    n = F.size(w)
    sim = F.aggregate(
        F.zip_with(
            votes,
            masks,
            lambda v, m: F.when(v * 2 > n, m).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), sim.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """L2 exact tier: n-gram Jaccard near-duplicate pairs WITHOUT
    hashing approximation — every surviving pair carries its true
    shingle-set Jaccard. Output: (id_a, id_b, jaccard), id_a < id_b.

    Shape: inverted-index count join. Explode each doc's distinct
    shingle set once; |A∩B| is a COUNT per (id_a, id_b) over the
    token self-join, |A∪B| = |A| + |B| − |A∩B| from the per-doc
    sizes — shingle ARRAYS never travel through a join, only
    (id, shingle) rows and then (id, id, count) rows. Work volume is
    Σ_s C(df_s, 2): the true amount of pairwise overlap in the
    corpus, not corpus². Join keys are shingles (df-bounded, no skew)
    then id pairs (near-unique).

    At 100 TB, Σ C(df_s, 2) is dominated by stop-shingles:
    ``max_df`` drops shingles seen in more than that many docs from
    the index — the standard cutoff, which makes the join volume
    linear-ish in the corpus at a documented precision cost (the
    reported Jaccard then ignores dropped shingles). Leave it None
    for exact semantics; the MinHash tier (minhash_lsh_pairs) is the
    sub-quadratic alternative when exactness isn't required at all.
    """
    # Expression-placement contract (measured ~30x): materialize the
    # word array as its own projection, and build the ENTIRE shingle
    # pipeline inside the Generate's generator expression. An
    # intermediate projection holding the shingle array gets
    # collapsed into the word-split projection, after which the
    # regex split re-runs per element access inside the lambda.
    # fan_out measured via l2c: 1.28 s with vs 2.35 s without (sf0.1,
    # local[32])
    tok = (
        fan_out(df)
        .select(F.col(id_col).alias("__id"), words(text_col).alias("__w"))
        .select(
            "__id",
            F.explode(
                F.array_distinct(shingles_from_words(F.col("__w"), shingle_n))
            ).alias("__s"),
        )
    )
    if max_df is not None:
        keep = tok.groupBy("__s").agg(F.count("*").alias("__df")).filter(
            F.col("__df") <= max_df
        )
        tok = tok.join(keep.select("__s"), "__s")
    # tok feeds three consumers (sizes + both self-join sides):
    # checkpoint it so the regex-split/shingle scan runs once, not
    # three times (same reason the minhash verify path checkpoints)
    tok = tok.localCheckpoint(eager=False)
    sizes = tok.groupBy("__id").agg(F.count("*").alias("__n"))
    inter = (
        tok.alias("a")
        .join(tok.alias("b"), "__s")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("__i"))
    )
    jac = F.col("__i").cast("double") / (
        F.col("__na") + F.col("__nb") - F.col("__i")
    )
    return (
        inter.join(
            sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb")),
            "id_b",
        )
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def span_first_occurrence_flags(
    spans: DataFrame,
    *,
    chunk_col: str = "chunk",
    id_col: str = "doc_id",
    pos_col: str = "pos",
    max_span_df: int | None = None,
    unique_rows: bool = False,
) -> DataFrame:
    """L20 core: mark each span row ``keep`` = True iff it is the
    corpus-global FIRST occurrence of its chunk text (winner =
    smallest (id, pos)). Input: (id, pos, chunk) rows; output: the
    same rows plus a boolean ``keep``.

    Default path: one rank window partitioned by the chunk — the
    cheapest shape when span frequencies are corpus-typical.

    ``max_span_df`` is the hot-span valve (the L2c stop-shingle
    situation): a boilerplate mega-span (cookie banner, license
    header) repeated millions of times is ONE window partition, and
    window partitions cannot be split by AQE — the skewed sort
    stalls the stage. With the valve set, spans whose document
    frequency exceeds the bound are diverted to an aggregate path:
    their winner is a per-chunk MIN over (id, pos) structs — a hash
    aggregate with map-side partial combine, so each map task
    contributes ONE row per hot chunk regardless of its row count —
    joined back to mark keeps. The window then runs only over the
    cold spans, whose partition sizes are bounded by the valve.
    Semantics are IDENTICAL either way (the winner is the same
    (id, pos) minimum); only the physical strategy moves — which is
    why l20's oracle needs no variant.

    The join back onto span rows is still keyed by the hot chunk,
    but a shuffle-hash/sort-merge JOIN with probe-side skew is
    AQE-skew-splittable (OptimizeSkewedJoin), unlike a window — that
    asymmetry is the whole point of the valve.

    ``unique_rows=True`` declares that (id, pos) pairs are unique in
    the input — TRUE by construction for l20's span generator (pos
    enumerates a document's span sequence exactly once). Under that
    declaration the hot path needs NO window at all: the duplicate-
    copy row_number exists only to keep multi-copy inputs faithful
    to window semantics, and winner-equality alone marks exactly one
    row when rows are unique. The hot rows then never shuffle — the
    per-chunk winner table (≤ #hot chunks rows) broadcasts onto the
    scan — which is what makes the valve strictly cheaper than the
    single-partition window sort at adversarial skew (measured,
    scripts/valve_skew_probe.py, 60M-row planted mega-span: valve-on
    23 s under unique_rows vs 107 s with the dup window vs 44–85 s
    valve-off across runs — the dup window was costlier than the
    stall it avoided; unique_rows is what makes the valve a win)."""
    rn_keep = (
        F.row_number().over(
            W.partitionBy(chunk_col).orderBy(id_col, pos_col)
        )
        == 1
    )
    if max_span_df is None:
        return spans.withColumn("keep", rn_keep)
    stats = spans.groupBy(chunk_col).agg(
        F.count("*").alias("__df"),
        F.min(F.struct(id_col, pos_col)).alias("__winner"),
    )
    hot = stats.filter(F.col("__df") > max_span_df).select(
        chunk_col, "__winner"
    )
    tagged = spans.join(hot, chunk_col, "left")
    cold = tagged.filter(F.col("__winner").isNull()).drop("__winner")
    hot_rows = tagged.filter(F.col("__winner").isNotNull())
    cold_marked = cold.withColumn("keep", rn_keep)
    if unique_rows:
        # rows declared unique on (id, pos): winner-equality marks
        # exactly one row, no window — the hot rows never exchange
        hot_marked = hot_rows.withColumn(
            "keep", F.struct(id_col, pos_col) == F.col("__winner")
        ).drop("__winner")
    else:
        # Winner-equality alone would mark EVERY copy of a duplicated
        # (id, pos) row keep=True where the window path marks exactly
        # one — so break duplicate copies with a row_number
        # partitioned by the FULL (chunk, id, pos) key. Unlike the
        # per-chunk window the valve exists to avoid, this
        # partitioning includes id+pos, so a boilerplate mega-span
        # hashes across reducers instead of landing on one.
        dup_rn = F.row_number().over(
            W.partitionBy(chunk_col, id_col, pos_col).orderBy(F.lit(1))
        )
        hot_marked = hot_rows.withColumn(
            "keep",
            (F.struct(id_col, pos_col) == F.col("__winner")) & (dup_rn == 1),
        ).drop("__winner")
    return cold_marked.unionByName(hot_marked).select(
        *spans.columns, "keep"
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the
    step that turns L2 PAIRS into dedup CLUSTERS (keep one doc per
    component). Output: (id, component) where component = the
    smallest id reachable from ``id``; docs absent from ``pairs``
    are their own components and aren't emitted.

    Shape: iterative min-label propagation. Each round joins every
    node's current label with its neighbors' and keeps the min —
    one shuffle per round on the node id, labels localCheckpointed
    per round so the lineage (and replay cost) stays O(1) instead of
    O(rounds). Rounds needed = graph diameter; near-dup graphs are
    overwhelmingly tiny cliques (diameter ≤ 2), so convergence is
    checked and the loop exits early — ``max_iters`` only bounds
    pathological chains. At extreme scale the classic upgrade is the
    large-star/small-star algorithm (O(log n) rounds on any
    topology); the label-propagation shape here is the right cost
    for clique-like dedup graphs and keeps every step a plain
    equi-join."""
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(
            pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .select(F.col("a").alias("id"), "comp")
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        nxt = (
            labels.join(
                neighbor_min.withColumnRenamed("a", "id"), "id", "left"
            )
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = nxt
        if not changed:
            converged = True
            break
    if not converged:
        # Diameter exceeded max_iters: the labels are still moving, so
        # returning them would be silently wrong. Fall through to the
        # O(log n)-round star variant, which converges on any topology.
        warnings.warn(
            f"connected_components did not converge in {max_iters} rounds "
            "(graph diameter exceeds the iteration bound); falling back to "
            "connected_components_star",
            RuntimeWarning,
            stacklevel=2,
        )
        return connected_components_star(pairs, id_a, id_b)
    return labels


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iters: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds — the huge-graph path beside
    :func:`connected_components`'s label propagation. Label
    propagation needs O(diameter) shuffles (fine for clique-like
    near-dup graphs); this converges in O(log n) rounds on ANY
    topology (Kiveris et al., "Connected Components in MapReduce and
    Beyond", the standard formulation), so chain- or mesh-shaped
    graphs can't degrade it.

    Each round is two grouped passes over the edge list:
    - large-star: every node u links each STRICTLY LARGER neighbor
      to m(u) = min(N(u) ∪ {u});
    - small-star: every node u links each neighbor ≤ u (and itself)
      to m(u).
    Edges are localCheckpointed per round (O(1) lineage); the loop
    exits when the edge multiset stops changing, at which point the
    graph is a forest of stars centered on component minima. Output:
    (id, component), component = smallest id in the component."""

    def star(edges: DataFrame, large: bool) -> DataFrame:
        # symmetrize: N(u) from both edge directions
        nbrs = edges.unionByName(
            edges.select(F.col("a").alias("b"), F.col("b").alias("a"))
        )
        grouped = nbrs.groupBy("a").agg(
            F.collect_set("b").alias("ns")
        )
        m = F.array_min(F.array_union(F.col("ns"), F.array(F.col("a"))))
        if large:
            targets = F.filter(F.col("ns"), lambda v: v > F.col("a"))
        else:
            targets = F.array_union(
                F.filter(F.col("ns"), lambda v: v <= F.col("a")),
                F.array(F.col("a")),
            )
        return (
            grouped.select(
                F.explode(targets).alias("a"), m.alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iters):
        nxt = star(star(edges, large=True), large=False).localCheckpoint(
            eager=False
        )
        changed = (
            nxt.exceptAll(edges).limit(1).count()
            + edges.exceptAll(nxt).limit(1).count()
        )
        edges = nxt
        if not changed:
            converged = True
            break
    if not converged:
        # this IS the fallback — there is nothing further to fall
        # through to, and the star extraction below assumes a
        # converged forest: extracting from a still-moving edge set
        # would return silently wrong components (the same contract
        # connected_components enforces by falling through to here)
        raise RuntimeError(
            f"connected_components_star did not converge within "
            f"{max_iters} rounds; raise max_iters (O(log n) rounds "
            "suffice on any topology, so this graph is extreme)"
        )
    # final star graphs: every non-root points at its component root
    comp = edges.select(
        F.greatest("a", "b").alias("id"), F.least("a", "b").alias("comp")
    ).distinct()
    roots = comp.select(F.col("comp").alias("id")).distinct().withColumn(
        "comp", F.col("id")
    )
    result = comp.unionByName(roots)
    # Nodes appearing only in self-pairs were dropped by the a != b edge
    # filter; emit them as their own singleton components so the output
    # agrees with connected_components on every pair input.
    all_ids = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
    )
    singletons = all_ids.join(result, "id", "left_anti").withColumn(
        "comp", F.col("id")
    )
    return result.unionByName(singletons)


def semantic_dedup(
    vec_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    *,
    tau: float = 0.4,
    n_bits: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication"): cluster the embedding space coarsely, then
    within each cluster drop every vector that has a SMALLER-id
    neighbor with cosine ≥ ``tau``. Keep-lowest-id makes the survivor
    reproducible and lets a SQL oracle replay the exact decision.
    NOTE the rule is drop-if-ANY-smaller-id-neighbor, not a
    sequential keep-first scan: on a similarity CHAIN 1–2–3 (1~2,
    2~3, 1≁3) a sequential scan would keep {1, 3} (3 only compares
    against the kept set) while this rule drops 3 too, keeping {1} —
    slightly more aggressive on transitive chains, but expressible as
    one self-join instead of an inherently sequential pass; at
    near-dup thresholds (tau high) clusters are clique-like and the
    two rules coincide.

    Clustering here is a deterministic SIGN-BUCKET quantization: bit
    i of the bucket key is ``1[v_i >= 0]`` over the first ``n_bits``
    components — a fixed random-hyperplane LSH with axis-aligned
    planes. Unlike k-means it needs no training pass, is identical
    in any engine, and has the same role: bound the pairwise
    comparison to same-bucket vectors. Cost O(Σ |bucket|²) instead
    of O(n²); pick ``n_bits ≈ log2(n / target_cluster_size)`` so
    buckets stay pair-join-sized as the corpus grows. The production
    tier at 1B+ vectors swaps the bucketer for the trained IVF
    centroid assignment (operators.similarity.ivf_topk's cell plan)
    and keeps THIS pruning rule unchanged — the rule, not the
    clusterer, is the operator's contract.

    Shuffle shape: one self-equi-join keyed on the bucket (pairs
    exist only within buckets; the smaller-id condition halves them),
    cosine evaluated inside whole-stage codegen on the joined rows,
    then one left-anti join back on id. A borderline near-dup PAIR
    that straddles a bucket boundary is missed — the documented
    recall trade of every bucketed near-dup tier (same as
    minhash_lsh_pairs' banding).

    NULL/empty vectors are always KEPT: their cosine is undefined
    (the fold scores such pairs NULL, which never clears ``tau``),
    so they can neither drop a neighbor nor be dropped — flagging
    invalid vectors is FS5 asset-check territory, not dedup's.

    Returns the KEPT rows: (id, bucket).
    """
    bits = [
        F.when(F.element_at(F.col(vec_col), i + 1).cast("double") >= 0,
               F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    tagged = vec_df.select(
        F.col(id_col), F.col(vec_col), F.concat(*bits).alias("bucket")
    )
    from feray_spark.functions.vectors import cosine_similarity

    a, b = tagged.alias("a"), tagged.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"b.{id_col}") < F.col(f"a.{id_col}")),
        )
        .filter(
            cosine_similarity(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
            >= F.lit(tau)
        )
        .select(F.col(f"a.{id_col}").alias(id_col))
    )
    return tagged.select(id_col, "bucket").join(dropped, id_col, "left_anti")
