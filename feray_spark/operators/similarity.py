"""Similarity search over embedding columns — SURVEY §2.12 L3.

Two paths:

- :func:`brute_force_topk` — exact cosine top-k: broadcast the query
  set against the corpus (corpus never shuffles), deterministic
  sequential-fold dot products, rank + filter. The right baseline,
  and at 100 TB the correct shape when the query set is small (the
  common "find neighbors for this batch" case).
- :func:`lsh_bucketed_topk` — the scale path for all-pairs-ish
  workloads: sign-random-projection buckets (hyperplane LSH). Each
  vector lands in one bucket per table; candidates are bucket
  collisions; exact cosine re-ranks candidates. Recall tunes with
  ``n_tables``/``n_planes``; the shuffle key is the bucket hash
  (uniform by construction). Defaults (3 planes x 6 tables) are
  tuned for weak neighbors (fixture best-cosine ~0.35 => per-plane
  agreement ~0.63); for real clustered embeddings raise n_planes
  (8-16) to shrink buckets — the candidate fraction drops
  geometrically while recall stays high.

Projection hyperplanes are generated from a seeded NumPy RNG on the
driver and shipped as literals — deterministic across runs and
cluster topologies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from feray_spark.functions.vectors import cosine_similarity, cosine_similarity_batch
from feray_spark.queries.util import fan_out, fence


def _dtype_of(df: DataFrame, name: str) -> str:
    """dtype of ``name`` resolved the way Spark resolves columns —
    exact match first, then case-insensitive (spark.sql.caseSensitive
    defaults to false, so ``F.col`` would have accepted the name)."""
    for c, t in df.dtypes:
        if c == name:
            return t
    low = name.lower()
    for c, t in df.dtypes:
        if c.lower() == low:
            return t
    raise KeyError(name)


def drop_invalid_vecs(df: DataFrame, vec_col: str) -> DataFrame:
    """NULL and EMPTY embeddings can neither be nor have neighbors
    (cosine is undefined: the fold path scores them NULL — 0/0 — and
    filters) — drop them up front so the numpy paths' ``np.stack``
    over an Arrow batch never meets a None or a ragged zero-length
    row and kills the task. Every ANN operator routes both of its
    sides through this, and registered queries that pre-filter their
    embedding inputs (l21) share it — public API so oracle pairs can
    depend on it without reaching into operator internals."""
    return df.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))


#: backward-compat alias for the pre-round-7 private name
_drop_null_vecs = drop_invalid_vecs


def _rank_topk(
    scored: DataFrame, query_id: str, corpus_id: str, k: int
) -> DataFrame:
    """Shared finishing rank: exact top-k per query under the
    documented total order (cosine desc, corpus id asc) — the ONE
    place the tie-break lives, so the brute-force/scan/LSH/IVF paths
    cannot drift apart."""
    w = W.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k: for each query vector the k most similar
    corpus vectors. Output: (q_id, c_id, cosine, rank)."""
    q = queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))
    # fan_out measured (via l3 at sf0.1, local[32]): 0.78 s with vs
    # 2.46 s without — the per-pair fold is the hottest loop here
    c = fan_out(corpus.select(F.col(corpus_id), F.col(vec_col).alias("__cv")))
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.filter(F.col(query_id) != F.col(corpus_id))
    # fenced cosine: without the fence, Catalyst inlines the isNotNull
    # filter below into the join condition, so every pair pays the
    # interpreted fold TWICE (condition + output projection; join
    # conditions get no subexpression elimination). The fence pins the
    # filter above the projection — one fold per pair.
    scored = pairs.withColumn(
        "cosine", fence(cosine_similarity("__qv", "__cv"), "double")
    )
    # zero-norm vectors give NULL cosine; Spark's desc sort puts NULLs
    # LAST, so without this filter a query with fewer than k finite
    # candidates would pad its top-k with NULL-cosine rows — while the
    # vectorized twin (exact_scan_topk) masks NaN pairs out. Filter so
    # the two stay row-identical, as documented.
    scored = scored.filter(F.col("cosine").isNotNull())
    return _rank_topk(scored, query_id, corpus_id, k)


def exact_scan_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k, vectorized: same semantics as
    :func:`brute_force_topk` but scored as one numpy matmul per Arrow
    batch against the broadcast query index (the `_broadcast_scan_topk`
    shape with an all-pairs candidate mask). ~30x the per-pair
    throughput of the interpreted fold at identical output; float64
    pairwise summation differs from the sequential fold by ~1 ulp.
    That drift touches VALUES only until two candidates are nearly
    tied — then the (cosine DESC, id) rank itself can flip vs a
    fold-scored engine. Use :func:`brute_force_topk` where bit-exact
    fold parity (values AND ranks) is required, e.g. differential
    testing against a sequential-fold oracle.
    Corpus never shuffles; the only shuffle ranks the tiny partial
    top-k (partitions x queries x k rows)."""
    qids, qM, qnorm = _index_pdf(queries, query_id, vec_col)

    def match_fn(cid, C):
        return np.ones((len(cid), len(qids)), dtype=bool)

    return _broadcast_scan_topk(
        corpus,
        query_id=query_id,
        corpus_id=corpus_id,
        vec_col=vec_col,
        k=k,
        qids=qids,
        qM=qM,
        qnorm=qnorm,
        match_fn=match_fn,
        qid_type=_dtype_of(queries, query_id),
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def _bucket_plan(
    dim: int, n_planes: int, n_tables: int, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """(flat, pow2) for :func:`_bucket_ids` — the ONE place the
    sign-projection bucket formula's constants are built, shared by
    with_lsh_buckets and lsh_bucketed_topk's broadcast path so the
    two physical shapes can never produce different candidate sets
    for identical inputs/seeds."""
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    flat = planes.reshape(n_tables * n_planes, dim).astype(np.float64).T
    pow2 = 1 << np.arange(n_planes, dtype=np.int64)  # plane j -> bit j
    return flat, pow2


def _bucket_ids(M: np.ndarray, flat: np.ndarray, pow2: np.ndarray) -> np.ndarray:
    """(n, n_tables) int64 bucket ids: bit pattern of sign(v·plane),
    plane 0 in the LSB. Zero rows short-circuit — a (0, 0) matrix
    would mismatch flat's (dim, ·) in the matmul."""
    n_tables = flat.shape[1] // len(pow2)
    if not len(M):
        return np.zeros((0, n_tables), dtype=np.int64)
    bits = (M @ flat) >= 0.0
    return (bits.reshape(len(M), n_tables, len(pow2)) * pow2).sum(axis=2)


def with_lsh_buckets(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Attach ``__buckets``: one sign-pattern bucket id per table.
    Bucket id = bit pattern of sign(v · hyperplane_j), plane 0 in the
    LSB.

    Computed as a vectorized pandas UDF: each Arrow batch becomes one
    (batch, dim) x (dim, n_tables*n_planes) matmul — per-row cost is
    a few nanoseconds, vs. interpreted per-element higher-order-
    function folds which dominated the wall-clock at any batch size.
    Planes come from a seeded driver-side RNG shipped in the closure,
    so bucket ids are deterministic across runs and cluster
    topologies. A NULL vector gets a NULL bucket array (posexplode
    then emits no candidate rows for it) instead of killing the task
    in np.stack."""
    flat, pow2 = _bucket_plan(dim, n_planes, n_tables, seed)

    @F.pandas_udf("array<long>")
    def bucket_ids(vecs: pd.Series) -> pd.Series:
        out = np.empty(len(vecs), dtype=object)
        ok = vecs.notna().to_numpy()
        if ok.any():
            mat = np.stack(vecs[ok].to_numpy()).astype(np.float64)
            ids = _bucket_ids(mat, flat, pow2)
            out[np.nonzero(ok)[0]] = list(ids)
        return pd.Series(out)

    return df.withColumn("__buckets", bucket_ids(F.col(vec_col)))


def _index_pdf(df: DataFrame, id_col: str, vec_col: str):
    """Collect (id, vector) to the driver as numpy: (ids, M, norms).
    NULL vectors are dropped (they can have no neighbors) and an
    empty frame (empty micro-batch, filter that matched nothing)
    returns empty arrays instead of letting np.stack raise its
    opaque 'need at least one array to stack'."""
    pdf = (
        drop_invalid_vecs(df, vec_col)
        .select(F.col(id_col), F.col(vec_col))
        .toPandas()
    )
    ids = pdf[id_col].to_numpy()
    if not len(pdf):
        return ids, np.zeros((0, 0)), np.zeros(0)
    M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    return ids, M, np.linalg.norm(M, axis=1)


def _broadcast_scan_topk(
    corpus: DataFrame,
    *,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    k: int,
    qids,
    qM,
    qnorm,
    match_fn,
    qid_type: str = "bigint",
) -> DataFrame:
    """Shared ANN fast path for a small (broadcastable) query set.

    One pass over the corpus, no candidate shuffle: each scan
    partition scores itself against the broadcast query index with a
    single numpy matmul per Arrow batch, keeps only candidate pairs
    allowed by ``match_fn`` (the LSH-collision / IVF-probed-cell
    mask), and emits a PARTIAL top-k per query. The final exact top-k
    ranks <= partitions x queries x k tiny rows — the only shuffle in
    the plan. Tie-breaking (cosine desc, corpus id asc) is identical
    in the partial and final ranks, so the partial cut is lossless.
    """
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((qids, qM, qnorm))

    def score(batches):
        b_qids, b_qM, b_qnorm = bc.value
        if not len(b_qids):  # empty query set: empty typed result
            return
        for chunk in batches:
            if not len(chunk):
                continue
            cid = chunk[corpus_id].to_numpy()
            C = np.stack(chunk[vec_col].to_numpy()).astype(np.float64)
            match = match_fn(cid, C)  # (n, nq) bool
            match &= cid[:, None] != b_qids[None, :]
            cn = np.linalg.norm(C, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (C @ b_qM.T) / np.outer(cn, b_qnorm)
            # zero-norm vectors (either side) give NaN cosine; numpy's
            # lexsort puts NaN LAST while Spark's desc rank puts NaN
            # first — mask them out entirely so the partial top-k cut
            # stays lossless and NaN never reaches the final rank
            match &= ~np.isnan(cos)
            out_q, out_c, out_s = [], [], []
            for j in range(len(b_qids)):
                rows = np.nonzero(match[:, j])[0]
                if not len(rows):
                    continue
                order = np.lexsort((cid[rows], -cos[rows, j]))[:k]
                sel = rows[order]
                # dtype inferred from the id value: ids are not
                # necessarily integers (string doc ids are the norm
                # for document corpora)
                out_q.append(np.full(len(sel), b_qids[j]))
                out_c.append(cid[sel])
                out_s.append(cos[sel, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        query_id: np.concatenate(out_q),
                        corpus_id: np.concatenate(out_c),
                        "cosine": np.concatenate(out_s),
                    }
                )

    cid_type = _dtype_of(corpus, corpus_id)
    # no fan_out: the per-batch numpy matmul is cheap next to an extra
    # round-robin exchange of the vectors (measured via l3b 0.45 s vs
    # 0.70 s with, l3c 0.69 s vs 0.96 s with; sf0.1, local[32]).
    # NULL-vec corpus rows are dropped scan-side (np.stack guard).
    cand = (
        drop_invalid_vecs(corpus, vec_col)
        .select(F.col(corpus_id), F.col(vec_col))
        .mapInPandas(
            score,
            f"{query_id} {qid_type}, {corpus_id} {cid_type}, cosine double",
        )
    )
    return _rank_topk(cand, query_id, corpus_id, k)


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 6,
    seed: int = 42,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any table,
    re-ranked by exact cosine. Same output schema as brute force.

    Two physical shapes, same candidate semantics:

    - ``broadcast_queries=True`` (default — the entry-point contract
      is a small query set): query vectors + bucket signatures ship
      as one broadcast; the corpus streams through a single
      mapInPandas that masks non-colliding pairs and emits partial
      top-k per partition. Zero candidate shuffle.
    - ``broadcast_queries=False`` (both sides huge): explicit bucket
      join keyed on (table, bucket). The collision join and candidate
      dedup move ONLY (id, table_idx, bucket) rows — vectors are
      attached after dedup.

    Growth knob (measured, scripts/l3b_knob_probe.py, 8x corpus,
    dim=64): recall drifts down slowly at fixed knobs (0.88 -> 0.84);
    ``n_tables += log2(K)`` restores it (0.92) at flat wall cost,
    while raising ``n_planes`` instead COLLAPSES recall (0.42 at 6
    planes) because each plane halves a near-pair's per-table
    collision probability. Rule: scale n_tables with corpus growth;
    raise n_planes only when per-bucket candidate volume (occupancy),
    not recall, is the bottleneck — and add tables to compensate."""
    if broadcast_queries:
        # the SAME constants/formula as with_lsh_buckets (shared
        # helpers), so both physical shapes produce identical
        # candidate sets for identical inputs/seeds
        flat, pow2 = _bucket_plan(dim, n_planes, n_tables, seed)

        qids, qM, qnorm = _index_pdf(queries, query_id, vec_col)
        qb = _bucket_ids(qM, flat, pow2)  # (nq, n_tables)

        def match_fn(cid, C):
            cb = _bucket_ids(C, flat, pow2)  # (n, n_tables)
            return (cb[:, None, :] == qb[None, :, :]).any(axis=2)

        return _broadcast_scan_topk(
            corpus,
            query_id=query_id,
            corpus_id=corpus_id,
            vec_col=vec_col,
            k=k,
            qids=qids,
            qM=qM,
            qnorm=qnorm,
            match_fn=match_fn,
            qid_type=_dtype_of(queries, query_id),
        )
    qb = with_lsh_buckets(
        queries.select(F.col(query_id), F.col(vec_col)),
        vec_col=vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables,
        seed=seed,
    ).select(query_id, F.posexplode("__buckets").alias("table_idx", "bucket"))
    cb = with_lsh_buckets(
        corpus.select(F.col(corpus_id), F.col(vec_col)),
        vec_col=vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables,
        seed=seed,
    ).select(corpus_id, F.posexplode("__buckets").alias("table_idx", "bucket"))
    # query buckets broadcast (the query set is small by contract of
    # this entry point): the corpus bucket stream map-side joins and
    # never shuffles
    # no fan_out: feeds a broadcast join, not per-row heavy work — the
    # measured analog (_broadcast_scan_topk via l3b/l3c) ran faster
    # without the extra exchange
    cand = (
        cb.join(F.broadcast(qb), ["table_idx", "bucket"])
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id)
        .distinct()
    )
    scored = (
        cand.join(
            F.broadcast(queries.select(F.col(query_id), F.col(vec_col).alias("__qv"))),
            query_id,
        )
        .join(corpus.select(F.col(corpus_id), F.col(vec_col).alias("__cv")), corpus_id)
        .withColumn("cosine", cosine_similarity_batch("__qv", "__cv"))
        # zero-norm pairs score NULL — drop them so the bucket-join
        # path agrees pair-for-pair with the broadcast scan path,
        # which masks NaN cosines out before its partial top-k
        .filter(F.col("cosine").isNotNull())
    )
    return _rank_topk(scored, query_id, corpus_id, k)


def embedding_neardup_pairs(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.4,
    max_index_rows: int = 1_000_000,
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 6,
) -> DataFrame:
    """L2/L3 bridge: exact embedding-cosine near-duplicate pairs —
    every (id_a, id_b, cosine) with cosine >= tau and id_a < id_b.

    Shape: broadcast-index scan. The (id, vector, norm) index is
    materialized once on the driver and broadcast; each corpus
    partition then scores itself against the index as one numpy
    matmul per Arrow batch inside mapInPandas — no shuffle at all,
    and the scan side streams. This is the embedding analog of a
    broadcast hash join, with the same applicability bound: the
    INDEX side must fit in executor memory (64-dim floats: ~0.5 GB
    per million vectors).

    The bound is ENFORCED, not advisory: past ``max_index_rows``
    (a cheap count up front) the operator automatically switches to
    :func:`embedding_neardup_pairs_bucketed` — LSH-bucketed
    candidate generation whose cost scales with bucket collisions,
    not n² — so a 100× corpus degrades to an approximate sub-
    quadratic plan instead of OOMing the driver. Callers that need
    exact pairs past the bound must partition the corpus themselves.

    float64 matmul; numpy's pairwise summation differs from a
    sequential fold by ~1 ulp, which vanishes under the harness's
    1e-9 canonical rounding — thresholds must keep a margin above
    that (fixtures: nearest gap to tau is >= 1e-5).
    """
    # NULL embeddings pair with nothing — dropped up front so neither
    # the driver index nor the executor np.stack meets a None
    sdf = drop_invalid_vecs(corpus, vec_col).select(F.col(id_col), F.col(vec_col))
    id_t = _dtype_of(corpus, id_col)  # string ids are the norm too
    out_schema = f"id_a {id_t}, id_b {id_t}, cosine double"
    if sdf.count() > max_index_rows:
        return embedding_neardup_pairs_bucketed(
            corpus,
            id_col=id_col,
            vec_col=vec_col,
            tau=tau,
            dim=dim,
            n_planes=n_planes,
            n_tables=n_tables,
        )
    pdf = sdf.toPandas()
    if not len(pdf):
        # empty corpus: an empty typed frame, not an opaque np.stack
        # ValueError (same guard as ivf_topk)
        return sdf.sparkSession.createDataFrame([], out_schema)
    ids = pdf[id_col].to_numpy()
    index = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(index, axis=1)
    bc = sdf.sparkSession.sparkContext.broadcast((ids, index, norms))

    def score(batches):
        bids, bM, bnorms = bc.value
        for chunk in batches:
            if not len(chunk):  # repartition can leave empty slots
                continue
            lid = chunk[id_col].to_numpy()
            L = np.stack(chunk[vec_col].to_numpy()).astype(np.float64)
            ln = np.linalg.norm(L, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (L @ bM.T) / np.outer(ln, bnorms)
            mask = (cos >= tau) & (lid[:, None] < bids[None, :])
            li, ri = np.nonzero(mask)
            yield pd.DataFrame(
                {"id_a": lid[li], "id_b": bids[ri], "cosine": cos[li, ri]}
            )

    return fan_out(sdf).mapInPandas(score, out_schema)


def embedding_neardup_pairs_bucketed(
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tau: float = 0.4,
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 6,
) -> DataFrame:
    """The 100-TB shape of :func:`embedding_neardup_pairs`: candidate
    pairs come from LSH bucket collisions (any of ``n_tables``
    tables), then exact cosine re-scores and ``tau`` filters — same
    output schema (id_a, id_b, cosine), id_a < id_b, approximate
    recall (pairs hashing apart in every table are missed; recall
    rises with n_tables and falls with n_planes, the standard
    hyperplane-LSH trade).

    Shuffle accounting: the collision self-join moves ONLY
    (id, table, bucket) rows — one shuffle on (table, bucket);
    candidate dedup is one shuffle on the pair id; vectors are
    attached AFTER dedup by two id-keyed joins, so full embeddings
    cross the wire O(candidates), never O(n²). Skewed buckets (dense
    regions) are the residual risk — raise n_planes to split them."""
    sdf = drop_invalid_vecs(corpus, vec_col).select(F.col(id_col), F.col(vec_col))
    b = with_lsh_buckets(
        sdf, vec_col=vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables
    ).select(F.col(id_col), F.posexplode("__buckets").alias("__t", "__b"))
    cand = (
        b.alias("x")
        .join(b.alias("y"), ["__t", "__b"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .distinct()
    )
    scored = (
        cand.join(
            sdf.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")),
            "id_a",
        )
        .join(
            sdf.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")),
            "id_b",
        )
        .withColumn("cosine", cosine_similarity_batch("__va", "__vb"))
    )
    return scored.filter(F.col("cosine") >= tau).select("id_a", "id_b", "cosine")


def _kmeans_refine(
    corpus: DataFrame, cent: np.ndarray, *, vec_col: str, iters: int
) -> np.ndarray:
    """Spherical k-means (Lloyd) refinement of an IVF centroid matrix,
    fully distributed: each iteration is one assign pass (the same
    one-matmul-per-Arrow-batch cell assignment the index uses) plus
    one elementwise-mean aggregation. The per-dimension means come
    from a posexplode → groupBy(cell, dim) avg — 2 shuffles of at
    most #cells × dim tiny rows each; only the (#cells, dim) centroid
    matrix ever reaches the driver, so the loop scales to arbitrary
    corpus sizes. Centroids are re-normalized per iteration (cosine
    geometry); empty cells keep their previous centroid. NULL and
    zero-norm vectors are excluded from the refinement (a zero
    vector has no direction — letting it into a cell's mean would
    drag that centroid toward the origin)."""
    spark = corpus.sparkSession
    for _ in range(iters):
        bc = spark.sparkContext.broadcast(cent)

        @F.pandas_udf("long")
        def assign(vecs: pd.Series) -> pd.Series:
            C = bc.value
            if not len(vecs):
                return pd.Series([], dtype="int64")
            mat = np.stack(vecs.to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            out = np.full(len(mat), -1, dtype="int64")  # -1 = no cell
            ok = norms > 0
            if ok.any():
                unit = mat[ok] / norms[ok, None]
                out[ok] = (unit @ C.T).argmax(axis=1)
            return pd.Series(out)

        # no fan_out: the posexplode + groupBy shuffle dominates; an
        # extra pre-exchange only adds latency (the l3b/l3c measured
        # pattern for cheap-vectorized-work-into-a-shuffle)
        means = (
            drop_invalid_vecs(corpus, vec_col)
            .select(F.col(vec_col).alias("__v"))
            .withColumn("__cell", assign(F.col("__v")))
            .filter(F.col("__cell") >= 0)
            .select("__cell", F.posexplode("__v").alias("__d", "__x"))
            .groupBy("__cell", "__d")
            .agg(F.avg("__x").alias("__m"))
            .collect()
        )
        nxt = cent.copy()  # empty cells keep their previous centroid
        for r in means:
            nxt[r["__cell"], r["__d"]] = r["__m"]
        norms = np.linalg.norm(nxt, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cent = nxt / norms
        bc.destroy()
    return cent


def _ivf_cell_plan(
    n: int, target_cells: int | None = None, max_cells: int = 65_536
) -> tuple[int, int]:
    """(target #cells, seed stride) for an IVF index over ``n`` vectors.

    Cells default to ~4·√n (the standard IVF nlist heuristic: cell
    population ~√n/4 keeps probe cost and assignment cost balanced),
    hard-capped at ``max_cells`` so the broadcast centroid matrix and
    the driver-side seed collect are BOUNDED for any corpus: 65 536
    cells × 64 dims × 8 B ≈ 34 MB at a billion-or-more vectors —
    never O(n) driver state. Pure function so the bound is unit-
    testable without building a giant corpus."""
    target = target_cells if target_cells is not None else 4 * int(n**0.5)
    target = max(8, min(int(target), max_cells, max(n, 1)))
    stride = max(1, n // target)
    return target, stride


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    query_id: str = "q_id",
    corpus_id: str = "c_id",
    vec_col: str = "embedding",
    k: int = 10,
    centroid_stride: int | None = None,
    target_cells: int | None = None,
    max_cells: int = 65_536,
    nprobe: int | None = None,
    broadcast_queries: bool = True,
    kmeans_iters: int = 0,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) coarse quantizer —
    the second scale path next to hyperplane LSH. Same output schema
    as brute force: (q_id, c_id, cosine, rank).

    Cells: corpus vectors whose id (numeric ids) or xxhash64(id)
    (string ids) is ≡ 0 mod the seed stride seed the centroids —
    deterministic sampled quantization for both id regimes (the
    standard random-init shortcut; a k-means refinement drops in via
    ``kmeans_iters`` without changing the dataflow). The stride derives from a target
    cell count (~4·√n, capped at ``max_cells`` — see
    :func:`_ivf_cell_plan`) via one cheap corpus count, so the cell
    count is BOUNDED at any corpus size; pass ``centroid_stride`` to
    pin it explicitly instead. The seed selection runs as a
    scan-level filter and is truncated to the target, so only
    ~target_cells centroid rows are ever collected to the
    driver — the full corpus is never driver-side materialized.
    Every corpus vector is assigned to its max-cosine cell by one
    numpy matmul per Arrow batch against the broadcast centroid
    matrix; each query probes its ``nprobe`` nearest cells.
    Candidates = corpus of the probed cells, re-ranked by exact
    cosine.

    ``nprobe`` defaults to a FIXED PROBED FRACTION — max(8, cells/4),
    i.e. ~25% of cells — rather than a fixed cell count: with the
    ~4·√n nlist heuristic a constant nprobe probes a shrinking
    fraction as the corpus grows and recall silently degrades with
    scale. Measured top-3 recall vs exact on the fixtures: nprobe=8
    over 176 cells (sf0.1) recalled 0.38; the cells/4 default
    recalls 0.74-0.93 across sf0.001-0.1, and one ``kmeans_iters``
    refinement pass lifts the sf0.1 point to 0.82 at the cost of an
    extra corpus scan per build. Candidate work stays sublinear
    (~n/4 vectors scored per query vs n for brute force); pin nprobe
    explicitly to trade recall for speed.

    Scale shape: the centroid matrix is the only broadcast state
    (#cells x dim — tens of thousands of cells at most for billions
    of vectors); the corpus partitions stream through cell
    assignment with no shuffle, then shuffle ONCE on the cell id for
    the candidate join. Recall/cost tunes with nprobe x cells:
    probed fraction ~= nprobe / #cells."""
    corpus = drop_invalid_vecs(corpus, vec_col)
    if centroid_stride is None:
        # one cheap count; the stride then bounds the seed collect to
        # ~n_cells rows before any driver materialization
        n = corpus.count()
        n_cells, centroid_stride = _ivf_cell_plan(n, target_cells, max_cells)
    else:
        n_cells = None  # explicit stride: caller owns the cell count
    # seed predicate by id TYPE: numeric ids keep the classic
    # (id % stride) == 0 systematic sample; string ids (the norm for
    # document corpora) get xxhash64(id) % stride instead — a raw
    # modulo would cast the string to NULL under the non-ANSI
    # session, match NOTHING, and silently degrade to the tiny
    # fallback (8 cells, nprobe >= cells = a full brute-force scan
    # per query with no warning). Both are deterministic and draw
    # ~n/stride seeds.
    numeric_id = _dtype_of(corpus, corpus_id).split("(")[0] in (
        "tinyint", "smallint", "int", "bigint", "decimal",
    )
    sid = F.col("__sid") if numeric_id else F.xxhash64(F.col("__sid"))
    seed = (
        corpus.select(F.col(corpus_id).alias("__sid"), F.col(vec_col).alias("__sv"))
        .filter(F.pmod(sid, F.lit(centroid_stride)) == 0)
        .toPandas()
    )
    if not len(seed):  # stride > n corner — fall back small
        seed = (
            corpus.select(
                F.col(corpus_id).alias("__sid"), F.col(vec_col).alias("__sv")
            )
            .orderBy("__sid")
            .limit(max(8, nprobe or 8))
            .toPandas()
        )
    if not len(seed):
        # genuinely empty corpus (a filtered partition that matched
        # nothing): no neighbors exist — return the empty result frame
        # instead of letting np.stack raise an opaque ValueError
        spark = corpus.sparkSession
        id_t = _dtype_of(queries, query_id)
        cid_t = _dtype_of(corpus, corpus_id)
        return spark.createDataFrame(
            [], f"{query_id} {id_t}, {corpus_id} {cid_t}, "
                "cosine double, rank int"
        )
    seed = seed.sort_values("__sid")
    if n_cells is not None:
        # deterministic trim (smallest ids win) of the rounding excess
        seed = seed.head(n_cells)
    if nprobe is None:
        # fixed probed FRACTION (~25% of actual cells), not a fixed
        # cell count — see the docstring's recall-vs-scale argument
        nprobe = max(8, len(seed) // 4)
    cent = np.stack(seed["__sv"].to_numpy()).astype(np.float64)
    cnorm = np.linalg.norm(cent, axis=1)
    if not (cnorm > 0).all():
        # a zero-norm seed would normalize to NaN and poison every
        # argmax it participates in — drop it from the quantizer
        cent = cent[cnorm > 0]
        cnorm = cnorm[cnorm > 0]
    if not len(cent):  # corpus of only zero vectors: nothing to probe
        spark = corpus.sparkSession
        id_t = _dtype_of(queries, query_id)
        cid_t = _dtype_of(corpus, corpus_id)
        return spark.createDataFrame(
            [], f"{query_id} {id_t}, {corpus_id} {cid_t}, "
                "cosine double, rank int"
        )
    cent = cent / cnorm[:, None]
    if kmeans_iters:
        cent = _kmeans_refine(corpus, cent, vec_col=vec_col, iters=kmeans_iters)

    if broadcast_queries:
        # small-query fast path (the entry-point contract): centroids +
        # query probe lists ship in one broadcast; the corpus streams
        # through cell assignment and scoring in a single pass with no
        # candidate shuffle (see _broadcast_scan_topk)
        qids, qM, qnorm = _index_pdf(queries, query_id, vec_col)
        qid_type = _dtype_of(queries, query_id)
        if len(qM):
            qsims = (qM / qnorm[:, None]) @ cent.T
            probes = np.argsort(-qsims, axis=1)[:, :nprobe]  # (nq, nprobe)
        else:
            # zero queries collapse _index_pdf's matrix to (0, 0),
            # which would mismatch cent.T in the matmul (the same
            # empty-input guard as lsh_bucketed_topk's buckets())
            probes = np.zeros((0, nprobe), dtype=np.int64)

        def match_fn(cid, C):
            # zero-norm rows get cell -1 (match nothing) — their
            # cosine would be NaN-masked later anyway, but silencing
            # them here avoids the divide warnings and the wasted
            # candidate rows
            norms = np.linalg.norm(C, axis=1)
            cells = np.full(len(C), -1, dtype=np.int64)
            ok = norms > 0
            if ok.any():
                cells[ok] = ((C[ok] / norms[ok, None]) @ cent.T).argmax(axis=1)
            return (cells[:, None, None] == probes[None, :, :]).any(axis=2)

        return _broadcast_scan_topk(
            corpus,
            query_id=query_id,
            corpus_id=corpus_id,
            vec_col=vec_col,
            k=k,
            qids=qids,
            qM=qM,
            qnorm=qnorm,
            match_fn=match_fn,
            qid_type=qid_type,
        )

    bc = corpus.sparkSession.sparkContext.broadcast(cent)

    def _cells(vecs: pd.Series, top: int) -> pd.Series:
        C = bc.value
        if not len(vecs):  # empty Arrow batch
            return pd.Series([], dtype="int64" if top == 1 else object)
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        ok = norms > 0
        sims = np.full((len(mat), len(C)), -np.inf)
        if ok.any():
            sims[ok] = (mat[ok] / norms[ok, None]) @ C.T
        if top == 1:
            # zero-norm rows land in cell -1 (joins nothing; their
            # cosine would be NULL-filtered anyway)
            cells = np.where(ok, sims.argmax(axis=1), -1).astype("int64")
            return pd.Series(cells)
        idx = np.argsort(-sims, axis=1)[:, :top].astype("int64")
        return pd.Series(list(idx))

    @F.pandas_udf("long")
    def assign_cell(vecs: pd.Series) -> pd.Series:
        return _cells(vecs, 1)

    @F.pandas_udf("array<long>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        return _cells(vecs, nprobe)

    # no fan_out: one vectorized cell-assign then a broadcast join —
    # the extra exchange measured slower on this shape (l3b/l3c)
    cvec = corpus.select(F.col(corpus_id), F.col(vec_col)).withColumn(
        "__cell", assign_cell(F.col(vec_col))
    )
    qvec = (
        drop_invalid_vecs(queries, vec_col)
        .select(F.col(query_id), F.col(vec_col).alias("__qv"))
        .withColumn("__cell", F.explode(probe_cells(F.col("__qv"))))
    )
    scored = (
        cvec.join(F.broadcast(qvec), "__cell")
        .filter(F.col(query_id) != F.col(corpus_id))
        .withColumn("cosine", cosine_similarity_batch("__qv", vec_col))
        .filter(F.col("cosine").isNotNull())  # zero-norm pairs (see above)
    )
    return _rank_topk(scored, query_id, corpus_id, k)
