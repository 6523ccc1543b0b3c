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
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from feray_spark.functions.vectors import cosine_similarity
from feray_spark.queries.util import fan_out


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
    c = fan_out(corpus.select(F.col(corpus_id), F.col(vec_col).alias("__cv")))
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.filter(F.col(query_id) != F.col(corpus_id))
    scored = pairs.withColumn("cosine", cosine_similarity("__qv", "__cv"))
    w = W.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


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
    Bucket id = bit pattern of sign(v · hyperplane_j).

    The planes live in ONE nested literal array and the whole bucket
    computation is a single nested higher-order expression — codegen
    emits loops over it, where the unrolled per-plane alternative
    compiles (n_tables * n_planes) fold bodies and its cold JIT cost
    dwarfs the actual math."""
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    planes_lit = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in planes[t, j]])
                    for j in range(n_planes)
                ]
            )
            for t in range(n_tables)
        ]
    )

    def plane_bit(plane: Column) -> Column:
        d = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return (d >= 0).cast("bigint")

    # fold the table's planes high-bit-first: acc*2 + bit ends with
    # plane 0 in the LSB — identical ids to the unrolled bit-shift sum
    buckets = F.transform(
        planes_lit,
        lambda tbl: F.aggregate(
            F.reverse(tbl),
            F.lit(0).cast("bigint"),
            lambda acc, plane: acc * 2 + plane_bit(plane),
        ),
    )
    return df.withColumn("__buckets", buckets)


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
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any table,
    re-ranked by exact cosine. Same output schema as brute force."""
    qb = with_lsh_buckets(
        queries.select(F.col(query_id), F.col(vec_col).alias("__qv")).withColumnRenamed(
            "__qv", vec_col
        ),
        vec_col=vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables,
    ).select(
        query_id,
        F.col(vec_col).alias("__qv"),
        F.posexplode("__buckets").alias("table_idx", "bucket"),
    )
    cb = with_lsh_buckets(
        corpus.select(F.col(corpus_id), F.col(vec_col)),
        vec_col=vec_col, dim=dim, n_planes=n_planes, n_tables=n_tables,
    ).select(
        corpus_id,
        F.col(vec_col).alias("__cv"),
        F.posexplode("__buckets").alias("table_idx", "bucket"),
    )
    cand = (
        fan_out(qb).join(cb, ["table_idx", "bucket"])
        .filter(F.col(query_id) != F.col(corpus_id))
        .select(query_id, corpus_id, "__qv", "__cv")
        .distinct()
    )
    scored = cand.withColumn("cosine", cosine_similarity("__qv", "__cv"))
    w = W.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
