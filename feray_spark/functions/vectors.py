"""Vector math over ``array<float>`` embedding columns — SURVEY §2.8
array family and §2.12 L3.

All operations are higher-order-function compositions
(`zip_with`/`aggregate`) that run inside whole-stage codegen — no
UDF, no Arrow transfer. Elements are cast float→double *before* any
arithmetic (exact) and accumulated as a sequential left fold, so
results are bit-identical to any engine that does the same
(the DuckDB oracle uses list_reduce for the same reason).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product of two equal-length float arrays."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    products = F.zip_with(a, b, lambda x, y: _d(x) * _d(y))
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: str | Column) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: _d(x) * _d(x))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """dot(a,b) / (|a||b|); NULL when either norm is 0 (division by
    zero yields NULL under the engine's non-ANSI semantics)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_similarity_batch(a: str | Column, b: str | Column) -> Column:
    """Vectorized cosine: one (batch, dim) numpy matmul per Arrow
    batch via a pandas UDF. ~30x the throughput of the interpreted
    per-element fold on 64-dim vectors — the right path when cosine
    sits on the hot side of a candidate join (ANN re-ranking).
    float64 accumulation; numpy's pairwise summation can differ from
    the sequential fold by ~1 ulp, so use :func:`cosine_similarity`
    where bit-parity with a sequential-fold oracle is required.
    Zero-norm vectors yield NULL, aligned with the fold (non-ANSI
    division returns NULL, and Spark sorts NULL last under desc
    while IEEE NaN would sort FIRST — emitting NaN here would
    reorder top-k results relative to the fold). A vector CONTAINING
    a NaN element keeps IEEE NaN, also aligned with the fold (the
    sequential fold propagates NaN; only a clean zero-norm hits the
    NULL-producing division) — mapping input-NaN rows to NULL would
    flip their desc-sort position and diverge the two paths' top-k.
    NULL vectors and RAGGED pairs (len(a) != len(b)) yield NULL per
    row, matching the fold twin (zip_with over NULL is NULL; a
    ragged pair NULL-pads the shorter side and the fold
    NULL-poisons) — np.stack on a ragged/None-bearing object array
    would otherwise kill the whole task for one bad row. Consistent
    pairs are scored whatever their dimension: rows are grouped BY
    PAIR LENGTH, never against the batch's first row, so a
    mixed-dimension table scores deterministically regardless of
    batch composition or row order."""

    @F.pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if not len(xs):  # empty Arrow batch
            return pd.Series([], dtype="float64")
        xv, yv = xs.to_numpy(), ys.to_numpy()
        len_x = np.array([len(v) if v is not None else -1 for v in xv])
        len_y = np.array([len(v) if v is not None else -2 for v in yv])
        ok = (len_x == len_y) & (len_x > 0)
        vals = np.zeros(len(xv), dtype=np.float64)
        mask = np.ones(len(xv), dtype=bool)  # True = NULL
        for dim in np.unique(len_x[ok]):
            sel = ok & (len_x == dim)
            mx = np.stack(xv[sel]).astype(np.float64)
            my = np.stack(yv[sel]).astype(np.float64)
            num = (mx * my).sum(axis=1)
            den = np.linalg.norm(mx, axis=1) * np.linalg.norm(my, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                out = num / den
            # NULL only for a CLEAN zero-norm (den == 0); a NaN that
            # came in through the data stays NaN like the fold (the
            # masked Float64 array keeps NaN-with-mask-False distinct
            # from NA, which pd.array() construction would conflate)
            has_nan = np.isnan(mx).any(axis=1) | np.isnan(my).any(axis=1)
            vals[sel] = out
            mask[sel] = np.isnan(out) & ~has_nan
        return pd.Series(pd.arrays.FloatingArray(vals, mask))

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)
