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
