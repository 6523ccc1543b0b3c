"""Determinism helpers for oracle hash-parity (SURVEY §7.6 item 2/5).

Floating-point aggregation is order-dependent: Spark sums partitions
in shuffle order, DuckDB in scan order, and at ~60k rows the low bits
of a double SUM differ between the two engines. The driver hashes
values, so "almost equal" fails. Fix: do the arithmetic in DECIMAL
(exact, order-independent) and cast the *result* to DOUBLE, in BOTH
engines. The fixtures carry money-like doubles with 2 fractional
digits, so DECIMAL(18,2) loses nothing, and the final
decimal→double conversion is exact and identical on both sides.

Averages are expressed as exact-decimal SUM divided by COUNT: one
IEEE division of identical operands → identical doubles everywhere.

Same discipline in SQL strings (for the DuckDB side) and Column
expressions (for the Spark side).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


# ---------- Spark side ----------

def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column) -> Column:
    """Order-independent SUM of a money-like double, as double."""
    return F.sum(dec(col)).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c)


def dmul(a: Column, b: Column) -> Column:
    """Exact decimal product of two money-like columns."""
    return a.cast(DEC) * b.cast(DEC)


# ---------- DuckDB-SQL side ----------

def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({expr})"


# ---------- compute-parallelism guard ----------

def fan_out(df):
    """Ensure CPU-heavy per-row compute (hashing, shingling, JSON
    parse, cosine folds) sees at least cluster parallelism.

    Parquet scans parallelize by row group; a small input (or a
    badly-written upstream file) can arrive as 1 partition and pin
    per-row compute to one core while 31 idle. At 100 TB inputs have
    thousands of row groups and this is a no-op; the repartition only
    fires when upstream partitions < defaultParallelism, so it never
    adds a shuffle at scale — and when it does fire, the payload is
    by definition small."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
