"""Differential-test harness: Spark result vs DuckDB oracle.

Local mirror of the driver's correctness gate (see FIXTURES.md
"Harness conventions"): run the Spark query and the oracle SQL on the
same parquet files, canonicalize both results (column-name order, row
sort, float rounding, timestamps to ISO-8601, arrays to tuples) and
assert equality. Queries are written so that all arithmetic is
order-independent (see feray_spark.queries.util), which makes the
comparison exact rather than approximate.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb

from feray_spark.catalog import TABLES, table_path

FLOAT_DECIMALS = 9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")  # Spark session TZ is pinned UTC; match it
    for t in TABLES:
        con.sql(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon_scalar(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, FLOAT_DECIMALS) + 0.0  # -0.0 -> 0.0
    if isinstance(v, Decimal):
        return round(float(v), FLOAT_DECIMALS) + 0.0
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(timespec="microseconds")
    if isinstance(v, _dt.date):
        # render dates as midnight timestamps so a DATE on one side
        # and a midnight TIMESTAMP on the other compare equal
        return _dt.datetime(v.year, v.month, v.day).isoformat(timespec="microseconds")
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_scalar(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((str(k), _canon_scalar(x)) for k, x in v.items()))
    # numpy scalars / pandas timestamps
    try:
        import numpy as np
        import pandas as pd

        if isinstance(v, np.ndarray):
            return tuple(_canon_scalar(x) for x in v.tolist())
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime().replace(tzinfo=None).isoformat(timespec="microseconds")
        if isinstance(v, np.generic):
            return _canon_scalar(v.item())
    except ImportError:  # pragma: no cover
        pass
    return str(v)


def canonicalize(pdf) -> list[tuple]:
    """pandas DataFrame -> sorted list of canonical row tuples, with
    columns ordered by name (the driver sorts columns by name too)."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = [tuple(_canon_scalar(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return rows


def assert_parity(spark, sf_dir: str, query) -> None:
    """Run query.fn on Spark and query.oracle on DuckDB; assert
    identical canonical results. Oracle-less queries only assert the
    Spark side runs and yields a stable schema."""
    sdf = query.fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if query.oracle is None:
        assert spark_pdf.shape[0] >= 0  # ran to completion
        return
    con = duck_connection(sf_dir)
    duck_pdf = con.sql(query.oracle).df()
    s_rows = canonicalize(spark_pdf)
    d_rows = canonicalize(duck_pdf)
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{query.name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"duck={sorted(duck_pdf.columns)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{query.name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    if s_rows != d_rows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
        ][:5]
        raise AssertionError(f"{query.name}: value mismatch, first diffs: {diffs}")
