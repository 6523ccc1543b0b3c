"""Failure-isolated fan-out — SURVEY §2.10 F7.

The reference harvests Ray task results as they finish so one failed
record doesn't kill the job (`ray.wait` loop,
`examples/dagster_feray_example/defs/ray/ray_integration.py:24-34`).
The Spark-native shape: partitions are the fan-out, and per-record
isolation is a try/except INSIDE an Arrow-batched ``mapInPandas``
that emits a ``status`` column (``ok``/``error`` + message) instead
of raising. Scale notes: no shuffle is introduced — the map runs
where the data lives; a poisoned record costs one Python exception,
not a task retry (``spark.task.maxFailures`` stays the job-level
backstop for infrastructure failures).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def isolated_map(
    df: DataFrame,
    fn: Callable[[dict], float],
    *,
    id_col: str,
    result_schema: str | None = None,
) -> DataFrame:
    """Apply ``fn(row_dict) -> float`` per record; failures become
    rows with ``status='error'`` and the exception message rather
    than task failures. Output: (id_col, status, result, error).
    """
    if id_col in ("status", "result", "error"):
        # the dict-literal below would silently drop the id column and
        # fail deep inside Arrow conversion
        raise ValueError(
            f"id_col {id_col!r} collides with isolated_map's reserved "
            "output columns (status/result/error); rename it"
        )
    if id_col not in df.columns:
        # fail fast on the driver: row[id_col] would otherwise raise
        # a KeyError inside every executor task after spin-up — the
        # opaque failure mode every guard in this block pre-empts
        raise ValueError(
            f"id_col {id_col!r} not in the input columns {df.columns}"
        )
    schema = result_schema or f"{id_col} long, status string, result double, error string"
    if result_schema is not None:
        # run() always emits exactly (id_col, status, result, error):
        # a custom schema may retype them (e.g. a string id) but NOT
        # rename/reorder — that would fail deep in Arrow conversion,
        # the failure mode the id_col guard above exists to prevent
        # parse with the real DDL parser, not a string split: a
        # comma-parameterized type (decimal(20,0), map<string,long>)
        # is legal here and a naive split would falsely reject it
        from pyspark.sql.types import StructType, _parse_datatype_string

        expected = [id_col, "status", "result", "error"]
        try:
            parsed = _parse_datatype_string(result_schema)
        except Exception as e:
            raise ValueError(
                f"result_schema is not parseable DDL: {result_schema!r}"
            ) from e
        if not isinstance(parsed, StructType):
            raise ValueError(
                f"result_schema must be a struct DDL with columns "
                f"{expected}, got the bare type {result_schema!r}"
            )
        names = parsed.fieldNames()
        if names != expected:
            raise ValueError(
                f"result_schema must keep the column names/order "
                f"{expected}, got {names} — only the TYPES are "
                "customizable"
            )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, status, result, error = [], [], [], []
            for row in pdf.to_dict("records"):
                ids.append(row[id_col])
                try:
                    result.append(float(fn(row)))
                    status.append("ok")
                    error.append(None)
                except Exception as e:  # noqa: BLE001 — isolation is the point
                    result.append(None)
                    status.append("error")
                    error.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {id_col: ids, "status": status, "result": result, "error": error}
            )

    return df.mapInPandas(run, schema)
