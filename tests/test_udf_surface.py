"""Unit tests for the §2.10 surfaces the differential suite can't
express: the F6 external-job protocol and F7 isolation behavior."""

from __future__ import annotations

import sys

from feray_spark.external import run_external_job
from feray_spark.operators.fanout import isolated_map


def test_external_job_reports_metadata_and_version():
    res = run_external_job(
        [sys.executable, "-m", "feray_spark.external"],
        extras={"param": "value"},
    )
    assert res.returncode == 0
    assert res.data_version == "alpha"
    assert res.metadata == {"rows": 3, "echo": "value"}


def test_external_job_failure_is_isolated():
    res = run_external_job([sys.executable, "-c", "raise SystemExit(3)"])
    assert res.returncode == 3
    assert res.metadata == {} and res.data_version is None


def test_isolated_map_survives_poison_records(spark):
    df = spark.createDataFrame([(1,), (0,), (4,)], "event_id long")
    rows = {
        r["event_id"]: r
        for r in isolated_map(
            df, lambda row: 10 / row["event_id"], id_col="event_id"
        ).collect()
    }
    assert rows[1]["status"] == "ok" and rows[1]["result"] == 10.0
    assert rows[4]["status"] == "ok" and rows[4]["result"] == 2.5
    assert rows[0]["status"] == "error" and rows[0]["result"] is None
    assert "ZeroDivisionError" in rows[0]["error"]


def test_grouped_partial_agg_keeps_null_key_group(spark):
    """Spark groupBy emits a NULL-key group; the mapInPandas
    partial-combine path must too (pandas groupby defaults to
    dropna=True, which would silently lose those rows)."""
    from pyspark.sql import functions as F

    from feray_spark.operators.grouped import grouped_partial_agg

    df = spark.createDataFrame(
        [(1, 2.0), (None, 3.0), (None, 5.0), (2, 7.0)], "k int, v double"
    )
    got = {
        r.k: (r.count_v, r.min_v, r.max_v)
        for r in grouped_partial_agg(df, "k", "v",
                                     ops=("count", "min", "max")).collect()
    }
    want = {
        r.k: (float(r["count(v)"]), r["min(v)"], r["max(v)"])
        for r in df.groupBy("k").agg(
            F.count("v").alias("count(v)"),
            F.min("v").alias("min(v)"),
            F.max("v").alias("max(v)"),
        ).collect()
    }
    assert got == want and None in got


def test_external_job_null_metadata_degrades_to_empty():
    """A well-formed channel with "metadata": null (a non-Python
    child's report) must not break ExternalResult.metadata: dict."""
    child = (
        "import json, os; "
        "p = os.environ['FERAY_PIPES_CHANNEL']; "
        "json.dump({'metadata': None, 'data_version': 'v1'}, open(p, 'w'))"
    )
    res = run_external_job([sys.executable, "-c", child])
    assert res.returncode == 0
    assert res.metadata == {}
    assert res.data_version == "v1"


def test_isolated_map_rejects_reserved_id_col(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "status long")
    with pytest.raises(ValueError, match="reserved"):
        isolated_map(df, lambda r: 1.0, id_col="status")
