"""Cluster packaging artifact: the zip that ships ``feray_spark`` to
executors via ``spark-submit --py-files`` must be importable from the
archive alone and reproducible byte-for-byte."""

from __future__ import annotations

import os
import subprocess
import sys

from scripts.package import build
from tests.conftest import SF_DIR


def test_package_zip_imports_standalone_and_is_deterministic(tmp_path):
    out = str(tmp_path / "feray_spark.zip")
    entries = build(out)
    # the whole package tree is in there
    assert any(e.endswith(os.path.join("queries", "llm.py")) for e in entries)
    assert any(
        e.endswith(os.path.join("sources", "table_store.py")) for e in entries
    )
    assert all(not e.endswith((".pyc", ".pyo")) for e in entries)

    # what an executor does with --py-files: the zip goes on sys.path
    # and the package imports from it, with NO repo checkout around
    code = (
        f"import sys; sys.path.insert(0, {out!r}); "
        "import feray_spark.operators.asof, feray_spark.operators.dedup, "
        "feray_spark.functions.bpe, feray_spark.sources.table_store; "
        "print('zip-import-ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # away from the repo root
        timeout=120,
    )
    assert "zip-import-ok" in r.stdout, r.stderr

    # deterministic rebuild: artifact hash == code version
    out2 = str(tmp_path / "again.zip")
    build(out2)
    with open(out, "rb") as a, open(out2, "rb") as b:
        assert a.read() == b.read()


def test_package_zip_runs_a_query_on_spark(spark, tmp_path):
    """End-to-end: a SparkSession whose python path carries ONLY the
    zip (driver side here; ``--py-files`` gives executors the same
    view) runs a catalog query."""
    out = str(tmp_path / "feray_spark.zip")
    build(out)
    code = (
        f"import sys; sys.path.insert(0, {out!r})\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "         .config('spark.sql.shuffle.partitions', '2')\n"
        "         .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "from feray_spark.session import apply_semantics\n"
        "from feray_spark.queries import load_all\n"
        "apply_semantics(spark)\n"
        f"df = load_all()['a1_groupby_q1'].fn(spark, {SF_DIR!r})\n"
        "print('rows:', df.count())\n"
        "spark.stop()\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=300,
    )
    assert "rows: " in r.stdout, (r.stdout, r.stderr[-2000:])
