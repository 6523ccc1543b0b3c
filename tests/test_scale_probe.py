"""Regression tests for scripts/scale_probe.py's data construction.

The probe's growth ratios are only honest if the replica transform
holds two properties (docs/BENCH_NOTES.md publishes numbers that
depend on both):

1. Cross-replica DISJOINTNESS: no token (hence no shingle) appears in
   two replicas — otherwise near-dup candidate pairs span replicas
   and measured work grows quadratically in the factor. The
   fixed-width suffix makes this provable (equal-length suffixes on
   equal total strings force equal replicas), where bare ids aliased
   e.g. fixture token 'foo1' + replica 0 with 'foo' + replica 10.
2. Within-replica PRESERVATION: every replica keeps the fixture's
   internal duplicate structure (all docs transform alike), so the
   per-replica work matches the fixture's.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from scale_probe import FORMAT_VERSION, KEYSPACE, build_scaled  # noqa: E402


@pytest.fixture(scope="module")
def scaled12(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("probe12"))
    # factor 12 exercises the two-digit suffix range where bare
    # (variable-width) ids would alias digit-ended fixture tokens
    build_scaled(spark, sf_dir, out, 12)
    return out


def test_cross_replica_token_sets_are_disjoint(spark, scaled12):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(scaled12, "documents.parquet"))
    toks = docs.select(
        (F.col("doc_id") / KEYSPACE).cast("bigint").alias("replica"),
        F.explode(F.split(F.col("text"), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    # a token seen in >1 replica is exactly the aliasing bug
    collisions = (
        toks.groupBy("tok")
        .agg(F.countDistinct("replica").alias("n_reps"))
        .filter(F.col("n_reps") > 1)
        .count()
    )
    assert collisions == 0


def test_within_replica_dup_structure_is_preserved(spark, sf_dir, scaled12):
    from pyspark.sql import functions as F

    fixture = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = fixture.count()
    n_texts = fixture.select("text").distinct().count()
    docs = spark.read.parquet(os.path.join(scaled12, "documents.parquet"))
    per_rep = (
        docs.select(
            (F.col("doc_id") / KEYSPACE).cast("bigint").alias("replica"),
            "text",
        )
        .groupBy("replica")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("text").alias("n_distinct"),
        )
        .collect()
    )
    assert len(per_rep) == 12
    for row in per_rep:
        # identical per-replica counts = exact-dup structure preserved
        assert row["n"] == n_docs
        assert row["n_distinct"] == n_texts


def test_stale_format_cache_is_rebuilt(spark, sf_dir, tmp_path):
    out = str(tmp_path / "probe_fmt")
    build_scaled(spark, sf_dir, out, 2)
    marker = os.path.join(out, ".format_version")
    with open(marker) as fh:
        assert fh.read().strip() == str(FORMAT_VERSION)
    # poison the marker: the next build must rebuild rather than
    # silently reuse data written by older probe logic
    with open(marker, "w") as fh:
        fh.write("0")
    sentinel = os.path.join(out, "stale_artifact")
    with open(sentinel, "w") as fh:
        fh.write("x")
    build_scaled(spark, sf_dir, out, 2)
    assert not os.path.exists(sentinel)
    with open(marker) as fh:
        assert fh.read().strip() == str(FORMAT_VERSION)
