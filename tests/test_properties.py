"""Property-based tests (SURVEY §5.2.4) — algebraic identities that
catch canonicalization and rewrite bugs the example-based oracle
tests can miss. Hypothesis generates the frames; each property runs
a bounded number of examples against the shared local session
(deadline off: Spark job latency is not what's under test).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from feray_spark.functions.hashing import row_version
from feray_spark.queries.util import exact_grouped_sums, scaled_long

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: money-like doubles: exactly 2 fractional digits, magnitudes the
#: fixtures use
money = st.integers(min_value=-10_000_00, max_value=10_000_00).map(
    lambda c: c / 100.0
)
keys = st.sampled_from(["a", "b", "c"])
rows = st.lists(st.tuples(keys, money), min_size=1, max_size=40)


@given(data=rows)
@settings(**SETTINGS)
def test_exact_grouped_sums_matches_decimal_reference(spark, data):
    """The two-level long-partial/decimal-final sum must equal the
    single-level decimal sum (the oracle's arithmetic) exactly —
    for any grouping and any partitioning."""
    df = spark.createDataFrame(data, "k string, v double").repartition(4)
    got = {
        r["k"]: r["s"]
        for r in exact_grouped_sums(
            df, ["k"], money={"s": (scaled_long("v"), 100)}
        ).collect()
    }
    want = {
        r["k"]: r["s"]
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"))
        .collect()
    }
    assert got == want


@given(data=rows, threshold=money)
@settings(**SETTINGS)
def test_filter_pushdown_equivalence(spark, data, threshold):
    """filter(p) through the engine == row-wise Python filter of the
    same rows (predicate pushdown/codegen must not change
    semantics), including NULL-free comparison edges."""
    df = spark.createDataFrame(data, "k string, v double")
    got = sorted((r["k"], r["v"]) for r in df.filter(F.col("v") > threshold).collect())
    want = sorted((k, v) for k, v in data if v > threshold)
    assert got == want


@given(data=rows)
@settings(**SETTINGS)
def test_inner_join_commutative(spark, data):
    """A ⋈ B == B ⋈ A (as multisets, modulo column order)."""
    df = spark.createDataFrame(data, "k string, v double")
    other = spark.createDataFrame(
        [("a", 1), ("b", 2), ("z", 9)], "k string, tag int"
    )
    ab = sorted(
        (r["k"], r["v"], r["tag"]) for r in df.join(other, "k").collect()
    )
    ba = sorted(
        (r["k"], r["v"], r["tag"])
        for r in other.join(df, "k").select("k", "v", "tag").collect()
    )
    assert ab == ba


@given(data=rows)
@settings(**SETTINGS)
def test_row_version_stable_under_column_reorder(spark, data):
    """FS1: the record hash canonicalizes by the EXPLICIT column list,
    so physically reordering the input columns must not change any
    _data_version (hash-stability property from SURVEY §5.2.4)."""
    df = spark.createDataFrame(data, "k string, v double")
    cols = [F.col("k"), scaled_long("v")]
    h1 = [r["h"] for r in df.select(row_version(cols).alias("h")).collect()]
    h2 = [
        r["h"]
        for r in df.select("v", "k").select(row_version(cols).alias("h")).collect()
    ]
    assert h1 == h2


@given(
    vals=st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_global_sum_scaled_long_exact(spark, vals):
    """Scaled-long totals of 2-decimal money equal exact integer
    arithmetic regardless of partition count (order-independence of
    the exact-agg path at the whole-relation level)."""
    cents = [round(v * 100) for v in vals]
    data = [(c / 100.0,) for c in cents]
    df = spark.createDataFrame(data, "v double").repartition(5)
    got = exact_grouped_sums(
        df, [], money={"s": (scaled_long("v"), 100)}
    ).collect()[0]["s"]
    want = float(sum(cents)) / 100.0  # exact: ints, then one division
    assert got == pytest.approx(want, abs=0.0) or (
        math.isnan(got) and math.isnan(want)
    )
