"""Property-based tests (SURVEY §5.2.4) — algebraic identities that
catch canonicalization and rewrite bugs the example-based oracle
tests can miss. Hypothesis generates the frames; each property runs
a bounded number of examples against the shared local session
(deadline off: Spark job latency is not what's under test).
"""

from __future__ import annotations

import math
import os as _os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

#: deep-fuzz knob for the generated-tables nets: the suite default
#: (6 examples/net) keeps the 12-minute budget; a one-off hardening
#: pass runs FERAY_FUZZ_EXAMPLES=50 python -m pytest
#: tests/test_properties.py -k generated_tables (used before each
#: round's evidence freeze)
FUZZ_EXAMPLES = int(_os.environ.get("FERAY_FUZZ_EXAMPLES", "6"))

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


def test_row_version_is_injective_on_separator_content(spark):
    """FS1: the prefix-free framing means values containing the old
    separator/sentinel bytes can neither shift field boundaries
    (('a\\x1fb','c') vs ('a','b\\x1fc')) nor alias NULL ('\\x00')."""
    df = spark.createDataFrame(
        [("a\x1fb", "c"), ("a", "b\x1fc"), ("\x00", "x"), (None, "x")],
        "a string, b string",
    )
    hashes = [
        r["h"]
        for r in df.select(
            row_version([F.col("a"), F.col("b")]).alias("h")
        ).collect()
    ]
    assert len(set(hashes)) == 4  # all four rows distinct


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


_ts = st.integers(min_value=0, max_value=50_000)  # epoch seconds, small window


@given(
    points=st.lists(_ts, min_size=1, max_size=25),
    intervals=st.lists(st.tuples(_ts, st.integers(min_value=-100, max_value=9000)),
                       min_size=1, max_size=15),
    width=st.sampled_from([60, 3600, 7200]),
)
@settings(**SETTINGS)
def test_interval_bin_join_equals_naive(spark, points, intervals, width):
    """The bin join must produce EXACTLY the pairs of the naive
    inequality cross-join for any bin width — including empty and
    inverted intervals."""
    from feray_spark.operators.rangejoin import point_interval_join

    p = spark.createDataFrame(
        [(i, t) for i, t in enumerate(points)], "pid int, t long"
    ).select("pid", F.timestamp_seconds("t").alias("p_ts"))
    iv = spark.createDataFrame(
        [(i, lo, lo + dur) for i, (lo, dur) in enumerate(intervals)],
        "iid int, lo long, hi long",
    ).select(
        "iid",
        F.timestamp_seconds("lo").alias("lo"),
        F.timestamp_seconds("hi").alias("hi"),
    )
    got = {
        (r.pid, r.iid)
        for r in point_interval_join(
            p, iv, point_ts="p_ts", interval_lo="lo", interval_hi="hi",
            bin_width_sec=width,
        ).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in p.crossJoin(iv)
        .filter((F.col("p_ts") >= F.col("lo")) & (F.col("p_ts") < F.col("hi")))
        .collect()
    }
    assert got == naive


@given(
    left=st.lists(st.tuples(st.sampled_from(["u", "v"]), _ts), min_size=1, max_size=15),
    right=st.lists(
        st.tuples(st.sampled_from(["u", "v"]), _ts, st.booleans()),
        min_size=1,
        max_size=20,
    ),
    exact=st.booleans(),
)
@settings(**SETTINGS)
def test_asof_multi_equals_chained(spark, left, right, exact):
    """asof_join_multi (one union+window pass for N features) must
    equal chaining asof_join per feature against filtered copies —
    for any keys, duplicate timestamps, and either tie rule. Right
    payloads are made unique per (key, ts) so tie-breaking cannot
    differ between the shapes."""
    from feray_spark.operators.asof import asof_join, asof_join_multi

    # unique ts per right row within a key removes tie ambiguity
    seen = {}
    rrows = []
    for i, (k, t, flag) in enumerate(right):
        while (k, t) in seen:
            t += 1
        seen[(k, t)] = True
        rrows.append((k, t, flag, float(i)))
    l_df = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid int, k string, t long"
    ).select("lid", "k", F.timestamp_seconds("t").alias("ts"))
    r_df = spark.createDataFrame(
        rrows, "k string, t long, flag boolean, payload double"
    ).select("k", F.timestamp_seconds("t").alias("ts"), "flag", "payload")

    multi = asof_join_multi(
        l_df,
        r_df.select("k", "ts", "flag", "payload"),
        on=["k"],
        left_ts="ts",
        right_ts="ts",
        features={
            "_all": (None, ["payload"]),
            "_flagged": (F.col("flag"), ["payload"]),
        },
        allow_exact_matches=exact,
    ).select("lid", "payload_all", "payload_flagged")

    step1 = asof_join(
        l_df,
        r_df.select("k", "ts", "payload"),
        on=["k"],
        left_ts="ts",
        allow_exact_matches=exact,
        suffix="_all",
    )
    step2 = asof_join(
        step1,
        r_df.filter("flag").select("k", "ts", "payload"),
        on=["k"],
        left_ts="ts",
        allow_exact_matches=exact,
        suffix="_flagged",
    ).select("lid", "payload_all", "payload_flagged")

    canon = lambda df: sorted(  # noqa: E731
        (r.lid, r.payload_all, r.payload_flagged) for r in df.collect()
    )
    assert canon(multi) == canon(step2)


def test_asof_multi_tie_resolution_matches_chained(spark):
    """Duplicate (key, ts) right rows: multi's single-projection tie
    rule (frozen payload tuple ordering) must agree with chaining
    asof_join per feature when features share payload columns — the
    regression for the sequential-fill bug where later features read
    an already-mutated pay column out of the shared window's orderBy."""
    from feray_spark.operators.asof import asof_join, asof_join_multi

    l_df = spark.createDataFrame(
        [(0, "k", 10), (1, "k", 20)], "lid int, k string, t long"
    ).select("lid", "k", F.timestamp_seconds("t").alias("ts"))
    # three right rows tied at ts=10, mixed flags
    r_df = spark.createDataFrame(
        [("k", 10, True, 1.0), ("k", 10, False, 5.0), ("k", 10, True, 3.0)],
        "k string, t long, flag boolean, payload double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "flag", "payload")

    for exact in (True, False):
        multi = asof_join_multi(
            l_df,
            r_df,
            on=["k"],
            left_ts="ts",
            right_ts="ts",
            features={
                "_all": (None, ["payload"]),
                "_flagged": (F.col("flag"), ["payload"]),
            },
            allow_exact_matches=exact,
        ).select("lid", "payload_all", "payload_flagged")
        step1 = asof_join(
            l_df,
            r_df.select("k", "ts", "payload"),
            on=["k"],
            left_ts="ts",
            allow_exact_matches=exact,
            suffix="_all",
        )
        chained = asof_join(
            step1,
            r_df.filter("flag").select("k", "ts", "payload"),
            on=["k"],
            left_ts="ts",
            allow_exact_matches=exact,
            suffix="_flagged",
        ).select("lid", "payload_all", "payload_flagged")
        canon = lambda df: sorted(  # noqa: E731
            (r.lid, r.payload_all, r.payload_flagged) for r in df.collect()
        )
        assert canon(multi) == canon(chained), f"exact={exact}"


# --------------------------------------------------------------- BPE

_words_st = st.lists(
    st.tuples(
        st.text(alphabet="abcdef", min_size=1, max_size=8),
        st.integers(min_value=1, max_value=50),
    ),
    min_size=1,
    max_size=30,
)


@given(types=_words_st, n_merges=st.integers(min_value=0, max_value=30))
@settings(**SETTINGS)
def test_bpe_encode_is_lossless_and_monotone(types, n_merges):
    """For ANY corpus: encoding reconstructs every word exactly, more
    merges never lengthen an encoding, and learning is insensitive
    to input order (the determinism contract)."""
    from feray_spark.functions.bpe import EOW, encode_word, learn_bpe

    merges = learn_bpe(types, n_merges)
    assert merges == learn_bpe(list(reversed(types)), n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    fewer = {p: i for i, p in enumerate(merges[: max(0, n_merges - 1)])}
    for w, _ in types:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW
        assert len(toks) <= len(encode_word(w, fewer))


def test_asof_ignores_null_keys_and_null_right_ts(spark):
    """SQL ASOF semantics (DuckDB/polars): a right row with a NULL
    key or NULL timestamp can never match, and a NULL-key left row is
    left unmatched — the union+window rewrite must not let NULLS
    FIRST ordering or NULL-key partitioning leak payloads."""
    from feray_spark.operators.asof import asof_join

    l_df = spark.createDataFrame(
        [(1, "u", 10), (2, None, 10)], "lid int, k string, t long"
    ).select("lid", "k", F.timestamp_seconds("t").alias("ts"))
    r_df = spark.createDataFrame(
        [
            ("u", None, 111.0),   # NULL ts: never matches
            (None, 5, 222.0),     # NULL key: never matches
            ("u", 5, 333.0),      # the only legitimate match
        ],
        "k string, t long, payload double",
    ).select("k", F.timestamp_seconds("t").alias("ts"), "payload")

    rows = {
        r.lid: r.payload
        for r in asof_join(
            l_df, r_df, on=["k"], left_ts="ts", right_cols=["payload"]
        ).collect()
    }
    assert rows == {1: 333.0, 2: None}


def test_asof_rejects_output_column_collisions(spark):
    from feray_spark.operators.asof import asof_join

    l_df = spark.createDataFrame([(1, "u", 10)], "lid int, k string, ts long")
    r_df = spark.createDataFrame([("u", 5, 1.0)], "k string, ts long, lid double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(l_df, r_df, on=["k"], left_ts="ts", right_cols=["lid"])


def test_interval_join_rejects_nonpositive_bin_width(spark):
    from feray_spark.operators.rangejoin import point_interval_join

    p = spark.createDataFrame([(1, 10)], "pid int, t long").select(
        "pid", F.timestamp_seconds("t").alias("p_ts")
    )
    iv = spark.createDataFrame([(1, 0, 20)], "iid int, lo long, hi long").select(
        "iid",
        F.timestamp_seconds("lo").alias("lo"),
        F.timestamp_seconds("hi").alias("hi"),
    )
    with pytest.raises(ValueError, match="bin_width_sec"):
        point_interval_join(
            p, iv, point_ts="p_ts", interval_lo="lo", interval_hi="hi",
            bin_width_sec=0,
        )


texts = st.text(
    alphabet=st.characters(min_codepoint=9, max_codepoint=0x2FF),
    max_size=80,
)


@given(data=st.lists(texts, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_canonical_text_idempotent_and_closed(spark, data):
    """L1b's normalizer is a canonicalization in the algebraic sense:
    applying it twice equals applying it once (idempotence — the
    property that makes canonical keys stable across re-ingestion),
    and its output alphabet is closed over [a-z0-9] + single spaces
    with no edge whitespace, for ANY input including control chars,
    accents and non-ASCII."""
    from feray_spark.functions.text import canonical_text

    df = spark.createDataFrame([(i, t) for i, t in enumerate(data)],
                               "i long, t string")
    out = df.select(
        "i",
        canonical_text("t").alias("once"),
        canonical_text(canonical_text("t")).alias("twice"),
    ).collect()
    for r in out:
        assert r.once == r.twice
        assert r.once == r.once.strip()
        assert "  " not in r.once
        assert set(r.once) <= set("abcdefghijklmnopqrstuvwxyz0123456789 "), r.once


#: doubles that stress the drift fast-leg gate: money-like 2-decimal
#: values (the fast leg), many-digit fractions (the slow leg), and
#: raw IEEE doubles including subnormals/huge magnitudes/NaN/Inf
_drift_doubles = st.one_of(
    st.integers(min_value=-10**13, max_value=10**13).map(lambda c: c / 100.0),
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.just(None),
)


@given(
    data=st.lists(_drift_doubles, min_size=1, max_size=60),
    decimals=st.sampled_from([2, 3, 4]),
)
@settings(**SETTINGS)
def test_scaled_long_fast_leg_equals_round(spark, data, decimals):
    """scaled_long's round-11 fast leg (floor(c*10^d + 0.5) guarded
    by a bitwise y/10^d == c check) must equal the original
    ROUND(c*10^d) expression for ARBITRARY doubles — money-like,
    many-digit, huge, NaN/Inf/NULL — at every scale the catalog
    uses. This is the identity every dsum/davg/exact_grouped_sums
    consumer rides on."""
    from feray_spark.queries.util import scaled_long

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], "k long, v double"
    )
    out = df.select(
        scaled_long("v", decimals).alias("fast"),
        F.round(F.col("v") * (10**decimals)).cast("long").alias("ref"),
    ).collect()
    for r in out:
        assert r.fast == r.ref, (r, decimals)


@given(data=st.lists(_drift_doubles, min_size=1, max_size=60))
@settings(**SETTINGS)
def test_drift_fast_mean_equals_generic_mean(spark, data):
    """The drift report's typed exact-mean fast path (per-row long
    arithmetic for 2-decimal-representable doubles, conditional
    decimal cast for the rest) must equal the generic
    cast-to-decimal(28,9) leg EXACTLY for arbitrary IEEE doubles —
    the property the 64x fs10 win rests on."""
    from feray_spark.features.drift import drift_report

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(data)], "k long, v double"
    )
    base = df.filter(F.col("k") % 2 == 0)
    fast = drift_report(base, df, ["v"]).collect()[0]
    gen = drift_report(base, df, ["v"], _force_generic=True).collect()[0]
    for x, y in zip(fast, gen):
        if isinstance(x, float) and isinstance(y, float) and math.isnan(x):
            assert math.isnan(y)
        else:
            assert x == y, (fast, gen)


def test_asof_join_with_map_payload_column(spark):
    """A map-typed right payload column must ride along without making
    the tie window unplannable (maps cannot enter an ORDER BY); the
    deterministic tiebreaker uses only the orderable payload columns."""
    from feray_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 20)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 5, "a", {"x": 1}), (1, 15, "b", {"y": 2})],
        "k int, ts int, v string, m map<string,int>",
    )
    out = {
        r.ts: (r.v, r.m)
        for r in asof_join(left, right, ["k"], "ts").collect()
    }
    assert out[10] == ("a", {"x": 1})
    assert out[20] == ("b", {"y": 2})


def test_salted_join_spreads_identical_hot_rows(spark):
    """Byte-identical hot-key rows (duplicated events — the common
    real-world skew) must spread across salts; a content-derived salt
    would give them all one value and leave the hot key on one
    reducer."""
    from feray_spark.operators.skew import _SALT, salted_join  # noqa: F401
    from pyspark.sql import functions as F

    large = spark.createDataFrame(
        [(1, "same")] * 64, "k int, payload string"
    ).repartition(8)
    salted = large.withColumn(
        "__salt_probe",
        F.pmod(F.monotonically_increasing_id(), F.lit(8)),
    )
    n_salts = salted.select("__salt_probe").distinct().count()
    assert n_salts > 1  # identical rows land on multiple salts

    # and the join result is unaffected by salting
    small = spark.createDataFrame([(1, "dim")], "k int, d string")
    joined = salted_join(large, small, ["k"], salts=8)
    assert joined.count() == 64
    assert joined.select("d").distinct().collect()[0].d == "dim"


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # doc_id
            st.integers(min_value=0, max_value=4),   # pos
            st.sampled_from(["aa", "bb", "cc", "dd"]),  # chunk text
        ),
        min_size=1,
        max_size=40,
    ),
    valve=st.integers(min_value=0, max_value=6),
)
@settings(**SETTINGS)
def test_span_valve_path_equals_window_path(spark, data, valve):
    """L20's hot-span valve moves ONLY the physical strategy: for any
    span MULTISET (duplicate (id, pos) copies included — the case
    where naive winner-equality would keep every copy) and any
    document-frequency bound, the agg/join winner path must mark
    multiset-identical keeps to the plain rank window (the property
    the l20 oracle relies on to cover both paths with one SQL
    twin). Identical copies are interchangeable, so comparing the
    sorted (id, pos, chunk, keep) multisets is exact."""
    from feray_spark.operators.dedup import span_first_occurrence_flags

    spans = spark.createDataFrame(
        data, "doc_id long, pos long, chunk string"
    )
    key = lambda r: (r.doc_id, r.pos, r.chunk, r.keep)  # noqa: E731
    base = sorted(
        span_first_occurrence_flags(spans).collect(), key=key
    )
    valved = sorted(
        span_first_occurrence_flags(spans, max_span_df=valve).collect(),
        key=key,
    )
    assert base == valved


#: one generated row: (key, value, extra) — ``extra`` is only
#: written once the program's `evolve` op has widened the schema
_store_rows = st.lists(
    st.tuples(
        st.integers(0, 999),
        st.integers(-99, 99),
        st.one_of(st.none(), st.integers(-9, 9)),
    ),
    min_size=1,
    max_size=6,
)
_store_op = st.one_of(
    st.tuples(st.just("append"), _store_rows),
    st.tuples(st.just("overwrite"), _store_rows),
    st.tuples(st.just("merge"), _store_rows),
    st.tuples(
        st.just("replace_where"),
        st.tuples(st.integers(0, 999),
                  st.lists(st.tuples(st.integers(0, 999),
                                     st.integers(-99, 99),
                                     st.one_of(st.none(),
                                               st.integers(-9, 9))),
                           min_size=0, max_size=6)),
    ),
    st.tuples(st.just("restore"), st.integers(min_value=0, max_value=100)),
    # schema evolution: a merge_schema append that widens to (k,v,w)
    st.tuples(st.just("evolve"), _store_rows),
    # concurrent writers: a SECOND handle commits, then this handle's
    # write pinned to the now-stale base must raise (optimistic CAS)
    st.tuples(st.just("race"), _store_rows),
)


@given(ops=st.lists(_store_op, min_size=1, max_size=7))
@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_table_store_matches_reference_model(spark, ops):
    """Model-based check of the versioned log: an arbitrary program of
    append / overwrite / MERGE / replaceWhere / RESTORE / schema
    EVOLUTION / two-writer RACE against the segment-log store must
    match a plain dict model after EVERY commit, the commit's
    recorded row_count must match, and every historical version must
    time-travel back to its exact snapshot (including its schema
    WIDTH — restore adopts the target's schema, so restoring past an
    evolution narrows the table again). Batches are keyed uniquely
    (appends skip keys already present) so MERGE's whenMatched
    semantics are unambiguous. The race op drives the optimistic CAS:
    a second TableStore handle commits, then this handle's write
    pinned to the stale base must raise ConcurrentWriteError and, per
    the contract, leave NO commit behind. Model values are (v, w)
    pairs; pre-evolution segments read the evolved column as NULL."""
    import shutil
    import tempfile

    import pytest as _pytest

    from feray_spark.sources.table_store import (
        ConcurrentWriteError,
        TableStore,
    )

    root = tempfile.mkdtemp(prefix="store_model_")
    try:
        ts = TableStore(root)
        ts2 = TableStore(root)  # the interleaving second writer

        def df_of(rows, wide):
            if wide:
                data = [(k, v, w) for k, v, w in rows]
                schema = "k long, v long, w long"
            else:
                data = [(k, v) for k, v, _ in rows]
                schema = "k long, v long"
            return spark.createDataFrame(data, schema)

        def val(row, wide):
            k, v, w = row
            return k, (v, w if wide else None)

        evolved = False
        model: dict[int, tuple[int, int | None]] = {}
        ts.write(df_of([], False), "t", mode="overwrite")
        snapshots = {ts.latest_version("t"): (dict(model), evolved)}
        for op in ops:
            if op[0] in ("append", "race", "evolve"):
                wide = evolved or op[0] == "evolve"
                rows = {k: vw for k, vw in
                        (val(r, wide) for r in op[1]) if k not in model}
                batch = [(k, v, w) for k, (v, w) in rows.items()]
                if op[0] == "race":
                    stale = ts.latest_version("t")
                    ts2.write(df_of(batch, evolved), "t", mode="append")
                    with _pytest.raises(ConcurrentWriteError):
                        ts.write(df_of(batch, evolved), "t",
                                 mode="append", expected_base=stale)
                elif op[0] == "evolve":
                    ts.write(df_of(batch, True), "t", mode="append",
                             merge_schema=True)
                    if not evolved:
                        # the enforcement twin: once widened, a
                        # narrow append without the flag must raise
                        with _pytest.raises(ValueError):
                            ts.write(df_of([(0, 0, None)], False),
                                     "t", mode="append")
                    evolved = True
                else:
                    ts.write(df_of(batch, evolved), "t", mode="append")
                model.update(rows)
            elif op[0] == "overwrite":
                rows = dict(val(r, evolved) for r in op[1])
                batch = [(k, v, w) for k, (v, w) in rows.items()]
                ts.write(df_of(batch, evolved), "t", mode="overwrite")
                model = dict(rows)
            elif op[0] == "merge":
                rows = dict(val(r, evolved) for r in op[1])
                batch = [(k, v, w) for k, (v, w) in rows.items()]
                ts.merge(spark, "t", df_of(batch, evolved), keys=["k"])
                model.update(rows)
            elif op[0] == "replace_where":
                cut, raw = op[1]
                rows = {k: vw for k, vw in
                        (val(r, evolved) for r in raw) if k >= cut}
                batch = [(k, v, w) for k, (v, w) in rows.items()]
                ts.replace_where(spark, "t", df_of(batch, evolved),
                                 f"k >= {cut}")
                model = {k: vw for k, vw in model.items() if k < cut}
                model.update(rows)
            else:  # restore
                versions = sorted(snapshots)
                target = versions[op[1] % len(versions)]
                ts.restore("t", target)
                model, evolved = (dict(snapshots[target][0]),
                                  snapshots[target][1])
            head = ts.commit_info("t")
            snapshots[head.version] = (dict(model), evolved)
            read = ts.read(spark, "t").collect()
            got = {r.k: (r.v, r.w if evolved else None) for r in read}
            assert got == model, (op[0], got, model)
            assert head.row_count == len(model), (op[0], head.row_count)
        # every historical version must still read as its snapshot,
        # with its own schema width
        for v, (snap, wide) in snapshots.items():
            read = ts.read(spark, "t", version=v).collect()
            got = {r.k: (r.v, r.w if wide else None) for r in read}
            assert got == snap, (v, got, snap)
            assert all(("w" in r.asDict()) == wide for r in read), v
    finally:
        shutil.rmtree(root, ignore_errors=True)


# --------------------------------------------------------------------
# Generative differential parity (the dirty-fixture net, generalized):
# hypothesis builds a hostile events table — duplicate event ids, tied
# timestamps, NULL keys/payloads/values, malformed JSON — and the REAL
# registered queries must hold cross-engine parity on every draw, not
# just on the fixed edge rows tests/test_dirty_edges.py plants.

_EV_TS = [
    __import__("datetime").datetime(1999, 1, 1, 0, m) for m in (0, 7, 30)
]
_ev_rows = st.lists(
    st.tuples(
        st.integers(900_000, 900_004),              # id collisions likely
        st.one_of(st.none(), st.sampled_from(_EV_TS)),  # NULL + ties
        st.one_of(st.none(), st.integers(0, 3)),    # user_id
        st.one_of(st.none(), st.sampled_from(["a", "zzz", "<|x|>"])),
        st.one_of(st.none(), money),                # value
        st.sampled_from([None, 'not json', '{"k": 3}', '5',
                         '{"a":1,"k":2}', '{"k":"1.5d"}', '{"k":"1_000"}',
                         '{"k":"1e3"}', '{"k":"1e20"}', '{"k":"1e999"}']),
    ),
    min_size=0,
    max_size=25,
)

#: queries whose semantics the generated table can stress: dedup
#: winner rule (t5), the stateful cents fold (t6), event-time
#: bucketing + dsum (t1), JSON guards (f_json_family)
_EV_QUERIES = (
    "t5_dedup",
    "t6_stateful_running",
    "t1_tumbling_window",
    "f_json_family",
)


@given(data=_ev_rows)
@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_event_queries_hold_parity_on_generated_tables(
    spark, tmp_path_factory, data
):
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from feray_spark.queries import load_all
    from tests.conftest import SF_DIR
    from tests.oracle_utils import assert_parity

    sf = SF_DIR
    root = str(tmp_path_factory.mktemp("sf_gen"))
    schema = pq.read_schema(os.path.join(sf, "events.parquet"))
    rows = [
        dict(event_id=e, ts=t, user_id=u, event_type=y, value=v, props=p)
        for e, t, u, y, v, p in data
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(root, "events.parquet"),
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copy(os.path.join(sf, f"{t}.parquet"),
                    os.path.join(root, f"{t}.parquet"))
    reg = load_all()
    for name in _EV_QUERIES:
        assert_parity(spark, root, reg[name])


# --------------------------------------------------------------------
# Generative differential parity #2 (VERDICT r6 item 6): hostile
# DOCUMENTS and EMBEDDINGS tables. The round-6 dirty sweep planted
# FIXED text/vector edge rows; this net draws them — NULL/empty/
# whitespace/unicode/regex-metachar texts, mismatched n_chars,
# decimal- and exponent-suffix sources, NULL/empty/zero/tiny vectors,
# NULL labels — and the registered text/embedding queries must hold
# cross-engine parity on every draw.

#: text pool: every class the canon_lower / tokenizer / shingle /
#: span-dedup pins exist for, plus exact-dup pairs (two draws of the
#: same string collide across rows)
_DOC_TEXTS = [
    None, "", "x", "   ", "\t\r\n",
    "dup text dup text",
    "the a of and to in quality words here",
    "CafÉ İstanbul STRASSE ß ΑΣ ΤΕΛΟΣ ςigma",
    "nbsp ideographic　zero​width regex []()*+?^$|\\ 汉字テスト",
    "aaa aaa aaa aaa aaa aaa aaa aaa",
    "one",
]
_DOC_ROWS = st.lists(
    st.tuples(
        st.sampled_from(_DOC_TEXTS),
        st.one_of(st.none(), st.sampled_from(["en", "xx", "tr"])),
        # sources exercise the l17/l29 suffix parse: missing, short,
        # integer, decimal (truncate-vs-round pin), exponent (grammar
        # pin), non-numeric
        st.one_of(st.none(), st.sampled_from(
            ["edge", "src1", "src3.7", "src1e3", "srcabc", "s",
             "src1.5d", "src1_000"])),
        # n_chars independent of text: mismatches must stay parity-
        # safe (l4's n_chars_ok compares, never trusts)
        st.one_of(st.none(), st.integers(-1, 40)),
    ),
    min_size=0,
    max_size=20,
)

#: vector pool: NULL / empty / all-zero (0/0 cosine) / constant /
#: alternating-sign / tiny-norm (underflow-ish) — all full dim-64
#: (ragged dims are refused upstream by schema, not by the ops)
_VEC_POOL = [
    None,
    [],
    [0.0] * 64,
    [1.0] * 64,
    [(-1.0) ** i for i in range(64)],
    [1e-20] * 64,
    [float(i) / 64.0 for i in range(64)],
]
_EMB_ROWS = st.lists(
    st.tuples(
        st.sampled_from(range(len(_VEC_POOL))),
        st.one_of(st.none(), st.integers(0, 2)),
    ),
    min_size=0,
    max_size=12,
)

#: per-draw query set: canonical dedup winner rule (l1b), the text-
#: stats fold family (l4), span reassembly (l20), the double-route
#: weight parse (l17), chunking's zero-word edge (l8) — and on the
#: embeddings side the sign-bucket pair rule (l24), the centroid
#: rank (l21) and the quantization folds (l27)
_DOC_QUERIES = (
    "l1b_canonical_dedup",
    "l4_text_stats",
    "l20_span_dedup",
    "l17_mixture_sampling",
    "l8_doc_chunking",
)
_EMB_QUERIES = (
    "l24_semantic_dedup",
    "l21_embedding_outliers",
    "l27_embedding_quantize",
)


@given(docs=_DOC_ROWS, embs=_EMB_ROWS)
@settings(max_examples=FUZZ_EXAMPLES, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_text_embedding_queries_hold_parity_on_generated_tables(
    spark, tmp_path_factory, docs, embs
):
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    from feray_spark.queries import load_all
    from tests.conftest import SF_DIR
    from tests.oracle_utils import assert_parity

    root = str(tmp_path_factory.mktemp("sf_gen2"))
    doc_schema = pq.read_schema(os.path.join(SF_DIR, "documents.parquet"))
    emb_schema = pq.read_schema(os.path.join(SF_DIR, "embeddings.parquet"))
    # unique ids: id-uniqueness is a fixture invariant every winner
    # tiebreak relies on — the hostile surface here is the VALUES
    doc_rows = [
        dict(doc_id=900_000 + i, text=t, lang=lg, source=s, n_chars=n)
        for i, (t, lg, s, n) in enumerate(docs)
    ]
    emb_rows = [
        dict(vec_id=900_000 + i, embedding=_VEC_POOL[v], label=lb)
        for i, (v, lb) in enumerate(embs)
    ]
    pq.write_table(pa.Table.from_pylist(doc_rows, schema=doc_schema),
                   os.path.join(root, "documents.parquet"))
    pq.write_table(pa.Table.from_pylist(emb_rows, schema=emb_schema),
                   os.path.join(root, "embeddings.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"),
                    os.path.join(root, f"{t}.parquet"))
    reg = load_all()
    for name in _DOC_QUERIES + _EMB_QUERIES:
        assert_parity(spark, root, reg[name])
