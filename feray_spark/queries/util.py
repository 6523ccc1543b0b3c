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

#: the numeric-string grammar BOTH engines parse identically to
#: DOUBLE: optional ASCII whitespace, sign, plain decimal, optional
#: exponent. Outside it the parsers legitimately disagree (measured
#: bank, round 7): Spark/Java accepts '1.5d'/'1.5f' suffixes and
#: hex-floats '0x1.8p1' that DuckDB rejects, while DuckDB accepts
#: underscore separators '1_000' that Spark rejects. The whitespace
#: class is spelled out explicitly because the engines' \s differ:
#: Java's includes \x0B (vertical tab), RE2's does not — a VT-padded
#: numeric would pass the Spark guard (and Spark's cast trims VT) but
#: fail DuckDB's regexp_matches, a silent value-vs-NULL divergence.
#: The explicit class reads identically in both engines; no
#: lookaround.
PORTABLE_DOUBLE_RE = (
    r"^[ \t\n\r\f]*[+-]?((\d+(\.\d*)?)|(\.\d+))([eE][+-]?\d+)?[ \t\n\r\f]*$"
)


def portable_double(c: Column) -> Column:
    """Engine-portable numeric-string → DOUBLE: NULL outside the
    shared grammar, the (identical) parse inside it. Pair with
    :func:`sql_portable_double` on the oracle side — an unguarded
    cast pair silently diverges on Java float suffixes and DuckDB
    underscore separators. 'inf'/'nan' words fall outside the
    grammar → NULL on both sides (the callers' downstream guards
    kept them out of INT results anyway)."""
    return F.when(c.rlike(PORTABLE_DOUBLE_RE), c).cast("double")


def sql_portable_double(expr: str) -> str:
    """DuckDB twin of :func:`portable_double` over a VARCHAR
    expression (DuckDB single-quoted strings carry backslashes
    literally, so the pattern embeds verbatim)."""
    return (
        f"(CASE WHEN regexp_matches({expr}, '{PORTABLE_DOUBLE_RE}') "
        f"THEN TRY_CAST({expr} AS DOUBLE) END)"
    )


def trunc_int32(c: Column) -> Column:
    """Engine-portable numeric-string → INT: the double-first route.

    Twin of the oracle-side ``TRY_CAST(trunc(TRY_CAST(x AS DOUBLE))
    AS INT)`` discipline (f_json_family / f_variant_family). Spark's
    direct string→int cast TRUNCATES '3.7' where DuckDB's TRY_CAST
    ROUNDS, and rejects exponents ('1e3') that the double route
    accepts — so BOTH sides must go string → DOUBLE → truncate → INT.
    The guards pin the residual cast differences: Spark's NaN→int is
    0 and its overflow CLAMPS to INT_MIN/MAX where DuckDB's TRY_CAST
    yields NULL; the open interval (-2^31-1, 2^31) is exactly the set
    of doubles whose toward-zero truncation fits in an INT32.
    Takes a DOUBLE column (cast upstream so callers can reuse the
    parsed double)."""
    return F.when(
        c.isNotNull()
        & ~F.isnan(c)
        & (c > -2_147_483_649.0)
        & (c < 2_147_483_648.0),
        c,
    ).cast("int")


def trunc_int64(c: Column) -> Column:
    """Engine-portable DOUBLE → BIGINT: :func:`trunc_int32`'s int64
    mirror, twin of ``TRY_CAST(trunc(x) AS BIGINT)``.

    Pins the same residual cast differences at the 64-bit boundary:
    Spark's non-ANSI double→bigint cast CLAMPS out-of-range finite
    values (1e20 → LONG_MAX) and infinities (1e999 → LONG_MAX, which
    an isnan guard misses) where DuckDB's TRY_CAST yields NULL, and
    Spark's NaN→bigint is 0. The bounds use the exactly-representable
    doubles ±2^63: ``c >= -2^63`` (INT64_MIN itself is a valid
    result; no double exists strictly between -2^63-1 and -2^63 —
    the spacing just beyond 2^63 magnitude is 2048) and ``c < 2^63``
    (2^63 overflows; the largest passing double is 2^63-1024, one
    ulp below — the spacing just UNDER 2^63 — and it fits).
    Infinities fail the range test, NaN fails the isnan guard.
    Takes a DOUBLE column."""
    return F.when(
        c.isNotNull()
        & ~F.isnan(c)
        & (c >= -9_223_372_036_854_775_808.0)
        & (c < 9_223_372_036_854_775_808.0),
        c,
    ).cast("bigint")


def fence(c: Column, dtype: str, seed: int = 11) -> Column:
    """Optimization fence: value-identical wrapper that stops
    Catalyst from pushing a filter below the projection computing
    this column.

    Why it exists: filter predicates get NO codegen subexpression
    elimination, so an expensive multi-reference expression (the
    quality_score regex tree) inside a ``.filter`` re-evaluates once
    per reference per row. Writing project-then-filter does not help
    on its own — ``PushPredicateThroughNonJoin`` substitutes the
    projection alias back into the predicate and pushes it to the
    scan, re-creating the exact shape (measured: byte-identical
    plans). Non-deterministic predicates are the one thing the rule
    never pushes, so adding a value-neutral ``rand()*0`` term (cast
    to ``dtype``, the column's own type, so the result type is
    unchanged) pins the filter above the projection; the fused
    codegen stage then computes the expensive attribute once per row
    and the predicate reads the local. Value is unchanged for every
    input including NULL and NaN (x + 0 in both integer and IEEE
    arithmetic) with ONE exception: IEEE -0.0 becomes +0.0. That is
    invisible to comparisons/ordering (Spark and SQL treat the zeros
    as equal), but when the fenced column feeds a VALUE-HASHED
    output, pin the oracle twin with ``+ 0.0`` at the same point so
    both engines emit the same zero (l3's rounded cosine does this).

    The arithmetic form, NOT ``F.when(rand() >= -1, c)``: the
    optimizer eliminates the always-true conditional (measured — the
    rewritten plan had no rand and the filter was pushed) but leaves
    nondeterministic arithmetic alone.

    Use on the CHEAP side of the comparison when there is one (the
    md5 draw in l14) so the expensive output column stays a clean
    deterministic expression. Measured (sf0.1, local[32], rebuilt
    DataFrame per run): l14 1.01 -> 0.37 s median. At 100 TB the
    same shape holds — the fence adds one rand() per row and removes
    O(references) regex trees per scanned row; nothing about it is
    local-mode-specific."""
    return c + (F.rand(seed) * 0).cast(dtype)


def dec(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: str | Column) -> Column:
    """Order-independent SUM of a money-like double, as double.

    Accumulates scaled-long cents (whole-stage codegen hot path, ~3x
    a BigDecimal accumulator) and divides once as decimal — exact and
    bit-identical to ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)``
    because fixture money columns carry exactly 2 fractional digits.
    Overflow bound: a single group may sum to 2^63 cents (~$9e16);
    groups beyond that need :func:`exact_grouped_sums`' per-partition
    partial shape."""
    return (F.sum(scaled_long(col)).cast("decimal(38,0)") / F.lit(100)).cast(
        "double"
    )


def davg(col: str | Column) -> Column:
    """Order-independent AVG: exact decimal sum / count, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c) / F.count(c)


def dwsum(col: str | Column, w) -> Column:
    """Windowed :func:`dsum`: exact money sum over a window frame —
    long adds in the frame accumulator, one decimal divide per row."""
    return (
        F.sum(scaled_long(col)).over(w).cast("decimal(38,0)") / F.lit(100)
    ).cast("double")


# ---------- DuckDB-SQL side ----------

def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) / COUNT({expr})"


# ---------- two-level exact money aggregation ----------


def scaled_long(col: str | Column, decimals: int = 2) -> Column:
    """Money-like double -> exact scaled integer (x * 10^d, rounded).
    Fixture money columns carry exactly ``decimals`` fractional
    digits, so this is lossless; products of scaled longs stay exact
    integers (bounded per ROW, so no overflow at any table size).

    PRECONDITION that bites past ``decimals`` fractional digits: a
    value like 123.455 sits on a rounding half-boundary where Spark's
    ROUND (HALF_UP over the shortest double repr) and DuckDB's
    ``CAST(x AS DECIMAL(18,d))`` (rounds the exact binary expansion)
    can disagree by one ulp of the last kept digit — w4/fs9 apply
    this to o_totalprice, where every current fixture value verifies
    equal on both engines. If money columns ever carry real sub-cent
    precision, round to ``decimals`` digits explicitly on BOTH sides
    first.

    Fast leg (round 11): Spark's ROUND on a double goes through
    ``BigDecimal.valueOf`` (a ``Double.toString`` + BigDecimal per
    row — the same cost class as the drift report's double cast,
    measured as the dominant per-row cost of a1 at the 64x probe,
    and re-evaluated per reference inside aggregate buffers). For a
    double c that IS a d-fractional-digit value, ``y = floor(c*10^d
    + 0.5)`` with a bitwise ``y/10^d == c`` check identifies it
    exactly: the check makes c the closest double to the d-digit
    decimal y/10^d, whose one-ulp rounding interval (|c| bounded to
    10^(12-d) keeps it far below the 10^-d spacing) contains no
    other such decimal — so c's shortest representation has value
    y/10^d and HALF_UP rounding at scale d is the no-op that
    returns y. Every other row (more digits, huge magnitude,
    NaN/Inf/NULL) falls back to the original ROUND expression, so
    the value is unchanged for ALL inputs (pinned by a hypothesis
    differential in tests/test_properties.py)."""
    c = F.col(col) if isinstance(col, str) else col
    y, fast = money_fast_parts(c, decimals)
    return F.when(fast, y).otherwise(F.round(c * (10 ** decimals)).cast("long"))


def money_fast_parts(c: Column, decimals: int = 2) -> tuple[Column, Column]:
    """THE shortest-representation fast-leg construction, shared by
    :func:`scaled_long` and the drift report's double-column mean
    (one home for the proof, per the r11 review): returns
    ``(y, fast)`` where ``y = floor(c*10^d + 0.5)`` (long) and
    ``fast`` is true exactly when ``y/10^d`` is bit-equal to ``c``
    and ``|c| < 10^(12-d)``.

    When ``fast`` holds, ``y`` IS the exact unscaled HALF_UP
    rounding of c's shortest decimal representation at scale d:
    the bit-equality makes c the closest double to the d-digit
    decimal y/10^d, whose one-ulp rounding interval (the magnitude
    bound keeps ulp(c)*10^d < ~1e-3, far under the 10^-d spacing)
    contains no other d-digit decimal — so the shortest
    representation (what BigDecimal.valueOf/Double.toString yields,
    i.e. what Spark's ROUND and double->decimal casts round) is
    value-equal to y/10^d and its HALF_UP rounding at scale d is
    the no-op returning y. Everything else (more digits, huge
    magnitude, NaN/Inf/NULL — all of which make ``fast`` false or
    NULL) must take the caller's exact fallback."""
    f = 10 ** decimals
    y = F.floor(c * F.lit(float(f)) + F.lit(0.5))
    fast = (F.abs(c) < F.lit(10.0 ** (12 - decimals))) & (
        y / F.lit(float(f)) == c
    )
    return y, fast


def exact_grouped_sums(
    df,
    keys: list[str],
    money: dict[str, tuple[Column, int]],
    counts: dict[str, Column] | None = None,
    mins: dict[str, Column] | None = None,
    maxs: dict[str, Column] | None = None,
    count_star: str | None = None,
):
    """Exact, order-independent grouped money sums at long-sum speed.

    ``money`` maps output name -> (scaled-long row expression, scale
    divisor): e.g. ``{"sum_qty": (scaled_long("l_quantity"), 100)}``.

    Plan shape (the scale-safe exact-agg pattern):

    1. partial: groupBy(keys + spark_partition_id) summing the scaled
       longs — the hot path over every row runs entirely in
       whole-stage codegen on longs (~3x faster than a decimal
       accumulator, which pays a BigDecimal per row). Overflow-safe
       because a partial covers ONE input partition: with 128 MiB
       scan partitions (< ~16M rows) and per-row scaled values
       < ~1e11, partials stay < 2e18 < 2^63.
    2. final: sum the few (groups x partitions) partials as
       decimal(38,0) — exact at any scale — then one decimal divide
       by the scale and one cast to double. Identical IEEE result to
       the oracle's CAST(SUM(DECIMAL) AS DOUBLE): both round the same
       exact rational to double once.

    Both aggregations are ordinary hash aggregates with map-side
    combine; AQE coalesces the tiny intermediate shuffles. Averages:
    divide the returned sum by the returned count afterwards — one
    IEEE division of identical operands on both engines.
    """
    counts = counts or {}
    mins = mins or {}
    maxs = maxs or {}
    partial = df.groupBy(
        *keys, F.spark_partition_id().alias("__pid")
    ).agg(
        *[F.sum(e).alias(f"__s_{n}") for n, (e, _) in money.items()],
        *[F.count(e).alias(f"__c_{n}") for n, e in counts.items()],
        *[F.min(e).alias(f"__mn_{n}") for n, e in mins.items()],
        *[F.max(e).alias(f"__mx_{n}") for n, e in maxs.items()],
        F.count("*").alias("__n"),
    )
    finals = [
        (F.sum(F.col(f"__s_{n}").cast("decimal(38,0)")) / F.lit(s))
        .cast("double")
        .alias(n)
        for n, (_, s) in money.items()
    ]
    # counts coalesce to 0: with keys=[] on an empty input the final
    # agg sums ZERO partial rows, and SUM-of-nothing is NULL where
    # SQL COUNT(*) / COUNT(x) must return 0
    finals += [F.coalesce(F.sum(f"__c_{n}"), F.lit(0)).alias(n) for n in counts]
    finals += [F.min(f"__mn_{n}").alias(n) for n in mins]
    finals += [F.max(f"__mx_{n}").alias(n) for n in maxs]
    if count_star:
        finals.append(F.coalesce(F.sum("__n"), F.lit(0)).alias(count_star))
    if keys:
        return partial.groupBy(*keys).agg(*finals)
    return partial.agg(*finals)


# ---------- compute-parallelism guard ----------

def fan_out(df):
    """Ensure CPU-heavy per-row compute (hashing, shingling, JSON
    parse, cosine folds) sees at least cluster parallelism.

    Parquet scans parallelize by row group; a small input (or a
    badly-written upstream file) can arrive as 1 partition and pin
    per-row compute to one core while 31 idle. At 100 TB inputs have
    thousands of files/row groups and this is a no-op; the
    repartition only fires for provably-small local inputs, so it
    never adds a shuffle at scale — and when it does fire, the
    payload is by definition small.

    The small-input probe reads the scan's file list (cheap driver
    metadata) rather than ``df.rdd.getNumPartitions()`` — compiling
    the plan to an RDD costs ~0.2 s per call, which dominated the
    latency of every fanned-out query on small inputs."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files:
        # 2x margin, not 1x: Spark bin-packs small files (each padded
        # by openCostInBytes), so file count only LOOSELY bounds scan
        # partitions — measured: 35 tiny files on 32 cores packed to
        # 18 scan partitions. At twice the core count the packing
        # floor (maxSplitBytes >= bytesPerCore) lands within ~target.
        if len(files) >= 2 * target:
            return df  # enough files to split across the cluster
        # few files: repartition only if they're genuinely small.
        # Local paths we can stat; remote stores (s3a/hdfs) we can't —
        # and there a file under `target` count still splits into
        # maxPartitionBytes-sized scan partitions, so leave it alone.
        import os
        from urllib.parse import unquote

        total = 0
        for f in files:
            # NOT urlparse: a legal POSIX filename containing '#' or
            # '?' would be truncated as fragment/query, the getsize
            # would fail, and the probe would silently skip the
            # repartition this function exists to apply. Spark emits
            # file URIs with a plain scheme prefix — strip it and
            # unquote percent-escapes.
            if f.startswith("file:"):
                path = unquote(f[5:])
                while path.startswith("//"):
                    path = path[1:]
            elif "://" in f:
                return df  # remote store: leave the scan's splits alone
            else:
                path = f
            try:
                total += os.path.getsize(path)
            except OSError:
                return df
        raw = df.sparkSession.conf.get(
            "spark.sql.files.maxPartitionBytes", "134217728"
        )
        try:
            # Spark's own byte-string grammar, via the routine that
            # accepted the conf in the first place — a hand parser
            # would have to track its unit spellings by hand
            jvm = df.sparkSession.sparkContext._jvm
            max_pb = int(jvm.org.apache.spark.util.Utils.byteStringAsBytes(raw))
        except Exception:
            # connect-mode / no JVM handle: Spark's default rather
            # than a wrong threshold
            max_pb = 134217728
        if total >= target * max_pb:
            return df  # big input: the scan already yields >= target splits
        return df.repartition(target)
    # no file source behind the plan (in-memory, post-shuffle):
    # fall back to the physical partition count
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------- scratch table stores for stateful catalog queries ----------

def scratch_dir(tag: str, sf_dir: str) -> str:
    """Fresh per-(tag, sf) scratch directory under the system tempdir,
    wiped first so catalog re-runs are deterministic. The sf component
    keeps concurrent runs at different scale factors from clobbering
    each other's files mid-read."""
    import os
    import shutil
    import tempfile

    root = os.path.join(
        tempfile.gettempdir(),
        f"feray_spark_{tag}_{sf_dir.strip('/').replace('/', '_')}",
    )
    shutil.rmtree(root, ignore_errors=True)
    return root


def scratch_store(tag: str, sf_dir: str):
    """Fresh per-(query, sf) TableStore on a :func:`scratch_dir`.
    Returns ``(store, root)``. One definition for every stateful
    catalog query (s2/s9/s10/s11, fs*, l18/l18b) so the path template
    and wipe behavior can never drift per site."""
    from feray_spark.sources.table_store import TableStore

    root = scratch_dir(tag, sf_dir)
    return TableStore(root), root
