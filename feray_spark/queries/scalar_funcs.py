"""Scalar function families (SURVEY §2.8) — one oracle-gated query
per family (string, date/time, math, null/conditional, array, struct,
map, JSON, hashing), mapping the declared polars expression
namespaces onto `pyspark.sql.functions`.

Oracle notes: where Spark and DuckDB built-ins disagree on defaults
the query pins the behavior explicitly (regexp_replace global flag,
day-of-week numbering, floor/ceil return types, libm last-ulp noise
absorbed by the harness's 1e-9 rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.functions.hashing import row_version
from feray_spark.functions.vectors import dot, l2_norm
from feray_spark.queries import register
from feray_spark.queries.util import fan_out, sql_portable_double


def _sql_pd_k() -> str:
    """Grammar-guarded double parse of the JSON k value (the
    f_json_family / f_variant_family oracle route)."""
    return sql_portable_double("json_extract_string(props, '$.k')")


@register(
    "f_string_family",
    oracle="""
        SELECT p_partkey,
               upper(p_name)                           AS name_upper,
               lower(p_brand)                          AS brand_lower,
               substring(p_name, 1, 5)                 AS name_head,
               regexp_replace(p_name, ' ', '_', 'g')   AS name_snake,
               CAST(length(p_name) AS INT)             AS name_len,
               starts_with(p_name, 'small')            AS is_small,
               contains(p_type, 'ECON')                AS is_econ,
               regexp_extract(p_brand, '([0-9]+)', 1)  AS brand_num,
               concat_ws('|', p_brand, p_type)         AS brand_type,
               lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
               trim('  ' || p_name || '  ')            AS trimmed
        FROM part
    """,
    tags=("scalar", "string"),
)
def f_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, slice, regex replace/extract, length,
    predicates, concat, pad, trim."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.length("p_name").alias("name_len"),
        F.startswith(F.col("p_name"), F.lit("small")).alias("is_small"),
        F.contains(F.col("p_type"), F.lit("ECON")).alias("is_econ"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "f_datetime_family",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT)    AS yr,
               CAST(month(o_orderdate) AS INT)   AS mo,
               CAST(day(o_orderdate) AS INT)     AS dom,
               date_trunc('month', o_orderdate)  AS month_start,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP)
                                                 AS due_date,
               strftime(o_orderdate, '%Y-%m')    AS ym,
               CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS epoch_s,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        FROM orders
    """,
    tags=("scalar", "datetime"),
)
def f_datetime_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, truncate, offset, format, epoch.
    Day-of-week pinned to Spark numbering (1=Sunday; DuckDB's dow is
    0=Sunday, shifted in the oracle)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.dayofweek("o_orderdate").alias("dow"),
    )


@register(
    "f_datetime_diff",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(datediff('day', CAST(o_orderdate AS DATE),
                    CAST(l_shipdate AS DATE)) AS INT) AS ship_lag_days
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
    tags=("scalar", "datetime"),
)
def f_datetime_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date difference: ship lag in days per line item. The orders
    side is pruned to (key, date) and broadcast — the static planner
    sizes the table by FILE size (all columns) and would pick a
    sort-merge join that shuffles the fact table; after pruning, the
    build side is ~16 bytes/row, broadcastable far beyond the
    fixture scale (1e8 orders ≈ 1.6 GB is the practical ceiling;
    past that drop the hint and let AQE decide)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("ship_lag_days"),
    )


@register(
    "f_math_family",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               abs(l_discount - 0.05)                  AS disc_dev,
               CAST(floor(l_extendedprice) AS BIGINT)  AS price_floor,
               CAST(ceil(l_extendedprice) AS BIGINT)   AS price_ceil,
               CASE WHEN l_quantity >= 0
                    THEN round(sqrt(l_quantity), 9) END AS qty_sqrt,
               CASE WHEN l_extendedprice > 0
                    THEN round(ln(l_extendedprice), 9) END AS price_ln,
               CASE WHEN l_extendedprice > 0
                    THEN round(log10(l_extendedprice), 9) END
                                                        AS price_log10,
               pow(l_quantity, 2)                      AS qty_sq,
               CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_sign,
               -- trunc() before the cast: DuckDB's double->BIGINT
               -- cast ROUNDS (3.5 -> 4) where Spark's truncates
               -- toward zero (3.5 -> 3); trunc pins both
               CAST(CAST(trunc(l_quantity) AS BIGINT) % 7 AS BIGINT)
                   AS qty_mod7,
               round(l_discount * 100)                 AS disc_pct
        FROM lineitem
    """,
    tags=("scalar", "math"),
)
def f_math_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. floor/ceil cast to BIGINT on both sides (Spark
    returns LONG, DuckDB DOUBLE); transcendentals (sqrt/ln/log10) are
    rounded to 9 decimals ON BOTH SIDES so ulp-level libm-vs-StrictMath
    drift cannot flip a value hash (same pattern as l21's
    cos_centroid)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        # domain guards pinned on BOTH sides: out-of-domain inputs
        # (negative sqrt, non-positive log) are NULL — Spark's native
        # non-ANSI behavior — while unguarded DuckDB RAISES, so the
        # twins would diverge by crash on one dirty row
        F.when(
            F.col("l_quantity") >= 0, F.round(F.sqrt("l_quantity"), 9)
        ).alias("qty_sqrt"),
        F.when(
            F.col("l_extendedprice") > 0, F.round(F.log("l_extendedprice"), 9)
        ).alias("price_ln"),
        F.when(
            F.col("l_extendedprice") > 0,
            F.round(F.log10("l_extendedprice"), 9),
        ).alias("price_log10"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
        # % (Remainder), not F.pmod: the oracle's % keeps the
        # dividend's sign on negatives (DuckDB -3 % 7 = -3) while
        # pmod(-3, 7) = 4 — the twins must pin the SAME operator
        (F.col("l_quantity").cast("bigint") % F.lit(7))
        .cast("bigint")
        .alias("qty_mod7"),
        F.round(F.col("l_discount") * 100, 0).alias("disc_pct"),
    )


@register(
    "f_null_family",
    oracle="""
        SELECT c_custkey,
               coalesce(nullif(c_mktsegment, 'MACHINERY'), 'UNKNOWN') AS seg,
               ifnull(nullif(c_acctbal, c_acctbal), 0.0)  AS never_null_bal,
               (nullif(c_mktsegment, 'MACHINERY')
                   IS NOT DISTINCT FROM c_mktsegment)     AS nullsafe_eq
        FROM customer
    """,
    tags=("scalar", "null"),
)
def f_null_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null family: coalesce / nullif / ifnull / null-safe equality
    (`<=>`). NULLs are manufactured with nullif since fixtures carry
    none."""
    c = load_table(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return c.select(
        "c_custkey",
        F.coalesce(seg_null, F.lit("UNKNOWN")).alias("seg"),
        F.ifnull(F.nullif("c_acctbal", "c_acctbal"), F.lit(0.0)).alias(
            "never_null_bal"
        ),
        seg_null.eqNullSafe(F.col("c_mktsegment")).alias("nullsafe_eq"),
    )


@register(
    "f_array_strings",
    oracle="""
        SELECT p_partkey,
               array_to_string(string_split(p_name, ' '), ',')  AS words,
               CAST(len(string_split(p_name, ' ')) AS INT)      AS n_words,
               array_to_string(
                   list_sort(list_distinct(string_split(p_name, ' '))), ',')
                                                                AS uniq_words,
               list_contains(string_split(p_name, ' '), 'widget')
                                                                AS has_widget,
               array_to_string(list_sort(string_split(p_name, ' ')), '-')
                                                                AS joined,
               array_to_string(string_split(p_name, ' ')[1:2], ',')
                                                                AS first_two
        FROM part
    """,
    tags=("scalar", "array"),
)
def f_array_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over string arrays: split, size, distinct, sort,
    contains, join, slice. Array-valued outputs are emitted as
    comma-joined strings: the driver's canonicalizer sorts rows by
    every output column and raw array cells are unhashable there
    (the round-1 a7 failure mode) — the string form is order-stable
    and hashable while exercising the same array ops."""
    p = load_table(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.array_join(words, ",").alias("words"),
        F.size(words).alias("n_words"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",").alias("uniq_words"),
        F.array_contains(words, "widget").alias("has_widget"),
        F.array_join(F.array_sort(words), "-").alias("joined"),
        F.array_join(F.slice(words, 1, 2), ",").alias("first_two"),
    )


@register(
    "f_array_vectors",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS INT) AS dim,
               CAST(embedding[1] AS DOUBLE) AS first_elem,
               CASE WHEN len(embedding) = 0 THEN 0.0
                    ELSE sqrt(list_reduce(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (acc, x) -> acc + x)) END AS l2,
               CASE WHEN len(embedding) = 0 THEN 0.0
                    ELSE list_reduce(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                         (acc, x) -> acc + x) END AS self_dot
        FROM embeddings
    """,
    tags=("scalar", "array", "vector"),
)
def f_array_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over float vectors: higher-order fns (transform /
    zip_with / aggregate) — sequential fold, float→double cast before
    arithmetic, bit-identical across engines. The oracle guards its
    folds with an empty-list CASE: DuckDB's seedless ``list_reduce``
    RAISES on an empty list, while Spark's ``F.aggregate`` starts
    from the 0.0 seed — on an empty embedding the twins would
    diverge by crash, not by hash. (NULL embeddings already agree:
    both engines fold NULL to NULL.)"""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        # isNotNull guard: Spark's legacy (non-ANSI) size(NULL) is -1
        # while DuckDB's len(NULL) is NULL — pin the SQL semantics
        F.when(F.col("embedding").isNotNull(), F.size("embedding")).alias(
            "dim"
        ),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        l2_norm("embedding").alias("l2"),
        dot("embedding", "embedding").alias("self_dot"),
    )


@register(
    "f_struct_family",
    oracle="""
        SELECT c_custkey,
               upper(c_name)  AS packed_name,
               c_acctbal + 10 AS adjusted_bal,
               c_mktsegment   AS segment
        FROM customer
    """,
    tags=("scalar", "struct"),
)
def f_struct_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct family — the feature-container encoding (reference
    README.md:22: "a feature can have sub-features"): pack columns
    into a struct, mutate a field with withField, read nested fields,
    unpack to flat columns. The oracle validates the *values* (flat);
    the struct machinery is all on the Spark side."""
    c = load_table(spark, sf_dir, "customer")
    packed = c.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        ).alias("container"),
    )
    mutated = packed.withColumn(
        "container",
        F.col("container")
        .withField("name", F.upper(F.col("container.name")))
        .withField("bal", F.col("container.bal") + 10),
    )
    return mutated.select(
        "c_custkey",
        F.col("container.name").alias("packed_name"),
        F.col("container.bal").alias("adjusted_bal"),
        F.col("container.seg").alias("segment"),
    )


@register(
    "f_map_family",
    oracle="""
        SELECT user_id,
               CAST(COUNT(DISTINCT event_type) AS INT) AS n_types,
               COUNT(*) FILTER (event_type = 'click')  AS n_click
        FROM events GROUP BY user_id
    """,
    tags=("scalar", "map"),
)
def f_map_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build map<event_type, count> per user from
    grouped structs (map_from_entries), then read back size and one
    key's value. Oracle validates the extracted values."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    mapped = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            # NULL event_type cannot be a map key (Spark raises
            # "null as map key"); the when() makes collect_list SKIP
            # that entry, matching the oracle's COUNT(DISTINCT) —
            # which also skips NULL — while keeping the user row
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("event_type").isNotNull(),
                        F.struct("event_type", "n"),
                    )
                )
            )
        ).alias("type_counts")
    )
    return mapped.select(
        "user_id",
        F.size(F.map_keys("type_counts")).alias("n_types"),
        F.coalesce(F.element_at("type_counts", "click"), F.lit(0)).alias("n_click"),
    )


@register(
    "f_json_family",
    oracle=f"""
        SELECT event_id,
               -- object guards: Spark's from_json(map) yields NULL
               -- for malformed AND valid-but-non-object documents,
               -- while DuckDB RAISES on malformed and returns [] keys
               -- for scalars/arrays — pin NULL for every non-object.
               -- NESTED case (not AND): only CASE THEN branches are
               -- guaranteed lazy, so json_type never sees bad input
               -- k_value routes through the GRAMMAR-GUARDED double
               -- cast (util.sql_portable_double) + trunc + TRY_CAST:
               -- Spark's string->int cast is NULL for non-numerics
               -- and TRUNCATES decimals where DuckDB's plain CAST
               -- raises/rounds, and the bare double casts diverge
               -- outside the shared grammar ('1.5d' vs '1_000')
               CASE WHEN json_valid(props) THEN
                    CASE WHEN json_type(props) = 'OBJECT'
                         THEN TRY_CAST(trunc({_sql_pd_k()}) AS INT)
                    END
               END AS k_value,
               CASE WHEN json_valid(props) THEN
                    CASE WHEN json_type(props) = 'OBJECT'
                         THEN json_extract_string(props, '$.k')
                    END
               END AS k_str,
               CASE WHEN json_valid(props) THEN
                    CASE WHEN json_type(props) = 'OBJECT'
                         THEN CAST(len(json_keys(props)) AS INT)
                    END
               END AS n_keys
        FROM events
    """,
    tags=("scalar", "json"),
)
def f_json_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: path extraction, typed value, key enumeration
    over the events.props JSON string column. ONE from_json parse per
    row (map<string,string> keeps the full document); the three
    outputs derive from the parsed map and codegen subexpression
    elimination shares the parse — 3x less Jackson work than
    independent from_json + get_json_object + json_object_keys
    calls."""
    # fan_out measured: 0.74 s with vs 0.98 s without (sf0.1, local[32])
    from feray_spark.queries.util import portable_double, trunc_int32

    e = fan_out(load_table(spark, sf_dir, "events"))
    m = F.from_json("props", "map<string,string>")
    # k_value mirrors the oracle's guarded DOUBLE+trunc+TRY_CAST
    # route via portable_double + trunc_int32: a direct string→int
    # cast rejects exponent forms ('1e3' → NULL) that the double
    # route accepts as 1000, and the bare double casts themselves
    # diverge outside the shared grammar (Java float suffixes
    # '1.5d', hex-floats vs DuckDB underscore separators '1_000') —
    # both sides pin the SAME numeric-string grammar.
    return e.select(
        "event_id",
        trunc_int32(portable_double(F.element_at(m, "k"))).alias("k_value"),
        F.element_at(m, "k").alias("k_str"),
        # isNotNull guard: from_json yields a NULL map for NULL or
        # malformed props, and legacy size(NULL) is -1 where the
        # oracle has NULL (the f_array_vectors dim discipline)
        F.when(m.isNotNull(), F.size(F.map_keys(m))).alias("n_keys"),
    )


@register(
    "f_hash_family",
    oracle="""
        WITH framed AS (
            SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
                   [CAST(l_orderkey AS VARCHAR),
                    CAST(l_linenumber AS VARCHAR),
                    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
                    CAST(NULLIF(l_returnflag, 'N') AS VARCHAR)] AS vals
            FROM lineitem
        )
        SELECT l_orderkey, l_linenumber,
               sha256(list_reduce(list_transform(vals,
                   x -> CASE WHEN x IS NULL THEN 'n'
                        ELSE 'v' || length(x) || ':' || x END),
                   (acc, x) -> acc || x)) AS data_version,
               md5(l_returnflag || l_linestatus) AS md5_flags
        FROM framed
    """,
    tags=("scalar", "hash", "FS1"),
)
def f_hash_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing family — the FS1 record-version primitive (reference
    README.md:23, polars-hash dep): sha256 over the canonical
    PREFIX-FREE row rendering ('n' for NULL, 'v<len>:<value>' per
    field — functions/hashing.py row_version; a separator-joined
    scheme was rejected there as non-injective), recomputed
    identically by the DuckDB oracle. sha256 per row is CPU-bound ->
    fan_out (measured: 4.02 s with vs 4.94 s without, sf0.1,
    local[32])."""
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        row_version(
            [
                F.col("l_orderkey"),
                F.col("l_linenumber"),
                F.col("l_extendedprice").cast("decimal(18,2)"),
                F.nullif(F.col("l_returnflag"), F.lit("N")),
            ]
        ).alias("data_version"),
        F.md5(F.concat("l_returnflag", "l_linestatus")).alias("md5_flags"),
    )


@register("f_hash_native", tags=("scalar", "hash"))
def f_hash_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native hash functions (xxhash64, murmur3) — no DuckDB
    twin, rows-only check; determinism across runs is covered by the
    unit tier."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.xxhash64("l_orderkey", "l_linenumber").alias("xx64"),
        F.hash("l_orderkey", "l_linenumber").alias("murmur3"),
    )


@register(
    "f_scalar_extras",
    oracle="""
        SELECT o_orderkey,
               ends_with(o_orderpriority, 'URGENT')             AS is_urgent,
               rpad(o_orderstatus, 3, '_')                      AS status_pad,
               least(o_totalprice, 100000.0)                    AS price_clip_hi,
               greatest(o_totalprice, 1000.0)                   AS price_clip_lo,
               CASE WHEN isnan(CAST('NaN' AS DOUBLE)) THEN o_totalprice
                    ELSE CAST('NaN' AS DOUBLE) END              AS nan_guard,
               isnan(CAST('NaN' AS DOUBLE))                     AS always_nan,
               o_orderdate + INTERVAL 3 MONTH                   AS plus3mo,
               CAST(date_diff('month', TIMESTAMP '1995-01-01',
                    date_trunc('month', o_orderdate)) AS DOUBLE) AS months_since,
               -- TZ-free literal: to_timestamp(epoch) renders in the
               -- harness's local TimeZone, which no harness pins
               TIMESTAMP '1999-11-30 00:00:00'                  AS fixed_epoch,
               CAST(hour(o_orderdate) AS INT)                   AS order_hour,
               -- NULL-propagation pinned: Spark's array_union is
               -- NULL if EITHER side is NULL, while DuckDB's list
               -- concat treats a NULL side as absent
               CASE WHEN o_orderpriority IS NULL
                         OR o_orderstatus IS NULL THEN NULL
                    ELSE array_to_string(list_sort(list_distinct(
                        string_split(o_orderpriority, '-') ||
                        string_split(o_orderstatus, '-'))), ',')
               END                                              AS union_sorted,
               coalesce(array_to_string(list_sort(list_intersect(
                   string_split(o_orderpriority, '-'),
                   ['1', '2', 'URGENT'])), ','), '')            AS inter_sorted,
               -- list_distinct pins MULTIPLICITY to Spark's
               -- array_except (which dedups); a bare filter keeps
               -- repeated tokens and would diverge on any input
               -- whose split parts repeat
               array_to_string(list_sort(list_distinct(list_filter(
                   string_split(o_orderpriority, '-'),
                   x -> NOT list_contains(['URGENT', 'LOW'], x)))), ',')
                                                                AS except_sorted,
               CAST(len(list_zip(string_split(o_orderpriority, '-'),
                    string_split(o_orderpriority, '-'))) AS INT) AS zip_len,
               CAST(2 AS INT)                                   AS map_size,
               o_orderkey + 7                                   AS map_val_sum
        FROM orders
    """,
    tags=("scalar", "extras"),
)
def f_scalar_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 long-tail ops in one projection: endswith, rpad,
    least/greatest (the polars clip mapping), nanvl/isnan,
    add_months, months_between (on month-truncated dates, where it
    is integral and engine-agnostic), from_unixtime, hour, array
    set ops (union/intersect/except — Spark preserves appearance
    order, so outputs are sorted+joined for engine-neutral
    comparison), arrays_zip, create_map/map_concat/map_values.
    All codegen'd projections — S = 0."""
    o = load_table(spark, sf_dir, "orders")
    prio_parts = F.split("o_orderpriority", "-")
    status_parts = F.split("o_orderstatus", "-")
    m = F.map_concat(
        F.create_map(F.lit("a"), F.col("o_orderkey")),
        F.create_map(F.lit("b"), F.lit(7).cast("bigint")),
    )
    return o.select(
        "o_orderkey",
        F.endswith("o_orderpriority", F.lit("URGENT")).alias("is_urgent"),
        F.rpad("o_orderstatus", 3, "_").alias("status_pad"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_clip_hi"),
        F.greatest(F.col("o_totalprice"), F.lit(1000.0)).alias("price_clip_lo"),
        F.nanvl(F.lit("NaN").cast("double"), F.col("o_totalprice")).alias("nan_guard"),
        F.isnan(F.lit("NaN").cast("double")).alias("always_nan"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3mo"),
        F.months_between(
            F.date_trunc("month", "o_orderdate"),
            F.lit("1995-01-01").cast("timestamp"),
        ).alias("months_since"),
        F.lit("1999-11-30 00:00:00").cast("timestamp").alias("fixed_epoch"),
        F.hour("o_orderdate").alias("order_hour"),
        F.array_join(
            F.array_sort(F.array_union(prio_parts, status_parts)), ","
        ).alias("union_sorted"),
        F.array_join(
            F.array_sort(
                F.array_intersect(
                    prio_parts, F.array(F.lit("1"), F.lit("2"), F.lit("URGENT"))
                )
            ),
            ",",
        ).alias("inter_sorted"),
        F.array_join(
            F.array_sort(
                F.array_except(
                    prio_parts, F.array(F.lit("URGENT"), F.lit("LOW"))
                )
            ),
            ",",
        ).alias("except_sorted"),
        F.size(F.arrays_zip(prio_parts, prio_parts)).alias("zip_len"),
        F.size(F.map_keys(m)).alias("map_size"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("map_val_sum"),
    )


@register(
    "f_variant_family",
    oracle=f"""
        WITH v AS (
            -- nested-CASE json_valid guard (the f_json_family
            -- discipline): DuckDB's json_extract RAISES on malformed
            -- documents while try_parse_json yields a NULL variant
            SELECT event_type,
                   CASE WHEN json_valid(props)
                        THEN json_extract(props, '$.k') END AS k_raw,
                   CASE WHEN json_valid(props)
                        THEN json_extract(props, '$.missing')
                   END AS miss_raw
            FROM events
        ), v2 AS (
            -- STRING values route through the GRAMMAR-GUARDED
            -- double parse (util.sql_portable_double): outside the
            -- shared grammar the engines' parsers legitimately
            -- disagree ('1.5d'/hex-floats parse only on Spark,
            -- '1_000' only on DuckDB). JSON NUMBER values cast
            -- directly (their text is always inside the grammar).
            SELECT event_type, miss_raw,
                   CASE WHEN json_type(k_raw) = 'VARCHAR'
                        THEN {sql_portable_double(
                            "json_extract_string(k_raw, '$')")}
                        ELSE TRY_CAST(k_raw AS DOUBLE) END AS k_dbl
            FROM v
        )
        -- the k cast routes through DOUBLE + trunc + TRY_CAST, the
        -- f_json_family discipline: Spark's try_variant_get(bigint)
        -- is NULL for string values and truncates decimals, DuckDB's
        -- plain CAST raises/rounds. (Bound: the double route is
        -- exact only to 2^53 — fixture k values are small ints.)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(TRY_CAST(trunc(k_dbl)
                   AS BIGINT)) AS BIGINT) AS k_sum,
               CAST(MIN(TRY_CAST(trunc(k_dbl)
                   AS BIGINT)) AS BIGINT) AS k_min,
               CAST(MAX(TRY_CAST(trunc(k_dbl)
                   AS BIGINT)) AS BIGINT) AS k_max,
               CAST(SUM(CASE WHEN miss_raw IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
        FROM v2 GROUP BY event_type
    """,
    tags=("function", "variant", "json"),
)
def f_variant_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 VARIANT (Spark 4's semi-structured type, the engine-native
    answer to polars' untyped JSON columns): ``parse_json`` the event
    props ONCE into a variant, then typed path access
    (``try_variant_get``) feeds plain integer aggregation; a missing
    path yields NULL (counted, never an error). The DuckDB oracle
    does the same arithmetic over ``json_extract`` — a hash match
    proves the typed variant access agrees with classic JSON
    extraction end to end.

    Why variant at 100 TB: parse ONCE per row into a binary-encoded
    value, access MANY paths without re-parsing — the string
    re-parse per ``get_json_object`` call is the classic hidden
    quadratic in wide JSON event pipelines. Zero shuffles beyond the
    final rollup; the parse+access is a codegen projection."""
    e = fan_out(load_table(spark, sf_dir, "events"))
    # try_parse_json, not parse_json: malformed props must yield a
    # NULL variant (every path access then NULL), never a task error.
    # k extracts as DOUBLE then truncates to bigint (the oracle's
    # route): a direct bigint variant_get is NULL for the STRING
    # value "3.7" while it truncates the NUMBER 3.7 — the double
    # route treats both identically in both engines. STRING values
    # additionally pass the portable numeric grammar (the oracle's
    # sql_portable_double twin): Spark's variant string→double
    # coercion accepts Java-only forms ('1.5d', hex-floats) and
    # rejects DuckDB-only underscore separators. The trunc_int64
    # wrapper pins the residual 64-bit cast corners: Spark's
    # NaN->bigint is 0, its overflow (a grammar-passing '1e20', or
    # '1e999' -> Infinity, which a bare isnan guard misses) CLAMPS to
    # LONG_MAX — DuckDB's TRY_CAST yields NULL in every one of those,
    # so the Spark side must too.
    #
    # r10 CSE fix: the straight-line form (trunc_int64 over a
    # when-guarded kd, each leaf a try_variant_get on v) expanded to
    # 16 variant_get sites + 5 RLIKE regex sites PER ROW in the
    # physical plan — CaseWhen branches/conditions get no codegen
    # subexpression elimination (CLAUDE.md rule; the l15
    # quality_score class). LET-BIND each level instead (the
    # doc_fingerprint transform-of-singleton pattern): bind the
    # three path extractions on the parsed v once, bind the guarded
    # double once (one RLIKE), then trunc_int64's five references
    # read the bound lambda variable. Plan after: 3 variant_get
    # sites, 1 RLIKE. fan_out: events arrives as ONE parquet file
    # (one scan partition) at fixture scale — same measured class as
    # f_json_family (0.74 s with vs 0.98 s without).
    from feray_spark.queries.util import PORTABLE_DOUBLE_RE, trunc_int64

    r = F.transform(
        F.array(F.try_parse_json("props")),  # bind v: one parse per row
        lambda v: F.transform(
            F.array(
                F.struct(
                    F.try_variant_get(v, "$.k", "string").alias("ks"),
                    F.try_variant_get(v, "$.k", "double").alias("kd0"),
                    F.try_variant_get(v, "$.missing", "bigint").alias("miss"),
                )
            ),  # bind s: each path extracted exactly once
            lambda s: F.struct(
                F.transform(
                    F.array(
                        F.when(
                            s["ks"].isNotNull()
                            & ~s["ks"].rlike(PORTABLE_DOUBLE_RE),
                            F.lit(None).cast("double"),
                        ).otherwise(s["kd0"])
                    ),  # bind kd: the RLIKE grammar check runs once
                    trunc_int64,
                )[0].alias("k"),
                s["miss"].alias("miss"),
            ),
        )[0],
    )[0]
    v = e.select("event_type", r.alias("r")).select(
        "event_type",
        F.col("r.k").alias("k"),
        F.col("r.miss").alias("miss"),
    )
    return v.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("bigint").alias("k_sum"),
        F.min("k").cast("bigint").alias("k_min"),
        F.max("k").cast("bigint").alias("k_max"),
        F.sum(F.when(F.col("miss").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing"),
    )
