"""UDF / UDAF / UDTF surface — SURVEY §2.10 F1–F7.

The reference's whole compute model is "run Python remotely"
(`@ray.remote def divide`, `ray_integration.py:14-18`); the Spark
twin is the UDF ladder, cheapest-last: row-at-a-time Python UDFs
(F1, Arrow-optimized here) < vectorized pandas UDFs (F2) <
grouped-map applyInPandas (F3) < pandas UDAFs (F4) < Python UDTFs
(F5). F6 (external job protocol) lives in feray_spark.external; F7
(failure-isolated fan-out) in operators.fanout — both oracle-gated
here where SQL can express the result.

Scale notes: every UDF below exchanges data over Arrow batches; the
grouped variants shuffle once on their key. At 100 TB the rule is:
stay in §2.8 built-ins when possible, drop to these only for
genuinely imperative logic — which is exactly what each query
demonstrates.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.operators.fanout import isolated_map
from feray_spark.operators.grouped import grouped_partial_agg
from feray_spark.queries import register
from feray_spark.queries.llm import _canon_lower_sql

#: shared canon-lower SQL twin over the documents text column
_CANON_LOWER_TEXT = _canon_lower_sql("text")


@register(
    "f1_scalar_udf",
    oracle="""
        SELECT o_orderkey,
               CAST(string_split(o_orderpriority, '-')[1] AS INT)
                   AS priority_rank
        FROM orders
    """,
    tags=("udf", "F1"),
)
def f1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: row-at-a-time Python UDF (Arrow-optimized) parsing the
    numeric rank out of '1-URGENT'-style priorities. The Python body
    is deliberately trivial — the point is the arbitrary-Python
    escape hatch, per `ray_integration.py:14-18`."""

    @F.udf(returnType="int", useArrow=True)
    def priority_rank(p: str) -> int:
        # NULL in -> NULL out, like the SQL twin (an unguarded .split
        # would abort the whole job on one NULL row)
        if p is None:
            return None
        return int(p.split("-")[0])

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", priority_rank("o_orderpriority").alias("priority_rank"))


@register(
    "f2_pandas_udf",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        FROM lineitem
    """,
    tags=("udf", "F2"),
)
def f2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: vectorized series→series pandas UDF (Arrow batches, the
    Ray-Data ``map_batches`` idiom). Per-row IEEE multiply chain in
    the same order as the oracle, so values are bit-identical."""

    @F.pandas_udf("double")
    def charge(
        price: pd.Series, discount: pd.Series, tax: pd.Series
    ) -> pd.Series:
        return price * (1 - discount) * (1 + tax)

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount", "l_tax").alias("charge"),
    )


@register(
    "f3_grouped_map",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY o_orderstatus
    """,
    tags=("udf", "F3"),
)
def f3_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: grouped-map applyInPandas — one pandas frame per group
    ("one Ray task per feature/group", `README.md:54`). Right shape
    for COARSE groups: per-group Python overhead is paid #groups
    times (3 here). For high-cardinality keys see f3b — same result
    contract, per-batch cost. Aggregates chosen (count/min/max) are
    order-independent, so the result is exact regardless of
    partitioning."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "n_orders": [len(pdf)],
                "min_price": [pdf["o_totalprice"].min()],
                "max_price": [pdf["o_totalprice"].max()],
            }
        )

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").applyInPandas(
        summarize,
        "o_orderstatus string, n_orders long, min_price double, max_price double",
    )


@register(
    "f3b_grouped_partial",
    oracle="""
        SELECT o_custkey,
               COUNT(o_totalprice) AS count_o_totalprice,
               MIN(o_totalprice) AS min_o_totalprice,
               MAX(o_totalprice) AS max_o_totalprice
        FROM orders GROUP BY o_custkey
    """,
    tags=("udf", "F3", "scale"),
)
def f3b_grouped_partial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 scale path: the SAME per-entity custom aggregation over a
    HIGH-cardinality key (every customer), shaped as repartition +
    mapInPandas partial-combine instead of per-group applyInPandas
    — vectorized pandas per batch, O(#keys) state, one shuffle.
    ~10x faster than applyInPandas at sf0.1 and the gap widens with
    key cardinality."""
    o = load_table(spark, sf_dir, "orders")
    return grouped_partial_agg(
        o,
        "o_custkey",
        "o_totalprice",
        ("count", "min", "max"),
        out_types=("long", "double", "double"),
    )


@register(
    "f4_pandas_udaf",
    oracle="""
        SELECT o_orderpriority,
               MAX(o_totalprice) AS max_price,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
    tags=("udf", "F4"),
)
def f4_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: custom aggregates as GROUPED_AGG pandas UDFs. Scale
    honesty: GROUPED_AGG runs as AggregateInPandasExec with NO
    map-side combine — every group's full value set shuffles to one
    reducer, so a skewed hot key lands whole on one task. That makes
    this surface right for modest-cardinality keys (as here) and
    WRONG for web-scale hot keys, where the built-in aggregates (or
    a two-level scaled-long pattern, see a1) keep partials map-side.
    The chosen reducers are order-independent."""

    @F.pandas_udf("double")
    def max_price(v: pd.Series) -> float:
        return float(v.max())

    @F.pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        max_price("o_totalprice").alias("max_price"),
        n_rows("o_orderkey").alias("n_orders"),
    )


@register(
    "f5_udtf",
    oracle="""
        SELECT p_partkey,
               CAST(unnest(generate_series(1,
                   len(string_split(p_name, ' ')))) - 1 AS INT) AS pos,
               unnest(string_split(p_name, ' ')) AS word
        FROM part
    """,
    tags=("udf", "F5"),
)
def f5_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: Python UDTF — one part name in, one row per word out,
    via a lateral join. (For pure splitting, posexplode(split()) is
    the built-in fast path; the UDTF exists for genuinely imperative
    row-expanding logic.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, name: str):
            if name is None:
                # NULL in, NO rows out (f1's NULL-propagation rule):
                # the oracle's unnest(string_split(NULL)) emits
                # nothing, and (name or "") would fabricate a phantom
                # (0, '') row per NULL input
                return
            for i, w in enumerate(name.split(" ")):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        "SELECT p_partkey, s.pos, s.word "
        "FROM part_v, LATERAL split_words(p_name) s"
    )


@register(
    "f5b_polymorphic_udtf",
    oracle=f"""
        WITH toks AS (
            -- canon-lower SQL twin interpolated from queries.llm
            -- (İ→I pre-lower, ς→σ post-lower: the Java-vs-utf8proc
            -- case-folding pins)
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(
                       {_CANON_LOWER_TEXT},
                       '\\s+'), x -> x != '')) AS tok
            FROM documents
        ),
        counts AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM toks GROUP BY doc_id, tok
        ),
        ranked AS (
            SELECT doc_id, tok,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, tok) AS rn
            FROM counts
        )
        SELECT doc_id,
               MAX(CASE WHEN rn = 1 THEN tok END) AS tok_1,
               MAX(CASE WHEN rn = 2 THEN tok END) AS tok_2
        FROM ranked GROUP BY doc_id
    """,
    tags=("udf", "F5", "polymorphic"),
)
def f5b_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 polymorphic variant (Spark 4 UDTF ``analyze``): the OUTPUT
    SCHEMA is computed from a constant argument at plan time —
    ``top_tokens(text, 2)`` emits columns tok_1..tok_k for the k the
    caller asked for, the way built-in generators adapt arity. The
    oracle recomputes the same top-2 most-frequent-token pick
    (count desc, token asc) in SQL, so the hash gate also pins the
    UDTF's tie-breaking.

    The analyze() phase runs ONCE on the driver at planning; eval
    stays the per-row path — fine for genuinely imperative
    row-expanding logic, while anything expressible as
    explode/aggregate belongs on the built-in fast path (F5's own
    caveat)."""
    from collections import Counter

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class TopTokens:
        @staticmethod
        def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(int(k.value)):
                schema = schema.add(f"tok_{i + 1}", StringType())
            return AnalyzeResult(schema)

        def eval(self, text: str, k: int):
            import re

            # Java \s (ASCII-only), matching the oracle's regex split —
            # python str.split() would also break on Unicode
            # whitespace. canon_lower_py carries the shared İ/ς pins.
            from feray_spark.functions.text import canon_lower_py

            canon = canon_lower_py(text or "")
            toks = [w for w in re.split("[ \t\n\x0b\f\r]+", canon) if w]
            best = sorted(
                Counter(toks).items(), key=lambda kv: (-kv[1], kv[0])
            )[: int(k)]
            row = [t for t, _ in best] + [None] * (int(k) - len(best))
            yield tuple(row)

    spark.udtf.register("top_tokens", TopTokens)
    from feray_spark.functions.text import words as words_fn

    # docs with zero tokens are OMITTED, matching the oracle's unnest
    # (which emits no row for an empty token list)
    load_table(spark, sf_dir, "documents").filter(
        F.size(words_fn("text")) > 0
    ).createOrReplaceTempView("docs_v")
    return spark.sql(
        "SELECT doc_id, t.* FROM docs_v, LATERAL top_tokens(text, 2) t"
    )


@register(
    "f7_isolated_fanout",
    oracle="""
        SELECT event_id,
               CASE WHEN event_id % 7 = 0 THEN 'error' ELSE 'ok' END AS status,
               CASE WHEN event_id % 7 = 0 THEN NULL
                    ELSE 1.0 / (event_id % 7) END AS result,
               CASE WHEN event_id % 7 = 0
                    THEN 'ZeroDivisionError: float division by zero'
                    ELSE NULL END AS error
        FROM events
    """,
    tags=("udf", "F7"),
)
def f7_isolated_fanout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: failure-isolated fan-out — per-record try/except inside
    mapInPandas; poisoned records (event_id % 7 == 0 divides by
    zero) surface as status='error' rows instead of failing the job
    (the `ray.wait` harvest loop, `ray_integration.py:24-34`)."""
    e = load_table(spark, sf_dir, "events")
    return isolated_map(
        e.select("event_id"),
        # int(): pandas to_dict gives native ints today, but a numpy
        # scalar here would make 1.0/np.int64(0) return inf with a
        # warning instead of raising — silently un-isolating the
        # poisoned records this demo exists to isolate
        lambda row: 1.0 / int(row["event_id"] % 7),
        id_col="event_id",
    )
