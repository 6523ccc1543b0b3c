"""Scans / sources (SURVEY §2.1 S1,S6,S7) and projection / filter /
predicate operators (§2.2 P1-P7).

The reference's relational surface is its declared polars engine
(``projects/feray/pyproject.toml:25``); each row here re-expresses one
polars-surface operator as a declarative Spark plan so Catalyst gets
pushdown/pruning for free. Every query returns aliased, deterministic
columns matching its DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feray_spark.catalog import load_table
from feray_spark.queries import register
from feray_spark.queries.util import dsum

# ---------------------------------------------------------------- scans


@register(
    "s1_parquet_scan_count",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    tags=("source", "S1"),
)
def s1_parquet_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: self-describing parquet scan. COUNT(*) compiles to a
    metadata-only scan (parquet row-group counts) — no column IO."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count("*").alias("n_rows"))


@register(
    "s2_table_store_time_travel",
    oracle="""
        SELECT 'v0' AS version_tag, count(*) AS n_rows,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'latest', count(*),
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    tags=("source", "S2", "S3"),
)
def s2_table_store_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2+S3: versioned table store round-trip with time travel —
    v0 = overwrite (urgent orders), v1 = append (high orders); read
    version 0 and latest back and aggregate each. The oracle
    recomputes both snapshots from the source table, so a hash match
    proves the log resolved each version to exactly its segment set
    (reference stack claim README.md:15; SURVEY §0 caveat — the
    capability contract is versioned reads, realized by
    sources/table_store.py's segment-log over parquet).

    Scale shape: reads stay ONE multi-path vectorized parquet scan;
    the aggregate is the two-level exact-decimal sum used everywhere
    (S=1 per snapshot)."""
    from feray_spark.queries.util import scratch_store

    store, root = scratch_store("s2_store", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    store.write(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        "orders_slice",
        mode="overwrite",
    )
    store.write(
        orders.filter(F.col("o_orderpriority") == "2-HIGH"),
        "orders_slice",
        mode="append",
    )

    def snap(tag: str, version: int | None) -> DataFrame:
        df = store.read(spark, "orders_slice", version=version)
        return df.agg(
            F.lit(tag).alias("version_tag"),
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("total_price"),
        ).select("version_tag", "n_rows", "total_price")

    return snap("v0", 0).unionByName(snap("latest", None))


@register(
    "s9_metadata_sink",
    oracle="""
        SELECT 'cust_segments' AS table_name,
               CAST(0 AS BIGINT) AS version,
               count(DISTINCT c_mktsegment) AS committed_rows,
               count(DISTINCT c_mktsegment) AS read_back_rows
        FROM customer
    """,
    tags=("source", "S9"),
)
def s9_metadata_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: feature-view sink with commit metadata — materialize a
    small feature table, record row_count in the commit's
    user_metadata (the contract the reference reports via Dagster
    Pipes: ``ray_external.py:10-16`` metadata + data_version), then
    surface the METADATA alongside a re-count of the read-back table.
    A hash match proves the commit log carried the metadata and that
    it agrees with the stored data."""
    from feray_spark.queries.util import scratch_store

    store, root = scratch_store("s9_store", sf_dir)
    feature = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )
    commit = store.write(
        feature, "cust_segments", mode="overwrite", user_metadata={"source": "s9"}
    )
    read_back = store.read(spark, "cust_segments").count()
    return spark.createDataFrame(
        [("cust_segments", commit.version, commit.row_count, read_back)],
        "table_name string, version bigint, committed_rows bigint, "
        "read_back_rows bigint",
    )


@register(
    "s10_optimize_layout",
    oracle="""
        SELECT 'pre' AS layout, count(*) AS n_rows,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'zordered', count(*),
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("source", "S3", "optimize"),
)
def s10_optimize_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 layout maintenance: OPTIMIZE + Z-ORDER round-trip — write a
    table, rewrite it Z-ordered on (o_custkey, o_totalprice) via
    ``TableStore.optimize``, then aggregate BOTH the pre-optimize
    version (time travel) and the optimized latest. The oracle
    recomputes the same aggregate twice from the source table, so a
    hash match proves the clustered rewrite changed the LAYOUT and
    nothing else (same rows, same exact-decimal sum), with the old
    version still readable.

    Why it exists: at 100 TB, parquet stats-pruning only works if the
    layout clusters the filter columns; optimize() is the operator
    that installs that layout (bit-interleaved range ranks →
    repartitionByRange). The skipping effect itself is asserted
    footer-by-footer in tests/test_optimize.py."""
    from feray_spark.queries.util import scratch_store

    store, root = scratch_store("s10_store", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    store.write(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        "orders_opt",
        mode="overwrite",
    )
    store.optimize(
        spark, "orders_opt", zorder_by=["o_custkey", "o_totalprice"], n_files=4
    )

    def snap(tag: str, version: int | None) -> DataFrame:
        df = store.read(spark, "orders_opt", version=version)
        return df.agg(
            F.lit(tag).alias("layout"),
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("total_price"),
        ).select("layout", "n_rows", "total_price")

    return snap("pre", 0).unionByName(snap("zordered", None))


@register(
    "s11_change_feed",
    oracle="""
        SELECT CAST(1 AS BIGINT) AS commit_version,
               'insert' AS change_type,
               count(*) AS n_rows,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders WHERE o_orderpriority = '3-MEDIUM'
        UNION ALL
        SELECT 2, 'insert', count(*),
               CAST(sum(CAST(o_totalprice + CAST(1.0 AS DOUBLE)
                   AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders
        WHERE o_orderkey % 13 = 0 AND o_orderpriority = '4-NOT SPECIFIED'
        UNION ALL
        SELECT 2, 'update_preimage', count(*),
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders
        WHERE o_orderkey % 13 = 0 AND o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 2, 'update_postimage', count(*),
               CAST(sum(CAST(o_totalprice + CAST(1.0 AS DOUBLE)
                   AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders
        WHERE o_orderkey % 13 = 0 AND o_orderpriority = '1-URGENT'
    """,
    tags=("source", "S2", "S3", "cdf"),
)
def s11_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3 change data feed (the Delta CDF analog,
    ``TableStore.changes``): build a 3-version table — v0 overwrite
    (urgent+high orders), v1 append (medium orders), v2 keyed MERGE
    (bump urgent ``%13`` keys by 1.0, insert not-specified ``%13``
    keys) — then read the keyed change feed over (v0, v2] and
    aggregate rows per (commit_version, change_type). The oracle
    recomputes each change class straight from the source table, so a
    hash match proves: the append surfaced as metadata-only inserts,
    the merge classified update pre/post images and inserts exactly,
    and unchanged rows emitted NOTHING.

    Scale shape: the append's change set is resolved from the log (a
    scan of just the appended segment — nothing else read); only the
    rewrite commit pays a diff (two ``exceptAll`` hash-aggregates),
    the documented read-time-CDF trade vs Delta's write-time
    ``_change_data`` files."""
    from feray_spark.queries.util import scratch_store

    store, root = scratch_store("s11_store", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    store.write(
        orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        "orders_cdf",
        mode="overwrite",
    )
    store.write(
        orders.filter(F.col("o_orderpriority") == "3-MEDIUM"),
        "orders_cdf",
        mode="append",
    )
    src = (
        orders.filter(
            (F.col("o_orderkey") % 13 == 0)
            & F.col("o_orderpriority").isin("1-URGENT", "4-NOT SPECIFIED")
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
    )
    store.merge(spark, "orders_cdf", src, keys=["o_orderkey"])
    feed = store.changes(spark, "orders_cdf", from_version=0, keys=["o_orderkey"])
    return (
        feed.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


@register(
    "s12_restore_clone",
    oracle="""
        SELECT 'restored_head' AS snapshot, count(*) AS n_rows,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price
        FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION ALL
        SELECT 'pre_restore', count(*),
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE o_orderpriority = '2-HIGH'
        UNION ALL
        SELECT 'clone', count(*),
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    tags=("source", "S2", "S3", "restore", "clone"),
)
def s12_restore_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S3 rollback + zero-copy branching: build v0 (urgent
    orders), overwrite with v1 (high orders), RESTORE back to v0
    (→ v2, the Delta ``RESTORE TABLE`` analog), then SHALLOW CLONE
    the restored head into a second table (zero data copied — the
    clone's commit references the same immutable segments). Aggregate
    the restored head, the still-time-travelable pre-restore v1, and
    the clone. The oracle recomputes each snapshot from the source
    table, so a hash match proves restore re-referenced exactly the
    v0 segment set without touching v1's, and the clone serves the
    same bytes through its own log.

    Scale shape: restore and clone are single metadata writes —
    rolling back or branching a 100 TB table moves zero data; reads
    stay one multi-path vectorized scan. Contract parity with real
    Delta is locked by tests/test_store_contract.py (restore/clone
    legs); vacuum-scoping and stream-detach edges in
    tests/test_features.py."""
    from feray_spark.queries.util import scratch_store

    store, root = scratch_store("s12_store", sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    store.write(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        "orders_rc",
        mode="overwrite",
    )
    store.write(
        orders.filter(F.col("o_orderpriority") == "2-HIGH"),
        "orders_rc",
        mode="overwrite",
    )
    store.restore("orders_rc", 0)
    store.clone("orders_rc", "orders_rc_branch")

    def snap(tag: str, table: str, version: int | None) -> DataFrame:
        df = store.read(spark, table, version=version)
        return df.agg(
            F.lit(tag).alias("snapshot"),
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("total_price"),
        ).select("snapshot", "n_rows", "total_price")

    return (
        snap("restored_head", "orders_rc", None)
        .unionByName(snap("pre_restore", "orders_rc", 1))
        .unionByName(snap("clone", "orders_rc_branch", None))
    )


@register(
    "s6_csv_roundtrip",
    oracle="SELECT r_regionkey, r_name FROM region",
    tags=("source", "S6"),
)
def s6_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: CSV ingest. Round-trips `region` through CSV with an explicit
    schema (inference = an extra full scan; never in production paths).
    Per-(tag, sf) scratch path so concurrent runs at different scale
    factors never overwrite each other's files mid-read."""
    from feray_spark.queries.util import scratch_dir

    out = scratch_dir("csv_roundtrip", sf_dir)
    region = load_table(spark, sf_dir, "region")
    region.write.mode("overwrite").option("header", True).csv(out)
    return (
        spark.read.schema("r_regionkey int, r_name string")
        .option("header", True)
        .csv(out)
        .select("r_regionkey", "r_name")
    )


@register(
    "s6b_ndjson_roundtrip",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    tags=("source", "S6"),
)
def s6b_ndjson_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: newline-delimited JSON ingest — `nation` written as NDJSON
    and read back with an explicit schema (matching the CSV twin's
    no-inference discipline and its per-(tag, sf) scratch path)."""
    from feray_spark.queries.util import scratch_dir

    out = scratch_dir("ndjson_roundtrip", sf_dir)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.mode("overwrite").json(out)
    return (
        spark.read.schema("n_nationkey int, n_name string, n_regionkey int")
        .json(out)
        .select("n_nationkey", "n_name", "n_regionkey")
    )


@register(
    "s6c_orc_roundtrip",
    oracle="SELECT s_suppkey, s_nationkey, s_acctbal FROM supplier",
    tags=("source", "S6"),
)
def s6c_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: ORC ingest — the other columnar format warehouse estates
    standardize on (Hive/Trino shops). `supplier` round-trips through
    ORC (jars ship inside Spark itself; no schema needed — ORC files
    carry their types exactly like parquet) and the oracle reads the
    same rows from the parquet source, so the round trip is
    value-checked, not just counted. Same per-(tag, sf) scratch-path
    discipline as the CSV/NDJSON twins. Scale posture matches parquet:
    columnar pruning + predicate pushdown on read, split-able files,
    ≤128 MB stripes on write."""
    from feray_spark.queries.util import scratch_dir

    out = scratch_dir("orc_roundtrip", sf_dir)
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    supplier.write.mode("overwrite").orc(out)
    return spark.read.orc(out).select("s_suppkey", "s_nationkey", "s_acctbal")


@register(
    "s6e_xml_roundtrip",
    oracle="""
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey AS BIGINT) AS n_regionkey
        FROM nation
    """,
    tags=("source", "S6"),
)
def s6e_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: XML ingest — Spark 4's NATIVE xml source (the spark-xml
    package folded into core; no extra jars), the format enterprise
    feeds and legal/patent/pubmed corpora still arrive in. `nation`
    round-trips through `rowTag`-delimited XML and the oracle reads
    the same rows from the parquet source, so escaping/unescaping is
    value-checked, not just counted. Keys re-cast explicitly: XML
    carries no type metadata, so the reader's schema inference lands
    on BIGINT — pinned on both sides.

    Scale posture: XML files split per rowTag boundary (multiLine
    parsing is per-record, not per-file), so a corpus of large XML
    dumps parallelizes by input split like CSV; schema inference is
    one extra pass — production pins an explicit schema to skip it
    (as the L6 metadata structs do)."""
    from feray_spark.queries.util import scratch_dir

    out = scratch_dir("xml_roundtrip", sf_dir)
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    nation.write.mode("overwrite").format("xml").option(
        "rowTag", "nation"
    ).save(out)
    back = spark.read.format("xml").option("rowTag", "nation").load(out)
    for c in ("n_nationkey", "n_name", "n_regionkey"):
        if c not in back.columns:
            # a zero-row XML file has no row elements, so inference
            # yields an empty schema; the projection below must still
            # resolve (empty in → defined empty out)
            back = back.withColumn(c, F.lit(None))
    return back.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        F.col("n_name").cast("string").alias("n_name"),
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
    )


@register(
    "s6d_binaryfile_scan",
    oracle="""
        SELECT 'doc_' || CAST(doc_id AS VARCHAR) || '.bin' AS name,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               md5(text) AS digest
        FROM documents WHERE doc_id < 64 AND text IS NOT NULL
    """,
    tags=("source", "S6"),
)
def s6d_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: whole-file BINARY ingestion — Spark's ``binaryFile``
    format, the entry point that turns a directory of image/audio/
    video payloads into the L6/L23 multimodal column (one row per
    file: path, length, content bytes). The fixture writes a
    deterministic set of payload files (the first 64 documents'
    UTF-8 bytes) and scans them back; the oracle is the closed-form
    twin over the same parquet rows (name/byte-length/md5 recomputed
    from the text column — l23's construction-oracle style), so the
    scan's content bytes are value-checked end to end.

    Scale posture: ``binaryFile`` reads are partition-parallel (one
    file = one task unit, no splitting — right for payloads, which
    decode whole), ``pathGlobFilter`` prunes by extension at listing
    time, and the 2 GB-per-file format cap matches the JVM array
    bound. At 100 TB the directory listing itself is the hot spot —
    production layouts shard payload dirs by content-hash prefix so
    no single list call sees the corpus (the same discipline the
    table store's segment layout applies)."""
    import os

    from feray_spark.queries.util import scratch_dir

    root = scratch_dir("binaryfile_scan", sf_dir)
    os.makedirs(root, exist_ok=True)
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 64) & F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()  # bounded: 64 rows by construction
    )
    for r in docs:
        with open(os.path.join(root, f"doc_{r.doc_id}.bin"), "wb") as f:
            f.write(r.text.encode("utf-8"))
    scanned = spark.read.format("binaryFile").load(root)
    return scanned.select(
        F.substring_index(F.col("path"), "/", -1).alias("name"),
        F.col("length").cast("bigint").alias("n_bytes"),
        F.md5(F.col("content")).alias("digest"),
    )


@register(
    "s7_inmemory_rows",
    oracle="SELECT * FROM (VALUES (1), (2), (0), (3)) AS t(x)",
    tags=("source", "S7"),
)
def s7_inmemory_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: driver objects -> relation. The reference example fans out
    over the literal list [1, 2, 0, 3] (ray_integration.py:20); same
    rows here via createDataFrame."""
    return spark.createDataFrame([(1,), (2,), (0,), (3,)], "x int")


# ------------------------------------------------- projection / filter


@register(
    "p1_project_compute",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem
    """,
    tags=("projection", "P1"),
)
def p1_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: select + computed column. Catalyst prunes the scan to the
    four referenced columns (check ReadSchema in explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )


@register(
    "p2_rename_drop_cast",
    oracle="""
        SELECT l_orderkey AS order_key, l_linenumber,
               CAST(l_quantity AS BIGINT) AS qty
        FROM lineitem
    """,
    tags=("projection", "P2"),
)
def p2_rename_drop_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: rename / drop / cast. Fixture quantities are integral doubles
    so the double->bigint cast is value-preserving in both engines
    (engines disagree on rounding of fractional casts — avoided)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.withColumnRenamed("l_orderkey", "order_key")
        .withColumn("qty", F.col("l_quantity").cast("bigint"))
        .select("order_key", "l_linenumber", "qty")
    )


@register(
    "p3_filter_comparison",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem WHERE l_quantity > 30
    """,
    tags=("filter", "P3"),
)
def p3_filter_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: comparison predicate, pushed to the parquet scan
    (PushedFilters: [GreaterThan(l_quantity,30.0)])."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 30).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


@register(
    "p4_boolean_logic",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE (o_orderstatus = 'F' AND o_totalprice > 100000)
           OR (NOT o_orderstatus = 'F' AND o_totalprice < 50000)
    """,
    tags=("filter", "P4"),
)
def p4_boolean_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: AND / OR / NOT composition over Column expressions."""
    o = load_table(spark, sf_dir, "orders")
    f = (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)
    other = (~(F.col("o_orderstatus") == "F")) & (F.col("o_totalprice") < 50000)
    return o.filter(f | other).select("o_orderkey", "o_orderstatus", "o_totalprice")


@register(
    "p5_in_between_like",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_totalprice BETWEEN 50000 AND 150000
          AND o_orderpriority LIKE '%-%'
    """,
    tags=("filter", "P5"),
)
def p5_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: IN / BETWEEN / LIKE membership, range and pattern predicates."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").like("%-%")
    ).select("o_orderkey", "o_orderpriority", "o_totalprice")


@register(
    "p5b_regex_predicate",
    oracle=r"""
        SELECT p_partkey, p_name, p_type
        FROM part
        WHERE regexp_matches(p_name, '^(small|large) ')
    """,
    tags=("filter", "P5"),
)
def p5b_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: regex predicate (polars str.contains -> rlike)."""
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike(r"^(small|large) ")).select(
        "p_partkey", "p_name", "p_type"
    )


@register(
    "p6_null_predicates",
    oracle="""
        SELECT c_custkey,
               CASE WHEN nullif(c_mktsegment, 'MACHINERY') IS NULL
                    THEN 'none' ELSE 'some' END AS seg_class
        FROM customer
        WHERE c_acctbal IS NOT NULL
    """,
    tags=("filter", "P6"),
)
def p6_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: is_null / is_not_null / null-injection via nullif. Fixtures
    carry no natural NULLs, so nullif() manufactures them on both
    sides identically."""
    c = load_table(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return c.filter(F.col("c_acctbal").isNotNull()).select(
        "c_custkey",
        F.when(seg_null.isNull(), "none").otherwise("some").alias("seg_class"),
    )


@register(
    "p7_case_banding",
    oracle="""
        SELECT c_custkey, c_acctbal,
               CASE WHEN c_acctbal < 1000 THEN 'low'
                    WHEN c_acctbal < 5000 THEN 'mid'
                    ELSE 'high' END AS bal_band
        FROM customer
    """,
    tags=("filter", "P7"),
)
def p7_case_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: conditional expression (polars when/then/otherwise)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
    )


_EP3_SQL = """
    SELECT r_name,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
"""


@register(
    "ep3_sql_surface",
    oracle=_EP3_SQL,
    tags=("sql", "EP3"),
)
def ep3_sql_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3: the SQL entry point — fixture tables registered as views
    (catalog.register_views) and THE SAME SQL TEXT executed by
    spark.sql and by the DuckDB oracle (the query sticks to the ANSI
    intersection, incl. the decimal-exact money-sum idiom). Catalyst
    plans the star join with the tiny dims broadcast, same as the
    DataFrame twin j5_broadcast_star."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP3_SQL)


_EP3B_SQL = """
    SELECT o_orderpriority,
           count(*) AS n_wait
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-07-01'
      AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
      AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
"""


@register(
    "ep3b_subquery_decorrelation",
    oracle=_EP3B_SQL,
    tags=("sql", "EP3", "subquery"),
)
def ep3b_subquery_decorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3: correlated + scalar subqueries through the SQL surface
    (TPC-H-Q4-shaped). Catalyst rewrites the correlated EXISTS to a
    left-semi join and the uncorrelated scalar subquery to a
    one-row broadcast (RewriteCorrelatedScalarSubquery /
    RewritePredicateSubquery — SURVEY §4.2: no custom work needed);
    the oracle runs the same text. The avg comparison is
    single-value vs double — no order-dependent accumulation in the
    compared OUTPUT, and the predicate's avg lands far from any
    o_totalprice value, so the float compare is stable across
    engines."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP3B_SQL)


_EP3C_SQL = """
    SELECT l_orderkey,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(8,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
"""


@register(
    "ep3c_tpch_q3",
    oracle=_EP3C_SQL,
    tags=("sql", "EP3"),
)
def ep3c_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3: TPC-H-Q3-shaped shipping-priority query — a three-way
    customer⨝orders⨝lineitem join with selective filters on both
    dimensions, grouped revenue, and a top-10 cut. THE SAME SQL TEXT
    runs on Spark and DuckDB; the revenue sum uses the decimal-exact
    idiom so the hash gate holds bit-for-bit.

    Plan shape at scale: the filtered customer side broadcasts under
    the size threshold (or hash-joins above it), the orders⨝lineitem
    join shuffles on the order key, revenue partial-aggregates
    map-side on the (already co-partitioned) group keys, and the
    ORDER BY ... LIMIT 10 plans as TakeOrderedAndProject — per-
    partition heaps, no global sort. Deterministic tie-break on
    l_orderkey."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP3C_SQL)


_EP3D_SQL = """
    SELECT n_name,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(8,2))) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01'
      AND o_orderdate < TIMESTAMP '1995-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@register(
    "ep3d_tpch_q5",
    oracle=_EP3D_SQL,
    tags=("sql", "EP3"),
)
def ep3d_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3: TPC-H-Q5-shaped local-supplier-volume query — a six-table
    join (two fact tables, four dims, including the non-equi-ish
    c_nationkey = s_nationkey cross-constraint), region-filtered,
    grouped by nation. Same text on both engines, decimal-exact
    revenue.

    Plan shape at scale: Catalyst reorders so region→nation prune
    supplier BEFORE the fact joins (broadcast chains down the dim
    side), the two fact tables shuffle once each on the order key,
    and the supplier join carries the nation constraint as part of
    the join key — six tables, two real shuffles. The final sort is
    #nations rows."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP3D_SQL)


_EP4_SEQ_SQL = """
    SELECT o_custkey AS cust, o_orderkey AS k,
           CAST(o_totalprice AS DECIMAL(18,2)) AS price,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderkey) AS rn
    FROM orders
"""

_EP4_REC_SQL = """
    WITH RECURSIVE walk AS (
        SELECT cust, k, rn, price AS cum
        FROM {seq} WHERE rn = 1
        UNION ALL
        SELECT n.cust, n.k, n.rn,
               CAST(w.cum + n.price AS DECIMAL(18,2))
        FROM walk w JOIN {seq} n ON n.cust = w.cust AND n.rn = w.rn + 1
        WHERE n.rn <= 4
    )
    SELECT cust AS o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(rn) AS BIGINT) AS chain_depth,
           CAST(MAX(cum) AS DOUBLE) AS early_spend
    FROM walk GROUP BY cust
"""

_EP4_SQL = _EP4_REC_SQL.replace("{seq}", f"({_EP4_SEQ_SQL})")


@register(
    "ep4_recursive_cte",
    oracle=_EP4_SQL,
    tags=("sql", "EP4", "recursive"),
)
def ep4_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP4: recursive CTE surface (``WITH RECURSIVE``, Spark 4) —
    walk every customer's order sequence step by step, accumulating
    spend over their first 4 orders along the chain. The SAME
    recursion text runs on both engines; Spark additionally
    MATERIALIZES the non-recursive ``seq`` CTE (localCheckpoint +
    temp view) before entering the loop, because the recursive
    executor re-evaluates referenced plans EVERY iteration — the
    window over orders was recomputed per level, and pinning it cut
    the sf0.1 wall time from ~3.5 s to ~1.5 s (measured, 3-run).
    The running sum is carried as exact DECIMAL through the
    recursion (sequential along each chain, so the fold order is
    identical on both engines by construction) and cast to double
    once at the end.

    Scale shape: each recursion step is one distributed hash join
    keyed on (customer, step) — the whole frontier advances per
    iteration, so total work is O(rows · 1), not O(rows · depth);
    depth is CAPPED in the recursive member (4 here): recursion cost
    on Spark is depth × a distributed-join stage over the
    checkpointed seq (~0.25 s/level of stage latency at sf0.1 after
    materialization; ~0.7 s/level without) — cap the depth, or use
    a window (W4) when the chain fits a partition. Spark's
    recursion guard (100 levels) turns a runaway recursion into an
    error instead of an infinite loop.
    Anchor-only rows (rn = 1) enter the recursion with no self-join.
    Note the acyclicity requirement: Spark recursion is UNION ALL
    only, so closure over CYCLIC graphs belongs to the dedicated
    operator (operators.dedup.connected_components, which also
    survives diameter > depth-cap graphs).
    Remaining gap vs DuckDB is structural (per-level distributed
    stage floor vs an in-process incremental loop) and argued in
    bench.py's BENCH_SKIP entry for this query."""
    import uuid

    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    # lazy checkpoint: plan-only consumers (EXPLAIN, tests) trigger no
    # job; the first executed recursion level materializes it once and
    # every later level reuses the blocks. Unique view name per call:
    # a session-global fixed name could be swapped by a concurrent
    # builder between this checkpoint and the sql() analysis. Earlier
    # calls' views are dropped first so a long-lived session (bench
    # loop, notebook) holds at most ONE pinned checkpoint, not one per
    # invocation — the view reference is what keeps the checkpoint
    # blocks from the ContextCleaner.
    for t in spark.catalog.listTables():
        if t.isTemporary and t.name.startswith("__ep4_seq_"):
            spark.catalog.dropTempView(t.name)
    seq = spark.sql(_EP4_SEQ_SQL).localCheckpoint(eager=False)
    view = f"__ep4_seq_{uuid.uuid4().hex[:8]}"
    seq.createOrReplaceTempView(view)
    return spark.sql(_EP4_REC_SQL.replace("{seq}", view))


_EP5_SQL = """
    SELECT l1.l_orderkey, l1.l_linenumber,
           CAST(l1.l_extendedprice AS DOUBLE) AS min_price
    FROM lineitem l1
    WHERE l1.l_extendedprice = (
        SELECT MIN(l2.l_extendedprice) FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey)
"""


@register(
    "ep5_correlated_scalar_min",
    oracle=_EP5_SQL,
    tags=("sql", "EP5", "subquery"),
)
def ep5_correlated_scalar_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP5: correlated SCALAR subquery in a WHERE equality (the
    TPC-H-Q2 shape: rows matching their group's MIN) — the other
    classic decorrelation pattern next to ep3b's EXISTS/uncorrelated
    scalar. Catalyst's RewriteCorrelatedScalarSubquery turns the
    per-row subquery into ONE aggregate over the inner table joined
    back on the correlation key — two scans + one key shuffle, never
    a per-row re-execution (SURVEY §4.2: the optimizer does the
    rewrite; the engine's job is to hand it the declarative form).
    The equality compares raw parquet doubles — identical bits on
    both engines, no arithmetic.

    Measured (sf0.1, local[32]): 1.23 s — the decorrelated plan pays
    a second scan plus a broadcast-build job over the per-key MIN
    table. When the query is yours to rewrite, the window form
    (MIN OVER (PARTITION BY key), one scan, one shuffle, no build
    job) measures 0.52 s and is the recommended hand-written shape;
    THIS entry deliberately keeps the subquery text because its job
    is to prove the engine executes the form users actually write."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP5_SQL)


@register(
    "ep5b_window_argmin",
    oracle=_EP5_SQL,
    tags=("sql", "EP5", "window"),
)
def ep5b_window_argmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP5 fast shape: the hand-rewritten window-argmin form of ep5's
    correlated scalar subquery — MIN OVER (PARTITION BY l_orderkey)
    computed in the same pass as the rows it filters. ONE lineitem
    scan and ONE key shuffle versus the decorrelated plan's two scans
    plus an aggregate-build broadcast job (measured 0.52 s vs 1.23 s
    at sf0.1, local[32] — the number in ep5's docstring, now shipped
    as its own gated entry so users get both verified shapes: the
    portable subquery text and the recommended rewrite).

    Same oracle as ep5 — the forms are equivalent by definition, and
    the equality compares raw parquet doubles (no arithmetic), so the
    rewrite can never drift from the subquery semantics unnoticed."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_orderkey")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("__grp_min", F.min("l_extendedprice").over(w))
        .filter(F.col("l_extendedprice") == F.col("__grp_min"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("double").alias("min_price"),
        )
    )


_EP6_SQL = """
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 200)
    GROUP BY c_custkey, o_orderkey, o_orderdate
"""


@register(
    "ep6_having_semijoin",
    oracle=_EP6_SQL,
    tags=("sql", "EP6", "having"),
)
def ep6_having_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP6: HAVING-filtered IN-subquery joined back to its detail
    rows (the TPC-H-Q18 large-order shape). Catalyst plans the IN as
    a LEFT SEMI join against the grouped aggregate — the qualifying
    key set is produced by one partial-then-final hash aggregate and
    probes the fact scan, so the fact table is never re-aggregated
    per key. Quantity sums ride exact DECIMAL on both engines (the
    dsum discipline) and the HAVING threshold compares decimals, so
    the qualifying set can never differ by a float ulp.

    The oracle keeps the canonical Q18 text; the Spark side ships the
    single-aggregate form (valid because o_orderkey is the orders PK,
    so it determines c_custkey and o_orderdate: grouping by
    (c, o, od) == grouping by o): lineitem aggregates ONCE per
    orderkey as a PLAIN long sum of scaled quantities — map-side
    partial + one exchange, entirely in whole-stage codegen. The
    two-level (key, partition_id) exact-agg pattern is deliberately
    NOT used here: its decimal combine exists for UNBOUNDED
    rows-per-key sums, but this key is the orders primary key, so
    rows per key are bounded by order size at ANY corpus scale
    (corpus growth adds orders, not lines per order; max
    7 × 5 000 = 35 000 per key — overflow needs 2^63/5 000 ≈ 1.8e15
    lines in ONE order) and the second exchange it pays bought
    nothing (interleaved noop-write A/B, round 10: 0.71 vs 1.00 s at
    sf0.1, 8.0 vs 9.75 s at the 64× probe corpus —
    scripts/ep6_agg_ab.py; flagged by PROBE_r10's ep6 row, the worst
    absolute SQL-family loss at 64×). The HAVING threshold compares
    exact integers (q × 100 > 20000), and the qualifying groups join
    to orders and customer (no broadcast hints: the qualifying set
    and customer are small HERE but not at 100 TB — the
    autoBroadcast threshold + AQE pick the physical join per run,
    which measured identical to forcing it)."""
    from feray_spark.queries.util import scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    qty = li.groupBy("l_orderkey").agg(
        F.sum(scaled_long("l_quantity")).alias("q2")  # qty x 100
    )
    big = qty.filter(F.col("q2") > F.lit(200 * 100))
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            (F.col("q2") / F.lit(100)).cast("double").alias("total_qty"),
        )
    )


_EP7_SQL = """
    SELECT l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
"""


@register(
    "ep7_priority_lines",
    oracle=_EP7_SQL,
    tags=("sql", "EP7"),
)
def ep7_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP7: the TPC-H-Q12 shape — one fact-fact equi-join with the
    classification living in CASE aggregates rather than in GROUP BY
    (urgent/non-urgent line counts per return class over one shipped
    year). Exercises the plan pattern none of ep3's variants do: a
    selective date-range predicate pushed to the lineitem scan
    feeding a join whose AGGREGATE does the pivoting. Counts are
    integers end to end — no arithmetic portability surface at all.

    Scale shape: the shipdate range prunes the probe side AT THE SCAN
    (PushedFilters; with date-partitioned layout, partition pruning).
    At fixture scale AQE broadcasts the pruned year (plan shows
    BroadcastHashJoin); past the broadcast bound the join shuffles
    both sides on orderkey once. The CASE aggregation
    partial-aggregates map-side to 3 groups either way."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP7_SQL)


_EP8_SQL = """
    SELECT CAST(ROUND(100.0
             * SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(8,2)))
                        AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)
             / SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(8,2)))
                        AS DECIMAL(18,4))), 6) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
"""


@register(
    "ep8_promo_revenue",
    oracle=_EP8_SQL,
    tags=("sql", "EP8"),
)
def ep8_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP8: the TPC-H-Q14 shape — a single scalar output that is a
    RATIO of two conditional aggregates over a dimension join
    (promotion revenue share for one shipped month). The last classic
    aggregate form the SQL surface lacked: global (no GROUP BY),
    CASE-split numerator over the same rows as the denominator.

    Portability: both sums ride the exact-decimal discipline
    (ep3c's DECIMAL(18,4) product), so numerator and denominator are
    bit-identical doubles in both engines and their quotient is too;
    ROUND(,6) guards the printed value regardless.

    Scale shape: the month predicate prunes the fact scan; part is
    the small side (broadcast join — the same star contract as j5);
    both conditional sums fold into ONE aggregate over the joined
    stream, partials map-side, and only 1 row crosses the final
    exchange."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP8_SQL)


_EP9_SQL = """
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(8,2))) AS DECIMAL(18,4)))
           AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 40)
"""


@register(
    "ep9_disjunctive_join",
    oracle=_EP9_SQL,
    tags=("sql", "EP9", "pushdown"),
)
def ep9_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP9: the TPC-H-Q19 shape — a join whose WHERE is an OR of
    conjunct groups, each mixing columns from BOTH sides (brand/size
    from part, quantity from lineitem). The one classic predicate
    form the surface lacked: nothing here is a plain conjunct, so
    naive pushdown gets zero filters to the scans and the join
    degrades to filter-after-join on the full tables.

    Scale shape: Catalyst's CNF conversion extracts the side-local
    implications — (brand11 OR brand22 OR brand33) AND the size-range
    union to the part scan, the quantity-range union to the lineitem
    scan (both visible as PushedFilters) — so each scan prunes before
    the join and the original OR runs as the residual predicate on
    the survivors. Part stays the broadcast side; one conditional
    aggregate, 1 row over the final exchange. Revenue rides the exact
    DECIMAL(18,4) discipline (ep3c), so the engines agree bit-for-bit."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP9_SQL)


_EP10_SQL = """
    WITH flagged AS (
        SELECT l_orderkey, l_suppkey,
               CASE WHEN l_shipdate > o_orderdate + INTERVAL '365' DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F')
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM flagged f1 JOIN supplier ON s_suppkey = f1.l_suppkey
    WHERE f1.is_late = 1
      AND EXISTS (SELECT 1 FROM flagged f2
                  WHERE f2.l_orderkey = f1.l_orderkey
                    AND f2.l_suppkey <> f1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM flagged f3
                      WHERE f3.l_orderkey = f1.l_orderkey
                        AND f3.l_suppkey <> f1.l_suppkey
                        AND f3.is_late = 1)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
"""


@register(
    "ep10_sole_late_supplier",
    oracle=_EP10_SQL,
    tags=("sql", "EP10", "subquery"),
)
def ep10_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP10: the TPC-H-Q21 shape — the EXISTS / NOT-EXISTS pair over
    the SAME derived relation with a non-key inequality in the
    correlation (suppliers who were the SOLE late supplier on a
    multi-supplier finalized order; "late" adapted to ship > order
    date + 365d because the fixture has no commit/receipt dates).
    The last classic subquery form the catalog lacked: ep3b covers
    one correlated EXISTS, ep5 the correlated scalar — this is the
    paired semi + anti join against a shared subplan, where the
    `suppkey <>` residual rides on an orderkey equi-correlation.

    Scale shape: both EXISTS legs decorrelate into LEFT SEMI / LEFT
    ANTI hash joins on l_orderkey with the `<>` as residual — never a
    per-row re-execution. Each leg plans its own scan of `flagged`,
    column-pruned to what it probes (the semi leg reads only
    orderkey/suppkey) — the honest decorrelated cost of the canonical
    Q21 text; when the query is yours to rewrite, one grouped
    aggregate per order (count-distinct suppliers / late suppliers)
    joined back computes `flagged` once. The supplier dim broadcasts;
    the final (numwait DESC, s_name) top-25 is TakeOrderedAndProject
    — partial top-k per partition, 25 rows to the driver. The count
    is an integer and the tie-break is total, so no arithmetic or
    ordering ambiguity crosses engines."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP10_SQL)


_EP11_SQL = """
    SELECT p_brand, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
"""


@register(
    "ep11_excluded_suppliers",
    oracle=_EP11_SQL,
    tags=("sql", "EP11", "subquery"),
)
def ep11_excluded_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP11: the TPC-H-Q16 shape — a NOT IN subquery excluding a key
    set, then COUNT(DISTINCT) per group (supplier variety per
    part-brand/size band, minus "complaint" suppliers, adapted to
    ``s_acctbal < 0`` and the lineitem part-supplier association
    because the fixture set has no partsupp table). The one subquery
    form the ep family still lacked: ep3b/ep10 cover EXISTS and NOT
    EXISTS, ep6 covers IN — NOT IN is semantically distinct because
    a single NULL in the subquery annihilates every row. Catalyst
    rewrites it to a null-aware anti join in general, but here it
    PROVES both key sides non-null (parquet stats + the pushed
    IsNotNull filters) and degenerates to the plain broadcast
    LeftAnti fast path — `BroadcastHashJoin LeftAnti, condition
    None` in the plan, which the plan test locks in.

    Scale shape: the supplier exclusion set (a filtered 10k-row dim
    even at 100 TB fact scale) broadcasts; part prunes on
    brand/size at the scan (PushedFilters) and broadcasts into the
    fact scan, so lineitem is filtered before the only wide
    exchange — the partial-distinct aggregate on (brand, size,
    suppkey). COUNT(DISTINCT key) shuffles each group's distinct
    suppliers once, never the raw rows. On a NULLABLE exclusion
    column, null-aware anti join degrades to a nested-loop check at
    scale: prefer an explicit `IS NOT NULL` guard in the subquery
    (free here — s_suppkey is a non-null key)."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP11_SQL)


_EP12_SQL = """
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS totacctbal
    FROM customer
    WHERE CAST(c_acctbal AS DECIMAL(18,2))
              * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
          > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
             FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""


@register(
    "ep12_dormant_rich_customers",
    oracle=_EP12_SQL,
    tags=("sql", "EP12", "subquery"),
)
def ep12_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP12: the TPC-H-Q22 shape — an uncorrelated GLOBAL aggregate
    threshold in the WHERE plus a correlated NOT EXISTS anti-join,
    grouped into segment counts (above-average-balance customers
    with no urgent order; the fixture's customers all have SOME
    order, so the anti condition is priority-scoped, and segment
    stands in for Q22's phone country code). Combines the two
    decorrelations no other ep entry pairs: a one-row broadcast of a
    global aggregate AND a LEFT ANTI hash join against the fact.

    Arithmetic portability: the "above average" comparison is
    cross-multiplied (`balance * count > sum`) so both engines
    compare exact DECIMAL products — an AVG() threshold would hang
    the qualifying set on an order-dependent double division and a
    boundary row could flip between engines. The anti join probes
    only the two pruned orders columns (custkey, priority), so the
    fact never rescans for the subquery.

    Scale shape: scalar subqueries collapse to one-row broadcasts
    (two tiny jobs); the anti join shuffles customer against a
    priority-filtered orders projection on custkey — the only wide
    exchange — then a 5-group hash aggregate. At 100 TB the orders
    side prunes at the scan (priority pushdown) before the join."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP12_SQL)


_EP13_SQL = """
    WITH pv AS (
        SELECT l_partkey,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    AS DECIMAL(18,4))) AS v
        FROM lineitem
        GROUP BY l_partkey)
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM pv
    WHERE v * (SELECT COUNT(*) FROM pv)
          > CAST(1.5 AS DECIMAL(2,1)) * (SELECT SUM(v) FROM pv)
    ORDER BY part_value DESC, l_partkey
"""


#: below this much local lineitem input, ep13's share-of-total runs
#: as the unpartitioned window (single task over the group table —
#: sub-0.1 s below ~100k groups, and no extra job); at or above it
#: (or when the input size is unknowable: a remote store is the
#: production deployment) the broadcast-totals two-pass takes over.
#: Sized from measurement: the window's single-task decimal pass
#: costs ~1.3 us/group (1.69 s at the 64x probe's 1.28M groups)
#: while the broadcast shape's extra one-row aggregate job is a flat
#: ~0.2 s — crossover lands near 6x the sf0.1 fixture's 10.8 MB.
EP13_WINDOW_MAX_BYTES = 64 << 20


@register(
    "ep13_value_share",
    oracle=_EP13_SQL,
    tags=("sql", "EP13", "subquery"),
)
def ep13_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP13: the TPC-H-Q11 shape — groups whose aggregate exceeds a
    threshold derived from the same aggregate over the WHOLE table
    (parts carrying more than 1.5x the average part's discounted
    value). TPC-H itself scales Q11's fraction by 1/SF because a
    fixed share-of-total shrinks as group count grows; deriving the
    threshold from the average (cross-multiplied: ``v * n_parts >
    1.5 * total``) keeps the qualifying fraction (~1.3% of parts)
    stable at every SF with no tuned constant.

    Arithmetic portability: the comparison is cross-multiplied so
    both engines compare exact DECIMAL products — an AVG() division
    would hang the qualifying set on float rounding at the boundary;
    only the display column casts to DOUBLE.

    Scale shape (Spark-first): share-of-total is an ANALYTIC over
    the grouped aggregate, not a join — one lineitem scan into the
    per-part partial+final hash aggregate (the only wide exchange),
    then count/total over the GROUP table via a size-gated pair of
    value-identical shapes (r10): an unpartitioned window on small
    local inputs (one cheap single-task pass, no extra job) and the
    l16 broadcast-totals two-pass past ``EP13_WINDOW_MAX_BYTES`` —
    the window's single partition is group-cardinality-sized and
    its decimal running sum is single-core (isolated at the 64x
    probe's 1.28M groups: 1.69 s vs 0.45 s broadcast). Measured at
    sf0.1: 1.10 s vs 1.66 s for the canonical HAVING-subquery text,
    which pays two extra lineitem scans because each scalar subquery
    replans the fact — the oracle keeps the canonical CTE text, the
    Spark side ships the single-scan form (plan-asserted both
    shapes: one executed scan, window XOR broadcast)."""
    from feray_spark.queries.util import scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    # Per-row arithmetic on LONGS in whole-stage codegen:
    # cents * (100 - disc_cents) is the discounted price x 10^4 as an
    # exact integer. ONE plain long sum per part (the ep6 single-agg
    # lesson, r11): the two-level (key, partition_id) pattern bought
    # overflow headroom this key does not need — rows per l_partkey
    # is ~30 by lineitem:part construction at every SF, and the long
    # cap needs ~8e9 max-value lines of ONE part (row_v4 < ~1.1e9) —
    # while its near-unique-key-per-partition partials reduced 38M
    # rows only to 22M at the 64x probe and then paid a SECOND
    # exchange of those partials. Interleaved 64x A/B: 6.48 -> 5.29 s
    # median, outputs equal (decomposition: scan 1.1 s, row expr
    # free since the scaled_long fast leg, partial agg + the extra
    # exchange were the remainder).
    row_v4 = scaled_long("l_extendedprice") * (
        F.lit(100) - scaled_long("l_discount")
    )
    g = li.groupBy("l_partkey").agg(
        F.sum(row_v4).cast("decimal(38,0)").alias("v4")  # v x 10^4
    )
    # count/total: TWO value-identical shapes, picked by input size
    # (the fan_out/CANON_ARROW_MIN_BYTES gate pattern).
    #
    # - big (or unknown-size) input: one-row aggregate broadcast back
    #   onto the group table (the l16 broadcast-totals pattern). The
    #   unpartitioned window funnels the whole group table through
    #   ONE task whose per-row decimal(38,0) running sum is
    #   single-core BigDecimal work growing linearly with group
    #   cardinality — isolated on the 64x probe corpus's 1.28M-group
    #   table: window 1.69 s vs broadcast 0.45 s (whole query
    #   9.85 -> 9.25 s median, interleaved). The totals branch
    #   re-reads the final agg's shuffle via AQE stage reuse, so
    #   lineitem is still scanned ONCE (executed plan: 1 FileScan,
    #   1 ReusedExchange).
    # - small local input: the window form — below ~100k groups the
    #   single-task pass is sub-0.1 s while the broadcast shape's
    #   extra job costs a flat ~0.15-0.2 s (sf0.1 interleaved A/B:
    #   window 0.71 s vs broadcast 0.88 s).
    from feray_spark.functions.text import _local_scan_bytes

    sz = _local_scan_bytes(li)
    if sz is not None and sz < EP13_WINDOW_MAX_BYTES:
        from pyspark.sql import Window

        w = Window.partitionBy()
        shared = g.withColumn("__n", F.count("*").over(w)).withColumn(
            "__tot", F.sum("v4").over(w)
        )
    else:
        totals = g.agg(
            F.count("*").alias("__n"), F.sum("v4").alias("__tot")
        )
        shared = g.crossJoin(F.broadcast(totals))
    return (
        shared
        # v * n > 1.5 * tot, cross-multiplied by 2 to stay integral:
        # all-decimal exact compare on the group table
        .filter(
            F.lit(2) * F.col("v4") * F.col("__n")
            > F.lit(3) * F.col("__tot")
        )
        .select(
            "l_partkey",
            (F.col("v4") / F.lit(10000)).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


_EP14_SQL = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    AS DECIMAL(18,4))) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
"""


@register(
    "ep14_top_supplier",
    oracle=_EP14_SQL,
    tags=("sql", "EP14", "subquery"),
)
def ep14_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP14: the TPC-H-Q15 shape — a derived view (quarterly revenue
    per supplier) consumed TWICE: once as the join input and once
    under a MAX scalar subquery that selects the argmax row(s) by
    exact equality. The last classic view-reuse pattern: ep10 reuses
    a CTE across EXISTS legs; this reuses one across a scalar
    aggregate and the main join.

    Arithmetic portability: the revenue view keeps exact DECIMAL all
    the way through the MAX comparison — equality on DECIMAL is
    bit-stable across engines, where a DOUBLE max-equality could
    drop or duplicate the argmax row on a ulp; only the displayed
    column casts to DOUBLE.

    Scale shape: each consumption of `revenue` plans its own pruned
    lineitem scan (shipdate pushdown cuts the quarter first) — the
    honest cost of the canonical Q15 text; Catalyst collapses the
    MAX side to a one-row broadcast, the supplier dim broadcasts
    into the filtered view, and the only wide exchange is the
    per-suppkey partial aggregate. When the view is yours to
    rewrite, a single-scan window form
    (MAX(total_rev) OVER () with one extra tiny exchange) computes
    it once — the W8/o3 top-k pattern — but the entry keeps the
    subquery text because its job is proving the engine runs the
    form users write."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP14_SQL)


_EP15_SQL = """
    WITH c_orders AS (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey)
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
"""


@register(
    "ep15_order_count_distribution",
    oracle=_EP15_SQL,
    tags=("sql", "EP15"),
)
def ep15_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP15: the TPC-H-Q13 shape — TWO-LEVEL aggregation over an
    outer join: count orders per customer (with a non-trivial
    predicate inside the JOIN's ON clause, so match-less customers
    survive as zero counts — a WHERE would wrongly drop them), then
    aggregate the distribution of those counts. The one aggregation
    shape the ep family lacked: the second GROUP BY keys on the
    FIRST aggregation's output, the classic histogram-of-group-sizes
    query behind engagement/skew dashboards.

    Scale shape: the ON-clause filter pushes to the orders scan
    (PushedFilters — only non-LOW orders are scanned), the outer
    join shuffles on custkey, the per-customer count partials
    map-side, and the second aggregate runs over one row per
    customer — at 100 TB the histogram input is dim-sized, and its
    own exchange moves at most one row per distinct count value.
    COUNT(column) vs COUNT(*) semantics carry the null-preserving
    zero rows; both engines CAST to BIGINT so the distribution keys
    hash identically."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP15_SQL)


_EP16_SQL = """
    WITH pq AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_sum,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        GROUP BY l_partkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS small_revenue
    FROM lineitem
    JOIN pq ON lineitem.l_partkey = pq.l_partkey
    WHERE CAST(l_quantity AS DECIMAL(18,2)) * CAST(2 AS BIGINT) * n
          < qty_sum
"""


@register(
    "ep16_small_quantity_revenue",
    oracle=_EP16_SQL,
    tags=("sql", "EP16"),
)
def ep16_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP16: the TPC-H-Q17 shape — fact rows qualified against a
    PER-GROUP aggregate of the same fact (lines below half their
    part's average quantity; the "small-order revenue" query). Q17's
    canonical text is a correlated scalar AVG in the WHERE; AVG's
    division would hang the qualifying set on float rounding at the
    boundary, so this entry ships the decorrelated join form with
    the comparison CROSS-MULTIPLIED (qty * 2 * n < sum — all exact
    DECIMAL/BIGINT products, bit-stable across engines), which is
    also precisely the plan Catalyst's RewriteCorrelatedScalarSubquery
    would produce: one aggregate over the inner fact joined back on
    the correlation key.

    Scale shape: two scans of lineitem — the per-part (sum, count)
    aggregate (partial map-side, one shuffle on partkey) joins back
    to the fact on the same key; with the fact bucketed by partkey
    (sources/bucketing) both sides co-locate and the join shuffle
    disappears. The final aggregate is global: one row crosses the
    last exchange.

    Deliberately NOT rewritten onto the ep6/ep13 scaled-long partial
    pattern: measured at sf0.1 the two-level form is SLOWER here
    (1.27 vs 1.08 s interleaved median) — this query's per-row
    decimal work is a single cheap cast-and-sum, so the extra
    partial-aggregation stage costs more than the BigDecimal it
    avoids. The pattern pays only where the per-row decimal
    expression is heavy (ep13's product) or the fact aggregates
    twice (ep6)."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP16_SQL)


_EP17_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part ON p_partkey = l.l_partkey
        WHERE p_type = 'PROMO'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) * CAST(2 AS BIGINT)
               > (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
                  FROM lineitem l2
                  WHERE l2.l_partkey = l.l_partkey
                    AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l2.l_shipdate < TIMESTAMP '1997-01-01'))
    ORDER BY s_suppkey
"""


@register(
    "ep17_majority_supplier",
    oracle=_EP17_SQL,
    tags=("sql", "EP17", "subquery"),
)
def ep17_majority_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP17: the TPC-H-Q20 shape — the DEEPEST classic nesting: a
    correlated scalar aggregate inside a HAVING inside an IN
    subquery (suppliers who shipped the MAJORITY of some PROMO
    part's quantity in 1996; "majority of availability" adapted to
    majority-of-shipments because the fixture set has no partsupp).
    ep5 covers one correlated scalar, ep6 one HAVING-IN — this
    composes them two levels deep, the form that breaks naive
    per-row subquery execution hardest.

    Scale shape: Catalyst decorrelates inside-out — the scalar
    becomes ONE window-free aggregate of the 1996 window joined back
    on l_partkey (Inner), the HAVING filters the joined aggregates,
    and the IN becomes a LEFT SEMI probe into the supplier dim
    (plan-asserted: Inner + Inner + LeftSemi, no nested loop, no
    per-group re-execution). The shipdate/p_type predicates push to
    every scan. The majority test is cross-multiplied
    (``sum * 2 > part_total``) — exact DECIMAL on both engines, no
    division at the qualifying boundary."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP17_SQL)


_EP18_SQL = """
    WITH eu_supply AS (
        SELECT l_partkey AS ps_partkey,
               s_name,
               l_extendedprice / l_quantity AS unit_cost
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE' AND l_quantity > 0
    )
    SELECT DISTINCT
           p.p_partkey,
           e.s_name,
           CAST(ROUND(e.unit_cost, 9) AS DOUBLE) AS unit_cost
    FROM part p
    JOIN eu_supply e ON e.ps_partkey = p.p_partkey
    WHERE p.p_size BETWEEN 10 AND 20
      AND p.p_type = 'PROMO'
      AND e.unit_cost = (SELECT MIN(e2.unit_cost)
                         FROM eu_supply e2
                         WHERE e2.ps_partkey = p.p_partkey)
"""


@register(
    "ep18_min_cost_supplier",
    oracle=_EP18_SQL,
    tags=("sql", "EP18", "subquery"),
)
def ep18_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP18: the TPC-H-Q2 shape — a correlated scalar MIN whose
    subquery is itself a multi-table join (region-restricted
    suppliers), referenced from the outer join's filter: for every
    PROMO part in a size band, the EUROPE suppliers offering its
    minimum unit price. Q2's "min ps_supplycost" adapted to
    min-observed-unit-price because the fixture set has no partsupp.
    ep5 covers a correlated MIN over ONE table; this is the form
    where the correlated branch is a 4-table join shared (via the
    CTE) with the outer query — the classic test that the optimizer
    decorrelates ONCE instead of re-running the join per outer row.

    Scale shape: Catalyst rewrites the scalar subquery into one
    per-part MIN aggregate of eu_supply joined back on p_partkey —
    eu_supply's join tree is planned once per side with the
    region/nation dims broadcast; no per-row re-execution, no nested
    loop. Equality on the raw IEEE doubles (division is bit-exact in
    both engines); ROUND(,9) only on the printed column.
    All achieving suppliers are returned (DISTINCT) — a set, so no
    tie-break ordering is needed for the value hash."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP18_SQL)


_EP19_SQL = """
    SELECT cust_nation,
           supp_nation,
           l_year,
           CAST(SUM(rev) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
        SELECT n1.n_name AS cust_nation,
               n2.n_name AS supp_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    AS DECIMAL(18,4)) AS rev
        FROM lineitem
        JOIN orders    ON o_orderkey = l_orderkey
        JOIN customer  ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                             AND TIMESTAMP '1996-12-31 23:59:59'
    ) shipping
    GROUP BY cust_nation, supp_nation, l_year
"""


@register(
    "ep19_volume_shipping",
    oracle=_EP19_SQL,
    tags=("sql", "EP19"),
)
def ep19_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP19: the TPC-H-Q7 shape — a six-table join where the SAME
    dimension (nation) joins twice under different roles (customer's
    nation and supplier's nation) with a symmetric OR pair predicate,
    grouped by both role names and the shipment year. The canonical
    test of alias-aware join planning: n1/n2 must resolve as two
    independent broadcasts, and the OR pair must not defeat the
    dimension filters.

    Scale shape: both nation sides and supplier broadcast; the
    OR-pair predicate evaluates post-join on the two tiny name
    columns (it cannot split into per-scan pushdowns, exactly as in
    Q7); the date window pushes to the lineitem scan. Revenue rides
    the ep3c exact-decimal product; year is extracted once scan-side.
    ONE hash aggregate on (nation pair, year), map-side partials."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP19_SQL)


_EP20_SQL = """
    SELECT o_year,
           CAST(ROUND(
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
                             ELSE CAST(0 AS DECIMAL(18,4)) END)
                    AS DOUBLE)
               / CAST(SUM(rev) AS DOUBLE), 9) AS DOUBLE) AS mkt_share,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               n2.n_name AS supp_nation,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    AS DECIMAL(18,4)) AS rev
        FROM lineitem
        JOIN part      ON p_partkey = l_partkey
        JOIN orders    ON o_orderkey = l_orderkey
        JOIN customer  ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region    ON r_regionkey = n1.n_regionkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'ECONOMY'
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 23:59:59'
    ) all_nations
    GROUP BY o_year
"""


@register(
    "ep20_market_share",
    oracle=_EP20_SQL,
    tags=("sql", "EP20"),
)
def ep20_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP20: the TPC-H-Q8 shape — an eight-table star (nation twice,
    region gating the CUSTOMER side only) folded into a per-year
    MARKET SHARE: a conditional-sum / total-sum ratio where the
    condition reads the SUPPLIER-side dimension. Composes Q7's
    dual-role nation join with Q14's conditional-ratio aggregate at
    one more join of depth.

    Scale shape: every dimension broadcasts; lineitem is the only
    fact scanned, with the date window pushed to the orders scan and
    the type filter to part; numerator and denominator fold into ONE
    aggregate over the joined stream (no second pass, no self-join).
    Both sums are exact DECIMAL(18,4) accumulations cast to DOUBLE
    before the one division (bit-identical in both engines),
    ROUND(,9) guards the printed share."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP20_SQL)


_EP21_SQL = """
    SELECT nation,
           o_year,
           CAST(SUM(amount) AS DOUBLE) AS sum_profit,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    AS DECIMAL(18,4))
               - CAST(CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(0.5 AS DECIMAL(2,1))
                      AS DECIMAL(18,3))
                 * CAST(l_quantity AS DECIMAL(4,1)) AS amount
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
"""


@register(
    "ep21_product_profit",
    oracle=_EP21_SQL,
    tags=("sql", "EP21"),
)
def ep21_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP21: the TPC-H-Q9 shape — profit per supplier-nation per
    year over every part whose NAME matches an infix LIKE (the
    predicate that cannot push into a dictionary/min-max filter),
    with the measure an ARITHMETIC MIX of fact and dimension columns
    (revenue minus imputed cost; Q9's ps_supplycost adapted to
    0.5 x p_retailprice because the fixture set has no partsupp).

    Scale shape: the LIKE filters part BEFORE its broadcast (the
    only selective predicate in the query — it prunes the fact
    stream through the join, which is Q9's planning lesson);
    supplier/nation broadcast; ONE hash aggregate on (nation, year).
    The mixed measure stays exact: each side of the subtraction is
    a bounded-scale DECIMAL product (no precision-loss truncation in
    either engine), summed exactly, cast to DOUBLE once."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP21_SQL)


_EP22_SQL = """
    SELECT c_custkey,
           c_name,
           CAST(SUM(rev) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           n_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM (
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(8,2)))
                    AS DECIMAL(18,4)) AS rev
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1995-04-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
    ) returned
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY SUM(rev) DESC, c_custkey
    LIMIT 20
"""


@register(
    "ep22_returned_items",
    oracle=_EP22_SQL,
    tags=("sql", "EP22", "topk"),
)
def ep22_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP22: the TPC-H-Q10 shape — the classic "top customers by
    returned-item revenue" report: a one-quarter order window and a
    fact-side flag filter feed a four-table join, grouped by the
    FULL customer identity (key, name, balance, nation) and cut to
    the global top 20 by revenue. Completes the 22/22 TPC-H shape
    coverage of the EP SQL surface (Q1 is a1, Q2/Q7/Q8/Q9 are
    ep18-ep21, the rest ep3-ep17).

    Scale shape: customer/nation broadcast; the quarter window
    pushes to the orders scan and the returnflag to the lineitem
    scan, so only matched fact rows reach the join; ONE hash
    aggregate on the customer identity (the key makes grouping
    skew-free); ORDER BY + LIMIT plans as TakeOrderedAndProject
    (per-partition top-20, then a 20-row driver merge — never a
    global sort). Ordering ties break on the EXACT decimal revenue
    then c_custkey, so the selected 20 rows are deterministic in
    both engines; the printed revenue is the exact sum cast to
    DOUBLE once."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP22_SQL)


_EP23_SQL = """
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                         * CAST(l_discount AS DECIMAL(8,2))
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@register(
    "ep23_forecast_revenue",
    oracle=_EP23_SQL,
    tags=("sql", "EP23"),
)
def ep23_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP23: the TPC-H-Q6 shape — the pure scan-side query: one
    fact table, three range predicates, one global SUM, no join and
    no grouping. Deliberately the simplest EP entry: it isolates
    whether range predicates on timestamp and double columns reach
    the parquet scan as pushed filters (row-group min/max pruning at
    scale) with nothing else in the plan to hide behind.

    Scale shape: all three predicates push to the scan
    (PushedFilters shows the shipdate window, the discount band and
    the quantity cut); the single global aggregate runs as map-side
    partials into a one-row final — no shuffle of data rows, only
    of 32 partial states. The revenue measure is the exact
    DECIMAL(18,2) x DECIMAL(8,2) product accumulated exactly and
    cast to DOUBLE once (the discount-band comparison itself happens
    on the raw IEEE doubles, bit-identical in both engines)."""
    from feray_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_EP23_SQL)
