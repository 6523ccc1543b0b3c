"""External connectors — SURVEY §2.1 S4 (JDBC/Postgres) and S5
(S3-compatible object stores).

The reference's stack claims Postgres for metadata (`README.md:16`,
sqlmodel dep `projects/feray/pyproject.toml:27`, dagster-postgres
`examples/pyproject.toml:66`) and S3-compatible object stores for
data (`README.md:17`). Spark natively speaks both; this module is
the one place the connection plumbing lives so jobs never
hand-assemble options.

No external services exist in the test environment, but S4 is still
exercised live: the reader against Spark's own in-process Hive
Thrift server (real TCP JDBC, partitioned range scans), the
writer+reader against embedded Apache Derby (jars ship inside the
pyspark wheel) with predicate pushdown asserted on the JDBC scan,
and :func:`jdbc_upsert`'s stage + transactional MERGE + epoch-guard
path end-to-end including checkpoint-replay idempotence — see
tests/test_connectors.py. S5 tests cover option construction and
path handling only (no s3a jars in-image).

Scale notes (S4): JDBC reads default to ONE partition — a silent
single-thread bottleneck. :func:`jdbc_reader` therefore requires
partitioning info for anything but tiny registry tables
(numPartitions + partitionColumn bounds → parallel range scans).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, DataFrameReader, SparkSession

#: hadoop-conf template for S3A (S5). Endpoint-style (path vs vhost)
#: and credentials provider vary by store; these are the settings that
#: matter for any S3-compatible target (MinIO, Ceph, AWS).
S3A_CONF_KEYS = (
    "fs.s3a.endpoint",
    "fs.s3a.access.key",
    "fs.s3a.secret.key",
    "fs.s3a.path.style.access",
    "fs.s3a.connection.maximum",
)


def configure_s3(
    spark: SparkSession,
    *,
    endpoint: str | None = None,
    access_key: str | None = None,
    secret_key: str | None = None,
    path_style: bool = True,
    max_connections: int = 64,
) -> None:
    """S5: point the Hadoop S3A filesystem at an S3-compatible store.
    After this, every source/sink accepts ``s3a://bucket/key`` paths
    unchanged — the engine's path abstraction is the URI scheme."""
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    if endpoint:
        hc.set("fs.s3a.endpoint", endpoint)
    if access_key:
        hc.set("fs.s3a.access.key", access_key)
    if secret_key:
        hc.set("fs.s3a.secret.key", secret_key)
    hc.set("fs.s3a.path.style.access", "true" if path_style else "false")
    hc.set("fs.s3a.connection.maximum", str(max_connections))


def s3_path(bucket: str, key: str) -> str:
    """Canonical object-store path (S5)."""
    return f"s3a://{bucket.strip('/')}/{key.lstrip('/')}"


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    num_partitions: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    fetch_size: int = 10_000,
) -> DataFrameReader:
    """S4: configured JDBC reader (call ``.load()`` to execute).

    For registry-sized tables the default single partition is fine;
    for anything larger pass (num_partitions, partition_column,
    lower/upper_bound) so Spark issues parallel range queries instead
    of one full scan through a single connection.

    ``driver`` pins the JDBC driver class when the URL scheme isn't
    auto-registered (e.g. ``org.apache.hive.jdbc.HiveDriver`` for
    ``jdbc:hive2://`` endpoints — exercised end-to-end in
    tests/test_connectors.py against an in-process Thrift server).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if driver is not None:
        reader = reader.option("driver", driver)
    parts = (num_partitions, partition_column, lower_bound, upper_bound)
    if any(p is not None for p in parts):
        if any(p is None for p in parts):
            raise ValueError(
                "partitioned JDBC read needs all of num_partitions, "
                "partition_column, lower_bound, upper_bound"
            )
        reader = (
            reader.option("numPartitions", str(num_partitions))
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    user: str | None = None,
    password: str | None = None,
    batch_size: int = 10_000,
    driver: str | None = None,
    column_types: str | None = None,
):
    """S4: configured JDBC writer (call ``.save()`` to execute).
    ``driver`` pins the JDBC driver class for endpoints that don't
    auto-register from the URL (e.g. hive2) — the same knob
    :func:`jdbc_reader` exposes; the pair stays symmetric.
    ``column_types`` (Spark's ``createTableColumnTypes``) overrides
    the dialect's default DDL types when THIS write creates the
    table — e.g. ``"name VARCHAR(256)"`` where the default string
    mapping would be a CLOB/TEXT."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    if column_types is not None:
        writer = writer.option("createTableColumnTypes", column_types)
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if driver is not None:
        writer = writer.option("driver", driver)
    return writer


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Sequence[str],
    *,
    order_by: Sequence[str] | str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    epoch_id: int | None = None,
    guard_table: str | None = None,
    staging_table: str | None = None,
    batch_size: int = 10_000,
    column_types: str | None = None,
) -> bool:
    """S4: transactional UPSERT into a JDBC table — the registry-sink
    pattern the reference's Postgres dependency implies: Spark does
    the DISTRIBUTED work (dedupe + parallel staging write), the
    database does the SET-BASED work (one ANSI ``MERGE`` from the
    staging table, inside a transaction). No row ever round-trips
    through the driver, so the sink scales with the JDBC write path,
    not with driver memory.

    Semantics (aligned with ``TableStore.merge`` / Delta):

    - one row per key must reach the MERGE: pass ``order_by`` (e.g.
      ``["ts", "event_id"]``) and the LATEST row per key wins
      (descending, left-to-right tie-break); without it duplicate
      source keys raise, mirroring Delta's multiple-match error;
    - NULL merge keys raise — ``ON t.k = s.k`` would silently turn
      every NULL-keyed row into a fresh insert on each run;
    - ``epoch_id`` makes the call IDEMPOTENT: a guard table (default
      ``{table}__epochs``, primary-keyed on the epoch) is checked
      before and inserted within the MERGE transaction, so a
      checkpoint replay of an already-committed micro-batch is a
      no-op (returns False) and a crash between MERGE and COMMIT
      rolls back both — the exactly-once contract
      :func:`feray_spark.streaming.fastlane.jdbc_upsert_sink` builds
      on. Two writers racing the same epoch: the guard's primary key
      makes exactly one COMMIT win.

    One writer at a time per target: the staging table defaults to
    ``{table}__stage`` and is overwritten per call, so CONCURRENT
    upserts into the same target must pass distinct
    ``staging_table`` names or the loser's staged rows can merge
    under the winner's epoch. A Structured Streaming query satisfies
    this by construction (one active epoch per sink); the guard's
    primary key still bounds the damage to at-most-once per epoch.

    String MERGE keys need ``column_types`` (forwarded to both the
    staging and target CREATE as ``createTableColumnTypes``, e.g.
    ``"name VARCHAR(256)"``): several dialects map StringType to a
    LOB DDL type by default (Derby CLOB, legacy TEXT), and LOBs are
    not equality-comparable in a MERGE ON clause.

    Identifier discipline: Spark's JDBC writer CREATEs staging
    columns quoted (case preserved) but passes table names through
    unquoted — the generated MERGE therefore quotes COLUMN names and
    leaves TABLE names as given, which resolves consistently on
    Derby, Postgres and anything else with standard folding. Names
    are trusted identifiers (this module's contract), not user data.

    Returns True if the MERGE committed, False if the epoch guard
    skipped an already-committed batch.
    """
    import pyspark.sql.functions as F

    from feray_spark.operators.topk import latest_per_key

    if not keys:
        raise ValueError("jdbc_upsert needs at least one merge key")
    if guard_table is not None and epoch_id is None:
        raise ValueError(
            "guard_table set but epoch_id is None — the guard is only "
            "consulted per epoch, so this call would double-apply on "
            "retry while looking idempotence-configured"
        )
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"merge keys not in source columns: {missing}")
    payload = [c for c in df.columns if c not in set(keys)]
    if not payload:
        raise ValueError("jdbc_upsert needs at least one non-key column")

    spark = df.sparkSession
    stage = staging_table or f"{table}__stage"
    guard = guard_table or f"{table}__epochs"

    def connect():
        jvm = spark._jvm
        if driver is not None:
            jvm.java.lang.Class.forName(driver)
        dm = jvm.java.sql.DriverManager
        if user is not None:
            return dm.getConnection(url, user, password or "")
        if password is not None:
            raise ValueError(
                "password given without user — pass user= too, or embed "
                "both in the JDBC URL (DriverManager.getConnection(url) "
                "would silently drop the password)"
            )
        return dm.getConnection(url)

    def execute(conn, sql: str) -> None:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    def scalar_exists(conn, sql: str) -> bool:
        st = conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            try:
                return bool(rs.next())
            finally:
                rs.close()
        finally:
            st.close()

    # epoch pre-check FIRST: on a checkpoint replay of an already-
    # committed batch this one cheap JDBC SELECT makes the whole call
    # a no-op — before any Spark job scans the batch
    if epoch_id is not None:
        conn = connect()
        try:
            try:
                execute(
                    conn,
                    f"CREATE TABLE {guard} ("
                    "epoch_id BIGINT NOT NULL PRIMARY KEY, "
                    "committed_at TIMESTAMP)",
                )
            except Exception:
                # exists already (or a racing writer created it) —
                # verified usable by the probe below either way
                pass
            if scalar_exists(
                conn, f"SELECT 1 FROM {guard} WHERE epoch_id = {int(epoch_id)}"
            ):
                return False
        finally:
            conn.close()


    null_key = df.filter(
        " OR ".join(f"`{k}` IS NULL" for k in keys)
    )
    if null_key.take(1):
        raise ValueError(
            f"NULL merge key reached jdbc_upsert({table}): ON-equality "
            "would re-insert such rows every run; filter or key them "
            "explicitly upstream"
        )

    if order_by is not None:
        order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
        src = latest_per_key(
            df, list(keys), [F.col(c).desc() for c in order_cols]
        )
    else:
        # aliased aggregate: .count() emits a column literally named
        # "count", ambiguous when a merge key carries that name
        dup = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__jdbc_dup_n"))
            .filter(F.col("__jdbc_dup_n") > 1)
        )
        if dup.take(1):
            raise ValueError(
                f"duplicate merge keys in jdbc_upsert({table}) source and "
                "no order_by to resolve them (Delta's multiple-match rule)"
            )
        src = df

    # distributed staging write (scratch table, overwritten per call)
    jdbc_writer(
        src, url, stage, mode="overwrite", user=user, password=password,
        batch_size=batch_size, driver=driver, column_types=column_types,
    ).save()
    # target must exist for MERGE: an EMPTY append creates it with
    # Spark's own JDBC type mapping and is a no-op when it exists
    jdbc_writer(
        spark.createDataFrame([], src.schema), url, table, mode="append",
        user=user, password=password, driver=driver,
        column_types=column_types,
    ).save()

    q = '"'
    on = " AND ".join(f"t.{q}{k}{q} = s.{q}{k}{q}" for k in keys)
    sets = ", ".join(f"{q}{c}{q} = s.{q}{c}{q}" for c in payload)
    cols = ", ".join(f"{q}{c}{q}" for c in src.columns)
    vals = ", ".join(f"s.{q}{c}{q}" for c in src.columns)
    merge_sql = (
        f"MERGE INTO {table} t USING {stage} s ON ({on}) "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )

    conn = connect()
    try:
        conn.setAutoCommit(False)
        try:
            if epoch_id is not None:
                # PK violation here = a racing/earlier commit of this
                # epoch → abort as already-done, exactly-once holds.
                # ONLY an integrity violation may be read that way: a
                # transient failure (lock timeout, dropped connection)
                # must RE-RAISE — returning False would let the
                # streaming checkpoint advance past a batch that was
                # never merged (silent data loss).
                try:
                    execute(
                        conn,
                        f"INSERT INTO {guard} (epoch_id, committed_at) "
                        f"VALUES ({int(epoch_id)}, CURRENT_TIMESTAMP)",
                    )
                except Exception as e:
                    conn.rollback()
                    state = ""
                    je = getattr(e, "java_exception", None)
                    if je is not None:
                        try:
                            state = je.getSQLState() or ""
                        except Exception:
                            state = ""
                    msg = str(e)
                    # ONLY a unique/PK violation reads as "already
                    # committed" — the broad integrity class 23 would
                    # also match NOT NULL/FK/CHECK failures on a
                    # mis-shaped guard table and silently skip EVERY
                    # epoch (the exact data-loss path the comment
                    # above forbids)
                    duplicate = (
                        state == "23505"  # unique violation (std/Derby/PG)
                        or "duplicate key" in msg.lower()
                        or "unique constraint" in msg.lower()
                        # MySQL reports duplicate PKs as SQLSTATE 23000
                        # (the broad class we must NOT match) with
                        # "Duplicate entry ... for key ..." — match the
                        # message so a racing same-epoch commit returns
                        # False instead of raising on that dialect
                        or "duplicate entry" in msg.lower()
                    )
                    if duplicate:
                        return False
                    raise
            execute(conn, merge_sql)
            conn.commit()
            return True
        except Exception:
            conn.rollback()
            raise
    finally:
        conn.close()
