"""Delta Lake backend for the versioned-table contract — the
"mechanical swap" promised in :mod:`feray_spark.sources.table_store`.

The reference stack claims Delta via delta-rs (reference
``README.md:15``); our segment-log :class:`TableStore` reproduces the
capability contract (time travel, MERGE, replaceWhere, commit user
metadata) over plain parquet. This module is the other half of that
promise: the SAME API surface implemented with real ``delta-spark``
calls, so a deployment with the Delta jars switches backends by
swapping the constructor — nothing downstream changes.

Import-gated: ``delta-spark`` is not in the test image, so
construction raises a clear error when the package is missing and
``available()`` lets callers/tests probe first. The shared contract
suite (tests/test_store_contract.py) runs every assertion against the
segment-log store unconditionally and against this backend whenever
the runtime actually has Delta — which is exactly what "mechanical
swap" should mean: one test file, two backends, identical behavior.

Session requirements (static confs, documented by delta-spark):
    spark.sql.extensions=io.delta.sql.DeltaSparkSessionExtension
    spark.sql.catalog.spark_catalog=
        org.apache.spark.sql.delta.catalog.DeltaCatalog
"""

from __future__ import annotations

import json
import os
import threading
import time
from collections.abc import Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: Delta's userMetadata / CDF-default knobs are SESSION-GLOBAL confs;
#: the set -> operation -> restore windows below would cross-
#: contaminate concurrent writers sharing one SparkSession (one
#: write's metadata stamped on another's commit, a CDF default
#: flipped mid-create). Serialized per process; separate sessions/
#: processes are unaffected (each has its own conf).
_CONF_LOCK = threading.Lock()


@dataclass(frozen=True)
class DeltaCommit:
    """Commit info returned by write/replace_where — the shape callers
    of ``TableStore.write`` rely on (``commit.version``,
    ``commit.row_count``, ``commit.user_metadata``), populated from
    the Delta history's latest entry after the write."""

    version: int
    mode: str
    row_count: int
    timestamp: float
    user_metadata: dict[str, Any] = field(default_factory=dict)


def available() -> bool:
    """True when the delta-spark python package is importable."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    return True


def session_ready(spark: SparkSession) -> bool:
    """True when the session was built with the Delta SQL extension
    (a static conf — it cannot be added after the session exists)."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "DeltaSparkSessionExtension" in ext


class DeltaTableStore:
    """TableStore-shaped facade over delta-spark.

    Implements the subset the engine uses: ``write`` (overwrite /
    append, partitioning, commit user metadata), ``read`` (latest or
    ``versionAsOf`` time travel), ``latest_version``, ``merge``
    (keyed upsert), ``replace_where`` (predicate-scoped overwrite
    with Delta's keep-rows-where-predicate-not-TRUE semantics —
    matching the segment-log store's NULL handling, see
    table_store.py replace_where), and ``user_metadata`` readback.
    """

    def __init__(self, root: str):
        if not available():  # pragma: no cover - exercised only sans delta
            raise ImportError(
                "delta-spark is not installed; use "
                "feray_spark.sources.table_store.TableStore (same API) "
                "or add the delta-spark package + jars to the session"
            )
        self.root = root

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    # ------------------------------------------------------- write

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",  # SAME default as TableStore.write — a
        # diverging default would turn the documented mechanical
        # backend swap into silent overwrites of appended history
        user_metadata: dict[str, Any] | None = None,
        partition_by: Sequence[str] | None = None,
        merge_schema: bool = False,
        *,
        enable_cdf: bool = True,
    ) -> DeltaCommit:
        """Append/overwrite; returns commit info like
        ``TableStore.write`` (callers use ``.version`` /
        ``.row_count`` / ``.user_metadata``). ``enable_cdf`` makes a
        table CREATED by this write carry
        ``delta.enableChangeDataFeed=true`` (via the session's
        table-property default, so no extra property-set commit) —
        without it, :meth:`changes` on the store's own tables raises
        at read time, breaking the TableStore twin's
        change-feed-always-available contract."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        cdf_conf = (
            "spark.databricks.delta.properties.defaults."
            "enableChangeDataFeed"
        )
        with _CONF_LOCK:  # session-global conf: see the lock's note
            prev_cdf = None
            try:
                prev_cdf = df.sparkSession.conf.get(cdf_conf, None)
                # scoped to THIS write: a leaked session default would
                # both ignore a later enable_cdf=False and silently
                # turn CDF on for Delta tables created by unrelated
                # code
                df.sparkSession.conf.set(
                    cdf_conf, "true" if enable_cdf else "false"
                )
            except Exception:  # pragma: no cover - locked-down conf
                pass
            writer = df.write.format("delta").mode(mode)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            if user_metadata:
                writer = writer.option(
                    "userMetadata", json.dumps(user_metadata)
                )
            if mode == "overwrite":
                writer = writer.option("overwriteSchema", "true")
            if merge_schema:
                writer = writer.option("mergeSchema", "true")
            try:
                writer.save(self._path(table))
            finally:
                try:
                    if prev_cdf is None:
                        df.sparkSession.conf.unset(cdf_conf)
                    else:
                        df.sparkSession.conf.set(cdf_conf, prev_cdf)
                except Exception:  # pragma: no cover - locked-down conf
                    pass
        return self._latest_commit(df.sparkSession, table, mode)

    def _latest_commit(
        self, spark: SparkSession, table: str, mode: str
    ) -> DeltaCommit:
        from delta.tables import DeltaTable

        hist = (
            DeltaTable.forPath(spark, self._path(table))
            .history(1)
            .select("version", "userMetadata", "operationMetrics")
            .collect()[0]
        )
        metrics = hist["operationMetrics"] or {}
        try:
            row_count = int(metrics.get("numOutputRows", -1))
        except (TypeError, ValueError):  # pragma: no cover - metric absent
            row_count = -1
        # TableStore's Commit.row_count is the TOTAL table rows after
        # the commit (its tests pin 2-append-1 == 3). Delta's
        # numOutputRows equals that total ONLY for overwrite (the one
        # commit that rewrote everything): on append it is the batch
        # size, and on merge/replaceWhere it counts rows written to
        # the REWRITTEN files only (untouched files excluded) — so
        # every non-overwrite mode (and a metric-absent commit) takes
        # the full recount to keep the twin contract.
        if row_count < 0 or mode != "overwrite":
            row_count = self.read(spark, table).count()
        raw = hist["userMetadata"]
        return DeltaCommit(
            version=int(hist["version"]),
            mode=mode,
            row_count=row_count,
            timestamp=time.time(),
            user_metadata=json.loads(raw) if raw else {},
        )

    # -------------------------------------------------------- read

    def read(
        self, spark: SparkSession, table: str, *, version: int | None = None
    ) -> DataFrame:
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", str(version))
        return reader.load(self._path(table))

    def latest_version(self, spark: SparkSession, table: str) -> int:
        from delta.tables import DeltaTable

        hist = DeltaTable.forPath(spark, self._path(table)).history(1)
        return int(hist.select("version").collect()[0][0])

    def user_metadata(self, spark: SparkSession, table: str) -> dict[str, Any]:
        from delta.tables import DeltaTable

        hist = DeltaTable.forPath(spark, self._path(table)).history(1)
        raw = hist.select("userMetadata").collect()[0][0]
        return json.loads(raw) if raw else {}

    # -------------------------------------------- change data feed

    def changes(
        self,
        spark: SparkSession,
        table: str,
        from_version: int,
        to_version: int | None = None,
        keys: Sequence[str] | None = None,  # noqa: ARG002 - Delta classifies
    ) -> DataFrame:
        """Delta's native CDF (``readChangeFeed``) — the twin of
        ``TableStore.changes``. Delta materializes change files at
        write time, so the read is a plain scan; requires the table
        property ``delta.enableChangeDataFeed=true``. ``keys`` is
        accepted for call-shape parity (Delta's MERGE classifies
        updates itself). Exclusive ``from_version`` base, matching
        the segment store: Delta's startingVersion is inclusive, so
        start at ``from_version + 1``. ``from_version == latest``
        returns an empty feed (the standard "anything since my last
        sync?" poll — Delta itself errors when startingVersion
        exceeds latest); a base that was never a committed version
        raises KeyError exactly like ``TableStore.changes``, so a
        poller holding a stale/wrong bookmark gets an error, never a
        silent forever-empty feed."""
        latest = self.latest_version(spark, table)
        if from_version < 0 or from_version > latest:
            raise KeyError(
                f"{table}: from_version {from_version} is not a committed "
                f"version (latest is {latest})"
            )
        end = latest if to_version is None else min(to_version, latest)
        if from_version >= end:
            snap = self.read(spark, table).limit(0)
            from pyspark.sql import functions as F

            return snap.select(
                "*",
                F.lit(None).cast("string").alias("_change_type"),
                F.lit(None).cast("bigint").alias("_commit_version"),
            )
        reader = (
            spark.read.format("delta")
            .option("readChangeFeed", "true")
            .option("startingVersion", str(from_version + 1))
            .option("endingVersion", str(end))
        )
        return reader.load(self._path(table)).drop("_commit_timestamp")

    # ------------------------------------------------------- merge

    def merge(
        self,
        spark: SparkSession,
        table: str,
        source: DataFrame,
        keys: Sequence[str],
        user_metadata: dict[str, Any] | None = None,
    ) -> DeltaCommit:
        """TableStore.merge twin: same signature, same return shape
        (a commit record callers can log), same user_metadata carry
        (via the session's commit-info conf for the MERGE command)."""
        from delta.tables import DeltaTable

        from pyspark.sql import functions as F

        # SAME duplicate-source-key contract as TableStore.merge:
        # Delta only errors when duplicate source rows MATCH a target
        # row — duplicates of an UNMATCHED key would both insert,
        # turning the twin's loud error into silent data duplication
        # (and poisoning every later merge on that key)
        dup = (
            source.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("__merge_dup_n"))
            .filter(F.col("__merge_dup_n") > 1)
            .take(1)
        )
        if dup:
            key_vals = {k: dup[0][k] for k in keys}
            raise ValueError(
                f"{table}: MERGE source has multiple rows per key "
                f"(e.g. {key_vals}); deduplicate to one row per key first"
            )

        um_conf = "spark.databricks.delta.commitInfo.userMetadata"
        with _CONF_LOCK:  # session-global conf: see the lock's note
            prev_um = None
            if user_metadata is not None:
                try:
                    prev_um = spark.conf.get(um_conf, None)
                    spark.conf.set(um_conf, json.dumps(user_metadata))
                except Exception:  # pragma: no cover - locked-down conf
                    pass
            try:
                target = DeltaTable.forPath(spark, self._path(table))
                cond = " AND ".join(f"t.`{k}` = s.`{k}`" for k in keys)
                (
                    target.alias("t")
                    .merge(source.alias("s"), cond)
                    .whenMatchedUpdateAll()
                    .whenNotMatchedInsertAll()
                    .execute()
                )
            finally:
                if user_metadata is not None:
                    try:
                        if prev_um is None:
                            spark.conf.unset(um_conf)
                        else:
                            spark.conf.set(um_conf, prev_um)
                    except Exception:  # pragma: no cover
                        pass
        return self._latest_commit(spark, table, "merge")

    # ----------------------------------------------------- backfill

    def replace_where(
        self,
        spark: SparkSession,
        table: str,
        replacement: DataFrame,
        predicate: str,
        *,
        user_metadata: dict[str, Any] | None = None,
    ) -> DeltaCommit:
        writer = (
            replacement.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", predicate)
        )
        if user_metadata:
            writer = writer.option("userMetadata", json.dumps(user_metadata))
        writer.save(self._path(table))
        return self._latest_commit(spark, table, "replace_where")

    # ----------------------------------------------------- optimize

    def optimize(
        self,
        spark: SparkSession,
        table: str,
        *,
        zorder_by: Sequence[str] | None = None,
    ) -> None:
        """Delta's native ``OPTIMIZE [ZORDER BY]`` — the twin of
        ``TableStore.optimize`` (same call shape; Delta manages file
        sizing itself, so the segment store's ``n_files`` knob has no
        analog here)."""
        from delta.tables import DeltaTable

        opt = DeltaTable.forPath(spark, self._path(table)).optimize()
        if zorder_by:
            opt.executeZOrderBy(*zorder_by)
        else:
            opt.executeCompaction()

    # ------------------------------------------------ restore / clone

    def restore(self, spark: SparkSession, table: str, version: int) -> None:
        """Delta's native ``RESTORE TABLE … TO VERSION AS OF`` — the
        twin of ``TableStore.restore`` (a new commit re-referencing
        the target version's files; history retained)."""
        from delta.tables import DeltaTable

        DeltaTable.forPath(spark, self._path(table)).restoreToVersion(version)

    def clone(
        self,
        spark: SparkSession,
        src_table: str,
        dst_table: str,
        version: int | None = None,
    ) -> None:
        """Delta's ``CREATE TABLE … SHALLOW CLONE`` — the twin of
        ``TableStore.clone`` (version-0 metadata referencing the
        source snapshot's files, zero data copied; vacuuming the
        source can break the clone, exactly as documented there)."""
        src = f"delta.`{self._path(src_table)}`"
        as_of = f" VERSION AS OF {int(version)}" if version is not None else ""
        spark.sql(
            f"CREATE TABLE delta.`{self._path(dst_table)}` "
            f"SHALLOW CLONE {src}{as_of}"
        )
