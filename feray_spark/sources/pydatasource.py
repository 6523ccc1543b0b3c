"""Python DataSource API (Spark 4) — the table store's commit log as
a first-class readable format (the ``DESCRIBE HISTORY`` analog).

``spark.read.format("feray_history")`` surfaces every commit of a
:class:`~feray_spark.sources.table_store.TableStore` table as rows —
version, mode, row counts, commit metadata — so operational queries
(audit "who replaced what when", memoization-hit dashboards, vacuum
planning) are plain DataFrame queries instead of ad-hoc JSON
spelunking.

Why a Python DataSource and not ``createDataFrame(history())``: the
source form composes with everything the read path owns — it's
registered once per session, reads lazily AT QUERY TIME (a dashboard
re-polling the history sees new commits without re-building a
DataFrame), streams one partition PER COMMIT so a million-commit
production log never materializes driver-side, and is the template
for wiring any external metadata system (the reference's Postgres
registry, ``README.md:16``) into the engine without JVM code.

Usage::

    from feray_spark.sources.pydatasource import register
    register(spark)
    hist = (spark.read.format("feray_history")
            .option("root", "/path/to/store")
            .option("table", "events_features").load())
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: one row per commit; metadata stays a JSON string (schema-free)
HISTORY_SCHEMA = (
    "version bigint, mode string, n_segments int, row_count bigint, "
    "committed_at double, partition_by string, user_metadata string"
)


class _CommitPartition(InputPartition):
    def __init__(self, log_path: str):
        self.log_path = log_path


class TableStoreHistoryDataSource(DataSource):
    """``format("feray_history")`` — options: ``root`` (store root),
    ``table`` (table name)."""

    @classmethod
    def name(cls) -> str:
        return "feray_history"

    def schema(self) -> str:
        return HISTORY_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _HistoryReader(self.options)


class _HistoryReader(DataSourceReader):
    def __init__(self, options):
        root = options.get("root")
        table = options.get("table")
        if not root or not table:
            raise ValueError(
                "feray_history needs .option('root', …) and .option('table', …)"
            )
        self.root = root
        self.table = table

    def partitions(self):
        """One input partition per commit record: executors parse the
        JSON in parallel and a huge production log never passes
        through the driver as data (only as file names)."""
        import os

        log_dir = os.path.join(self.root, self.table, "_log")
        if not os.path.isdir(log_dir):
            raise FileNotFoundError(f"no such table log: {log_dir}")
        return [
            _CommitPartition(os.path.join(log_dir, name))
            for name in sorted(os.listdir(log_dir))
            if name.endswith(".json")
        ]

    def read(self, partition: _CommitPartition):
        try:
            with open(partition.log_path) as f:
                c = json.load(f)
        except FileNotFoundError:
            # the commit was vacuumed between driver-side planning and
            # this executor read — serve the surviving commits instead
            # of failing the whole query (the re-polling dashboard use)
            return
        yield (
            int(c["version"]),
            c["mode"],
            len(c["segments"]),
            int(c["row_count"]),
            float(c["timestamp"]),
            ",".join(c.get("partition_by") or []),
            json.dumps(c.get("user_metadata") or {}, sort_keys=True),
        )


def register(spark) -> None:
    """Register the format on the session (idempotent)."""
    spark.dataSource.register(TableStoreHistoryDataSource)
