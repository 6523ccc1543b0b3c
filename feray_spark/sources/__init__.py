"""Sources & sinks (SURVEY §2.1): parquet/CSV/JSON via native Spark
readers, JDBC pass-through, and a versioned table store providing
Delta-like semantics (S2/S3) without external jars."""

from feray_spark.sources.table_store import TableStore  # noqa: F401
