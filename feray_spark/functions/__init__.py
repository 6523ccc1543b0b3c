"""Scalar-function helpers: hashing (record versioning), vector math,
text analysis. All built from `pyspark.sql.functions` primitives so
they stay JVM-side / codegen-friendly."""

from feray_spark.functions.hashing import row_version  # noqa: F401
from feray_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
