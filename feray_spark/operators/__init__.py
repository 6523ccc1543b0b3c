"""Composite operators Spark's DataFrame API lacks natively.

Each operator is a documented DataFrame→DataFrame rewrite (SURVEY §4.3:
no Catalyst fork needed) — as-of / point-in-time joins, dedup families,
similarity search, salted joins, top-k.
"""

from feray_spark.operators.asof import asof_join, point_in_time_join  # noqa: F401
from feray_spark.operators.skew import salted_join  # noqa: F401
from feray_spark.operators.topk import top_k_per_group  # noqa: F401
