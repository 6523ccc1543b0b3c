"""Feature-store layer — SURVEY §2.11 FS1-FS8, the reference's
raison d'être ("Memoization-enabled feature store",
``projects/feray/pyproject.toml:4``)."""

from feray_spark.features.registry import publish_registry  # noqa: F401
from feray_spark.features.store import FeatureStore, FeatureView  # noqa: F401
from feray_spark.features.versioning import (  # noqa: F401
    code_version,
    with_data_version,
)
