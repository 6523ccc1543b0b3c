"""feray_spark — a PySpark-native feature/analytics engine.

A brand-new implementation of the query and data-processing
capabilities of the reference feature-store framework
(feray-org/feray v1.0.0): a memoization-enabled feature store
(reference ``README.md:19-24``) whose declared engine surface
(polars / Ray Data, ``projects/feray/pyproject.toml:23-31``) is
re-expressed here Spark-first — DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the "fastlane" serving path
(reference ``README.md:47-55``), and a thin Python feature-store
layer (versioning, memoization, point-in-time joins) on top.

Layout
------
- ``session``    — SparkSession factory tuned for local + cluster use
- ``catalog``    — fixture/table loading and temp-view registration
- ``sources``    — readers/writers (parquet, csv, json, jdbc, versioned tables)
- ``functions``  — scalar helpers (hashing, text, vectors)
- ``operators``  — composite operators Spark lacks natively
                   (as-of join, dedup, similarity, top-k, salted join)
- ``features``   — FeatureStore / FeatureView / memoization (FS1-FS8)
- ``streaming``  — fastlane Structured Streaming builders (T1-T10)
- ``queries``    — the oracle-gated query catalog mirroring SURVEY.md §2
- ``pipeline``   — the composed corpus→training-shards curation flow
"""

__version__ = "0.1.0"
