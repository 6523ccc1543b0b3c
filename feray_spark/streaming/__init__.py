"""Fastlane / streaming operators — SURVEY §2.9 T1-T10."""

from feray_spark.streaming.fastlane import (  # noqa: F401
    serve_upsert,
    sessionized,
    sliding_counts,
    stream_events,
    stream_dedup,
    tumbling_counts,
)
