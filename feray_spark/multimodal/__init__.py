"""Multimodal columns — SURVEY §2.12 L6.

Model: media payloads are opaque ``binary`` columns wrapped in a
typed struct ``{mime, uri, data}`` (SURVEY §1.2: BinaryType + typed
metadata; pointers to object-store URIs for payloads too large to
inline). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real; the actual image/audio codecs are
NOT in this environment, so the decoder is stubbed behind
``NotImplementedError`` with a deterministic fake used by tests
(clearly marked; swap in PIL/librosa/av in production).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_STRUCT = T.StructType(
    [
        T.StructField("mime", T.StringType(), False),
        T.StructField("uri", T.StringType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)

MEDIA_FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes int, payload_sha256 string, "
    "width int, height int"
)


def attach_media(
    df: DataFrame, payload_col: str, mime: str, id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a binary payload column into the typed media struct. The
    uri records provenance (here: a synthetic scheme + id)."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(mime).alias("mime"),
            F.concat(F.lit("synthetic://"), F.col(id_col).cast("string")).alias("uri"),
            F.col(payload_col).cast("binary").alias("data"),
        ),
    )


def decode_image(data: bytes) -> tuple[int, int]:
    """STUB — image decoding needs a codec library not present in
    this environment. Production: PIL.Image.open(io.BytesIO(data)).
    """
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode "
        "for tests or install a codec in production"
    )


def fake_decode(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in decoder used by tests: derives a fake
    (width, height) from the first payload bytes."""
    if not data:
        return (0, 0)
    return (1 + data[0] % 64, 1 + data[-1] % 64)


def extract_media_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """L6 feature extraction over media structs via ``mapInPandas``:
    Arrow-batched, one Python process per partition, constant memory
    per batch. Emits payload accounting (size, sha256) plus decoded
    dimensions from ``decoder`` (default: the NotImplementedError
    stub — pass :func:`fake_decode` in tests)."""
    import hashlib

    decode = decoder or decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            dims = [decode(bytes(m["data"])) for m in media]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": [m["mime"] for m in media],
                    "n_bytes": [len(bytes(m["data"])) for m in media],
                    "payload_sha256": [
                        hashlib.sha256(bytes(m["data"])).hexdigest() for m in media
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        extract, MEDIA_FEATURES_SCHEMA
    )
