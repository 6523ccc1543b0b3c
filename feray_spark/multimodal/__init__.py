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


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes binary, frame_sha256 string"
)


def extract_video_frames(data: bytes) -> list[bytes]:
    """STUB — video frame decoding needs a codec (av/ffmpeg) not
    present in this environment. Production: iterate
    ``av.open(io.BytesIO(data)).decode(video=0)`` and re-encode each
    frame."""
    raise NotImplementedError(
        "video codecs unavailable in this environment; use "
        "fake_chunk_frames for tests or install av/ffmpeg in production"
    )


def fake_chunk_frames(data: bytes, frame_size: int = 32) -> list[bytes]:
    """Deterministic stand-in frame extractor: fixed-size byte chunks
    of the payload act as 'frames' (SQL-reproducible, so the sampling
    plumbing itself is oracle-gated)."""
    return [data[i : i + frame_size] for i in range(0, len(data), frame_size)]


def sample_frames(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    *,
    every: int = 4,
    frame_extractor: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """L6: frame sampling — one row per kept frame (every ``every``-th
    frame of each payload, frame 0 always kept). Row expansion runs
    in ``mapInPandas``: per Arrow batch, each payload expands to its
    sampled frames — memory is bounded by (batch rows x frames per
    payload), and the expansion parallelizes with the scan, no
    shuffle. ``frame_extractor`` defaults to the NotImplementedError
    codec stub; tests and the oracle-gated query pass
    :func:`fake_chunk_frames`."""
    import hashlib

    extract_frames = frame_extractor or extract_video_frames

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, digests = [], [], [], []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                for i, frame in enumerate(extract_frames(bytes(m["data"]))):
                    if i % every:
                        continue
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame)
                    digests.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(frames, dtype=object),
                    "frame_sha256": pd.Series(digests, dtype=object),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        expand, FRAME_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", MEDIA_STRUCT),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """STUB — image resizing needs a codec library. Production:
    PIL ``Image.open(...).resize((width, height))`` re-encoded."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_resize "
        "for tests or install a codec in production"
    )


def fake_resize(data: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer: truncate/cycle the payload to
    ``width*height`` bytes (a 'bitmap' of the target size)."""
    target = max(width * height, 1)
    if not data:
        return bytes(target)
    reps = -(-target // len(data))
    return (data * reps)[:target]


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    media_col: str = "media",
    id_col: str = "doc_id",
    *,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """L6: resize — rewrite each payload to the target dimensions,
    emitting a NEW media struct (same mime/uri, resized data) plus the
    recorded dimensions. Arrow-batched mapInPandas; the resized
    payload replaces the original so downstream stages see one
    consistent media schema."""
    resize = resizer or resize_image

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media": [
                        {
                            "mime": m["mime"],
                            "uri": m["uri"],
                            "data": resize(bytes(m["data"]), width, height),
                        }
                        for m in media
                    ],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        rewrite, RESIZED_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes long, sample_rate int, "
    "duration_s double, rms double"
)


def decode_audio(data: bytes) -> tuple[int, float, float]:
    """STUB — audio decoding needs a codec library not present in
    this environment. Production: soundfile.read(io.BytesIO(data))
    → (sample_rate, duration_seconds, rms_amplitude)."""
    raise NotImplementedError(
        "audio codecs unavailable in this environment; use "
        "fake_decode_audio for tests or install a codec in production"
    )


def fake_decode_audio(data: bytes) -> tuple[int, float, float]:
    """Deterministic stand-in: derives (sample_rate, duration, rms)
    from the payload bytes — byte length stands in for sample count."""
    if not data:
        return (0, 0.0, 0.0)
    sr = (8000, 16000, 44100)[data[0] % 3]
    duration = len(data) / float(sr)
    rms = (sum(b * b for b in data[:256]) / min(len(data), 256)) ** 0.5 / 255.0
    return (sr, duration, rms)


def extract_audio_features(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], tuple[int, float, float]] | None = None,
) -> DataFrame:
    """L6 audio twin of :func:`extract_media_features`: same
    mapInPandas batch shape (Arrow in, constant memory per batch, no
    shuffle), emitting (sample_rate, duration, rms) per payload from
    ``decoder`` — the NotImplementedError stub by default, the
    deterministic fake in tests."""
    decode = decoder or decode_audio

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            decoded = [decode(bytes(m["data"])) for m in media]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": [m["mime"] for m in media],
                    "n_bytes": [len(bytes(m["data"])) for m in media],
                    "sample_rate": [d[0] for d in decoded],
                    "duration_s": [d[1] for d in decoded],
                    "rms": [d[2] for d in decoded],
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        extract, AUDIO_FEATURES_SCHEMA
    )
