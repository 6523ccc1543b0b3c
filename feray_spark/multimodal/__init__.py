"""Multimodal columns — SURVEY §2.12 L6.

Model: media payloads are opaque ``binary`` columns wrapped in a
typed struct ``{mime, uri, data}`` (SURVEY §1.2: BinaryType + typed
metadata; pointers to object-store URIs for payloads too large to
inline). Decode / feature-extraction runs as Arrow-batched
``mapInPandas``.

Codec policy — real where a format needs no external library, an
explicit ``NotImplementedError`` where it does:

- REAL, dependency-free: WAV/PCM decode (RIFF parse + numpy —
  :func:`decode_wav`), image DIMENSIONS for PNG/JPEG/GIF/BMP/netpbm
  (header-only parsing, :func:`image_dimensions` — the same trick
  the ``imagesize`` family of libraries uses), netpbm pixel decode /
  nearest-neighbor resize (:func:`resize_netpbm`), and frame
  splitting of concatenated-netpbm streams (self-delimiting headers,
  :func:`split_netpbm_stream`).
- STUBBED (codec genuinely required): full pixel decode of
  compressed formats (PNG/JPEG inflate), compressed video and audio
  (mp4/mp3/flac) — production swaps in PIL/av/soundfile at the same
  function slots; deterministic fakes remain for plumbing tests.
"""

from __future__ import annotations

import struct
from collections.abc import Callable, Iterator

import numpy as np
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

#: default-shaped output schemas (id_col="doc_id" over a long id).
#: The extractors build their actual schema from the INPUT id
#: column's name and type — string/int ids both work; these
#: constants document the default shape.
MEDIA_FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes int, payload_sha256 string, "
    "width int, height int"
)


def _id_sql(df: DataFrame, id_col: str) -> str:
    """``name type`` DDL fragment for the id column, resolved the way
    Spark resolves names (exact then case-insensitive). Threading the
    REAL id name/type into every output schema is what lets string
    ids work — a hardcoded ``doc_id long`` dies in the pandas→Arrow
    cast (the similarity operators' ``_dtype_of`` discipline)."""
    for f in df.schema.fields:
        if f.name == id_col:
            return f"`{f.name}` {f.dataType.simpleString()}"
    for f in df.schema.fields:
        if f.name.lower() == id_col.lower():
            return f"`{f.name}` {f.dataType.simpleString()}"
    raise KeyError(id_col)


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


def _netpbm_header(data: bytes) -> tuple[str, int, int, int, int]:
    """Parse a netpbm (P5/P6) header: (magic, width, height, maxval,
    offset of the first sample byte). Handles comments and any
    whitespace, per the spec: magic, width, height, maxval, ONE
    whitespace byte, then raw samples (1 byte each for maxval ≤ 255,
    2 big-endian bytes past that)."""
    magic = data[:2].decode("ascii")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(data):
            # ran off the end scanning for a field: say so — letting
            # int(b'') raise its opaque "invalid literal" hides the
            # real problem from split_netpbm_stream's callers
            raise ValueError("truncated netpbm header")
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    # fields = width, height, maxval; + single whitespace after maxval
    return magic, fields[0], fields[1], fields[2], pos + 1


def image_dimensions(data: bytes) -> tuple[int, int]:
    """REAL, dependency-free (width, height) extraction for
    PNG / JPEG / GIF / BMP / netpbm — dimensions live in the headers,
    no pixel decode needed (the ``imagesize``-library technique).
    Raises ``NotImplementedError`` for unrecognized formats."""
    if data[:8] == b"\x89PNG\r\n\x1a\n":  # IHDR is always first
        w, h = struct.unpack(">II", data[16:24])
        return int(w), int(h)
    if data[:3] == b"\xff\xd8\xff":  # JPEG: scan for a SOFn marker
        pos = 2
        while pos + 9 <= len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            marker = data[pos + 1]
            if marker == 0xFF:  # 0xFF fill byte before a marker
                pos += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                pos += 2  # standalone marker (TEM/RSTn/SOI/EOI): no length
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                return int(w), int(h)
            seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
            pos += 2 + seg_len
        raise NotImplementedError("JPEG without SOF frame header")
    if data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return int(w), int(h)
    if data[:2] == b"BM":
        hdr_size = struct.unpack("<I", data[14:18])[0]
        if hdr_size == 12:  # BITMAPCOREHEADER (OS/2): 16-bit dims
            w, h = struct.unpack("<HH", data[18:22])
            return int(w), int(h)
        if hdr_size >= 40:  # BITMAPINFOHEADER family: 32-bit signed
            w, h = struct.unpack("<ii", data[18:26])
            return int(w), abs(int(h))
        raise NotImplementedError(f"unknown BMP header size {hdr_size}")
    if data[:2] in (b"P5", b"P6"):
        _, w, h, _, _ = _netpbm_header(data)
        return w, h
    raise NotImplementedError(
        "unrecognized image format; install a codec (PIL) in production "
        "or use fake_decode for plumbing tests"
    )


#: decode_image is the L6 decoder slot: real header-dimension parsing
#: for the common formats, NotImplementedError past them.
decode_image = image_dimensions


def _payload(m) -> bytes | None:
    """Inline payload bytes, or None for POINTER-ONLY media rows —
    MEDIA_STRUCT declares ``data`` nullable precisely so payloads too
    large to inline can ride as object-store URIs — and for NULL media
    structs (the column itself is nullable). Extractors must treat
    both as 'not decodable here' (null features / no frames), never
    crash the task on ``bytes(None)`` / ``None["data"]``."""
    if m is None:
        return None
    d = m["data"]
    return None if d is None else bytes(d)


def _mime(m) -> str | None:
    """MIME of a media struct row, None for a NULL struct."""
    return None if m is None else m["mime"]


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
    dimensions from ``decoder`` (default: the REAL header parser
    :func:`image_dimensions`, which raises NotImplementedError only
    for unrecognized formats — pass :func:`fake_decode` for
    format-free plumbing tests)."""
    import hashlib

    decode = decoder or decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [_payload(m) for m in pdf[media_col]]
            # empty payloads (b'' — a zero-byte ingest is at least as
            # common as a pointer row at scale) are accounted
            # (n_bytes=0, real sha256) but never decoded: there is no
            # header to parse, and raising would kill the whole task
            dims = [decode(p) if p else (None, None) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mime": [_mime(m) for m in pdf[media_col]],
                    "n_bytes": pd.array(
                        [len(p) if p is not None else None for p in payloads],
                        dtype="Int32",
                    ),
                    "payload_sha256": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        extract,
        f"{_id_sql(df, id_col)}, mime string, n_bytes int, "
        "payload_sha256 string, width int, height int",
    )


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes binary, frame_sha256 string"
)


def split_netpbm_stream(data: bytes) -> list[bytes]:
    """REAL frame extraction for the one video container that needs
    no codec: a concatenated stream of binary netpbm images (P5/P6 —
    the format ffmpeg emits with ``-f image2pipe -vcodec ppm``).
    Headers are self-delimiting (width × height × channels fixes the
    pixel byte count), so the stream splits exactly."""
    frames = []
    view = memoryview(data)  # header parse without copying the tail:
    # data[pos:] per frame would copy O(stream) bytes per frame —
    # quadratic in stream size for multi-frame payloads
    pos = 0
    while pos < len(data):
        # 64 KiB bounds any legal header (magic + comments + dims);
        # pixel data never parses as header fields
        magic, w, h, maxval, off = _netpbm_header(
            bytes(view[pos : pos + 65536])
        )
        bytes_per_sample = 2 if maxval > 255 else 1  # 16-bit netpbm is legal
        nbytes = w * h * (3 if magic == "P6" else 1) * bytes_per_sample
        end = pos + off + nbytes
        if end > len(data):
            raise ValueError("truncated netpbm frame in stream")
        frames.append(bytes(view[pos:end]))  # one copy: the frame itself
        pos = end
    return frames


def extract_video_frames(data: bytes) -> list[bytes]:
    """The L6 frame-extractor slot: real splitting for concatenated
    netpbm streams; compressed video (mp4/webm) genuinely needs a
    codec — production drops ``av.open(...).decode(video=0)`` in
    here."""
    if data[:2] in (b"P5", b"P6"):
        return split_netpbm_stream(data)
    raise NotImplementedError(
        "compressed video codecs unavailable in this environment; use "
        "a netpbm stream, fake_chunk_frames for tests, or av/ffmpeg "
        "in production"
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
    shuffle. ``frame_extractor`` defaults to
    :func:`extract_video_frames` — REAL splitting for netpbm streams
    (the l6d oracle-gated path), NotImplementedError for compressed
    video; :func:`fake_chunk_frames` remains for format-free
    plumbing tests (the l6b path)."""
    import hashlib

    extract_frames = frame_extractor or extract_video_frames

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, digests = [], [], [], []
            for doc_id, m in zip(pdf[id_col], pdf[media_col]):
                p = _payload(m)
                if not p:  # pointer-only or empty payload: no frames
                    continue
                for i, frame in enumerate(extract_frames(p)):
                    if i % every:
                        continue
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(frame)
                    digests.append(hashlib.sha256(frame).hexdigest())
            # id dtype follows the INPUT column (string ids work);
            # a hardcoded int64 cast would die on non-numeric ids
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(frames, dtype=object),
                    "frame_sha256": pd.Series(digests, dtype=object),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        expand,
        f"{_id_sql(df, id_col)}, frame_idx int, frame_bytes binary, "
        "frame_sha256 string",
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", MEDIA_STRUCT),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_netpbm(data: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for binary netpbm (P5/P6):
    header parse → (h, w, c) numpy view → integer index maps → new
    header + raw bytes. Pure numpy, no codec. Honors the parsed
    maxval (16-bit samples are big-endian per the spec) and restamps
    the SAME maxval, never a silent re-scale."""
    magic, w, h, maxval, off = _netpbm_header(data)
    ch = 3 if magic == "P6" else 1
    dtype = ">u2" if maxval > 255 else np.uint8
    px = np.frombuffer(data, dtype=dtype, count=w * h * ch, offset=off)
    px = px.reshape(h, w, ch)
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = px[rows][:, cols]
    header = f"{magic}\n{width} {height}\n{maxval}\n".encode("ascii")
    return header + out.tobytes()


def dhash_image(data: bytes, hash_size: int = 8) -> int:
    """REAL perceptual hash (difference hash) for netpbm payloads —
    the image analog of the text near-dup fingerprints (L2): decode,
    grayscale, nearest-neighbor resize to (hash_size+1, hash_size),
    then one bit per horizontal gradient sign. Robust to brightness
    shifts and re-encodes (gradients survive both), which byte
    hashes (sha256) are not. 64 bits at the default size — a plain
    long, so dedup is an ordinary groupBy on the hash column.
    Compressed formats: decode with a codec (PIL) into the same
    grid and the rest is unchanged."""
    small = resize_netpbm(data, hash_size + 1, hash_size)
    magic, w, h, maxval, off = _netpbm_header(small)
    ch = 3 if magic == "P6" else 1
    dtype = ">u2" if maxval > 255 else np.uint8
    px = np.frombuffer(small, dtype=dtype, count=w * h * ch, offset=off)
    px = px.reshape(h, w, ch).astype(np.int64).sum(axis=2)  # grayscale-ish
    bits = (px[:, 1:] > px[:, :-1]).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # fold to 64 bits: hash_size > 8 yields hash_size² bits, which
    # must still land in a Spark LongType column — XOR successive
    # 64-bit words (order-preserving, deterministic; a plain truncate
    # would silently discard the high-gradient rows)
    while out >= 1 << 64:
        out = (out & ((1 << 64) - 1)) ^ (out >> 64)
    # two's-complement into a SIGNED 64-bit value so the hash is a
    # Spark LongType column (Arrow has no unsigned long)
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def resize_image(data: bytes, width: int, height: int) -> bytes:
    """The L6 resizer slot: real for netpbm; compressed formats need
    a codec (PIL ``Image.open(...).resize(...)`` in production)."""
    if data[:2] in (b"P5", b"P6"):
        return resize_netpbm(data, width, height)
    raise NotImplementedError(
        "compressed-image codecs unavailable in this environment; use "
        "netpbm payloads, fake_resize for tests, or PIL in production"
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
    consistent media schema. Pointer-only (data=None), NULL-struct
    and empty (b'') rows pass through UNresized with NULL recorded
    dimensions — stamping the target dims on a payload that was never
    rewritten would lie to any consumer that later dereferences the
    uri."""
    resize = resizer or resize_image

    def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            media = pdf[media_col]
            out_media, out_w, out_h = [], [], []
            for m in media:
                p = _payload(m)
                if m is None:
                    out_media.append(None)
                    out_w.append(None)
                    out_h.append(None)
                    continue
                resized = bool(p)  # empty payloads have nothing to resize
                out_media.append(
                    {
                        "mime": m["mime"],
                        "uri": m["uri"],
                        "data": resize(p, width, height) if resized else p,
                    }
                )
                out_w.append(width if resized else None)
                out_h.append(height if resized else None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": out_media,
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                }
            )

    id_field = next(
        f for f in df.schema.fields
        if f.name == id_col or f.name.lower() == id_col.lower()
    )
    out_schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField("media", MEDIA_STRUCT),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        rewrite, out_schema
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, mime string, n_bytes long, sample_rate int, "
    "duration_s double, rms double"
)


def synth_wav(samples: "np.ndarray", sample_rate: int, channels: int = 1) -> bytes:
    """REAL PCM16 WAV writer (RIFF struct packing, no codec): the
    test/fixture twin of :func:`decode_wav`. ``samples`` is int16,
    interleaved when multi-channel."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    data_chunk = struct.pack("<4sI", b"data", len(pcm)) + pcm
    body = b"WAVE" + fmt + data_chunk
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, float, float]:
    """REAL PCM WAV decode — RIFF chunk walk + numpy, no codec:
    returns (sample_rate, duration_seconds, rms) with rms normalized
    to [0, 1] (int16 full scale = 32768; u8 biased at 128). Raises
    ``NotImplementedError`` for compressed wFormatTags."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, channels, bits, fmt_tag, pcm = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid, clen = struct.unpack("<4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            fmt_tag, channels, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_tag != 1 or bits not in (8, 16):
        raise NotImplementedError(
            f"compressed/unsupported WAV (fmt={fmt_tag}, bits={bits}); "
            "install soundfile in production"
        )
    if bits == 16:
        x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n_frames = len(x) // channels
    rms = float(np.sqrt(np.mean(np.square(x)))) if len(x) else 0.0
    return int(sr), n_frames / float(sr), rms


def decode_audio(data: bytes) -> tuple[int, float, float]:
    """The L6 audio-decoder slot: real for PCM WAV; compressed audio
    (mp3/flac/ogg) genuinely needs a codec — production drops
    ``soundfile.read`` in here."""
    if data[:4] == b"RIFF":
        return decode_wav(data)
    raise NotImplementedError(
        "compressed-audio codecs unavailable in this environment; use "
        "WAV payloads, fake_decode_audio for tests, or soundfile in "
        "production"
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
            payloads = [_payload(m) for m in pdf[media_col]]
            # b'' has no RIFF header to decode — account it (n_bytes=0)
            # with NULL audio features rather than raising per task
            decoded = [decode(p) if p else (None, None, None)
                       for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "mime": [_mime(m) for m in pdf[media_col]],
                    "n_bytes": pd.array(
                        [len(p) if p is not None else None for p in payloads],
                        dtype="Int64",
                    ),
                    "sample_rate": pd.array(
                        [d[0] for d in decoded], dtype="Int32"
                    ),
                    "duration_s": [d[1] for d in decoded],
                    "rms": [d[2] for d in decoded],
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        extract,
        f"{_id_sql(df, id_col)}, mime string, n_bytes long, "
        "sample_rate int, duration_s double, rms double",
    )
