"""Dependency-free codec tests — the REAL half of the L6 surface.

decode_wav is cross-checked against the stdlib ``wave`` writer (an
independent RIFF implementation), image_dimensions against
struct-built headers of every supported format, and the netpbm
resize/split paths against exact expected bytes.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import types as T

from feray_spark.multimodal import (
    decode_audio,
    decode_wav,
    image_dimensions,
    resize_netpbm,
    sample_frames,
    split_netpbm_stream,
    synth_wav,
)


def test_decode_wav_roundtrips_synth():
    amp, sr, n = 12000, 16000, 1600
    wave_samples = np.where(np.arange(n) % 2 == 0, amp, -amp)
    got_sr, dur, rms = decode_wav(synth_wav(wave_samples, sr))
    assert got_sr == sr
    assert dur == n / sr
    assert rms == amp / 32768.0  # bit-exact for a square wave


def test_decode_wav_matches_stdlib_writer():
    """Cross-implementation check: bytes written by the stdlib wave
    module (independent RIFF code) must decode identically."""
    sr, n = 8000, 777
    samples = (np.sin(np.arange(n) * 0.1) * 20000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(samples.tobytes())
    got_sr, dur, rms = decode_wav(buf.getvalue())
    assert got_sr == sr and dur == n / sr
    expect = float(np.sqrt(np.mean(np.square(samples.astype(np.float64) / 32768.0))))
    assert rms == pytest.approx(expect, abs=1e-12)


def test_decode_wav_stereo_and_u8():
    sr = 12000
    stereo = np.zeros(400, dtype="<i2")
    stereo[::2] = 1000  # L channel square, R silent
    got_sr, dur, _ = decode_wav(synth_wav(stereo, sr, channels=2))
    assert got_sr == sr and dur == 200 / sr  # frames = samples / channels
    # u8 WAV: bias 128
    pcm = bytes([128 + 64, 128 - 64] * 100)
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sr, sr, 1, 8)
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(pcm)) + pcm
    data = struct.pack("<4sI", b"RIFF", len(body)) + body
    got_sr, dur, rms = decode_wav(data)
    assert got_sr == sr and rms == 64 / 128.0


def test_decode_wav_rejects_compressed():
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 85, 1, 44100, 0, 0, 0)  # mp3 tag
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", 0)
    data = struct.pack("<4sI", b"RIFF", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav(data)
    with pytest.raises(NotImplementedError):
        decode_audio(b"\xff\xfb\x90\x00 not riff")


def test_image_dimensions_all_formats():
    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">I4sII", 13, b"IHDR", 640, 480)
    assert image_dimensions(png) == (640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert image_dimensions(gif) == (320, 200)
    bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)  # BITMAPINFOHEADER size
        + struct.pack("<ii", 1024, -768) + b"\x00" * 8
    )
    assert image_dimensions(bmp) == (1024, 768)  # top-down BMP: |height|
    # minimal JPEG: SOI, APP0 (skipped by length), SOF0
    jpeg = (
        b"\xff\xd8\xff"
        + b"\xe0\x00\x04\x00\x00"  # APP0, len 4
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 300, 400) + b"\x03" + b"\x00" * 9
    )
    assert image_dimensions(jpeg) == (400, 300)
    ppm = b"P6\n# a comment\n12 7\n255\n" + bytes(12 * 7 * 3)
    assert image_dimensions(ppm) == (12, 7)
    with pytest.raises(NotImplementedError):
        image_dimensions(b"not an image at all")


def _p6(w, h, px):
    return f"P6\n{w} {h}\n255\n".encode() + bytes(px)


def test_resize_netpbm_exact():
    # 2x2 RGB image -> 4x4 nearest-neighbor: each pixel becomes 2x2
    px = [255, 0, 0, 0, 255, 0,  # row 0: red, green
          0, 0, 255, 255, 255, 255]  # row 1: blue, white
    out = resize_netpbm(_p6(2, 2, px), 4, 4)
    assert image_dimensions(out) == (4, 4)
    arr = np.frombuffer(out.split(b"255\n", 1)[1], dtype=np.uint8).reshape(4, 4, 3)
    assert (arr[0, 0] == [255, 0, 0]).all() and (arr[0, 3] == [0, 255, 0]).all()
    assert (arr[3, 0] == [0, 0, 255]).all() and (arr[3, 3] == [255, 255, 255]).all()


def test_split_netpbm_stream_and_spark_sampling(spark):
    frames = [_p6(2, 1, [i, i, i, i, i, i]) for i in range(9)]
    stream = b"".join(frames)
    assert split_netpbm_stream(stream) == frames
    # through the Spark frame-sampling operator with the REAL extractor
    df = spark.createDataFrame([(1, {"mime": "video/x-netpbm", "uri": "u", "data": stream})],
                               "doc_id long, media struct<mime:string,uri:string,data:binary>")
    rows = sample_frames(df, every=4).orderBy("frame_idx").collect()
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    assert [bytes(r.frame_bytes) for r in rows] == [frames[0], frames[4], frames[8]]


def test_truncated_netpbm_stream_raises():
    with pytest.raises(ValueError):
        split_netpbm_stream(_p6(4, 4, bytes(48))[:-5])


def test_16bit_netpbm_split_and_resize():
    """maxval > 255 means 2 big-endian bytes per sample (legal
    netpbm); framing and resize must honor it, not desync."""
    px = np.arange(2 * 2, dtype=">u2") * 300  # values past 255
    frame = b"P5\n2 2\n65535\n" + px.tobytes()
    assert split_netpbm_stream(frame * 3) == [frame] * 3
    out = resize_netpbm(frame, 1, 1)
    assert out.startswith(b"P5\n1 1\n65535\n")  # maxval preserved
    assert np.frombuffer(out[len(b"P5\n1 1\n65535\n"):], dtype=">u2")[0] == 0


def test_jpeg_with_fill_bytes_and_rst_markers():
    """0xFF fill bytes and standalone RSTn markers have no length
    field; the scanner must step over them, not mis-skip."""
    jpeg = (
        b"\xff\xd8\xff"
        + b"\xe0\x00\x04\x00\x00"  # APP0
        + b"\xff\xff"              # fill byte then next marker's 0xFF
        + b"\xff\xd0"              # standalone RST0
        + b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", 10, 20) + b"\x03"
    )
    assert image_dimensions(jpeg) == (20, 10)


def test_bmp_core_header_variant():
    """BITMAPCOREHEADER (OS/2) stores 16-bit dims; the 40-byte-header
    parse would return garbage, so the variant must be dispatched on
    the header-size field."""
    core = b"BM" + b"\x00" * 12 + struct.pack("<I", 12) + struct.pack("<HH", 640, 480)
    assert image_dimensions(core) == (640, 480)
    with pytest.raises(NotImplementedError):
        image_dimensions(b"BM" + b"\x00" * 12 + struct.pack("<I", 7) + b"\x00" * 8)


def test_dhash_brightness_invariant_and_discriminative():
    """The perceptual hash must survive a brightness shift (bytes
    differ, picture identical) and still separate distinct images."""
    import numpy as np

    from feray_spark.multimodal import dhash_image

    def p5(seed, brightness):
        rng = np.random.default_rng(seed)
        px = (rng.integers(0, 180, (16, 16)) + brightness).astype(np.uint8)
        return b"P5\n16 16\n255\n" + px.tobytes()

    assert p5(1, 0) != p5(1, 40)  # raw bytes differ...
    assert dhash_image(p5(1, 0)) == dhash_image(p5(1, 40))  # ...hash equal
    assert dhash_image(p5(1, 0)) != dhash_image(p5(2, 0))
    # signed-long contract for Spark columns
    h = dhash_image(p5(3, 0))
    assert -(1 << 63) <= h < (1 << 63)


def test_pointer_only_media_rows_do_not_crash(spark):
    """MEDIA_STRUCT allows data=NULL (object-store-pointer payloads);
    every extractor must treat those as not-decodable-here — null
    features / no frames / unresized passthrough — never bytes(None)."""
    from pyspark.sql import types as T

    from feray_spark.multimodal import (
        MEDIA_STRUCT,
        extract_audio_features,
        extract_media_features,
        fake_chunk_frames,
        fake_decode,
        resize_media,
        sample_frames,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("media", MEDIA_STRUCT, False),
        ]
    )
    rows = [
        (1, ("image/png", None, b"P5 2 2 255 " + bytes(4))),
        (2, ("image/png", "s3://bucket/huge.png", None)),  # pointer-only
    ]
    df = spark.createDataFrame(rows, schema)

    feats = {r.doc_id: r for r in
             extract_media_features(df, decoder=fake_decode).collect()}
    assert feats[1].n_bytes is not None and feats[1].width is not None
    assert feats[2].n_bytes is None and feats[2].payload_sha256 is None
    assert feats[2].width is None and feats[2].height is None

    frames = sample_frames(df, frame_extractor=fake_chunk_frames).collect()
    assert {r.doc_id for r in frames} == {1}  # pointer row yields none

    resized = {r.doc_id: r for r in
               resize_media(df, 1, 1, resizer=lambda b, w, h: b).collect()}
    assert resized[2].media.data is None  # passthrough, not a crash
    assert resized[1].media.data is not None

    audio = {r.doc_id: r for r in
             extract_audio_features(
                 df, decoder=lambda b: (8000, 0.5, 0.1)).collect()}
    assert audio[1].sample_rate == 8000
    assert audio[2].sample_rate is None and audio[2].rms is None


def test_extractors_tolerate_null_media_struct(spark):
    """A NULL media struct row (not just pointer-only data=None) must
    yield null features, not a TypeError in the pandas batch."""
    from feray_spark.multimodal import MEDIA_STRUCT, extract_media_features

    df = spark.createDataFrame(
        [(1, ("image/x-portable-graymap", "s://1", b"P5 2 2 255 \x00\x01\x02\x03")),
         (2, None)],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("media", MEDIA_STRUCT),
            ]
        ),
    )
    rows = {r.doc_id: r for r in extract_media_features(df).collect()}
    assert rows[1].width == 2 and rows[1].height == 2
    assert rows[2].mime is None and rows[2].n_bytes is None
    assert rows[2].width is None and rows[2].payload_sha256 is None


def test_dhash_wide_sizes_fit_longtype():
    """hash_size > 8 produces > 64 bits; the fold must keep the
    result in signed-64 range (a LongType column) deterministically."""
    from feray_spark.multimodal import dhash_image

    # deterministic 17x16-able grayscale netpbm payload
    w, h = 33, 32
    header = f"P5 {w} {h} 255 ".encode()
    pixels = bytes((x * 7 + y * 13) % 256 for y in range(h) for x in range(w))
    out = dhash_image(header + pixels, hash_size=16)
    assert -(1 << 63) <= out < (1 << 63)
    assert out == dhash_image(header + pixels, hash_size=16)  # stable


def test_string_ids_thread_through_every_extractor(spark):
    """Output schemas follow the INPUT id column's name and type —
    a hardcoded 'doc_id long' used to kill tasks at Arrow cast for
    string-keyed media tables."""
    from feray_spark.multimodal import (
        attach_media,
        extract_audio_features,
        extract_media_features,
        fake_chunk_frames,
        fake_decode,
        fake_decode_audio,
        fake_resize,
        resize_media,
        sample_frames,
        synth_wav,
    )
    import numpy as np

    wav = synth_wav(np.zeros(160, dtype="<i2"), 16000)
    df = attach_media(
        spark.createDataFrame(
            [("img_a", bytearray(wav)), ("img_b", bytearray(wav))],
            "img_id string, payload binary",
        ),
        "payload", "audio/wav", id_col="img_id",
    )
    feats = extract_media_features(
        df, id_col="img_id", decoder=fake_decode
    ).collect()
    assert {r.img_id for r in feats} == {"img_a", "img_b"}
    frames = sample_frames(
        df, id_col="img_id", frame_extractor=fake_chunk_frames
    ).collect()
    assert frames and all(isinstance(r.img_id, str) for r in frames)
    resized = resize_media(
        df, 4, 4, id_col="img_id", resizer=fake_resize
    ).collect()
    assert {r.img_id for r in resized} == {"img_a", "img_b"}
    audio = extract_audio_features(df, id_col="img_id").collect()
    assert {r.img_id for r in audio} == {"img_a", "img_b"}
    assert all(r.sample_rate == 16000 for r in audio)


def test_empty_payloads_account_but_never_decode(spark):
    """b'' is real ingested data (n_bytes=0, real sha256) but has no
    header — extractors must not raise NotImplementedError and kill
    the task, and resize must pass it through with NULL recorded
    dims (stamping target dims on an unresized payload would lie)."""
    import hashlib

    from feray_spark.multimodal import (
        attach_media,
        extract_audio_features,
        extract_media_features,
        resize_media,
        sample_frames,
    )

    df = attach_media(
        spark.createDataFrame(
            [(1, bytearray(b""))], "doc_id long, payload binary"
        ),
        "payload", "image/x-portable-graymap",
    )
    r = extract_media_features(df).collect()[0]
    assert r.n_bytes == 0 and r.width is None and r.height is None
    assert r.payload_sha256 == hashlib.sha256(b"").hexdigest()
    assert sample_frames(df).count() == 0
    rz = resize_media(df, 4, 4).collect()[0]
    assert rz.media.data == bytearray(b"") or rz.media.data == b""
    assert rz.width is None and rz.height is None
    a = extract_audio_features(df).collect()[0]
    assert a.n_bytes == 0 and a.sample_rate is None


def test_truncated_netpbm_header_raises_clearly():
    """A stream truncated mid-header must raise the designed
    'truncated netpbm' ValueError, not int(b'')'s opaque literal
    error."""
    import pytest as _pytest

    from feray_spark.multimodal import image_dimensions, split_netpbm_stream

    with _pytest.raises(ValueError, match="truncated netpbm"):
        split_netpbm_stream(b"P5\n4 4\n255\n" + bytes(16) + b"P5\n4 ")
    with _pytest.raises(ValueError, match="truncated netpbm"):
        image_dimensions(b"P5\n12 ")
