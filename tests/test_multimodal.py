"""Multimodal plumbing: schema, determinism, and batch shape of the
mapInPandas decode / resize / frame-sample stages (stubbed codecs, real
Arrow plumbing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dodo_spark.multimodal import (
    decode_media,
    frame_sample,
    media_from_documents,
    resize_media,
)


def test_decode_schema_and_type_rules(spark, sf_dir):
    media = media_from_documents(spark, sf_dir)
    decoded = decode_media(media).cache()
    rows = decoded.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r.byte_len >= 0
        assert len(r.feature) == 8
        if r.media_type == "image":
            assert r.width is not None and r.n_frames is None and r.sample_rate is None
        elif r.media_type == "audio":
            assert r.sample_rate is not None and r.width is None
        elif r.media_type == "video":
            assert r.n_frames is not None and r.width is not None
    decoded.unpersist()


def test_decode_deterministic(spark, sf_dir):
    media = media_from_documents(spark, sf_dir)
    a = sorted(map(tuple, decode_media(media).collect()))
    b = sorted(map(tuple, decode_media(media.repartition(5)).collect()))
    assert a == b


def test_frame_sample_counts(spark, sf_dir):
    decoded = decode_media(media_from_documents(spark, sf_dir))
    frames = frame_sample(decoded, every_n=10)
    per_media = (
        frames.groupBy("media_id").agg(F.count("*").alias("n")).join(
            decoded.select("media_id", "n_frames"), "media_id"
        )
    )
    for r in per_media.collect():
        expected = (r.n_frames + 9) // 10  # ceil(n_frames / every_n)
        assert r.n == expected, (r.media_id, r.n_frames, r.n)


def test_resize_bounds_and_payload_passthrough(spark, sf_dir):
    media = media_from_documents(spark, sf_dir)
    out = resize_media(media, max_side=128).collect()
    assert out  # image+video rows exist
    for r in out:
        assert 1 <= r.width <= 128 and 1 <= r.height <= 128
        assert r.content is not None  # payload stays in the batch


def test_header_parser_reads_independently_written_wav():
    """parse_media_header must accept a WAV produced by an INDEPENDENT
    writer (the stdlib `wave` module) — proving the kernel is a real
    format parser, not a round-trip of our own synthesizer."""
    import io
    import wave

    from dodo_spark.multimodal import parse_media_header

    for rate in (8000, 16000, 44100):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(b"\x00\x00" * 16)
        fmt, width, height, sr = parse_media_header(buf.getvalue())
        assert (fmt, width, height, sr) == ("wav", None, None, rate)


def test_header_parser_rejects_garbage():
    from dodo_spark.multimodal import parse_media_header

    assert parse_media_header(b"") == ("unknown", None, None, None)
    assert parse_media_header(b"\x89PNG\r\n\x1a\x00 truncated") == (
        "unknown", None, None, None,
    )


def test_parse_media_header_jpeg_and_gif():
    """JPEG SOF marker walk (including skip over APP0/COM segments and a
    progressive SOF2) and GIF logical-screen parsing on handcrafted
    byte-exact payloads."""
    import struct

    from dodo_spark.multimodal import parse_media_header

    def jpeg(width, height, sof=0xC0, pad_segments=1):
        out = b"\xff\xd8"  # SOI
        for _ in range(pad_segments):  # APP0-style segment to skip
            body = b"JFIF\x00" + b"\x00" * 9
            out += b"\xff\xe0" + struct.pack(">H", len(body) + 2) + body
        sof_body = b"\x08" + struct.pack(">HH", height, width) + b"\x03"
        out += bytes([0xFF, sof]) + struct.pack(">H", len(sof_body) + 2) + sof_body
        return out

    assert parse_media_header(jpeg(640, 480)) == ("jpeg", 640, 480, None)
    assert parse_media_header(jpeg(31, 7, sof=0xC2, pad_segments=3)) == (
        "jpeg", 31, 7, None,
    )  # progressive, multiple skipped segments
    assert parse_media_header(b"\xff\xd8\xff") == ("jpeg", None, None, None)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00"
    assert parse_media_header(gif) == ("gif", 320, 200, None)
    assert parse_media_header(b"GIF87a" + struct.pack("<HH", 1, 65535))[1:3] == (1, 65535)
