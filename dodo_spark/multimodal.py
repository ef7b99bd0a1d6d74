"""Multimodal column plumbing (north-star extension surface).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
over partition-local batches — the shape that scales to 100 TB (payloads
never leave executors, no shuffle, bounded batch memory).

The actual codecs (PIL/ffmpeg/...) are NOT in this container, so the
decode kernels are deterministic fakes behind the real plumbing: schema,
batch iteration, UDF signatures and partitioning are production-shaped;
swap ``_fake_decode_*`` for real decoders to productionize. Clearly marked
below.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("source", T.StringType()),
    ]
)

DECODED_SCHEMA = (
    "media_id BIGINT, media_type STRING, byte_len INT, width INT, height INT, "
    "n_frames INT, sample_rate INT, feature ARRAY<FLOAT>"
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media corpus: document text bytes as payloads."""
    docs = load_table(spark, sf_dir, "documents")
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
        "source",
    )


def _fake_decode_meta(payload: bytes) -> tuple[int, int, int, int]:
    """STUB — stands in for image/audio/video header decode. Deterministic
    function of the payload so tests are stable. Replace with PIL/ffprobe
    in a real deployment."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 120
    sample_rate = 8000 + (h[3] % 5) * 8000
    return width, height, n_frames, sample_rate


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """STUB — stands in for an embedding model; md5-derived unit-free floats."""
    h = hashlib.md5(payload + b"#feat").digest()
    return [round(b / 255.0, 6) for b in h[:dim]]


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: batches stay executor-local, output schema is
    fixed and narrow (payload dropped after decode — column pruning keeps
    the binary out of downstream shuffles)."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["content"]) if r["content"] is not None else b""
                w, h, nf, sr = _fake_decode_meta(payload)
                mt = r["media_type"]
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "media_type": mt,
                        "byte_len": len(payload),
                        "width": w if mt in ("image", "video") else None,
                        "height": h if mt in ("image", "video") else None,
                        "n_frames": nf if mt == "video" else None,
                        "sample_rate": sr if mt == "audio" else None,
                        "feature": _fake_feature(payload),
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index. The frame *extraction* is the stubbed part; the explode shape —
    rows multiply, payload referenced once — is the real design."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return (
        df.filter(F.col("media_type") == "video")
        .withColumn("frame_idx", F.explode(frames))
        .select("media_id", "frame_idx", "width", "height")
    )


# --------------------------------------------------------------------------
# REAL header decode (no stub): PNG IHDR + WAV fmt parsing from bytes
# --------------------------------------------------------------------------
def parse_media_header(payload: bytes) -> tuple[str, int | None, int | None, int | None]:
    """REAL format-header parser (not a stub): PNG IHDR width/height
    (big-endian, RFC 2083 §11.2.2), WAV fmt-chunk sample rate
    (little-endian, RIFF spec), JPEG SOF0/1/2 frame dimensions (marker
    scan per ITU T.81 §B.2.2), and GIF87a/89a logical-screen size
    (little-endian). Works on genuine files; only the pixel/sample
    codecs remain out of scope in this container."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h, None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE" and len(payload) >= 28:
        (sr,) = struct.unpack("<I", payload[24:28])
        return "wav", None, None, sr
    if payload[:2] == b"\xff\xd8":  # JPEG SOI: walk marker segments
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker in (0xC0, 0xC1, 0xC2):  # SOF: [len][prec][H][W]
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpeg", w, h, None
            i += 2 + seg_len
        return "jpeg", None, None, None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h, None
    return "unknown", None, None, None


def decode_headers(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas over binary payloads -> (format, width, height,
    sample_rate). Same executor-local Arrow-batch shape as decode_media,
    but the kernel is the real parser above."""

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r[content_col]) if r[content_col] is not None else b""
                fmt, w, h, sr = parse_media_header(payload)
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "format": fmt,
                        "width": w,
                        "height": h,
                        "sample_rate": sr,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(
        decode, schema="media_id BIGINT, format STRING, width INT, height INT, sample_rate INT"
    )


def _le32_hex(col):
    """Little-endian byte swap of an 8-hex-digit big-endian string."""
    return F.concat(
        F.substring(col, 7, 2), F.substring(col, 5, 2),
        F.substring(col, 3, 2), F.substring(col, 1, 2),
    )


def synth_media_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-formed PNG (even doc_id) / WAV (odd doc_id) binaries built
    expression-side with unhex — REAL format bytes a stock decoder accepts
    (CRCs zeroed; header parsing does not check them)."""
    docs = load_table(spark, sf_dir, "documents")
    k = F.col("doc_id")
    w = (16 + k % 240).cast("bigint")
    h = (16 + (k * 7) % 240).cast("bigint")
    sr = (8000 + (k % 5) * 4000).cast("bigint")
    hex32 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    png = F.unhex(
        F.concat(
            F.lit("89504E470D0A1A0A"),              # PNG signature
            F.lit("0000000D49484452"),              # IHDR length + type
            hex32(w), hex32(h),                     # width, height (BE)
            F.lit("0806000000"),                    # depth/color/etc
            F.lit("00000000"),                      # CRC (unchecked)
        )
    )
    wav = F.unhex(
        F.concat(
            F.lit("52494646"), F.lit("24000000"),   # 'RIFF' + size (LE)
            F.lit("57415645"), F.lit("666D7420"),   # 'WAVE' + 'fmt '
            F.lit("10000000"), F.lit("0100"), F.lit("0100"),  # fmt len, PCM, mono
            _le32_hex(hex32(sr)),                   # sample rate (LE)
        )
    )
    return docs.select(
        k.alias("media_id"),
        F.when(k % 2 == 0, png).otherwise(wav).alias("content"),
    )


@register(
    "multimodal_headers",
    oracle="""
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
           CASE WHEN doc_id % 2 = 0 THEN CAST(16 + doc_id % 240 AS INTEGER) END AS width,
           CASE WHEN doc_id % 2 = 0 THEN CAST(16 + (doc_id * 7) % 240 AS INTEGER) END AS height,
           CASE WHEN doc_id % 2 = 1 THEN CAST(8000 + (doc_id % 5) * 4000 AS INTEGER) END
             AS sample_rate
    FROM documents
    """,
    doc="REAL multimodal header decode (no stub in the kernel): well-formed "
    "PNG/WAV binaries are synthesized expression-side (unhex of genuine "
    "format bytes), then parse_media_header struct-unpacks PNG IHDR "
    "width/height (big-endian) and the WAV fmt sample rate (little-endian) "
    "inside Arrow-batched mapInPandas — the same parser accepts stock "
    "files. The oracle re-derives every field from the synthesis formulas, "
    "so a byte-order or offset bug in the parser hash-mismatches.",
)
def multimodal_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_headers(synth_media_files(spark, sf_dir))


@register(
    "multimodal_pipeline",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INTEGER)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS media_type,
             strlen(text) AS byte_len,
             md5(text) AS h
      FROM documents
    ), d AS (
      SELECT media_type, byte_len,
             64 + ((strpos('0123456789abcdef', substring(substring(h, 1, 2), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(substring(h, 1, 2), 2, 1)) - 1) * 1) % 192 AS width,
             8000 + (((strpos('0123456789abcdef', substring(substring(h, 7, 2), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substring(substring(h, 7, 2), 2, 1)) - 1) * 1) % 5) * 8000 AS sample_rate
      FROM m
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS items,
           CAST(SUM(byte_len) AS BIGINT) AS bytes_total,
           AVG(CASE WHEN media_type IN ('image','video') THEN width END)
             AS avg_width,
           CAST(COUNT(DISTINCT CASE WHEN media_type = 'audio' THEN sample_rate END)
                AS BIGINT) AS sample_rates
    FROM d GROUP BY media_type
    """,
    doc="multimodal: binary payload -> mapInPandas decode (stubbed codecs, "
    "real Arrow plumbing) -> frame sampling -> per-type aggregates. "
    "The stub decode is md5-derived, so the oracle re-derives every "
    "metadata field from md5(text) in SQL and checks the aggregates "
    "exactly.",
)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(spark, sf_dir)
    decoded = decode_media(media)
    return decoded.groupBy("media_type").agg(
        F.count("*").alias("items"),
        F.sum("byte_len").alias("bytes_total"),
        F.avg("width").alias("avg_width"),
        F.countDistinct("sample_rate").alias("sample_rates"),
    )


RESIZED_SCHEMA = "media_id BIGINT, width INT, height INT, content BINARY"


def resize_media(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: aspect-preserving downscale of image/video frames.

    The pixel resample is the stubbed part (payload passes through un-
    changed — swap the inner function for PIL's ``Image.resize`` to
    productionize); the real design is: metadata math is exact, payloads
    stay inside the Arrow batch, output schema stays binary-plus-dims so
    the next stage (feature extraction) composes.
    """

    def resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["content"]) if r["content"] is not None else b""
                w, h, _nf, _sr = _fake_decode_meta(payload)
                scale = min(1.0, max_side / max(w, h, 1))
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "width": max(1, int(w * scale)),
                        "height": max(1, int(h * scale)),
                        # STUB: payload unchanged; a real kernel re-encodes
                        "content": payload,
                    }
                )
            yield pd.DataFrame(rows)

    src = df.filter(F.col("media_type").isin("image", "video"))
    return src.mapInPandas(resize, schema=RESIZED_SCHEMA)


def _sql_hex_byte(h: str, byte_idx: int) -> str:
    """DuckDB: integer value of digest byte `byte_idx` (hex chars 2i+1, 2i+2)."""
    i = 2 * byte_idx + 1
    return (
        f"((strpos('0123456789abcdef', substring({h}, {i}, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1))"
    )


@register(
    "multimodal_frames",
    oracle=f"""
    WITH m AS (
      SELECT doc_id AS media_id, md5(text) AS h
      FROM documents WHERE CAST(doc_id % 3 AS INTEGER) = 2
    ), f AS (
      SELECT media_id, 1 + ({_sql_hex_byte('h', 2)} % 120) AS n_frames FROM m
    )
    SELECT media_id,
           CAST((n_frames - 1) // 10 + 1 AS BIGINT) AS n_sampled,
           CAST(((n_frames - 1) // 10) * 10 AS BIGINT) AS max_frame_idx
    FROM f
    """,
    doc="multimodal frame sampling: video payloads -> mapInPandas header "
    "decode (stub) -> every-10th-frame explode -> per-video sampled-frame "
    "counts. The explode shape (rows multiply AFTER the binary is dropped) "
    "is the real design; the oracle re-derives n_frames from the md5 stub "
    "and checks the sampling arithmetic exactly.",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_from_documents(spark, sf_dir)
    frames = frame_sample(decode_media(media), every_n=10)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_sampled"),
        F.max("frame_idx").cast("bigint").alias("max_frame_idx"),
    )


@register(
    "multimodal_dedup",
    oracle="""
    WITH corpus AS (
      SELECT text FROM documents
      UNION ALL
      SELECT text FROM documents WHERE doc_id % 5 = 0
    ), per AS (
      SELECT md5(text) AS h,
             CAST(COUNT(*) AS BIGINT) AS copies,
             CAST(MIN(octet_length(encode(text))) AS BIGINT) AS blen
      FROM corpus GROUP BY 1
    )
    SELECT copies,
           CAST(COUNT(*) AS BIGINT) AS n_digests,
           CAST(SUM(copies) AS BIGINT) AS n_payloads,
           CAST(SUM(blen * (copies - 1)) AS BIGINT) AS bytes_dedup_saved
    FROM per GROUP BY copies ORDER BY copies
    """,
    doc="Exact dedup over BINARY media payloads — the first stage of any "
    "multimodal training-data pipeline (identical files arrive from many "
    "crawls; here every fifth payload is re-ingested once to model that): "
    "payloads group GLOBALLY on their md5 digest computed scan-side over "
    "the bytes — only the 16-byte digest plus counters ever shuffle, "
    "never the payload, the property that makes this the 100 TB shape — "
    "then roll up to the duplicate-multiplicity histogram (copies -> "
    "digest count, payload mass, bytes reclaimed). dedup_exact's idiom "
    "lifted onto binary columns.",
)
def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_from_documents(spark, sf_dir).select("media_id", "content")
    reingested = m.filter(F.col("media_id") % 5 == 0).select(
        (F.col("media_id") + 10_000_000).alias("media_id"), "content"
    )
    corpus = m.unionByName(reingested)
    per = corpus.groupBy(F.md5("content").alias("h")).agg(
        F.count("*").alias("copies"),
        F.min(F.octet_length("content")).cast("bigint").alias("blen"),
    )
    return (
        per.groupBy("copies")
        .agg(
            F.count("*").alias("n_digests"),
            F.sum("copies").cast("bigint").alias("n_payloads"),
            F.sum(F.col("blen") * (F.col("copies") - 1))
            .cast("bigint")
            .alias("bytes_dedup_saved"),
        )
        .orderBy("copies")
    )
