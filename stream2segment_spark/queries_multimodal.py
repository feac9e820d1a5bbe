"""Catalog entries for the multimodal binary-column layer.

Blobs are CONSTRUCTED with pure Spark expressions (concat of binary
literals + hex-built big/little-endian ints) from deterministic per-row
values, then parsed back by the probe/frame UDFs — so a DuckDB oracle can
recompute the expected metadata from the ids alone, giving the binary
plumbing a strong value-level gate rather than a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stream2segment_spark import multimodal as MM
from stream2segment_spark.queries_catalog import register
from stream2segment_spark.schema import load_table


def _be(col, n: int):
    """n-byte big-endian binary of an integral column."""
    return F.unhex(F.lpad(F.hex(col), 2 * n, "0"))


def _le(col, n: int):
    """n-byte little-endian binary of an integral column."""
    return F.concat(*[
        _be(F.shiftright(col, 8 * i).bitwiseAND(F.lit(255)), 1)
        for i in range(n)
    ])


def _png_blob(width, height):
    """Minimal parseable PNG: signature + IHDR (bit depth 8, truecolor)."""
    return F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),
        F.lit(b"\x00\x00\x00\x0dIHDR"),
        _be(width, 4), _be(height, 4),
        F.lit(b"\x08\x02"))


def _wav_blob(channels, sample_rate):
    """Canonical 36-byte RIFF/WAVE fmt header (PCM, 16-bit)."""
    byte_rate = sample_rate * channels * 2
    return F.concat(
        F.lit(b"RIFF"), F.lit(b"\x24\x00\x00\x00"), F.lit(b"WAVEfmt "),
        F.lit(b"\x10\x00\x00\x00"), F.lit(b"\x01\x00"),
        _le(channels, 2), _le(sample_rate, 4), _le(byte_rate, 4),
        _le(channels * 2, 2), F.lit(b"\x10\x00"))


@register(
    "multimodal_probe",
    """SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END
                AS media_type,
              CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 512 + 1 AS INT) END
                AS width,
              CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id * 7) % 512 + 1 AS INT) END
                AS height,
              CASE WHEN doc_id % 2 = 0 THEN 3
                   ELSE CAST(doc_id % 3 + 1 AS INT) END AS n_channels,
              CASE WHEN doc_id % 2 = 1
                   THEN CAST(8000 + (doc_id % 100) * 10 AS INT) END AS sample_rate,
              CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS bit_depth,
              CASE WHEN doc_id % 2 = 0 THEN 26 ELSE 36 END AS n_bytes
       FROM documents""",
)
def multimodal_probe(spark, sf_dir):
    """Media metadata probe: build PNG headers for even ids and WAV headers
    for odd ids Spark-side, parse them back with the Arrow-batched probe
    UDF (real public-format header parsing; see multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    is_png = F.col("doc_id") % 2 == 0
    width = (F.col("doc_id") % 512 + 1).cast("long")
    height = ((F.col("doc_id") * 7) % 512 + 1).cast("long")
    channels = (F.col("doc_id") % 3 + 1).cast("long")
    rate = (8000 + (F.col("doc_id") % 100) * 10).cast("long")
    blob = F.when(is_png, _png_blob(width, height)) \
            .otherwise(_wav_blob(channels, rate))
    probed = docs.withColumn("content", blob) \
        .withColumn("media", MM.probe_media_udf()(F.col("content")))
    return probed.select(
        "doc_id", "media.media_type", "media.width", "media.height",
        "media.n_channels", "media.sample_rate", "media.bit_depth",
        "media.n_bytes")


@register(
    "multimodal_frames",
    """SELECT doc_id, CAST(u.k AS INT) AS frame_idx, 64 AS frame_len
       FROM documents,
            LATERAL (SELECT unnest(range(0, ((doc_id % 300) + 32) * 2 // 64, 2)) AS k) u""",
)
def multimodal_frames(spark, sf_dir):
    """Video-style frame sampling (every 2nd 64-byte frame) over a raw
    container blob of known length — mapInPandas one-row-to-many plumbing
    (UDTF shape); the oracle recomputes the frame indices from the id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = (F.col("doc_id") % 300 + 32)
    blob = F.encode(F.repeat(F.lit("ab"), n), "utf-8")  # exactly 2n bytes
    with_blob = docs.withColumn("content", blob)
    frames = MM.sample_raw_frames(with_blob, "content", "doc_id",
                                  frame_bytes=64, every_n=2)
    return frames.select("doc_id", "frame_idx",
                         F.length("frame").alias("frame_len"))


@register(
    "multimodal_audio",
    """SELECT doc_id,
              CAST(8000 + (doc_id % 50) * 20 AS INT) AS sample_rate,
              1 AS n_channels, 4 AS n_samples,
              CAST(s0 + s1 + s2 + s3 AS BIGINT) AS ssum,
              round(sqrt((s0*s0 + s1*s1 + s2*s2 + s3*s3)
                         / 4294967296.0), 6) AS rms
       FROM (SELECT doc_id,
               (doc_id * 31 + 0 * 17) % 65536 - 32768 AS s0,
               (doc_id * 31 + 1 * 17) % 65536 - 32768 AS s1,
               (doc_id * 31 + 2 * 17) % 65536 - 32768 AS s2,
               (doc_id * 31 + 3 * 17) % 65536 - 32768 AS s3
             FROM documents)""",
)
def multimodal_audio(spark, sf_dir):
    """Audio SAMPLE decode through the real codec-free WAV path
    (multimodal.decode_audio_bytes via decode_samples_udf, strict): full
    RIFF containers with 4 deterministic 16-bit PCM samples per doc are
    built Spark-side, decoded back, and summarized by exactly-recoverable
    quantities — the integer sample sum (each decoded float is s/2^15,
    exactly representable, so sums are order-independent-exact) and the
    RMS (integer sum of squares / 2^32, then one IEEE sqrt). The oracle
    recomputes both from the ids alone, so the whole decode path is
    value-checked."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    rate = (8000 + (did % 50) * 20).cast("long")
    samples = [((did * 31 + j * 17) % 65536 - 32768).cast("long")
               for j in range(4)]
    data = F.concat(*[_le(s.bitwiseAND(F.lit(0xFFFF)), 2)
                      for s in samples])
    fmt = F.concat(
        F.lit(b"\x01\x00"), _le(F.lit(1).cast("long"), 2), _le(rate, 4),
        _le(rate * 2, 4), _le(F.lit(2).cast("long"), 2),
        F.lit(b"\x10\x00"))
    blob = F.concat(
        F.lit(b"RIFF"), _le(F.lit(4 + 24 + 8 + 8).cast("long"), 4),
        F.lit(b"WAVEfmt "), _le(F.lit(16).cast("long"), 4), fmt,
        F.lit(b"data"), _le(F.lit(8).cast("long"), 4), data)
    dec = (docs.withColumn("content", blob)
           .withColumn("a", MM.decode_samples_udf(strict=True)("content")))
    smp = F.col("a.samples")
    ssum = F.round(F.aggregate(smp, F.lit(0.0),
                               lambda acc, x: acc + x) * 32768.0, 0) \
        .cast("long")
    rms = F.round(F.sqrt(F.aggregate(smp, F.lit(0.0),
                                     lambda acc, x: acc + x * x) / 4.0), 6)
    return dec.select(
        "doc_id", "a.sample_rate", "a.n_channels", "a.n_samples",
        ssum.alias("ssum"), rms.alias("rms"))
