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
       FROM documents""", gate=False,
    # multimodal entry; the probe UDF plumbing stays exercised in-window
)
def multimodal_probe(spark, sf_dir):
    """Media metadata probe: build PNG headers for even ids and WAV headers
    for odd ids Spark-side, parse them back with the Arrow-batched probe
    UDF (real public-format header parsing; see multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents", parallel=False).select("doc_id")
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
            LATERAL (SELECT unnest(range(0, ((doc_id % 300) + 32) * 2 // 64, 2)) AS k) u""", gate=False,
)
def multimodal_frames(spark, sf_dir):
    """Video-style frame sampling (every 2nd 64-byte frame) over a raw
    container blob of known length — mapInPandas one-row-to-many plumbing
    (UDTF shape); the oracle recomputes the frame indices from the id."""
    docs = load_table(spark, sf_dir, "documents", parallel=False).select("doc_id")
    n = (F.col("doc_id") % 300 + 32)
    blob = F.encode(F.repeat(F.lit("ab"), n), "utf-8")  # exactly 2n bytes
    with_blob = docs.withColumn("content", blob)
    frames = MM.sample_raw_frames(with_blob, "content", "doc_id",
                                  frame_bytes=64, every_n=2)
    return frames.select("doc_id", "frame_idx",
                         F.length("frame").alias("frame_len"))


@register(
    "multimodal_audio",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
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
    gate=False,
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
    docs = load_table(spark, sf_dir, "documents", parallel=False).select("doc_id")
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


def _pgm_blob(did, n: int = 16):
    """Real binary PGM (P5, 4x4, maxval 255) with deterministic pixels
    v(j) = (doc_id*13 + j*7) % 256 — decodable by the strict pixel path
    and exactly replayable from the id alone."""
    return F.concat(
        F.lit(b"P5\n4 4\n255\n"),
        *[_be(((did * 13 + j * 7) % 256).cast("long"), 1)
          for j in range(n)])


_PGM_V = "(doc_id * 13 + {j} * 7) % 256"


@register(
    "multimodal_resize",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""SELECT doc_id, 2 AS width, 2 AS height,
              CAST({_PGM_V.format(j=0)} AS BIGINT) AS p0,
              CAST({_PGM_V.format(j=2)} AS BIGINT) AS p1,
              CAST({_PGM_V.format(j=8)} AS BIGINT) AS p2,
              CAST({_PGM_V.format(j=10)} AS BIGINT) AS p3
       FROM documents""",
    gate=False,
)
def multimodal_resize(spark, sf_dir):
    """Image RESIZE over really-decoded pixels: 4x4 PGM blobs built
    Spark-side, decoded (strict), nearest-neighbor resized to 2x2
    (multimodal.resize_pixels_udf — pure integer source indexing:
    out(x,y) = src((x*4)//2, (y*4)//2), i.e. flat sources 0/2/8/10), and
    the 4 resized pixels recovered exactly on the 0-255 grid. The oracle
    recomputes them from the id alone."""
    docs = load_table(spark, sf_dir, "documents", parallel=False).select("doc_id")
    dec = (docs.withColumn("content", _pgm_blob(F.col("doc_id")))
           .withColumn("img", MM.decode_pixels_udf(strict=True)("content"))
           .withColumn("r", MM.resize_pixels_udf(2, 2, "nearest")(
               F.col("img.pixels"), F.col("img.width"),
               F.col("img.height"), F.col("img.n_channels"))))
    px = F.col("r.pixels")
    p = [F.round(F.element_at(px, i + 1) * 255.0, 0).cast("long")
         for i in range(4)]
    return dec.select("doc_id", "r.width", "r.height",
                      p[0].alias("p0"), p[1].alias("p1"),
                      p[2].alias("p2"), p[3].alias("p3"))


_PGM_VALS = "SELECT doc_id, u.j AS j, (doc_id * 13 + u.j * 7) % 256 AS v" \
            " FROM documents, LATERAL (SELECT unnest(range(0, 16)) AS j) u"


@register(
    "multimodal_image_features",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    f"""WITH px AS ({_PGM_VALS}),
       tv AS (SELECT a.doc_id,
                sum(CASE WHEN a.j % 4 < 3 THEN abs(b.v - a.v) ELSE 0 END)
                  AS h_edge
              FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.j = a.j + 1
              GROUP BY a.doc_id),
       tv2 AS (SELECT a.doc_id, sum(abs(b.v - a.v)) AS v_edge
               FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.j = a.j + 4
               WHERE a.j < 12 GROUP BY a.doc_id)
       SELECT px.doc_id, CAST(sum(v) AS BIGINT) AS px_sum,
              CAST(min(v) AS INT) AS px_min, CAST(max(v) AS INT) AS px_max,
              CAST(any_value(h_edge) + any_value(v_edge) AS BIGINT)
                  AS edge_sum,
              round(avg(v), 6) AS mean_255
       FROM px JOIN tv USING (doc_id) JOIN tv2 USING (doc_id)
       GROUP BY px.doc_id""",
    gate=False,
)
def multimodal_image_features(spark, sf_dir):
    """Image FEATURE EXTRACTION over really-decoded pixels
    (multimodal.image_features_udf): integer 0-255 grid stats + the
    total-variation edge energy (sum of |horizontal| + |vertical|
    neighbor differences) of the same 4x4 PGM blobs — every output but
    the mean is an exact integer the oracle recomputes from the id."""
    docs = load_table(spark, sf_dir, "documents", parallel=False).select("doc_id")
    dec = (docs.withColumn("content", _pgm_blob(F.col("doc_id")))
           .withColumn("img", MM.decode_pixels_udf(strict=True)("content"))
           .withColumn("f", MM.image_features_udf()(
               F.col("img.pixels"), F.col("img.width"),
               F.col("img.height"), F.col("img.n_channels"))))
    return dec.select("doc_id", "f.px_sum", "f.px_min", "f.px_max",
                      "f.edge_sum",
                      F.round(F.col("f.mean_255"), 6).alias("mean_255"))


@register(
    "multimodal_audio_features",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    """WITH s AS (SELECT doc_id, u.k AS k,
               (doc_id * 31 + u.k * 17) % 65536 - 32768 AS v
             FROM documents, LATERAL (SELECT unnest(range(0, 4)) AS k) u),
       zc AS (SELECT a.doc_id,
                CAST(sum(CASE WHEN a.v * b.v < 0 THEN 1 ELSE 0 END) AS INT)
                    AS zero_crossings
              FROM s a JOIN s b ON b.doc_id = a.doc_id AND b.k = a.k + 1
              GROUP BY a.doc_id)
       SELECT s.doc_id, 4 AS n_frames,
              any_value(zc.zero_crossings) AS zero_crossings,
              CAST(max(abs(v)) AS INT) AS peak,
              CAST(sum(CAST(v AS BIGINT) * v) AS BIGINT) AS ssq,
              round(sqrt(sum(CAST(v AS BIGINT) * v) / 4.0) / 32768.0, 6)
                  AS rms
       FROM s JOIN zc USING (doc_id) GROUP BY s.doc_id""",
    gate=False,
)
def multimodal_audio_features(spark, sf_dir):
    """Audio FEATURE EXTRACTION over really-decoded samples
    (multimodal.audio_features_udf): zero-crossing count, integer peak
    and sum-of-squares on the raw 16-bit grid, RMS — from the same
    deterministic PCM WAV blobs as multimodal_audio; the oracle
    recomputes every value from the id alone."""
    docs = load_table(spark, sf_dir, "documents", parallel=False).select("doc_id")
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
           .withColumn("a", MM.decode_samples_udf(strict=True)("content"))
           .withColumn("f", MM.audio_features_udf()(
               F.col("a.samples"), F.col("a.n_channels"))))
    return dec.select("doc_id", "f.n_frames", "f.zero_crossings",
                      "f.peak", "f.ssq",
                      F.round(F.col("f.rms"), 6).alias("rms"))


def _mp4_blob(duration, tracks):
    """Minimal ISO-BMFF: ftyp + moov(mvhd v0 + `tracks` empty traks),
    JVM-built (big-endian box sizes via _be). tracks must be < 4."""
    moov_size = _be(F.lit(36) + tracks * 8, 4)
    mvhd_head = F.lit(b"\x00\x00\x00\x1cmvhd" + b"\x00" * 12)
    trak = b"\x00\x00\x00\x08trak"
    traks = F.concat(*[
        F.when(tracks > i, F.lit(trak)).otherwise(F.lit(b""))
        for i in range(3)])
    return F.concat(
        F.lit(b"\x00\x00\x00\x14ftypisom\x00\x00\x00\x00mp42"),
        moov_size, F.lit(b"moov"),
        mvhd_head, _be(F.lit(600), 4), _be(duration, 4),
        traks)


def _avi_blob(width, height, n_frames, usec: int = 40000):
    """Minimal RIFF/AVI: LIST hdrl with one AVIMAINHEADER chunk
    (little-endian fields via _le)."""
    zero4 = F.lit(b"\x00\x00\x00\x00")
    return F.concat(
        F.lit(b"RIFF"), _le(F.lit(80), 4), F.lit(b"AVI "),
        F.lit(b"LIST"), _le(F.lit(68), 4), F.lit(b"hdrl"),
        F.lit(b"avih"), _le(F.lit(56), 4),
        _le(F.lit(usec), 4), zero4, zero4, zero4,
        _le(n_frames, 4), zero4, _le(F.lit(1), 4), zero4,
        _le(width, 4), _le(height, 4), zero4, zero4, zero4, zero4)


@register(
    "multimodal_video",
    # r7 rotation: driver-green r4-r6 (freshest possible row); slot
    # freed for an entry whose module changed after its last gate row
    # (tools/rotation_check.py selection)
    """SELECT doc_id,
              CASE WHEN doc_id % 2 = 0 THEN 'video/mp4'
                   ELSE 'video/x-msvideo' END AS media_type,
              CASE WHEN doc_id % 2 = 0
                   THEN CAST(doc_id % 36000 + 1 AS DOUBLE)
                        / CAST(600 AS DOUBLE)
                   ELSE CAST((doc_id % 900 + 1) * 40000 AS DOUBLE)
                        / CAST(1000000 AS DOUBLE) END AS duration_sec,
              CASE WHEN doc_id % 2 = 0 THEN CAST(600 AS INT) END
                  AS timescale,
              CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 4 AS INT) END
                  AS n_tracks,
              CASE WHEN doc_id % 2 = 1
                   THEN CAST(320 + (doc_id % 17) * 16 AS INT) END AS width,
              CASE WHEN doc_id % 2 = 1
                   THEN CAST(240 + (doc_id % 9) * 16 AS INT) END AS height,
              CASE WHEN doc_id % 2 = 1
                   THEN CAST(doc_id % 900 + 1 AS INT) END AS n_frames,
              CASE WHEN doc_id % 2 = 0
                   THEN CAST(56 + 8 * (doc_id % 4) AS INT)
                   ELSE 88 END AS n_bytes
       FROM documents""",
    gate=False,
)
def multimodal_video(spark, sf_dir):
    """Video-container metadata probing (multimodal.probe_video_bytes):
    spec-shaped ISO-BMFF (ftyp + moov/mvhd box walk -> duration,
    timescale, trak count) and RIFF/AVI (AVIMAINHEADER -> geometry,
    frame count, fps-derived duration) blobs are BUILT with pure JVM
    byte expressions from each doc_id, then parsed back by the real
    Arrow-batched probe UDF — the oracle recomputes every field from
    the ids (same construction-roundtrip contract as multimodal_probe;
    the entropy-coded sample data stays behind the documented codec
    boundary). Completes the metadata plane for the third modality:
    image (PNG/JPEG/GIF/BMP/PNM), audio (WAV), video (MP4/AVI)."""
    docs = load_table(spark, sf_dir, "documents", parallel=False).select("doc_id")
    k = F.col("doc_id")
    blob = F.when(k % 2 == 0,
                  _mp4_blob((k % 36000 + 1).cast("int"),
                            (k % 4).cast("int"))) \
            .otherwise(_avi_blob((320 + (k % 17) * 16).cast("int"),
                                 (240 + (k % 9) * 16).cast("int"),
                                 (k % 900 + 1).cast("int")))
    probed = docs.select("doc_id",
                         MM.probe_video_udf()(blob).alias("p"))
    return probed.select(
        "doc_id", "p.media_type", "p.duration_sec", "p.timescale",
        "p.n_tracks", "p.width", "p.height", "p.n_frames", "p.n_bytes")
