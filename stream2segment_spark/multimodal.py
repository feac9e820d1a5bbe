"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference stores waveform payloads as LargeBinary blobs decoded lazily at
processing time (segments.data miniSEED bytes, io/db/models.py:353-444;
decode process/db/models.py:608-632). This module generalizes that pattern to
the media types a large-scale training-data pipeline carries:

- content stays an opaque ``binary`` column (columnar storage keeps it
  page-compressed; column pruning means metadata-only queries never read it);
- a ``probe`` pandas UDF parses container HEADERS with pure Python/numpy —
  PNG / JPEG / WAV / GIF are public byte layouts, no codec library needed;
- pixel/sample DECODE needs codec libs that are not in this runtime, so it
  is stubbed: ``decode_pixels_udf(strict=True)`` raises NotImplementedError
  per row; ``strict=False`` yields a deterministic fake (seeded from the
  content bytes) so the Spark-side plumbing — schema, batch shape,
  partitioning, downstream ops — is fully testable;
- video frame sampling over a raw fixed-size-frame container is real
  ``mapInPandas`` plumbing (one input row -> n frame rows, UDTF shape).

Scale notes: probe/decode are Arrow-batched; binary columns stream through
``mapInPandas`` in bounded batches (spark.sql.execution.arrow.maxRecordsPerBatch)
so a 100 TB media table never materializes a partition in one list.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_DDL = (
    "media_type string, width int, height int, n_channels int, "
    "sample_rate int, bit_depth int, n_bytes bigint, error string"
)

_EMPTY = {"media_type": None, "width": None, "height": None,
          "n_channels": None, "sample_rate": None, "bit_depth": None,
          "n_bytes": 0, "error": None}


def probe_media_bytes(b: bytes | None) -> dict:
    """Parse container headers of one blob. Pure byte-layout parsing of the
    public PNG/JPEG/WAV/GIF formats — this is REAL decode of the metadata
    plane, not a stub (pixels/samples are the stubbed part)."""
    out = dict(_EMPTY)
    if b is None:
        out["error"] = "null content"
        return out
    b = bytes(b)
    out["n_bytes"] = len(b)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26:
            # IHDR: width/height u32be at 16, bit depth u8 at 24, color u8 at 25
            w, h = struct.unpack(">II", b[16:24])
            color_channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
            out.update(media_type="image/png", width=w, height=h,
                       bit_depth=b[24], n_channels=color_channels.get(b[25]))
        elif b[:3] == b"\xff\xd8\xff":
            out.update(media_type="image/jpeg", **_jpeg_dims(b))
        elif b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            out.update(media_type="image/gif", width=w, height=h)
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 36:
            # canonical fmt chunk: channels u16le @22, rate u32le @24,
            # bits u16le @34
            ch, rate = struct.unpack("<HI", b[22:28])
            bits = struct.unpack("<H", b[34:36])[0] if len(b) >= 36 else None
            out.update(media_type="audio/wav", n_channels=ch,
                       sample_rate=rate, bit_depth=bits)
        else:
            out["error"] = "unknown container"
    except (struct.error, IndexError) as exc:  # truncated header
        out["error"] = f"truncated: {exc}"
    return out


def _jpeg_dims(b: bytes) -> dict:
    """Walk JPEG segments to the first SOF marker (public JFIF layout)."""
    i = 2
    while i + 9 < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return {"width": w, "height": h, "n_channels": b[i + 9],
                    "bit_depth": b[i + 4]}
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        i += 2 + seg_len
    return {"error": "no SOF marker"}


def probe_media_udf():
    """binary -> struct<MEDIA_META_DDL> (factory per funclib convention:
    pandas_udf objects need an active session for DDL parsing)."""
    @F.pandas_udf(f"struct<{MEDIA_META_DDL}>")
    def _udf(content: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([probe_media_bytes(v) for v in content])
    return _udf


def decode_pixels_udf(strict: bool = True, n_fake: int = 16):
    """Pixel decode: the codec step (libpng/libjpeg/PIL) is NOT in this
    runtime, so strict mode raises NotImplementedError (clearly-marked
    stub). ``strict=False`` emits a deterministic fake — float64 pixels
    seeded from the content bytes — keeping every downstream stage
    (normalization, embedding, dedup) testable with stable values."""
    @F.pandas_udf("array<double>")
    def _udf(content: pd.Series) -> pd.Series:
        if strict:
            raise NotImplementedError(
                "pixel decode requires a codec library not present in this "
                "runtime; use decode_pixels_udf(strict=False) for the "
                "deterministic fake")
        out = []
        for v in content:
            if v is None:
                out.append(None)
                continue
            raw = np.frombuffer(bytes(v), dtype=np.uint8)
            reps = int(np.ceil(n_fake / max(len(raw), 1)))
            out.append((np.tile(raw, reps)[:n_fake] / 255.0))
        return pd.Series(out)
    return _udf


def attach_media_meta(df: DataFrame, content_col: str = "content",
                      meta_col: str = "media") -> DataFrame:
    """Enrich a binary column with its parsed metadata struct. Written back
    once (write-once enrichment), metadata-only queries then prune the
    binary column entirely at the parquet scan."""
    return df.withColumn(meta_col, probe_media_udf()(F.col(content_col)))


def sample_raw_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    frame_bytes: int = 64,
    every_n: int = 2,
) -> DataFrame:
    """Frame sampling over a raw fixed-size-frame video container: one input
    row explodes into one row per sampled frame (UDTF shape, reference X1's
    DataFrame-return semantics). Real mapInPandas plumbing — the container
    math is exact; only the codec for real video formats is out of scope.

    Arrow batches bound memory: each emitted chunk holds the frames of one
    input batch only."""
    in_schema = df.select(id_col, content_col).schema
    out_ddl = (f"{id_col} {in_schema[0].dataType.simpleString()}, "
               f"frame_idx int, frame binary")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    continue
                blob = bytes(blob)
                for k in range(0, len(blob) // frame_bytes, every_n):
                    ids.append(rid)
                    idxs.append(k)
                    frames.append(blob[k * frame_bytes:(k + 1) * frame_bytes])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames})

    return df.select(id_col, content_col).mapInPandas(_gen, out_ddl)
