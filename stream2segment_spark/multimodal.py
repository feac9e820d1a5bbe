"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference stores waveform payloads as LargeBinary blobs decoded lazily at
processing time (segments.data miniSEED bytes, io/db/models.py:353-444;
decode process/db/models.py:608-632). This module generalizes that pattern to
the media types a large-scale training-data pipeline carries:

- content stays an opaque ``binary`` column (columnar storage keeps it
  page-compressed; column pruning means metadata-only queries never read it);
- a ``probe`` pandas UDF parses container HEADERS with pure Python/numpy —
  PNG / JPEG / WAV / GIF are public byte layouts, no codec library needed;
- pixel DECODE is real for the self-contained public formats — binary
  PPM/PGM, uncompressed 24/32-bit BMP, 8-bit non-interlaced PNG (stdlib
  zlib inflate + the 5 scanline filters in numpy) — via
  ``decode_image_bytes`` / ``decode_pixels_udf(strict=True)``; formats
  whose entropy codecs are not in this runtime (JPEG, GIF) raise
  NotImplementedError in strict mode, and ``strict=False`` substitutes a
  deterministic fake (seeded from the content bytes) so downstream
  plumbing stays testable on any input;
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
    public PNG/JPEG/WAV/GIF formats — real decode of the metadata plane;
    pixel/sample decode for the codec-free layouts lives below."""
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
        elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            # walk RIFF chunks to the fmt chunk — files may carry a
            # JUNK/LIST chunk before it, so fixed offsets would read
            # garbage silently (decode_audio_bytes already walks)
            fmt = next((b[off:off + ln]
                        for cid, off, ln in _iter_riff_chunks(b)
                        if cid == b"fmt "), None)
            if fmt is None or len(fmt) < 16:
                out.update(media_type="audio/wav",
                           error="missing/short fmt chunk")
            else:
                ch, rate = struct.unpack("<HI", fmt[2:8])
                bits = struct.unpack("<H", fmt[14:16])[0]
                out.update(media_type="audio/wav", n_channels=ch,
                           sample_rate=rate, bit_depth=bits)
        else:
            out["error"] = "unknown container"
    except (struct.error, IndexError) as exc:  # truncated header
        out["error"] = f"truncated: {exc}"
    return out


def _jpeg_dims(b: bytes) -> dict:
    """Walk JPEG segments to the first SOF marker (public JFIF layout).
    Spec-legal details honored: 0xFF FILL bytes may pad before any
    marker (skip runs of 0xFF to the marker byte), and the standalone
    markers (TEM 0x01, RST0-7 0xD0-0xD7, SOI/EOI 0xD8/0xD9) carry no
    length word — reading one as a length would jump the walk past the
    SOF of a perfectly valid padded file."""
    i = 2
    n = len(b)
    while i + 1 < n:
        if b[i] != 0xFF:
            i += 1
            continue
        while i + 1 < n and b[i + 1] == 0xFF:   # fill bytes
            i += 1
        if i + 1 >= n:
            break
        marker = b[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            i += 2                               # standalone marker
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 >= n:
                break
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return {"width": w, "height": h, "n_channels": b[i + 9],
                    "bit_depth": b[i + 4]}
        if i + 4 > n:
            break
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


def _decode_png(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """8-bit non-interlaced PNG (public spec: IHDR + zlib IDAT + the 5
    scanline filters), stdlib zlib + numpy only. Returns
    (width, height, channels, uint8 array (h, w*ch))."""
    import zlib

    w, h = struct.unpack(">II", b[16:24])
    bit_depth, color = b[24], b[25]
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8)")
    if b[28] != 0:
        raise NotImplementedError("interlaced PNG")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise NotImplementedError(f"PNG color type {color}")
    # walk chunks, concatenate IDAT payloads
    idat, i = [], 8
    while i + 8 <= len(b):
        (ln,), typ = struct.unpack(">I", b[i:i + 4]), b[i + 4:i + 8]
        if typ == b"IDAT":
            idat.append(b[i + 8:i + 8 + ln])
        if typ == b"IEND":
            break
        i += 12 + ln
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if raw.size != h * (1 + stride):
        raise ValueError("PNG data size mismatch")
    raw = raw.reshape(h, 1 + stride)
    filters, data = raw[:, 0], raw[:, 1:].astype(np.int32)
    bpp = channels
    out = np.zeros((h, stride), dtype=np.int32)
    prior = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line, f = data[y].copy(), int(filters[y])
        if f == 0:                                    # None
            rec = line
        elif f == 1:                                  # Sub
            rec = line
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif f == 2:                                  # Up
            rec = (line + prior) & 0xFF
        elif f == 3:                                  # Average
            rec = line
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif f == 4:                                  # Paeth
            rec = line
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                c = prior[x - bpp] if x >= bpp else 0
                p = a + prior[x] - c
                pa, pb, pc = abs(p - a), abs(p - prior[x]), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = prior[x]
                else:
                    pred = c
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = prior = rec
    return w, h, channels, out.astype(np.uint8)


def _decode_bmp(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Uncompressed (BI_RGB) 24/32-bit BMP with a BITMAPINFOHEADER —
    bottom-up BGR(A) rows padded to 4 bytes, returned top-down RGB(A)."""
    if struct.unpack("<I", b[14:18])[0] < 40:
        raise NotImplementedError("BMP core-header variant")
    w, h_signed = struct.unpack("<ii", b[18:26])
    bits, compression = struct.unpack("<HI", b[28:34])
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression})")
    if bits not in (24, 32):
        raise NotImplementedError(f"{bits}-bit BMP (only 24/32)")
    offset = struct.unpack("<I", b[10:14])[0]
    ch = bits // 8
    h, bottom_up = abs(h_signed), h_signed > 0
    row_bytes = (w * ch + 3) & ~3
    px = np.frombuffer(b, np.uint8, count=h * row_bytes, offset=offset)
    px = px.reshape(h, row_bytes)[:, :w * ch].reshape(h, w, ch)
    if bottom_up:
        px = px[::-1]
    px = px[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]  # BGR(A)->RGB(A)
    return w, h, ch, px.reshape(h, w * ch).copy()


def _decode_pnm(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Binary PPM (P6) / PGM (P5), maxval <= 255."""
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(b) and b[i:i + 1].isspace():
            i += 1
        if b[i:i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j:j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM")
    ch = 3 if b[:2] == b"P6" else 1
    px = np.frombuffer(b, np.uint8, count=w * h * ch, offset=i)
    return w, h, ch, px.reshape(h, w * ch).copy()


def decode_image_bytes(b: bytes) -> dict:
    """Decode one image blob to pixels with pure numpy + stdlib — the
    public byte layouts this runtime can fully handle: binary PPM/PGM,
    uncompressed 24/32-bit BMP, 8-bit non-interlaced PNG (zlib IDAT, all
    5 scanline filters). Formats needing an entropy codec (JPEG, GIF/LZW)
    raise NotImplementedError. Returns {width, height, n_channels,
    pixels} with float64 pixels in [0, 1], row-major, channel-interleaved."""
    import zlib

    b = bytes(b)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n":
            w, h, ch, px = _decode_png(b)
        elif b[:2] == b"BM":
            w, h, ch, px = _decode_bmp(b)
        elif b[:2] in (b"P5", b"P6"):
            w, h, ch, px = _decode_pnm(b)
        elif b[:3] == b"\xff\xd8\xff":
            raise NotImplementedError(
                "JPEG needs an entropy codec (not bundled)")
        elif b[:6] in (b"GIF87a", b"GIF89a"):
            raise NotImplementedError("GIF needs an LZW codec (not bundled)")
        else:
            raise ValueError("unknown image container")
    except (struct.error, IndexError, zlib.error) as exc:
        # truncated/corrupt container: surface as ValueError so callers
        # (and the non-strict UDF fallback) see one failure type instead
        # of a parser internal leaking through
        raise ValueError(f"corrupt image data: {exc}") from exc
    return {"width": w, "height": h, "n_channels": ch,
            "pixels": px.reshape(-1).astype(np.float64) / 255.0}


def _iter_riff_chunks(b: bytes):
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        (ln,) = struct.unpack("<I", b[i + 4:i + 8])
        yield cid, i + 8, ln
        i += 8 + ln + (ln & 1)      # RIFF chunks are word-aligned


def decode_audio_bytes(b: bytes) -> dict:
    """Decode one audio blob to samples with stdlib struct + numpy — the
    codec-free public layouts: RIFF/WAVE with integer PCM (8/16/24/32
    bit, format 1) or IEEE float32 (format 3), incl. the WAVE_FORMAT_
    EXTENSIBLE wrapper. Compressed formats (MP3/AAC/ADPCM...) raise
    NotImplementedError. Returns {sample_rate, n_channels, n_samples,
    samples} with float64 samples, channel-interleaved (the on-disk
    order), n_samples = frames per channel. Integer PCM is scaled to
    [-1, 1]; float32 samples pass through UNCLIPPED (float masters may
    legitimately overshoot +-1 — clipping would destroy data; consumers
    needing the bound should clip themselves)."""
    b = bytes(b)
    if not (b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
        raise ValueError("not a RIFF/WAVE container")
    try:
        fmt = data = None
        for cid, off, ln in _iter_riff_chunks(b):
            if cid == b"fmt ":
                fmt = b[off:off + ln]
            elif cid == b"data":
                data = b[off:off + ln]
        if fmt is None or data is None or len(fmt) < 16:
            raise ValueError("missing fmt /data chunk")
        audio_fmt, ch, rate = struct.unpack("<HHI", fmt[:8])
        bits = struct.unpack("<H", fmt[14:16])[0]
        if audio_fmt == 0xFFFE and len(fmt) >= 26:   # EXTENSIBLE
            audio_fmt = struct.unpack("<H", fmt[24:26])[0]
        if ch < 1:
            raise ValueError(f"bad channel count {ch}")
        if audio_fmt == 1 and bits == 8:
            x = (np.frombuffer(data, np.uint8).astype(np.float64)
                 - 128.0) / 128.0
        elif audio_fmt == 1 and bits == 16:
            n2 = len(data) - (len(data) % 2)
            x = np.frombuffer(data[:n2], "<i2").astype(np.float64) / 32768.0
        elif audio_fmt == 1 and bits == 24:
            raw = np.frombuffer(data, np.uint8)
            n = len(raw) // 3
            raw = raw[:n * 3].reshape(n, 3).astype(np.int32)
            vals = raw[:, 0] | (raw[:, 1] << 8) | (raw[:, 2] << 16)
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float64) / float(1 << 23)
        elif audio_fmt == 1 and bits == 32:
            n4 = len(data) - (len(data) % 4)
            x = (np.frombuffer(data[:n4], "<i4").astype(np.float64)
                 / 2147483648.0)
        elif audio_fmt == 3 and bits == 32:
            n4 = len(data) - (len(data) % 4)
            x = np.frombuffer(data[:n4], "<f4").astype(np.float64)
        else:
            raise NotImplementedError(
                f"WAV format {audio_fmt} ({bits}-bit) needs a codec "
                "(not bundled)")
        x = x[:len(x) - (len(x) % ch)]
        return {"sample_rate": int(rate), "n_channels": int(ch),
                "n_samples": len(x) // ch, "samples": x}
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt wav data: {exc}") from exc


SAMPLES_DDL = ("sample_rate int, n_channels int, n_samples int, "
               "samples array<double>")


def decode_samples_udf(strict: bool = True, n_fake: int = 16):
    """Audio sample decode as binary -> struct<SAMPLES_DDL> — the audio
    twin of :func:`decode_pixels_udf`. Strict mode REALLY decodes
    codec-free PCM/float WAV (see :func:`decode_audio_bytes`) and raises
    on compressed formats; ``strict=False`` falls back per-row to a
    deterministic fake (n_fake samples seeded from the content bytes)."""
    @F.pandas_udf(f"struct<{SAMPLES_DDL}>")
    def _udf(content: pd.Series) -> pd.DataFrame:
        out = []
        for v in content:
            if v is None:
                out.append({"sample_rate": None, "n_channels": None,
                            "n_samples": None, "samples": None})
                continue
            try:
                out.append(decode_audio_bytes(v))
            except (NotImplementedError, ValueError):
                if strict:
                    raise
                raw = np.frombuffer(bytes(v), dtype=np.uint8)
                if raw.size == 0:
                    raw = np.zeros(1, dtype=np.uint8)
                reps = int(np.ceil(n_fake / len(raw)))
                out.append({"sample_rate": 0, "n_channels": 1,
                            "n_samples": n_fake,
                            "samples": (np.tile(raw, reps)[:n_fake]
                                        - 128.0) / 128.0})
        return pd.DataFrame(out)
    return _udf


PIXELS_DDL = "width int, height int, n_channels int, pixels array<double>"


def decode_pixels_udf(strict: bool = True, n_fake: int = 16):
    """Pixel decode as binary -> struct<PIXELS_DDL>.

    Strict mode REALLY decodes the self-contained public formats
    (PPM/PGM, uncompressed BMP, 8-bit PNG — see
    :func:`decode_image_bytes`) and raises NotImplementedError on formats
    whose entropy codecs are not in this runtime (JPEG, GIF).
    ``strict=False`` falls back per-row to a deterministic fake — float64
    pixels seeded from the content bytes, width=n_fake, height=1 — so
    downstream stages (normalization, embedding, dedup) stay testable on
    any input."""
    @F.pandas_udf(f"struct<{PIXELS_DDL}>")
    def _udf(content: pd.Series) -> pd.DataFrame:
        out = []
        for v in content:
            if v is None:
                out.append({"width": None, "height": None,
                            "n_channels": None, "pixels": None})
                continue
            try:
                out.append(decode_image_bytes(v))
            except (NotImplementedError, ValueError):
                if strict:
                    raise
                raw = np.frombuffer(bytes(v), dtype=np.uint8)
                if raw.size == 0:   # empty blob: n_fake zeros, not a
                    raw = np.zeros(1, dtype=np.uint8)  # width/len mismatch
                reps = int(np.ceil(n_fake / len(raw)))
                out.append({"width": n_fake, "height": 1, "n_channels": 1,
                            "pixels": np.tile(raw, reps)[:n_fake] / 255.0})
        return pd.DataFrame(out)
    return _udf


def resize_image(px: np.ndarray, w: int, h: int, ch: int,
                 out_w: int, out_h: int,
                 method: str = "nearest") -> np.ndarray:
    """Resize one decoded image (flat channel-interleaved float array,
    the :func:`decode_image_bytes` layout) to (out_w, out_h).

    ``nearest`` maps output pixel (x, y) to source ((x*w)//out_w,
    (y*h)//out_h) — PURE INTEGER index math, so the result is exactly
    engine-replayable (the gate oracle recomputes it in SQL).
    ``bilinear`` is the standard half-pixel-center interpolation
    (align_corners=False), float math. Returns the flat interleaved
    array of the resized image."""
    img = np.asarray(px, dtype=np.float64).reshape(h, w, ch)
    if method == "nearest":
        sx = (np.arange(out_w) * w) // out_w
        sy = (np.arange(out_h) * h) // out_h
        out = img[sy[:, None], sx[None, :], :]
    elif method == "bilinear":
        fx = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
        fy = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
        x0 = np.floor(fx).astype(int)
        y0 = np.floor(fy).astype(int)
        x1 = np.minimum(x0 + 1, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        wx = (fx - x0)[None, :, None]
        wy = (fy - y0)[:, None, None]
        out = (img[y0[:, None], x0[None, :], :] * (1 - wx) * (1 - wy)
               + img[y0[:, None], x1[None, :], :] * wx * (1 - wy)
               + img[y1[:, None], x0[None, :], :] * (1 - wx) * wy
               + img[y1[:, None], x1[None, :], :] * wx * wy)
    else:
        raise ValueError(f"unknown resize method {method!r}")
    return out.reshape(-1)


def resize_pixels_udf(out_w: int, out_h: int, method: str = "nearest"):
    """Decoded pixels -> resized pixels as a vectorized pandas UDF:
    (pixels, width, height, n_channels) columns in, struct<PIXELS_DDL>
    out. Null/empty rows pass through as nulls (per-row media errors
    never fail the job, like the decode UDFs)."""
    @F.pandas_udf(f"struct<{PIXELS_DDL}>")
    def _udf(pixels: pd.Series, width: pd.Series, height: pd.Series,
             n_channels: pd.Series) -> pd.DataFrame:
        out = []
        for px, w, h, ch in zip(pixels, width, height, n_channels):
            # Arrow surfaces null ints as NaN in pandas: pd.isna, not is None
            if px is None or pd.isna(w) or pd.isna(h) or pd.isna(ch) \
                    or not len(px):
                out.append({"width": None, "height": None,
                            "n_channels": None, "pixels": None})
                continue
            out.append({"width": out_w, "height": out_h,
                        "n_channels": int(ch),
                        "pixels": resize_image(px, int(w), int(h),
                                               int(ch), out_w, out_h,
                                               method)})
        return pd.DataFrame(out)
    return _udf


IMAGE_FEATURES_DDL = ("px_sum bigint, px_min int, px_max int, "
                      "edge_sum bigint, mean_255 double")


def image_features_udf():
    """Per-image features from decoded pixels: integer 0-255 grid stats
    (sum / min / max over all channels), total-variation edge energy of
    channel 0 (sum of |horizontal| + |vertical| neighbor differences),
    and the mean on the 0-255 scale. All but the mean are exact
    INTEGERS (pixels decode as v/255, recovered by round(p*255)), so a
    SQL oracle replays them value-for-value."""
    @F.pandas_udf(f"struct<{IMAGE_FEATURES_DDL}>")
    def _udf(pixels: pd.Series, width: pd.Series, height: pd.Series,
             n_channels: pd.Series) -> pd.DataFrame:
        out = []
        for px, w, h, ch in zip(pixels, width, height, n_channels):
            if px is None or pd.isna(w) or pd.isna(h) or pd.isna(ch) \
                    or not len(px):
                out.append({"px_sum": None, "px_min": None,
                            "px_max": None, "edge_sum": None,
                            "mean_255": None})
                continue
            q = np.rint(np.asarray(px, dtype=np.float64) * 255.0) \
                  .astype(np.int64)
            w, h, ch = int(w), int(h), int(ch)
            c0 = q.reshape(h, w, ch)[:, :, 0]
            edge = (np.abs(np.diff(c0, axis=1)).sum()
                    + np.abs(np.diff(c0, axis=0)).sum())
            out.append({"px_sum": int(q.sum()), "px_min": int(q.min()),
                        "px_max": int(q.max()), "edge_sum": int(edge),
                        "mean_255": float(q.mean())})
        return pd.DataFrame(out)
    return _udf


AUDIO_FEATURES_DDL = ("n_frames int, zero_crossings int, peak int, "
                      "ssq bigint, rms double")


def audio_features_udf():
    """Per-clip features from decoded samples (channel 0 of the
    interleaved layout): zero-crossing count (strict sign change),
    integer peak and sum-of-squares on the raw 16-bit grid (samples
    decode as v/32768, recovered exactly by round(s*32768)), and RMS on
    the [-1, 1] scale. Integer outputs are SQL-replayable."""
    @F.pandas_udf(f"struct<{AUDIO_FEATURES_DDL}>")
    def _udf(samples: pd.Series, n_channels: pd.Series) -> pd.DataFrame:
        out = []
        for s, ch in zip(samples, n_channels):
            if s is None or not len(s):
                out.append({"n_frames": None, "zero_crossings": None,
                            "peak": None, "ssq": None, "rms": None})
                continue
            ch = 1 if pd.isna(ch) or not ch else int(ch)
            q = np.rint(np.asarray(s, dtype=np.float64)[0::ch]
                        * 32768.0).astype(np.int64)
            zc = int((q[:-1] * q[1:] < 0).sum())
            ssq = int((q * q).sum())
            out.append({"n_frames": len(q), "zero_crossings": zc,
                        "peak": int(np.abs(q).max()), "ssq": ssq,
                        "rms": float(np.sqrt(ssq / len(q)) / 32768.0)})
        return pd.DataFrame(out)
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


# ---------------------------------------------------------------------------
# Video containers: ISO-BMFF (MP4) and RIFF/AVI metadata planes
# ---------------------------------------------------------------------------
# Public byte layouts (ISO/IEC 14496-12 box structure; the classic
# Microsoft RIFF AVIMAINHEADER): like the image/audio probes above, the
# METADATA plane parses for real — duration/timescale/track count from
# moov/mvhd, frame geometry from avih — while the entropy-coded sample
# data stays behind the documented codec boundary.

def build_mp4_bytes(duration: int, timescale: int = 600,
                    n_tracks: int = 1,
                    major_brand: bytes = b"isom") -> bytes:
    """Minimal spec-shaped ISO-BMFF file: ftyp + moov(mvhd v0 + empty
    trak boxes). Deterministic serializer for tests/gates (the WET/ISF
    roundtrip pattern applied to video)."""
    # 8B header + major_brand + minor_version + one compat brand = 20B
    ftyp = struct.pack(">I4s4sI4s", 20, b"ftyp", major_brand, 0, b"mp42")
    # box = 8B header + 4B ver/flags + creation/modification/timescale/
    # duration u32 each = 28 bytes
    mvhd = struct.pack(">I4sB3x4I", 28, b"mvhd", 0, 0, 0,
                       timescale, duration)
    traks = b"".join(struct.pack(">I4s", 8, b"trak")
                     for _ in range(n_tracks))
    moov = struct.pack(">I4s", 8 + len(mvhd) + len(traks), b"moov") \
        + mvhd + traks
    return ftyp + moov


def build_avi_bytes(width: int, height: int, n_frames: int,
                    usec_per_frame: int = 33333) -> bytes:
    """Minimal spec-shaped RIFF/AVI file: LIST hdrl with one
    AVIMAINHEADER (avih) chunk."""
    avih = struct.pack("<4sI14I", b"avih", 56, usec_per_frame, 0, 0, 0,
                       n_frames, 0, 1, 0, width, height, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl


_VIDEO_EMPTY = dict(media_type=None, duration_sec=None, timescale=None,
                    n_tracks=None, width=None, height=None,
                    n_frames=None, n_bytes=None, error=None)

VIDEO_PROBE_DDL = ("media_type string, duration_sec double, "
                   "timescale int, n_tracks int, width int, height int, "
                   "n_frames int, n_bytes int, error string")


def probe_video_bytes(b: bytes | None) -> dict:
    """Parse one video container's metadata plane: ISO-BMFF box walk to
    moov/mvhd (duration, timescale, trak count; mvhd v0 and v1) or
    RIFF/AVI avih (geometry, frame count, fps-derived duration)."""
    out = dict(_VIDEO_EMPTY)
    if b is None:
        out["error"] = "null content"
        return out
    b = bytes(b)
    out["n_bytes"] = len(b)
    try:
        if len(b) >= 12 and b[4:8] == b"ftyp":
            out["media_type"] = "video/mp4"
            i = 0
            while i + 8 <= len(b):
                size, typ = struct.unpack(">I4s", b[i:i + 8])
                hdr = 8
                if size == 0:
                    # spec: box extends to end of file (streaming
                    # writers emit this for the final mdat)
                    size = len(b) - i
                elif size == 1:
                    # spec: 64-bit largesize follows the type; the
                    # payload then starts 16 bytes in
                    if i + 16 > len(b):
                        out["error"] = "truncated box"
                        return out
                    size, = struct.unpack(">Q", b[i + 8:i + 16])
                    hdr = 16
                if size < hdr:
                    out["error"] = "truncated box"
                    return out
                if typ == b"moov":
                    j, end = i + hdr, i + size
                    n_tracks = 0
                    while j + 8 <= min(end, len(b)):
                        csize, ctyp = struct.unpack(">I4s", b[j:j + 8])
                        if csize < 8:
                            out["error"] = "truncated box"
                            return out
                        if ctyp == b"mvhd":
                            ver = b[j + 8]
                            if ver == 0:
                                ts, dur = struct.unpack(
                                    ">II", b[j + 20:j + 28])
                            else:   # v1: 64-bit times
                                ts, = struct.unpack(
                                    ">I", b[j + 28:j + 32])
                                dur, = struct.unpack(
                                    ">Q", b[j + 32:j + 40])
                            out["timescale"] = ts
                            out["duration_sec"] = dur / ts if ts else None
                        elif ctyp == b"trak":
                            n_tracks += 1
                        j += csize
                    out["n_tracks"] = n_tracks
                i += size
            if out["timescale"] is None:
                out["error"] = "no mvhd box"
        elif b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            out["media_type"] = "video/x-msvideo"
            k = b.find(b"avih")
            if k < 0 or k + 64 > len(b):
                out["error"] = "no avih chunk"
                return out
            (usec, _mb, _pad, _fl, frames, _init, _streams, _buf,
             w, h) = struct.unpack("<10I", b[k + 8:k + 48])
            out.update(width=w, height=h, n_frames=frames,
                       duration_sec=(frames * usec) / 1_000_000.0)
        else:
            out["error"] = "not a video container"
    except (struct.error, IndexError) as exc:
        out["error"] = f"truncated: {exc}"
    return out


def probe_video_udf():
    """Arrow-batched probe over a binary column -> VIDEO_PROBE_DDL."""
    @F.pandas_udf(f"struct<{VIDEO_PROBE_DDL}>")
    def _udf(content: pd.Series) -> pd.DataFrame:
        return pd.DataFrame([probe_video_bytes(v) for v in content])
    return _udf
