"""Compression sniffing (SURVEY K7; reference behavior:
download/modules/stations.py:154-193 compress,
process/db/models.py:220-252 auto-sniffing decompress).

Stored blobs (StationXML inventories) may be gzip/bz2/zlib/zip-compressed;
readers sniff magic bytes and decompress transparently. Pure stdlib, used
inside decode UDFs (the storage layer itself relies on parquet codecs —
this is for payloads that arrive pre-compressed)."""

from __future__ import annotations

import bz2
import gzip
import io
import zipfile
import zlib


def compress_payload(data: bytes, method: str = "gzip") -> bytes:
    if method == "gzip":
        return gzip.compress(data)
    if method == "bz2":
        return bz2.compress(data)
    if method == "zlib":
        return zlib.compress(data)
    if method == "zip":
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.writestr("payload", data)
        return buf.getvalue()
    raise ValueError(f"unknown compression {method!r}")


def sniff_format(data: bytes) -> str:
    """Name the compression container by magic bytes — the sniff half of
    :func:`sniff_decompress` (reference models.py:220-252), exposed for
    inspection/reporting: 'gzip' | 'bz2' | 'zip' | 'zlib' | 'plain'."""
    if not data:
        return "plain"
    if data[:2] == b"\x1f\x8b":
        return "gzip"
    if data[:3] == b"BZh":
        return "bz2"
    if data[:4] == b"PK\x03\x04":
        return "zip"
    if len(data) >= 2 and data[0] == 0x78 \
            and (data[0] * 256 + data[1]) % 31 == 0:
        return "zlib"
    return "plain"


def sniff_decompress(data: bytes) -> bytes:
    """Transparently decompress gzip/bz2/zip/zlib payloads by magic bytes;
    plain data passes through unchanged (reference models.py:220-252)."""
    if not data:
        return data
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    if data[:3] == b"BZh":
        return bz2.decompress(data)
    if data[:4] == b"PK\x03\x04":
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = zf.namelist()
            return zf.read(names[0])
    # zlib: 0x78 CMF + valid FCHECK
    if len(data) >= 2 and data[0] == 0x78 and (data[0] * 256 + data[1]) % 31 == 0:
        try:
            return zlib.decompress(data)
        except zlib.error:
            return data
    return data
