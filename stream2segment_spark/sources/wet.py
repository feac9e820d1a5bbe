"""Common Crawl WARC/WET source: parse WET (extracted-text) archives
into a documents DataFrame with pure JVM expressions — the standard
entry format of web-scale LLM corpus pipelines.

A WET file is a sequence of WARC records::

    WARC/1.0\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Target-URI: http://...\\r\\n
    WARC-Date: 2024-01-01T00:00:00Z\\r\\n
    WARC-Record-ID: <urn:uuid:...>\\r\\n
    Content-Type: text/plain\\r\\n
    Content-Length: 1234\\r\\n
    \\r\\n
    <extracted plain text>\\r\\n
    \\r\\n

The reader splits records at the ``WARC/1.0`` marker via the text
source's ``lineSep`` option (each task parses only its own byte range —
embarrassingly parallel over files, no shuffle), then parses header
fields with ``regexp_extract`` and frames the payload on the first
blank line. Everything is a built-in expression: no Python in the hot
path, scan-stage only, 100 TB of WET shards parse at text-scan speed.

Framing contract (documented, checked): the ``lineSep`` split is
substring-based, so a payload containing the marker string ``WARC/1.0``
itself would mis-frame (real WET readers frame on Content-Length
octets, which needs byte-level record iteration — not worth leaving
the expression fast path for extracted plain text).
:func:`to_wet_lines` therefore rejects such payloads to NULL at
serialization time, and :func:`parse_wet_records` emits ``len_ok``
(octet_length(text) == Content-Length) so any mis-framed or corrupt
record is visible instead of silently wrong.

No counterpart in the reference (rizac/stream2segment ingests FDSN
seismic services); this is the web-corpus analogue of its text-source
parser (segment download manages framed text protocols the same way:
stream2segment/download/modules/stations.py parses '|'-framed text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

MARKER = "WARC/1.0"
_CRLF = "\r\n"
_HDR_SEP = _CRLF + _CRLF


def _hdr(name: str) -> Column:
    """Header value by name from the record's header block (empty
    string when absent)."""
    return F.regexp_extract(F.col("__hdrs"),
                            rf"(?m)^{name}:[ \t]*(.*?)\r?$", 1)


def parse_wet_records(records: DataFrame,
                      value_col: str = "value") -> DataFrame:
    """Parse raw record chunks (one ``WARC/1.0``-delimited chunk per
    row, marker already stripped by the ``lineSep`` split) into
    ``(warc_type, uri, warc_date, record_id, content_type,
    content_length, text, len_ok)``.

    The payload is everything after the first blank line, with ALL
    trailing CR/LF removed (the record frame is newline-delimited, so
    payload-final newlines are not preservable — the serializer
    normalizes them away symmetrically); ``len_ok`` cross-checks the
    Content-Length header against the framed octet count, accepted when
    it lies between the stripped payload and the raw frame — the spec
    counts payload-final newline octets that the newline-delimited
    frame cannot preserve, so exact equality would mis-flag every real
    newline-terminated Common Crawl record. Chunks with no blank-line
    separator (truncated records) are dropped."""
    raw = F.col(value_col)
    split_at = F.instr(raw, _HDR_SEP)
    rawpay = F.substring(raw, split_at + len(_HDR_SEP), 2_000_000_000)
    rec = records.where(split_at > 0).select(
        F.substring(raw, 1, split_at - 1).alias("__hdrs"),
        F.regexp_replace(rawpay, r"[\r\n]+$", "").alias("text"),
        # real Common Crawl Content-Length counts payload-final newline
        # octets that the frame strip removes — keep the pre-strip octet
        # count so len_ok can bound-check instead of mis-flagging every
        # newline-terminated record
        F.octet_length(rawpay).alias("__raw_octets"))
    return rec.select(
        _hdr("WARC-Type").alias("warc_type"),
        _hdr("WARC-Target-URI").alias("uri"),
        # try_: absent/garbled date headers -> NULL, not an ANSI throw
        F.try_to_timestamp(_hdr("WARC-Date"),
                           F.lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .alias("warc_date"),
        _hdr("WARC-Record-ID").alias("record_id"),
        _hdr("Content-Type").alias("content_type"),
        _hdr("Content-Length").try_cast("long")
        .alias("content_length"),
        F.col("text"),
        # well-framed iff the declared octet count sits between the
        # stripped payload and the raw frame (the difference is the
        # trailing CR/LF octets the frame strip removed, which the spec
        # counts but the newline-delimited frame cannot preserve)
        (_hdr("Content-Length").try_cast("long")
         .between(F.octet_length("text"), F.col("__raw_octets")))
        .alias("len_ok"))


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET file(s) at ``path`` into parsed conversion records
    (``warcinfo``/other control records are dropped; use
    :func:`parse_wet_records` directly to keep them). Splitting on the
    record marker makes each record one row regardless of how many
    newlines the payload holds."""
    raw = spark.read.option("lineSep", MARKER).text(path)
    out = parse_wet_records(raw.where(F.length("value") > 0))
    return out.where(F.col("warc_type") == "conversion")


def to_wet_lines(df: DataFrame, uri_col, text_col,
                 date_col=None) -> DataFrame:
    """Serialize ``(uri, text)`` rows into one WET conversion record
    string per row (column ``value``) — concatenate and write as text
    to produce a spec-shaped WET file (tests round-trip through
    :func:`read_wet`). Text containing the header separator followed by
    the record marker is rejected to NULL (framing contract above);
    Content-Length is the octet length of the text. ``date_col``
    defaults to a fixed epoch date so serialization stays
    deterministic."""
    uri = F.col(uri_col) if isinstance(uri_col, str) else uri_col
    text = F.coalesce(
        F.col(text_col) if isinstance(text_col, str) else text_col,
        F.lit(""))
    # symmetric with the parser: payload-final newlines normalize away
    text = F.regexp_replace(text, r"[\r\n]+$", "")
    text = F.when(text.contains(MARKER), F.lit(None)).otherwise(text)
    date = (F.date_format(F.col(date_col),
                          "yyyy-MM-dd'T'HH:mm:ss'Z'") if date_col
            else F.lit("1970-01-01T00:00:00Z"))
    rid = F.concat(F.lit("<urn:md5:"), F.md5(uri.cast("string")),
                   F.lit(">"))
    return df.select(F.concat(
        F.lit(MARKER + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), uri, F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Record-ID: "), rid, F.lit(_CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "), F.octet_length(text).cast("string"),
        F.lit(_HDR_SEP), text, F.lit(_HDR_SEP)).alias("value"))
