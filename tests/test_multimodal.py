"""Unit tests for the multimodal binary-column layer: header probing
(real parsing of public formats), stubbed pixel decode, frame sampling."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from stream2segment_spark import multimodal as MM


def _png(w, h, bit_depth=8, color=2):
    return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + struct.pack(">II", w, h) + bytes([bit_depth, color]))


def _wav(channels, rate, bits=16):
    return (b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00"
            + struct.pack("<HI", channels, rate)
            + struct.pack("<IH", rate * channels * bits // 8,
                          channels * bits // 8)
            + struct.pack("<H", bits))


def _jpeg(w, h):
    # SOI + APP0 stub + SOF0
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", h, w) + b"\x03"
    return b"\xff\xd8" + app0 + sof0


def test_probe_bytes_png_wav_jpeg_gif():
    m = MM.probe_media_bytes(_png(640, 480))
    assert (m["media_type"], m["width"], m["height"], m["n_channels"],
            m["bit_depth"]) == ("image/png", 640, 480, 3, 8)
    m = MM.probe_media_bytes(_wav(2, 44100))
    assert (m["media_type"], m["n_channels"], m["sample_rate"],
            m["bit_depth"]) == ("audio/wav", 2, 44100, 16)
    m = MM.probe_media_bytes(_jpeg(320, 200))
    assert (m["media_type"], m["width"], m["height"]) == ("image/jpeg", 320, 200)
    m = MM.probe_media_bytes(b"GIF89a" + struct.pack("<HH", 10, 20))
    assert (m["media_type"], m["width"], m["height"]) == ("image/gif", 10, 20)
    assert MM.probe_media_bytes(None)["error"] == "null content"
    assert MM.probe_media_bytes(b"junk")["error"] == "unknown container"


def test_probe_udf_batch(spark):
    df = spark.createDataFrame(
        [(1, _png(3, 4)), (2, _wav(1, 8000)), (3, None), (4, b"xx")],
        "id long, content binary")
    out = {r["id"]: r["media"].asDict()
           for r in MM.attach_media_meta(df).collect()}
    assert out[1]["media_type"] == "image/png" and out[1]["width"] == 3
    assert out[2]["sample_rate"] == 8000
    assert out[3]["error"] == "null content"
    assert out[4]["error"] == "unknown container"


def test_decode_pixels_strict_raises(spark):
    df = spark.createDataFrame([(1, b"abc")], "id long, content binary")
    with pytest.raises(Exception) as exc:
        df.select(MM.decode_pixels_udf(strict=True)("content")).collect()
    assert "NotImplementedError" in str(exc.value) or \
        "codec" in str(exc.value)


def test_decode_pixels_fake_deterministic(spark):
    df = spark.createDataFrame([(1, b"ab"), (2, None)], "id long, content binary")
    rows = {r["id"]: r["px"] for r in df.select(
        "id", MM.decode_pixels_udf(strict=False, n_fake=4)("content")
        .alias("px")).collect()}
    assert rows[1] == pytest.approx([97 / 255, 98 / 255, 97 / 255, 98 / 255])
    assert rows[2] is None


def test_sample_raw_frames(spark):
    blob = bytes(range(256))  # 4 frames of 64 -> sampled idx 0, 2
    df = spark.createDataFrame(
        [(1, blob), (2, b"short"), (3, None)], "doc_id long, content binary")
    out = MM.sample_raw_frames(df, frame_bytes=64, every_n=2).collect()
    got = sorted((r["doc_id"], r["frame_idx"], bytes(r["frame"])[:2])
                 for r in out)
    assert got == [(1, 0, b"\x00\x01"), (1, 2, b"\x80\x81")]
