"""Unit tests for the multimodal binary-column layer: header probing
(real parsing of public formats), stubbed pixel decode, frame sampling."""

from __future__ import annotations

import struct

import numpy as np
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


def test_decode_pixels_strict_raises_on_codec_formats(spark):
    # JPEG needs an entropy codec: strict decode must refuse loudly
    df = spark.createDataFrame([(1, _jpeg(2, 2))], "id long, content binary")
    with pytest.raises(Exception) as exc:
        df.select(MM.decode_pixels_udf(strict=True)("content")).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)
    df = spark.createDataFrame([(1, b"abc")], "id long, content binary")
    with pytest.raises(Exception) as exc:
        df.select(MM.decode_pixels_udf(strict=True)("content")).collect()
    assert "unknown image container" in str(exc.value)


def test_decode_pixels_fake_deterministic(spark):
    df = spark.createDataFrame([(1, b"ab"), (2, None)], "id long, content binary")
    rows = {r["id"]: r["px"] for r in df.select(
        "id", MM.decode_pixels_udf(strict=False, n_fake=4)("content")
        .alias("px")).collect()}
    assert rows[1]["pixels"] == pytest.approx(
        [97 / 255, 98 / 255, 97 / 255, 98 / 255])
    assert rows[2]["pixels"] is None


# ---- real pixel decode (PPM/PGM, BMP, PNG) --------------------------------

def _encode_png(arr, color, filters):
    """Independent PNG writer: forward-filter each row with the given
    filter type, deflate, wrap in IHDR/IDAT/IEND chunks."""
    import zlib
    h, w, ch = arr.shape
    bpp = ch
    lines = []
    prior = np.zeros(w * ch, dtype=np.int32)
    for y, ftype in zip(range(h), filters):
        raw = arr[y].reshape(-1).astype(np.int32)
        out = raw.copy()
        for x in range(w * ch):
            a = raw[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 1:
                out[x] = raw[x] - a
            elif ftype == 2:
                out[x] = raw[x] - b
            elif ftype == 3:
                out[x] = raw[x] - ((a + b) >> 1)
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out[x] = raw[x] - pred
        lines.append(bytes([ftype]) + bytes(out.astype(np.uint8)))
        prior = raw

    def chunk(typ, payload):
        import zlib as z
        return (struct.pack(">I", len(payload)) + typ + payload
                + struct.pack(">I", z.crc32(typ + payload)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(b"".join(lines))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def _encode_bmp(arr, bits):
    """Independent BMP writer: bottom-up BGR(A) rows padded to 4 bytes."""
    h, w, ch = arr.shape
    row = w * ch
    pad = (-row) % 4
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = arr[y][:, [2, 1, 0] + ([3] if ch == 4 else [])]
        body += bytes(bgr.reshape(-1)) + b"\x00" * pad
    off = 14 + 40
    hdr = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, 0, len(body),
                         2835, 2835, 0, 0))
    return hdr + body


RNG = np.random.default_rng(7)


@pytest.mark.parametrize("color,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
def test_png_decode_roundtrip_all_filters(color, ch):
    arr = RNG.integers(0, 256, size=(5, 4, ch), dtype=np.uint8)
    blob = _encode_png(arr, color, filters=[0, 1, 2, 3, 4])
    got = MM.decode_image_bytes(blob)
    assert (got["width"], got["height"], got["n_channels"]) == (4, 5, ch)
    np.testing.assert_allclose(
        got["pixels"], arr.reshape(-1) / 255.0, atol=1e-12)


@pytest.mark.parametrize("bits,ch", [(24, 3), (32, 4)])
def test_bmp_decode(bits, ch):
    arr = RNG.integers(0, 256, size=(3, 5, ch), dtype=np.uint8)
    got = MM.decode_image_bytes(_encode_bmp(arr, bits))
    assert (got["width"], got["height"], got["n_channels"]) == (5, 3, ch)
    np.testing.assert_allclose(
        got["pixels"], arr.reshape(-1) / 255.0, atol=1e-12)


def test_pnm_decode_with_comment():
    arr = RNG.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    blob = b"P6\n# a comment\n3 2\n255\n" + bytes(arr.reshape(-1))
    got = MM.decode_image_bytes(blob)
    assert (got["width"], got["height"], got["n_channels"]) == (3, 2, 3)
    np.testing.assert_allclose(got["pixels"], arr.reshape(-1) / 255.0)
    gray = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    got = MM.decode_image_bytes(b"P5 3 2 255\n" + bytes(gray.reshape(-1)))
    assert got["n_channels"] == 1
    np.testing.assert_allclose(got["pixels"], gray.reshape(-1) / 255.0)


def test_decode_pixels_udf_strict_real_decode(spark):
    arr = RNG.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, _encode_png(arr, 2, [4, 3, 2, 1])), (2, _encode_bmp(arr, 24)),
         (3, None)],
        "id long, content binary")
    rows = {r["id"]: r["px"] for r in df.select(
        "id", MM.decode_pixels_udf(strict=True)("content").alias("px"))
        .collect()}
    for rid in (1, 2):
        assert (rows[rid]["width"], rows[rid]["height"]) == (4, 4)
        assert rows[rid]["pixels"] == pytest.approx(
            list(arr.reshape(-1) / 255.0))
    assert rows[3]["pixels"] is None


def test_sample_raw_frames(spark):
    blob = bytes(range(256))  # 4 frames of 64 -> sampled idx 0, 2
    df = spark.createDataFrame(
        [(1, blob), (2, b"short"), (3, None)], "doc_id long, content binary")
    out = MM.sample_raw_frames(df, frame_bytes=64, every_n=2).collect()
    got = sorted((r["doc_id"], r["frame_idx"], bytes(r["frame"])[:2])
                 for r in out)
    assert got == [(1, 0, b"\x00\x01"), (1, 2, b"\x80\x81")]


def test_decode_truncated_containers_raise_valueerror():
    """A truncated/corrupt container must surface as ValueError (one
    failure type), never a parser internal (struct.error, IndexError,
    zlib.error) — the non-strict UDF fallback only catches ValueError/
    NotImplementedError, so a leaked internal would crash the query."""
    from stream2segment_spark.multimodal import decode_image_bytes
    for corrupt in (b"\x89PNG\r\n\x1a\n" + b"\x00" * 4,     # truncated PNG
                    b"\x89PNG\r\n\x1a\n" + b"\x00" * 40,    # bad zlib IDAT
                    b"BM" + b"\x01" * 10,                   # truncated BMP
                    b"P6 4 4 255\n"):                       # PPM, no pixels
        with pytest.raises((ValueError, NotImplementedError)):
            decode_image_bytes(corrupt)


def test_decode_fallback_survives_corrupt_and_empty(spark):
    """Non-strict mode: corrupt + empty blobs fall back to the
    deterministic fake with a CONSISTENT width/pixels contract."""
    from stream2segment_spark.multimodal import decode_pixels_udf
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\n" + b"\x00" * 4), (2, b""), (3, None)],
        "id long, content binary")
    rows = {r.id: r.px for r in df.select(
        "id", decode_pixels_udf(strict=False, n_fake=8)("content")
        .alias("px")).collect()}
    assert len(rows[1].pixels) == 8 and rows[1].width == 8
    assert len(rows[2].pixels) == 8 and set(rows[2].pixels) == {0.0}
    assert rows[3].pixels is None and rows[3].width is None


def _wav_bytes(sampwidth, frames, ch=1, rate=8000):
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_wav_pcm16_roundtrip():
    import numpy as np

    from stream2segment_spark.multimodal import decode_audio_bytes
    vals = np.array([0, 1000, -1000, 32767, -32768], dtype="<i2")
    b = _wav_bytes(2, vals.tobytes(), ch=1, rate=44100)
    out = decode_audio_bytes(b)
    assert (out["sample_rate"], out["n_channels"],
            out["n_samples"]) == (44100, 1, 5)
    assert np.allclose(out["samples"], vals.astype(float) / 32768.0)


def test_decode_wav_pcm8_stereo_and_float32():
    import struct as st

    import numpy as np

    from stream2segment_spark.multimodal import decode_audio_bytes
    # 8-bit unsigned stereo: 2 frames
    b = _wav_bytes(1, bytes([128, 128, 255, 0]), ch=2, rate=8000)
    out = decode_audio_bytes(b)
    assert out["n_channels"] == 2 and out["n_samples"] == 2
    assert np.allclose(out["samples"], [0.0, 0.0, 127 / 128, -1.0])
    # IEEE float32 (format 3): hand-built container
    data = np.array([0.5, -0.25], dtype="<f4").tobytes()
    fmt = st.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    wav = (b"RIFF" + st.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
           + b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
           + b"data" + st.pack("<I", len(data)) + data)
    out = decode_audio_bytes(wav)
    assert np.allclose(out["samples"], [0.5, -0.25])


def test_decode_wav_failure_modes():
    from stream2segment_spark.multimodal import decode_audio_bytes
    with pytest.raises(ValueError, match="RIFF"):
        decode_audio_bytes(b"not audio at all")
    with pytest.raises(ValueError, match="fmt"):
        decode_audio_bytes(b"RIFF\x00\x00\x00\x00WAVE")
    # compressed format id (2 = ADPCM) -> NotImplementedError
    import struct as st
    fmt = st.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    wav = (b"RIFF" + st.pack("<I", 30) + b"WAVE"
           + b"fmt " + st.pack("<I", len(fmt)) + fmt
           + b"data" + st.pack("<I", 2) + b"\x00\x00")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_audio_bytes(wav)


def test_decode_samples_udf_strict_and_fallback(spark):
    import numpy as np

    from stream2segment_spark.multimodal import decode_samples_udf
    good = _wav_bytes(2, np.array([100, -100], dtype="<i2").tobytes())
    df = spark.createDataFrame(
        [(1, good), (2, b"garbage"), (3, None)],
        "id long, content binary")
    rows = {r.id: r.s for r in df.select(
        "id", decode_samples_udf(strict=False, n_fake=4)("content")
        .alias("s")).collect()}
    assert rows[1].n_samples == 2 and rows[1].sample_rate == 8000
    assert rows[2].n_samples == 4 and rows[2].sample_rate == 0
    assert rows[3].samples is None
    import pytest as _pt
    with _pt.raises(Exception):
        df.select(decode_samples_udf(strict=True)("content")).collect()


# ---------------------------------------------------------------------------
# resize + feature extraction
# ---------------------------------------------------------------------------

def test_resize_nearest_exact_indexing():
    from stream2segment_spark.multimodal import resize_image
    px = np.arange(16, dtype=float) / 255.0          # 4x4 gray
    out = resize_image(px, 4, 4, 1, 2, 2, "nearest")
    np.testing.assert_allclose(out * 255.0, [0, 2, 8, 10])
    # upscale: src index (x*2)//4 repeats each source pixel twice
    up = resize_image(np.array([10.0, 20.0, 30.0, 40.0]) / 255.0,
                      2, 2, 1, 4, 4, "nearest")
    np.testing.assert_allclose(
        up.reshape(4, 4) * 255.0,
        [[10, 10, 20, 20], [10, 10, 20, 20],
         [30, 30, 40, 40], [30, 30, 40, 40]])


def test_resize_bilinear_matches_reference():
    from stream2segment_spark.multimodal import resize_image
    rng = np.random.default_rng(5)
    img = rng.random((6, 8, 3))
    out = resize_image(img.reshape(-1), 8, 6, 3, 4, 3,
                       "bilinear").reshape(3, 4, 3)
    # brute-force half-pixel-center reference
    for y in range(3):
        for x in range(4):
            fx = min(max((x + 0.5) * 8 / 4 - 0.5, 0), 7)
            fy = min(max((y + 0.5) * 6 / 3 - 0.5, 0), 5)
            x0, y0 = int(fx), int(fy)
            x1, y1 = min(x0 + 1, 7), min(y0 + 1, 5)
            wx, wy = fx - x0, fy - y0
            want = (img[y0, x0] * (1 - wx) * (1 - wy)
                    + img[y0, x1] * wx * (1 - wy)
                    + img[y1, x0] * (1 - wx) * wy
                    + img[y1, x1] * wx * wy)
            np.testing.assert_allclose(out[y, x], want, rtol=1e-12)


def test_resize_udf_multichannel_and_nulls(spark):
    from stream2segment_spark import multimodal as MM
    from pyspark.sql import functions as F
    rows = [(1, [float(v) / 255 for v in range(32)], 4, 4, 2),
            (2, None, None, None, None)]
    df = spark.createDataFrame(
        rows, "id long, pixels array<double>, width int, height int, "
              "n_channels int")
    out = {r.id: r.r.asDict() if r.r else None for r in df.withColumn(
        "r", MM.resize_pixels_udf(2, 2)("pixels", "width", "height",
                                        "n_channels")).collect()}
    r1 = out[1]
    assert (r1["width"], r1["height"], r1["n_channels"]) == (2, 2, 2)
    # sources: flat pixel pairs at (0,0),(0,2),(2,0),(2,2) of a 4x4x2 grid
    np.testing.assert_allclose(
        np.array(r1["pixels"]) * 255, [0, 1, 4, 5, 16, 17, 20, 21])
    assert out[2]["pixels"] is None
    # null n_channels with non-null pixels: null row, not a task crash
    df2 = spark.createDataFrame(
        [(3, [0.5] * 4, 2, 2, None)],
        "id long, pixels array<double>, width int, height int, "
        "n_channels int")
    r3 = df2.withColumn("r", MM.resize_pixels_udf(1, 1)(
        "pixels", "width", "height", "n_channels")).collect()[0].r
    assert r3.pixels is None
    f3 = df2.withColumn("f", MM.image_features_udf()(
        "pixels", "width", "height", "n_channels")).collect()[0].f
    assert f3.px_sum is None


def test_image_and_audio_features(spark):
    from stream2segment_spark import multimodal as MM
    px = [v / 255.0 for v in [0, 10, 20, 30,
                              5, 15, 25, 35,
                              0, 0, 0, 0,
                              255, 255, 255, 255]]
    df = spark.createDataFrame(
        [(1, px, 4, 4, 1)],
        "id long, pixels array<double>, width int, height int, "
        "n_channels int")
    f = df.select(MM.image_features_udf()(
        "pixels", "width", "height", "n_channels").alias("f")) \
        .collect()[0].f.asDict()
    assert f["px_sum"] == sum(round(v * 255) for v in px)
    assert f["px_min"] == 0 and f["px_max"] == 255
    # rows TV: 3*10 + 3*10 + 0 + 0 = 60; cols TV per col:
    # |5-0|+|0-5|+|255-0| etc
    want_v = sum(abs(a - b) for a, b in
                 zip([5, 15, 25, 35], [0, 10, 20, 30])) \
        + sum(abs(a - b) for a, b in zip([0, 0, 0, 0], [5, 15, 25, 35])) \
        + sum(abs(a - b) for a, b in zip([255] * 4, [0, 0, 0, 0]))
    assert f["edge_sum"] == 60 + want_v

    smp = [v / 32768.0 for v in [100, -50, 25, 0, -10]]
    adf = spark.createDataFrame(
        [(1, smp, 1)], "id long, samples array<double>, n_channels int")
    a = adf.select(MM.audio_features_udf()(
        "samples", "n_channels").alias("a")).collect()[0].a.asDict()
    assert a["n_frames"] == 5 and a["peak"] == 100
    assert a["zero_crossings"] == 2          # 100->-50, -50->25 (0 breaks)
    assert a["ssq"] == 100**2 + 50**2 + 25**2 + 0 + 10**2


def test_probe_video_mp4_and_avi():
    import struct

    from stream2segment_spark.multimodal import (
        build_avi_bytes, build_mp4_bytes, probe_video_bytes)
    m = probe_video_bytes(build_mp4_bytes(1800, 600, 3))
    assert (m["media_type"], m["duration_sec"], m["timescale"],
            m["n_tracks"]) == ("video/mp4", 3.0, 600, 3)
    a = probe_video_bytes(build_avi_bytes(640, 480, 120, 40000))
    assert (a["media_type"], a["width"], a["height"], a["n_frames"],
            a["duration_sec"]) == ("video/x-msvideo", 640, 480, 120, 4.8)
    # mvhd v1 (64-bit times)
    mvhd1 = struct.pack(">I4sB3xQQIQ", 40, b"mvhd", 1, 5, 6, 600, 1200)
    moov = struct.pack(">I4s", 48, b"moov") + mvhd1
    ftyp = struct.pack(">I4s4sI4s", 20, b"ftyp", b"isom", 0, b"mp42")
    v1 = probe_video_bytes(ftyp + moov)
    assert v1["duration_sec"] == 2.0 and v1["timescale"] == 600
    # zero tracks / zero duration still parse
    z = probe_video_bytes(build_mp4_bytes(0, 600, 0))
    assert z["n_tracks"] == 0 and z["duration_sec"] == 0.0


def test_probe_video_edge_cases():
    from stream2segment_spark.multimodal import (
        build_mp4_bytes, probe_video_bytes)
    assert probe_video_bytes(None)["error"] == "null content"
    assert probe_video_bytes(b"garbage!!!!!")["error"] \
        == "not a video container"
    good = build_mp4_bytes(600, 600, 1)
    # corrupt a box size to < 8: flagged, not an infinite loop/crash
    bad = good[:20] + b"\x00\x00\x00\x02" + good[24:]
    assert probe_video_bytes(bad)["error"] == "truncated box"
    # ftyp without any moov
    assert probe_video_bytes(good[:20])["error"] == "no mvhd box"
    # RIFF AVI without avih
    assert probe_video_bytes(b"RIFF\x10\x00\x00\x00AVI LIST")["error"] \
        == "no avih chunk"


def test_media_probe_cli(spark, tmp_path, capsys):
    import json

    from pyspark.sql import Row

    from stream2segment_spark.cli import main as cli_main
    from stream2segment_spark.multimodal import build_mp4_bytes

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
           + (64).to_bytes(4, "big") + (32).to_bytes(4, "big")
           + b"\x08\x02")
    rows = [Row(doc_id=1, content=bytearray(png)),
            Row(doc_id=2, content=bytearray(build_mp4_bytes(1200, 600, 2))),
            Row(doc_id=3, content=bytearray(b"not a container")),
            Row(doc_id=4, content=None)]
    src = str(tmp_path / "m.parquet")
    spark.createDataFrame(rows, "doc_id long, content binary") \
        .write.parquet(src)
    assert cli_main(["media-probe", "-i", src]) == 0
    out = {json.loads(l)["doc_id"]: json.loads(l) for l in
           capsys.readouterr().out.strip().splitlines()}
    assert out[1]["media_type"] == "image/png" and out[1]["width"] == 64
    assert out[2]["media_type"] == "video/mp4"
    assert out[2]["duration_sec"] == 2.0 and out[2]["n_tracks"] == 2
    assert out[3]["media_type"] is None and out[3]["error"]
    assert out[4]["media_type"] is None
    assert cli_main(["media-probe", "-i", src, "--col", "nope"]) == 2


def test_probe_wav_walks_riff_chunks():
    """Probe must locate fmt by WALKING RIFF chunks: a JUNK chunk before
    fmt used to yield garbage channels/rate silently at fixed offsets."""
    fmt_payload = (b"\x01\x00" + struct.pack("<HI", 2, 48000)
                   + struct.pack("<IH", 48000 * 2 * 2, 4)
                   + struct.pack("<H", 16))
    junk = b"JUNK" + struct.pack("<I", 6) + b"\x00" * 6
    body = (b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt_payload))
            + fmt_payload)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    m = MM.probe_media_bytes(blob)
    assert (m["media_type"], m["n_channels"], m["sample_rate"],
            m["bit_depth"]) == ("audio/wav", 2, 48000, 16)
    assert m["error"] is None
    # a WAVE container with NO fmt chunk flags the error field
    body = b"WAVE" + junk
    m = MM.probe_media_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert m["media_type"] == "audio/wav"
    assert "fmt" in m["error"]


def test_jpeg_probe_tolerates_fill_bytes_and_rst():
    """Spec-legal 0xFF fill bytes and standalone RST/TEM markers must
    not derail the SOF walk."""
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", 13, 17) + b"\x03"
    blob = b"\xff\xd8" + app0 + b"\xff" + b"\xff\x01" + sof0  # fill + TEM
    m = MM.probe_media_bytes(blob)
    assert (m["width"], m["height"], m["error"]) == (17, 13, None)


def test_bmff_size_zero_and_largesize():
    """ISO-BMFF size==0 (box to EOF) and size==1 (64-bit largesize) are
    spec-conformant, not 'truncated box'."""
    mvhd = (b"\x00\x00\x00\x6c" + b"mvhd" + bytes([0])
            + b"\x00" * 11 + struct.pack(">II", 1000, 5000)
            + b"\x00" * (0x6c - 0x1c))
    moov_payload = mvhd
    # moov uses size==1 + largesize
    moov = (b"\x00\x00\x00\x01" + b"moov"
            + struct.pack(">Q", 16 + len(moov_payload)) + moov_payload)
    ftyp = b"\x00\x00\x00\x10ftypisom\x00\x00\x00\x00"
    mdat = b"\x00\x00\x00\x00" + b"mdat" + b"\x00" * 8  # size 0 -> EOF
    m = MM.probe_video_bytes(ftyp + moov + mdat)
    assert m["error"] is None
    assert m["timescale"] == 1000 and m["duration_sec"] == 5.0
