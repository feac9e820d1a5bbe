"""Tests: compression sniffing (K7), EIDA routing parse (S6), ISF parse (S2)."""

from __future__ import annotations

import pytest

from stream2segment_spark.sources.compression import (
    compress_payload, sniff_decompress)
from stream2segment_spark.sources.isf import isf_to_fdsn_rows, parse_isf_events
from stream2segment_spark.sources.routing import (
    parse_routing_response, resolve_datacenter, rule_matches, station_url_of)


@pytest.mark.parametrize("method", ["gzip", "bz2", "zlib", "zip"])
def test_compress_sniff_roundtrip(method):
    payload = b"<StationXML>" + bytes(range(256)) * 10 + b"</StationXML>"
    blob = compress_payload(payload, method)
    assert blob != payload
    assert sniff_decompress(blob) == payload


def test_sniff_passthrough_plain():
    assert sniff_decompress(b"plain text") == b"plain text"
    assert sniff_decompress(b"") == b""


ROUTING = """\
http://geofon.gfz-potsdam.de/fdsnws/dataselect/1/query
GE * * * 1993-01-01T00:00:00 2100-01-01T00:00:00
GE APE * HH? 2000-01-01T00:00:00

http://webservices.ingv.it/fdsnws/dataselect/1/query
IV * * *
MN TIR -- BH?
"""


def test_parse_routing():
    rules = parse_routing_response(ROUTING)
    assert len(rules) == 4
    assert rules[0].dataselect_url.startswith("http://geofon")
    assert rules[2].network == "IV"
    assert rules[3].location == "--"
    assert station_url_of(rules[0].dataselect_url) == \
        "http://geofon.gfz-potsdam.de/fdsnws/station/1/query"


def test_rule_matching_and_resolution():
    rules = parse_routing_response(ROUTING)
    assert rule_matches(rules[1], "GE", "APE", "00", "HHZ")
    assert not rule_matches(rules[1], "GE", "APE", "00", "BHZ")
    assert rule_matches(rules[3], "MN", "TIR", "", "BHN")     # '--' = empty loc
    assert not rule_matches(rules[3], "MN", "TIR", "00", "BHN")
    assert resolve_datacenter(rules, "IV", "ACER", "", "EHZ") \
        .startswith("http://webservices.ingv.it")
    assert resolve_datacenter(rules, "XX", "NOPE", "", "XXX") is None


def _col(text: str, width: int) -> str:
    return text.ljust(width)


ISF = """\
DATA_TYPE BULLETIN IMS1.0:short
Event  600516 Greece
   Date       Time        Err   RMS Latitude Longitude  Smaj  Smin  Az Depth   Err Ndef Nsta Gap  mdist  Mdist Qual   Author      OrigID
2021/03/04 05:06:07.10   0.50  1.20  37.0700   25.5300  10.0   8.0  90  12.0   2.0   50   40 100   0.50  10.00 m i uk  ISC       12345678
2021/03/04 05:06:08.00   0.80  1.50  37.1000   25.5000  11.0   9.0  95  14.0   3.0   30   20 120   0.60  11.00 m i uk  IDC       87654321

Magnitude  Err Nsta Author      OrigID
mb     4.6 0.2   25 ISC       12345678
ML     4.4 0.3   12 ATH       12345678

Event  600517 Aegean Sea
   Date       Time        Err   RMS Latitude Longitude  Smaj  Smin  Az Depth   Err Ndef Nsta Gap  mdist  Mdist Qual   Author      OrigID
2021/03/05 01:02:03.00   0.40  1.00  38.5000   26.0000   9.0   7.0  80  33.0   1.5   60   50  90   0.40   9.00 m i uk  ISC       22345678

STOP
"""


def test_parse_isf():
    evs = parse_isf_events(ISF)
    assert len(evs) == 2
    e = evs[0]
    assert e.event_id == "600516"
    assert e.location_name == "Greece"
    assert e.time == "2021-03-04T05:06:07.10"
    assert e.latitude == pytest.approx(37.07)
    assert e.longitude == pytest.approx(25.53)
    assert e.depth_km == pytest.approx(12.0)
    assert e.mag_type == "mb" and e.magnitude == pytest.approx(4.6)
    assert evs[1].event_id == "600517"
    assert evs[1].magnitude is None       # no magnitude block


def test_isf_to_fdsn_rows_feeds_s1(spark):
    from stream2segment_spark.sources.fdsn import (
        EVENT_COLS, EVENT_REQUIRED, parse_fdsn_lines, to_fdsn_lines)
    rows = isf_to_fdsn_rows(ISF)
    assert len(rows) == 1                 # the magnitude-less event dropped
    df = spark.createDataFrame(
        rows, ", ".join(f"{n} {'string' if t != 'double' else 'double'}"
                        for n, t in EVENT_COLS))
    from pyspark.sql import functions as F
    df = df.withColumn("time", F.to_timestamp("time")) \
           .withColumn("depth_km", F.col("depth_km").cast("double"))
    parsed = parse_fdsn_lines(to_fdsn_lines(df, EVENT_COLS),
                              EVENT_COLS, EVENT_REQUIRED)
    got = parsed.collect()[0]
    assert got["event_id"] == "600516"
    assert got["magnitude"] == pytest.approx(4.6)


ISF_SUBBLOCKS = """\
DATA_TYPE BULLETIN IMS1.0:short
Event  700001 Crete
 (This event was widely felt in the region)
   Date       Time        Err   RMS Latitude Longitude  Smaj  Smin  Az Depth   Err Ndef Nsta Gap  mdist  Mdist Qual   Author      OrigID
2022/06/07 08:09:10.00   0.40  1.00  35.2000   24.8000   9.0   7.0  80  22.0   1.5   60   50  90   0.40   9.00 m i uk  ISC       33345678

Magnitude  Err Nsta Author      OrigID

Sta     Dist  EvAz Phase        Time      TRes  Azim AzRes   Slow   SRes Def   SNR       Amp   Per Qual Magnitude    ArrID
MOX     5.12 231.0 P        08:10:25.100   0.2                          T__  12.1      48.0  0.80 m__            99900001
APE     6.40 120.0 Pn       08:10:40.000  -0.1                          T__   8.2      31.5  0.75 m__            99900002

MaxInt  Scale  Author
     5  MMI    ISC

Magnitude  Err Nsta Author      OrigID
mb     4.9 0.2   25 ISC       33345678

STOP
"""


def test_parse_isf_skips_phase_and_effects_subblocks():
    """Phase lines carry a float exactly where the magnitude value sits
    (the Dist column: 'MOX 5.12' would fake mb=5.12); the sub-block
    headers must switch parsing off, and the REAL magnitude block later
    in the event must still be honored."""
    evs = parse_isf_events(ISF_SUBBLOCKS)
    assert len(evs) == 1
    e = evs[0]
    assert e.time == "2022-06-07T08:09:10.00"
    assert e.latitude == pytest.approx(35.2)
    # NOT 5.12 (the MOX phase Dist) and NOT 5 (the MaxInt intensity):
    assert e.mag_type == "mb" and e.magnitude == pytest.approx(4.9)
    assert e.mag_author == "ISC"


def test_parse_isf_phases_side_table(spark):
    """The phase sub-block (which the event converter deliberately
    skips, matching the reference) surfaces as a structured side table
    parsed by the spec's fixed columns."""
    from stream2segment_spark.sources.isf import (isf_phases_df,
                                                  parse_isf_phases)
    ph = parse_isf_phases(ISF_SUBBLOCKS)
    assert [p.sta for p in ph] == ["MOX", "APE"]
    a, b = ph
    assert a.event_id == "700001" and a.phase == "P"
    assert a.dist_deg == pytest.approx(5.12)
    assert a.ev_az == pytest.approx(231.0)
    assert a.time == "08:10:25.100"
    assert a.t_res == pytest.approx(0.2)
    assert a.snr == pytest.approx(12.1)
    assert a.amp == pytest.approx(48.0)
    assert a.per == pytest.approx(0.80)
    assert a.qual == "m__" and a.arr_id == "99900001"
    assert b.phase == "Pn" and b.t_res == pytest.approx(-0.1)
    # magnitude / MaxInt / comment lines never leak into the block
    assert len(ph) == 2
    df = isf_phases_df(spark, ISF_SUBBLOCKS)
    assert df.count() == 2
    assert df.filter("sta = 'APE' AND amp = 31.5").count() == 1
    # a bulletin without phase blocks yields an empty, well-typed frame
    assert isf_phases_df(spark, ISF).count() == 0


def test_format_isf_events_roundtrip():
    from stream2segment_spark.sources.isf import (
        IsfEvent, format_isf_events, parse_isf_events)
    evs = [
        IsfEvent(event_id="42", time="2021-03-04T05:06:07",
                 latitude=-85.25, longitude=179.5, depth_km=33.0,
                 author="TSTBULL", contributor_id="o42",
                 mag_type="MW", magnitude=6.5, mag_author="MAGAUT",
                 location_name="Somewhere Deep"),
        # sparse event: only id + time survive serialization
        IsfEvent(event_id="x7", time="1999-12-31T23:59:59"),
    ]
    back = parse_isf_events(format_isf_events(evs))
    assert len(back) == 2
    a, b = back
    assert (a.event_id, a.time, a.latitude, a.longitude, a.depth_km) == \
        ("42", "2021-03-04T05:06:07", -85.25, 179.5, 33.0)
    assert (a.author, a.contributor_id, a.mag_type, a.magnitude,
            a.mag_author, a.location_name) == \
        ("TSTBULL", "o42", "MW", 6.5, "MAGAUT", "Somewhere Deep")
    assert (b.event_id, b.time) == ("x7", "1999-12-31T23:59:59")
    assert b.latitude is None and b.magnitude is None


def test_wet_len_ok_accepts_payload_final_newline(spark):
    """Real Common Crawl Content-Length counts payload-final newline
    octets the newline-delimited frame strips: such records are
    well-framed (len_ok=true); genuinely mis-framed records stay
    flagged."""
    from stream2segment_spark.sources.wet import parse_wet_records

    def chunk(text_bytes: bytes, declared: int) -> str:
        return ("WARC-Type: conversion\r\n"
                "WARC-Target-URI: http://x.org/\r\n"
                "WARC-Date: 2024-01-01T00:00:00Z\r\n"
                "WARC-Record-ID: <urn:uuid:1>\r\n"
                "Content-Type: text/plain\r\n"
                f"Content-Length: {declared}\r\n"
                "\r\n" + text_bytes.decode())

    body = b"hello world\n"             # spec counts the final newline
    rows = [(chunk(body, len(body)),),           # newline-terminated: ok
            (chunk(b"hello world", 11),),        # exact: ok
            (chunk(b"hello world", 5),)]         # mis-framed: flagged
    df = spark.createDataFrame(rows, "value string")
    got = [r["len_ok"] for r in parse_wet_records(df).collect()]
    assert got == [True, True, False]
