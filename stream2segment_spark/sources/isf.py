"""ISF (International Seismological Format) bulletin -> event rows
(SURVEY S2; reference behavior: download/modules/events.py:381-473, the
ISF->FDSN-text converter feeding the same event pipeline).

Implements the PUBLIC ISF 2.x fixed-column layout (ISC documentation):

- an event starts with  ``Event <evid> <region>``;
- origin lines (under the ``Date ... Time`` sub-header) carry, 1-based:
  cols 1-10 date ``yyyy/mm/dd``, 12-22 time, 37-44 latitude, 46-54
  longitude, 72-76 depth km, 119-127 author, 129-136 origin id;
- magnitude lines (under ``Magnitude`` sub-header): cols 1-5 type,
  7-10 value, 21-29 author.

The converter keeps each event's FIRST origin and FIRST magnitude (the
prime-marked ones lead in ISC bulletins) — same policy as the reference.
Parsing is pure Python line logic; at scale run it distributed with
``mapPartitions`` over bulletin files split at ``Event`` boundaries, or
driver-side for the (small) event dimension.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# ISF magnitude-type codes: mb, Ms, ML, MW, mB, MS, MLv, mbtmp, Mjma, ...
_MAG_TYPE = re.compile(r"^[A-Za-z][A-Za-z0-9_]{0,4}$")


@dataclass
class IsfEvent:
    event_id: str
    time: str | None = None          # ISO 'YYYY-MM-DDTHH:MM:SS[.ss]'
    latitude: float | None = None
    longitude: float | None = None
    depth_km: float | None = None
    author: str | None = None
    contributor_id: str | None = None
    mag_type: str | None = None
    magnitude: float | None = None
    mag_author: str | None = None
    location_name: str | None = None


def _f(s: str) -> float | None:
    s = s.strip()
    try:
        return float(s)
    except ValueError:
        return None


def _slice(line: str, lo: int, hi: int) -> str:
    """1-based inclusive column slice, tolerant of short lines."""
    return line[lo - 1:hi]


def parse_isf_events(text: str) -> list[IsfEvent]:
    events: list[IsfEvent] = []
    cur: IsfEvent | None = None
    mode = None  # None | 'origin' | 'magnitude'
    for raw in text.splitlines():
        if raw.startswith("Event "):
            parts = raw.split(None, 2)
            cur = IsfEvent(event_id=parts[1] if len(parts) > 1 else "")
            cur.location_name = parts[2].strip() if len(parts) > 2 else None
            events.append(cur)
            mode = None
            continue
        if cur is None:
            continue
        if raw.startswith("   Date"):
            mode = "origin"
            continue
        if raw.startswith("Magnitude"):
            mode = "magnitude"
            continue
        if raw.startswith(("Sta ", "Sta\t", "Year ", "Net ", "MaxInt",
                           "Heard", "Felt")):
            # other ISF sub-block headers (phase, publication,
            # macroseismic/effects — isc.ac.uk/standards/isf): their DATA
            # lines must never be parsed as origins/magnitudes (a phase
            # line's Dist column parses as a float exactly where the
            # magnitude value sits)
            mode = None
            continue
        if not raw.strip() or raw.startswith(("STOP", "DATA_TYPE", "(")):
            continue
        if mode == "origin" and cur.time is None:
            date = _slice(raw, 1, 10).strip()
            time = _slice(raw, 12, 22).strip()
            if len(date) == 10 and date[4] == "/":
                cur.time = date.replace("/", "-") + "T" + time
                cur.latitude = _f(_slice(raw, 37, 44))
                cur.longitude = _f(_slice(raw, 46, 54))
                cur.depth_km = _f(_slice(raw, 72, 76))
                cur.author = _slice(raw, 119, 127).strip() or None
                cur.contributor_id = _slice(raw, 129, 136).strip() or None
        elif mode == "magnitude" and cur.magnitude is None:
            val = _f(_slice(raw, 7, 10))
            mtype = _slice(raw, 1, 5).strip()
            # sanity-gate the fixed columns: a magnitude value lives in
            # [-2, 12] and the type is a short alphanumeric code — lines
            # from an unrecognized sub-block can't slip through even if
            # their header wasn't matched above
            if (val is not None and -2.0 <= val <= 12.0
                    and (not mtype or _MAG_TYPE.match(mtype))):
                cur.mag_type = mtype or None
                cur.magnitude = val
                cur.mag_author = _slice(raw, 21, 29).strip() or None
    return events


@dataclass
class IsfPhase:
    """One phase-block data line (station arrival pick)."""
    event_id: str
    sta: str | None = None
    dist_deg: float | None = None
    ev_az: float | None = None
    phase: str | None = None
    time: str | None = None          # 'HH:MM:SS[.sss]'
    t_res: float | None = None
    azim: float | None = None
    slow: float | None = None
    snr: float | None = None
    amp: float | None = None
    per: float | None = None
    qual: str | None = None
    arr_id: str | None = None


# ISF1.0/2.x phase-block fixed columns, 1-based inclusive (the ISC ISF
# specification, isc.ac.uk/standards/isf — the header labels are only
# the block marker; numeric labels are right-aligned over their fields,
# so spans must come from the spec, not the header):
_PHASE_COLS = {
    "sta": (1, 5), "dist": (7, 12), "evaz": (14, 18),
    "phase": (20, 27), "time": (29, 40), "tres": (42, 46),
    "azim": (48, 52), "azres": (54, 58), "slow": (60, 65),
    "sres": (67, 71), "snr": (77, 81), "amp": (83, 91),
    "per": (93, 97), "qual": (99, 101), "arrid": (114, 121),
}

_TIME_RE = re.compile(r"^\d{2}:\d{2}:\d{2}(\.\d+)?$")


def parse_isf_phases(text: str) -> list[IsfPhase]:
    """Phase-block picks per event — the ISF sub-block the event
    converter deliberately skips (reference parity: the reference
    ignores phase data entirely, download/modules/events.py:397+ parses
    only origin/magnitude; this surfaces the skipped block as a
    STRUCTURED side table instead). Data lines parse by the spec's
    fixed columns; rows without a station code or a valid arrival time
    are dropped (comment/continuation lines)."""
    out: list[IsfPhase] = []
    event_id = ""
    in_block = False
    for raw in text.splitlines():
        if raw.startswith("Event "):
            parts = raw.split(None, 2)
            event_id = parts[1] if len(parts) > 1 else ""
            in_block = False
            continue
        if raw.startswith(("Sta ", "Sta\t")):
            in_block = True
            continue
        if raw.startswith(("   Date", "Magnitude", "Year ", "Net ",
                           "MaxInt", "Heard", "Felt")):
            in_block = False             # a different sub-block begins
            continue
        if not in_block or not raw.strip() or raw.startswith(("STOP",
                                                              "(")):
            continue

        def g(name: str) -> str:
            lo, hi = _PHASE_COLS[name]
            return _slice(raw, lo, hi).strip()

        sta, time = g("sta"), g("time")
        if not sta or not _TIME_RE.match(time):
            continue
        out.append(IsfPhase(
            event_id=event_id, sta=sta,
            dist_deg=_f(g("dist")), ev_az=_f(g("evaz")),
            phase=g("phase") or None, time=time,
            t_res=_f(g("tres")), azim=_f(g("azim")),
            slow=_f(g("slow")), snr=_f(g("snr")), amp=_f(g("amp")),
            per=_f(g("per")), qual=g("qual") or None,
            arr_id=g("arrid") or None))
    return out


PHASE_DDL = ("event_id string, sta string, dist_deg double, "
             "ev_az double, phase string, time string, t_res double, "
             "azim double, slow double, snr double, amp double, "
             "per double, qual string, arr_id string")


def isf_phases_df(spark, text: str):
    """Phase picks as a DataFrame (bulletins are driver-grain, like the
    event dimension; at scale parse per-file with mapPartitions)."""
    rows = [(p.event_id, p.sta, p.dist_deg, p.ev_az, p.phase, p.time,
             p.t_res, p.azim, p.slow, p.snr, p.amp, p.per, p.qual,
             p.arr_id) for p in parse_isf_phases(text)]
    return spark.createDataFrame(rows, PHASE_DDL)


def isf_to_fdsn_rows(text: str) -> list[tuple]:
    """EVENT_COLS-ordered tuples (sources.fdsn layout) ready for
    ``spark.createDataFrame`` + the S1 pipeline. Events lacking an origin
    or magnitude are dropped (non-nullable per the FDSN harmonization)."""
    out = []
    for e in parse_isf_events(text):
        if e.time is None or e.latitude is None or e.longitude is None \
                or e.magnitude is None:
            continue
        out.append((e.event_id, e.time, e.latitude, e.longitude,
                    e.depth_km, e.author, "ISC", None, e.contributor_id,
                    e.mag_type, e.magnitude, e.mag_author, e.location_name))
    return out


def format_isf_events(events) -> str:
    """Serialize :class:`IsfEvent` rows into a spec-shaped ISF 2.x
    bulletin (the inverse of :func:`parse_isf_events`, same fixed
    columns — reference layout documented in the module docstring).
    Floats print at the layout's natural precision (lat/lon %.2f,
    depth/magnitude %.1f): a value produced by /100 (or /10) integer
    scaling round-trips bit-exactly through format+parse, which is what
    lets the gate oracle recompute parsed values directly. Used by the
    ``source_isf_roundtrip`` gate entry and as a test-fixture builder."""
    def put(buf: list, lo: int, s: str) -> None:
        need = lo - 1 + len(s)
        while len(buf) < need:
            buf.append(" ")
        buf[lo - 1:lo - 1 + len(s)] = list(s)

    out = ["DATA_TYPE BULLETIN ISF2.0"]
    for e in events:
        out.append(f"Event {e.event_id} {e.location_name or ''}".rstrip())
        out.append("   Date       Time        Err   RMS Latitude "
                   "Longitude  Smaj  Smin  Az Depth")
        line: list = []
        date, time = (e.time or "T").split("T")
        put(line, 1, date.replace("-", "/"))
        put(line, 12, time)
        if e.latitude is not None:
            put(line, 37, f"{e.latitude:8.2f}")
        if e.longitude is not None:
            put(line, 46, f"{e.longitude:9.2f}")
        if e.depth_km is not None:
            put(line, 72, f"{e.depth_km:5.1f}")
        if e.author:
            put(line, 119, f"{e.author:<9.9s}")
        if e.contributor_id:
            put(line, 129, f"{e.contributor_id:<8.8s}")
        out.append("".join(line).rstrip())
        out.append("Magnitude  Err Nsta Author      OrigID")
        mline: list = []
        if e.mag_type:
            put(mline, 1, f"{e.mag_type:<5.5s}")
        if e.magnitude is not None:
            put(mline, 7, f"{e.magnitude:4.1f}")
        if e.mag_author:
            put(mline, 21, f"{e.mag_author:<9.9s}")
        out.append("".join(mline).rstrip())
        out.append("")
    out.append("STOP")
    return "\n".join(out)
