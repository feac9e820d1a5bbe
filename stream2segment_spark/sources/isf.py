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
