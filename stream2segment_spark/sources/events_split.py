"""Adaptive event-request splitting (SURVEY S3; reference behavior:
download/modules/events.py:193-375).

FDSN event services reject too-large queries (HTTP 413). The reference
recursively splits the magnitude range using the empirical magnitude-
frequency distribution, falling back to time bisection. This is a
DRIVER-side control loop by nature (each probe is one HTTP request whose
outcome decides the next); the resulting accepted sub-requests are rows —
fan them out to `sources.fetch.fetch_rows` for the bulk re-fetch.

The magnitude split point comes from the Gutenberg-Richter law
N(>m) ∝ 10^(-b m) (public seismology: b ≈ 1): the count of a range
[lo, hi) is 10^(-b lo) - 10^(-b hi), and the even-count split solves
10^(-b m*) = (10^(-b lo) + 10^(-b hi)) / 2.
"""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass
from datetime import datetime, timedelta


class RequestTooLarge(Exception):
    """Raise from the fetcher to signal HTTP 413 / response-too-big."""


@dataclass(frozen=True)
class EventRequest:
    start: datetime
    end: datetime
    minmag: float
    maxmag: float


Fetcher = Callable[[EventRequest], object]


def gr_split_magnitude(lo: float, hi: float, b: float = 1.0) -> float:
    """Even-count magnitude split under Gutenberg-Richter N(>m) ∝ 10^(-bm)."""
    n_lo, n_hi = 10.0 ** (-b * lo), 10.0 ** (-b * hi)
    return -math.log10((n_lo + n_hi) / 2.0) / b


def split_events_request(
    request: EventRequest,
    fetch: Fetcher,
    min_mag_width: float = 0.1,
    min_time_width: timedelta = timedelta(hours=1),
    b_value: float = 1.0,
    max_splits: int = 200,
) -> list[tuple[EventRequest, object]]:
    """Run ``fetch`` on ``request``; on RequestTooLarge, split by magnitude
    (GR-weighted midpoint) until ranges are ``min_mag_width`` wide, then
    bisect time; gives up (re-raises) below ``min_time_width``.
    Returns [(accepted_subrequest, fetch_result), ...] in deterministic
    (time, magnitude) order. ``max_splits`` bounds the recursion fan-out.
    """
    out: list[tuple[EventRequest, object]] = []
    stack = [request]
    splits = 0
    while stack:
        req = stack.pop()
        try:
            out.append((req, fetch(req)))
            continue
        except RequestTooLarge:
            pass
        splits += 1
        if splits > max_splits:
            raise RequestTooLarge(
                f"still too large after {max_splits} splits: {req}")
        if req.maxmag - req.minmag > min_mag_width:
            mid = gr_split_magnitude(req.minmag, req.maxmag, b_value)
            mid = min(max(mid, req.minmag + min_mag_width / 2),
                      req.maxmag - min_mag_width / 2)
            stack.append(EventRequest(req.start, req.end, mid, req.maxmag))
            stack.append(EventRequest(req.start, req.end, req.minmag, mid))
        elif req.end - req.start > min_time_width:
            tmid = req.start + (req.end - req.start) / 2
            stack.append(EventRequest(tmid, req.end, req.minmag, req.maxmag))
            stack.append(EventRequest(req.start, tmid, req.minmag, req.maxmag))
        else:
            raise RequestTooLarge(f"cannot split further: {req}")
    out.sort(key=lambda t: (t[0].start, t[0].minmag))
    return out
