"""EIDA routing-service response parse (SURVEY S6; reference behavior:
download/modules/datacenters.py:28-247).

The EIDA routing service returns a PUBLIC plain-text format: blocks
separated by blank lines, each starting with a dataselect URL followed by
one line per routed NSLC pattern + epoch:

    http://geofon.gfz-potsdam.de/fdsnws/dataselect/1/query
    GE * * * 1993-01-01T00:00:00 2100-01-01T00:00:00
    GE APE * HH? 2000-01-01T00:00:00

Tiny dimension: parsed driver-side into (datacenter, matcher) rows, then
broadcast; the station URL is derived from the dataselect URL by the FDSN
naming convention."""

from __future__ import annotations

from dataclasses import dataclass

from stream2segment_spark.columns import wildcard_to_regex


@dataclass(frozen=True)
class RoutingRule:
    dataselect_url: str
    network: str
    station: str
    location: str
    channel: str
    start: str | None = None
    end: str | None = None


def parse_routing_response(text: str) -> list[RoutingRule]:
    rules: list[RoutingRule] = []
    url = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            url = None
            continue
        if line.lower().startswith(("http://", "https://")):
            url = line
            continue
        if url is None:
            continue
        parts = line.split()
        if len(parts) < 4:
            continue
        net, sta, loc, cha = parts[:4]
        start = parts[4] if len(parts) > 4 else None
        end = parts[5] if len(parts) > 5 else None
        rules.append(RoutingRule(url, net, sta, loc, cha, start, end))
    return rules


def station_url_of(dataselect_url: str) -> str:
    """FDSN convention: .../fdsnws/dataselect/1/query ->
    .../fdsnws/station/1/query."""
    return dataselect_url.replace("/dataselect/", "/station/")


def rule_matches(rule: RoutingRule, net: str, sta: str, loc: str,
                 cha: str) -> bool:
    """Wildcard NSLC match ('--' means empty location, like FDSN)."""
    import re
    loc = "" if loc == "--" else loc
    rloc = "" if rule.location == "--" else rule.location
    return all(
        re.fullmatch(wildcard_to_regex(pat), val) is not None
        for pat, val in ((rule.network, net), (rule.station, sta),
                         (rloc, loc), (rule.channel, cha)))


def resolve_datacenter(rules: list[RoutingRule], net: str, sta: str,
                       loc: str, cha: str) -> str | None:
    """First matching rule's datacenter (used for A7 conflict resolution:
    a station claimed by two datacenters goes to the routed one)."""
    for r in rules:
        if rule_matches(r, net, sta, loc, cha):
            return r.dataselect_url
    return None


def routed_datacenter_expr(rules: list[RoutingRule],
                           net_col: str = "network",
                           sta_col: str = "station",
                           loc_col: str = "location",
                           cha_col: str = "channel"):
    """``resolve_datacenter`` as a pure Spark Column: first-match-wins
    CASE chain of anchored-regex NSLC tests. The routing table is tiny
    (dozens of rules), so the whole policy inlines into the plan — no UDF,
    no driver round-trip per key."""
    from pyspark.sql import functions as F

    loc = F.coalesce(F.col(loc_col), F.lit(""))
    out = None
    for r in rules:
        rloc = "" if r.location == "--" else r.location
        cond = (F.col(net_col).rlike(wildcard_to_regex(r.network))
                & F.col(sta_col).rlike(wildcard_to_regex(r.station))
                & loc.rlike(wildcard_to_regex(rloc))
                & F.col(cha_col).rlike(wildcard_to_regex(r.channel)))
        out = (F.when(cond, F.lit(r.dataselect_url)) if out is None
               else out.when(cond, F.lit(r.dataselect_url)))
    return (out.otherwise(F.lit(None).cast("string")) if out is not None
            else F.lit(None).cast("string"))
