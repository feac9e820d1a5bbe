"""Download-statistics presentation layer (SURVEY A1/A9 presentation
parity; reference download/modules/utils.py:385-710 ``DownloadStats`` and
download/db/inspection/main.py:419-455).

The data side stays distributed (``stats_by_code`` is a plain groupBy over
the segments frame — the same aggregation the ``agg_stats_pivot`` /
``agg_download_summary`` gate entries check). The result is a tiny
(#datacenters x #codes) matrix, so rendering collects it and formats
driver-side, exactly where the reference prints its table after every
download.

Reproduced behavior:
- per-code column ordering ("sort value"): 2xx first (success), the
  partial-save warning right after 200, then client/server errors, then
  the application codes (-204, -2, -1, None) before informational /
  redirect classes; unknown codes last, int-castable ones first;
- column titles from the standard HTTP reason phrases plus the
  application-code titles users see in the reference's logs;
- a legend explaining every code that appeared;
- a TOTAL row and a TOTAL column;
- text and (minimal, self-contained) HTML renderings.
"""

from __future__ import annotations

from functools import cmp_to_key
from http.client import responses as _HTTP_REASONS

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# application codes (reference s2scodes, utils.py:385-394)
URL_ERR = -1
MSEED_ERR = -2
TIMESPAN_ERR = -204
TIMESPAN_WARN = -200
SEG_NOT_FOUND = None  # segment row exists, no data was ever received

_SAVED = "Data saved"
_NOT_SAVED = "No data saved"

# code -> (title, legend, sort position); mirrors the reference's policy
# (utils.py:396-474) without enumerating every HTTP code: the generic
# classes are computed in code_info.
_CUSTOM = {
    TIMESPAN_WARN: ("OK Partially Saved",
                    f"{_SAVED} (download completed, chunks outside the "
                    "requested time window were discarded)", 0.5),
    TIMESPAN_ERR: ("Time Span Error",
                   f"{_NOT_SAVED} (download completed, every chunk was "
                   "outside the requested time window)", 99.1),
    MSEED_ERR: ("MSeed Error",
                f"{_SAVED} (download completed, malformed MiniSeed data)",
                99.2),
    URL_ERR: ("Url Error",
              f"{_NOT_SAVED} (download failed: generic url error, e.g. "
              "timeout or no connection)", 99.3),
    SEG_NOT_FOUND: ("Segment Not Found",
                    f"{_NOT_SAVED} (download completed, segment data not "
                    "found, e.g. in a multi-segment request)", 99.4),
}


def code_info(code) -> tuple[str, str, float | None]:
    """(title, legend, sort position) for a download code. Unknown codes
    get a generic title/legend and sort position None (pushed last)."""
    if code in _CUSTOM:
        return _CUSTOM[code]
    try:
        c = int(code)
    except (TypeError, ValueError):
        c = None
    if c is not None and 100 <= c <= 599:
        title = _HTTP_REASONS.get(c, f"Code {c}")
        if c >= 500:
            return (title, f"{_NOT_SAVED} (download failed: server error, "
                    f"response code {c})", float(c - 300))
        if c >= 400:
            return (title, f"{_NOT_SAVED} (download failed: client error, "
                    f"response code {c})", float(c - 300))
        if c >= 300:
            return (title, "Data status unknown (download completed, "
                    f"response code {c} indicates redirection)",
                    float(c + 100))
        if c == 200:
            return (title, f"{_SAVED} (download completed, no additional "
                    "warning)", 0.0)
        if c == 204:
            return (title, f"{_NOT_SAVED} (download completed, the server "
                    "returned 0 bytes of data)", 4.0)
        if c > 200:
            return (title, "Data status unknown (download completed, "
                    f"response code {c} indicates success)", float(c - 200))
        return (title, "Data status unknown (download completed, response "
                f"code {c} is informational)", float(c + 200))
    return (f"Code {code}", "Data status unknown (download completed, "
            f"response code {code} is unknown)", None)


def sort_codes(codes) -> list:
    """Ascending by sort position; unknown codes last (int-castable ones
    first, in integer order) — reference DownloadStats.sortcodes."""
    def cmp(a, b):
        pa, pb = code_info(a)[2], code_info(b)[2]
        if pa is None and pb is None:
            try:
                ia = int(a)
            except (TypeError, ValueError):
                ia = None
            try:
                ib = int(b)
            except (TypeError, ValueError):
                ib = None
            if ia is None and ib is None:
                return 0
            if ia is None:
                return 1
            if ib is None:
                return -1
            return (ia > ib) - (ia < ib)
        if pa is None:
            return 1
        if pb is None:
            return -1
        return (pa > pb) - (pa < pb)
    return sorted(codes, key=cmp_to_key(cmp))


def stats_by_code(
    segments: DataFrame,
    row_col: str = "datacenter",
    code_col: str = "download_code",
) -> DataFrame:
    """The distributed side: (row, code, n) counts — one partial-agg
    shuffle over the segments table; the result has #rows x #codes rows
    (tiny), ready for ``render_text``/``render_html``."""
    return (segments.groupBy(F.col(row_col).alias("row"),
                             F.col(code_col).alias("code"))
            .agg(F.count("*").alias("n")))


def _matrix(stats_rows) -> tuple[list, list, dict]:
    """(sorted rows, sorted codes, {(row, code): n}) from collected
    (row, code, n) records."""
    cells: dict = {}
    for r in stats_rows:
        row, code, n = r["row"], r["code"], int(r["n"])
        cells[(row, code)] = cells.get((row, code), 0) + n
    rows = sorted({k[0] for k in cells}, key=lambda v: (v is None, str(v)))
    codes = sort_codes({k[1] for k in cells})
    return rows, codes, cells


def render_text(stats_df: DataFrame) -> str:
    """Fixed-width text table: one row per datacenter/url, one column per
    code (title ordered per the code policy), TOTAL row + column, legend
    of every code that appeared. Empty input renders ''."""
    rows, codes, cells = _matrix(stats_df.collect())
    if not rows:
        return ""
    titles = [code_info(c)[0] for c in codes]
    header = [""] + titles + ["TOTAL"]
    body: list[list[str]] = []
    col_tot = [0] * len(codes)
    for row in rows:
        vals = [cells.get((row, c), 0) for c in codes]
        for i, v in enumerate(vals):
            col_tot[i] += v
        body.append([str(row)] + [str(v) for v in vals] + [str(sum(vals))])
    body.append(["TOTAL"] + [str(v) for v in col_tot] + [str(sum(col_tot))])
    widths = [max(len(r[i]) for r in [header] + body)
              for i in range(len(header))]
    def fmt(cells_):
        return "  ".join(
            c.ljust(widths[i]) if i == 0 else c.rjust(widths[i])
            for i, c in enumerate(cells_))
    sep = fmt(["-" * w for w in widths])
    lines = [fmt(header), sep] + [fmt(r) for r in body]
    lines += ["", "COLUMNS DETAILS:"]
    lines += [f" - {code_info(c)[0]}: {code_info(c)[1]}" for c in codes]
    return "\n".join(lines)


def render_html(stats_df: DataFrame) -> str:
    """Minimal self-contained HTML twin of ``render_text`` (the reference
    serves a full Flask page; the data payload is this table + legend)."""
    rows, codes, cells = _matrix(stats_df.collect())
    if not rows:
        return "<table></table>"
    esc = lambda s: (str(s).replace("&", "&amp;").replace("<", "&lt;")
                     .replace(">", "&gt;"))
    th = "".join(f"<th>{esc(code_info(c)[0])}</th>" for c in codes)
    out = [f"<table><thead><tr><th></th>{th}<th>TOTAL</th></tr></thead>",
           "<tbody>"]
    col_tot = [0] * len(codes)
    for row in rows:
        vals = [cells.get((row, c), 0) for c in codes]
        for i, v in enumerate(vals):
            col_tot[i] += v
        tds = "".join(f"<td>{v}</td>" for v in vals)
        out.append(f"<tr><td>{esc(row)}</td>{tds}<td>{sum(vals)}</td></tr>")
    tds = "".join(f"<td>{v}</td>" for v in col_tot)
    out.append(f"<tr><td>TOTAL</td>{tds}<td>{sum(col_tot)}</td></tr>")
    out.append("</tbody></table><ul>")
    out += [f"<li>{esc(code_info(c)[0])}: {esc(code_info(c)[1])}</li>"
            for c in codes]
    out.append("</ul>")
    return "".join(out)
