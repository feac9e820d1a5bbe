"""Server-less segment plot report — the reference GUI's plot-serving
workflow (``s2s show``: process/gui/webapp/mainapp/core.py:240-415 +
Flask views) re-expressed batch-first.

The reference runs a local web app that renders one segment at a time:
title bar (seed id, event info), the trace plot, and optional
preprocessed/custom plots, all downsampled server-side before shipping
to plotly. Spark shape: plot payloads for ANY number of segments are
produced distributed (``segment_plots_df`` — pandas-UDF producers from
:mod:`stream2segment_spark.plots`), and a *bounded* selection is
rendered driver-side into one standalone HTML file with inline SVG — no
server, no JS, no external fetches; open the file in any browser.

This is deliberately the batch analogue of the GUI, not a re-hosted web
app: selection + navigation happen through the selection compiler
(``exprquery``) instead of Flask routes.
"""

from __future__ import annotations

from html import escape

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark.plots import plot_producers

_SVG_W, _SVG_H = 640, 120


def segment_plots_df(
    segments: DataFrame,
    samples_col: str = "samples",
    delta_col: str = "delta",
    id_col: str = "id",
    label_cols: tuple[str, ...] = (),
    plots: tuple[str, ...] = ("trace", "cumulative", "spectrum"),
    n_buckets: int = 512,
    extra_producers: dict | None = None,
    extra_specs: dict | None = None,
    preprocess=None,
) -> DataFrame:
    """Distributed plot payloads: one row per segment with one struct
    column per plot (x0, dx, downsampled y, n_raw, label). Runs on all
    segments; callers bound the set BEFORE collecting for render.
    ``extra_producers`` (e.g. from ``plots.collect_custom_producers``)
    extend/override the builtin set; pass their labels in ``plots``.
    ``extra_specs`` (``plots.collect_custom_specs``) are raw
    ``{label: (fn, dx_fn)}`` pairs built here — use them instead of
    prebuilt producers when ``preprocess`` matters: ``preprocess``
    (the reference GUI's ``@gui.preprocess`` toggle, core.py:380-415)
    is bound into every producer built by THIS call, but cannot be
    injected into already-built ``extra_producers``."""
    from stream2segment_spark.plots import make_producer
    producers = plot_producers(n_buckets, preprocess=preprocess)
    if extra_specs:
        producers.update({
            label: make_producer(label, fn, dx_fn=dx_fn,
                                 n_buckets=n_buckets,
                                 preprocess=preprocess)
            for label, (fn, dx_fn) in extra_specs.items()})
    if extra_producers:
        producers.update(extra_producers)
    unknown = set(plots) - set(producers)
    if unknown:
        raise ValueError(f"unknown plots: {sorted(unknown)}")
    out = segments.select(
        F.col(id_col).alias("segment_id"),
        *[F.col(c) for c in label_cols],
        *[producers[p](F.col(samples_col), F.col(delta_col)).alias(p)
          for p in plots])
    return out


def _svg_polyline(y, w: int = _SVG_W, h: int = _SVG_H) -> str:
    """Inline SVG for one downsampled series (min/max interleaved or
    plain), scaled to the viewBox with a 2px margin."""
    arr = np.asarray([v for v in (y or []) if v is not None], dtype=float)
    if arr.size < 2 or not np.isfinite(arr).any():
        return (f'<svg viewBox="0 0 {w} {h}" class="plot empty">'
                f'<text x="8" y="{h // 2}">no data</text></svg>')
    arr = np.nan_to_num(arr, nan=0.0, posinf=0.0, neginf=0.0)
    lo, hi = arr.min(), arr.max()
    span = (hi - lo) or 1.0
    xs = np.linspace(2, w - 2, arr.size)
    ys = (h - 2) - (arr - lo) / span * (h - 4)
    pts = " ".join(f"{x:.1f},{v:.1f}" for x, v in zip(xs, ys))
    return (f'<svg viewBox="0 0 {w} {h}" class="plot">'
            f'<polyline fill="none" stroke="currentColor" stroke-width="1" '
            f'points="{pts}"/></svg>')


_CSS = """
body{font-family:sans-serif;margin:1.5em;color:#222}
h1{font-size:1.3em} h2{font-size:1.05em;border-top:1px solid #ccc;
padding-top:.8em;margin-top:1.2em}
.meta{color:#666;font-size:.85em;margin:.2em 0 .6em}
.plotrow{display:flex;gap:1em;flex-wrap:wrap}
figure{margin:0} figcaption{font-size:.8em;color:#444;text-align:center}
svg.plot{width:320px;height:60px;border:1px solid #ddd;color:#1a4a7a}
svg.empty text{font-size:12px;fill:#999}
"""


def render_segments_html(
    plot_rows,
    title: str = "segment report",
    max_segments: int = 200,
) -> str:
    """One standalone HTML page from COLLECTED ``segment_plots_df`` rows
    (``DataFrame.collect()`` output or dicts). Driver-side by design —
    a report is a bounded artifact; ``max_segments`` guards against
    accidentally collecting a whole table into one page."""
    rows = [r.asDict(recursive=True) if hasattr(r, "asDict") else dict(r)
            for r in plot_rows]
    if len(rows) > max_segments:
        raise ValueError(
            f"{len(rows)} segments exceed max_segments={max_segments}; "
            f"filter the selection or raise the cap explicitly")
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'/>",
        f"<title>{escape(title)}</title><style>{_CSS}</style></head><body>",
        f"<h1>{escape(title)}</h1>",
        f"<p class='meta'>{len(rows)} segment(s)</p>",
    ]
    plot_keys = [k for k in (rows[0] if rows else {})
                 if isinstance((rows[0] or {}).get(k), dict)]
    meta_keys = [k for k in (rows[0] if rows else {})
                 if k != "segment_id" and k not in plot_keys]
    for r in rows:
        parts.append(f"<h2>segment {escape(str(r.get('segment_id')))}</h2>")
        if meta_keys:
            meta = " · ".join(f"{escape(k)}={escape(str(r.get(k)))}"
                              for k in meta_keys)
            parts.append(f"<p class='meta'>{meta}</p>")
        parts.append("<div class='plotrow'>")
        for k in plot_keys:
            p = r.get(k) or {}
            n = p.get("n_raw")
            cap = escape(f"{p.get('label') or k}"
                         + (f" (n={n})" if n is not None else ""))
            parts.append(f"<figure>{_svg_polyline(p.get('y'))}"
                         f"<figcaption>{cap}</figcaption></figure>")
        parts.append("</div>")
    parts.append("</body></html>")
    return "".join(parts)


def write_segment_report(
    segments: DataFrame,
    path: str,
    title: str = "segment report",
    max_segments: int = 200,
    **plots_kwargs,
) -> int:
    """End-to-end: produce plots distributed, collect the (bounded) rows,
    write one HTML file. Returns the number of segments rendered."""
    df = segment_plots_df(segments, **plots_kwargs)
    rows = df.limit(max_segments + 1).collect()
    html = render_segments_html(rows, title=title, max_segments=max_segments)
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(html)
    return len(rows)
