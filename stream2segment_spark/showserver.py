"""Interactive ``s2s show --serve``: the reference GUI's live workflow
(select a segment, view its plots, hand-label classes from the browser —
process/gui/webapp/mainapp/views.py:34-115, core.py:240-415) as a thin
stdlib ``http.server`` JSON endpoint over the SAME data layer as the
server-less report:

- plot payloads come from :func:`stream2segment_spark.report
  .segment_plots_df` (the distributed pandas-UDF producers), computed
  per request for exactly ONE segment (``filter(id == ...)`` -> one-row
  collect — the reference recomputes plots per request the same way);
- class labels read/write through :mod:`stream2segment_spark.warehouse`
  (``class_labels`` / ``class_labellings``, the reference's hand-label
  tables), so a label clicked in the browser is immediately a queryable
  warehouse row;
- navigation state (the ordered segment-id array) is collected once,
  like the reference's ``g_segment_ids``; the selection itself is the
  ``exprquery`` selection the caller built.

No Flask, no template engine, no external JS: one inline HTML page
drawing SVG polylines from the JSON API. Routes (all JSON):

====================================  =====================================
``GET  /api/init``                    num_segments, class labels, plot names
``GET  /api/segment/<idx>``           plots + seed_id + set labels of the
                                      idx-th selected segment (0-based);
                                      ``?preprocess=1`` runs producers on
                                      the ``@segment_preprocess`` output
                                      (the reference GUI's preprocess
                                      checkbox, core.py:240-415)
``POST /api/segment/<idx>/class``     body ``{"label": L, "value": bool}``
                                      -> toggles the labelling, returns the
                                      segment's labels
``POST /api/selection``               body = conditions dict (selection
                                      grammar) -> re-runs the selection,
                                      returns the new num_segments
``GET  /``                            the interactive page
====================================  =====================================
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream2segment_spark import warehouse as WH
from stream2segment_spark.report import segment_plots_df


class ShowApp:
    """Data layer of the interactive viewer; HTTP-free and fully testable
    on its own (the handler below only routes to these methods)."""

    def __init__(
        self,
        segments: DataFrame,
        warehouse: str | None = None,
        id_col: str = "id",
        label_cols: tuple[str, ...] = ("seed_id",),
        plots: tuple[str, ...] = ("trace", "cumulative", "spectrum"),
        n_buckets: int = 512,
        extra_producers: dict | None = None,
        extra_specs: dict | None = None,
        preprocess_fn=None,
        annotator: str | None = None,
        max_segments: int = 100_000,
        select_fn=None,
    ):
        self.warehouse = warehouse
        self.id_col = id_col
        self.plots = plots
        self.n_buckets = n_buckets
        self.extra_producers = extra_producers
        # raw {label: (fn, dx_fn)} specs (plots.collect_custom_specs):
        # unlike prebuilt extra_producers these can be rebuilt with the
        # preprocess function bound when the browser toggle is on
        self.extra_specs = extra_specs
        # the @segment_preprocess function (reference @gui.preprocess,
        # core.py:380-415): applied on demand per request, never baked
        # into the default producers
        self.preprocess_fn = preprocess_fn
        if preprocess_fn is not None and extra_producers and not extra_specs:
            # prebuilt producer UDFs cannot be rebuilt with the
            # preprocess bound — every ?preprocess=1 request would 400
            # on the custom plot names; fail loudly at construction
            raise ValueError(
                "preprocess_fn with extra_producers needs extra_specs "
                "(plots.collect_custom_specs) so custom plots can be "
                "rebuilt on the preprocessed samples")
        self.annotator = annotator
        self.max_segments = max_segments
        # optional live-selection hook (the reference GUI's
        # set_selection route): conditions dict -> a new segments frame
        self.select_fn = select_fn
        # writers serialize on this lock; readers take ONE atomic
        # snapshot of the (segments, seg_ids, label_cols) tuple per
        # request, so a GET racing a POST /api/selection sees either
        # the whole old selection or the whole new one — never new ids
        # indexed with a stale bound or plots from a half-swapped state
        self._select_lock = threading.Lock()
        self._install(segments)

    def _install(self, segments: DataFrame) -> None:
        label_cols = tuple(c for c in ("seed_id",)
                           if c in segments.columns)
        # the navigation array, like the reference's g_segment_ids
        # (core.py:240+): ordered ids of the CURRENT selection, bounded
        ids = [r[0] for r in segments.select(self.id_col)
               .orderBy(self.id_col)
               .limit(self.max_segments + 1).collect()]
        if len(ids) > self.max_segments:
            raise ValueError(
                f"selection exceeds {self.max_segments} segments; narrow "
                f"segments_selection or raise max_segments")
        # single reference assignment = the atomic swap point
        self._state = (segments, ids, label_cols)

    # read-only views over the current atomic snapshot (each property
    # access is one read of self._state; request handlers that need a
    # CONSISTENT segments+seg_ids pair unpack _state once instead)
    @property
    def segments(self) -> DataFrame:
        return self._state[0]

    @property
    def seg_ids(self) -> list:
        return self._state[1]

    @property
    def label_cols(self) -> tuple:
        return self._state[2]

    def set_selection(self, conditions: dict | None) -> dict:
        """Re-run the selection with new conditions (reference
        views.py:75-87: set_selection rebuilds g_segment_ids; empty
        selections are rejected the same way)."""
        if self.select_fn is None:
            raise ValueError("this viewer has no live-selection hook")
        conditions = {k: v for k, v in (conditions or {}).items()
                      if isinstance(v, str) and v.strip()}
        with self._select_lock:
            segments = self.select_fn(conditions)
            ids = [r[0] for r in segments.select(self.id_col)
                   .orderBy(self.id_col).limit(1).collect()]
            if not ids:
                raise ValueError("no segment matching the current selection")
            self._install(segments)
            return {"num_segments": len(self.seg_ids)}

    # -- API payloads ---------------------------------------------------

    def init_data(self) -> dict:
        classes = {}
        if self.warehouse:
            classes = {r["label"]: r["description"] for r in
                       WH.read_small(self.warehouse,
                                     "class_labels").to_pylist()}
        return {"num_segments": len(self.seg_ids),
                "classes": classes,
                "plots": list(self.plots),
                # the reference GUI only renders the preprocess
                # checkbox when a @gui.preprocess function exists
                "has_preprocess": self.preprocess_fn is not None}

    @staticmethod
    def _pick(seg_ids: list, index: int) -> int:
        if not (0 <= index < len(seg_ids)):
            raise IndexError(f"segment index {index} out of range "
                             f"[0, {len(seg_ids)})")
        return seg_ids[index]

    def _seg_id(self, index: int) -> int:
        return self._pick(self.seg_ids, index)

    def segment_data(self, index: int,
                     plots: tuple[str, ...] | None = None,
                     preprocessed: bool = False) -> dict:
        """``plots`` overrides the default plot set for this request —
        the reference GUI's per-request ``plot_names`` field.
        ``preprocessed`` runs every producer on the
        ``@segment_preprocess`` output instead of the raw samples (the
        reference GUI's preprocess checkbox, core.py:240-415 —
        ``get_segment_data(..., preprocessed)``)."""
        plots = tuple(plots) if plots else self.plots
        pre = None
        if preprocessed:
            if self.preprocess_fn is None:
                raise ValueError(
                    "preprocess requested but no @segment_preprocess "
                    "function was loaded (pass one in the -p module)")
            pre = self.preprocess_fn
        segments, seg_ids, label_cols = self._state  # one snapshot
        seg_id = self._pick(seg_ids, index)
        one = segments.filter(F.col(self.id_col) == seg_id)
        row = (segment_plots_df(
                   one, id_col=self.id_col, label_cols=label_cols,
                   plots=plots, n_buckets=self.n_buckets,
                   extra_producers=(None if preprocessed
                                    else self.extra_producers),
                   extra_specs=self.extra_specs,
                   preprocess=pre)
               .collect())
        if not row:
            raise KeyError(f"segment {seg_id} vanished from the source")
        d = row[0].asDict(recursive=True)
        out = {"index": index, "segment_id": seg_id,
               "preprocessed": bool(preprocessed),
               "plots": {p: d[p] for p in plots},
               **{c: d[c] for c in label_cols}}
        if self.warehouse:
            classes = {r["id"]: r["label"] for r in
                       WH.read_small(self.warehouse,
                                     "class_labels").to_pylist()}
            out["labels"] = sorted(
                classes[r["class_id"]]
                for r in WH.labellings(self.warehouse, seg_id)
                if r["class_id"] in classes)
        return out

    def set_class(self, index: int, label: str, value: bool) -> dict:
        if not self.warehouse:
            raise ValueError("no warehouse configured; labels need one")
        seg_id = self._seg_id(index)
        labels = WH.set_labelling(self.warehouse, seg_id, label,
                                  bool(value), annotator=self.annotator)
        return {"segment_id": seg_id, "labels": labels}


_PAGE = """<!DOCTYPE html><html><head><meta charset="utf-8"/>
<title>s2s show</title><style>
body{font-family:sans-serif;margin:1.5em}figure{margin:0 0 1em}
svg{border:1px solid #ccc;background:#fff}.nav button{margin-right:.5em}
.cls label{margin-right:1em}.meta{color:#666}
</style></head><body>
<h1>s2s show</h1>
<div class="nav"><button id="prev">&#8592; prev</button>
<button id="next">next &#8594;</button>
<span id="pos" class="meta"></span> <span id="seed" class="meta"></span>
<label id="pplab" style="display:none;margin-left:1em">
<input type="checkbox" id="pp"/> preprocess</label></div>
<div class="cls" id="classes"></div><div id="plots"></div>
<script>
let idx=0,num=0,classes={};
function svg(y,w,h){if(!y||!y.length)return "<svg width='"+w+"' height='"+h+"'></svg>";
 let lo=Math.min(...y),hi=Math.max(...y),span=(hi-lo)||1;
 let pts=y.map((v,i)=>((i*(w-2)/(y.length-1||1))+1).toFixed(1)+","+
   (h-1-(v-lo)*(h-2)/span).toFixed(1)).join(" ");
 return "<svg width='"+w+"' height='"+h+"'><polyline fill='none' "+
   "stroke='#36c' stroke-width='1' points='"+pts+"'/></svg>";}
async function load(){
 const pp=document.getElementById("pp").checked?"?preprocess=1":"";
 const r=await fetch("/api/segment/"+idx+pp);if(!r.ok){return}
 const d=await r.json();
 document.getElementById("pos").textContent=(idx+1)+" / "+num;
 document.getElementById("seed").textContent=d.seed_id||"";
 const P=document.getElementById("plots");P.innerHTML="";
 for(const[name,p] of Object.entries(d.plots)){
  P.insertAdjacentHTML("beforeend","<figure>"+svg(p.y,640,120)+
   "<figcaption>"+(p.label||name)+" (n="+p.n_raw+")</figcaption></figure>");}
 const C=document.getElementById("classes");C.textContent="";
 for(const label of Object.keys(classes)){
  const lab=document.createElement("label");
  const cb=document.createElement("input");
  cb.type="checkbox";cb.checked=(d.labels||[]).includes(label);
  cb.dataset.l=label;  // DOM APIs: label text can never inject markup
  cb.onchange=async()=>{
   await fetch("/api/segment/"+idx+"/class",{method:"POST",
    headers:{"Content-Type":"application/json"},
    body:JSON.stringify({label:cb.dataset.l,value:cb.checked})});};
  lab.appendChild(cb);lab.appendChild(document.createTextNode(label));
  C.appendChild(lab);}}
document.getElementById("prev").onclick=()=>{if(idx>0){idx--;load();}};
document.getElementById("next").onclick=()=>{if(idx<num-1){idx++;load();}};
document.getElementById("pp").onchange=()=>load();
fetch("/api/init").then(r=>r.json()).then(d=>{
 num=d.num_segments;classes=d.classes||{};
 if(d.has_preprocess){document.getElementById("pplab").style.display="";}
 load();});
</script></body></html>"""


def _make_handler(app: ShowApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _json(self, obj, status=200):
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _dispatch(self, payload=None):
            from urllib.parse import parse_qs, urlsplit
            url = urlsplit(self.path)
            qs = parse_qs(url.query)
            parts = [p for p in url.path.split("/") if p]
            try:
                if not parts:
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if parts[:2] == ["api", "init"]:
                    return self._json(app.init_data())
                if parts[:2] == ["api", "segment"] and len(parts) == 3:
                    sel = tuple(p for raw in qs.get("plots", [])
                                for p in raw.split(",") if p)
                    pre = (qs.get("preprocess", ["0"])[0].lower()
                           in ("1", "true", "yes", "on"))
                    return self._json(app.segment_data(
                        int(parts[2]), plots=sel or None,
                        preprocessed=pre))
                if (parts[:2] == ["api", "segment"] and len(parts) == 4
                        and parts[3] == "class"):
                    return self._json(app.set_class(
                        int(parts[2]), payload["label"],
                        payload.get("value", True)))
                if parts[:2] == ["api", "selection"]:
                    return self._json(app.set_selection(payload))
                return self._json({"error": f"no route {self.path!r}"}, 404)
            except (KeyError, IndexError, ValueError, TypeError) as exc:
                # TypeError covers e.g. a GET hitting the POST-only class
                # route (payload is None) — a JSON 400, not a dropped
                # connection with a stack trace
                return self._json({"error": str(exc)}, 400)

        def do_GET(self):
            self._dispatch()

        def do_POST(self):
            n = int(self.headers.get("Content-Length") or 0)
            try:
                payload = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError as exc:
                return self._json({"error": f"bad JSON body: {exc}"}, 400)
            self._dispatch(payload)

    return Handler


def serve(app: ShowApp, host: str = "127.0.0.1", port: int = 8080,
          background: bool = False) -> ThreadingHTTPServer:
    """Run the viewer. ``background=True`` serves from a daemon thread
    and returns the server (tests / embedding); otherwise blocks."""
    httpd = ThreadingHTTPServer((host, port), _make_handler(app))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    try:
        print(f"serving on http://{host}:{httpd.server_address[1]}/ "
              f"({len(app.seg_ids)} segments; Ctrl-C to stop)")
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
    return httpd
