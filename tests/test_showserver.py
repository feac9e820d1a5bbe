"""Interactive 's2s show --serve' e2e: select segment -> plot JSON ->
class-label write -> warehouse row (the reference GUI loop,
process/gui/webapp/mainapp/views.py:34-115, over stdlib http.server)."""

from __future__ import annotations

import json
import urllib.request

import numpy as np
import pytest

from stream2segment_spark import warehouse as WH
from stream2segment_spark.showserver import ShowApp, serve


@pytest.fixture(scope="module")
def segs(spark):
    t = np.arange(256) * 0.01
    rows = [(i, [float(v) for v in np.sin(2 * np.pi * (i + 1) * t)],
             0.01, f"GE.APE..BH{'ZNE'[i]}") for i in range(3)]
    return spark.createDataFrame(
        rows, "id long, samples array<double>, delta double, seed_id string")


@pytest.fixture()
def wh_dir(tmp_path):
    wh = tmp_path / "wh"
    wh.mkdir()
    WH.classlabels(str(wh), add={"Ok": "good segment",
                                 "LowS2N": "noisy"})
    return str(wh)


def _get(url):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_show_app_data_layer(spark, segs, wh_dir):
    app = ShowApp(segs, warehouse=wh_dir, annotator="tester")
    init = app.init_data()
    assert init["num_segments"] == 3
    assert set(init["classes"]) == {"Ok", "LowS2N"}
    d = app.segment_data(1)
    assert d["segment_id"] == 1 and d["seed_id"] == "GE.APE..BHN"
    assert set(d["plots"]) == {"trace", "cumulative", "spectrum"}
    tr = d["plots"]["trace"]
    assert tr["n_raw"] == 256 and len(tr["y"]) >= 2
    assert d["labels"] == []
    with pytest.raises(IndexError):
        app.segment_data(3)


def test_show_server_e2e_label_roundtrip(spark, segs, wh_dir):
    app = ShowApp(segs, warehouse=wh_dir, annotator="tester")
    httpd = serve(app, port=0, background=True)
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        # the browser page itself
        with urllib.request.urlopen(base + "/") as r:
            page = r.read().decode()
        assert "s2s show" in page and "/api/segment/" in page
        init = _get(base + "/api/init")
        assert init["num_segments"] == 3
        # select segment -> plot JSON
        d = _get(base + "/api/segment/0")
        assert d["segment_id"] == 0
        assert d["plots"]["trace"]["n_raw"] == 256
        # per-request plot selection (the reference's plot_names field)
        d1 = _get(base + "/api/segment/0?plots=trace")
        assert set(d1["plots"]) == {"trace"}
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/api/segment/0?plots=nope")
        assert ei.value.code == 400
        # label write through the API...
        out = _post(base + "/api/segment/0/class",
                    {"label": "Ok", "value": True})
        assert out == {"segment_id": 0, "labels": ["Ok"]}
        # ...lands as a queryable warehouse row with the annotator
        rows = WH.labellings(wh_dir, 0)
        assert len(rows) == 1
        assert rows[0]["is_hand_labelled"] is True
        assert rows[0]["annotator"] == "tester"
        # visible on re-read, then toggle off
        assert _get(base + "/api/segment/0")["labels"] == ["Ok"]
        out = _post(base + "/api/segment/0/class",
                    {"label": "Ok", "value": False})
        assert out["labels"] == []
        assert WH.labellings(wh_dir, 0) == []
        # unknown label -> 400 with a message
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/api/segment/0/class",
                  {"label": "Nope", "value": True})
        assert ei.value.code == 400
        # bad index -> 400, bad route -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/api/segment/99")
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/api/nope")
        assert ei.value.code == 404
        # GET to the POST-only class route: JSON 400, not a dropped
        # connection (payload is None -> TypeError caught)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/api/segment/0/class")
        assert ei.value.code == 400
        # malformed JSON body: 400 with a message
        req = urllib.request.Request(
            base + "/api/segment/0/class", data=b"{not json",
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_labelling_counts_queryable_from_spark(spark, segs, wh_dir):
    """The GUI's label writes feed the J9 class-label count query."""
    WH.set_labelling(wh_dir, 0, "Ok", True, annotator="a")
    WH.set_labelling(wh_dir, 1, "Ok", True, annotator="b")
    WH.set_labelling(wh_dir, 1, "LowS2N", True, annotator="b")
    ll = spark.read.parquet(f"{wh_dir}/class_labellings.parquet")
    cl = spark.read.parquet(f"{wh_dir}/class_labels.parquet")
    counts = {r["label"]: r["n"] for r in
              ll.join(cl, ll.class_id == cl.id)
                .groupBy("label").count().withColumnRenamed("count", "n")
                .collect()}
    assert counts == {"Ok": 2, "LowS2N": 1}


def test_show_server_live_selection(spark, segs, wh_dir):
    """POST /api/selection re-runs the selection (reference
    set_selection): the navigation array shrinks/grows, out-of-range
    indices 400, empty selections are rejected."""
    from pyspark.sql import functions as F

    def select_fn(conditions):
        df = segs
        if conditions.get("id"):       # toy grammar: '<N' only
            df = df.filter(F.col("id") < int(conditions["id"][1:]))
        return df

    app = ShowApp(segs, warehouse=wh_dir, select_fn=select_fn)
    httpd = serve(app, port=0, background=True)
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        assert _get(base + "/api/init")["num_segments"] == 3
        out = _post(base + "/api/selection", {"id": "<2"})
        assert out == {"num_segments": 2}
        assert _get(base + "/api/init")["num_segments"] == 2
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/api/segment/2")      # now out of range
        assert ei.value.code == 400
        # empty selection rejected, state unchanged
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/api/selection", {"id": "<0"})
        assert ei.value.code == 400
        assert _get(base + "/api/init")["num_segments"] == 2
        # reset to everything (blank conditions are stripped)
        out = _post(base + "/api/selection", {"id": "  "})
        assert out == {"num_segments": 3}
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_show_app_without_hook_rejects_selection(spark, segs):
    app = ShowApp(segs)
    with pytest.raises(ValueError, match="no live-selection hook"):
        app.set_selection({"id": "<2"})
