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


def test_preprocess_toggle_e2e(spark, segs):
    """The reference GUI's @gui.preprocess on-demand toggle
    (core.py:240-415): ?preprocess=1 runs every producer on the
    preprocess output; raw requests are untouched; a missing preprocess
    function is a clean 400; preprocess errors become the plot label."""
    from stream2segment_spark.plots import (
        collect_custom_specs, collect_preprocess, segment_plot,
        segment_preprocess)

    class Mod:  # stand-in for an imported -p module
        @staticmethod
        @segment_preprocess
        def squared(samples, delta):
            return samples * samples        # strictly >= 0

        @staticmethod
        @segment_plot(label="envelope")
        def env(samples, delta):
            return np.abs(samples)

    pre = collect_preprocess(Mod)
    specs = collect_custom_specs(Mod)
    assert pre is not None and set(specs) == {"envelope"}

    app = ShowApp(segs, plots=("trace", "envelope"),
                  extra_specs=specs, preprocess_fn=pre)
    httpd = serve(app, port=0, background=True)
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        assert _get(base + "/api/init")["has_preprocess"] is True
        raw = _get(base + "/api/segment/0")
        pp = _get(base + "/api/segment/0?preprocess=1")
        assert raw["preprocessed"] is False and pp["preprocessed"] is True
        # the sine trace spans negatives raw, is non-negative squared —
        # different payloads, and BOTH the builtin and custom producers
        # saw the preprocessed samples
        assert min(raw["plots"]["trace"]["y"]) < 0
        assert min(pp["plots"]["trace"]["y"]) >= 0
        assert pp["plots"]["trace"]["y"] != raw["plots"]["trace"]["y"]
        assert pp["plots"]["envelope"]["y"] != raw["plots"]["envelope"]["y"]
        # toggling back returns the raw view (nothing cached/mutated)
        again = _get(base + "/api/segment/0")
        assert again["plots"]["trace"]["y"] == raw["plots"]["trace"]["y"]
    finally:
        httpd.server_close()

    # no @segment_preprocess loaded -> clean JSON 400, not a traceback
    app2 = ShowApp(segs)
    httpd = serve(app2, port=0, background=True)
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        assert _get(base + "/api/init")["has_preprocess"] is False
        import urllib.error
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(base + "/api/segment/0?preprocess=1")
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert "preprocess" in body["error"]
    finally:
        httpd.server_close()


def test_preprocess_error_becomes_plot_label(spark, segs):
    """A raising preprocess function yields an error-string plot payload
    (reference core.py:398-405 wraps @gui.preprocess exceptions), not a
    failed request."""
    def bad(samples, delta):
        raise RuntimeError("boom")

    app = ShowApp(segs, preprocess_fn=bad)
    d = app.segment_data(0, preprocessed=True)
    tr = d["plots"]["trace"]
    assert tr["y"] is None
    assert "(@preprocess)" in tr["label"] and "boom" in tr["label"]
