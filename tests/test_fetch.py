"""Unit tests for the concurrent fetch operator: error-tuple contract,
retry-with-backoff on throttle codes, POST bodies. Transports are shipped
to executors (pickled): no locks/driver-side state — each url is handled
by exactly one thread per retry round, so the per-url counter is safe."""

from __future__ import annotations

from stream2segment_spark.sources.fetch import fetch_rows


class Flaky:
    """Transport that throttles each url a configurable number of times."""

    def __init__(self, fail_times=2, code=429):
        self.fail_times = fail_times
        self.code = code
        self.calls = {}

    def __call__(self, url, body):
        n = self.calls[url] = self.calls.get(url, 0) + 1
        if n <= self.fail_times:
            return None, self.code
        return f"ok:{url}:{n}".encode(), 200


def test_retry_succeeds_after_throttle(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(6)], "url string")
    tp = Flaky(fail_times=2)
    out = fetch_rows(df, transport=tp, threads=4, max_attempts=3,
                     backoff_sec=0.0).collect()
    assert all(r["code"] == 200 for r in out)
    assert all(bytes(r["data"]).startswith(b"ok:") for r in out)


def test_retry_gives_up_at_max_attempts(spark):
    df = spark.createDataFrame([("u0",)], "url string")
    tp = Flaky(fail_times=99, code=503)
    out = fetch_rows(df, transport=tp, threads=2, max_attempts=2,
                     backoff_sec=0.0).collect()
    assert out[0]["code"] == 503 and out[0]["data"] is None


def test_exception_becomes_error_row(spark):
    def tp(url, body):
        if url == "bad":
            raise ConnectionError("boom")
        return b"x", 200

    df = spark.createDataFrame([("bad",), ("good",)], "url string")
    rows = {r["url"]: r for r in fetch_rows(df, transport=tp).collect()}
    assert rows["bad"]["code"] == -1
    assert "ConnectionError" in rows["bad"]["error"]
    assert rows["good"]["code"] == 200 and rows["good"]["error"] is None


def test_post_body_column(spark):
    # the transport runs on executors: assert via the ECHOED body, not
    # driver-side state
    def tp(url, body):
        return (b"body=" + bytes(body)) if body is not None else b"nobody", 200

    df = spark.createDataFrame(
        [("u1", bytearray(b"payload1")), ("u2", None)],
        "url string, body binary")
    rows = {r["url"]: bytes(r["data"]) for r in
            fetch_rows(df, url_col="url", body_col="body", transport=tp).collect()}
    assert rows == {"u1": b"body=payload1", "u2": b"nobody"}
