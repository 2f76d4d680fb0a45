"""Real-protocol enrichment tests (VERDICT r2 item 2): drive the
mapInPandas enrichment boundary through actual sockets against an
in-process HTTP server, proving the reference's operational semantics —
10 s-style timeout (`consumer/consume_items.py:71`), non-200 → drop
(`consume_items.py:73-77`), bounded retry (`produce_items.py:53-56`) —
without touching the deterministic stub path the oracles use.

The server runs in a daemon thread in the driver process; executor Python
workers reach it over localhost sockets, so the requests observed here
crossed a real process boundary exactly like production HTTP.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

import pytest
from pyspark.sql import functions as F

from hybrid_nutrition_data_pipeline_batch_streaming_spark.functions.enrichment import (
    enrich_from_api,
    http_nutrition_lookup,
)


class _NutritionHandler(BaseHTTPRequestHandler):
    """Behavior is keyed by the item name:

    - names containing ``bad``   → 500 (definitive answer: drop, no retry)
    - names containing ``slow``  → sleep past the client timeout
    - names containing ``flaky`` → fail the FIRST attempt per name
      (connection abort), succeed afterwards — the retry-success case
    - names containing ``limit`` → 429 for the first TWO attempts, then 200
      — the rate-limit/backoff case
    - anything else              → 200 with a reference-shaped JSON array
    """

    attempts: dict[str, int] = {}
    lock = threading.Lock()
    sleep_s = 2.0

    def do_GET(self):  # noqa: N802 (http.server API)
        name = parse_qs(urlsplit(self.path).query).get("query", [""])[0]
        with self.lock:
            n = self.attempts[name] = self.attempts.get(name, 0) + 1
        if "bad" in name:
            self.send_error(500, "upstream exploded")
            return
        if "slow" in name:
            time.sleep(self.sleep_s)
        if "limit" in name and n <= 2:
            self.send_error(429, "rate limited")
            return
        if "flaky" in name and n == 1:
            # Abort mid-request: the client sees a transport error, which is
            # the retryable class (vs the non-200 definitive class).
            self.connection.close()
            return
        body = json.dumps(
            [{"name": name, "calories": float(len(name)), "serving_size_g": 100.0}]
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture()
def api_server():
    _NutritionHandler.attempts = {}
    server = ThreadingHTTPServer(("127.0.0.1", 0), _NutritionHandler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}/nutrition"
    finally:
        server.shutdown()
        server.server_close()


def _enrich(spark, url, names, **kw):
    df = spark.createDataFrame([(n,) for n in names], "item_name string")
    lookup = http_nutrition_lookup(url, **kw)
    return {
        r.item_name: r.data
        for r in enrich_from_api(df, lookup=lookup).collect()
    }


def test_http_enrichment_round_trip(spark, api_server):
    """Happy path: real GETs from executor workers, reference-shaped JSON
    back, one row per input — the stub path's contract over live sockets."""
    out = _enrich(spark, api_server, ["kale salad", "bean stew"], timeout_s=5.0)
    assert set(out) == {"kale salad", "bean stew"}
    parsed = json.loads(out["kale salad"])
    assert parsed[0]["name"] == "kale salad"
    assert parsed[0]["calories"] == float(len("kale salad"))


def test_http_enrichment_non_200_drops_row_not_stage(spark, api_server):
    """A 500 answer nulls that row's data (the reference drops the item,
    `consume_items.py:73-77`) without retrying a definitive answer, and the
    REST of the batch still enriches — partial-batch failure never kills
    the stage."""
    out = _enrich(
        spark, api_server, ["good soup", "bad soup", "fine stew"], timeout_s=5.0
    )
    assert out["bad soup"] is None
    assert out["good soup"] is not None and out["fine stew"] is not None
    # Non-200 is definitive: exactly one attempt reached the server.
    assert _NutritionHandler.attempts["bad soup"] == 1
    # The downstream P3 empty-filter is what physically drops the row.
    df = spark.createDataFrame(
        [(k, v) for k, v in out.items()], "item_name string, data string"
    )
    kept = {r.item_name for r in df.where(F.col("data").isNotNull()).collect()}
    assert kept == {"good soup", "fine stew"}


def test_http_enrichment_timeout_bounded_then_drop(spark, api_server):
    """A hung upstream trips the client timeout; after the bounded retries
    the row drops instead of wedging the executor."""
    _NutritionHandler.sleep_s = 1.0
    out = _enrich(
        spark, api_server, ["slow roast", "quick dip"],
        timeout_s=0.2, retries=1,
    )
    assert out["slow roast"] is None  # timed out on both attempts → dropped
    assert out["quick dip"] is not None
    assert _NutritionHandler.attempts["slow roast"] == 2  # 1 try + 1 retry


def test_http_enrichment_transport_error_retries_then_succeeds(spark, api_server):
    """A connection abort (vs a non-200 answer) is the retryable class: the
    bounded retry re-opens the socket and the SAME row succeeds on the
    second attempt — the reference producer's ≤5-attempt loop semantics."""
    out = _enrich(spark, api_server, ["flaky bread"], timeout_s=5.0, retries=2)
    assert out["flaky bread"] is not None
    assert json.loads(out["flaky bread"])[0]["name"] == "flaky bread"
    assert _NutritionHandler.attempts["flaky bread"] == 2  # failed once, then OK


def test_http_enrichment_exhausted_retries_drop_only_that_row(spark, api_server):
    """Retries are BOUNDED: with retries=0 a first-attempt abort drops the
    row (no infinite loop), neighbors unaffected."""
    out = _enrich(
        spark, api_server, ["flaky scone", "solid oat"], timeout_s=5.0, retries=0
    )
    assert out["flaky scone"] is None
    assert out["solid oat"] is not None
    assert _NutritionHandler.attempts["flaky scone"] == 1


def test_http_enrichment_rate_limit_backoff_then_succeeds(spark, api_server):
    """429 is the retryable-with-pause class (the reference's OpenAI pacing,
    `dagster_project/pipeline.py:59-74`): the row retries after a linear
    backoff and succeeds on the attempt the upstream stops pushing back;
    with retries exhausted the row drops like any other failure."""
    out = _enrich(
        spark, api_server, ["limit smoothie"], timeout_s=5.0, retries=3,
        backoff_s=0.05,
    )
    assert out["limit smoothie"] is not None
    assert json.loads(out["limit smoothie"])[0]["name"] == "limit smoothie"
    assert _NutritionHandler.attempts["limit smoothie"] == 3  # 429, 429, 200

    out2 = _enrich(
        spark, api_server, ["limit juice"], timeout_s=5.0, retries=1,
        backoff_s=0.01,
    )
    assert out2["limit juice"] is None  # 2 attempts, both 429 → dropped
    assert _NutritionHandler.attempts["limit juice"] == 2
