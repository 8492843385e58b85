"""Observability event export.

Reference shape (`commands/run_observability_exporter.py:26-33,36-69` +
`template/observability/get_test_results.sql:1-38`):

- collect queued test results as test-outcome dicts (one per result row,
  with type / status / thresholds / timestamps / dimension);
- split into chunks sized by BOTH limits — ≤500 items per payload and a
  payload-size heuristic targeting ~50 KB of JSON per chunk;
- POST each chunk as one event payload; afterwards mark the results sent.

Spark-first: results stay a DataFrame until the bounded, queued slice is
collected; the transport is a callable so the engine has no network
dependency (tests inject a recorder; production would wire an HTTP POST).
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_MAX_SIZE = 100_000
PAYLOAD_MAX_ITEMS = 500

# v_queued_observability_results columns re-expressed over the repo's
# test-results schema (060_create_standard_views.sql:36-103)
_OUTCOME_FIELDS = ("test_id", "test_type", "table_name", "column_name",
                   "result_status", "result_message", "result_measure",
                   "threshold_value")


def calculate_chunk_size(test_outcomes: list[dict]) -> int:
    """run_observability_exporter.py:29-33: chunk count targets ~50 KB of
    JSON per chunk, capped at PAYLOAD_MAX_ITEMS items."""
    if not test_outcomes:
        return PAYLOAD_MAX_ITEMS
    size = len(json.dumps(test_outcomes, default=str))
    split = size / PAYLOAD_MAX_SIZE * 2
    chunk_size = int(round(len(test_outcomes) / split)) if split > 0 else len(test_outcomes)
    return max(1, min(PAYLOAD_MAX_ITEMS, chunk_size))


def collect_test_outcomes(results: DataFrame,
                          run_date: str | None = None,
                          dq_dimensions: dict[str, str] | None = None,
                          max_events: int | None = None) -> list[dict]:
    """Queued test results → outcome dicts (get_test_results.sql:1-38
    projection, ordered, LIMIT :MAX_QTY_EVENTS)."""
    df = results.select(*[c for c in _OUTCOME_FIELDS if c in results.columns])
    df = df.orderBy("table_name", "column_name", "test_id")
    if max_events:
        df = df.limit(max_events)
    out = []
    for r in df.collect():
        d = r.asDict()
        d["type"] = d.pop("test_type", None)
        d["dq_dimension"] = (dq_dimensions or {}).get(d["type"])
        d["start_time"] = run_date
        out.append(d)
    return out


def build_event_payload(dataset_key: str, dataset_name: str,
                        component_tool: str = "spark",
                        event_timestamp: str | None = None) -> dict:
    """The per-event envelope (_get_event_data, :147-199), minus the
    Postgres-app metadata that has no analogue here."""
    return {
        "component_type": "dataset",
        "component_tool": component_tool,
        "dataset_key": dataset_key,
        "dataset_name": dataset_name,
        "event_timestamp": event_timestamp
        or _dt.datetime.now(_dt.timezone.utc).isoformat(),
        "metadata": {},
        "external_url": None,
        "stream_name": None, "run_key": None, "server_name": None,
        "task_name": None, "pipeline_key": None, "pipeline_name": None,
        "run_name": None, "task_key": None, "stream_key": None,
        "server_key": None,
    }


def post_event(payload: dict, test_outcomes: list[dict],
               post: Callable[[dict], None]) -> int:
    """post_event (:36-69): chunk outcomes, attach each chunk to a copy of
    the payload, hand to the transport. Returns the event count sent."""
    if not test_outcomes:
        return 0
    chunk_size = calculate_chunk_size(test_outcomes)
    for i in range(0, len(test_outcomes), chunk_size):
        chunk = test_outcomes[i:i + chunk_size]
        body = dict(payload)
        body["test_outcomes"] = chunk
        post(body)
    return len(test_outcomes)


def export_test_results(results: DataFrame, dataset_key: str,
                        post: Callable[[dict], None],
                        run_date: str | None = None,
                        dq_dimensions: dict[str, str] | None = None) -> int:
    """End-to-end export: collect queued outcomes, batch, post. Returns the
    number of outcomes sent (0 → "Nothing to be sent")."""
    outcomes = collect_test_outcomes(results, run_date=run_date,
                                     dq_dimensions=dq_dimensions)
    payload = build_event_payload(dataset_key, dataset_key)
    return post_event(payload, outcomes, post)


def http_sender(api_url: str, api_key: str,
                event_type: str = "test_results",
                opener: Callable | None = None) -> Callable[[dict], None]:
    """Pluggable HTTP transport matching the reference's exporter wire
    format (`run_observability_exporter.py:36-76`): POST each chunk as
    JSON to ``{scheme}://{netloc}{path}/events/v1/{event_type}`` with the
    ``ServiceAccountAuthenticationKey`` header; non-2xx raises. Built on
    stdlib urllib (no client dependency); ``opener`` is injectable for
    tests and for environments (like this sandbox) with no egress — the
    JSONL file export in __main__.py remains the default transport."""
    import urllib.parse
    import urllib.request

    if not api_url:
        raise ValueError("Unable to post events: misconfigured "
                         "Observability API URL")
    parsed = urllib.parse.urlparse(api_url)
    url = f"{parsed.scheme}://{parsed.netloc}{parsed.path}/events/v1/{event_type}"
    open_fn = opener or urllib.request.urlopen

    def post(payload: dict) -> None:
        req = urllib.request.Request(
            url, data=json.dumps(payload, default=str).encode(),
            headers={"Content-Type": "application/json",
                     "ServiceAccountAuthenticationKey": api_key},
            method="POST")
        resp = open_fn(req)
        status = getattr(resp, "status", 200)
        if not 200 <= status < 300:
            raise RuntimeError(
                f"Call to {url} failed with status code: {status}")

    return post


def mark_exported(results: DataFrame) -> DataFrame:
    """update_test_results_exported_to_observability.sql: flip the queued
    status after a successful export."""
    if "observability_status" not in results.columns:
        results = results.withColumn("observability_status",
                                     F.lit("Queued"))
    return results.withColumn(
        "observability_status",
        F.when(F.col("observability_status") == "Queued", F.lit("Sent"))
        .otherwise(F.col("observability_status")))
