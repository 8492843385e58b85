"""Observability export batching + cron scheduler tests
(ref run_observability_exporter.py:26-69, scheduler/base.py:1-120)."""

import datetime as dt

import pytest

from dataops_testgen_spark import observability as OBS
from dataops_testgen_spark.scheduler import (
    Cron, DelayedPolicy, Job, Scheduler)


def test_chunk_size_caps_at_500():
    outcomes = [{"test_id": str(i)} for i in range(2000)]
    assert OBS.calculate_chunk_size(outcomes) == 500


def test_chunk_size_scales_with_payload_bytes():
    big = [{"test_id": str(i), "result_message": "x" * 2000}
           for i in range(100)]
    cs = OBS.calculate_chunk_size(big)
    # 100 items x ~2KB = ~200KB json -> split into ~4 chunks of ~25
    assert 1 <= cs < 50


def test_post_event_batches(spark):
    rows = [(f"t{i}", "Row_Ct", "t", None, "Passed", None, 1.0, "0")
            for i in range(1203)]
    df = spark.createDataFrame(
        rows, "test_id string, test_type string, table_name string,"
              " column_name string, result_status string,"
              " result_message string, result_measure double,"
              " threshold_value string")
    sent = []
    n = OBS.export_test_results(df, "ds1", sent.append, run_date="2026-01-01")
    assert n == 1203
    assert sum(len(b["test_outcomes"]) for b in sent) == 1203
    assert all(len(b["test_outcomes"]) <= 500 for b in sent)
    assert all(b["dataset_key"] == "ds1" for b in sent)
    assert sent[0]["test_outcomes"][0]["type"] == "Row_Ct"


def test_mark_exported(spark):
    df = spark.createDataFrame([("a",), ("b",)], "test_id string")
    out = OBS.mark_exported(df)
    assert {r["observability_status"] for r in out.collect()} == {"Sent"}


def test_cron_parse_and_next():
    c = Cron("*/15 2 * * *")
    t = dt.datetime(2026, 1, 1, 1, 50)
    assert c.next_after(t) == dt.datetime(2026, 1, 1, 2, 0)
    assert c.next_after(dt.datetime(2026, 1, 1, 2, 0)) == dt.datetime(2026, 1, 1, 2, 15)
    # day-of-week: 0 = Sunday
    sun = Cron("0 9 * * 0")
    nxt = sun.next_after(dt.datetime(2026, 1, 1, 0, 0))  # Thu Jan 1 2026
    assert nxt == dt.datetime(2026, 1, 4, 9, 0)
    with pytest.raises(ValueError):
        Cron("* * * *")


def test_scheduler_policies():
    ran = []
    jobs = [
        Job("*/10 * * * *", lambda: ran.append("skip"), name="skip",
            delayed_policy=DelayedPolicy.SKIP),
        Job("*/10 * * * *", lambda: ran.append("all"), name="all",
            delayed_policy=DelayedPolicy.ALL),
        Job("*/10 * * * *", lambda: ran.append("once"), name="once",
            delayed_policy=DelayedPolicy.ONCE),
    ]
    s = Scheduler(jobs)
    base = dt.datetime(2026, 1, 1, 0, 0)
    # 35 minutes late -> 3 firings missed (00:10, 00:20, 00:30), none of
    # them still current -> SKIP drops ALL of them (scheduler/base.py:94-98)
    fired = s.run_pending(base, base + dt.timedelta(minutes=35))
    import time
    time.sleep(0.5)
    assert fired == 4  # SKIP->0, ALL->3, ONCE->1 (first)
    assert ran.count("skip") == 0 and ran.count("all") == 3 and ran.count("once") == 1
    # an on-time trigger (within the poll window of `until`) still fires
    ran.clear()
    s2 = Scheduler([Job("*/10 * * * *", lambda: ran.append("skip"),
                        name="skip", delayed_policy=DelayedPolicy.SKIP)])
    fired2 = s2.run_pending(base, base + dt.timedelta(minutes=10))
    time.sleep(0.3)
    assert fired2 == 1 and ran == ["skip"]


def test_cron_step_anchor_and_dow_or():
    # stepped range anchors at the range start: 12-30/5 -> 12,17,22,27
    c = Cron("12-30/5 * * * *")
    assert c.minutes == {12, 17, 22, 27}
    # both day fields restricted -> OR semantics (standard cron):
    # "0 0 13 * 5" fires on the 13th AND on every Friday
    c2 = Cron("0 0 13 * 5")
    assert c2.matches(dt.datetime(2026, 2, 13, 0, 0))   # Fri the 13th
    assert c2.matches(dt.datetime(2026, 2, 6, 0, 0))    # a Friday, not 13th
    assert c2.matches(dt.datetime(2026, 3, 13, 0, 0))   # 13th, a Friday
    assert c2.matches(dt.datetime(2026, 4, 13, 0, 0))   # 13th, a Monday
    assert not c2.matches(dt.datetime(2026, 2, 12, 0, 0))
    # one day field unrestricted -> AND semantics
    c3 = Cron("0 0 * * 5")
    assert c3.matches(dt.datetime(2026, 2, 6, 0, 0))
    assert not c3.matches(dt.datetime(2026, 2, 5, 0, 0))


def test_cron_dow_seven_is_sunday():
    # standard cron accepts 7 as an alias for Sunday (0)
    c = Cron("0 9 * * 7")
    assert c.dow == {0}
    sun = dt.datetime(2026, 8, 16, 9, 0)  # a Sunday
    assert c.matches(sun)
    assert not c.matches(sun + dt.timedelta(days=1))
    # next_after from a Saturday lands on Sunday 09:00, not ValueError
    assert c.next_after(dt.datetime(2026, 8, 15, 12, 0)) == sun
    # ranges spanning the wrap: 5-7 = Fri, Sat, Sun
    assert Cron("0 0 * * 5-7").dow == {5, 6, 0}


def test_http_sender_wire_format():
    """http_sender builds the reference's endpoint + auth header
    (run_observability_exporter.py:53-60) and raises on non-2xx; the
    opener is injected so no egress happens."""
    import json as _json

    import pytest as _pytest

    seen = []

    class _Resp:
        status = 200

    def fake_open(req):
        seen.append(req)
        return _Resp()

    post = OBS.http_sender("https://obs.example.com/api", "sekret",
                           opener=fake_open)
    post({"project": "p1", "test_outcomes": [{"id": 1}]})
    assert len(seen) == 1
    req = seen[0]
    assert req.full_url == \
        "https://obs.example.com/api/events/v1/test_results"
    assert req.get_header("Serviceaccountauthenticationkey") == "sekret"
    body = _json.loads(req.data.decode())
    assert body["test_outcomes"] == [{"id": 1}]

    class _Bad:
        status = 422

    post_bad = OBS.http_sender("https://x.example/", "k",
                               opener=lambda r: _Bad())
    with _pytest.raises(RuntimeError, match="422"):
        post_bad({})
    with _pytest.raises(ValueError):
        OBS.http_sender("", "k")


def test_http_sender_as_export_transport(spark):
    """The sender plugs into export_test_results as the transport —
    chunking and payload assembly are unchanged."""
    rows = [(f"t{i}", "Condition_Flag", "orders", "o_x", "Passed", "", 1.0,
             "0") for i in range(7)]
    df = spark.createDataFrame(
        rows, "test_id string, test_type string, table_name string, "
              "column_name string, result_status string, result_message "
              "string, result_measure double, threshold_value string")
    sent = []

    class _Resp:
        status = 200

    post = OBS.http_sender("http://localhost:1/x", "k",
                           opener=lambda r: sent.append(r) or _Resp())
    n = OBS.export_test_results(df, "suite-key", post)
    assert n == 7 and len(sent) >= 1
