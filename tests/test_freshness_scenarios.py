"""Freshness monitor scenario fixtures, ported from the reference's
`tests/unit/common/test_freshness_scenarios.py` + `conftest.py:44-170`
(no-exclusion variants — the pure threshold path, no schedule inference
dependency): iterate a synthetic observation series, calling
compute_freshness_threshold with growing history, and assert outcomes at
checkpoints."""

from __future__ import annotations

import datetime as dt
from typing import NamedTuple

import pandas as pd
import pytest

from dataops_testgen_spark.prediction.freshness import (
    compute_freshness_threshold,
    count_excluded_minutes,
)


class Point(NamedTuple):
    timestamp: pd.Timestamp
    value: float
    lower: float | None
    upper: float | None
    staleness: float | None
    result_code: int     # -1 training, 1 passed, 0 failed
    result_status: str


def _make_observations(start, end, interval_hours, update_times):
    rows = []
    last_update = None
    current = start
    while current <= end:
        if current in update_times:
            rows.append((pd.Timestamp(current), 0.0))
            last_update = current
        elif last_update is not None:
            minutes = (current - last_update).total_seconds() / 60
            rows.append((pd.Timestamp(current), float(int(minutes))))
        current += dt.timedelta(hours=interval_hours)
    return rows


def _weekday_updates(hour, start, end, skip_dates=None):
    updates = set()
    d = start.replace(hour=0, minute=0, second=0)
    while d <= end:
        if d.weekday() < 5 and (skip_dates is None or d.date() not in skip_dates):
            updates.add(d.replace(hour=hour, minute=0, second=0))
        d += dt.timedelta(days=1)
    return updates


def _evaluate(timestamp, value, lower, upper, staleness, last_update,
              exclude_weekends=False):
    """The 3-branch decision (reference conftest.py:67-130)."""
    effective_staleness = staleness if staleness is not None else upper
    if upper is None:
        return -1, "Log"
    if value == 0 and last_update is not None:
        gap = (timestamp - last_update).total_seconds() / 60
        if exclude_weekends:
            gap = max(gap - count_excluded_minutes(
                last_update, timestamp, True, None), 0)
        if (lower is not None and gap < lower) or gap > upper:
            return 0, "Failed"
        return 1, "Passed"
    if value > 0:
        if exclude_weekends and timestamp.weekday() >= 5:
            return 1, "Passed"
        excluded = (count_excluded_minutes(last_update, timestamp, True, None)
                    if exclude_weekends and last_update is not None else 0)
        if value - excluded > effective_staleness:
            return 0, "Failed"
        return 1, "Passed"
    return 1, "Passed"


def _run_scenario(rows, sensitivity="medium", exclude_weekends=False):
    results = []
    last_update = None
    for i, (timestamp, value) in enumerate(rows):
        hist = pd.DataFrame(rows[:i], columns=["timestamp", "value"]) \
            .set_index("timestamp")
        lower, upper, staleness, _pred = compute_freshness_threshold(
            hist, sensitivity, min_lookback=30,
            exclude_weekends=exclude_weekends)
        code, status = _evaluate(timestamp, value, lower, upper, staleness,
                                 last_update, exclude_weekends)
        results.append(Point(timestamp, value, lower, upper, staleness,
                             code, status))
        if value == 0:
            last_update = timestamp
    return results


def _gen_daily_regular():
    start = dt.datetime(2025, 10, 6, 7, 0)
    end = dt.datetime(2025, 11, 9, 19, 0)
    return _make_observations(start, end, 12, _weekday_updates(7, start, end))


def _gen_daily_late_gap_phase():
    start = dt.datetime(2025, 10, 6, 7, 0)
    end = dt.datetime(2025, 11, 16, 19, 0)
    skip = {dt.date(2025, 10, 29), dt.date(2025, 10, 30), dt.date(2025, 10, 31)}
    return _make_observations(start, end, 12,
                              _weekday_updates(7, start, end, skip_dates=skip))


def _gen_training_only():
    start = dt.datetime(2025, 10, 6, 7, 0)
    end = dt.datetime(2025, 11, 2, 19, 0)
    updates = {dt.datetime(2025, 10, 6, 7), dt.datetime(2025, 10, 13, 7),
               dt.datetime(2025, 10, 20, 7), dt.datetime(2025, 10, 27, 7)}
    return _make_observations(start, end, 12, updates)


def _gen_subdaily_regular():
    start = dt.datetime(2025, 10, 6, 0, 0)
    end = dt.datetime(2025, 11, 2, 23, 0)
    updates = set()
    d = start
    while d <= end:
        if d.weekday() < 5:
            for h in range(8, 19, 2):
                updates.add(d.replace(hour=h))
        d += dt.timedelta(days=1)
    return _make_observations(start, end, 1, updates)


def _anomalies(results):
    return [p for p in results if p.result_code == 0]


class Test_DailyRegular:
    """Scenario 1: daily weekday updates at 07:00, 5 weeks — happy path."""

    @pytest.fixture(scope="class")
    def results(self):
        return _run_scenario(_gen_daily_regular())

    def test_training_exits(self, results):
        updates = [p for p in results if p.value == 0]
        first = next((i for i, p in enumerate(updates) if p.upper is not None),
                     None)
        assert first is not None
        assert 6 <= first <= 16

    def test_zero_anomalies(self, results):
        assert len(_anomalies(results)) == 0

    def test_thresholds_positive_after_training(self, results):
        post = [p for p in results if p.upper is not None]
        assert post and all(p.upper > 0 for p in post)


class Test_DailyLateGapPhase:
    """Scenario 2a: 3-day outage (Oct 29-31) during the gap phase."""

    @pytest.fixture(scope="class")
    def results(self):
        return _run_scenario(_gen_daily_late_gap_phase())

    def test_anomaly_detected_during_outage(self, results):
        outage_start = pd.Timestamp("2025-10-29")
        recovery = pd.Timestamp("2025-11-03 19:00")
        hits = [p for p in _anomalies(results)
                if outage_start <= p.timestamp <= recovery]
        assert len(hits) > 0

    def test_recovery_no_lasting_anomalies(self, results):
        # after the Monday recovery update is absorbed, checks pass again
        after = pd.Timestamp("2025-11-04 07:00")
        late = [p for p in _anomalies(results) if p.timestamp >= after]
        assert late == []


class Test_TrainingOnly:
    """Scenario: only 4 weekly updates — never enough gaps to leave
    training (reference Test_TrainingOnly)."""

    def test_stays_in_training(self):
        results = _run_scenario(_gen_training_only())
        assert all(p.result_code == -1 for p in results)


class Test_SubdailyRegular:
    """Scenario 3: every-2-hours weekday updates with weekends excluded —
    no anomalies (reference results_excl variant)."""

    def test_zero_anomalies(self):
        results = _run_scenario(_gen_subdaily_regular(),
                                exclude_weekends=True)
        assert len(_anomalies(results)) == 0
        assert any(p.upper is not None for p in results)
