"""Freshness gap thresholds + update-schedule inference.

Re-expresses `common/freshness_service.py:39-565` and the orchestration of
`commands/test_thresholds_prediction.py:153-260`. All constants and band
boundaries are the reference's; timezone handling accepts naive-UTC
timestamps and an IANA tz for local day/hour analysis. Holiday calendars
(the ``holidays`` package) are not available in this environment — the
``holiday_dates`` parameter accepts an explicit set instead.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, replace
from datetime import date

import numpy as np
import pandas as pd

from dataops_testgen_spark.prediction.forecast import NotEnoughData

MIN_FRESHNESS_GAPS = 5    # freshness_service.py:16
MAX_FRESHNESS_GAPS = 40   # freshness_service.py:19

# test_thresholds_prediction.py:45-61
FRESHNESS_THRESHOLD_MAP = {          # upper_pct, floor_mult, lower_pct
    "high": (80, 1.0, 20),
    "medium": (95, 1.25, 10),
    "low": (99, 1.5, 5),
}
SCHEDULE_DEADLINE_BUFFER_HOURS = {"high": 1.5, "medium": 3.0, "low": 5.0}
STALENESS_FACTOR_MAP = {"high": 0.75, "medium": 0.85, "low": 0.95}


@dataclass(frozen=True)
class FreshnessThreshold:
    lower: float | None
    upper: float
    staleness: float
    last_update: pd.Timestamp


@dataclass(frozen=True)
class InferredSchedule:
    frequency: str
    active_days: frozenset[int]
    window_start: float | None
    window_end: float | None
    confidence: float
    num_events: int
    stage: str


def _to_local(ts: pd.Timestamp, tz: str | None) -> pd.Timestamp:
    if tz is None:
        return ts
    if ts.tzinfo is None:
        ts = ts.tz_localize("UTC")
    return ts.tz_convert(tz)


def _is_in_time_window(hour: float, start: float, end: float) -> bool:
    if start <= end:
        return start <= hour <= end
    return hour >= start or hour <= end  # midnight wrap


def count_excluded_minutes(
    start: pd.Timestamp, end: pd.Timestamp,
    exclude_weekends: bool, holiday_dates: set[date] | None,
    tz: str | None = None, excluded_days: frozenset[int] | None = None,
    window_start: float | None = None, window_end: float | None = None,
) -> float:
    """Minutes within [start, end) on excluded days / outside the update
    window (freshness_service.py:200-281, day-granular approximation)."""
    total = 0.0
    cur = _to_local(start, tz)
    end_l = _to_local(end, tz)
    day = cur.normalize()
    while day < end_l:
        day_end = day + pd.Timedelta(days=1)
        seg_start = max(cur, day)
        seg_end = min(end_l, day_end)
        seg_minutes = (seg_end - seg_start).total_seconds() / 60.0
        wd = day.weekday()
        excluded = False
        if exclude_weekends and wd >= 5:
            excluded = True
        if excluded_days is not None and wd in excluded_days:
            excluded = True
        if holiday_dates and day.date() in holiday_dates:
            excluded = True
        if excluded:
            total += seg_minutes
        elif window_start is not None and window_end is not None:
            # exclude minutes outside the update window on active days
            hours = np.arange(seg_start.hour + seg_start.minute / 60.0,
                              seg_start.hour + seg_start.minute / 60.0
                              + seg_minutes / 60.0, 1 / 60)
            outside = sum(1 for h in hours
                          if not _is_in_time_window(h % 24, window_start, window_end))
            total += outside  # one minute per outside sample
        day = day_end
    return min(total, (end_l - _to_local(start, tz)).total_seconds() / 60.0)


def get_freshness_gap_threshold(
    history: pd.DataFrame,
    upper_percentile: float = 95, floor_multiplier: float = 1.25,
    lower_percentile: float = 10, exclude_weekends: bool = False,
    holiday_dates: set[date] | None = None, tz: str | None = None,
    staleness_factor: float = 0.85,
    excluded_days: frozenset[int] | None = None,
    window_start: float | None = None, window_end: float | None = None,
) -> FreshnessThreshold:
    """Gap thresholds in business minutes (freshness_service.py:39-111).

    ``history``: DatetimeIndex + result_signal column where 0 marks an
    observed table update.
    """
    signal = history.iloc[:, 0]
    update_times = signal.index[signal == 0]
    if len(update_times) - 1 < MIN_FRESHNESS_GAPS:
        raise NotEnoughData(
            f"Need at least {MIN_FRESHNESS_GAPS} completed gaps, "
            f"found {max(len(update_times) - 1, 0)}.")

    has_exclusions = (exclude_weekends or holiday_dates or excluded_days
                      or (window_start is not None and window_end is not None))
    gaps = np.diff(update_times).astype("timedelta64[m]").astype(float)
    if has_exclusions:
        for i in range(len(gaps)):
            excl = count_excluded_minutes(
                update_times[i], update_times[i + 1], exclude_weekends,
                holiday_dates, tz=tz, excluded_days=excluded_days,
                window_start=window_start, window_end=window_end)
            gaps[i] = max(gaps[i] - excl, 0)

    if len(gaps) > MAX_FRESHNESS_GAPS:
        gaps = gaps[-MAX_FRESHNESS_GAPS:]

    upper = max(float(np.percentile(gaps, upper_percentile)),
                float(np.max(gaps)) * floor_multiplier)
    lower: float | None = float(np.percentile(gaps, lower_percentile))
    if lower <= 0:
        lower = None
    staleness = float(np.median(gaps)) * staleness_factor
    return FreshnessThreshold(lower=lower, upper=upper, staleness=staleness,
                              last_update=update_times[-1])


def classify_frequency(gaps_hours: np.ndarray) -> str:
    """sub_daily <6h | daily <36h | weekly 120-240h | irregular
    (freshness_service.py:369-402)."""
    if len(gaps_hours) == 0:
        return "irregular"
    median_gap = float(np.median(gaps_hours))
    if median_gap < 6:
        return "sub_daily"
    elif median_gap < 36:
        return "daily"
    elif 120 < median_gap < 240:
        return "weekly"
    return "irregular"


def detect_active_days(update_times: list[pd.Timestamp], tz: str | None,
                       min_weeks: int = 3) -> frozenset[int] | None:
    """Weekdays with ≥0.5 updates/observed-week hit rate (:404-436)."""
    if len(update_times) < 2:
        return None
    local = [_to_local(t, tz) for t in update_times]
    span_days = (local[-1] - local[0]).days
    if span_days < min_weeks * 7:
        return None
    day_counts: Counter[int] = Counter(t.weekday() for t in local)
    weeks = max(1, span_days // 7)
    active = {d for d in range(7) if day_counts.get(d, 0) / weeks >= 0.5}
    return frozenset(active) if active else None


def detect_update_window(update_times: list[pd.Timestamp],
                         active_days: frozenset[int],
                         tz: str | None) -> tuple[float, float] | None:
    """P10–P90 local update hours, midnight-wrap aware (:438-474)."""
    local = [_to_local(t, tz) for t in update_times]
    hours = [t.hour + t.minute / 60.0 for t in local if t.weekday() in active_days]
    if len(hours) < 10:
        return None
    late = sum(1 for h in hours if h >= 22) / len(hours)
    early = sum(1 for h in hours if h < 3) / len(hours)
    shifted = late > 0.25 and early > 0.25
    if shifted:
        hours = [(h + 12) % 24 for h in hours]
    p10, p90 = float(np.percentile(hours, 10)), float(np.percentile(hours, 90))
    if shifted:
        p10, p90 = (p10 - 12) % 24, (p90 - 12) % 24
    return (p10, p90)


def compute_schedule_confidence(update_times: list[pd.Timestamp],
                                schedule: InferredSchedule,
                                tz: str | None) -> float:
    """Fraction of updates matching active day + window (:476-500)."""
    if not update_times:
        return 0.0
    matching = 0
    for t in update_times:
        lt = _to_local(t, tz)
        if lt.weekday() not in schedule.active_days:
            continue
        if schedule.window_start is not None and schedule.window_end is not None:
            hour = lt.hour + lt.minute / 60.0
            if not _is_in_time_window(hour, schedule.window_start, schedule.window_end):
                continue
        matching += 1
    return matching / len(update_times)


def infer_schedule(history: pd.DataFrame, tz: str | None) -> InferredSchedule | None:
    """(:502-565) — None unless ≥10 events over ≥21 days; stage by
    confidence: ≥0.75 active, <0.60 irregular, else tentative (and
    tentative below 20 events)."""
    signal = history.iloc[:, 0]
    update_times = list(signal.index[signal == 0])
    if len(update_times) < 10:
        return None
    gaps_hours = np.diff(update_times).astype("timedelta64[m]").astype(float) / 60.0
    frequency = classify_frequency(gaps_hours)
    num_events = len(update_times)
    local = [_to_local(t, tz) for t in update_times]
    if (local[-1] - local[0]).days < 21 or num_events < 10:
        return None
    active_days = detect_active_days(update_times, tz) or frozenset(range(7))
    window = detect_update_window(update_times, active_days, tz)
    preliminary = InferredSchedule(
        frequency=frequency, active_days=active_days,
        window_start=window[0] if window else None,
        window_end=window[1] if window else None,
        confidence=0.0, num_events=num_events, stage="training",
    )
    confidence = compute_schedule_confidence(update_times, preliminary, tz)
    if num_events < 20:
        stage = "tentative"
    elif confidence >= 0.75:
        stage = "active"
    elif confidence < 0.60:
        stage = "irregular"
    else:
        stage = "tentative"
    return replace(preliminary, confidence=confidence, stage=stage)


def compute_freshness_threshold(
    history: pd.DataFrame, sensitivity: str = "medium",
    min_lookback: int = 1, exclude_weekends: bool = False,
    holiday_dates: set[date] | None = None, schedule_tz: str | None = None,
) -> tuple[float | None, float | None, float | None, dict | None]:
    """(lower, upper, staleness, prediction_data) in business minutes —
    orchestration of test_thresholds_prediction.py:153-260."""
    if len(history) < min_lookback:
        return None, None, None, None
    upper_pct, floor_mult, lower_pct = FRESHNESS_THRESHOLD_MAP[sensitivity]
    staleness_factor = STALENESS_FACTOR_MAP[sensitivity]
    try:
        result = get_freshness_gap_threshold(
            history, upper_percentile=upper_pct, floor_multiplier=floor_mult,
            lower_percentile=lower_pct, exclude_weekends=exclude_weekends,
            holiday_dates=holiday_dates, tz=schedule_tz,
            staleness_factor=staleness_factor)
    except NotEnoughData:
        return None, None, None, None

    lower, upper = result.lower, result.upper
    staleness: float | None = None
    prediction: dict = {}
    if not schedule_tz:
        return lower, upper, staleness, prediction

    schedule = infer_schedule(history, schedule_tz)
    if not schedule:
        return lower, upper, staleness, prediction

    prediction.update({
        "schedule_stage": schedule.stage,
        "frequency": schedule.frequency,
        "active_days": sorted(schedule.active_days) if schedule.active_days else None,
        "window_start": schedule.window_start,
        "window_end": schedule.window_end,
        "confidence": round(schedule.confidence, 4),
        "num_events": schedule.num_events,
        "sensitivity": sensitivity,
        "deadline_buffer_hours": SCHEDULE_DEADLINE_BUFFER_HOURS[sensitivity],
    })

    if schedule.stage == "active":
        excluded_days = (frozenset(range(7)) - schedule.active_days
                         if schedule.active_days else None)
        schedule_exclude_weekends = False if excluded_days else exclude_weekends
        has_window = (schedule.frequency == "sub_daily"
                      and schedule.window_start is not None
                      and schedule.window_end is not None)
        if excluded_days or has_window:
            try:
                result = get_freshness_gap_threshold(
                    history, upper_percentile=upper_pct,
                    floor_multiplier=floor_mult, lower_percentile=lower_pct,
                    exclude_weekends=schedule_exclude_weekends,
                    holiday_dates=holiday_dates, tz=schedule_tz,
                    staleness_factor=staleness_factor,
                    excluded_days=excluded_days,
                    window_start=schedule.window_start if has_window else None,
                    window_end=schedule.window_end if has_window else None)
                lower, upper = result.lower, result.upper
                staleness = result.staleness
            except NotEnoughData:
                pass
    return lower, upper, staleness, prediction
