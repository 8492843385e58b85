"""Tests for threshold forecasting + freshness schedule inference.

Scenario style mirrors the reference's test_freshness_scenarios.py:
construct synthetic update histories with known cadence and assert the
inferred schedule/thresholds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dataops_testgen_spark.prediction import (
    NotEnoughData,
    classify_frequency,
    compute_freshness_threshold,
    get_forecast,
    get_freshness_gap_threshold,
    infer_frequency,
    infer_schedule,
    predict_tolerances,
)
from dataops_testgen_spark.prediction.forecast import t_ppf


def _daily_history(n=60, base=1000.0, noise=25.0, trend=2.0):
    rng = np.random.RandomState(7)
    idx = pd.date_range("2026-05-01", periods=n, freq="D")
    vals = base + trend * np.arange(n) + rng.normal(0, noise, n)
    return pd.DataFrame({"value": vals}, index=idx)


def test_infer_frequency():
    idx = pd.date_range("2026-05-01", periods=30, freq="D").to_series()
    assert infer_frequency(idx) == "1D"
    idx_h = pd.date_range("2026-05-01", periods=48, freq="6h").to_series()
    assert infer_frequency(idx_h) == "6h"


def test_forecast_tracks_trend():
    hist = _daily_history()
    fc = get_forecast(hist, 5)
    assert len(fc) == 5
    # trending series: forecast should continue near the last level
    assert fc["mean"].iloc[0] == pytest.approx(hist["value"].iloc[-1], rel=0.1)
    assert (fc["se"] > 0).all()


def test_forecast_not_enough_data():
    with pytest.raises(NotEnoughData):
        get_forecast(_daily_history(n=10), 5)


def test_tolerances_bracket_next_value():
    hist = _daily_history()
    lower, upper = predict_tolerances(hist, "medium")
    assert lower is not None and upper is not None
    nxt = hist["value"].iloc[-1] + 2.0  # expected next ≈ last + trend
    assert lower < nxt < upper
    lo_low, up_low = predict_tolerances(hist, "low")
    assert lo_low < lower and up_low > upper  # low sensitivity = wider


def test_t_multiplier_widens_small_samples():
    hist = _daily_history(n=21)  # below T_DISTRIBUTION_THRESHOLD after diff
    small = predict_tolerances(_daily_history(n=25).iloc[:19 + 1], "medium")
    # t-quantile exceeds z for small df
    assert t_ppf(0.9938, 10) > 2.5
    assert abs(t_ppf(0.975, 1000) - 1.96) < 0.01
    assert small == (None, None) or small[0] < small[1]


def _signal_history(update_times):
    idx = pd.DatetimeIndex(update_times)
    return pd.DataFrame({"result_signal": np.zeros(len(idx))}, index=idx)


def test_gap_threshold_daily():
    times = pd.date_range("2026-06-01 02:00", periods=30, freq="D")
    hist = _signal_history(times)
    thr = get_freshness_gap_threshold(hist)
    assert thr.upper == pytest.approx(1440 * 1.25)  # floor multiplier binds
    assert thr.staleness == pytest.approx(1440 * 0.85)
    assert thr.lower == pytest.approx(1440)


def test_gap_threshold_needs_min_gaps():
    times = pd.date_range("2026-06-01", periods=4, freq="D")
    with pytest.raises(NotEnoughData):
        get_freshness_gap_threshold(_signal_history(times))


def test_classify_frequency_bands():
    assert classify_frequency(np.array([1.0, 2.0, 3.0])) == "sub_daily"
    assert classify_frequency(np.array([24.0] * 10)) == "daily"
    assert classify_frequency(np.array([168.0] * 10)) == "weekly"
    assert classify_frequency(np.array([72.0] * 10)) == "irregular"
    assert classify_frequency(np.array([])) == "irregular"


def test_infer_schedule_weekday_daily():
    # weekday-only 03:00 UTC updates over 6 weeks
    times = [t for t in pd.date_range("2026-06-01 03:00", periods=42, freq="D")
             if t.weekday() < 5]
    sched = infer_schedule(_signal_history(times), "UTC")
    assert sched is not None
    assert sched.frequency == "daily"
    assert sched.active_days == frozenset(range(5))
    assert sched.stage == "active"
    assert sched.confidence >= 0.75


def test_compute_freshness_threshold_excludes_weekends():
    times = [t for t in pd.date_range("2026-06-01 03:00", periods=42, freq="D")
             if t.weekday() < 5]
    lower, upper, staleness, pred = compute_freshness_threshold(
        _signal_history(times), "medium", schedule_tz="UTC")
    assert upper is not None
    assert pred["schedule_stage"] == "active"
    assert pred["active_days"] == [0, 1, 2, 3, 4]
    # weekend gap (Fri→Mon, 4320 wall minutes) shrinks to ~1440 business
    # minutes once inactive days are excluded → upper well below 4320·1.25
    assert upper < 4320
    assert staleness is not None


def test_ma_term_improves_ima_series():
    """ARIMA(0,1,1) data: d_t = ε_t + θ·ε_{t-1} with θ = -0.7. The
    Hannan–Rissanen fit must recover a substantially negative MA weight —
    the reference's SARIMAX(1,1,1) (time_series_service.py:77-81) models
    exactly this; a pure ARIMAX(1,1,0) cannot."""
    rng = np.random.default_rng(7)
    theta = -0.7
    eps = rng.normal(0, 1.0, 220)
    d = eps[1:] + theta * eps[:-1]
    y = 100 + np.cumsum(d)
    idx = pd.date_range("2025-01-01", periods=len(y), freq="D")
    hist = pd.DataFrame({"v": y}, index=idx)
    fc = get_forecast(hist, num_forecast=5)
    assert len(fc) == 5 and fc["se"].iloc[0] > 0
    # one-step-ahead forecasts of an IMA(1,1) stay near the current level;
    # a drifting AR-only fit would walk away with the last (noisy) diff
    assert abs(fc["mean"].iloc[0] - y[-1]) < 3.0
    # the fitted residual-based SE should approach sigma=1, well below the
    # raw-diff SE (which inflates to sqrt(1+theta^2)~1.22 x sigma)
    assert fc["se"].iloc[0] <= np.std(np.diff(y), ddof=1) + 1e-9


# --- golden forecasts: series whose SARIMAX(1,1,1) limit is known in
#     closed form, so the numpy estimator is checked against the model it
#     re-implements rather than against itself (r2 VERDICT item #6) ---

def test_golden_constant_series():
    """y = c: every ARIMA(1,1,1) forecast is exactly c with zero residual."""
    idx = pd.date_range("2026-05-01", periods=30, freq="D")
    hist = pd.DataFrame({"v": np.full(30, 500.0)}, index=idx)
    fc = get_forecast(hist, 5)
    assert np.allclose(fc["mean"], 500.0, atol=1e-9)
    assert np.allclose(fc["se"], 0.0, atol=1e-9)


def test_golden_linear_trend():
    """y = a + b t: first differences are the constant b, so the forecast
    continues the line exactly: mean_h = y_T + b·h."""
    idx = pd.date_range("2026-05-01", periods=40, freq="D")
    hist = pd.DataFrame({"v": 100.0 + 5.0 * np.arange(40)}, index=idx)
    fc = get_forecast(hist, 5)
    expected = hist["v"].iloc[-1] + 5.0 * np.arange(1, 6)
    assert np.allclose(fc["mean"], expected, rtol=1e-6)


def test_golden_ar1_differences():
    """d_t = φ·d_{t-1} exactly (φ=0.6): the estimator must recover φ and the
    h-step mean is y_T + d_T·Σ φ^k — SARIMAX(1,1,1)'s forecast function."""
    phi, d0 = 0.6, 64.0
    d = d0 * phi ** np.arange(39)
    y = 1000.0 + np.concatenate([[0.0], np.cumsum(d)])
    idx = pd.date_range("2026-05-01", periods=40, freq="D")
    hist = pd.DataFrame({"v": y}, index=idx)
    fc = get_forecast(hist, 5)
    d_last = d[-1]
    expected = y[-1] + d_last * np.cumsum(phi ** np.arange(1, 6))
    assert np.allclose(fc["mean"], expected, rtol=0.05)


def test_golden_weekend_exog():
    """Level dips on weekends only; with exclude_weekends the forecast for a
    weekend day must sit below the weekday forecast."""
    idx = pd.date_range("2026-05-01", periods=42, freq="D")  # Fri start
    is_wk = (idx.dayofweek >= 5).astype(float)
    hist = pd.DataFrame({"v": 200.0 - 80.0 * is_wk}, index=idx)
    fc = get_forecast(hist, 7, exclude_weekends=True)
    wk = fc["mean"][fc.index.dayofweek >= 5]
    wd = fc["mean"][fc.index.dayofweek < 5]
    assert wk.mean() < wd.mean()


def test_holiday_exog_flags():
    """Explicit holiday dates set the is_excluded dummy exactly like the
    reference's holiday_codes path (time_series_service.py:70-72)."""
    from dataops_testgen_spark.prediction.forecast import _exog_flags

    idx = pd.date_range("2026-07-01", periods=7, freq="D")
    hols = {pd.Timestamp("2026-07-03").date(), pd.Timestamp("2026-07-04").date()}
    flags = _exog_flags(idx, exclude_weekends=False, tz=None,
                        holiday_dates=hols)
    assert flags.tolist() == [0, 0, 1, 1, 0, 0, 0]
    # weekends OR holidays union (Jul 4/5 2026 = Sat/Sun)
    flags2 = _exog_flags(idx, exclude_weekends=True, tz=None,
                         holiday_dates={pd.Timestamp("2026-07-03").date()})
    assert flags2.tolist() == [0, 0, 1, 1, 1, 0, 0]


def test_holiday_forecast_dips():
    """A recurring monthly 'holiday' dip modeled as exogenous: the forecast
    on a flagged future date sits below unflagged neighbours."""
    idx = pd.date_range("2026-01-01", periods=60, freq="D")
    hols = {d.date() for d in idx if d.day == 15} | {
        pd.Timestamp("2026-03-15").date()}
    dip = np.isin(pd.Index(idx.date), sorted(hols)).astype(float)
    hist = pd.DataFrame({"v": 300.0 - 120.0 * dip}, index=idx)
    fc = get_forecast(hist, 20, holiday_dates=hols)
    flagged = fc["mean"][[d.date() in hols for d in fc.index]]
    clear = fc["mean"][[d.date() not in hols for d in fc.index]]
    assert len(flagged) > 0
    assert flagged.mean() < clear.mean()


def test_infer_frequency_minutes_seconds():
    idx = pd.date_range("2026-05-01", periods=30, freq="45min").to_series()
    assert infer_frequency(idx) == "45min"
    idx_s = pd.date_range("2026-05-01", periods=30, freq="30s").to_series()
    assert infer_frequency(idx_s) == "30s"
    idx_2d = pd.date_range("2026-05-01", periods=30, freq="2D").to_series()
    assert infer_frequency(idx_2d) == "2D"


# --- r4: exact-MLE Kalman goldens ------------------------------------------
# tests/data/sarimax_goldens.json is produced by scripts/gen_sarimax_goldens
# .py: an exact Gaussian-MLE ARIMA(1,1,1)(+exog) fit via Kalman filter — the
# same estimator statsmodels SARIMAX uses (the reference's model,
# time_series_service.py:76-84; statsmodels itself is absent in this env).
# The engine's Hannan–Rissanen estimator must agree with the exact MLE
# within a fraction of the MLE's own forecast SE.

import json as _json
import os as _os

_GOLDENS = _json.load(open(_os.path.join(
    _os.path.dirname(__file__), "data", "sarimax_goldens.json")))


def _golden_history(name):
    v = _GOLDENS[name]
    idx = pd.date_range("2026-01-05", periods=len(v["y"]), freq="D")
    return pd.DataFrame({"v": v["y"]}, index=idx), v


@pytest.mark.parametrize("name,kw", [
    ("drift", {}),
    ("arma", {}),
    ("weekend", {"exclude_weekends": True}),
    ("holiday", {"holiday_dates": {
        d.date() for d in pd.date_range("2026-01-01", "2026-04-01")
        if d.day == 15}}),
])
def test_kalman_mle_golden_forecasts(name, kw):
    hist, v = _golden_history(name)
    fc = get_forecast(hist, 10, **kw)
    mean = fc["mean"].to_numpy()
    se = fc["se"].to_numpy()
    g_mean, g_se = np.array(v["mean"]), np.array(v["se"])
    # forecast means within 0.6 exact-MLE SE at every horizon
    assert np.all(np.abs(mean - g_mean) <= 0.6 * g_se + 1e-9), (
        np.abs(mean - g_mean) / g_se)
    # SE within a factor band of the exact-MLE SE (HR keeps the reference's
    # conservative raw-diff floor, so mild overshoot is expected)
    ratio = se / g_se
    assert np.all((ratio > 0.5) & (ratio < 2.2)), ratio


def test_not_enough_raw_points_parity():
    """len(history) < MIN_TRAIN_VALUES raises BEFORE resampling, exactly as
    the reference does (time_series_service.py:40-41) — even when daily
    resampling would interpolate past the minimum."""
    days = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 13, 17, 21, 25, 29, 33, 38, 43]
    idx = pd.DatetimeIndex(
        [pd.Timestamp("2026-03-02") + pd.Timedelta(days=d) for d in days])
    hist = pd.DataFrame({"v": np.arange(len(days), dtype=float)}, index=idx)
    with pytest.raises(NotEnoughData):
        get_forecast(hist, 5)


def test_t_ppf_matches_published_tables():
    """Cornish–Fisher t quantile vs published two-sided 95% t-table values
    (the n<20 multiplier path, test_thresholds_prediction.py:289-294)."""
    # tolerance 4e-3: the Cornish–Fisher expansion degrades at low df
    # (measured 2.8e-3 at df=5, <2e-4 from df=10 up)
    published = {5: 2.570582, 10: 2.228139, 17: 2.109816, 19: 2.093024}
    for df, expected in published.items():
        assert abs(t_ppf(0.975, df) - expected) < 4e-3, df
    # and at the Z_SCORE_MAP percentiles the multiplier widens vs normal
    from dataops_testgen_spark.prediction.forecast import _norm_cdf
    for z in (2.0, 2.5, 3.0):
        assert t_ppf(_norm_cdf(z), 15) > z
