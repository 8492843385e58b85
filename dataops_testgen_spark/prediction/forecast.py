"""Time-series threshold forecasting — numpy re-expression of
`common/time_series_service.py:20-114` + tolerance computation of
`commands/test_thresholds_prediction.py:263-307`.

Model: the reference fits SARIMAX(order=(1,1,1)) with an ``is_excluded``
exogenous dummy. Without statsmodels we fit the same ARIMAX(1,1,1) on the
first-differenced series — ``d_t = c + φ·d_{t-1} + θ·ε_{t-1} + β·x_t + ε_t``
— with the Hannan–Rissanen two-step conditional-least-squares estimator
(long-AR residual proxy, then OLS with the lagged residual regressor, then
one recursive-residual refinement pass), which is the standard
statsmodels-free route to ARMA coefficients. The standard error keeps the
reference's triple floor (`time_series_service.py:100-112`): max(model SE,
post-burn-in residual SE, raw first-difference SE).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MIN_TRAIN_VALUES = 20            # time_series_service.py:13
T_DISTRIBUTION_THRESHOLD = 20    # test_thresholds_prediction.py:33
NUM_FORECAST = 10                # test_thresholds_prediction.py:32

# test_thresholds_prediction.py:35-42
Z_SCORE_MAP = {
    ("lower_tolerance", "low"): -3.0,
    ("lower_tolerance", "medium"): -2.5,
    ("lower_tolerance", "high"): -2.0,
    ("upper_tolerance", "high"): 2.0,
    ("upper_tolerance", "medium"): 2.5,
    ("upper_tolerance", "low"): 3.0,
}


class NotEnoughData(ValueError):
    pass


# Resample-unit snap table for infer_frequency: (seconds per unit, pandas
# offset alias). A gap within 5% of a whole number of days or hours snaps
# to that unit; otherwise it falls through to whole minutes, then seconds.
_SNAP_UNITS = ((86_400, "D"), (3_600, "h"))
_SNAP_TOLERANCE = 0.05


def infer_frequency(datetime_series: pd.Series) -> str:
    """Pandas offset string for the series' typical spacing.

    Same contract as the reference's median-gap inference
    (time_series_service.py:118-136), re-derived: the median inter-sample
    gap is snapped to the largest calendar unit (days, then hours) it is
    within 5% of; irregular gaps fall back to whole minutes, or raw seconds
    for sub-minute spacing.
    """
    gap_seconds = (datetime_series.diff().dropna().median()).total_seconds()
    for unit_seconds, alias in _SNAP_UNITS:
        units = gap_seconds / unit_seconds
        snapped = round(units)
        if snapped >= 1 and abs(units - snapped) <= _SNAP_TOLERANCE * snapped:
            return f"{snapped}{alias}"
    minutes = int(gap_seconds // 60)
    return f"{minutes}min" if minutes else f"{int(gap_seconds)}s"


def resolve_holiday_dates(holiday_codes, index: pd.DatetimeIndex) -> set:
    """Country/market holiday calendar for the index's year span, via the
    ``holidays`` package when installed (the reference's
    ``get_holiday_dates``; the package is optional here — pass explicit
    ``holiday_dates`` to the forecast API when it is absent)."""
    try:
        import holidays as _holidays
    except ImportError as exc:  # pragma: no cover — not in this container
        raise ImportError(
            "the 'holidays' package is not installed; pass holiday_dates="
            "{date, ...} explicitly instead of holiday_codes") from exc
    years = range(index.min().year, index.max().year + 1)
    dates: set = set()
    for code in holiday_codes:
        dates.update(_holidays.country_holidays(code, years=years).keys())
    return dates


def _exog_flags(index: pd.DatetimeIndex, exclude_weekends: bool,
                tz: str | None,
                holiday_dates: set | None = None) -> np.ndarray:
    """is_excluded dummy: weekend and/or holiday periods (the reference's
    get_exog_flags — time_series_service.py:64-72)."""
    check = index.tz_localize("UTC").tz_convert(tz) if tz else index
    flags = np.zeros(len(index))
    if exclude_weekends:
        flags[np.asarray(check.dayofweek) >= 5] = 1.0
    if holiday_dates:
        flags[pd.Index(check.date).isin(holiday_dates)] = 1.0
    return flags


def get_forecast(
    history: pd.DataFrame,
    num_forecast: int,
    exclude_weekends: bool = False,
    holiday_codes: list[str] | None = None,
    holiday_dates: set | None = None,
    tz: str | None = None,
) -> pd.DataFrame:
    """history (DatetimeIndex + one value column) → DataFrame(mean, se).

    ``holiday_dates`` is an explicit set of datetime.date treated as
    exogenous (with ``holiday_codes`` resolved through the optional
    ``holidays`` package and unioned in, mirroring the reference's
    holiday_codes parameter — time_series_service.py:24,56-60).
    """
    if len(history) < MIN_TRAIN_VALUES:
        raise NotEnoughData("Not enough data points in history.")

    frequency = infer_frequency(history.index.to_series())
    resampled = history.resample(frequency).mean().interpolate(method="linear")
    if len(resampled) < MIN_TRAIN_VALUES:
        raise NotEnoughData("Not enough data points after resampling.")

    y = resampled.iloc[:, 0].to_numpy(dtype=float)

    forecast_index = pd.date_range(
        start=resampled.index[-1] + pd.to_timedelta(frequency),
        periods=num_forecast, freq=frequency,
    )
    holidays_all = set(holiday_dates or ())
    if holiday_codes:
        holidays_all |= resolve_holiday_dates(
            holiday_codes, resampled.index.append(forecast_index))
    exog = _exog_flags(resampled.index, exclude_weekends, tz, holidays_all)
    exog_fc = _exog_flags(forecast_index, exclude_weekends, tz, holidays_all)

    # Exogenous semantics match statsmodels SARIMAX (the reference's
    # estimator): REGRESSION WITH ARIMA ERRORS — y_t = γ·x_t + u_t with
    # (1-B)u_t ~ ARMA(1,1).  Two-step Cochrane–Orcutt-style estimate: γ by
    # OLS on [1, t, x] (intercept + linear trend proxy the integrated
    # part), then the ARMA fit runs on the exog-adjusted series.  The
    # earlier x-on-differences parameterization left the full excluded-day
    # level swing inside the residuals, inflating the SE floor by the
    # swing magnitude (r4 Kalman-MLE golden comparison: 11-37× too wide).
    gamma = 0.0
    if exog.std() > 0:
        xmat = np.column_stack([np.ones(len(y)), np.arange(len(y)), exog])
        gcoef, *_ = np.linalg.lstsq(xmat, y, rcond=None)
        gamma = float(gcoef[2])
    y_adj = y - gamma * exog

    # ARMA(1,1) on the adjusted differences via Hannan–Rissanen:
    # d_t = c + φ d_{t-1} + θ ε_{t-1} + ε_t
    d = np.diff(y_adj)
    c0 = phi = theta = 0.0
    eps_last = 0.0
    resid = d
    if len(d) >= 6:
        # step 1: long-AR(p) residual proxy for the unobserved ε series
        p = min(6, len(d) // 3)
        ax = np.column_stack([np.ones(len(d) - p)]
                             + [d[p - k - 1:len(d) - k - 1] for k in range(p)])
        acoef, *_ = np.linalg.lstsq(ax, d[p:], rcond=None)
        eps_hat = np.concatenate([np.zeros(p), d[p:] - ax @ acoef])
        # step 2: OLS with the lagged residual regressor
        for _pass in range(2):
            dx = np.column_stack([
                np.ones(len(d) - 1), d[:-1], eps_hat[:-1],
            ])
            dy = d[1:]
            coef, *_ = np.linalg.lstsq(dx, dy, rcond=None)
            c0, phi, theta = coef
            theta = float(np.clip(theta, -0.98, 0.98))  # invertibility
            # moment condition: pin the intercept to the unconditional mean,
            # c = (1-φ)·E[d].  The OLS intercept carries a small bias under
            # near-cancellation (φ ≈ -θ), and the CSS residual recursion
            # below amplifies any intercept bias b into an eps_last error of
            # b/(1+θ) — 50× at θ = -0.98 (r4 Kalman-MLE golden comparison:
            # holiday fixture forecast off by 2-3 SE before this pin)
            c0 = float((1 - phi) * np.mean(d))
            # step 3: recompute residuals RECURSIVELY under the fitted
            # ARMA(1,1) (CSS refinement pass), then refit once
            eps = np.zeros(len(d))
            for t in range(1, len(d)):
                eps[t] = (d[t] - c0 - phi * d[t - 1]
                          - theta * eps[t - 1])
            eps_hat = eps
        resid = eps_hat[1:]
        eps_last = float(eps_hat[-1])
    elif len(d) >= 3:
        dx = np.column_stack([np.ones(len(d) - 1), d[:-1]])
        dy = d[1:]
        coef, *_ = np.linalg.lstsq(dx, dy, rcond=None)
        c0, phi = coef
        resid = dy - dx @ coef

    # Iterative mean forecast; ε_{T+h} = 0 for h ≥ 1, so the MA term only
    # feeds the first step (as in SARIMAX's get_forecast); the γ·x exog
    # effect re-enters on the level
    means = []
    level, prev_d = y_adj[-1], d[-1] if len(d) else 0.0
    prev_eps = eps_last
    for step in range(num_forecast):
        d_next = c0 + phi * prev_d + theta * prev_eps
        level = level + d_next
        means.append(level + gamma * exog_fc[step])
        prev_d, prev_eps = d_next, 0.0

    # SE floors (time_series_service.py:100-112).  Model SE grows with the
    # ψ-weights of the fitted ARMA(1,1) cumulated through the integration —
    # Var(y_{T+h}) = σ²·Σ_{i<h} Ψ_i², Ψ_i = 1 + (φ+θ)(1-φ^i)/(1-φ) — the
    # same forecast-variance recursion statsmodels' SARIMAX uses.  This
    # generalizes the old √h random-walk growth (exact for φ=θ=0) and stays
    # flat for near-over-differenced series (θ→-1), where √h growth
    # overstated the band (r4 Kalman-MLE golden comparison).
    burn_in = 3
    usable = resid[burn_in:] if len(resid) > burn_in else resid
    resid_se = float(np.std(usable, ddof=1)) if len(usable) >= 5 else 0.0
    raw_diff_se = float(np.std(d, ddof=1)) if len(d) > 1 else 0.0
    step_se = max(resid_se, raw_diff_se)
    psi = np.array([1.0] + [(phi + theta) * phi ** (j - 1)
                            for j in range(1, num_forecast)])
    big_psi = np.cumsum(psi)
    model_se = step_se * np.sqrt(np.cumsum(big_psi ** 2))
    se = np.maximum(model_se, max(resid_se, raw_diff_se))

    return pd.DataFrame({"mean": means, "se": se}, index=forecast_index)


def _inv_norm_cdf(p: float) -> float:
    """Acklam's rational approximation of the normal quantile (public
    domain), |eps| < 1.15e-9 — replaces scipy.stats.norm.ppf."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = np.sqrt(-2 * np.log(p))
        return (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q + c[5]) / \
               ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q + 1)
    if p > phigh:
        return -_inv_norm_cdf(1 - p)
    q = p - 0.5
    r = q * q
    return (((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r + a[5]) * q / \
           (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4]) * r + 1)


def t_ppf(p: float, df: int) -> float:
    """Student-t quantile via the Cornish–Fisher expansion around the normal
    quantile — replaces scipy.stats.t.ppf for the n<20 multiplier
    (test_thresholds_prediction.py:289-294). Accurate to ~1e-3 for df ≥ 3."""
    z = _inv_norm_cdf(p)
    g1 = (z**3 + z) / 4
    g2 = (5 * z**5 + 16 * z**3 + 3 * z) / 96
    g3 = (3 * z**7 + 19 * z**5 + 17 * z**3 - 15 * z) / 384
    return float(z + g1 / df + g2 / df**2 + g3 / df**3)


def _norm_cdf(x: float) -> float:
    from math import erf, sqrt
    return 0.5 * (1 + erf(x / sqrt(2)))


def predict_tolerances(
    history: pd.DataFrame,
    sensitivity: str = "medium",
    num_forecast: int = NUM_FORECAST,
    exclude_weekends: bool = False,
    holiday_codes: list[str] | None = None,
    holiday_dates: set | None = None,
    tz: str | None = None,
) -> tuple[float | None, float | None]:
    """(lower_tolerance, upper_tolerance) for the next period.

    Mirrors test_thresholds_prediction.py:263-307: z multiplier from
    Z_SCORE_MAP; for < 20 training points, widen with the t-distribution
    quantile at the z's percentile with df = n-1.
    """
    try:
        forecast = get_forecast(history, num_forecast,
                                exclude_weekends=exclude_weekends,
                                holiday_codes=holiday_codes,
                                holiday_dates=holiday_dates, tz=tz)
    except NotEnoughData:
        return None, None
    num_points = len(history)
    out = {}
    for which in ("lower_tolerance", "upper_tolerance"):
        z = Z_SCORE_MAP[(which, sensitivity)]
        if num_points < T_DISTRIBUTION_THRESHOLD:
            percentile = _norm_cdf(z)
            multiplier = t_ppf(percentile, df=num_points - 1)
        else:
            multiplier = z
        out[which] = float(forecast["mean"].iloc[0] + multiplier * forecast["se"].iloc[0])
    lower, upper = out["lower_tolerance"], out["upper_tolerance"]
    if pd.isna(lower) or pd.isna(upper):
        return None, None
    return lower, upper
