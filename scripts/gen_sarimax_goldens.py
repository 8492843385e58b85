"""Generate exact-MLE ARIMA(1,1,1) golden forecasts for tests/test_prediction.py.

The reference fits `statsmodels` SARIMAX(order=(1,1,1), exog=is_excluded)
(`/root/reference/testgen/common/time_series_service.py:76-84` — no seasonal
order, so the model class is plain ARIMAX(1,1,1)).  statsmodels is not
installed in this environment, so the goldens are produced by the SAME
estimator statsmodels uses underneath: exact Gaussian maximum likelihood of
the ARMA(1,1) state space on first differences, evaluated with a Kalman
filter (Harvey representation, stationary initialization) and maximized with
a derivative-free Nelder–Mead search.  This is an independent implementation
path from the engine's Hannan–Rissanen estimator
(`dataops_testgen_spark/prediction/forecast.py`), so agreement within
tolerance is evidence the fast estimator tracks the model it replaces.

Run:  python scripts/gen_sarimax_goldens.py
Then paste the printed JSON into tests/test_prediction.py::_KALMAN_GOLDENS.
"""

from __future__ import annotations

import json

import numpy as np


# ---------------------------------------------------------------------------
# Exact ARMA(1,1) Kalman likelihood (Harvey state space)
# ---------------------------------------------------------------------------

def _arma11_loglike(d: np.ndarray, phi: float, theta: float, c: float,
                    beta: float, x: np.ndarray | None):
    """Concentrated (sigma2 profiled out) exact log-likelihood of
    d_t = c + beta*x_t + u_t,  u_t = phi*u_{t-1} + eps_t + theta*eps_{t-1}.

    Returns (loglike, sigma2_hat, last_filtered_state, last_P)."""
    z = d - c - (beta * x if x is not None else 0.0)
    n = len(z)
    # state alpha = [u_t, theta*eps_t]'
    T = np.array([[phi, 1.0], [0.0, 0.0]])
    R = np.array([1.0, theta])
    # stationary initialization: P0 solves P = T P T' + sigma2 R R'
    # (computed for sigma2=1; sigma2 is concentrated out)
    RR = np.outer(R, R)
    P = RR.copy()
    for _ in range(2000):
        P_new = T @ P @ T.T + RR
        if np.max(np.abs(P_new - P)) < 1e-14:
            P = P_new
            break
        P = P_new
    a = np.zeros(2)
    ssq = 0.0
    sum_log_f = 0.0
    for t in range(n):
        f = P[0, 0]
        if f <= 0:
            return -np.inf, np.nan, a, P
        v = z[t] - a[0]
        ssq += v * v / f
        sum_log_f += np.log(f)
        k = P[:, 0] / f
        a = a + k * v
        P = P - np.outer(k, P[0, :])
        a = T @ a
        P = T @ P @ T.T + RR
    sigma2 = ssq / n
    ll = -0.5 * (n * np.log(2 * np.pi) + n * np.log(sigma2) + sum_log_f + n)
    return ll, sigma2, a, P


def _nelder_mead(fn, x0, steps, iters=400, tol=1e-10):
    """Minimal Nelder–Mead (no scipy in this container)."""
    n = len(x0)
    simplex = [np.array(x0, dtype=float)]
    for i in range(n):
        p = np.array(x0, dtype=float)
        p[i] += steps[i]
        simplex.append(p)
    vals = [fn(p) for p in simplex]
    for _ in range(iters):
        order = np.argsort(vals)
        simplex = [simplex[i] for i in order]
        vals = [vals[i] for i in order]
        if abs(vals[-1] - vals[0]) < tol:
            break
        centroid = np.mean(simplex[:-1], axis=0)
        xr = centroid + (centroid - simplex[-1])
        fr = fn(xr)
        if fr < vals[0]:
            xe = centroid + 2 * (centroid - simplex[-1])
            fe = fn(xe)
            simplex[-1], vals[-1] = (xe, fe) if fe < fr else (xr, fr)
        elif fr < vals[-2]:
            simplex[-1], vals[-1] = xr, fr
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = fn(xc)
            if fc < vals[-1]:
                simplex[-1], vals[-1] = xc, fc
            else:
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    vals[i] = fn(simplex[i])
    i = int(np.argmin(vals))
    return simplex[i], vals[i]


def fit_arima111_mle(y: np.ndarray, x_levels: np.ndarray | None = None,
                     x_fc: np.ndarray | None = None, num_forecast: int = 10):
    """Exact-MLE ARIMA(1,1,1)(+exog on differences) fit + forecast.

    Returns dict with params, forecast means (levels) and SEs."""
    # statsmodels SARIMAX exog semantics are regression-with-ARIMA-errors:
    # y_t = gamma*X_t + u_t with (1-B)u_t ~ ARMA(1,1) — equivalently the
    # exog enters the difference equation as gamma*(X_t - X_{t-1})
    d = np.diff(y)
    x = np.diff(x_levels) if x_levels is not None else None
    if x_levels is not None and x_fc is not None:
        x_fc = np.diff(np.concatenate([[x_levels[-1]], x_fc]))

    def negll(p):
        phi, theta, c = p[0], p[1], p[2]
        beta = p[3] if x is not None else 0.0
        if not (-0.995 < phi < 0.995 and -0.995 < theta < 0.995):
            return 1e12
        ll, *_ = _arma11_loglike(d, phi, theta, c, beta, x)
        return -ll if np.isfinite(ll) else 1e12

    x0 = [0.1, 0.1, float(np.mean(d))] + ([0.0] if x is not None else [])
    steps = [0.3, 0.3, max(1e-3, abs(np.mean(d)) + np.std(d) * 0.2)] + \
            ([0.5 * (np.std(d) + 1e-3)] if x is not None else [])
    # multi-start: ARMA likelihoods are multimodal in (phi, theta)
    best = None
    for phi0 in (-0.5, 0.0, 0.5):
        for th0 in (-0.5, 0.0, 0.5):
            p0 = list(x0)
            p0[0], p0[1] = phi0, th0
            p, v = _nelder_mead(negll, p0, steps)
            if best is None or v < best[1]:
                best = (p, v)
    p = best[0]
    phi, theta, c = float(p[0]), float(p[1]), float(p[2])
    beta = float(p[3]) if x is not None else 0.0
    ll, sigma2, a, _P = _arma11_loglike(d, phi, theta, c, beta, x)

    # forecast differences from the filtered terminal state:
    # a = [u_T+1|T, theta*eps_T+1|T] AFTER the final transition, i.e. the
    # one-step-ahead predicted state — u_{T+1|T} is exactly E[u_{T+1}|data]
    means_d = []
    u_pred = a.copy()
    for h in range(num_forecast):
        xh = float(x_fc[h]) if x_fc is not None else 0.0
        means_d.append(c + beta * xh + u_pred[0])
        u_pred = np.array([phi * u_pred[0] + u_pred[1], 0.0])
    means = y[-1] + np.cumsum(means_d)

    # forecast SE of levels: psi-weights of ARMA(1,1) cumulated through the
    # integration. psi_0=1, psi_j=(phi+theta)*phi^(j-1)
    psi = [1.0] + [(phi + theta) * phi ** (j - 1)
                   for j in range(1, num_forecast)]
    Psi = np.cumsum(psi)          # coefficient of eps_{T+i} in y_{T+h}
    var = sigma2 * np.array([np.sum(Psi[:h + 1] ** 2)
                             for h in range(num_forecast)])
    return {
        "phi": round(phi, 6), "theta": round(theta, 6), "c": round(c, 6),
        "beta": round(beta, 6), "sigma2": round(float(sigma2), 6),
        "loglike": round(float(ll), 4),
        "mean": [round(float(m), 6) for m in means],
        "se": [round(float(s), 6) for s in np.sqrt(var)],
    }


# ---------------------------------------------------------------------------
# Fixture series — mirror the shapes the engine's monitors see
# ---------------------------------------------------------------------------

def _series():
    rng = np.random.RandomState(42)
    out = {}

    # 1. random walk with drift + noise (volume trend)
    n = 60
    y = 1000 + np.cumsum(2.0 + rng.normal(0, 5, n))
    out["drift"] = {"y": y, "x": None}

    # 2. true ARIMA(1,1,1): d_t = 0.5 d_{t-1} + eps + 0.3 eps_{t-1}
    n = 80
    eps = rng.normal(0, 3, n)
    d = np.zeros(n)
    for t in range(1, n):
        d[t] = 0.5 * d[t - 1] + eps[t] + 0.3 * eps[t - 1]
    out["arma"] = {"y": 500 + np.cumsum(d), "x": None}

    # 3. weekday/weekend level shift (exog dummy), 8 weeks daily
    n = 56
    dow = np.arange(n) % 7
    is_we = (dow >= 5).astype(float)
    y = 200 + 1.0 * np.arange(n) - 80 * is_we + rng.normal(0, 4, n)
    x_fc = ((np.arange(n, n + 10) % 7) >= 5).astype(float)
    out["weekend"] = {"y": y, "x": is_we, "x_fc": x_fc}

    # 4. monthly holiday dip (explicit holiday_dates exog), 60 days daily
    # starting 2026-01-05 (Monday); dips on the 15th of each month.
    # Forecast horizon 2026-03-06..15 includes the flagged Mar 15.
    import pandas as pd

    n = 60
    idx = pd.date_range("2026-01-05", periods=n, freq="D")
    is_hol = np.array([1.0 if t.day == 15 else 0.0 for t in idx])
    y = 300 + 0.5 * np.arange(n) - 120 * is_hol + rng.normal(0, 5, n)
    fc_idx = pd.date_range(idx[-1] + pd.Timedelta(days=1), periods=10,
                           freq="D")
    x_fc = np.array([1.0 if t.day == 15 else 0.0 for t in fc_idx])
    out["holiday"] = {"y": y, "x": is_hol, "x_fc": x_fc}
    return out


def main():
    import pandas as pd

    goldens = {}
    for name, s in _series().items():
        y_raw = np.asarray(s["y"], dtype=float)
        if s.get("index") is not None:
            # emulate the engine's preprocessing for irregular series:
            # daily resample + linear interpolation (forecast.py resample)
            ser = pd.Series(y_raw, index=s["index"]).resample("D").mean() \
                .interpolate(method="linear")
            y_fit = ser.to_numpy()
        else:
            y_fit = y_raw
        res = fit_arima111_mle(
            y_fit,
            x_levels=np.asarray(s["x"], dtype=float)
            if s.get("x") is not None else None,
            x_fc=np.asarray(s["x_fc"], dtype=float)
            if s.get("x_fc") is not None else None)
        goldens[name] = res
        goldens[name]["y"] = [round(float(v), 6) for v in y_raw]
        if s.get("index") is not None:
            goldens[name]["day_offsets"] = [
                int((t - s["index"][0]).days) for t in s["index"]]
        if s.get("x") is not None:
            goldens[name]["exog"] = [float(v) for v in s["x"]]
            goldens[name]["exog_fc"] = [float(v) for v in s["x_fc"]]
    print(json.dumps(goldens, indent=1))


if __name__ == "__main__":
    main()
