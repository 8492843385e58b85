"""Monitor-threshold prediction (SURVEY §2.4 step 8).

Reference: `commands/test_thresholds_prediction.py` +
`common/time_series_service.py` (SARIMAX(1,1,1)+exog forecast) +
`common/freshness_service.py` (business-minutes gap thresholds + schedule
inference).

This environment has no statsmodels/scipy, so the forecaster is a pure
numpy ARIMAX(1,1,0)-style model (AR(1)+exog on first differences fitted by
OLS); the SE floor logic (max of model SE, residual SE, raw-diff SE), the
z/t tolerance multipliers, and every freshness/schedule constant follow the
reference exactly.
"""

from dataops_testgen_spark.prediction.forecast import (
    NotEnoughData,
    get_forecast,
    infer_frequency,
    predict_tolerances,
)
from dataops_testgen_spark.prediction.freshness import (
    classify_frequency,
    compute_freshness_threshold,
    get_freshness_gap_threshold,
    infer_schedule,
)

__all__ = [
    "NotEnoughData", "get_forecast", "infer_frequency", "predict_tolerances",
    "classify_frequency", "compute_freshness_threshold",
    "get_freshness_gap_threshold", "infer_schedule",
]
