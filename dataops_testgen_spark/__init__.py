"""dataops_testgen_spark — a PySpark-native data-quality engine.

A ground-up rebuild of the query/data-processing capabilities of
DataKitchen/dataops-testgen (reference at /root/reference) expressed as
idiomatic Spark DataFrame plans:

- column profiling   (~60 metrics in ONE ``df.agg`` per table)
- semantic inference (functional data types / table types / PII / CDE)
- hygiene screening  (32 anomaly rules over the profile DataFrame)
- test generation    (selection criteria → test_definitions)
- test execution     (CAT batching: one agg per table per batch; QUERY tests
                      as DataFrame pipelines; METADATA tests over schema log)
- threshold prediction (numpy-based forecasting; SARIMAX if statsmodels present)
- scoring            (prevalence-weighted rollups, ``sum_ln`` combination)
- LLM-pipeline ops   (dedup, similarity search, text analysis, multimodal)

No app database: results are plain DataFrames persisted as parquet.
"""

__version__ = "0.1.0"

from dataops_testgen_spark.session import get_spark
from dataops_testgen_spark.schema_scan import scan_table, scan_tables, general_type
from dataops_testgen_spark.profiling.profiler import profile_table

__all__ = [
    "get_spark",
    "scan_table",
    "scan_tables",
    "general_type",
    "profile_table",
]
