from dataops_testgen_spark.fixtures.quickstart import build_quickstart_tables

__all__ = ["build_quickstart_tables"]
