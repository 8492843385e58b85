from dataops_testgen_spark.profiling.profiler import profile_table, profile_tables

__all__ = ["profile_table", "profile_tables"]
