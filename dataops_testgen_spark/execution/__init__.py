from dataops_testgen_spark.execution.defs import TestDef
from dataops_testgen_spark.execution.cat import run_cat_tests, cat_measure

__all__ = ["TestDef", "run_cat_tests", "cat_measure"]
