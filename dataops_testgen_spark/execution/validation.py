"""Test-definition validation pre-pass.

Reference: `commands/run_test_validation.py:12-168` — before execution, every
referenced table/column is checked against reflected target identifiers;
missing references produce Error results and deactivate the test.
Spark: the identifiers come from the DataFrames' schemas.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from dataops_testgen_spark.execution.defs import TestDef


@dataclass(frozen=True)
class ValidationOutcome:
    valid: list[TestDef]
    errors: list[dict]  # result rows with result_status='Error'


def validate_tests(tables: dict[str, DataFrame], defs: list[TestDef]) -> ValidationOutcome:
    columns = {name: set(df.columns) for name, df in tables.items()}
    valid: list[TestDef] = []
    errors: list[dict] = []
    for td in defs:
        message = None
        if td.table_name not in columns:
            message = f"Table {td.table_name} not present in target"
        elif td.column_name and td.column_name not in columns[td.table_name]:
            message = (f"Column {td.table_name}.{td.column_name} "
                       "not present in target")
        if message is None:
            # referential QUERY params: the match table and every named
            # group-by column are referenced identifiers too (the
            # reference validates all of them before execution)
            mt = td.p("match_table_name")
            if mt and mt not in columns:
                message = f"Table {mt} not present in target"
            else:
                gb = td.p("groupby_names")
                gb_cols = ([str(c).strip() for c in gb]
                           if isinstance(gb, (list, tuple))
                           else [c.strip() for c in str(gb).split(",")
                                 if c.strip()]) if gb else []
                for c in gb_cols:
                    if c not in columns[td.table_name]:
                        message = (f"Column {td.table_name}.{c} "
                                   "not present in target")
                        break
        if message is None:
            valid.append(td)
        else:
            errors.append({
                "test_id": td.test_id, "test_type": td.test_type,
                "table_name": td.table_name, "column_name": td.column_name,
                "result_code": None, "result_status": "Error",
                "result_message": message, "test_active": "N",
            })
    return ValidationOutcome(valid=valid, errors=errors)
