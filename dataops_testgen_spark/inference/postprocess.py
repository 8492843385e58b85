"""Profile post-processing pipeline, in reference order.

`/root/reference/testgen/commands/queries/profiling_query.py:163-177` runs:
datatype suggestions → functional datatypes → functional table types → PII →
CDE. ``apply_inference`` chains the same steps over the profile DataFrame and
returns it enriched with ``datatype_suggestion, functional_data_type,
functional_table_type, pii_flag, critical_data_element``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataops_testgen_spark.inference.cde import flag_cde
from dataops_testgen_spark.inference.datatype_suggestion import add_datatype_suggestion
from dataops_testgen_spark.inference.functional_type import (
    infer_functional_datatypes,
    infer_table_types,
)
from dataops_testgen_spark.inference.pii import flag_pii


def apply_inference(
    profile: DataFrame,
    history: DataFrame | None = None,
    id_mask: str = "%id",
    sk_mask: str = "%_sk",
    materialize: bool = True,
) -> DataFrame:
    df = add_datatype_suggestion(profile)
    df = infer_functional_datatypes(df, id_mask=id_mask, sk_mask=sk_mask)
    table_types = infer_table_types(df, history=history)
    df = df.join(table_types.select("table_name", "functional_table_type"),
                 "table_name", "left")
    df = flag_pii(df)
    df = flag_cde(df)
    if materialize:
        # The result is metadata-plane (one row per column) but its lineage
        # carries the whole layered cascade — leaving it lazy makes every
        # downstream action (anomaly screen branches, generation explode)
        # re-run Catalyst over those expression trees, which dominates wall
        # time. Cut the lineage once; the data itself is negligible.
        df = df.localCheckpoint(eager=False)
    return df
