"""Stale autogen test cleanup.

Reference: `template/generation/delete_stale_autogen_tests.sql` — delete
auto-generated definitions whose (test_type, table, column) no longer
qualifies under the latest profile, unless locked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def delete_stale_tests(existing: DataFrame, freshly_generated: DataFrame,
                       locked: DataFrame | None = None) -> DataFrame:
    """Keep only definitions regenerated this run (or locked)."""
    keys = ["test_type", "table_name", "column_name"]
    kept = existing.join(freshly_generated.select(*keys), keys, "left_semi")
    if locked is not None:
        kept = kept.unionByName(
            existing.join(locked.select(*keys), keys, "left_semi")
        ).dropDuplicates(keys)
    return kept
