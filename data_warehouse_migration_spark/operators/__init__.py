"""Composite DataFrame operators.

Each operator is a DataFrame-in/DataFrame-out function that composes
native Spark primitives (joins, windows, exploded inverted indexes) —
no driver-side loops, no ``collect()``, no row-at-a-time Python in the
hot path. Every operator documents its 100 TB posture: how it
partitions, what it shuffles, and what it broadcasts.
"""

from data_warehouse_migration_spark.operators.joins import (
    as_of_join,
    point_in_time_join,
)
from data_warehouse_migration_spark.operators.scd2 import (
    scd2_from_history,
    scd2_merge,
)

__all__ = [
    "point_in_time_join",
    "as_of_join",
    "scd2_from_history",
    "scd2_merge",
]
