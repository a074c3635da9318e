"""Expression libraries — pure Column-in/Column-out functions.

Everything here compiles to native Catalyst expressions (no Python
UDFs), so the hot path stays inside whole-stage codegen.
"""

from data_warehouse_migration_spark.functions.jde import (
    date_key,
    date_to_julian,
    implicit_decimal,
    julian_to_date,
    row_hash,
    safe_divide,
)

__all__ = [
    "julian_to_date",
    "date_to_julian",
    "implicit_decimal",
    "safe_divide",
    "row_hash",
    "date_key",
]
