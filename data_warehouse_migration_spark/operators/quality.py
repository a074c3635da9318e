"""Row-level data-quality validation: route rows to good/quarantine by
declarative rules, and summarize violations.

The reference never validates (SURVEY.md §2.8 ⚠: bad Julian dates
decode silently); a 100 TB ingest cannot afford silent corruption OR a
job abort on one bad row. Pattern: evaluate every rule as a boolean
column, collect violated rule names into an array, split on emptiness.
One pass, zero shuffles; the quarantine side keeps full row payload +
the reasons, so reprocessing is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_violations(
    df: DataFrame, rules: dict[str, Column], out_col: str = "violations"
) -> DataFrame:
    """Append ``out_col``: array of names of violated rules (rule
    Column TRUE = row passes; NULL counts as violation)."""
    flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in rules.items()
    ]
    arr = F.array_compact(F.array(*flags)) if flags else F.array()
    return df.withColumn(out_col, arr)


def split_quarantine(
    df: DataFrame, rules: dict[str, Column], out_col: str = "violations"
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): rows violating no rule vs the rest (with
    reasons attached). Callers write the quarantine side next to the
    clean output — the reference's missing dead-letter lane."""
    flagged = with_violations(df, rules, out_col)
    good = flagged.filter(F.size(out_col) == 0).drop(out_col)
    bad = flagged.filter(F.size(out_col) > 0)
    return good, bad
