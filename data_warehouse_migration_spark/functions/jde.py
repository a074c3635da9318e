"""JDE (JD Edwards) encoding codecs as native Spark Column expressions.

The reference's flagship domain logic (SURVEY.md §2.8):

- Julian ``CYYDDD`` dates — reference decode at
  ``adf/dataflow/DF_Clean_JDE.json:70`` (e.g. ``123001`` → 2023-01-01).
- Implicit 2-decimal integers — ``DF_Clean_JDE.json:71-72``
  (``1050`` → 10.50; failing to decode overstates revenue 100×,
  ``docs/technical_report.md:45-54``).
- Safe divide — ``iif(SDUORG != 0, SDAEXP/SDUORG, 0)`` at
  ``DF_Clean_JDE.json:73``.
- SHA-256 row hash for SCD2 change detection —
  ``DF_SCD2_Customer.json:135,139`` / ``load_gold_data.sql:19``.

All pure Column expressions: JVM-side, codegen'd, no UDFs — at 100 TB
these run inside the Parquet scan stage with zero Python transitions.

Robustness fixes over the reference (SURVEY.md §2.8 ⚠, §7.3): the
reference's ``toString(int)`` drops the leading zero for 1900s dates
(century digit 0) making ``left(s,1)`` grab a year digit; we ``lpad``
to 6. We also guard DDD ∈ 1..366 and NULL inputs — the reference never
handles invalid encodings; we map them to NULL so they can be
quarantined downstream.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

# Scale invariant: money/quantity columns carry exactly 2 implicit
# decimals (fact_sales.sql:36-38 declares DECIMAL(18,2)).
MONEY = DecimalType(18, 2)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def julian_to_date(c: Column | str) -> Column:
    """Decode a JDE Julian ``CYYDDD`` integer to a DATE.

    ``CYYDDD``: C = century offset from 1900 (0 → 19xx, 1 → 20xx),
    YY = 2-digit year within the century, DDD = 1-based day of year.
    Reference expression: ``DF_Clean_JDE.json:70`` (known-answer:
    ``123001`` → 2023-01-01). Invalid DDD (0 or > 366) and NULLs
    decode to NULL.
    """
    c = _col(c)
    s = F.lpad(c.cast("string"), 6, "0")  # century-0 fix (SURVEY §2.8 ⚠)
    year = (
        F.lit(1900)
        + F.substring(s, 1, 1).cast("int") * 100
        + F.substring(s, 2, 2).cast("int")
    )
    ddd = F.substring(s, 4, 3).cast("int")
    decoded = F.date_add(F.make_date(year, F.lit(1), F.lit(1)), ddd - F.lit(1))
    return F.when(
        c.isNull() | (ddd < 1) | (ddd > 366), F.lit(None).cast("date")
    ).otherwise(decoded)


def date_to_julian(c: Column | str) -> Column:
    """Encode a DATE to the JDE Julian ``CYYDDD`` integer.

    Inverse of :func:`julian_to_date`; matches the reference's fixture
    generator ``generate_jde_data.py:28-42``:
    ``int(f"{century}{yy:02d}{ddd:03d}")`` with century = year//100-19.
    """
    c = _col(c)
    year = F.year(c)
    return (
        (F.floor(year / 100) - 19) * 100000 + (year % 100) * 1000 + F.dayofyear(c)
    ).cast("int")


def implicit_decimal(c: Column | str, scale: int = 2) -> Column:
    """Decode an integer with implicit decimals to DECIMAL(18, scale).

    Reference: ``toDecimal(SDAEXP) / 100.00`` (``DF_Clean_JDE.json:71-72``).
    Decimal (not double) so aggregation is exact and matches the
    oracle bit-for-bit; explicit cast back to (18, scale) because Spark
    decimal division widens the scale (SURVEY.md §7.4).
    """
    target = DecimalType(18, scale)
    return (_col(c).cast(target) / F.lit(10**scale)).cast(target)


def safe_divide(num: Column | str, den: Column | str, default: float = 0.0) -> Column:
    """``iif(den != 0, num/den, default)`` — ``DF_Clean_JDE.json:73``."""
    num, den = _col(num), _col(den)
    return F.when(den != 0, num / den).otherwise(F.lit(default))


def row_hash(*cols: Column | str, num_bits: int = 256) -> Column:
    """Canonical SHA-2 digest of business columns for change detection.

    The reference disagrees with itself — ADF ``sha2(256, a, b, c)``
    concatenates raw values (``DF_SCD2_Customer.json:135``) while the
    T-SQL twin pipe-delimits (``load_gold_data.sql:19``). We canonicalize
    on the delimited form (prevents ``("ab","c") == ("a","bc")``
    collisions) and null-normalize each input to the empty string —
    matching T-SQL ``CONCAT``'s NULL-as-'' behavior, so NULL and '' are
    deliberately hash-equal (SURVEY.md §7.5; pinned by
    ``test_row_hash_null_normalization_and_separator``).
    """
    normalized = [F.coalesce(_col(c).cast("string"), F.lit("")) for c in cols]
    return F.sha2(F.concat_ws("|", *normalized), num_bits)


def date_key(c: Column | str) -> Column:
    """``yyyyMMdd`` integer surrogate for a date — ``DF_Clean_JDE.json:74``."""
    return F.date_format(_col(c), "yyyyMMdd").cast("int")
