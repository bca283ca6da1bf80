"""Shared expression helpers enforcing cross-engine determinism.

The driver's correctness gate hashes query output values after sorting, so a
Spark result and a DuckDB oracle result must agree to the last bit. Plain
`SUM(double)` cannot guarantee that: floating-point addition is
order-dependent and the two engines (and even two Spark runs under AQE)
aggregate in different orders.

Fix: the fixtures' money-like columns carry exactly 2 decimal digits
(FIXTURES.md), so we aggregate *exact integers*: scale, round half-up via
`FLOOR(x*s + 0.5)` (identical semantics in Spark and DuckDB — no reliance on
either engine's ROUND tie rule), cast to 64-bit int, SUM exactly, divide once
at the end. The final division is a single IEEE-754 op on identical inputs —
bit-identical across engines.

This also matters at 100 TB: integer sums never lose precision across
billions of rows, while double sums drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_long(col: Column, scale: int) -> Column:
    """Exact integer representation of a fixed-decimal double."""
    return F.floor(col * F.lit(float(scale)) + F.lit(0.5)).cast("long")


def money_sum(col: Column, scale: int = 100) -> Column:
    """Order-insensitive exact SUM of a fixed-decimal double, as double."""
    return F.sum(scaled_long(col, scale)) / F.lit(float(scale))


def money_avg(col: Column, scale: int = 100) -> Column:
    """Order-insensitive exact AVG of a fixed-decimal double, as double."""
    return F.sum(scaled_long(col, scale)) / (F.lit(float(scale)) * F.count(F.lit(1)))


# ---- event-time helpers (TIMESTAMP_NTZ-safe) ------------------------------
#
# The fixtures store naive microsecond timestamps, which Spark reads as
# TIMESTAMP_NTZ (parquet isAdjustedToUTC=false + inferTimestampNTZ default).
# `unix_micros` only accepts the LTZ TimestampType, and casting NTZ->LTZ
# drags the session timezone into the value — so epoch arithmetic on event
# time goes through timestamp_diff/timestamp_add against a fixed NTZ epoch:
# bit-exact, timezone-independent, and identical to DuckDB's epoch_us() on
# its naive TIMESTAMP.

_NTZ_EPOCH_SQL = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def ntz_epoch() -> Column:
    return F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")


def epoch_us(col: Column | str) -> Column:
    """Naive epoch microseconds of a TIMESTAMP_NTZ column (long)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", ntz_epoch(), c)


def ntz_from_us(col: Column | str) -> Column:
    """Inverse of epoch_us: long microseconds -> TIMESTAMP_NTZ."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_add("MICROSECOND", c, ntz_epoch())


def sql_spark_epoch_us(expr: str) -> str:
    """Spark-SQL text form of epoch_us, for F.expr() fragments that need
    integer `div` (Column has no exact integer-division operator)."""
    return f"timestampdiff(MICROSECOND, {_NTZ_EPOCH_SQL}, {expr})"


# ---- SQL fragment generators for the DuckDB oracle side -------------------


def sql_scaled_long(expr: str, scale: int) -> str:
    return f"CAST(FLOOR(({expr}) * {scale} + 0.5) AS BIGINT)"


def sql_money_sum(expr: str, scale: int = 100) -> str:
    return f"(SUM({sql_scaled_long(expr, scale)}) / {float(scale)})"


def sql_money_avg(expr: str, scale: int = 100) -> str:
    return f"(SUM({sql_scaled_long(expr, scale)}) / ({float(scale)} * COUNT(*)))"
