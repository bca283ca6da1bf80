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
    """Order-insensitive exact SUM of a fixed-decimal double, as double.

    The accumulator is DECIMAL(38,0), not BIGINT: at 100 TB grain
    (~10^11 rows × ~10^9 scaled units) a long accumulator overflows
    int64 — the same overflow class as the round-5 dq_reconcile
    signature bug, closed here for every money aggregate at once.
    DECIMAL(38,0) mirrors DuckDB's HUGEINT sum semantics; the final
    decimal→double conversion rounds to nearest (matching the oracle's
    VARCHAR-hop, see sql_money_sum), then ONE IEEE division — still
    bit-identical across engines, now at any group size."""
    return F.sum(scaled_long(col, scale).cast("decimal(38,0)")) / F.lit(float(scale))


def money_avg(col: Column, scale: int = 100) -> Column:
    """Order-insensitive exact AVG of a fixed-decimal double, as double.
    DECIMAL(38,0) accumulator — see money_sum."""
    return F.sum(scaled_long(col, scale).cast("decimal(38,0)")) / (
        F.lit(float(scale)) * F.count(F.lit(1))
    )


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
    """DuckDB twin of money_sum. SUM(BIGINT) is HUGEINT in DuckDB (128-bit
    — already overflow-free); the VARCHAR hop makes the HUGEINT→DOUBLE
    conversion round-to-nearest like Spark's decimal→double, instead of
    DuckDB's truncating direct cast — the one-ulp divergence class that
    only appears once sums exceed 2^53 (see analytics.py agg_corr_matrix,
    where this pattern was first pinned)."""
    return (
        f"(CAST(CAST(SUM({sql_scaled_long(expr, scale)}) AS VARCHAR) AS DOUBLE)"
        f" / {float(scale)})"
    )


def sql_money_avg(expr: str, scale: int = 100) -> str:
    """DuckDB twin of money_avg — VARCHAR-hop rounding, see sql_money_sum."""
    return (
        f"(CAST(CAST(SUM({sql_scaled_long(expr, scale)}) AS VARCHAR) AS DOUBLE)"
        f" / ({float(scale)} * COUNT(*)))"
    )


def lit_double_array(vals) -> Column:
    """Array-of-double literal built as ONE parsed SQL expression instead of
    N `F.lit` Column objects. Value- and type-identical to
    `F.array(*[F.lit(float(v)) for v in vals])` (ArrayType(Double,
    containsNull=False)): Python `repr` of a float is the shortest
    round-tripping decimal, and Spark's SQL lexer parses `<repr>D` back to
    the identical IEEE-754 double. The win is driver-side latency, not plan
    shape — each `F.lit`/`F.array` is a Py4J round trip, so a 64-element
    plane/codebook/centroid literal costs ~50 ms to BUILD per query call
    (measured: 12×64 doubles = 0.58 s as lit-chains, 0.018 s as one
    string); operators that embed many such literals paid more wall time
    constructing the query than running it."""
    return F.expr("array(" + ",".join(repr(float(v)) + "D" for v in vals) + ")")


def lit_long_array(vals) -> Column:
    """Array-of-long literal as one parsed expression (see
    lit_double_array for the rationale)."""
    return F.expr("array(" + ",".join(str(int(v)) + "L" for v in vals) + ")")


def lit_string_array(vals) -> Column:
    """Array-of-string literal as one parsed expression (see
    lit_double_array). Single quotes are doubled per the SQL lexer; the
    fixture vocabularies contain no other escapes."""
    quoted = ("'" + str(v).replace("'", "''") + "'" for v in vals)
    return F.expr("array(" + ",".join(quoted) + ")")
