"""exprs.py determinism helpers: the DECIMAL(38,0) money accumulators must
stay exact past int64 (the 100 TB overflow class closed in round 6) and
their final double conversion must round to nearest — bit-matching both
Python's exact int->float conversion and the oracle's VARCHAR-hop cast."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.exprs import (
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
)

# 40 values of ~9e17 cents each: the exact sum 3.6e19 overflows int64
# (9.2e18) — a BIGINT accumulator raises under ANSI; DECIMAL(38,0) must not
_BIG = 9_100_000_000_000_000.00  # 9.1e15 dollars -> 9.1e17 cents/row
_N = 40


def _exact_expected() -> float:
    total_cents = _N * int(_BIG * 100)
    return float(total_cents) / 100.0  # Python: exact int -> nearest double


def test_money_sum_survives_int64_overflow(spark):
    df = spark.range(_N).select(F.lit(_BIG).alias("v"))
    got = df.agg(money_sum(F.col("v")).alias("s")).collect()[0]["s"]
    assert got == _exact_expected()


def test_money_sum_long_accumulator_would_have_failed(spark):
    """Regression guard for WHY the decimal accumulator exists: the same
    sum through a bigint accumulator overflows (ANSI error) — if Spark's
    config ever stops erroring here, this pin flags that the failure mode
    changed and the rationale needs re-checking."""
    df = spark.range(_N).select(F.lit(_BIG).alias("v"))
    long_sum = F.sum(F.floor(F.col("v") * 100 + F.lit(0.5)).cast("long"))
    with pytest.raises(Exception, match="(?i)overflow"):
        df.agg(long_sum.alias("s")).collect()


def test_money_sum_matches_oracle_varchar_hop(spark):
    """Past 2^53 the decimal->double conversion is a genuine rounding
    decision; Spark and the DuckDB VARCHAR-hop must make the same one."""
    vals = [9_007_199_254_740_993.31 + i / 7.0 for i in range(25)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(
        money_sum(F.col("v")).alias("s"), money_avg(F.col("v")).alias("a")
    ).collect()[0]
    con = duckdb.connect()
    # CAST to DOUBLE: the real oracle reads DOUBLE parquet columns, while a
    # bare VALUES literal parses as DECIMAL and changes the arithmetic type
    con.execute("CREATE TABLE t AS SELECT CAST(v AS DOUBLE) AS v FROM (VALUES " +
                ",".join(f"({v!r})" for v in vals) + ") AS s(v)")
    want = con.execute(
        f"SELECT {sql_money_sum('v')} AS s, {sql_money_avg('v')} AS a FROM t"
    ).fetchone()
    con.close()
    assert (got["s"], got["a"]) == want


def test_money_sum_small_values_unchanged(spark):
    """The decimal path must be invisible at fixture scale: sums below
    2^53 are exactly representable, so the result equals the plain exact
    quotient."""
    vals = [1.01, 2.02, 3.03, -0.5, 1000.99]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(money_sum(F.col("v")).alias("s")).collect()[0]["s"]
    assert got == round(sum(round(v * 100) for v in vals)) / 100.0