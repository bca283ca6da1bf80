"""Operator registry: the single source of truth behind the driver contract.

Every operator from SURVEY.md §2 registers here as
  - a PySpark query callable  (spark, sf_dir) -> DataFrame        (QUERIES)
  - optionally an equivalent DuckDB ANSI-SQL oracle string         (ORACLES)

`__spark_entry__.py` simply re-exports these dicts. Operators without a SQL
oracle (approximate / non-SQL-expressible ops) register with oracle=None and
get the driver's weaker rows-only check.

Determinism discipline (SURVEY.md §2 preamble): every computed column is
aliased identically on both sides; float aggregations over many rows are
expressed as exact integer arithmetic (see exprs.sql_money_sum) so that
Spark's and DuckDB's different summation orders cannot produce different
bits; collected lists are sorted; no current_timestamp anywhere.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(qid: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query callable and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if qid in QUERIES:
            raise ValueError(f"duplicate query id: {qid}")
        QUERIES[qid] = fn
        if oracle is not None:
            ORACLES[qid] = oracle
        return fn

    return deco
