"""Local replica of the driver's differential oracle gate.

Runs a registered PySpark query and its DuckDB oracle SQL over the same
parquet fixtures, then compares row-count, schema shape, and exact values
after order-insensitive normalization (sort columns by name, sort rows by all
columns). Stricter than the driver (exact equality, with a tolerance-based
diagnostic on failure) so that anything passing here passes the real gate.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from t20_database_etl_pipeline_assignment_spark.sources.tables import TABLE_NAMES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        dt = pdf[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    sort_cols = list(pdf.columns)
    key = pdf.copy()
    for c in sort_cols:
        if key[c].dtype == object:
            key[c] = key[c].astype(str)
    order = key.sort_values(by=sort_cols, kind="mergesort").index
    return pdf.loc[order].reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, qid: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{qid}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{qid}: columns {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv.dtype):
            same = (
                (sv.isna() & ov.isna())
                | (sv == ov)
            )
            if not same.all():
                bad = (~same).idxmax()
                close = np.isclose(sv.fillna(0), ov.fillna(0), rtol=1e-9, atol=1e-9).all()
                raise AssertionError(
                    f"{qid}: float col {c} differs at row {bad}: "
                    f"{sv[bad]!r} vs {ov[bad]!r} (allclose={close})"
                )
        else:
            same = (sv.isna() & ov.isna()) | (sv.astype(str) == ov.astype(str))
            if not same.all():
                bad = (~same).idxmax()
                raise AssertionError(
                    f"{qid}: col {c} differs at row {bad}: {sv[bad]!r} vs {ov[bad]!r}"
                )


def check_query(spark, qid: str, sf_dir: str) -> int:
    from t20_database_etl_pipeline_assignment_spark.registry import ORACLES, QUERIES

    df = QUERIES[qid](spark, sf_dir)
    spark_pdf = df.toPandas()
    if qid not in ORACLES:
        assert len(spark_pdf) >= 0
        if math.isnan(len(spark_pdf)):  # pragma: no cover
            raise AssertionError("unreachable")
        return len(spark_pdf)
    con = duck_connect(sf_dir)
    try:
        oracle_pdf = con.execute(ORACLES[qid]).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, qid)
    return len(spark_pdf)
