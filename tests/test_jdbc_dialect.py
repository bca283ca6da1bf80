"""SQL Server dialect surface (reference README.md:2,10,14): the type
mapping is unit-tested without an endpoint; the round-trip activates only
when T20_SQLSERVER_JDBC_URL points at a live server (documented no-op
fallback — the suite stays green in this endpoint-less container, where
Derby covers the always-on JDBC path)."""

from __future__ import annotations

import os

import pytest

from t20_database_etl_pipeline_assignment_spark.operators.io_ops import (
    sqlserver_column_types,
    sqlserver_jdbc_writer,
)


def test_sqlserver_type_mapping(spark):
    df = spark.createDataFrame(
        [],
        "c_name string, ts timestamp, ts_ntz timestamp_ntz, d date, ok boolean, "
        "x double, y float, n bigint, i int, s smallint, b tinyint, "
        "blob binary, money decimal(12,2)",
    )
    assert sqlserver_column_types(df.schema) == (
        "c_name NVARCHAR(MAX), ts DATETIME2(6), ts_ntz DATETIME2(6), d DATE, "
        "ok BIT, x FLOAT, y REAL, n BIGINT, i INT, s SMALLINT, b TINYINT, "
        "blob VARBINARY(MAX), money DECIMAL(12,2)"
    )


def test_sqlserver_unmappable_type_is_loud(spark):
    df = spark.createDataFrame([], "v array<int>")
    with pytest.raises(ValueError, match="no SQL Server mapping"):
        sqlserver_column_types(df.schema)


def test_sqlserver_writer_carries_dialect_options(spark):
    from t20_database_etl_pipeline_assignment_spark.operators.io_ops import (
        sqlserver_jdbc_options,
    )

    df = spark.createDataFrame([(1, "a")], "k bigint, v string")
    opts = sqlserver_jdbc_options(df.schema, "jdbc:sqlserver://example;database=dw", "dbo.t")
    assert opts["driver"] == "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    assert opts["createTableColumnTypes"] == "k BIGINT, v NVARCHAR(MAX)"
    assert opts["dbtable"] == "dbo.t"
    # the writer assembles without touching any endpoint
    sqlserver_jdbc_writer(df, opts["url"], "dbo.t")


@pytest.mark.skipif(
    not os.environ.get("T20_SQLSERVER_JDBC_URL"),
    reason="no SQL Server endpoint configured (set T20_SQLSERVER_JDBC_URL)",
)
def test_sqlserver_roundtrip_live(spark, sf_dir):
    from t20_database_etl_pipeline_assignment_spark.sources.tables import table

    url = os.environ["T20_SQLSERVER_JDBC_URL"]
    nat = table(spark, sf_dir, "nation")
    sqlserver_jdbc_writer(nat, url, "dbo.t20_nation_sink").mode("overwrite").save()
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", "com.microsoft.sqlserver.jdbc.SQLServerDriver")
        .option("dbtable", "dbo.t20_nation_sink")
        .load()
    )
    assert back.count() == nat.count()
