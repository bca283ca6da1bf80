"""Sources and sinks: scans with declared schemas, partitioned/JDBC/full-load
sinks.

Reference parity: SURVEY.md §2.A, from the reference's declared ingestion and
load surface (reference README.md:10 "extract raw data from multiple sources …
load it into SQL Server", README.md:4,14 "Incremental Load, Full Load",
README.md:8,14 "Data Partitioning"). The reference's serving store is SQL
Server; no SQL Server exists here, so the JDBC sink targets the embedded Derby
database that ships with Spark — the same public `format("jdbc")` code path a
SQL Server URL would use (only url/driver options differ).

Round-trip strategy: the driver's fixtures are Parquet-only, so the CSV/JSON
scans and all sinks are exercised by *round-tripping* a fixture table through
the format into a temp directory and returning the read-back result; the
DuckDB oracle reads the original Parquet. A value-hash match therefore proves
the write+read cycle is lossless.

Scale notes (100 TB):
- Scans declare explicit schemas (no inference pass over petabytes) and stay
  on Spark's vectorized readers; filters/projections push down.
- The partitioned sink is the layout primitive that makes partition pruning
  possible downstream; at scale you'd add bucketing on the join key.
- `full_load` is a single `mode("overwrite")` write — atomic-per-table via
  the output committer; `incr_load_watermark` (operators/etl.py) is the
  incremental counterpart.
- JDBC writes at scale are bounded by the RDBMS, not Spark: control
  parallelism with `numPartitions` + `batchsize` so the target isn't
  overwhelmed by 1000 executors writing at once.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import money_sum, scaled_long, sql_money_sum
from ..registry import query
from ..sources import python_source
from ..sources.tables import table


def _tmp(sf_dir: str, name: str) -> str:
    """Deterministic scratch path per (sf, op); safe to overwrite."""
    token = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    return os.path.join(tempfile.gettempdir(), f"t20_io_{token}_{name}")


def _tmp_per_process(sf_dir: str, name: str) -> str:
    """Scratch path additionally keyed by PID — for embedded Derby, which
    locks its database directory to ONE JVM: a second process (e.g. the
    vanilla-session contract subprocess running beside the in-process test
    session) must get its own database, not a boot conflict."""
    return _tmp(sf_dir, f"{name}_{os.getpid()}")


# ---------------------------------------------------------------------------
# Scans with declared schemas
# ---------------------------------------------------------------------------

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER_SCHEMA = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART_SCHEMA = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)


@query("scan_parquet", oracle="SELECT * FROM customer")
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-validated Parquet scan: the declared StructType is enforced at
    plan time instead of inferred, so a drifted upstream file fails fast
    (reference README.md:12 "data integrity") rather than poisoning the load.
    """
    return spark.read.schema(CUSTOMER_SCHEMA).parquet(f"{sf_dir}/customer.parquet")


@query("scan_csv", oracle="SELECT * FROM supplier")
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with explicit schema + PERMISSIVE bad-record handling,
    exercised as a lossless round-trip of the supplier table (doubles print
    via shortest-round-trip, so read-back is bit-exact).
    """
    path = _tmp(sf_dir, "csv")
    table(spark, sf_dir, "supplier").write.mode("overwrite").option("header", "true").csv(path)
    return (
        spark.read.schema(SUPPLIER_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


@query("scan_json", oracle="SELECT * FROM part")
def scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with explicit schema (no inference pass), round-
    tripping the part table."""
    path = _tmp(sf_dir, "json")
    table(spark, sf_dir, "part").write.mode("overwrite").json(path)
    return spark.read.schema(PART_SCHEMA).json(path)


@query("scan_csv_gzip", oracle="SELECT * FROM part")
def scan_csv_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed landing-zone source: gzip CSV round-trip of the part
    table. The 100 TB design note gzip forces: the codec is UNSPLITTABLE —
    one task per .gz file no matter the size — so the writer repartitions
    to several files and a production feed keeps individual .gz objects
    bounded (or lands zstd/bzip2, which split). Read-side is the same
    explicit-schema PERMISSIVE CSV reader as scan_csv; Spark picks the
    codec off the extension."""
    path = _tmp(sf_dir, "csv_gz")
    (
        table(spark, sf_dir, "part")
        .repartition(4)  # keep parallelism despite the unsplittable codec
        .write.mode("overwrite")
        .option("header", "true")
        .option("compression", "gzip")
        .csv(path)
    )
    return (
        spark.read.schema(PART_SCHEMA)
        .option("header", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


@query("scan_avro", oracle="SELECT * FROM customer")
def scan_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro landing-zone source — the last README.md:10 "multiple sources"
    format, served WITHOUT the spark-avro jar: a pure-Python object-
    container reader (sources/avro_io.py, spec-faithful: zigzag varints,
    deflate codec, sync-marker-delimited blocks) behind the custom Python
    DataSource API (sources/avro_source.py). Round-trips the customer dim
    through TWO container files — one null-codec, one deflate — and reads
    them back with block-level InputPartitions, the same split model the
    JVM connector uses: Avro blocks are length-prefixed and sync-
    terminated, so one 100 TB container file still scans in parallel
    (contrast scan_csv_gzip's unsplittable-codec note). The stage-side
    toPandas here is a bounded dim write chosen so this face exercises
    TWO codecs in one directory; the production writer is
    sources/avro_io.write_avro — one container per partition via
    mapInPandas, round-trip-tested against this same reader in
    tests/test_avro_source.py."""
    from ..sources import avro_io
    from ..sources.avro_source import AvroContainerDataSource

    path = _tmp(sf_dir, "avro")
    os.makedirs(path, exist_ok=True)
    pdf = table(spark, sf_dir, "customer").toPandas()
    schema = {
        "type": "record",
        "name": "customer",
        "fields": [
            {"name": "c_custkey", "type": "long"},
            {"name": "c_name", "type": "string"},
            {"name": "c_nationkey", "type": "int"},
            {"name": "c_acctbal", "type": "double"},
            {"name": "c_mktsegment", "type": "string"},
        ],
    }
    recs = pdf.to_dict("records")
    mid = len(recs) // 2
    avro_io.write_container(
        os.path.join(path, "part-0.avro"), schema, recs[:mid],
        codec="null", records_per_block=256,
    )
    avro_io.write_container(
        os.path.join(path, "part-1.avro"), schema, recs[mid:],
        codec="deflate", records_per_block=256,
    )
    spark.dataSource.register(AvroContainerDataSource)
    # blocks_per_split=8 (~4 splits per container here) still demonstrates
    # block-level parallel scan while keeping tasks right-sized — the r10
    # A/B measured 30 two-block splits at +0.1–0.2 s of pure Python-worker
    # task dispatch over 8 splits, the guide-§6 small-task tax in miniature
    # (decode itself is 0.08 s for the whole file).
    return (
        spark.read.format("t20_avro").option("blocks_per_split", "8").load(path)
    )


@query("scan_orc", oracle="SELECT * FROM nation")
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip — Spark's second first-class columnar
    format (vectorized reader, predicate pushdown, same partitioning story
    as Parquet). Exercised on the nation dim."""
    path = _tmp(sf_dir, "orc")
    table(spark, sf_dir, "nation").write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "scan_text",
    oracle="""
SELECT doc_id, text FROM documents WHERE doc_id < 100
""",
)
def scan_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-line text source (`spark.read.text`) — the raw-feed shape for
    log/corpus ingestion: one `value` column per line, structure recovered
    by the transform layer. Round-trips tab-joined (doc_id, text) lines and
    re-parses them with JVM-side string ops (no UDF). Fixture texts are
    single-line and tab-free, so the framing is lossless."""
    path = _tmp(sf_dir, "text")
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    d.select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("text")).alias("value")
    ).write.mode("overwrite").text(path)
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 2)
    return lines.select(
        parts.getItem(0).cast("long").alias("doc_id"),
        parts.getItem(1).alias("text"),
    )


@query(
    "scan_json_badrecords",
    oracle="SELECT * FROM part WHERE p_partkey % 10 <> 0",
)
def scan_json_badrecords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE JSON ingestion with corrupt-record routing (reference
    README.md:12 "error handling … throughout the ETL process"): every 10th
    row of the part table is written as deliberately malformed JSON; the
    scan parses with a declared schema + `_corrupt_record` column and routes
    bad lines out instead of failing the job. The oracle is the clean subset
    — proving the parser recovered every valid row and only the valid rows.
    At 100 TB the corrupt side feeds the same quarantine sink as
    dq_quarantine; `columnNameOfCorruptRecord` keeps raw bytes for replay.
    """
    path = _tmp(sf_dir, "json_bad")
    p = table(spark, sf_dir, "part")
    good = F.to_json(F.struct(*[F.col(c) for c in p.columns]))
    line = F.when(F.col("p_partkey") % 10 == 0, F.concat(F.lit("{corrupt!"), good)).otherwise(
        good
    )
    p.select(line.alias("value")).write.mode("overwrite").text(path)
    # StructType.add mutates in place — build a fresh copy so repeated
    # invocations in one process don't accumulate duplicate columns.
    schema = T.StructType(
        list(PART_SCHEMA.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return parsed.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


# ---------------------------------------------------------------------------
# Sinks
# ---------------------------------------------------------------------------


@query(
    "sink_parquet_partitioned",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n_rows, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_parquet_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned Parquet sink (reference README.md:8,14 "Data
    Partitioning"): write lineitem partitioned by l_returnflag, read it back,
    and aggregate per partition — proving the layout is lossless and that a
    partition-pruned scan sees every row exactly once.
    """
    path = _tmp(sf_dir, "part_sink")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_orderkey").alias("key_sum"),
    )


@query("sink_avro", oracle="SELECT * FROM customer")
def sink_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Avro sink (reference README.md:10 "load ... multiple
    formats" family): the customer dim written with
    sources/avro_io.write_avro — ONE object-container file per partition,
    records encoded EXECUTOR-side via mapInPandas, Avro schema derived
    from the DataFrame (avro_schema) — then read back through the same
    t20_avro block-split source and hash-matched against the parquet
    original. This is the production counterpart of scan_avro's bounded
    driver-side fixture write: a 1000-executor job writes 1000 containers
    in parallel with no driver materialization, and the deflate codec
    proves compressed framing round-trips. The driver only collects the
    per-partition (file, n_records) manifest."""
    from ..sources.avro_io import write_avro
    from ..sources.avro_source import AvroContainerDataSource

    path = _tmp(sf_dir, "avro_sink")
    write_avro(
        table(spark, sf_dir, "customer").repartition(4), path, codec="deflate"
    )
    spark.dataSource.register(AvroContainerDataSource)
    return spark.read.format("t20_avro").load(path)


@query(
    "full_load",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key,
       {sql_money_sum("o_totalprice")} AS total
FROM orders
""",
)
def full_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-load strategy (reference README.md:4,14): truncate-and-reload the
    target via `mode("overwrite")`, then audit the reloaded table against the
    source with count/min/max/exact-sum — the standard post-load reconciliation
    check (README.md:12 "data integrity and consistency").
    """
    path = _tmp(sf_dir, "full_load")
    table(spark, sf_dir, "orders").write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        money_sum(F.col("o_totalprice")).alias("total"),
    )


@query(
    "join_bucketed_colocated",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       {sql_money_sum("l_extendedprice")} AS total_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketing — THE layout move for
    repeated big-table joins at 100 TB. Both sides are written bucketed into
    16 buckets on the join key; Spark's bucketed scan then satisfies the
    join's distribution requirement directly, so the sort-merge join runs
    with ZERO Exchange on either side (pinned by
    tests/test_plan_quality.py::test_bucketed_join_has_no_exchange).
    One-time write cost, amortized across every subsequent join/agg on the
    key. `sortBy` within buckets also drops the per-task sort at read time.
    """
    import shutil

    def ensure_bucketed(tbl: str, src: DataFrame, key: str) -> DataFrame:
        """Build-once / probe-many: write the bucketed layout only if its
        files don't already exist; a later session re-registers the
        existing files as an external bucketed table instead of paying the
        write again (the amortization that makes bucketing worth it)."""
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        loc = os.path.join(warehouse, tbl)
        built = os.path.exists(os.path.join(loc, "_SUCCESS"))
        if spark.catalog.tableExists(tbl) and built:
            return spark.table(tbl)
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        if built:
            cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in src.schema)
            spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 16 BUCKETS "
                f"LOCATION '{loc}'"
            )
        else:
            shutil.rmtree(loc, ignore_errors=True)
            src.write.mode("overwrite").bucketBy(16, key).sortBy(key).option(
                "path", loc
            ).format("parquet").saveAsTable(tbl)
        return spark.table(tbl)

    token = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    o = ensure_bucketed(f"orders_b_{token}", table(spark, sf_dir, "orders"), "o_orderkey")
    li = ensure_bucketed(
        f"lineitem_b_{token}",
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        "l_orderkey",
    )
    # merge hint: model the 100 TB case where NEITHER side broadcasts — the
    # whole point of bucketing. (At toy SF Spark would otherwise broadcast
    # the small side and never show the shuffle-free SMJ this layout buys.)
    return (
        o.hint("merge").join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum(F.col("l_extendedprice")).alias("total_price"),
        )
    )


@query("sink_jdbc", oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation")
def sink_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDBMS load via Spark's public JDBC source/sink (reference
    README.md:2,10,14 "load it into SQL Server"). Targets embedded Derby (the
    JDBC engine bundled with Spark) — swapping in SQL Server is only a url /
    driver / numPartitions change. Write mode("overwrite") models the
    truncate-and-reload path; read-back through the same JDBC source proves
    the round trip is lossless.
    """
    db = _tmp_per_process(sf_dir, "derby")
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    opts = {"url": url, "driver": driver, "dbtable": "NATION_SINK"}
    nat = table(spark, sf_dir, "nation")
    nat.write.format("jdbc").options(**opts).mode("overwrite").save()
    back = spark.read.format("jdbc").options(**opts).load()
    # Derby stores Spark StringType as CLOB; normalize names/types to the dim.
    return back.select(
        F.col("N_NATIONKEY").cast("int").alias("n_nationkey"),
        F.col("N_NAME").cast("string").alias("n_name"),
        F.col("N_REGIONKEY").cast("int").alias("n_regionkey"),
    )


@query(
    "scan_parquet_schema_evolution",
    oracle="""
SELECT p_brand,
       COUNT(*) AS n_rows,
       COUNT(CASE WHEN p_size <= 25 THEN p_retailprice END) AS n_with_price,
       CAST(SUM(CASE WHEN p_size <= 25
                     THEN CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) END)
            AS BIGINT) AS price_cents
FROM part
GROUP BY p_brand
""",
)
def scan_parquet_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read (reference README.md:10 "multiple sources",
    12 "error handling"): an early batch wrote (p_partkey, p_name, p_brand),
    a later batch added p_retailprice; `mergeSchema` unions the schemas and
    back-fills NULL for pre-evolution rows. The aggregate proves every row
    survived and the new column is populated exactly on the rows that
    carried it. At 100 TB keep mergeSchema OFF for steady-state scans (it
    reads every footer) and evolve via table-level metadata instead —
    documented here because this operator is the migration-day path."""
    path = _tmp(sf_dir, "schema_evo")
    p = table(spark, sf_dir, "part")
    old = p.filter(F.col("p_size") > 25).select("p_partkey", "p_name", "p_brand")
    new = p.filter(F.col("p_size") <= 25).select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )
    old.write.mode("overwrite").parquet(path + "/batch=1")
    new.write.mode("overwrite").parquet(path + "/batch=2")
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("p_retailprice").alias("n_with_price"),
        F.sum(scaled_long(F.col("p_retailprice"), 100)).alias("price_cents"),
    )


@query(
    "sink_overwrite_dynamic_partition",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       {sql_money_sum("CASE WHEN l_returnflag = 'A' THEN l_quantity + 1 ELSE l_quantity END")} AS sum_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def sink_overwrite_dynamic_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill sink
    (reference README.md:4,8 incremental loads + partitioning): a full load
    lays down all l_returnflag partitions, then a corrected 'A' batch
    overwrites ONLY its own partition (partitionOverwriteMode=dynamic);
    untouched partitions must survive byte-for-byte. This is how a 100 TB
    pipeline re-runs one bad day without rewriting the table; the readback
    aggregate proves exactly the A rows changed."""
    path = _tmp(sf_dir, "dyn_overwrite")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )
    li.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    fixed = (
        li.filter(F.col("l_returnflag") == "A")
        .withColumn("l_quantity", F.col("l_quantity") + 1)
    )
    (
        fixed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("l_returnflag")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        money_sum(F.col("l_quantity")).alias("sum_qty"),
    )


def sqlserver_column_types(schema) -> str:
    """`createTableColumnTypes` for a SQL Server JDBC sink (reference
    README.md:2,10,14 declares the load target as SQL Server). Spark's
    generic JDBC mapping emits types SQL Server rejects or mangles
    (StringType → TEXT is deprecated/invalid, timestamps → DATETIME loses
    µs); this maps every Spark type to the native dialect: NVARCHAR(MAX)
    for unicode strings, DATETIME2(6) for µs-precision timestamps, BIT for
    booleans, VARBINARY(MAX) for binary. No SQL Server endpoint exists in
    this container, so the mapping is unit-tested structurally
    (tests/test_jdbc_dialect.py) and the round-trip test activates only
    when T20_SQLSERVER_JDBC_URL is set — Derby remains the always-on
    embedded stand-in (sink_jdbc / scan_jdbc_partitioned)."""
    from pyspark.sql import types as T

    def ddl(dt: "T.DataType") -> str:
        if isinstance(dt, T.DecimalType):
            return f"DECIMAL({dt.precision},{dt.scale})"
        mapping = {
            T.StringType: "NVARCHAR(MAX)",
            T.TimestampType: "DATETIME2(6)",
            T.TimestampNTZType: "DATETIME2(6)",
            T.DateType: "DATE",
            T.BooleanType: "BIT",
            T.DoubleType: "FLOAT",
            T.FloatType: "REAL",
            T.LongType: "BIGINT",
            T.IntegerType: "INT",
            T.ShortType: "SMALLINT",
            T.ByteType: "TINYINT",
            T.BinaryType: "VARBINARY(MAX)",
        }
        for spark_t, sql_t in mapping.items():
            if isinstance(dt, spark_t):
                return sql_t
        raise ValueError(f"no SQL Server mapping for Spark type {dt}")

    return ", ".join(f"{f.name} {ddl(f.dataType)}" for f in schema.fields)


def sqlserver_jdbc_options(schema, url: str, table_name: str) -> dict:
    """The full option set for a SQL Server JDBC load — exposed as a dict
    so callers (and tests) can inspect the assembled dialect before any
    connection is attempted."""
    return {
        "url": url,
        "driver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
        "dbtable": table_name,
        "createTableColumnTypes": sqlserver_column_types(schema),
    }


def sqlserver_jdbc_writer(df: DataFrame, url: str, table_name: str):
    """Configured DataFrameWriter for a SQL Server load: dialect column
    types + the Microsoft driver class. Usage:
    `sqlserver_jdbc_writer(df, url, "dbo.dim_customer").mode(...).save()`"""
    return df.write.format("jdbc").options(
        **sqlserver_jdbc_options(df.schema, url, table_name)
    )


@query(
    "scan_jdbc_partitioned",
    oracle=f"""
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total
FROM orders WHERE o_orderkey < 2000
GROUP BY o_orderstatus
""",
)
def scan_jdbc_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel JDBC ingest: read the RDBMS through N range-partitioned
    queries (partitionColumn/lowerBound/upperBound/numPartitions) instead
    of one connection — the only way a JDBC extract scales. Each of the 4
    mappers issues its own bounded SELECT; the aggregate proves the range
    split covered every row exactly once (no seam gaps/overlaps at the
    bounds). At 100 TB-adjacent scale the cap is the RDBMS: size
    numPartitions to what the source can serve, never one-per-executor."""
    db = _tmp_per_process(sf_dir, "derby_scan")
    url = f"jdbc:derby:{db};create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    opts = {"url": url, "driver": driver, "dbtable": "ORDERS_SRC"}
    src = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    marker = os.path.join(db, "service.properties")
    if not os.path.exists(marker):  # seed the source RDBMS once per fixture
        src.write.format("jdbc").options(**opts).mode("overwrite").save()
    back = (
        spark.read.format("jdbc")
        .options(**opts)
        .option("partitionColumn", "O_ORDERKEY")
        .option("lowerBound", "0")
        .option("upperBound", "2000")
        .option("numPartitions", "4")
        .load()
    )
    return back.groupBy(
        F.col("O_ORDERSTATUS").cast("string").alias("o_orderstatus")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("O_TOTALPRICE").cast("double")).alias("total"),
    )


@query(
    "sink_compact_small_files",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       {sql_money_sum("l_extendedprice")} AS total_price
FROM lineitem
""",
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance job every long-lived
    100 TB lake needs: a fragmented landing zone (here: one file per
    l_linenumber value via artificial repartitioning) is rewritten into a
    handful of right-sized files with a single `repartition(4)` pass, and
    the readback aggregate proves compaction is lossless. At scale the
    target file count is data_size / ~512 MB, driven by a file-size audit,
    and runs per partition so only fragmented partitions rewrite. Small
    files are a real scale-killer: footer/open overhead per task and
    scheduler pressure grow with file count, not bytes."""
    frag = _tmp(sf_dir, "fragmented")
    compact = _tmp(sf_dir, "compacted")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    li.repartition("l_linenumber", "l_orderkey").write.mode("overwrite").parquet(frag)
    spark.read.parquet(frag).repartition(4).write.mode("overwrite").parquet(compact)
    back = spark.read.parquet(compact)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        money_sum(F.col("l_extendedprice")).alias("total_price"),
    )


def scan_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Opaque-file ingestion via Spark's built-in `binaryFile` source — the
    entry point that turns a directory of raw media/artifact files into the
    (file_name, length, content) relation the multimodal operators consume.

    Library surface (no registry entry: a static DuckDB oracle cannot name
    runtime file paths); byte-exactness is proven by
    tests/test_llm_ops.py::test_binaryfile_source_roundtrip, which writes
    payloads as loose files, reads them back through this scan, and
    hash-compares content against the written bytes.

    Scale notes: `binaryFile` never splits a file, so parallelism = file
    count and small-file overhead is the dominant cost at scale — compact
    upstream (sink_compact_small_files) or bundle payloads into a parquet
    binary column (multimodal_bundle) once ingested; this source is the
    landing-zone reader, not the steady-state layout. Payload bytes stream
    executor-side only; the driver never sees them. `pathGlobFilter` prunes
    at file-listing time, before any read."""
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return df.select(
        F.regexp_extract("path", "[^/]+$", 0).alias("file_name"),
        "length",
        "content",
    )


@query(
    "scan_python_datasource",
    oracle=f"""
SELECT CAST(i % {python_source.SYNTH_GROUPS} AS INT) AS grp,
       COUNT(*) AS n_rows,
       CAST(SUM((i * {python_source.SYNTH_MULT}) % {python_source.SYNTH_MOD}) AS BIGINT)
         AS sum_amount,
       CAST(MIN((i * {python_source.SYNTH_MULT}) % {python_source.SYNTH_MOD}) AS BIGINT)
         AS min_amount,
       CAST(MAX((i * {python_source.SYNTH_MULT}) % {python_source.SYNTH_MOD}) AS BIGINT)
         AS max_amount
FROM range(0, {python_source.SYNTH_ROWS}) t(i)
GROUP BY 1
""",
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python Data Source scan (Spark 4 extension API) — the
    connector surface for feeds with no built-in source. The reader plans
    8 InputPartitions (one task each, a shard-per-partition ingest), and
    the generated stream is pure integer arithmetic, so the DuckDB oracle
    replays it exactly from range(). See sources/python_source.py for the
    scale framing; this is intentionally the only row-at-a-time Python
    scan in the repo, quarantined the same way as the §2.K UDF surface."""
    from ..sources.python_source import SynthRowsDataSource

    spark.dataSource.register(SynthRowsDataSource)
    rows = spark.read.format("t20_synth").load()
    return rows.groupBy(F.col("grp").cast("int").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("amount").alias("sum_amount"),
        F.min("amount").alias("min_amount"),
        F.max("amount").alias("max_amount"),
    )


@query(
    "union_schema_evolution",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS o_channel, 'v1' AS batch_ver
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_custkey, o_totalprice,
       o_orderpriority AS o_channel, 'v2' AS batch_ver
FROM orders WHERE o_orderkey % 2 = 1
""",
)
def union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform-side schema evolution: merge batches whose schemas
    drifted (a v2 feed grew an `o_channel` column) with
    `unionByName(allowMissingColumns=True)` — columns align BY NAME, the
    missing column NULL-fills, and nothing depends on column order. The
    read-side counterpart is scan_parquet_schema_evolution (mergeSchema);
    this is the in-flight merge an ingestion job does when both feed
    versions are live at once — at 100 TB that overlap window is weeks,
    not a cutover instant."""
    o = table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice", F.lit("v1").alias("batch_ver")
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderpriority").alias("o_channel"),
        F.lit("v2").alias("batch_ver"),
    )
    return v1.unionByName(v2, allowMissingColumns=True)
