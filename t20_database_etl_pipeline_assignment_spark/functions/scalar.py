"""Scalar function surface (SURVEY.md §2.G) — the reference's "transform it
using PySpark" step (reference README.md:10) and the row-hash machinery its
SCD change detection needs (README.md:6).

Each query exercises one function family as a single scan+project plan —
pure whole-stage-codegen, no shuffle, no UDFs. Cross-engine semantic traps
handled here (documented because they WILL bite again):
- Spark dayofweek() is 1=Sunday, DuckDB's is 0=Sunday → use ISO weekday.
- Spark ceil/floor(double) return LONG, DuckDB's return DOUBLE → cast.
- DuckDB CAST(double AS BIGINT) *rounds*, Spark cast truncates → floor first.
- DuckDB regexp_replace replaces the first match unless given the 'g' flag;
  Spark always replaces all.
- DuckDB date_trunc('month', ts) returns DATE → cast back to TIMESTAMP.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table


@query(
    "fn_string",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS name_upper,
       lower(c_mktsegment) AS seg_lower,
       trim(c_name) AS name_trim,
       substring(c_name, 10, 8) AS name_digits,
       concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
       CAST(length(c_name) AS BIGINT) AS name_len,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       regexp_replace(c_name, '0', '', 'g') AS no_zeros,
       lpad(CAST(c_nationkey AS VARCHAR), 5, '0') AS nation_padded,
       split_part(c_name, '#', 2) AS after_hash
FROM customer
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim("c_name").alias("name_trim"),
        F.substring("c_name", 10, 8).alias("name_digits"),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", "0", "").alias("no_zeros"),
        F.lpad(F.col("c_nationkey").cast("string"), 5, "0").alias("nation_padded"),
        F.expr("split_part(c_name, '#', 2)").alias("after_hash"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(day(o_orderdate) AS BIGINT) AS order_day,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_weekday,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date math incl. the watermark arithmetic incremental load relies on
    (reference README.md:4)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.weekday("o_orderdate") + F.lit(1)).cast("long").alias("iso_weekday"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.date_add("o_orderdate", 30).cast("timestamp").alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@query(
    "fn_math",
    oracle="""
SELECT o_orderkey,
       round(o_totalprice, 1) AS price_round,
       abs(o_totalprice - 100000.0) AS price_dev,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       round(pow(o_totalprice, 0.5), 6) AS price_sqrt_pow,
       round(sqrt(o_totalprice), 6) AS price_sqrt,
       round(log10(o_totalprice), 6) AS price_log10,
       greatest(o_totalprice, 100000.0) AS price_hi,
       least(o_totalprice, 100000.0) AS price_lo
FROM orders
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(p, 1).alias("price_round"),
        F.abs(p - F.lit(100000.0)).alias("price_dev"),
        F.ceil(p).alias("price_ceil"),
        F.floor(p).alias("price_floor"),
        F.round(F.pow(p, F.lit(0.5)), 6).alias("price_sqrt_pow"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.greatest(p, F.lit(100000.0)).alias("price_hi"),
        F.least(p, F.lit(100000.0)).alias("price_lo"),
    )


@query(
    "fn_cast_coalesce",
    oracle="""
SELECT o_orderkey,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_resolved,
       NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS priority_or_null,
       COALESCE(NULLIF(o_orderpriority, '4-NOT SPECIFIED'), 'UNKNOWN') AS priority_nvl
FROM orders
""",
)
def fn_cast_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type conformance — "data integrity and consistency" (README.md:12)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_resolved"
        ),
        F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")).alias(
            "priority_or_null"
        ),
        F.nvl(
            F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED")), F.lit("UNKNOWN")
        ).alias("priority_nvl"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT c_custkey,
       sha256(concat_ws('||', c_name, c_mktsegment,
                        CAST(c_nationkey AS VARCHAR),
                        CAST(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS VARCHAR)))
         AS row_sha256,
       md5(c_name) AS name_md5
FROM customer
""",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-hash for SCD change detection (reference README.md:6) and dedup
    keys. Doubles enter the hash as exact scaled integers — double→string
    formatting is NOT guaranteed identical across engines."""
    c = table(spark, sf_dir, "customer")
    from ..exprs import scaled_long

    return c.select(
        "c_custkey",
        F.sha2(
            F.concat_ws(
                "||",
                F.col("c_name"),
                F.col("c_mktsegment"),
                F.col("c_nationkey").cast("string"),
                scaled_long(F.col("c_acctbal"), 100).cast("string"),
            ),
            256,
        ).alias("row_sha256"),
        F.md5("c_name").alias("name_md5"),
    )


@query(
    "fn_hash_xxhash64",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT c_name || '|' || c_mktsegment) AS BIGINT)
         AS n_distinct_xx64,
       CAST(16 AS BIGINT) AS n_buckets,
       CAST(0 AS BIGINT) AS min_bucket,
       CAST(15 AS BIGINT) AS max_bucket
FROM customer
""",
)
def fn_hash_xxhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64: the cheap 64-bit partition/shuffle-grade hash (JVM
    intrinsic, ~10× faster than sha2) — what we use at 100 TB for salting,
    sampling, and dedup bucketing where cryptographic strength is wasted.

    DuckDB has no xxhash64, so the driver-facing output is the hash's
    checkable contract instead of raw digests: distinct-hash count equals
    distinct-input count (collision-free at fixture scale — a 64-bit hash
    over ≤1e5 keys collides with p < 3e-10), and the salt buckets derived
    from pmod(xxhash64) cover exactly 0..15. Raw-digest stability is
    asserted in tests."""
    c = table(spark, sf_dir, "customer")
    hashed = c.select(
        F.xxhash64("c_name", "c_mktsegment").alias("xx64"),
        F.concat_ws("|", "c_name", "c_mktsegment").alias("key"),
        F.pmod(F.xxhash64("c_custkey"), F.lit(16)).alias("salt_bucket"),
    )
    return hashed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("xx64").alias("n_distinct_xx64"),
        F.countDistinct("salt_bucket").alias("n_buckets"),
        F.min("salt_bucket").alias("min_bucket"),
        F.max("salt_bucket").alias("max_bucket"),
    )


@query(
    "fn_array",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       list_contains(toks, 'the') AS has_the,
       array_to_string(toks[1:5], ' ') AS first5,
       array_to_string(list_sort(toks[1:5]), ' ') AS first5_sorted,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_unique
FROM t
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "the").alias("has_the"),
        F.concat_ws(" ", F.slice(toks, 1, 5)).alias("first5"),
        F.concat_ws(" ", F.sort_array(F.slice(toks, 1, 5))).alias("first5_sorted"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
    )


@query(
    "fn_map_json",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       array_to_string(json_keys(props), ',') AS prop_keys
FROM events
""",
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access over events.props (JSON string) — schema-on-read
    for the "multiple sources" ingestion surface (reference README.md:10)."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "map<string,string>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.concat_ws(",", F.map_keys(parsed)).alias("prop_keys"),
    )


@query(
    "fn_variant_json",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k,
       CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
GROUP BY event_type
""",
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    parse_json once into Variant's binary encoding, then typed
    variant_get extraction — the schema-on-read path that replaces
    repeated get_json_object string re-parsing. At 100 TB the parse
    happens once per row at ingestion and lands in a VARIANT column;
    every downstream extraction is a cheap binary traversal, and shredded
    storage keeps columnar pushdown. The extracted integers aggregate
    exactly; DuckDB mirrors via JSON extraction on the same strings."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.parse_json(F.col("props")).alias("vp")
    ).select(
        "event_type",
        F.variant_get(F.col("vp"), "$.k", "bigint").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0)).alias("n_even"),
    )


@query(
    "fn_struct_nested",
    oracle=f"""
SELECT l_orderkey,
       COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines,
       l_linenumber,
       CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c
FROM lineitem
""",
)
def fn_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type round-trip: collect each order's lines into a sorted
    array<struct>, then explode back out and access fields by dot path —
    the pack/unpack surface that denormalized document schemas (one row
    per order with nested lines) need. Lossless by construction; the
    oracle is the flat relation plus a per-order line count proving the
    array sizes survived. sort_array on the struct gives a canonical
    element order, so the round-trip is deterministic under shuffle."""
    from ..exprs import scaled_long

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        scaled_long(F.col("l_quantity"), 100).alias("qty_c"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "qty_c"))).alias("lines")
    )
    return nested.select(
        "l_orderkey",
        F.size("lines").cast("long").alias("n_lines"),
        F.explode("lines").alias("ln"),
    ).select(
        "l_orderkey",
        "n_lines",
        F.col("ln.l_linenumber").alias("l_linenumber"),
        F.col("ln.qty_c").alias("qty_c"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 65535) AS xored,
       CAST(bit_count(o_orderkey) AS INT) AS popcount,
       o_orderkey << 2 AS shifted_l,
       o_orderkey >> 3 AS shifted_r
FROM orders
WHERE o_orderkey < 5000
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family (&, |, xor, popcount, shifts) — the bit-level
    toolkit behind bloom filters, bitmap indexes, and the SimHash/banding
    machinery elsewhere in this engine. Pure codegen'd projections; integer
    semantics agree across engines (Spark bit_count returns INT, DuckDB
    BIGINT — cast pinned here)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(65535)).alias("xored"),
        F.bit_count(k).alias("popcount"),
        F.shiftleft(k, 2).alias("shifted_l"),
        F.shiftright(k, 3).alias("shifted_r"),
    )


@query(
    "fn_collation_group",
    oracle="""
WITH messy AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE p_type END AS t
  FROM part)
SELECT lower(t) AS type_lc, COUNT(*) AS n_parts
FROM messy GROUP BY lower(t)
""",
)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 string collations
    (UTF8_LCASE): the mixed-case feed (every even part key upper-cased)
    groups to one row per logical type WITHOUT a lower() projection —
    equality, hashing, and therefore the shuffle key all honor the
    collation. The driver-facing key is lower(representative) so the
    output is engine-deterministic (which case variant represents a
    collated group is not contractual); the oracle groups by lower()
    directly — identical partitions by construction."""
    p = table(spark, sf_dir, "part")
    messy = p.selectExpr(
        "p_partkey",
        "CASE WHEN p_partkey % 2 = 0 THEN upper(p_type) ELSE p_type END"
        " COLLATE UTF8_LCASE AS t",
    )
    return messy.groupBy("t").agg(F.count(F.lit(1)).alias("n_parts")).select(
        F.lower(F.col("t")).alias("type_lc"), "n_parts"
    )


@query(
    "fn_try_safe_math",
    oracle="""
SELECT o_orderkey,
       CASE WHEN (o_orderkey % 100) = 0 THEN NULL
            ELSE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                 // (o_orderkey % 100) END AS per_unit_cents,
       (o_orderkey % 100) = 0 AS div_by_zero_is_null,
       TRY_CAST(o_orderpriority AS BIGINT) AS prio_num,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
       COALESCE(TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT), -1)
         AS prio_resolved
FROM orders
""",
)
def fn_try_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-tolerant arithmetic and casts (reference README.md:12 "error
    handling … throughout the ETL process"): try_divide turns
    division-by-zero into NULL instead of a job-killing exception under
    ANSI mode, try_cast does the same for malformed strings ('1-URGENT'
    → NULL, its leading digit → 1). The NULL-not-crash contract is what
    lets a 100 TB load survive the one poisoned row in billions, with the
    NULLs routed to the dq_quarantine path downstream.

    Bench posture (do NOT "optimize" this face): the fixture INVERTS the
    production cost profile on purpose — o_orderpriority ('1-URGENT') is
    malformed for 100% of rows, so the full-string try_cast throws and
    catches a JVM NumberFormatException per row. Measured (r9 A/B,
    BASELINE.md "Accepted slow spots"): 0.16 s without that column,
    1.27 s with it, at sf0.1. At 100 TB poison rows are ~one-in-billions
    and the exception constant vanishes; making the fixture column
    castable would un-test the very contract this face exists to pin.
    Its ~1.0 scaling ratio at sf0.1 (PERF_r10) is the same artifact: the
    per-row exception cost on 150 k rows is a constant, not executor-CPU
    parallelism."""
    o = table(spark, sf_dir, "orders")
    denom = F.col("o_orderkey") % 100
    return o.select(
        "o_orderkey",
        F.when(denom == 0, F.lit(None).cast("long"))
        .otherwise(F.expr(
            "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
            " div (o_orderkey % 100)"
        ))
        .alias("per_unit_cents"),
        # the NULL-not-crash contract itself, as a checkable column
        F.try_divide(F.lit(1.0), denom).isNull().alias("div_by_zero_is_null"),
        F.col("o_orderpriority").try_cast("long").alias("prio_num"),
        F.substring("o_orderpriority", 1, 1).try_cast("long").alias("prio_digit"),
        F.coalesce(
            F.substring("o_orderpriority", 1, 1).try_cast("long"), F.lit(-1)
        ).alias("prio_resolved"),
    )
