"""Spatial proximity join via grid bucketing.

Reference parity: the reference declares generic "match data" /
analysis capability (reference README.md:2,10); proximity matching is
the spatial instance of that capability, and the grid-bucketed
formulation is the one that survives 100 TB — the same
bucket-then-probe shape as the MinHash band join (operators/llm.py) and
the interval grid join (operators/relational.py join_range_bucketed).

The fixture has no coordinate columns, so each user gets a
DETERMINISTIC synthetic position derived from the md5-based 60-bit
portable hash of user_id (operators/llm.hash60 — identical on both
engines); a multiplicative-lattice derivation was rejected because
consecutive ids land on a sparse lattice with no close pairs. Distance is squared-Euclidean in exact
integer milli-degrees (flat grid; at city-scale radii the haversine
correction is a constant factor that cannot change the comparison's
side, and staying integer keeps both engines bit-identical — libm trig
is NOT guaranteed to round identically across JVM and DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import table
from .llm import _sql_hash60, hash60

_CELL = 20000  # grid cell size == search radius, in milli-degrees (20 deg)
_R_SQ = _CELL * _CELL

_SQL_H = _sql_hash60("CAST(user_id AS VARCHAR)")
_SQL_POINTS = f"""
SELECT user_id,
       {_SQL_H} % 180000 AS lat_md,
       ({_SQL_H} // 180000) % 360000 AS lon_md
FROM (SELECT DISTINCT user_id FROM events)
"""


@query(
    "geo_grid_distance_join",
    oracle=f"""
WITH pts AS ({_SQL_POINTS})
SELECT a.user_id AS user_a, b.user_id AS user_b,
       (a.lat_md - b.lat_md) * (a.lat_md - b.lat_md)
         + (a.lon_md - b.lon_md) * (a.lon_md - b.lon_md) AS dist_sq
FROM pts a JOIN pts b ON a.user_id < b.user_id
WHERE (a.lat_md - b.lat_md) * (a.lat_md - b.lat_md)
        + (a.lon_md - b.lon_md) * (a.lon_md - b.lon_md) <= {_R_SQ}
""",
)
def geo_grid_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All user pairs within {radius} milli-degrees of each other, found
    WITHOUT the quadratic all-pairs comparison the oracle spells: each
    point lands in one (lat//cell, lon//cell) home cell; the probe side
    is expanded to its 3x3 neighbor cells (cell size == radius, so any
    within-radius partner's home cell is one of the nine); the equi-join
    on cell keys then touches only O(n * local density) candidate pairs.
    Each qualifying pair is produced exactly once — the expanded side
    carries the smaller user_id and the home side has a unique home
    cell. This is the canonical spatial-join plan at 100 TB: shuffle on
    cell keys, no broadcast needed, no cross join (and the plan linter
    would reject one). Longitude does not wrap at the antimeridian —
    same flat-grid convention on both engines."""
    e = table(spark, sf_dir, "events").select("user_id").distinct()
    # hash60 exceeds 2^53, so the lon derivation must stay in integer
    # DIV — float `/` would round the quotient before the modulo
    pts = e.select(
        "user_id", hash60(F.col("user_id").cast("string")).alias("h")
    ).select(
        "user_id",
        F.expr("h % 180000").alias("lat_md"),
        F.expr("(h DIV 180000) % 360000").alias("lon_md"),
    )
    # home cell per point (coordinates are non-negative, so Spark's DIV
    # and DuckDB's // agree; no floor-vs-truncate hazard)
    home = pts.select(
        F.col("user_id").alias("user_b"),
        F.col("lat_md").alias("lat_b"),
        F.col("lon_md").alias("lon_b"),
        F.expr(f"lat_md DIV {_CELL}").alias("cell_lat"),
        F.expr(f"lon_md DIV {_CELL}").alias("cell_lon"),
    )
    offsets = spark.range(-1, 2).selectExpr("id AS dlat").crossJoin(
        spark.range(-1, 2).selectExpr("id AS dlon")
    )
    probe = (
        pts.select(
            F.col("user_id").alias("user_a"),
            F.col("lat_md").alias("lat_a"),
            F.col("lon_md").alias("lon_a"),
            F.expr(f"lat_md DIV {_CELL}").alias("base_lat"),
            F.expr(f"lon_md DIV {_CELL}").alias("base_lon"),
        )
        .crossJoin(F.broadcast(offsets))  # 9-way expansion, broadcast side is 9 rows
        .select(
            "user_a",
            "lat_a",
            "lon_a",
            (F.col("base_lat") + F.col("dlat")).alias("cell_lat"),
            (F.col("base_lon") + F.col("dlon")).alias("cell_lon"),
        )
    )
    d_lat = F.col("lat_a") - F.col("lat_b")
    d_lon = F.col("lon_a") - F.col("lon_b")
    dist_sq = d_lat * d_lat + d_lon * d_lon
    return (
        probe.join(home, ["cell_lat", "cell_lon"])
        .filter((F.col("user_a") < F.col("user_b")) & (dist_sq <= F.lit(_R_SQ)))
        .select("user_a", "user_b", dist_sq.alias("dist_sq"))
    )
