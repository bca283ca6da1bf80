"""t20_database_etl_pipeline_assignment_spark — a PySpark-native analytics/ETL
engine with the declared capability surface of the reference
(sankarbvsb1543/T20-Database-ETL-Pipeline-Assignment) re-expressed Spark-first.

Importing this package registers every implemented operator from SURVEY.md §2
into `registry.QUERIES` / `registry.ORACLES`; `__spark_entry__.py` re-exports
them for the driver.
"""

from __future__ import annotations

from . import exprs, pipeline, registry, session  # noqa: F401
from .plans import inspect as plan_inspect  # noqa: F401
from .sources import tables  # noqa: F401
from .functions import scalar  # noqa: F401
from .streaming import cdc_sink as stream_cdc  # noqa: F401
from .streaming import scd2_sink as stream_scd2  # noqa: F401
from .streaming import windows as stream_windows  # noqa: F401

# Operator modules register themselves on import.
from .operators import (  # noqa: F401
    aggregates,
    analytics,
    etl,
    extras5,
    geo,
    io_ops,
    lakehouse,
    llm,
    multimodal,
    partitioned,
    quality,
    relational,
    star,
    timeseries,
    udfs,
    windows,
)

__all__ = ["registry", "session", "exprs", "tables"]
