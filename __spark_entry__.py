"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (and the [EXT] tier of §2.7) with DuckDB oracle twins.
Implementations live in ``etl_poor_main_pipeline_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from etl_poor_main_pipeline_spark import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference silver transform shape (filter -> project -> CASE bucket
    -> literal, analytics__us_weather.py:34-53) on lineitem.
    """
    return _registry.q_flagship_silver(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.7."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every oracle-expressible query (160 of 165,
    including the drained streaming pipelines, the streamed custom-sink
    round-trip, and the full ANN tier — IVF/SRP/PQ rank on integer
    micro-distances / seeded-literal planes so even the approximate
    paths get full parity); the 5 rows-only entries are the inherently
    engine-specific approximations: HLL/percentile sketches,
    approx_count_distinct, MinHash-LSH, SimHash."""
    return _registry.oracle_sql()
