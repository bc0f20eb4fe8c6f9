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
    """DuckDB twins for EVERY registered query — including the drained streaming
    pipelines, the streamed custom-sink round-trip, the full ANN tier
    (IVF/SRP/PQ rank on integer micro-distances / seeded-literal planes),
    MinHash-LSH and SimHash (portable polynomial token hash + fixed-seed
    coefficient literals the DuckDB twin reproduces arithmetically), and
    the sketch family (HLL / approx-percentile), whose twins pin the exact
    anchor values plus the sketch's deterministic accuracy claim."""
    return _registry.oracle_sql()
