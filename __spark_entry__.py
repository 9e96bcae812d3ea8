"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship time-series feature query at sf0.001;
``queries()``/``oracle_sql()`` expose the full SURVEY.md §2 registry
(multi_source_financial_data_pipeline_spark.plans.registry).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from multi_source_financial_data_pipeline_spark.plans.registry import (  # noqa: E402
    oracle_map,
    query_map,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return query_map()["ts_features"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_map()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each queries() entry."""
    return oracle_map()
