"""QuerySpec: one oracle-checked query = (Spark callable, DuckDB oracle SQL)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """``oracle`` is None for ops that are not SQL-expressible (the driver
    then records a weaker rows-only check)."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
