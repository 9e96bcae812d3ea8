"""Bucketed (co-located) table layout — the shuffle-free join path.

The reference's SQLite composite indexes on (ticker, date) / (series_id,
date) (/root/reference/src/database.py:124-136) exist to make keyed lookups
and joins cheap. The Spark equivalent at scale is bucketing: both fact tables
written with ``bucketBy(n, key)`` + ``sortBy(key)`` hash-place rows so a
subsequent equi-join on the bucket key needs **no exchange and no sort** —
the join degenerates to a per-bucket zip-merge. At 100 TB this converts the
dominant repeated join (e.g. lineitem ⋈ orders on orderkey) from a full
2-sided shuffle into a local merge, paid once at write time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_keys: list[str],
    num_buckets: int = 8,
) -> None:
    """Persist as a bucketed+sorted external table registered in the session
    catalog (bucket metadata lives in the catalog, so reads must go through
    ``spark.table``, not ``read.parquet``)."""
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_keys)
        .sortBy(*bucket_keys)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Equi-join two tables bucketed on the join key. With matching bucket
    counts the planner emits a SortMergeJoin with zero Exchange operators
    (verified in tests via the physical plan)."""
    return spark.table(left_table).join(spark.table(right_table), on)
