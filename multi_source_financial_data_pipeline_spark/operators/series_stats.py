"""Grouped series statistics (SURVEY.md §2.5 A6-A9) — macro-validation parity.

Reference: ``validate_macro_data`` at /root/reference/src/macro.py:278-326
loops series-by-series in Python; here the whole per-series breakdown is one
``groupBy`` with map-side partial aggregation, and the global summary is one
``agg`` pass. Exact min/max/count only — no float sums — so oracle hashes
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def per_series_summary(
    df: DataFrame,
    series_col: str = "series_id",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """A8 (src/macro.py:309-322): per series — record count, null count,
    min/max value, first/last date."""
    return df.groupBy(series_col).agg(
        F.count(F.lit(1)).alias("record_count"),
        (F.count(F.lit(1)) - F.count(value_col)).alias("null_values"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
        F.min(date_col).alias("first_date"),
        F.max(date_col).alias("last_date"),
    )


def global_summary(
    df: DataFrame,
    series_col: str = "series_id",
    date_col: str = "date",
    value_col: str = "value",
) -> DataFrame:
    """A9 + A6/A7 (src/macro.py:288-306, src/database.py:308-329): one row —
    totals, distinct series, overall date range, value nulls."""
    return df.agg(
        F.count(F.lit(1)).alias("total_records"),
        F.countDistinct(series_col).alias("unique_series"),
        F.min(date_col).alias("first_date"),
        F.max(date_col).alias("last_date"),
        (F.count(F.lit(1)) - F.count(value_col)).alias("null_values"),
    )


def ledger_current_status(ledger: DataFrame) -> DataFrame:
    """K6 'current status' for the append-only request ledger: per request,
    the terminal event (completed/failed) wins over 'started'; ties break on
    request_timestamp. Replaces the reference's in-place UPDATE
    (src/database.py:159-175)."""
    from pyspark.sql import Window

    terminal = F.when(F.col("status") == "started", 0).otherwise(1)
    w = Window.partitionBy("request_id").orderBy(
        terminal.desc(), F.col("request_timestamp").desc()
    )
    return (
        ledger.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_per_key(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """K6 'current status' view (src/database.py:159-175): the reference
    UPDATEs a ledger row in place; the idiomatic Spark ledger is append-only
    events + latest-row-per-key window."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
