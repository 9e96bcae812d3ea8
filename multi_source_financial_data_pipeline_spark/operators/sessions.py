"""Event-time operators beyond the reference's surface: as-of join,
sessionization, time-bucket rollup (hypertable-style continuous aggregate).

The reference has only equi-joins (SURVEY.md §2.4); these are the canonical
time-series extensions a financial/training-data engine needs, implemented
with the scalable union-window pattern rather than per-row range probes:

- **as-of join**: tag left/right rows, union, one window sort per key, carry
  the last right value forward (`last(..., ignoreNulls=True)`). One shuffle +
  one sort — the same cost as any window — versus a naive range join's
  quadratic per-key scan. This is how you as-of-join two 10-TB tables.
- **sessionization**: gap detection with lag + a running sum of
  session-starts; two window passes, no state explosion.
- **time-bucket rollup**: plain groupBy on a truncated timestamp — partial
  aggregation makes it one map-side-combined shuffle.

Timestamps cross the oracle boundary as epoch microseconds (integer, timezone-
free, bit-exact in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str,
) -> DataFrame:
    """For each left row, the latest right row of the same key with
    right_ts <= left_ts (inclusive; ties among right rows break on the
    largest `tiebreak`). Left rows with no prior right row keep nulls.

    Returned columns: all left columns + ``asof_<value>`` for each value col
    + ``asof_ts`` (epoch micros of the matched right row).
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        F.col(key),
        F.col(right_ts).alias(left_ts),
        F.col(tiebreak),
        F.lit(0).alias("__side"),
        F.unix_micros(F.col(right_ts)).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    combined = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal timestamps, so an
    # exactly-simultaneous right row is visible to the left row (<= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(left_ts, "__side", tiebreak)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = combined
    for c in value_cols:
        out = out.withColumn(
            f"asof_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    out = out.withColumn("asof_ts", F.last(F.col("__r_ts"), ignorenulls=True).over(w))
    return out.filter(F.col("__side") == 1).select(
        *lcols, *[f"asof_{c}" for c in value_cols], "asof_ts"
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign session ids per key: a new session starts when the gap from the
    previous event exceeds `gap_seconds`. Returns the input plus
    ``session_id`` (0-based per key)."""
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    gap_us = F.unix_micros(F.col(ts_col)) - prev_us
    is_new = F.when(
        prev_us.isNull() | (gap_us > gap_seconds * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(key).orderBy(ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_id", F.sum(is_new).over(running) - 1)


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    value_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: bounds (epoch micros), event count, and a
    decimal-exact value sum (the 2-decimal input grid makes the sum
    bit-identical across engines)."""
    s = sessionize(df, key, ts_col, tiebreak, gap_seconds)
    return s.groupBy(key, "session_id").agg(
        F.min(F.unix_micros(F.col(ts_col))).alias("session_start_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_value"),
    )


def time_bucket_rollup(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    group_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Continuous-aggregate-style rollup: truncate the event time to `bucket`
    ('hour', 'day', ...) and aggregate per (bucket, groups)."""
    b = F.date_trunc(bucket, F.col(ts_col))
    return df.groupBy(
        F.unix_micros(b).alias("bucket_us"), *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(12,2)")).cast("double").alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_us: int,
    right_cols: list[str],
) -> DataFrame:
    """Range join — all (left, right) pairs of the same key with
    ``|right_ts - left_ts| <= tolerance`` — as an equi join.

    Naive range joins degenerate to a per-key nested loop (BroadcastNestedLoop
    at cluster scale: quadratic and unshardable). The scale-safe plan buckets
    time by the tolerance: a matching pair can then differ by at most one
    bucket, so replicating the right side into its bucket ±1 turns the range
    predicate into an equi key ``(key, bucket)`` — one ordinary shuffled hash
    join (3× right-side replication), with the exact |Δt| predicate applied
    as a post-join filter. Each true pair matches exactly once (the left row
    has a single bucket; the three replicas carry distinct buckets).

    Returned columns: all left columns + ``<right col>`` for each requested
    right column + ``dt_us`` (right minus left, microseconds).
    """
    # integer `div` bucketing — double division risks flooring into the
    # neighboring bucket when epoch_us/tolerance lands within an ulp of an
    # integer; `div` is exact, and |bucket(x)-bucket(y)| <= 1 still holds for
    # |x-y| <= tolerance under truncating division (monotone, step <= 1)
    l = left.withColumn("__l_us", F.unix_micros(F.col(left_ts))).withColumn(
        "__bucket", F.expr(f"__l_us div {tolerance_us}")
    )
    r = (
        right.withColumn("__r_us", F.unix_micros(F.col(right_ts)))
        .withColumn("__r_bucket", F.expr(f"__r_us div {tolerance_us}"))
        .select(
            F.col(key),
            "__r_us",
            F.explode(
                F.array(*[F.col("__r_bucket") + k for k in (-1, 0, 1)])
            ).alias("__bucket"),
            *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        )
    )
    joined = l.join(r, [key, "__bucket"]).filter(
        F.abs(F.col("__r_us") - F.col("__l_us")) <= tolerance_us
    )
    return joined.select(
        *left.columns,
        *[F.col(f"__r_{c}").alias(c) for c in right_cols],
        (F.col("__r_us") - F.col("__l_us")).alias("dt_us"),
    )
