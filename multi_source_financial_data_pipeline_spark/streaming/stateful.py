"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 extension — the reference has no streaming at all).

Running per-key totals across micro-batches: the canonical shape for live
per-ticker statistics (count / sum / min / max maintained incrementally as
batches drain). State is one fixed-size tuple per key — memory is O(keys),
not O(events) — and each batch's update emits the key's new totals, so the
sink always holds the latest value per key.

Exactness note: the running sum is kept in integer cents (the feed sits on a
2-decimal grid), so totals are associative and bit-reproducible regardless of
batch boundaries — the same trick the batch layer's DECIMAL sums use.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:
    import pandas as pd

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
        T.StructField("min_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("min_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def running_totals(
    stream: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Per-key running (count, sum, min, max) maintained in group state;
    emits the updated totals for every key seen in each micro-batch."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, sum_cents, mn, mx = (
            state.get if state.exists else (0, 0, None, None)
        )
        for pdf in batches:
            vals = pdf[value_col]
            n += len(vals)
            # per-value integer cents: exact and associative across
            # arbitrary batch splits
            sum_cents += int((vals * 100).round().astype("int64").sum())
            bmn, bmx = float(vals.min()), float(vals.max())
            mn = bmn if mn is None else min(mn, bmn)
            mx = bmx if mx is None else max(mx, bmx)
        state.update((n, sum_cents, mn, mx))
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_events": [n],
                "sum_value": [sum_cents / 100.0],
                "min_value": [mn],
                "max_value": [mx],
            }
        )

    return (
        stream.select(key_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
