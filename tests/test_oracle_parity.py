"""Local replica of the driver's t2 correctness gate: every registry query
with an oracle must match DuckDB exactly (row count + sorted order-insensitive
values) at sf0.001. Exact float equality is intentional — the engine's oracle
strategy (decimal-exact sums, mirrored fold order, boundary-safe rounding) is
designed to survive a value-hash comparison, and this test proves it.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from multi_source_financial_data_pipeline_spark.plans.registry import QUERIES
from multi_source_financial_data_pipeline_spark.sources.tables import TABLE_NAMES

ORACLE_NAMES = sorted(n for n, s in QUERIES.items() if s.oracle is not None)


_CONS: dict[str, duckdb.DuckDBPyConnection] = {}


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    if sf_dir not in _CONS:
        con = duckdb.connect()
        # explicit resource caps: DuckDB's default memory limit is derived
        # from host RAM at connect time, and sharing the box with a Spark
        # JVM across a 113-oracle session has produced OutOfMemory flakes —
        # a fixed budget keeps the oracle side deterministic
        con.execute("SET memory_limit='16GB'")
        con.execute("SET threads TO 8")
        for t in TABLE_NAMES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        _CONS[sf_dir] = con
    return _CONS[sf_dir]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        # date vs datetime is a pandas-conversion artifact (DuckDB DATE →
        # datetime64, Spark DateType → datetime.date); compare as timestamps
        if df[col].dtype.kind == "M":
            df[col] = pd.to_datetime(df[col]).astype("datetime64[ns]")
        elif df[col].dtype == object and len(df) and df[col].map(
            lambda v: hasattr(v, "toordinal"), na_action="ignore"
        ).eq(True).all():
            df[col] = pd.to_datetime(df[col]).astype("datetime64[ns]")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    got = _normalize(spec.fn(spark, sf_dir).toPandas())
    want = _normalize(_duck(sf_dir).sql(spec.oracle).df())

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for col in got.columns:
        g, w = got[col].to_numpy(), want[col].to_numpy()
        # The driver hashes raw values, so 99111 (Spark bigint) vs 99111.0
        # (DuckDB HUGEINT→float64 via pandas) is a hash MISMATCH even though
        # the numbers are equal. Pin kind-parity DIRECTLY for every column
        # (int widths i/u collapse): an object-dtype HUGEINT/Decimal would
        # compare == against a plain int yet hash differently, so it must
        # fail here, not slip past a float/non-float split.
        kind = lambda d: "i" if d.kind in "iu" else d.kind  # noqa: E731
        assert kind(g.dtype) == kind(w.dtype), (
            f"{name}.{col}: dtype kind mismatch {g.dtype} vs {w.dtype} "
            "(driver hash-compares raw values; CAST the oracle to match)"
        )
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            g = g.astype(float)
            w = w.astype(float)
            both_nan = np.isnan(g) & np.isnan(w)
            assert np.array_equal(g[~both_nan], w[~both_nan]), (
                f"{name}.{col}: float values differ "
                f"(max abs diff {np.nanmax(np.abs(g - w)) if len(g) else 0})"
            )
        else:
            assert np.array_equal(g.astype(object), w.astype(object)), (
                f"{name}.{col}: values differ"
            )


def test_no_query_is_hollow(sf_dir):
    """Every oracle must select real rows at the smallest scale factor — a
    0 == 0 parity pass proves nothing (a date window outside the synthetic
    data's range once made a query trivially green)."""
    con = _duck(sf_dir)
    empty = [
        name
        for name in ORACLE_NAMES
        if len(con.sql(QUERIES[name].oracle).df()) == 0
    ]
    assert not empty, f"oracles returning zero rows: {empty}"
