"""Deterministic stratified sampling for training-data mixtures.

A corpus mixture ("keep all of stratum A, a quarter of stratum B") must be
reproducible across runs, engines, and re-partitionings — `df.sample()` is
none of those (seeded per-partition, so any repartition changes the kept
set). The standard fix: a uniform hash of the ROW KEY thresholded against
the stratum's rate. Keep/drop is then a pure function of (key, rates) —
stable under shuffles, cluster size, and engine — and the same row set can
be re-derived at any time from the rates alone, which also makes the sample
auditable (DuckDB oracle reproduces it bit-for-bit).

Scale: one projection + filter, no shuffle, no state; the md5 is the same
per-row cost the dedup fingerprint already pays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: 2^32 — the md5-prefix hash below is uniform on [0, 2^32)
_HASH_SPACE = float(1 << 32)


def hash_uniform(key: Column) -> Column:
    """Uniform double in [0, 1) from the first 8 hex chars of md5(key) —
    the same 32-bit md5-prefix construction the MinHash operators use
    (`operators/dedup.py`), so the oracle mirrors it with the identical
    ('0x' || substr(md5(x), 1, 8))::BIGINT idiom."""
    h32 = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
    return h32 / F.lit(_HASH_SPACE)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each row iff hash_uniform(key) < rate(stratum). Expected kept
    fraction per stratum equals its rate; the decision is row-local and
    deterministic. Unlisted strata fall back to `default_rate` (0.0 = drop,
    the safe default for an explicit mixture spec)."""
    u = hash_uniform(F.col(key_col))
    rate = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == value, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)


def sample_rate_sql(stratum_col: str, rates: dict[str, float], default_rate: float = 0.0) -> str:
    """The DuckDB mirror of the rate ladder. Built from the same dict so the
    Spark plan and the oracle can never drift apart."""
    clauses = "".join(
        f" WHEN {stratum_col} = '{v}' THEN {float(r)!r}"
        for v, r in sorted(rates.items(), reverse=True)
    )
    return f"CASE{clauses} ELSE {float(default_rate)!r} END"
