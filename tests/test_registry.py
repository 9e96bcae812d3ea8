"""Registry invariants: the driver's correctness gate records the first 50
dict-order entries, so the registry must (a) resolve every _GATE_PRIORITY
name (a renamed query must fail at import, not silently drop out of the
checked window) and (b) keep gate names first in dict order."""

import json
import pathlib

import pytest

from multi_source_financial_data_pipeline_spark.plans import registry


def test_gate_priority_all_resolve():
    assert set(registry._GATE_PRIORITY) <= set(registry.QUERIES)


def test_gate_priority_leads_dict_order():
    names = list(registry.QUERIES)
    assert names[: len(registry._GATE_PRIORITY)] == list(registry._GATE_PRIORITY)


def test_gate_priority_typo_fails_at_collect(monkeypatch):
    monkeypatch.setattr(
        registry,
        "_GATE_PRIORITY",
        registry._GATE_PRIORITY[:-1] + ("no_such_query_typo",),
    )
    with pytest.raises(ValueError, match="no_such_query_typo"):
        registry._collect()


def test_every_query_has_oracle_or_documented_exemption():
    # rows-only (no-oracle) checks are a deliberate, enumerated exception
    no_oracle = {n for n, s in registry.QUERIES.items() if s.oracle is None}
    assert no_oracle == set(), f"queries without oracle SQL: {sorted(no_oracle)}"


def test_round6_window_fronts_never_checked_then_oldest():
    """The round-6 gate window front-loads every query the driver has NEVER
    recorded (the 13 round-5 additions), then backfills exclusively with
    queries whose latest row is the OLDEST on record (the r04 set — two
    rounds old by r06). Nothing with a fresh r05 row wastes a slot."""
    root = pathlib.Path(__file__).resolve().parents[1]
    records = sorted(root.glob("CORRECTNESS_r*.json"))
    if len(records) < 2:
        pytest.skip("need at least two correctness records")
    latest = set(json.loads(records[-1].read_text()))
    ever_recorded: set[str] = set()
    for p in records:
        ever_recorded |= set(json.loads(p.read_text()))
    window = list(registry.QUERIES)[:50]
    never = set(registry.QUERIES) - ever_recorded
    # every never-checked query that is IN the window leads it (queries
    # added after the rotation was sized legitimately wait for the next one,
    # exactly as the r05 additions waited for r06)
    never_in_window = never & set(window)
    assert set(window[: len(never_in_window)]) == never_in_window
    # the round-5 backlog is fully front-loaded
    r05_new = {
        "media_real_decode", "media_real_resize", "media_real_frames",
        "stream_media_features", "ann_topk_ivf_probe", "ann_recall_ivf",
        "ann_recall_lsh", "mixture_resample", "unigram_prob",
        "dup_span_stats", "weekly_bars", "max_drawdown", "mad_outliers",
    }
    assert r05_new <= set(window[:13]) | ever_recorded
    # no slot is wasted on a query checked in the latest round
    assert not (set(window) & latest)
