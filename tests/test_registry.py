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
    with pytest.raises(AssertionError, match="no_such_query_typo"):
        registry._collect()


def test_every_query_has_oracle_or_documented_exemption():
    # rows-only (no-oracle) checks are a deliberate, enumerated exception
    no_oracle = {n for n, s in registry.QUERIES.items() if s.oracle is None}
    assert no_oracle == set(), f"queries without oracle SQL: {sorted(no_oracle)}"


def test_round5_window_covers_all_r04_stale_queries():
    """The round-5 gate window holds every STALE query: one with a driver
    row in some earlier round but none in r04. Queries new in round 5
    (never recorded anywhere) deliberately wait for the r06 rotation —
    all 50 slots go to the stale backlog."""
    root = pathlib.Path(__file__).resolve().parents[1]
    r04_path = root / "CORRECTNESS_r04.json"
    if not r04_path.exists():
        pytest.skip("no r04 correctness record")
    r04 = set(json.loads(r04_path.read_text()))
    ever_recorded: set[str] = set()
    for p in root.glob("CORRECTNESS_r*.json"):
        ever_recorded |= set(json.loads(p.read_text()))
    window = list(registry.QUERIES)[:50]
    stale = (set(registry.QUERIES) & ever_recorded) - r04
    assert stale <= set(window)
