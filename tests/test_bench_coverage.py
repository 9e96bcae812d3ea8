"""Registry ↔ bench completeness (r07 VERDICT item 5): silent bench gaps
cannot recur — every registered query either has a HEADLINE bench row or an
explicit exemption with the reason its wall-clock would not measure engine
throughput."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXEMPT, HEADLINE

from multi_source_financial_data_pipeline_spark.plans.registry import QUERIES


def test_every_registered_query_benched_or_exempted():
    registered = set(QUERIES)
    benched = set(HEADLINE)
    exempt = set(EXEMPT)
    assert benched <= registered, sorted(benched - registered)
    assert exempt <= registered, sorted(exempt - registered)
    # no double-booking: an exemption for a benched query is stale
    assert not (benched & exempt), sorted(benched & exempt)
    missing = registered - benched - exempt
    assert missing == set(), (
        f"queries with no bench decision (add to HEADLINE or EXEMPT with a "
        f"reason): {sorted(missing)}"
    )
    # every exemption carries a substantive reason
    for name, reason in EXEMPT.items():
        assert reason and len(reason) > 15, (name, reason)


def test_headline_has_no_duplicates():
    assert len(HEADLINE) == len(set(HEADLINE))


def test_exemption_representatives_exist_and_are_covered():
    """An exemption that points at a representative ("same shape as X",
    "inside X") must point at a real query that itself has a bench
    decision — so a HEADLINE removal can't silently orphan the exemptions
    that lean on it."""
    import re

    for name, reason in EXEMPT.items():
        refs = [
            r for r in re.findall(r"[a-z0-9_]{4,}", reason)
            if r in QUERIES and r != name
        ]
        for ref in refs:
            assert ref in HEADLINE or ref in EXEMPT, (
                f"{name}'s exemption references {ref}, which has no bench "
                f"decision"
            )


def test_window_vs_comparison_self_describing():
    """The bench record embeds its own window context (r12 verdict item 2):
    the median/quartile per-query ratio vs the pinned BENCH_COMPARISON.json.
    Replays the computation against the pinned record itself (ratio 1.0
    everywhere) and checks the two refusal paths (SF mismatch, too few
    shared names)."""
    import json
    import pathlib

    from bench import window_vs_comparison

    comp = json.loads(
        (pathlib.Path(__file__).resolve().parents[1] / "BENCH_COMPARISON.json")
        .read_text()
    )
    assert comp["queries"] and comp["sf"] == 0.1 and comp["record_id"]
    w = window_vs_comparison(dict(comp["queries"]), comp["sf"])
    assert w is not None
    assert w["shared_queries"] == len(comp["queries"])
    assert w["median_ratio"] == w["p25_ratio"] == w["p75_ratio"] == 1.0
    assert w["comparison_record"] == comp["record_id"]
    # cross-SF ratios measure data volume, not the host window → refused
    assert window_vs_comparison(dict(comp["queries"]), 0.01) is None
    # a handful of shared names is not a distribution → refused
    few = dict(list(comp["queries"].items())[:4])
    assert window_vs_comparison(few, comp["sf"]) is None
