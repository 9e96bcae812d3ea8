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
