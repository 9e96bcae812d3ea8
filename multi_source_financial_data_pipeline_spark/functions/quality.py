"""Quality scoring + recommendation rules (SURVEY.md §2.7 F9/F10).

Reference: /root/reference/src/output_manager.py:149-252. These run driver-
side over collected aggregate results (a handful of scalars), not over data —
the heavy lifting happened in the distributed aggregations that produced the
inputs. The reference's dead reliability branch (SURVEY.md §4: it reads keys
the pipeline never writes) is wired correctly here.
"""

from __future__ import annotations


def basic_quality_score(total_issues: int, total_nulls: int) -> float:
    """max(0, 100 - (issues + nulls/10) * 5)  (src/output_manager.py:150-163)."""
    return max(0.0, 100.0 - (total_issues + total_nulls / 10.0) * 5.0)


def reliability_score(discrepancies: int, comparisons: int) -> float | None:
    """max(0, 100 - discrepancies/comparisons*100); None when no comparisons
    ran (the reference reports "N/A")  (src/output_manager.py:166-172)."""
    if comparisons <= 0:
        return None
    return max(0.0, 100.0 - discrepancies / comparisons * 100.0)


def overall_score(basic: float, reliability: float | None) -> float:
    """0.7*basic + 0.3*reliability, or basic alone when reliability is N/A
    (src/output_manager.py:183-190)."""
    if reliability is None:
        return basic
    return basic * 0.7 + reliability * 0.3


def recommendations(
    *,
    total_nulls: int = 0,
    duplicate_rows: int = 0,
    extreme_moves: int = 0,
    discrepancies: int = 0,
    comparisons: int = 0,
) -> list[str]:
    """Threshold-based recommendation strings (src/output_manager.py:194-252)."""
    recs: list[str] = []
    if total_nulls > 0:
        recs.append(
            f"Found {total_nulls} null values - consider data source reliability"
        )
    if duplicate_rows > 0:
        recs.append(f"Removed {duplicate_rows} duplicate records - check fetch logic")
    if extreme_moves > 0:
        recs.append(
            f"Detected {extreme_moves} extreme price movements - verify market events"
        )
    if comparisons > 0:
        if discrepancies > 0:
            recs.append(
                f"Found {discrepancies} price discrepancies between sources - "
                "review data quality"
            )
        else:
            recs.append("Cross-validation passed - price data is consistent")
    if not recs:
        recs.append("Data quality checks passed - no issues detected")
    return recs
