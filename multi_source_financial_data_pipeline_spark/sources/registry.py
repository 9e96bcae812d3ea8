"""Macro series registry (SURVEY.md §2.1 S6).

Same public FRED series-id registry and category fan-out the reference ships
(/root/reference/src/macro.py:49-87, category map :248-257) — these are
public data identifiers, kept identical so category→series resolution matches.
"""

from __future__ import annotations

#: series_id -> human-readable name
FRED_SERIES: dict[str, str] = {
    # interest rates
    "FEDFUNDS": "Federal Funds Rate",
    "DGS10": "10-Year Treasury Rate",
    "DGS2": "2-Year Treasury Rate",
    "DGS3MO": "3-Month Treasury Rate",
    "MORTGAGE30US": "30-Year Mortgage Rate",
    # inflation
    "CPIAUCSL": "Consumer Price Index",
    "CPILFESL": "Core CPI",
    "PCEPI": "PCE Price Index",
    "T5YIE": "5-Year Breakeven Inflation",
    # employment
    "UNRATE": "Unemployment Rate",
    "PAYEMS": "Nonfarm Payrolls",
    "ICSA": "Initial Jobless Claims",
    "CIVPART": "Labor Force Participation",
    # growth
    "GDP": "Gross Domestic Product",
    "GDPC1": "Real GDP",
    "INDPRO": "Industrial Production",
    "RSAFS": "Retail Sales",
    # money & markets
    "M2SL": "M2 Money Supply",
    "WALCL": "Fed Balance Sheet",
    "VIXCLS": "VIX Volatility Index",
    "DEXUSEU": "USD/EUR Exchange Rate",
    "DCOILWTICO": "WTI Crude Oil Price",
}

#: category -> series ids (the 8-category fan-out)
CATEGORIES: dict[str, list[str]] = {
    "rates": ["FEDFUNDS", "DGS10", "DGS2", "DGS3MO", "MORTGAGE30US"],
    "inflation": ["CPIAUCSL", "CPILFESL", "PCEPI", "T5YIE"],
    "employment": ["UNRATE", "PAYEMS", "ICSA", "CIVPART"],
    "growth": ["GDP", "GDPC1", "INDPRO", "RSAFS"],
    "money": ["M2SL", "WALCL"],
    "markets": ["VIXCLS", "DEXUSEU", "DCOILWTICO"],
    "fx": ["DEXUSEU"],
    "energy": ["DCOILWTICO"],
}


def resolve_categories(categories: list[str] | None = None) -> list[str]:
    """Category → deduped series-id list, preserving first-seen order
    (src/macro.py:248-269)."""
    if categories is None:
        categories = list(CATEGORIES)
    seen: dict[str, None] = {}
    for cat in categories:
        for sid in CATEGORIES.get(cat, []):
            seen.setdefault(sid)
    return list(seen)


def series_name(series_id: str) -> str:
    """Reverse lookup with identity fallback (src/macro.py:165-168)."""
    return FRED_SERIES.get(series_id, series_id)
