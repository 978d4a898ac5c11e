"""Entity-linking cascade kernel (alias → direct → us-heuristic → fuzzy).

Pure-Python kernel reproducing the observable behavior of
``match_location_id`` (/root/reference/populate_author_locations.py:235-278),
shared by the Spark linking operator (broadcast into a pandas UDF) and the
pytest golden tests.  The fuzzy leg uses our from-scratch WRatio
(:mod:`.fuzzy`) instead of rapidfuzz — a documented delta.
"""

from __future__ import annotations

from dataclasses import dataclass

from . import _dictdata as D
from .fuzzy import extract_one
from .textkernels import mentions_us_state, normalize_lookup_text


@dataclass(frozen=True)
class LocationIndex:
    """Broadcast-able lookup state for the cascade."""

    name_to_canonical: dict[str, str]   # casefolded name -> canonical name
    names: tuple[str, ...]              # casefolded names, build order
    united_states: str | None
    aliases: tuple[tuple[str, str], ...]  # (alias substring, canonical name)


def build_location_index(
    locations: list[str] | None = None,
    aliases: dict[str, str] | None = None,
) -> LocationIndex:
    """Build the cascade lookup state.

    Parity notes (/root/reference/populate_author_locations.py:345-350):
    the lookup keys are ``name.casefold()``; the candidate list for the
    direct and fuzzy legs is the casefolded names in build order.
    """
    locations = D.COUNTRIES if locations is None else locations
    aliases = D.AUTHOR_LOCATION_ALIASES if aliases is None else aliases
    name_to_canonical = {loc.casefold(): loc for loc in locations}
    us = name_to_canonical.get("united states")
    alias_pairs = tuple(
        (alias, canonical)
        for alias, canonical in aliases.items()
        if canonical.casefold() in name_to_canonical
    )
    return LocationIndex(
        name_to_canonical=name_to_canonical,
        names=tuple(name_to_canonical.keys()),
        united_states=us,
        aliases=alias_pairs,
    )


def match_location(
    affiliation_text: str,
    index: LocationIndex,
    score_cutoff: float = 80.0,
) -> tuple[str | None, str]:
    """(canonical location name | None, method label).

    Method labels match the reference exactly: ``alias:<Canonical>``,
    ``direct``, ``us-heuristic``, ``fuzzy``, ``unmatched``
    (/root/reference/populate_author_locations.py:244-278).
    """
    normalized = normalize_lookup_text(affiliation_text)

    for alias, canonical in index.aliases:
        if alias in normalized:
            return (
                index.name_to_canonical[canonical.casefold()],
                f"alias:{canonical}",
            )

    direct = [name for name in index.names if name in normalized]
    if direct:
        direct.sort(key=len, reverse=True)
        return index.name_to_canonical[direct[0]], "direct"

    if index.united_states is not None and mentions_us_state(affiliation_text):
        return index.united_states, "us-heuristic"

    hit = extract_one(normalized, list(index.names), score_cutoff=score_cutoff)
    if hit:
        return index.name_to_canonical[hit[0]], "fuzzy"

    return None, "unmatched"
