"""Pure-Python text kernels — the byte-parity extraction surface.

Every function here is a deterministic pure function of its string input.
They are the single source of truth shared by (a) the vectorized pandas
UDFs in :mod:`..functions.udfs` and (b) the pytest golden tests, so the
"byte-identical extracted text per url" invariant is enforced in exactly
one place.

Behavioral contracts are anchored on the reference implementation
(studied at /root/reference, snapshot 2026-05-15); each kernel's docstring
cites the reference file:line whose observable behavior it reproduces.
The code itself is written from scratch for this repo.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape

from . import _dictdata as D

# --------------------------------------------------------------------------
# H1/H5 — canonical token normalizers
# (behavior of /root/reference/topic_discovery_pipeline.py:543-573)
# --------------------------------------------------------------------------

_TOKEN_LOWER_RE = re.compile(r"[a-z0-9]+(?:-[a-z0-9]+)*")
_TOKEN_ANYCASE_RE = re.compile(r"[A-Za-z0-9]+(?:-[A-Za-z0-9]+)*")
_ALNUM_RE = re.compile(r"[A-Za-z0-9]+")

STOPWORDS = frozenset(D.STOPWORDS)
BAD_START = frozenset(D.BAD_START)
BAD_VERB = frozenset(D.BAD_VERB)
TRUNC_HEADS = frozenset(D.TRUNC_HEADS)


def clean_text(text: str) -> str:
    """Lowercase alnum/hyphen tokens joined by single spaces.

    Byte-parity target: reference ``clean_text``
    (/root/reference/topic_discovery_pipeline.py:560-573).
    """
    return " ".join(_TOKEN_LOWER_RE.findall(text.lower()))


def tokenize(text: str) -> list[str]:
    """Token list per the H1 token grammar (lowercased input)."""
    return _TOKEN_LOWER_RE.findall(text.lower())


def remove_stopwords(text: str, stopwords: frozenset[str] = STOPWORDS) -> str:
    """Drop stopword tokens; space-join the rest.

    Parity: /root/reference/topic_discovery_pipeline.py:543-557.
    """
    return " ".join(t for t in tokenize(text) if t not in stopwords)


def token_count(text: str) -> int:
    """Count bare alnum runs (/root/reference/populate_cleaned_author_affiliations.py:149-150)."""
    return len(_ALNUM_RE.findall(text))


# --------------------------------------------------------------------------
# H2/H3/H4 — the three distinct normalizers (deliberately different!)
# --------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")


def normalize_affiliation_text(text: str) -> str:
    """lower → strip → strip ``.;`` → collapse whitespace.

    Parity: /root/reference/populate_cleaned_author_affiliations.py:108-112.
    Note: uses ``str.lower`` (not casefold) and does NOT strip again after
    the whitespace collapse — order of operations matters for parity.
    """
    out = text.lower().strip()
    out = out.strip(".;")
    return _WS_RE.sub(" ", out)


def normalize_lookup_text(text: str) -> str:
    """casefold → ``.``/``,`` → space → collapse whitespace → strip.

    Parity: /root/reference/populate_author_locations.py:227-232.
    """
    out = text.casefold().replace(".", " ").replace(",", " ")
    return _WS_RE.sub(" ", out).strip()


def normalize_mention_text(text: str) -> str:
    """casefold → non-[a-z0-9] runs → space → collapse → strip.

    Parity: /root/reference/populate_study_locations.py:35-39.
    """
    out = _NON_ALNUM_RE.sub(" ", text.casefold())
    return _WS_RE.sub(" ", out).strip()


# --------------------------------------------------------------------------
# A3/A4 — WoS TSV field decoders
# (behavior of /root/reference/file_scanner.py:23-74)
# --------------------------------------------------------------------------

MONTHS = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}


def parse_date(pd_str: str | None, py_str: str | None):
    """(year, month, day) from WoS "PD"/"PY" strings; all-None on bad year.

    Parity: /root/reference/file_scanner.py:39-58 (month from first three
    chars uppercased; day only if the second whitespace-split part is a
    digit in 1..31).
    """
    try:
        year = int(py_str)
    except (TypeError, ValueError):
        return None, None, None
    month = day = None
    if pd_str and pd_str.strip():
        s = pd_str.strip()
        month = MONTHS.get(s[:3].upper())
        parts = s.split()
        if len(parts) > 1 and parts[1].isdigit():
            d = int(parts[1])
            if 1 <= d <= 31:
                day = d
    return year, month, day


def parse_published_in_type(pt: str | None, dt: str | None) -> str:
    """J/B/S/P → journal/book/series/patent, else lower(dt), else "other".

    Parity: /root/reference/file_scanner.py:61-74.
    """
    code = (pt or "").strip().upper()
    decoded = {"J": "journal", "B": "book", "S": "series", "P": "patent"}.get(code)
    if decoded:
        return decoded
    fallback = (dt or "").strip()
    return fallback.lower() if fallback else "other"


# --------------------------------------------------------------------------
# H7 — bracket-aware affiliation segment parsing
# (behavior of /root/reference/populate_author_locations.py:154-224)
# --------------------------------------------------------------------------

_AUTHOR_GROUP_RE = re.compile(r"^\[(.*?)\]\s*(.*)$")


def split_segments_outside_brackets(text: str) -> list[str]:
    """Split on ``;`` only at bracket depth 0; strip and drop empties.

    Parity: /root/reference/populate_author_locations.py:154-177.
    """
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in text:
        if ch == "[":
            depth += 1
        elif ch == "]" and depth > 0:
            depth -= 1
        if ch == ";" and depth == 0:
            piece = "".join(buf).strip()
            if piece:
                parts.append(piece)
            buf = []
            continue
        buf.append(ch)
    piece = "".join(buf).strip()
    if piece:
        parts.append(piece)
    return parts


@dataclass
class AffiliationSegment:
    affiliation_index: int
    raw_author_group: str
    authors: list[str]
    affiliation_text: str


def parse_affiliation_segments(author_affiliations: str) -> list[AffiliationSegment]:
    """Parse ``[A; B] affil; [C] affil2`` blocks into segments.

    Parity: /root/reference/populate_author_locations.py:180-224 — if any
    line contains both ``[`` and ``]``, only such lines are used; the
    segment index is global across lines; segments with empty affiliation
    text are skipped but do NOT consume an index.
    """
    lines = [ln.strip() for ln in author_affiliations.splitlines() if ln.strip()]
    if not lines:
        return []
    bracketed = [ln for ln in lines if "[" in ln and "]" in ln]
    source_lines = bracketed if bracketed else lines

    segments: list[AffiliationSegment] = []
    idx = 0
    for line in source_lines:
        for segment in split_segments_outside_brackets(line):
            m = _AUTHOR_GROUP_RE.match(segment)
            raw_group = ""
            authors: list[str] = []
            affil = segment.strip()
            if m:
                raw_group = m.group(1).strip()
                affil = m.group(2).strip()
                authors = [a.strip() for a in raw_group.split(";") if a.strip()]
            if not affil:
                continue
            segments.append(AffiliationSegment(idx, raw_group, authors, affil))
            idx += 1
    return segments


def extract_first_affiliation(author_affiliations: str | None) -> str:
    """Text after the first ``]`` up to the first ``;``.

    Parity: /root/reference/populate_united_states_affiliations.py:134-143.
    """
    if not author_affiliations:
        return ""
    text = author_affiliations
    if "]" in text:
        text = text.split("]", 1)[1]
    return text.split(";", 1)[0].strip()


# --------------------------------------------------------------------------
# H6 — affiliation/place suffix splitting
# (behavior of /root/reference/populate_cleaned_author_affiliations.py:34-210)
# --------------------------------------------------------------------------

INSTITUTION_RE = re.compile(
    r"\b("
    r"univ|university|inst|institute|acad|academy|dept|department|"
    r"sch|school|fac|faculty|lab|laborator|ctr|center|centre|"
    r"hosp|hospital|coll|college|observ|observat|minist|ministry|"
    r"agency|admin|adm|corp|corporation|inc|ltd|co\.?\s*ltd|"
    r"gmbh|llc|company|technol|technology|sci|science|sciences|"
    r"research|res|foundation|soc|society|museum"
    r")\b",
    re.IGNORECASE,
)

ADDRESS_RE = re.compile(
    r"\b("
    r"road|rd|street|st|avenue|ave|drive|dr|lane|ln|blvd|"
    r"allee|via|jl|dong|ku|locked bag|po box|p\.o\. box|"
    r"campus|bldg|building|floor|room|suite"
    r")\b",
    re.IGNORECASE,
)

POSTAL_RE = re.compile(
    r"("
    r"\b[A-Z]{1,3}-?\d{4,8}\b|"
    r"\b\d{4,6}\b|"
    r"\b[A-Z]{1,2}\d[A-Z\d]?\s*\d[A-Z]{2}\b|"
    r"\b[A-Z]{2}\s*\d{4,6}\b|"
    r"\b[A-Z]\d[A-Z]\s*\d[A-Z]\d\b"
    r")",
    re.IGNORECASE,
)

STATE_SUFFIX_RE = re.compile(
    r"^\s*("
    r"AL|AK|AZ|AR|CA|CO|CT|DE|FL|GA|HI|IA|ID|IL|IN|KS|KY|LA|"
    r"MA|MD|ME|MI|MN|MO|MS|MT|NC|ND|NE|NH|NJ|NM|NV|NY|OH|OK|"
    r"OR|PA|RI|SC|SD|TN|TX|UT|VA|VT|WA|WI|WV|WY|"
    r"AB|BC|MB|NB|NL|NS|NT|NU|ON|PE|QC|SK|YT|"
    r"NSW|QLD|VIC|TAS|ACT"
    r")\s*(\d{3,6})?\s*$",
    re.IGNORECASE,
)


def _build_country_pattern() -> re.Pattern[str]:
    """Country alternation, longest-first, names >= 3 chars.

    The reference builds this from pycountry + COUNTRY_ALIASES
    (/root/reference/populate_cleaned_author_affiliations.py:115-139).
    pycountry is not available in this environment, so we substitute the
    reference's own 194-country seed list
    (/root/reference/populate_countries.py:20-215) — a documented delta.
    """
    names = {c.lower() for c in D.COUNTRIES} | set(D.COUNTRY_ALIASES)
    escaped = [
        re.escape(n)
        for n in sorted(names, key=len, reverse=True)
        if len(n) >= 3
    ]
    return re.compile(
        r"(?<![a-z])(" + "|".join(escaped) + r")(?![a-z])", re.IGNORECASE
    )


COUNTRY_RE = _build_country_pattern()


def looks_like_institution(text: str) -> bool:
    return bool(INSTITUTION_RE.search(text))


def looks_like_country(text: str) -> bool:
    return bool(COUNTRY_RE.search(normalize_affiliation_text(text)))


def looks_like_location_anchor(text: str) -> bool:
    return bool(
        looks_like_country(text)
        or POSTAL_RE.search(text)
        or STATE_SUFFIX_RE.search(text)
        or ADDRESS_RE.search(text)
    )


def split_affiliation_and_place(affiliation_text: str) -> tuple[str, str | None]:
    """Strip trailing place/address chunks, stopping at institution text.

    Parity: /root/reference/populate_cleaned_author_affiliations.py:170-210.
    """
    if not affiliation_text or not affiliation_text.strip():
        return "", None
    chunks = [c.strip() for c in affiliation_text.split(",") if c.strip()]
    if len(chunks) <= 1:
        return affiliation_text.strip(), None

    place: list[str] = []
    anchored = False
    while chunks:
        tail = chunks[-1]
        if looks_like_institution(tail):
            break
        if looks_like_location_anchor(tail):
            place.insert(0, chunks.pop())
            anchored = True
            continue
        if anchored and token_count(tail) <= 4:
            place.insert(0, chunks.pop())
            continue
        break

    cleaned = ", ".join(chunks).strip()
    place_text = ", ".join(place).strip() or None
    if not cleaned:
        return affiliation_text.strip(), place_text
    return cleaned, place_text


# --------------------------------------------------------------------------
# H8 — mission-identifier regex bank
# (behavior of /root/reference/fast_regex_mission_id.py:22-269; the
#  alternation bodies are data, extracted into _dictdata.MISSION_REGEX_GROUPS)
# --------------------------------------------------------------------------

MISSION_PATTERNS: list[tuple[str, re.Pattern[str]]] = [
    (
        label,
        re.compile(rf"(?ix)\b(?:{alt.strip()})", re.IGNORECASE | re.VERBOSE),
    )
    for label, alt in D.MISSION_REGEX_GROUPS.items()
]


def detect_missions(title: str | None, abstract: str | None) -> str | None:
    """Comma-joined sorted-unique mission labels, or None.

    Parity: /root/reference/fast_regex_mission_id.py:252-269.
    """
    parts = [p for p in (title, abstract) if p]
    if not parts:
        return None
    text = " ".join(parts)
    found = [label for label, pat in MISSION_PATTERNS if pat.search(text)]
    return ",".join(sorted(set(found))) if found else None


def detect_mission_labels(text: str | None) -> list[str]:
    """Sorted-unique mission labels for a single text (list form)."""
    if not text:
        return []
    return sorted({label for label, pat in MISSION_PATTERNS if pat.search(text)})


# --------------------------------------------------------------------------
# H9/H10 — study-location matchers (alias + direct, longest-first)
# (behavior of /root/reference/populate_study_locations.py:42-109)
# --------------------------------------------------------------------------


def _word_bounded(phrase: str) -> re.Pattern[str]:
    """``(?<![a-z0-9])phrase(?![a-z0-9])`` — parity with
    /root/reference/populate_study_locations.py:42-44."""
    return re.compile(rf"(?<![a-z0-9]){re.escape(phrase)}(?![a-z0-9])")


@dataclass(frozen=True)
class LocationMatcher:
    pattern: re.Pattern[str]
    location: str          # canonical location name
    matched_text: str      # surface form recorded in provenance
    method: str            # "alias" | "direct"
    first_token: str = ""  # prefilter key: first token of the normalized
                           # surface — the word-bounded pattern can only
                           # match if this token occurs in the text


def build_study_location_matchers(
    locations: list[str] | None = None,
    aliases: dict[str, str] | None = None,
) -> list[LocationMatcher]:
    """Alias + direct matchers sorted by surface length, longest first.

    Parity: /root/reference/populate_study_locations.py:47-76 (aliases
    first in build order, then direct names; final sort is by
    ``len(matched_text)`` descending and is stable).
    """
    locations = D.COUNTRIES if locations is None else locations
    aliases = D.STUDY_LOCATION_ALIASES if aliases is None else aliases
    known = {loc.casefold(): loc for loc in locations}

    matchers: list[LocationMatcher] = []
    for alias, canonical in aliases.items():
        target = known.get(canonical.casefold())
        if target is None:
            continue
        norm = normalize_mention_text(alias)
        matchers.append(
            LocationMatcher(
                _word_bounded(norm), target, alias, "alias",
                norm.split(" ", 1)[0] if norm else "",
            )
        )
    for loc in locations:
        norm = normalize_mention_text(loc)
        if not norm:
            continue
        matchers.append(
            LocationMatcher(
                _word_bounded(norm), loc, loc, "direct",
                norm.split(" ", 1)[0],
            )
        )
    matchers.sort(key=lambda m: len(m.matched_text), reverse=True)
    return matchers


def match_study_locations(
    text: str | None, matchers: list[LocationMatcher]
) -> list[tuple[str, str, str]]:
    """(location, matched_text, method) per first-seen (location, surface).

    Parity: /root/reference/populate_study_locations.py:79-109.
    """
    if not text:
        return []
    normalized = normalize_mention_text(text)
    if not normalized:
        return []
    # token prefilter: the normalized text is space-separated alnum tokens,
    # and every matcher pattern is word-bounded, so a matcher can only hit
    # if its first surface token appears as a token of the text.  The regex
    # still verifies — semantics are exactly the reference's.
    text_tokens = set(normalized.split(" "))
    seen: set[tuple[str, str]] = set()
    out: list[tuple[str, str, str]] = []
    for m in matchers:
        if m.first_token and m.first_token not in text_tokens:
            continue
        if m.pattern.search(normalized):
            key = (m.location, m.matched_text)
            if key in seen:
                continue
            seen.add(key)
            out.append((m.location, m.matched_text, m.method))
    return out


# --------------------------------------------------------------------------
# H10 — dictionary substring mention scan
# (behavior of /root/reference/analyze_sat_and_data_types_in_abstracts.py:74-85)
# --------------------------------------------------------------------------


def substring_mentions(text: str | None, terms: list[str]) -> list[str]:
    """Terms whose lowercase form occurs as a substring of lower(text).

    Parity: plain ``name in abstract.lower()`` scan at
    /root/reference/analyze_sat_and_data_types_in_abstracts.py:78-85
    (terms are matched on their lowercase form; output keeps input order).
    """
    if not text:
        return []
    hay = text.lower()
    return [t for t in terms if t.lower() in hay]


# --------------------------------------------------------------------------
# H11/H12 — topic-phrase heuristics
# (behavior of /root/reference/topic_discovery_pipeline.py:396-418, 475-488)
# --------------------------------------------------------------------------


def is_acronym_or_model(tok: str) -> bool:
    """Digit, mixed-case, or >=2-letter all-caps tokens.

    Parity: /root/reference/topic_discovery_pipeline.py:396-418.
    """
    if any(ch.isdigit() for ch in tok):
        return True
    if any(ch.islower() for ch in tok) and any(ch.isupper() for ch in tok):
        return True
    letters = [ch for ch in tok if ch.isalpha()]
    return len(letters) >= 2 and all(ch.isupper() for ch in letters)


def is_truncated_head_phrase(toks: list[str], max_len: int = 3) -> bool:
    """Short phrase ending in a truncated head word.

    Parity: /root/reference/topic_discovery_pipeline.py:475-488.
    """
    return len(toks) <= max_len and toks[-1] in TRUNC_HEADS


# --------------------------------------------------------------------------
# US-state detection (shared by H13 cascade and the us-affiliation backfill)
# (behavior of /root/reference/populate_author_locations.py:121-130)
# --------------------------------------------------------------------------

US_STATE_NAME_RE = re.compile(
    "|".join(
        re.escape(n) for n in sorted(D.US_STATE_NAMES, key=len, reverse=True)
    ),
    re.IGNORECASE,
)
US_STATE_ABBREV_RE = re.compile(
    r"(?<![A-Za-z])(?:" + "|".join(D.US_STATE_ABBREVIATIONS) + r")(?![A-Za-z])"
)


def mentions_us_state(text: str) -> bool:
    """State name anywhere (case-insensitive) or abbreviation in upper().

    Parity: /root/reference/populate_author_locations.py:262-265.
    """
    return bool(
        US_STATE_NAME_RE.search(text) or US_STATE_ABBREV_RE.search(text.upper())
    )


# --------------------------------------------------------------------------
# HTML → text extraction (input_hint surface; no analog in the reference,
# which ingests pre-extracted TSV text via .strip() — file_scanner.py:119-121.
# The kernel below is THE canonical extractor for this repo: synthetic
# web_pages html is generated from text by sources/synthetic.py, and this
# function must invert it byte-identically per url.)
# --------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style|nav|header|footer|aside|head|title)\b[^>]*>.*?</\1>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_BLANK_RE = re.compile(r"[ \t]+")


def extract_text_from_html(html: bytes | str | None) -> str | None:
    """Boilerplate-stripped visible text from an HTML document.

    Deterministic pipeline: drop script/style/nav/header/footer/aside
    blocks and comments; replace remaining tags with newlines; unescape
    entities; collapse intra-line whitespace; keep non-empty lines joined
    by a single newline.  Pure function — the per-url byte-identical
    invariant of BASELINE.json's input_hint is tested against this kernel.
    """
    if html is None:
        return None
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    text = _COMMENT_RE.sub(" ", html)
    text = _SCRIPT_STYLE_RE.sub(" ", text)
    text = _TAG_RE.sub("\n", text)
    text = unescape(text)
    lines = []
    for raw_line in text.split("\n"):
        line = _BLANK_RE.sub(" ", raw_line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
