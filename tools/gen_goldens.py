"""Generate golden byte-parity fixtures by executing the REFERENCE's pure
functions on the shared fixture inputs.

The reference's heavy dependencies (sqlalchemy, rapidfuzz, yake, tqdm,
pycountry, models) are never imported: we extract exactly the pure
function/constant AST nodes we need from each file and exec them in a
controlled namespace.  Where a reference function calls rapidfuzz
(the fuzzy leg of match_location_id), we record goldens only for the
deterministic legs by stubbing extractOne -> None; the fuzzy leg is
covered by our own determinism tests instead (documented delta).

Run:  python tools/gen_goldens.py
Writes: tests/golden/*.json
"""

from __future__ import annotations

import ast
import json
import re
import sys
from collections import Counter
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
OUT = REPO / "tests" / "golden"

sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
import fixture_inputs as FI  # noqa: E402


def load_nodes(path: Path, names: set[str], extra: dict | None = None) -> dict:
    """Exec only the named top-level defs/assigns from ``path``."""
    tree = ast.parse(path.read_text())
    ns: dict = {"re": re, "np": np, "Counter": Counter}
    if extra:
        ns.update(extra)
    for node in tree.body:
        keep = False
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            keep = node.name in names
        elif isinstance(node, ast.Assign):
            keep = any(
                isinstance(t, ast.Name) and t.id in names for t in node.targets
            )
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            keep = node.target.id in names
        if keep:
            mod = ast.Module(body=[node], type_ignores=[])
            exec(compile(mod, str(path), "exec"), ns)  # noqa: S102
    return ns


def dump(name: str, obj) -> None:
    path = OUT / f"{name}.json"
    path.write_text(json.dumps(obj, indent=1, ensure_ascii=False, sort_keys=False))
    print(f"wrote {path}")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    # ---- topic_discovery_pipeline.py kernels --------------------------------
    tdp = load_nodes(
        REF / "topic_discovery_pipeline.py",
        {
            "clean_text", "remove_stopwords", "find_generic_terms",
            "_is_acronym_or_model", "is_truncated_head_phrase",
            "_token_re", "STOPWORDS", "BAD_START", "BAD_VERB", "TRUNC_HEADS",
        },
    )
    dump("clean_text", [[t, tdp["clean_text"](t)] for t in FI.TEXT_SAMPLES])
    dump(
        "remove_stopwords",
        [[t, tdp["remove_stopwords"](t, tdp["STOPWORDS"])] for t in FI.TEXT_SAMPLES],
    )
    dump(
        "is_acronym_or_model",
        [[t, tdp["_is_acronym_or_model"](t)] for t in FI.TOKEN_SAMPLES],
    )
    dump(
        "is_truncated_head_phrase",
        [[toks, tdp["is_truncated_head_phrase"](toks)] for toks in FI.PHRASE_TOKEN_SAMPLES],
    )
    generic, df, n_docs = tdp["find_generic_terms"](
        FI.ABSTRACT_SAMPLES, df_threshold=0.15, min_token_len=2
    )
    dump(
        "find_generic_terms",
        {"generic": sorted(generic), "df": dict(sorted(df.items())), "n_docs": n_docs},
    )

    # ---- file_scanner.py decoders -------------------------------------------
    fsc = load_nodes(
        REF / "file_scanner.py",
        {"parse_date", "parse_published_in_type", "MONTHS"},
    )
    dump(
        "parse_date",
        [[list(inp), list(fsc["parse_date"](*inp))] for inp in FI.DATE_SAMPLES],
    )
    dump(
        "parse_published_in_type",
        [[list(inp), fsc["parse_published_in_type"](*inp)] for inp in FI.PUBTYPE_SAMPLES],
    )

    # ---- populate_author_locations.py ---------------------------------------
    class _NoFuzzProcess:
        @staticmethod
        def extractOne(*_a, **_k):
            return None

    class _NoFuzz:
        WRatio = staticmethod(lambda *a, **k: 0.0)

    pal = load_nodes(
        REF / "populate_author_locations.py",
        {
            "split_segments_outside_brackets", "parse_affiliation_segments",
            "normalize_lookup_text", "match_location_id",
            "US_STATE_NAMES", "US_STATE_ABBREVIATIONS",
            "US_STATE_NAME_REGEX", "US_STATE_ABBREVIATION_REGEX",
            "LOCATION_ALIASES",
        },
        extra={"process": _NoFuzzProcess, "fuzz": _NoFuzz},
    )
    dump(
        "split_segments_outside_brackets",
        [[t, pal["split_segments_outside_brackets"](t)] for t in FI.AUTHOR_AFFILIATION_BLOCKS],
    )
    dump(
        "parse_affiliation_segments",
        [[t, pal["parse_affiliation_segments"](t)] for t in FI.AUTHOR_AFFILIATION_BLOCKS],
    )
    dump(
        "normalize_lookup_text",
        [[t, pal["normalize_lookup_text"](t)] for t in FI.TEXT_SAMPLES + FI.AFFILIATION_SAMPLES],
    )

    # cascade goldens (deterministic legs only: alias/direct/us-heuristic/unmatched)
    countries_ns = load_nodes(REF / "populate_countries.py", {"countries"})
    countries = countries_ns["countries"]
    name_to_id = {c.casefold(): i + 1 for i, c in enumerate(countries)}
    names = list(name_to_id.keys())
    us_id = name_to_id.get("united states")
    id_to_name = {v: k for k, v in name_to_id.items()}
    cascade = []
    for text in FI.AFFILIATION_SAMPLES + [
        s["affiliation_text"]
        for block in FI.AUTHOR_AFFILIATION_BLOCKS
        for s in pal["parse_affiliation_segments"](block)
    ]:
        loc_id, method = pal["match_location_id"](text, name_to_id, names, us_id, 80)
        cascade.append([text, id_to_name.get(loc_id), method])
    dump("match_location_cascade", cascade)

    # ---- populate_study_locations.py ----------------------------------------
    psl = load_nodes(
        REF / "populate_study_locations.py",
        {
            "normalize_text", "compile_pattern", "build_matchers",
            "build_rows_for_publication", "LOCATION_ALIASES",
        },
    )
    dump(
        "normalize_mention_text",
        [[t, psl["normalize_text"](t)] for t in FI.TEXT_SAMPLES + FI.ABSTRACT_SAMPLES],
    )
    location_rows = [(i + 1, c) for i, c in enumerate(countries)]
    matchers = psl["build_matchers"](location_rows)
    study_golden = []
    for i, abstract in enumerate(FI.ABSTRACT_SAMPLES):
        rows = psl["build_rows_for_publication"](i, abstract, matchers)
        study_golden.append(
            [
                abstract,
                [
                    [countries[r["location_id"] - 1], r["matched_text"], r["match_method"]]
                    for r in rows
                ],
            ]
        )
    dump("study_locations", study_golden)

    # ---- populate_cleaned_author_affiliations.py ----------------------------
    pca = load_nodes(
        REF / "populate_cleaned_author_affiliations.py",
        {
            "normalize_text", "token_count", "looks_like_institution",
            "looks_like_country", "looks_like_location_anchor",
            "split_affiliation_and_place", "country_pattern",
            "INSTITUTION_RE", "ADDRESS_RE", "POSTAL_RE", "STATE_RE",
            "COUNTRY_ALIASES", "COUNTRY_RE",
        },
    )
    # pycountry is unavailable: inject COUNTRY_RE built with the reference's
    # own build rules (names >=3 chars, longest-first, same guards) from the
    # reference's seed country list + COUNTRY_ALIASES.
    cnames = {c.lower() for c in countries} | set(pca["COUNTRY_ALIASES"])
    escaped = [re.escape(n) for n in sorted(cnames, key=len, reverse=True) if len(n) >= 3]
    pca["COUNTRY_RE"] = re.compile(
        r"(?<![a-z])(" + "|".join(escaped) + r")(?![a-z])", re.IGNORECASE
    )
    # country_pattern() reads module global COUNTRY_RE; loaded as plain dict
    # namespace, the function's __globals__ IS this dict, so the injection works.
    dump(
        "normalize_affiliation_text",
        [[t, pca["normalize_text"](t)] for t in FI.TEXT_SAMPLES + FI.AFFILIATION_SAMPLES],
    )
    dump("token_count", [[t, pca["token_count"](t)] for t in FI.TEXT_SAMPLES + FI.AFFILIATION_SAMPLES])
    dump(
        "split_affiliation_and_place",
        [[t, list(pca["split_affiliation_and_place"](t))] for t in FI.AFFILIATION_SAMPLES],
    )

    # ---- populate_united_states_affiliations.py ------------------------------
    pus = load_nodes(
        REF / "populate_united_states_affiliations.py",
        {"extract_first_affiliation"},
    )
    dump(
        "extract_first_affiliation",
        [[t, pus["extract_first_affiliation"](t)] for t in FI.AUTHOR_AFFILIATION_BLOCKS],
    )

    # ---- fast_regex_mission_id.py --------------------------------------------
    frm = load_nodes(
        REF / "fast_regex_mission_id.py",
        {"EO_GROUPS", "PATTERNS", "detect_satellite_types"},
    )
    dump(
        "detect_satellite_types",
        [
            [[title, abstract], frm["detect_satellite_types"](title, abstract)]
            for title in [None, "Sentinel-2 time series"]
            for abstract in FI.ABSTRACT_SAMPLES
        ],
    )

    # ---- affiliation_vector_transform.py -------------------------------------
    avt = load_nodes(REF / "affiliation_vector_transform.py", {"power_normalize"})
    dump(
        "power_normalize",
        [[v, [float(x) for x in avt["power_normalize"](v)]] for v in FI.VECTOR_SAMPLES],
    )

    # ---- end-to-end expected triples over the synthetic corpus ---------------
    # Reference logic executed in-process per doc:
    #   MENTIONS_SATELLITE / MENTIONS_DATA_TYPE: substring scan
    #     (analyze_sat_and_data_types_in_abstracts.py:74-85)
    #   HAS_MISSION: detect_satellite_types (fast_regex_mission_id.py:252-269)
    #   STUDY_LOCATION: build_rows_for_publication (populate_study_locations.py:79-109)
    #   AUTHOR_LOCATED_IN: match_location_id over parse_affiliation_segments
    #     (populate_author_locations.py:281-324)
    # rapidfuzz is unavailable: the fuzzy leg uses OUR WRatio (documented
    # delta; alias/direct/us-heuristic legs are the reference's own code).
    from convei_abstract_relational_knowledge_explorer_spark.functions.fuzzy import (
        extract_one as our_extract_one,
    )
    from convei_abstract_relational_knowledge_explorer_spark.sources.synthetic import (
        make_page,
    )

    class _OurProcess:
        @staticmethod
        def extractOne(query, choices, scorer=None, score_cutoff=None):
            hit = our_extract_one(query, list(choices), float(score_cutoff))
            return (hit[0], hit[1], 0) if hit else None

    pal_fz = load_nodes(
        REF / "populate_author_locations.py",
        {
            "split_segments_outside_brackets", "parse_affiliation_segments",
            "normalize_lookup_text", "match_location_id",
            "US_STATE_NAMES", "US_STATE_ABBREVIATIONS",
            "US_STATE_NAME_REGEX", "US_STATE_ABBREVIATION_REGEX",
            "LOCATION_ALIASES",
        },
        extra={"process": _OurProcess, "fuzz": _NoFuzz},
    )

    simple = load_nodes(
        REF / "insert_simple_data.py", {"satellite_values", "data_type_values"}
    )
    sats_lc = [(s, s.lower()) for s in simple["satellite_values"]]
    dts_lc = [(d, d.lower()) for d in simple["data_type_values"]]

    n_corpus = 150
    triples: set[tuple[str, str, str]] = set()
    for i in range(n_corpus):
        page = make_page(i)
        url = page["url"]
        lines = page["_payload"].split("\n")
        title = lines[0]
        last = lines[-1]
        has_affil = "[" in last and "]" in last and len(lines) >= 3
        abstract = " ".join(lines[1 : len(lines) - 1 if has_affil else len(lines)])
        affiliations = last if has_affil else None

        hay = abstract.lower()
        for name, name_lc in sats_lc:
            if name_lc in hay:
                triples.add((url, "MENTIONS_SATELLITE", name))
        for name, name_lc in dts_lc:
            if name_lc in hay:
                triples.add((url, "MENTIONS_DATA_TYPE", name))

        labels = frm["detect_satellite_types"](title, abstract)
        if labels:
            for label in labels.split(","):
                triples.add((url, "HAS_MISSION", label))

        for row in psl["build_rows_for_publication"](i, abstract, matchers):
            triples.add((url, "STUDY_LOCATION", countries[row["location_id"] - 1]))

        if affiliations:
            for seg in pal_fz["parse_affiliation_segments"](affiliations):
                loc_id, _method = pal_fz["match_location_id"](
                    seg["affiliation_text"], name_to_id, names, us_id, 80
                )
                if loc_id is not None:
                    triples.add(
                        (url, "AUTHOR_LOCATED_IN", countries[loc_id - 1])
                    )

    dump(
        "expected_triples",
        {"n_corpus": n_corpus, "triples": sorted(triples)},
    )

    print("all goldens written")


if __name__ == "__main__":
    main()
