"""Stage 4 — entity linking of affiliation segments to locations.

Scale shape (SURVEY.md §4, "in-batch text dedupe before expensive kernel"):
the cascade kernel is O(|locations|) per *distinct* text, so we

  1. ``groupBy(affiliation_text)`` → distinct texts only (the reference's
     in-batch dedupe at
     /root/reference/populate_author_affiliation_type_distances.py:164-174,
     promoted to a corpus-wide rewrite),
  2. run the alias→direct→us-heuristic→fuzzy cascade kernel
     (/root/reference/populate_author_locations.py:235-278) in an Arrow
     pandas UDF over the distinct texts,
  3. hash-join the verdicts back onto the segment rows.

At 10^12 docs the distinct-text side is orders of magnitude smaller than
the segment table, and step 3 is a plain shuffle-free broadcast when it
fits (AQE decides).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ._parallel import spread_for_python

from ..functions.linking import LocationIndex, build_location_index, match_location

_INDEX: LocationIndex | None = None


def _index() -> LocationIndex:
    global _INDEX
    if _INDEX is None:
        _INDEX = build_location_index()
    return _INDEX


_LINK_SCHEMA = "affiliation_text string, location string, method string"


def _link_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    index = _index()
    for batch in batches:
        locs, methods = [], []
        for text in batch["affiliation_text"]:
            loc, method = match_location(text, index)
            locs.append(loc)
            methods.append(method)
        yield pd.DataFrame(
            {
                "affiliation_text": batch["affiliation_text"],
                "location": locs,
                "method": methods,
            }
        )


def link_affiliations(segments: DataFrame) -> DataFrame:
    """segments (+affiliation_text) → segments + (location, method).

    Unmatched segments keep location = NULL, method = 'unmatched' —
    the caller decides whether to drop them (the reference drops them,
    populate_author_locations.py:304-306).
    """
    # distinct FIRST (map-side combine shrinks the shuffle), then pin the
    # partition count: AQE's byte-based coalescer would pack the tiny
    # distinct-text rows into 1-2 partitions and run the ~O(100 µs)/row
    # cascade kernel serially regardless of cores (see _parallel.py)
    distinct_texts = spread_for_python(
        segments.select("affiliation_text").distinct()
    )
    verdicts = distinct_texts.mapInPandas(_link_batches, schema=_LINK_SCHEMA)
    return segments.join(verdicts, "affiliation_text", "left")
