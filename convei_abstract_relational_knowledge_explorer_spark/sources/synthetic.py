"""Deterministic synthetic ``web_pages`` corpus (BASELINE.json input_hint).

Schema: (url: string, warc_ts: timestamp, html: binary, text: string,
lang: string).  Every row is a pure function of its index ``i`` and the
seed — independent of partitioning, process, or run — so the corpus is
reproducible anywhere (driver, executor, pytest, DuckDB golden tooling).

Generation is distributed: ``spark.range(n)`` → ``mapInPandas`` with the
pure row kernel.  No driver-side row loops, no external data.

The payload text deliberately mimics the reference's publication rows
(title + abstract + bracketed affiliation block,
/root/reference/models.py:61-155; block format parsed at
/root/reference/populate_author_locations.py:154-224) and seeds it with
the reference's own dictionary terms so mention detection has ground truth.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pandas as pd

from ..functions import _dictdata as D

SEED = 20260816

_FIRST = ["Smith", "Garcia", "Chen", "Müller", "Okafor", "Tanaka", "Rossi",
          "Nguyen", "Kumar", "Johansson", "Silva", "Novak"]
_INITIAL = ["A.", "B.", "C.", "D.", "E.", "J.", "K.", "L.", "M.", "R."]

_INSTITUTES = [
    "Dept of Geography, Univ of {city}",
    "Institute of Remote Sensing, {city} Acad of Sciences",
    "{city} State Univ, Dept of Environmental Sci",
    "National Research Ctr, {city}",
    "School of Earth Sciences, Univ {city}",
]

_CITIES = ["Berkeley", "Beijing", "Oxford", "Nairobi", "Sao Paulo", "Toronto",
           "Canberra", "Jena", "Kyoto", "Tbilisi", "Oslo", "Madrid"]

_TOPIC_PHRASES = [
    "land cover change", "crop yield estimation", "urban heat island",
    "forest canopy height", "soil moisture retrieval", "sea surface temperature",
    "glacier mass balance", "wetland inundation mapping", "air quality monitoring",
    "coastal erosion dynamics", "wildfire burn severity", "snow cover extent",
    "vegetation phenology", "precision agriculture", "flood extent mapping",
]

_VERBS = ["analyze", "map", "monitor", "quantify", "assess", "estimate"]

_MISSION_SURFACES = [
    "Sentinel-2", "Sentinel-1", "Landsat 8", "Landsat-7", "MODIS", "VIIRS",
    "ASTER GDEM", "WorldView-3", "QuickBird", "IKONOS", "PlanetScope",
    "RapidEye", "GOES-16", "SEVIRI", "RADARSAT-2", "TerraSAR-X",
    "COSMO-SkyMed", "ALOS-2", "PALSAR-2", "Envisat", "GHGSat", "SkySat",
    "PRISMA", "EnMAP", "TROPOMI", "Gaofen-2", "CBERS-4", "Cartosat-2",
    "Himawari-8", "NISAR",
]

_TEMPLATES = [
    # (head boilerplate, body wrapper, tail boilerplate)
    (
        "<html><head><title>{title}</title><script>window.t={{}};</script>"
        "<style>.m{{color:red}}</style></head><body>"
        "<nav><a href='/'>Home</a><a href='/about'>About</a></nav>",
        "<article><h1>{title}</h1>{body}</article>",
        "<footer>&copy; 2026 Example Host</footer></body></html>",
    ),
    (
        "<html><head><title>{title}</title></head><body>"
        "<header><div class='banner'>Breaking research news!</div></header>"
        "<aside>Subscribe now</aside>",
        "<main><h2>{title}</h2>{body}</main>",
        "<nav>footer nav</nav><footer>contact us</footer></body></html>",
    ),
    (
        "<html><body><!-- tracking pixel --><script src='t.js'></script>",
        "<div id='content'><h1>{title}</h1>{body}</div>",
        "</body></html>",
    ),
]

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "en", "en", "de", "fr", "zh"]


def _rng(i: int) -> random.Random:
    digest = hashlib.sha256(f"{SEED}:{i}".encode()).digest()
    return random.Random(int.from_bytes(digest[:8], "big"))


def make_page(i: int) -> dict:
    """Pure row kernel: index -> web_pages row dict."""
    rng = _rng(i)
    lang = rng.choice(_LANGS)

    n_sats = rng.randint(0, 3)
    sats = rng.sample(_MISSION_SURFACES, n_sats)
    n_countries = rng.randint(0, 3)
    countries = rng.sample(D.COUNTRIES, n_countries)
    n_dtypes = rng.randint(0, 2)
    dtypes = rng.sample(
        [d for d in D.DATA_TYPE_NAMES if "*" not in d], n_dtypes
    )
    topic = rng.choice(_TOPIC_PHRASES)
    verb = rng.choice(_VERBS)

    title = f"Using {sats[0] if sats else 'field surveys'} to {verb} {topic}"
    sentences = [
        f"This study aims to {verb} {topic}"
        + (f" in {' and '.join(countries)}" if countries else "")
        + ".",
    ]
    if sats:
        sentences.append(
            f"We use {', '.join(sats)} imagery collected between 2015 and 2024."
        )
    if dtypes:
        sentences.append(f"The analysis combines {' and '.join(dtypes)} data.")
    sentences.append(
        f"Results show significant changes in {topic} over the study period."
    )
    abstract = " ".join(sentences)

    n_groups = rng.randint(1, 3)
    groups = []
    for _ in range(n_groups):
        n_auth = rng.randint(1, 3)
        authors = "; ".join(
            f"{rng.choice(_FIRST)}, {rng.choice(_INITIAL)}" for _ in range(n_auth)
        )
        city = rng.choice(_CITIES)
        inst = rng.choice(_INSTITUTES).format(city=city)
        country = rng.choice(D.COUNTRIES + ["USA", "Peoples R China", "England"])
        postal = rng.choice(["", f" {rng.randint(10000, 99999)}"])
        groups.append(f"[{authors}] {inst}, {city},{postal} {country}".replace(", ,", ","))
    affiliations = "; ".join(groups)

    text = f"{title}\n{abstract}\n{affiliations}"

    head, wrap, tail = _TEMPLATES[i % len(_TEMPLATES)]
    body = "".join(
        f"<p>{part}</p>" for part in (abstract, affiliations)
    )
    html = (head + wrap + tail).format(title=title, body=body).encode("utf-8")

    ts = datetime(2015, 1, 1, tzinfo=timezone.utc) + timedelta(
        seconds=rng.randint(0, 11 * 365 * 24 * 3600)
    )
    # 10% of rows ship html only (text NULL) to force the extraction path
    text_field = None if rng.random() < 0.10 else text

    return {
        "url": f"https://host{i % 97}.example.org/doc/{hashlib.sha1(f'{SEED}:{i}'.encode()).hexdigest()[:16]}",
        "warc_ts": ts.replace(tzinfo=None),
        "html": html,
        "text": text_field,
        "lang": lang,
        # ground-truth payload, used only by tests/golden tooling
        "_payload": text,
    }


def iter_pages(n: int, with_payload: bool = False) -> Iterator[dict]:
    for i in range(n):
        row = make_page(i)
        if not with_payload:
            row.pop("_payload")
        yield row


WEB_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def web_pages(spark, n_docs: int, partitions: int | None = None):
    """Distributed deterministic corpus: spark.range -> mapInPandas."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [make_page(int(i)) for i in batch["id"]]
            for row in rows:
                row.pop("_payload")
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    num_parts = partitions or max(spark.sparkContext.defaultParallelism, 2)
    return (
        spark.range(0, n_docs, numPartitions=num_parts)
        .mapInPandas(gen, schema=WEB_PAGES_SCHEMA)
    )
