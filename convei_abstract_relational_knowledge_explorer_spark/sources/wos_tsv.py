"""Web-of-Science tagged-TSV ingest (reference entry point EP1).

Reference behavior (/root/reference/file_scanner.py:77-139): read TSV with
all-string columns, no quoting, then decode
  AF-else-AU author fallback            (:92-94)
  C1 + "\\n" + C3 affiliation concat     (:96-101)
  PD/PY → (year, month, day)            (:39-58, kernel-parity tested)
  PT/DT → published_in_type             (:61-74)
  SO/TI/AB/DI strip-or-null             (:119-122)

Spark shape: ``spark.read.csv`` with an explicit all-string schema (never
inference), decoders as native column expressions — the whole decode runs
in whole-stage codegen; per-file lineage via ``input_file_name()`` replaces
the reference's per-file transaction loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

WOS_COLUMNS = ["AF", "AU", "C1", "C3", "EM", "PD", "PY", "PT", "DT", "SO", "TI", "AB", "DI"]

_MONTH_MAP = {
    "JAN": 1, "FEB": 2, "MAR": 3, "APR": 4, "MAY": 5, "JUN": 6,
    "JUL": 7, "AUG": 8, "SEP": 9, "OCT": 10, "NOV": 11, "DEC": 12,
}


def _strip_or_null(col):
    trimmed = F.trim(col)
    return F.when(trimmed != "", trimmed)


def read_wos_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Glob-read the tagged TSV export(s) into the publications shape."""
    schema = ", ".join(f"{c} string" for c in WOS_COLUMNS)
    raw = (
        spark.read.option("sep", "\t")
        .option("header", "true")
        .option("quote", "")
        .schema(schema)
        .csv(path)
        .withColumn("source_file", F.input_file_name())
    )
    return decode_wos(raw)


def decode_wos(raw: DataFrame) -> DataFrame:
    """Native-expression decoders, parity with file_scanner.py:91-136."""
    af = F.trim(F.coalesce(F.col("AF"), F.lit("")))
    au = F.trim(F.coalesce(F.col("AU"), F.lit("")))
    authors = F.when(af != "", af).otherwise(au)

    c1 = F.trim(F.coalesce(F.col("C1"), F.lit("")))
    c3 = F.trim(F.coalesce(F.col("C3"), F.lit("")))
    affil = (
        F.when((c1 != "") & (c3 != ""), F.concat(c1, F.lit("\n"), c3))
        .when(c1 != "", c1)
        .when(c3 != "", c3)
    )

    # parse_date (file_scanner.py:39-58): year = int(PY) else all-null;
    # month from the first 3 chars of PD uppercased; day = second
    # whitespace part if it is a digit in 1..31
    year = F.expr("try_cast(PY as int)")
    pd_s = F.trim(F.coalesce(F.col("PD"), F.lit("")))
    month_key = F.upper(F.substring(pd_s, 1, 3))
    month_map = F.create_map(
        *[x for k, v in _MONTH_MAP.items() for x in (F.lit(k), F.lit(v))]
    )
    month = F.when(
        year.isNotNull() & (pd_s != ""), month_map[month_key]
    )
    parts = F.split(pd_s, r"\s+")
    second = F.when(F.size(parts) > 1, F.element_at(parts, 2))
    day_num = F.when(
        second.rlike("^[0-9]+$"), F.expr("try_cast(element_at(split(trim(coalesce(PD, '')), '\\\\s+'), 2) as int)")
    )
    day = F.when(
        year.isNotNull() & day_num.between(1, 31), day_num
    )

    # parse_published_in_type (file_scanner.py:61-74)
    pt = F.upper(F.trim(F.coalesce(F.col("PT"), F.lit(""))))
    dt = F.trim(F.coalesce(F.col("DT"), F.lit("")))
    pub_type = (
        F.when(pt == "J", "journal")
        .when(pt == "B", "book")
        .when(pt == "S", "series")
        .when(pt == "P", "patent")
        .when(dt != "", F.lower(dt))
        .otherwise("other")
    )

    cols = [
        F.trim(F.coalesce(F.col("TI"), F.lit(""))).alias("title"),
        _strip_or_null(F.col("AB")).alias("abstract"),
        _strip_or_null(F.col("DI")).alias("doi"),
        pub_type.alias("published_in_type"),
        _strip_or_null(F.col("SO")).alias("published_in_name"),
        authors.alias("authors"),
        affil.alias("author_affiliations"),
        _strip_or_null(F.col("EM")).alias("author_emails"),
        year.alias("publication_year"),
        month.alias("publication_month"),
        day.alias("publication_day"),
    ]
    if "source_file" in raw.columns:
        cols.append(F.col("source_file"))
    return raw.select(*cols)
