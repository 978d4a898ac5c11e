"""WoS TSV ingest: native-expression decoders match the golden-tested
kernel decoders row-for-row."""

from __future__ import annotations

from convei_abstract_relational_knowledge_explorer_spark.functions.textkernels import (
    parse_date,
    parse_published_in_type,
)
from convei_abstract_relational_knowledge_explorer_spark.sources.wos_tsv import (
    read_wos_tsv,
)

ROWS = [
    # AF, AU, C1, C3, EM, PD, PY, PT, DT, SO, TI, AB, DI
    ("Smith, J.", "Smith J", "[Smith, J.] Univ X, City, USA", "Extra Inst",
     "j@x.edu", "JAN 15", "2020", "J", "Article", "Journal of X",
     "A title", "An abstract about Landsat.", "10.1/abc"),
    ("", "Doe A", "", "", "", "FEB", "1999", "B", "", "", "T2", "", ""),
    ("", "", "C1 only", "", "", "MAR 32", "2001", "X", "Review", "So", "T3",
     "  ", ""),
    ("", "", "", "C3 only", "", "", "abc", "P", "Patent", "", "T4", "A", ""),
    ("", "", "", "", "", "AUG 9 extra", "2022", "", "", "", "T5", "B", "d"),
]


def _write_tsv(path, rows):
    header = ["AF", "AU", "C1", "C3", "EM", "PD", "PY", "PT", "DT", "SO", "TI", "AB", "DI"]
    lines = ["\t".join(header)]
    for r in rows:
        lines.append("\t".join(r))
    path.write_text("\n".join(lines))


def test_wos_decode_matches_kernels(spark, tmp_path):
    tsv = tmp_path / "export.tsv"
    _write_tsv(tsv, ROWS)
    df = read_wos_tsv(spark, str(tsv))
    got = sorted((r.asDict() for r in df.collect()), key=lambda r: r["title"])

    assert len(got) == len(ROWS)
    for row, raw in zip(got, sorted(ROWS, key=lambda r: r[10])):
        af, au, c1, c3, em, pd_s, py, pt, dt, so, ti, ab, di = raw
        assert row["title"] == ti.strip()
        assert row["abstract"] == (ab.strip() or None)
        assert row["doi"] == (di.strip() or None)
        assert row["authors"] == (af.strip() or au.strip() or "")
        expected_affil = (
            f"{c1.strip()}\n{c3.strip()}"
            if c1.strip() and c3.strip()
            else (c1.strip() or c3.strip() or None)
        )
        assert row["author_affiliations"] == expected_affil
        y, m, d = parse_date(pd_s or None, py or None)
        assert row["publication_year"] == y
        assert row["publication_month"] == m
        assert row["publication_day"] == d
        assert row["published_in_type"] == parse_published_in_type(pt, dt)
        assert row["source_file"].endswith("export.tsv")
