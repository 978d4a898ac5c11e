"""Shared adversarial fixture inputs for kernel byte-parity tests.

Used both by tools/gen_goldens.py (which runs the REFERENCE's pure
functions on these inputs to record expected outputs) and by
tests/test_kernels.py (which runs OUR kernels and compares).
"""

TEXT_SAMPLES = [
    "",
    "   ",
    "Hello, World!",
    "state-of-the-art CNN-based models (ResNet50) work well.",
    "Multi--hyphen  and\ttabs\nnewlines",
    "Ünïcöde STRASSE ß Maße",  # casefold vs lower difference (ß -> ss)
    "a-b-c 123-456 x- -y -",
    "UPPER lower MiXeD 42",
    "Landsat-8 and Sentinel-2A imagery over the U.S.A.; MODIS data.",
    "https://example.com/path?q=1 foo_bar baz.qux",
    "  trailing dots and semis .;.;  ",
    "The quick brown fox, which jumped; over the lazy dog.",
    "synthetic aperture radar (SAR) and LiDAR point clouds",
    "中文 text with 汉字 and ascii mixed 2024",
    "don't stop-believing o'clock",
    # r03 advice #8: adversarial unicode where str.lower() and
    # str.casefold() diverge (ẞ/ß -> ss only under casefold; ﬁ/ﬆ
    # ligatures expand only under casefold) or where case mapping is
    # context-sensitive (final sigma, İ -> i + combining dot)
    "MAẞE ﬁeld ﬆudy ΣΊΓΜΑ ΤΕΛΙΚΌΣ",
    "İstanbul DİYARBAKIR ılık Iı",
    "ǄUNGLA ǅungla ǆungla San Ǉubǉana",
]

AFFILIATION_SAMPLES = [
    "Dept of Geography, Univ of California, Berkeley, CA 94720, USA",
    "Institute of Remote Sensing, Chinese Acad of Sciences, Beijing 100101, Peoples R China",
    "Max Planck Inst, Jena, D-07745, Germany",
    "Univ Oxford, Dept Zool, Oxford OX1 3PS, England",
    "NASA Goddard Space Flight Ctr, Greenbelt, MD 20771, USA",
    "Some Company Ltd, 42 Baker Street, London, United Kingdom",
    "Univ Sao Paulo, BR-05508090 Sao Paulo, Brazil",
    "CSIRO, Canberra, ACT 2601, Australia",
    "Small Village Clinic, Obscureton, 99999",
    "University of Nowhere",
    "Toronto, ON M5S 1A1, Canada",
    ", , ,",
    "  ",
    "Acme Corp, Suite 300, 1 Infinite Loop, Cupertino, CA 95014, USA",
    "Hydrology Lab, Univ Georgia, Athens, GA 30602, USA",
    "Tbilisi State Univ, Tbilisi, Georgia",
    # adversarial unicode against the H6 anchor regexes
    # (populate_cleaned_author_affiliations.py:34-103): umlauts/eszett in
    # institution and street chunks, Turkish dotted/dotless I, Greek
    # script, capital-sharp-s (casefold-divergent) in an anchor position
    "Universität Zürich, Rämistrasse 71, CH-8006 Zürich, Switzerland",
    "İstanbul Üniv, Beyazıt Kampüsü, 34452 İstanbul, Turkey",
    "Ludwig-Maximilians-Universität, Straße des 17. Juni 5, 80539 München, Germany",
    "Πανεπιστήμιο Αθηνών, Αθήνα, Greece",
    "MAẞE INSTITUT, GROẞE ALLEE 3, Berlin, GERMANY",
]

AUTHOR_AFFILIATION_BLOCKS = [
    "[Smith, J.; Doe, A.] Univ of California, Berkeley, CA 94720, USA; [Lee, K.] Seoul Natl Univ, Seoul, South Korea",
    "Plain affiliation without brackets, Univ of Lagos, Nigeria",
    "[Brown, B.] Dept of Physics, MIT, Cambridge, MA 02139, USA\n[Green, G.; White, W.] Oxford Univ, Oxford, England",
    "[; ;] Empty authors, Somewhere Univ, France",
    "[Nested [bracket] case; Two, T.] Weird Inst, Berlin, Germany",
    "No brackets line one\nNo brackets line two, Univ of Oslo, Norway",
    "[Solo, S.]",
    "",
    "[Alpha, A.] ; [Beta, B.] Second Univ, Madrid, Spain",
    "[Gamma, G.] Inst A, Rome, Italy; Inst B without authors, Milan, Italy",
    # adversarial unicode against the H7 bracket/segment regexes:
    # non-ASCII author names, eszett, dotted İ, Greek, digraph titlecase
    "[Großmann, A.; Yıldız, Ç.] Universität Zürich, Zürich, Switzerland;"
    " [Σίγμας, Γ.] Παν Αθηνών, Αθήνα, Greece",
    "[ǅuro, D.] Sveučilište u Zagrebu, Zagreb, Croatia\n"
    "[MAẞE, M.] GROẞE Univ, Berlin, Germany",
]

ABSTRACT_SAMPLES = [
    "We use Landsat 8 and Sentinel-2 imagery to map deforestation in Brazil and Peru.",
    "MODIS and VIIRS data over the United States of America show trends; PR China collaborates.",
    "A study of wetlands in the united kingdom and Kenya using synthetic aperture radar.",
    "This paper presents TROPOMI retrievals compared with GOES-16 observations near Georgia.",
    "No satellites here, just field measurements in Iceland and germany.",
    "quickbird and IKONOS archives; WorldView-3 at 31cm resolution over South Africa.",
    "Hyperspectral PRISMA and EnMAP missions complement ALOS-2 PALSAR-2 SAR over Japan.",
    "",
    "ASTER GDEM elevation together with terrasar-x data for glacier mapping in Nepal and Bhutan.",
    "The ocean color instrument aboard NASA PACE mission monitors chlorophyll near Fiji.",
]

DATE_SAMPLES = [
    ("JAN 15", "2020"),
    ("jan 15", "2020"),
    ("FEB", "1999"),
    ("MAR 32", "2001"),
    ("APR 0", "2001"),
    ("XXX 10", "2015"),
    ("", "2010"),
    (None, "2005"),
    ("DEC 31", "abc"),
    ("JUL 4", None),
    ("AUG 9 extra", "2022"),
    ("SEPTEMBER 3", "2018"),
    ("  OCT 7  ", "2021"),
]

PUBTYPE_SAMPLES = [
    ("J", None),
    ("b", "Article"),
    ("S", ""),
    ("P", "Patent Doc"),
    ("X", "Review"),
    (None, "Proceedings Paper"),
    ("", ""),
    (" j ", None),
    (None, None),
]

PHRASE_TOKEN_SAMPLES = [
    ["remote"],
    ["remote", "sensing"],
    ["satellite", "image"],
    ["deep", "learning", "technology"],
    ["a", "b", "c", "technology"],
    ["pictures"],
    ["land", "cover"],
]

TOKEN_SAMPLES = [
    "CNN",
    "ResNet50",
    "iPhone",
    "eBay",
    "word",
    "Word",
    "WORDS",
    "A",
    "AB",
    "a1",
    "XY-Z",
    "ab",
]

VECTOR_SAMPLES = [
    [0.5, 0.2, -0.3, 0.0],
    [0.0, 0.0, 0.0],
    [-1.0, -2.0],
    [1.0],
    [0.1, 0.1, 0.1, 0.1, 0.1],
    [3.0, 4.0],
    [1e-8, 2e-8],
]
