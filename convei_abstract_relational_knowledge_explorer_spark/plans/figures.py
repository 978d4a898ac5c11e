"""Static figure artifacts — the Spark twin of the reference's
``plot_publication_geography_figures.py``.

The reference renders matplotlib PNGs (stacked annual bars + cumulative
line, :236-292; horizontal per-country totals with share labels,
:300-345).  matplotlib is not in this sandbox, so the figures are emitted
as self-contained SVG — same data, same marks, no external dependency.
Pure driver-side string rendering over report-sized tables (the inputs
are the materialized report DataFrames from plans/reports.py, a few
hundred rows).
"""

from __future__ import annotations

from xml.sax.saxutils import escape as _esc

from pyspark.sql import DataFrame

_PALETTE = [
    "#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2",
    "#b279a2", "#9d755d", "#eeca3b", "#439894", "#d67195",
]
_OTHER = "#bdbdbd"


def _svg(width: int, height: int, body: list[str], title: str) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" font-family="system-ui, sans-serif" '
        f'font-size="11">\n'
        f'<text x="10" y="18" font-size="15" font-weight="bold">{_esc(title)}'
        f"</text>\n" + "\n".join(body) + "\n</svg>\n"
    )


def annual_stacked_cumulative_svg(
    stacked: DataFrame, title: str = "Annual totals (stacked) + cumulative"
) -> str:
    """Stacked annual bars per series + cumulative line
    (plot_publication_geography_figures.py:236-292 analog).

    Input: :func:`..plans.reports.annual_stacked_cumulative` output —
    (year, series, n, annual_total, cumulative_total).
    """
    rows = stacked.collect()
    if not rows:
        return _svg(640, 360, [], title + " (empty)")
    years = sorted({r["year"] for r in rows})
    series = sorted({r["series"] for r in rows if r["series"] != "Other"})
    series.append("Other") if any(
        r["series"] == "Other" for r in rows
    ) else None
    colors = {
        s: (_OTHER if s == "Other" else _PALETTE[i % len(_PALETTE)])
        for i, s in enumerate(series)
    }
    by_cell = {(r["year"], r["series"]): r["n"] for r in rows}
    cum = {r["year"]: r["cumulative_total"] for r in rows}
    max_annual = max(r["annual_total"] for r in rows)
    max_cum = max(cum.values())

    w, h, ml, mb, mt = 640, 360, 50, 40, 30
    plot_w, plot_h = w - ml - 20, h - mt - mb
    bar_w = max(4, int(plot_w / max(len(years), 1) * 0.8))
    step = plot_w / max(len(years), 1)
    body: list[str] = []
    for xi, y in enumerate(years):
        x = ml + xi * step + (step - bar_w) / 2
        y0 = h - mb
        for s in series:
            n = by_cell.get((y, s), 0)
            if not n:
                continue
            bh = n / max_annual * plot_h
            y0 -= bh
            body.append(
                f'<rect x="{x:.1f}" y="{y0:.1f}" width="{bar_w}" '
                f'height="{bh:.1f}" fill="{colors[s]}">'
                f"<title>{_esc(str(s))} {y}: {n}</title></rect>"
            )
        body.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{h - mb + 14}" '
            f'text-anchor="middle">{y}</text>'
        )
    # cumulative line on a secondary scale
    pts = " ".join(
        f"{ml + xi * step + step / 2:.1f},"
        f"{h - mb - cum[y] / max_cum * plot_h:.1f}"
        for xi, y in enumerate(years)
    )
    body.append(
        f'<polyline points="{pts}" fill="none" stroke="#333" '
        f'stroke-width="2" stroke-dasharray="4 3"/>'
    )
    # legend
    for i, s in enumerate(series):
        ly = mt + 4 + i * 16
        body.append(
            f'<rect x="{w - 150}" y="{ly}" width="10" height="10" '
            f'fill="{colors[s]}"/>'
            f'<text x="{w - 135}" y="{ly + 9}">{_esc(str(s))}</text>'
        )
    return _svg(w, h, body, title)


def totals_with_share_svg(
    totals: DataFrame, title: str = "Totals per entity"
) -> str:
    """Horizontal totals bars with ``value (pct%)`` labels
    (plot_publication_geography_figures.py:300-345 analog).

    Input: :func:`..plans.reports.totals_with_share` output —
    (entity, total, share_pct).
    """
    rows = sorted(totals.collect(), key=lambda r: -r["total"])
    if not rows:
        return _svg(640, 120, [], title + " (empty)")
    w, ml, mt, row_h = 640, 150, 30, 20
    h = mt + len(rows) * row_h + 16
    max_total = rows[0]["total"]
    body: list[str] = []
    for i, r in enumerate(rows):
        y = mt + i * row_h
        bw = r["total"] / max_total * (w - ml - 170)
        body.append(
            f'<text x="{ml - 6}" y="{y + 13}" text-anchor="end">'
            f'{_esc(str(r["entity"]))}</text>'
            f'<rect x="{ml}" y="{y + 3}" width="{bw:.1f}" height="13" '
            f'fill="{_PALETTE[0]}"/>'
            f'<text x="{ml + bw + 5:.1f}" y="{y + 13}" fill="#555">'
            f'{r["total"]:,} ({r["share_pct"]:.1f}%)</text>'
        )
    return _svg(w, h, body, title)


def write_geography_figures(
    stacked: DataFrame, totals: DataFrame, out_dir: str
) -> list[str]:
    """Write both figures as .svg files; returns the paths."""
    from pathlib import Path

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    for name, svg in (
        ("annual_stacked_cumulative.svg", annual_stacked_cumulative_svg(stacked)),
        ("totals_with_share.svg", totals_with_share_svg(totals)),
    ):
        p = out / name
        p.write_text(svg, encoding="utf-8")
        paths.append(str(p))
    return paths
