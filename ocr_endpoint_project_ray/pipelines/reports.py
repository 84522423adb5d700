"""Ranking / scorecard operators over small aggregates (SURVEY.md §2.6-2.7).

These mirror the reference's decision layer: min-max scorecards
(``scripts/generate_decision_report.py:70-76,158-200``), Borda ranking
(``pages/2_OCR_Benchmark.py:574-590``), Condorcet criterion wins
(``pages/2_OCR_Benchmark.py:592-608``), best-row recommendation
(``pages/results_summary.py:56-81``). They run on *already-aggregated*
per-group tables (rows ≈ #models), so they are driver-side by design — the
heavy lifting happened in the distributed grouped_agg that produced the
input. Ties are broken deterministically by entity name (a documented
deviation from the reference, whose tie order is input-order-dependent).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def minmax_normalize(
    table: pa.Table, cols: list[str], *, invert: list[str] | None = None, suffix: str = "_norm"
) -> pa.Table:
    """Min-max scale each column to [0,1]; constant columns → 1.0
    (reference: generate_decision_report.py:70-76). ``invert`` lists
    lower-is-better columns (scaled as 1 - norm)."""
    invert = invert or []
    for c in cols:
        col = pc.cast(table.column(c), pa.float64())
        mn = pc.min(col).as_py()
        mx = pc.max(col).as_py()
        if mn is None or mx is None or mx == mn:
            norm = pa.array([1.0] * table.num_rows, pa.float64())
        else:
            norm = pc.divide(pc.subtract(col, mn), mx - mn)
            if c in invert:
                norm = pc.subtract(1.0, norm)
        table = table.append_column(c + suffix, norm)
    return table


def weighted_score(
    table: pa.Table, weights: dict[str, float], *, out: str = "decision_score"
) -> pa.Table:
    """Weighted sum of (already-normalized) criterion columns."""
    acc = None
    for c, w in weights.items():
        term = pc.multiply(pc.cast(table.column(c), pa.float64()), w)
        acc = term if acc is None else pc.add(acc, term)
    return table.append_column(out, acc)


def borda_rank(
    table: pa.Table,
    entity_col: str,
    criteria: dict[str, bool],
    *,
    weights: dict[str, float] | None = None,
    out: str = "borda_points",
) -> pa.Table:
    """Weighted Borda count: per criterion, rank entities (True = higher is
    better), position r (0-based best) earns ``(n-1-r) * weight`` points.
    Ties are fully broken by entity name so the result is deterministic."""
    n = table.num_rows
    entities = table.column(entity_col).to_pylist()
    points = dict.fromkeys(entities, 0.0)
    for crit, higher_better in criteria.items():
        w = (weights or {}).get(crit, 1.0)
        vals = table.column(crit).to_pylist()
        # best first; ties broken by entity name ascending
        order = sorted(
            range(n),
            key=lambda i: (-(vals[i]) if higher_better else vals[i], entities[i]),
        )
        for r, i in enumerate(order):
            points[entities[i]] += (n - 1 - r) * w
    out_entities = sorted(points)
    return pa.table(
        {
            entity_col: pa.array(out_entities, pa.string()),
            out: pa.array([points[e] for e in out_entities], pa.float64()),
        }
    )


def condorcet_wins(
    table: pa.Table, entity_col: str, criteria: dict[str, bool], *, out: str = "wins"
) -> pa.Table:
    """Count criteria won per entity; ties on a criterion → all tied entities
    win it (reference: 2_OCR_Benchmark.py:592-608)."""
    entities = table.column(entity_col).to_pylist()
    wins = dict.fromkeys(entities, 0)
    for crit, higher_better in criteria.items():
        vals = table.column(crit).to_pylist()
        best = max(vals) if higher_better else min(vals)
        for e, v in zip(entities, vals):
            if v == best:
                wins[e] += 1
    out_entities = sorted(wins)
    return pa.table(
        {
            entity_col: pa.array(out_entities, pa.string()),
            out: pa.array([wins[e] for e in out_entities], pa.int64()),
        }
    )


def pivot_table(
    table: pa.Table, *, index: str, columns: str, values: str, fill_value=None
) -> pa.Table:
    """Head-to-head pivot (≙ A7, generate_decision_report.py:303-329): one
    row per ``index`` value, one column per ``columns`` value; missing cells
    get ``fill_value`` (0 for counts keeps columns integer-typed, matching
    conditional-aggregation SQL). Driver-side — inputs are small aggregates;
    a distributed pivot would be a groupby(index) + map_groups building wide
    rows."""
    idx_vals = sorted(set(table.column(index).to_pylist()))
    col_vals = sorted(set(table.column(columns).to_pylist()))
    cell: dict[tuple, object] = {}
    for r in table.to_pylist():
        cell[(r[index], r[columns])] = r[values]
    out: dict[str, list] = {index: idx_vals}
    for c in col_vals:
        out[str(c)] = [cell.get((i, c), fill_value) for i in idx_vals]
    return pa.Table.from_pydict(out)


def describe_column(table: pa.Table, col: str) -> dict[str, float]:
    """count/mean/std/min/quartiles/max (≙ A8 describe,
    generate_decision_report.py:442-447)."""
    import numpy as np

    v = np.asarray([x for x in table.column(col).to_pylist() if x is not None], dtype=np.float64)
    if v.size == 0:
        return {"count": 0.0}
    return {
        "count": float(v.size),
        "mean": float(v.mean()),
        "std": float(v.std(ddof=1)) if v.size > 1 else 0.0,
        "min": float(v.min()),
        "p25": float(np.percentile(v, 25)),
        "p50": float(np.percentile(v, 50)),
        "p75": float(np.percentile(v, 75)),
        "max": float(v.max()),
    }


def render_markdown_report(
    title: str, sections: list[tuple[str, pa.Table]], *, float_fmt: str = "{:.4f}"
) -> str:
    """Markdown report sink (≙ S8 export sinks,
    scripts/generate_decision_report.py:429-616): tables of small aggregates
    rendered driver-side."""
    lines = [f"# {title}", ""]
    for heading, table in sections:
        lines.append(f"## {heading}")
        lines.append("")
        cols = table.column_names
        lines.append("| " + " | ".join(cols) + " |")
        lines.append("| " + " | ".join("---" for _ in cols) + " |")
        for row in table.to_pylist():
            cells = []
            for c in cols:
                v = row[c]
                cells.append(float_fmt.format(v) if isinstance(v, float) else str(v))
            lines.append("| " + " | ".join(cells) + " |")
        lines.append("")
    return "\n".join(lines)


def export_tables(
    tables: dict[str, pa.Table], out_dir: str, *, title: str = "Benchmark report"
) -> dict[str, str]:
    """Export sinks (≙ S8, scripts/export_benchmark_results.py:239-307):
    CSV + JSON snapshot per table plus one combined markdown report.
    Driver-side — inputs are small aggregates."""
    import json
    import os

    import pyarrow.csv as pacsv

    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, str] = {}
    for name, table in tables.items():
        csv_path = os.path.join(out_dir, f"{name}.csv")
        pacsv.write_csv(table, csv_path)
        written[f"{name}.csv"] = csv_path
        json_path = os.path.join(out_dir, f"{name}.json")
        with open(json_path, "w") as f:
            json.dump(table.to_pylist(), f, default=str)
        written[f"{name}.json"] = json_path
    md_path = os.path.join(out_dir, "report.md")
    with open(md_path, "w") as f:
        f.write(render_markdown_report(title, sorted(tables.items())))
    written["report.md"] = md_path
    html_path = os.path.join(out_dir, "report.html")
    with open(html_path, "w") as f:
        f.write(render_html_report(title, sorted(tables.items())))
    written["report.html"] = html_path
    written.update(export_charts(tables, os.path.join(out_dir, "charts")))
    return written


def _plotly_express():
    """plotly.express if installed, else None — separated so tests can
    monkeypatch a fake and exercise the chart branch (plotly is absent from
    this container)."""
    try:  # pragma: no cover - not installed in this container
        import plotly.express as px

        return px
    except ImportError:
        return None


def export_charts(
    tables: dict[str, pa.Table], charts_dir: str, *, entity_col: str | None = None
) -> dict[str, str]:
    """Interactive chart sink (≙ S8 charts,
    generate_decision_report.py:220-226 write_chart / build_charts): one
    grouped-bar HTML per table — entities colored, one bar group per numeric
    metric — written with ``include_plotlyjs='cdn'`` like the reference.
    Driver-side over small aggregates; returns {} when plotly is absent
    (same gate as the reference's ``if px is None``)."""
    import os

    px = _plotly_express()
    if px is None:
        return {}
    written: dict[str, str] = {}
    os.makedirs(charts_dir, exist_ok=True)
    for name, table in tables.items():
        # same column-selection rules as render_html_report — the two S8
        # chart sinks must agree on what is an entity / metric column
        ecol = _entity_col(table, entity_col)
        value_cols = [c for c in _numeric_cols(table) if c != ecol]
        if ecol is None or not value_cols:
            continue
        df = table.to_pandas()
        melted = df.melt(
            id_vars=[ecol], value_vars=value_cols, var_name="metric", value_name="value"
        )
        fig = px.bar(
            melted,
            x="metric",
            y="value",
            color=ecol,
            barmode="group",
            title=name,
            labels={"metric": "Metric", "value": "Value"},
        )
        path = os.path.join(charts_dir, f"{name}.html")
        fig.write_html(path, include_plotlyjs="cdn", full_html=True)
        written[f"charts/{name}.html"] = path
    return written


# --- self-contained HTML report: inline SVG charts, zero dependencies ------
#
# The reference ships two HTML surfaces: plotly chart files
# (generate_decision_report.py:222-226 write_chart, :228-310 build_charts)
# and a styled HTML wrapper around the markdown report
# (generate_decision_report.py:619-683 build_report_html). `export_charts`
# above mirrors the plotly path when plotly exists; this section replaces the
# wrapper with a *self-contained* report — one file, charts inlined as SVG —
# that renders in any browser with no plotly / CDN / network, which is the
# only chart path that can actually run (and be tested) in an offline
# cluster. Chart design follows the small-multiples rule: one panel per
# metric with its own honest y-scale (never several differently-scaled
# metrics sharing one axis), entities colored in a fixed categorical order
# (CVD-validated palette), identity carried by a legend + per-bar tooltip,
# and the full data table under every chart so nothing is gated on color.

# 8 CVD-validated categorical slots (light, dark) — assigned to entities in
# first-seen order, never cycled; entities past 8 fold into the table.
_SERIES_COLORS: list[tuple[str, str]] = [
    ("#2a78d6", "#3987e5"),
    ("#eb6834", "#d95926"),
    ("#1baf7a", "#199e70"),
    ("#eda100", "#c98500"),
    ("#e87ba4", "#d55181"),
    ("#008300", "#008300"),
    ("#4a3aa7", "#9085e9"),
    ("#e34948", "#e66767"),
]
_MAX_PLOTTED_ENTITIES = 8

_HTML_STYLE = """
  body { font-family: system-ui, "Segoe UI", sans-serif; max-width: 1100px;
         margin: 32px auto; padding: 0 18px 40px; line-height: 1.45; }
  .viz-root { color-scheme: light;
    --surface-1: #fcfcfb; --card: #ffffff; --border: #e5e7eb;
    --text-primary: #0b0b0b; --text-secondary: #52514e; --grid: #e7e6e3; }
  @media (prefers-color-scheme: dark) {
    .viz-root { color-scheme: dark;
      --surface-1: #1a1a19; --card: #232322; --border: #3a3a38;
      --text-primary: #ffffff; --text-secondary: #c3c2b7; --grid: #3a3a38; }
  }
  .viz-root { background: var(--surface-1); color: var(--text-primary); }
  .card { background: var(--card); border: 1px solid var(--border);
          border-radius: 10px; padding: 18px; margin-bottom: 16px; }
  h1, h2 { color: var(--text-primary); }
  table.data { border-collapse: collapse; font-size: 13px; margin-top: 10px; }
  table.data th, table.data td { border: 1px solid var(--border);
          padding: 4px 9px; text-align: right; }
  table.data th { color: var(--text-secondary); font-weight: 600; }
  table.data td:first-child, table.data th:first-child { text-align: left; }
  .panels { display: flex; flex-wrap: wrap; gap: 14px; align-items: flex-end; }
  .legend { font-size: 12px; color: var(--text-secondary); margin: 6px 0; }
  .legend span.key { display: inline-block; width: 10px; height: 10px;
          border-radius: 2px; margin: 0 4px 0 12px; }
  .note { font-size: 12px; color: var(--text-secondary); }
"""


def _esc(v: object) -> str:
    import html

    return html.escape(str(v), quote=True)


def _nice_step(raw: float) -> float:
    """Clean axis step (1/2/5 x 10^k) nearest raw (Heckbert rounding)."""
    import math

    # clamp: a subnormal/zero span would underflow log10; below display
    # precision every step is equally honest
    raw = max(raw, 1e-12)
    mag = 10.0 ** math.floor(math.log10(raw))
    f = raw / mag
    nice = 1.0 if f < 1.5 else 2.0 if f < 3.0 else 5.0 if f < 7.0 else 10.0
    return nice * mag


def _fmt_num(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return f"{int(v):,}"
    return f"{v:,.4g}"


def _bar_path(x: float, w: float, y_base: float, y_end: float) -> str:
    """Column with a 4px-rounded data end and a square baseline end.

    ``y_end < y_base`` draws upward (positive value, rounded top);
    ``y_end > y_base`` draws downward (negative value, rounded bottom)."""
    r = min(4.0, w / 2.0, abs(y_end - y_base) / 2.0)
    if y_end <= y_base:  # grows up
        return (
            f"M{x:.1f},{y_base:.1f} V{y_end + r:.1f} "
            f"Q{x:.1f},{y_end:.1f} {x + r:.1f},{y_end:.1f} H{x + w - r:.1f} "
            f"Q{x + w:.1f},{y_end:.1f} {x + w:.1f},{y_end + r:.1f} "
            f"V{y_base:.1f} Z"
        )
    return (
        f"M{x:.1f},{y_base:.1f} V{y_end - r:.1f} "
        f"Q{x:.1f},{y_end:.1f} {x + r:.1f},{y_end:.1f} H{x + w - r:.1f} "
        f"Q{x + w:.1f},{y_end:.1f} {x + w:.1f},{y_end - r:.1f} "
        f"V{y_base:.1f} Z"
    )


def _svg_metric_panel(
    metric: str, entities: list[str], values: list[float], slots: list[int]
) -> str:
    """One small-multiple column panel: one metric, its own zero-anchored
    y-scale, one column per entity in palette order, hairline gridlines,
    value on each cap, a native ``<title>`` tooltip per column."""
    import math

    vals = [float("nan") if v is None else float(v) for v in values]
    finite = [v for v in vals if v == v and abs(v) != float("inf")]
    vmax = max([v for v in finite if v > 0], default=0.0)
    vmin = min([v for v in finite if v < 0], default=0.0)
    # Asymmetric honest scale: the axis covers [floor(vmin), ceil(vmax)] in
    # clean steps — a tiny negative does NOT mirror the whole positive range
    # (that would halve the resolution of every positive column).
    step = _nice_step(((vmax - vmin) or 1.0) / 4)
    top = math.ceil(round(vmax / step, 9)) * step if vmax > 0 else 0.0
    bottom = math.floor(round(vmin / step, 9)) * step if vmin < 0 else 0.0
    if top == bottom:
        top = step
    bar_w, gap, pad_l, pad_r = 22.0, 10.0, 46.0, 8.0
    plot_h, title_h, foot_h = 120.0, 20.0, 14.0
    n = len(entities)
    width = pad_l + n * bar_w + (n - 1) * gap + pad_r
    height = title_h + plot_h + foot_h
    scale = plot_h / (top - bottom)
    y0 = title_h + (top * scale)  # zero line

    def y(v: float) -> float:
        return y0 - v * scale

    parts = [
        f'<svg role="img" width="{width:.0f}" height="{height:.0f}" '
        f'viewBox="0 0 {width:.0f} {height:.0f}" '
        f'aria-label="{_esc(metric)}">',
        f'<text x="{pad_l}" y="12" font-size="12" fill="var(--text-primary)" '
        f'font-weight="600">{_esc(metric)}</text>',
    ]
    lo, hi = round(bottom / step), round(top / step)
    grid_ticks = [round(i * step, 10) for i in range(int(lo), int(hi) + 1)]
    for t in grid_ticks:
        gy = y(t)
        parts.append(
            f'<line x1="{pad_l}" y1="{gy:.1f}" x2="{width - pad_r:.1f}" '
            f'y2="{gy:.1f}" stroke="var(--grid)" stroke-width="1"/>'
        )
        parts.append(
            f'<text x="{pad_l - 5}" y="{gy + 3.5:.1f}" font-size="9" '
            f'text-anchor="end" fill="var(--text-secondary)">'
            f"{_fmt_num(t)}</text>"
        )
    for i, (ent, v) in enumerate(zip(entities, vals)):
        x = pad_l + i * (bar_w + gap)
        if v != v or abs(v) == float("inf"):
            # null/NaN/inf: a visual gap, but hover still explains it —
            # a transparent hit area distinguishes "no data" from "zero"
            parts.append(
                f'<rect x="{x:.1f}" y="{title_h}" width="{bar_w}" '
                f'height="{plot_h}" fill="transparent">'
                f"<title>{_esc(ent)}: no data</title></rect>"
            )
            continue
        light, dark = _SERIES_COLORS[slots[i] % len(_SERIES_COLORS)]
        ve = min(max(v, bottom), top)
        parts.append(
            f'<g><path d="{_bar_path(x, bar_w, y0, y(ve))}" '
            f'fill="{light}" style="fill:light-dark({light},{dark})">'
            f"</path><title>{_esc(ent)}: {_fmt_num(v)}</title>"
        )
        ly = y(ve) - 3 if v >= 0 else y(ve) + 9
        parts.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{ly:.1f}" font-size="9" '
            f'text-anchor="middle" fill="var(--text-secondary)">'
            f"{_fmt_num(v)}</text></g>"
        )
    parts.append("</svg>")
    return "".join(parts)


def _numeric_cols(table: pa.Table) -> list[str]:
    return [
        f.name
        for f in table.schema
        if pa.types.is_integer(f.type) or pa.types.is_floating(f.type)
    ]


def _entity_col(table: pa.Table, entity_col: str | None) -> str | None:
    if entity_col is not None and entity_col in table.column_names:
        return entity_col
    for f in table.schema:
        if pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            return f.name
    return None


def render_html_report(
    title: str,
    sections: list[tuple[str, pa.Table]],
    *,
    entity_col: str | None = None,
    float_fmt: str = "{:.4f}",
) -> str:
    """Self-contained HTML report (≙ S8 HTML surface,
    generate_decision_report.py:619-683 build_report_html + :228-310
    build_charts): one card per section with inline-SVG small-multiple
    column panels (one per numeric column, entities colored in fixed
    palette order) above the full data table. Driver-side over small
    aggregates, like the markdown sink. Unlike the reference's wrapper it
    needs no plotly, no CDN, and no companion chart files."""
    body = [
        '<div class="card"><h1>%s</h1><p class="note">Self-contained '
        "report: charts are inline SVG, no external assets.</p></div>" % _esc(title)
    ]
    # Color follows the ENTITY across the whole report, never its row rank:
    # slots are assigned report-globally in first-seen order, so a table
    # sorted one way in one section and another way in the next keeps every
    # entity its color. Entities past the 8 validated slots are table-only.
    slot_of: dict[str, int] = {}
    for _, table in sections:
        ecol = _entity_col(table, entity_col)
        if ecol is None or not any(c != ecol for c in _numeric_cols(table)):
            continue
        for v in table.column(ecol).to_pylist():
            e = str(v)
            if e not in slot_of and len(slot_of) < _MAX_PLOTTED_ENTITIES:
                slot_of[e] = len(slot_of)
    for heading, table in sections:
        body.append(f'<div class="card"><h2>{_esc(heading)}</h2>')
        ecol = _entity_col(table, entity_col)
        ncols = [c for c in _numeric_cols(table) if c != ecol]
        if ecol is not None and ncols and table.num_rows:
            entities = [str(v) for v in table.column(ecol).to_pylist()]
            idx = [i for i, e in enumerate(entities) if e in slot_of]
            plotted = [entities[i] for i in idx]
            slots = [slot_of[e] for e in plotted]
            if len(plotted) > 1:
                seen: set[int] = set()
                keys = "".join(
                    f'<span class="key" style="background:{_SERIES_COLORS[s][0]};'
                    f"background:light-dark({_SERIES_COLORS[s][0]},"
                    f'{_SERIES_COLORS[s][1]})"></span>{_esc(e)}'
                    for s, e in zip(slots, plotted)
                    if not (s in seen or seen.add(s))
                )
                body.append(f'<div class="legend">{keys}</div>')
            if plotted:
                panels = [
                    _svg_metric_panel(
                        c,
                        plotted,
                        [table.column(c).to_pylist()[i] for i in idx],
                        slots,
                    )
                    for c in ncols
                ]
                body.append(f'<div class="panels">{"".join(panels)}</div>')
            if len(entities) > len(plotted):
                body.append(
                    f'<p class="note">Charting {len(plotted)} of '
                    f"{len(entities)} rows ({_MAX_PLOTTED_ENTITIES}-color "
                    "palette limit); the table below has all rows.</p>"
                )
        cols = table.column_names
        rows_html = []
        for row in table.to_pylist():
            cells = [
                _esc(float_fmt.format(row[c]) if isinstance(row[c], float) else row[c])
                for c in cols
            ]
            rows_html.append("<tr><td>" + "</td><td>".join(cells) + "</td></tr>")
        body.append(
            '<table class="data"><thead><tr><th>'
            + "</th><th>".join(_esc(c) for c in cols)
            + "</th></tr></thead><tbody>"
            + "".join(rows_html)
            + "</tbody></table></div>"
        )
    return (
        "<!doctype html>\n<html><head><meta charset='utf-8'/>"
        '<meta name="viewport" content="width=device-width, initial-scale=1"/>'
        f"<title>{_esc(title)}</title><style>{_HTML_STYLE}</style></head>"
        f'<body class="viz-root">{"".join(body)}</body></html>\n'
    )


def recommend_best(
    table: pa.Table, sort_spec: list[tuple[str, str]], *, tiebreak: str | None = None
) -> pa.Table:
    """Multi-key sort → top-1 (reference: results_summary.py:56-81).
    ``tiebreak`` (entity name asc) makes the winner deterministic."""
    keys = list(sort_spec)
    if tiebreak:
        keys.append((tiebreak, "ascending"))
    idx = pc.sort_indices(table, sort_keys=keys)
    return table.take(idx[:1])
