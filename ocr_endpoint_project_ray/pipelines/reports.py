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
        df = table.to_pandas()
        if entity_col is not None and entity_col in df.columns:
            ecol = entity_col
        else:
            non_num = [c for c in df.columns if df[c].dtype == object]
            ecol = non_num[0] if non_num else None
        value_cols = [c for c in df.columns if c != ecol and df[c].dtype.kind in "if"]
        if ecol is None or not value_cols:
            continue
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
