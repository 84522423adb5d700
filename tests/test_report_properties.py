"""Property tests for the inline-SVG report renderer: for ANY finite/null
value mix the panel must emit parseable geometry — every coordinate finite,
every bar inside the plot box, the axis covering the data."""

import math
import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_endpoint_project_ray.pipelines.reports import (
    _bar_path,
    _nice_step,
    _svg_metric_panel,
    render_html_report,
)

values = st.one_of(
    st.none(),
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ),
    st.just(float("nan")),
)


@given(st.lists(values, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_panel_geometry_always_valid(vals):
    ents = [f"e{i}" for i in range(len(vals))]
    svg = _svg_metric_panel("m", ents, vals, list(range(len(vals))))
    # every numeric coordinate in the output parses finite
    for m in re.finditer(r'[ xy][12]?="([-\d.e+]+)"', svg):
        assert math.isfinite(float(m.group(1))), m.group(0)
    for m in re.finditer(r'd="([^"]+)"', svg):
        for tok in re.findall(r"[-\d.e+]+", m.group(1)):
            assert math.isfinite(float(tok))
    # bars stay inside the plot box (title 20 .. title+plot 140)
    for m in re.finditer(r'd="M[\d.]+,([\d.]+) V([-\d.]+)', svg):
        y_base, y_first = float(m.group(1)), float(m.group(2))
        assert 19.9 <= y_base <= 140.1
        assert 15.9 <= y_first <= 140.1  # data end, minus the 4px corner
    # a finite value always gets a tooltip; null/NaN a 'no data' hover
    n_real = sum(1 for v in vals if v is not None and v == v)
    assert svg.count("<title>e") == len(vals)
    assert svg.count(": no data") == len(vals) - n_real


@given(
    st.floats(min_value=1e-9, max_value=1e12, allow_nan=False, allow_infinity=False)
)
@settings(max_examples=200, deadline=None)
def test_nice_step_brackets_raw(raw):
    step = _nice_step(raw)
    # Heckbert rounding: worst ratios are 1/1.5 (f->1.5-) and 5/3 (f->3+)
    assert raw / 1.51 <= step <= raw * 5 / 2.99
    exp = math.floor(math.log10(step))
    mant = step / 10**exp
    assert min(abs(mant - m) for m in (1.0, 2.0, 5.0, 10.0)) < 1e-6


@given(
    st.floats(min_value=0, max_value=100),
    st.floats(min_value=-50, max_value=50),
)
@settings(max_examples=100, deadline=None)
def test_bar_path_radius_never_exceeds_bar(y_base, dy):
    path = _bar_path(10.0, 22.0, y_base, y_base + dy)
    # the rounded corner never folds back past the bar's own extent
    nums = [float(t) for t in re.findall(r"[-\d.]+", path)]
    assert all(math.isfinite(n) for n in nums)


def test_report_many_sections_shared_palette():
    tables = [
        (
            f"s{j}",
            pa.table(
                {
                    "k": pa.array([f"e{(i + j) % 4}" for i in range(4)]),
                    "v": pa.array([float(i) for i in range(4)]),
                }
            ),
        )
        for j in range(3)
    ]
    html = render_html_report("R", tables)
    # 4 entities across 3 sections: one slot each, stable everywhere
    pairs = set(re.findall(r'fill="(#\w+)"[^>]*></path><title>(e\d)', html))
    assert len(pairs) == 4  # each entity maps to exactly one color
