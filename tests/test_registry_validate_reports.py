"""Tests: stage registry, validation filters + error categorization, pivot /
describe / markdown report, CSV dimension source, embedding near-dup pairs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ocr_endpoint_project_ray.pipelines.reports import (
    describe_column,
    pivot_table,
    render_markdown_report,
)
from ocr_endpoint_project_ray.registry import (
    StageSpec,
    build_pipeline,
    get_stage,
    register_stage,
    registered_stages,
)
from ocr_endpoint_project_ray.sources.tables import read_metadata_csv
from ocr_endpoint_project_ray.stages.ann import embedding_dupe_pairs
from ocr_endpoint_project_ray.stages.validate import (
    categorize_errors,
    split_valid,
    tag_invalid_rows,
)


class TestRegistry:
    def test_builtins_present(self):
        assert {"explode_spans", "strip_html", "ocr_media"} <= set(registered_stages())

    def test_register_and_build(self):
        def add_one(b: pa.Table) -> pa.Table:
            return b.set_column(0, "x", pa.compute.add(b.column("x"), 1))

        register_stage(StageSpec("add_one_test", add_one), replace=True)
        ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
        out = build_pipeline(ds, ["add_one_test", "add_one_test"])
        assert sorted(r["x"] for r in out.take_all()) == [3, 4]

    def test_duplicate_registration_rejected(self):
        register_stage(StageSpec("dup_test", lambda b: b), replace=True)
        with pytest.raises(ValueError):
            register_stage(StageSpec("dup_test", lambda b: b))

    def test_unknown_stage(self):
        with pytest.raises(KeyError):
            get_stage("no_such_stage")


class TestValidation:
    def _batch(self):
        return pa.table(
            {
                "filename": pa.array(
                    ["a.pdf", "b.exe", "c.PNG", "d.docx", "e.jpeg"], pa.string()
                ),
                "payload": pa.array(
                    [b"x", b"y", b"", b"z" * 10, b"ok"], pa.large_binary()
                ),
            }
        )

    def test_tagging(self):
        out = tag_invalid_rows(self._batch(), payload_col="payload")
        reasons = out.column("reject_reason").to_pylist()
        assert reasons == [None, "unsupported_media_type", "empty_file", None, None]

    def test_size_cap(self):
        batch = pa.table(
            {
                "filename": pa.array(["big.pdf"], pa.string()),
                "payload": pa.array([b"x" * 32], pa.large_binary()),
            }
        )
        out = tag_invalid_rows(batch, payload_col="payload", max_bytes=16)
        assert out.column("reject_reason").to_pylist() == ["payload_too_large"]

    def test_split_with_skip_accounting(self):
        ds = ray.data.from_arrow(self._batch()).materialize()
        ok, rej = split_valid(ds, payload_col="payload")
        assert ok.count() == 3
        rej_rows = rej.take_all()
        assert {r["reject_reason"] for r in rej_rows} == {
            "unsupported_media_type",
            "empty_file",
        }

    def test_categorize_errors(self):
        batch = pa.table(
            {
                "error": pa.array(
                    [
                        None,
                        "request timeout after 120s",
                        "PARSING_JSON_INVALID",
                        "PARSING_SCHEMA_VALIDATION_FAILED: x",
                        "boom",
                    ],
                    pa.string(),
                )
            }
        )
        cats = categorize_errors(batch).column("error_category").to_pylist()
        assert cats == ["none", "timeout", "invalid_json", "schema_validation", "other_error"]


class TestReports:
    def test_pivot(self):
        t = pa.table(
            {
                "cv": pa.array(["c1", "c1", "c2"], pa.string()),
                "model": pa.array(["m1", "m2", "m1"], pa.string()),
                "cer": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
        p = pivot_table(t, index="cv", columns="model", values="cer")
        assert p.column_names == ["cv", "m1", "m2"]
        assert p.to_pylist() == [
            {"cv": "c1", "m1": 1.0, "m2": 2.0},
            {"cv": "c2", "m1": 3.0, "m2": None},
        ]

    def test_describe(self):
        t = pa.table({"x": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64())})
        d = describe_column(t, "x")
        assert d["count"] == 4 and d["mean"] == 2.5 and d["p50"] == 2.5

    def test_render_markdown(self):
        t = pa.table({"model": pa.array(["m1"], pa.string()), "cer": pa.array([1.5], pa.float64())})
        md = render_markdown_report("Report", [("Summary", t)])
        assert "# Report" in md and "| model | cer |" in md and "1.5000" in md


class TestHtmlReport:
    """Self-contained HTML report sink (inline SVG, no plotly/CDN)."""

    def _table(self, n=2):
        return pa.table(
            {
                "model": pa.array([f"m{i}" for i in range(n)], pa.string()),
                "cer": pa.array([float(i) + 0.5 for i in range(n)], pa.float64()),
                "runs": pa.array(list(range(n)), pa.int64()),
            }
        )

    def test_panels_legend_table(self):
        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        html = render_html_report("R", [("scores", self._table(3))])
        # one small-multiple panel per numeric column, never one mixed axis
        assert html.count("<svg") == 2
        # 3 entities x 2 metrics = 6 columns, each with a native tooltip
        assert html.count("<title>m") == 6
        # fixed palette order: first two categorical slots, light-dark pairs
        assert html.index("#2a78d6") < html.index("#eb6834")
        assert "light-dark(#2a78d6,#3987e5)" in html
        # >=2 series -> legend present; full data table always present
        assert html.count('class="legend"') == 1
        assert html.count("<tr><td>") == 3 and "0.5000" in html
        # dark mode is selected, not an automatic flip
        assert "prefers-color-scheme: dark" in html

    def test_single_series_no_legend_and_escaping(self):
        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        t = pa.table(
            {
                "model": pa.array(["<b>&x"], pa.string()),
                "cer": pa.array([1.0], pa.float64()),
            }
        )
        html = render_html_report("T&<", [("s", t)])
        assert 'class="legend"' not in html  # one series: title carries identity
        assert "&lt;b&gt;&amp;x" in html and "<b>&x" not in html

    def test_entity_cap_folds_to_table(self):
        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        html = render_html_report("R", [("big", self._table(11))])
        # charts cap at 8 fixed slots (never cycled); table keeps all rows
        assert html.count("<title>m") == 8 * 2
        assert "Charting 8 of 11 rows" in html and html.count("<tr><td>") == 11

    def test_color_follows_entity_across_sections(self):
        import re

        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        a = pa.table(
            {"model": pa.array(["m1", "m2"]), "cer": pa.array([1.0, 2.0])}
        )
        b = pa.table(  # same entities, reversed row order
            {"model": pa.array(["m2", "m1"]), "wer": pa.array([3.0, 4.0])}
        )
        html = render_html_report("R", [("by_cer", a), ("by_wer", b)])
        # m1 keeps slot 1 (blue) and m2 slot 2 (orange) in BOTH sections:
        # each bar group pairs fill color with its tooltip entity
        pairs = re.findall(r'fill="(#\w+)"[^>]*></path><title>(m\d)', html)
        assert set(pairs) == {("#2a78d6", "m1"), ("#eb6834", "m2")}, pairs

    def test_asymmetric_axis_small_negative(self):
        import re

        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        t = pa.table(
            {
                "k": pa.array(["a", "b", "c"]),
                "v": pa.array([100.0, 98.0, -0.5]),
            }
        )
        html = render_html_report("R", [("s", t)])
        labels = re.findall(r'text-anchor="end"[^>]*>([-\d,.]+)</text>', html)
        lo = min(float(x.replace(",", "")) for x in labels)
        # axis bottom hugs the data (one step below 0), never mirrors +100
        assert -30 <= lo < 0, labels

    def test_null_value_has_no_data_tooltip(self):
        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        t = pa.table({"k": pa.array(["a", "b"]), "m": pa.array([None, 2.0])})
        html = render_html_report("R", [("s", t)])
        assert html.count("<path d=") == 1  # null is a gap, not a zero bar
        assert "<title>a: no data</title>" in html  # hover explains the gap

    def test_negative_values_draw_below_zero_line(self):
        import re

        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        t = pa.table(
            {
                "k": pa.array(["a", "b"], pa.string()),
                "delta": pa.array([-3.5, 7.25], pa.float64()),
            }
        )
        html = render_html_report("R", [("d", t)])
        bars = re.findall(r'd="M[\d.]+,([\d.]+) V([-\d.]+)', html)
        (b0, v0), (b1, v1) = [(float(a), float(b)) for a, b in bars]
        assert v0 > b0  # negative bar extends downward from the zero line
        assert v1 < b1  # positive bar extends upward
        assert "nan" not in html

    def test_no_entity_or_numeric_column_table_only(self):
        from ocr_endpoint_project_ray.pipelines.reports import render_html_report

        nums_only = pa.table({"x": pa.array([1.0], pa.float64())})
        strs_only = pa.table({"s": pa.array(["a"], pa.string())})
        html = render_html_report("R", [("n", nums_only), ("s", strs_only)])
        assert "<svg" not in html and html.count("<table") == 2

    def test_export_tables_writes_html(self, tmp_path):
        from ocr_endpoint_project_ray.pipelines.reports import export_tables

        written = export_tables({"scores": self._table(2)}, str(tmp_path))
        assert "report.html" in written
        content = open(written["report.html"]).read()
        assert content.count("<svg") == 2 and "scores" in content


class TestCsvSource:
    def test_nonempty_filter(self, tmp_path):
        p = tmp_path / "metadata.csv"
        p.write_text("filename,language\ncv001.pdf,fr\n  ,en\ncv002.docx,ar\n")
        ds = read_metadata_csv(str(p))
        rows = ds.take_all()
        # row order across blocks is not guaranteed — compare as a set
        assert sorted(r["filename"] for r in rows) == ["cv001.pdf", "cv002.docx"]


class TestEmbeddingDupes:
    def test_finds_planted_dupes(self):
        rng = np.random.default_rng(3)
        base = rng.standard_normal((50, 16)).astype(np.float32)
        # plant near-duplicates: rows 50..54 ≈ rows 0..4
        dup = base[:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.01
        m = np.vstack([base, dup])
        tbl = pa.table(
            {
                "vec_id": pa.array(range(55), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in m], pa.list_(pa.float32())),
            }
        )
        ds = ray.data.from_arrow(tbl)
        pairs = embedding_dupe_pairs(ds, threshold=0.98, num_partitions=4).take_all()
        found = {(p["vec_a"], p["vec_b"]) for p in pairs}
        planted = {(i, 50 + i) for i in range(5)}
        # LSH is approximate: require most planted pairs found, no junk pairs
        assert len(found & planted) >= 3
        assert all(p["cosine_sim"] >= 0.98 for p in pairs)
        assert not any(p["truncated"] for p in pairs)  # no degenerate buckets here

    def test_degenerate_bucket_bounded(self):
        """All-identical embeddings land in ONE bucket: without the
        max_bucket guard that is O(n²) pairs; with it, output is capped at
        C(max_bucket, 2) and flagged truncated in-band."""
        n, cap = 40, 8
        tbl = pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([[1.0, 2.0, 3.0, 4.0]] * n, pa.list_(pa.float32())),
            }
        )
        ds = ray.data.from_arrow(tbl)
        pairs = embedding_dupe_pairs(
            ds, threshold=0.5, num_partitions=2, max_bucket=cap
        ).take_all()
        assert len(pairs) == cap * (cap - 1) // 2
        assert all(p["truncated"] for p in pairs)
        # kept members are the lowest vec_ids (deterministic truncation)
        assert max(max(p["vec_a"], p["vec_b"]) for p in pairs) == cap - 1
