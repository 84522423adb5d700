"""Tests: format sniff/convert/paginate stages + payload bounding + export sinks."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ocr_endpoint_project_ray.pipelines.reports import export_tables
from ocr_endpoint_project_ray.stages.formats import (
    bound_payload,
    normalize_documents,
    normalize_to_pdf_batch,
    pdf_page_count,
    pdf_to_pages_batch,
    sniff_format,
)


class TestSniff:
    def test_magic(self):
        assert sniff_format(b"%PDF-1.7 ...") == "pdf"
        assert sniff_format(b"\x89PNG\r\n") == "png"
        assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
        assert sniff_format(b"PK\x03\x04docx") == "docx"
        assert sniff_format(b"") == "empty"
        assert sniff_format(None) == "empty"
        assert sniff_format(b"garbage") == "unknown"


class TestNormalize:
    def _batch(self):
        return pa.table(
            {
                "doc_id": pa.array(["a", "b", "c"], pa.string()),
                "payload": pa.array(
                    [b"%PDF-1.7 content", b"\x89PNGimagebytes", b"not a doc"],
                    pa.large_binary(),
                ),
            }
        )

    def test_dispatch_and_inband_errors(self):
        out = normalize_to_pdf_batch(self._batch())
        assert out.column("src_format").to_pylist() == ["pdf", "png", "unknown"]
        errs = out.column("error").to_pylist()
        assert errs[0] is None and errs[1] is None and "unsupported" in errs[2]
        payloads = out.column("payload").to_pylist()
        assert payloads[0] == b"%PDF-1.7 content"  # pdf passthrough
        assert payloads[1].startswith(b"%PDF")  # converted (stub)
        assert payloads[2] is None

    def test_pages_explode(self):
        pdf = normalize_to_pdf_batch(self._batch())
        ok = pdf.filter(pa.compute.is_null(pdf.column("error")))
        pages = pdf_to_pages_batch(ok)
        assert pages.num_rows == sum(
            pdf_page_count(p) for p in ok.column("payload").to_pylist()
        )
        # page order carried in data, deterministic payloads
        again = pdf_to_pages_batch(ok)
        assert pages.to_pylist() == again.to_pylist()

    def test_composed_dataset_pipeline(self):
        ds = ray.data.from_arrow(self._batch())
        out = normalize_documents(ds)
        assert out.count() > 0
        assert set(out.schema().names) == {"doc_id", "page_no", "page_payload"}


class TestBoundPayload:
    def test_small_unchanged(self):
        p, steps = bound_payload(b"x" * 100, max_bytes=1000)
        assert p == b"x" * 100 and steps == 0

    def test_large_bounded(self):
        p, steps = bound_payload(b"y" * 10_000, max_bytes=1024)
        assert len(p) <= 1024 and steps >= 1
        # deterministic
        assert bound_payload(b"y" * 10_000, max_bytes=1024) == (p, steps)


class TestExport:
    def test_export_sinks(self, tmp_path):
        t = pa.table({"model": pa.array(["m1", "m2"]), "cer": pa.array([1.0, 2.0])})
        written = export_tables({"summary": t}, str(tmp_path / "out"))
        assert set(written) == {"summary.csv", "summary.json", "report.md", "report.html"}
        assert (tmp_path / "out" / "summary.csv").read_text().startswith('"model"')
        assert "| model | cer |" in (tmp_path / "out" / "report.md").read_text()
