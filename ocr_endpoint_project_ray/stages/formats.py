"""Format normalization stages (SURVEY.md §2.2 M1-M6): sniff → convert-to-PDF
dispatch → rasterize-to-pages flat_map → payload bounding.

The reference canonicalizes every upload to PDF bytes then rasterizes to
per-page PNGs (``cv_api/pipeline.py:93-127`` prepare_pdf_bytes;
``ocr_common.py:207-219`` pdf_to_images; ``:233-249`` image→pdf; ``:252-297``
docx→pdf via LibreOffice; ``:401-428`` payload downscale ladder). Converter
binaries (PyMuPDF/LibreOffice/PIL) are not in this container — conversions
are deterministic stubs behind import-tries; the dispatch, flat_map explode
shape, in-band errors and payload-bounding loop are the real operators.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import tempfile

import pyarrow as pa

import ray.data


def _pymupdf():
    """PyMuPDF module if installed, else None (stub fallback). Separated so
    tests can monkeypatch a fake engine and exercise the real branches."""
    try:  # pragma: no cover - not installed in this container
        import fitz

        return fitz
    except ImportError:
        return None


def _soffice() -> str | None:
    """LibreOffice binary for docx→pdf, or None (stub fallback)."""
    return shutil.which("soffice") or shutil.which("libreoffice")

#: Header written by the stub converters — downstream PDF stages must treat
#: such payloads as stubs even when a real PDF engine is installed.
_PDF_STUB_MAGIC = b"%PDF-stub"

_MAGIC = (
    (b"%PDF", "pdf"),
    (b"\x89PNG", "png"),
    (b"\xff\xd8", "jpeg"),
    (b"PK\x03\x04", "docx"),  # zip container; reference trusts the extension
)


def sniff_format(payload: bytes | None) -> str:
    """Magic-byte format sniff (binary-level ext-dispatch, ≙ M1/M14)."""
    if not payload:
        return "empty"
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def _docx_to_pdf_soffice(payload: bytes, soffice: str) -> bytes:
    """docx→pdf via a headless LibreOffice subprocess
    (≙ ocr_common.py:252-297): write to a temp dir, convert, read back."""
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "doc.docx")
        with open(src, "wb") as f:
            f.write(payload)
        subprocess.run(
            [soffice, "--headless", "--convert-to", "pdf", "--outdir", tmp, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        with open(os.path.join(tmp, "doc.pdf"), "rb") as f:
            return f.read()


def _convert_to_pdf(payload: bytes, fmt: str) -> bytes:
    """Canonicalize to PDF bytes (≙ prepare_pdf_bytes dispatch, M1-M3).

    Real branches run the moment the converters land in the container:
    image→pdf via PyMuPDF ``convert_to_pdf`` (ocr_common.py:233-249),
    docx→pdf via headless LibreOffice (ocr_common.py:252-297). Without
    them, a deterministic stub wraps the payload with a PDF header so
    downstream stages see 'pdf'.
    """
    if fmt == "pdf":
        return payload
    if fmt in ("png", "jpeg"):
        fitz = _pymupdf()
        if fitz is not None:
            with fitz.open(stream=payload, filetype=fmt) as img:
                return img.convert_to_pdf()
        return _PDF_STUB_MAGIC + b"\n" + hashlib.md5(payload).digest() + payload
    if fmt == "docx":
        soffice = _soffice()
        if soffice is not None:
            return _docx_to_pdf_soffice(payload, soffice)
        return _PDF_STUB_MAGIC + b"\n" + hashlib.md5(payload).digest() + payload
    raise ValueError(f"unsupported format: {fmt}")


def normalize_to_pdf_batch(batch: pa.Table, *, payload_col: str = "payload") -> pa.Table:
    """map_batches: sniff + convert; failures in-band (``error`` column)."""
    payloads = batch.column(payload_col).to_pylist()
    out_fmt, out_payload, out_err = [], [], []
    for p in payloads:
        fmt = sniff_format(p)
        try:
            if fmt in ("empty", "unknown"):
                raise ValueError(f"unsupported_media_type: {fmt}")
            out_payload.append(_convert_to_pdf(p, fmt))
            out_fmt.append(fmt)
            out_err.append(None)
        except Exception as e:
            out_payload.append(None)
            out_fmt.append(fmt)
            out_err.append(f"{type(e).__name__}: {e}")
    batch = batch.set_column(
        batch.schema.get_field_index(payload_col), payload_col,
        pa.array(out_payload, pa.large_binary()),
    )
    return batch.append_column("src_format", pa.array(out_fmt, pa.string())).append_column(
        "error", pa.array(out_err, pa.string())
    )


def pdf_page_count(payload: bytes | None) -> int:
    """Page count, 0 on failure (≙ M5, ocr_common.py:222-230). Real branch
    via PyMuPDF when present; stub derives 1..8 pages from the payload
    digest."""
    if not payload or not payload.startswith(b"%PDF"):
        return 0
    # Stub-converted payloads (b"%PDF-stub" from _convert_to_pdf) are not
    # real PDFs: in a mixed environment (PyMuPDF present, LibreOffice
    # absent) handing them to fitz would yield 0 pages and the docs would
    # silently vanish from extraction (r2 ADVICE) — always take the
    # digest-derived stub path for them.
    fitz = None if payload.startswith(_PDF_STUB_MAGIC) else _pymupdf()
    if fitz is not None:
        try:
            with fitz.open(stream=payload, filetype="pdf") as doc:
                return doc.page_count
        except Exception:
            return 0
    return 1 + hashlib.md5(payload).digest()[0] % 8


def _rasterize_pages(payload: bytes, *, dpi: int = 150) -> list[bytes] | None:
    """PDF → per-page PNG bytes via PyMuPDF (≙ pdf_to_images,
    ocr_common.py:207-219); None when the engine is absent (stub path)."""
    fitz = _pymupdf()
    if fitz is None:
        return None
    with fitz.open(stream=payload, filetype="pdf") as doc:
        return [page.get_pixmap(dpi=dpi).tobytes("png") for page in doc]


def pdf_to_pages_batch(batch: pa.Table, *, payload_col: str = "payload") -> pa.Table:
    """flat_map: 1 doc → N page rows (doc_id, page_no, page_payload) — the
    explode shape of pdf_to_images (≙ M4). Page payloads are stub
    rasterizations (deterministic per (doc, page)); page order is carried in
    ``page_no`` so it survives shuffles."""
    ids = batch.column("doc_id").to_pylist()
    payloads = batch.column(payload_col).to_pylist()
    out_ids, out_pages, out_payloads = [], [], []
    for doc_id, p in zip(ids, payloads):
        try:
            is_real_pdf = p and p.startswith(b"%PDF") and not p.startswith(_PDF_STUB_MAGIC)
            real = _rasterize_pages(p) if is_real_pdf else None
        except Exception:
            real = []  # broken pdf under a real engine → no pages (≙ count=0)
        if real is not None:
            for page, png in enumerate(real):
                out_ids.append(doc_id)
                out_pages.append(page)
                out_payloads.append(png)
            continue
        for page in range(pdf_page_count(p)):
            out_ids.append(doc_id)
            out_pages.append(page)
            out_payloads.append(hashlib.md5(p + page.to_bytes(2, "little")).digest())
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "page_no": pa.array(out_pages, pa.int32()),
            "page_payload": pa.array(out_payloads, pa.large_binary()),
        }
    )


def bound_payload(payload: bytes, *, max_bytes: int, scales: int = 6) -> tuple[bytes, int]:
    """Bounded-payload normalization (≙ M6, ocr_common.py:401-428): iterative
    'downscale' ladder until the payload fits; returns (payload, steps).
    STUB downscale = deterministic re-digest + truncation to simulate
    requantization; the ladder/loop shape is the operator."""
    steps = 0
    current = payload
    while len(current) > max_bytes and steps < scales:
        keep = max(max_bytes, len(current) // 2)
        current = hashlib.md5(current).digest() + current[: keep - 16]
        steps += 1
    return current[:max_bytes] if len(current) > max_bytes else current, steps


def normalize_documents(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Composed format pipeline: normalize → explode to pages."""
    pdf = ds.map_batches(
        normalize_to_pdf_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def _ok(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.is_null(b.column("error")))

    return pdf.map_batches(_ok, batch_size=None, batch_format="pyarrow").map_batches(
        pdf_to_pages_batch, batch_size=None, batch_format="pyarrow"
    )
