"""Deterministic interleaved-document corpus synthesis.

Builds the canonical input table ``(doc_id: string, spans: list<struct<kind,
text, media_ref, offset:int32>>)`` (``BASELINE.json.input_hint`` /
FIXTURES.md §1) from the driver-generated ``documents`` parquet — a pure
function of ``(doc_id, text)``, no randomness, so input AND golden expected
output can be regenerated anywhere at any scale.

Synthesis rule per document: split the text into ~``SEG_WORDS``-word
segments; segment ``i`` becomes
  - ``i % 3 == 0`` → a plain ``text`` span,
  - ``i % 3 == 1`` → an ``html`` span: the segment wrapped in boilerplate
    markup (nav / link-farm / footer) to exercise the boilerplate-strip
    heuristics (the analogue of the reference corpus's noisy layouts),
  - ``i % 3 == 2`` → an ``image_ref`` media span (text="",
    media_ref="media://{doc_id}/{i}") standing in for scanned pages
    (``metadata.csv`` ``is_scanned`` / ``has_icons`` rows).
The cycle phase is shifted by doc_id so kinds vary across docs. A small tail
of mega-documents (text tiled many times) exercises skew salting.

The *expected* extraction output applies the specified semantics by
construction: text passes through, html reduces to its main content
(:func:`strip_boilerplate`), media spans gain deterministic stub-OCR text
(:func:`fake_ocr`). Offsets are dense 0..n-1 in document order.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.html import strip_boilerplate
from ..schema import DOC_SCHEMA, SPAN_STRUCT

SEG_WORDS = 12

#: Every MEGA_EVERY-th document is tiled MEGA_FACTOR× to create skewed
#: mega-documents (FIXTURES.md §1: "small tail of mega-documents").
MEGA_EVERY = 97
MEGA_FACTOR = 20

_HTML_TEMPLATE = (
    "<html><head><title>Page</title></head><body>"
    '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/jobs">Jobs</a></nav>'
    '<div class="main"><p>{seg}</p></div>'
    '<ul class="related"><li><a href="/x">Sponsored link one</a></li>'
    '<li><a href="/y">Sponsored link two</a></li></ul>'
    "<footer><a href=\"/contact\">Contact</a> © 2026 Example Corp</footer>"
    "</body></html>"
)


def fake_ocr(media_ref: str) -> str:
    """Deterministic stub OCR output for a media ref.

    Real OCR engines (Tesseract) are not in this container; the OCR actor
    stage (stages/extract.py) computes exactly this, so goldens and pipeline
    agree while the Ray-side plumbing stays real.
    """
    digest = hashlib.md5(media_ref.encode("utf-8")).hexdigest()[:12]
    return f"[ocr {digest}]"


def doc_id_str(doc_id: int) -> str:
    return f"doc{int(doc_id):010d}"


def _segments(text: str, doc_id: int) -> list[str]:
    words = (text or "").split()
    if not words:
        return []
    segs = [" ".join(words[i : i + SEG_WORDS]) for i in range(0, len(words), SEG_WORDS)]
    if int(doc_id) % MEGA_EVERY == 0:
        segs = segs * MEGA_FACTOR
    return segs


def _spans_for_doc(doc_id: int, text: str) -> list[dict]:
    spans = []
    phase = int(doc_id) % 3
    for i, seg in enumerate(_segments(text, doc_id)):
        kind_sel = (i + phase) % 3
        if kind_sel == 0:
            spans.append({"kind": "text", "text": seg, "media_ref": "", "offset": i})
        elif kind_sel == 1:
            spans.append(
                {
                    "kind": "html",
                    "text": _HTML_TEMPLATE.format(seg=seg),
                    "media_ref": "",
                    "offset": i,
                }
            )
        else:
            ref = f"media://{doc_id_str(doc_id)}/{i}"
            spans.append({"kind": "image_ref", "text": "", "media_ref": ref, "offset": i})
    return spans


def _expected_for_doc(doc_id: int, text: str) -> list[dict]:
    out = []
    for span in _spans_for_doc(doc_id, text):
        if span["kind"] == "html":
            out.append(
                {
                    "kind": "text",
                    "text": strip_boilerplate(span["text"]),
                    "media_ref": "",
                    "offset": span["offset"],
                }
            )
        elif span["kind"] == "image_ref":
            out.append(
                {
                    "kind": "image_ref",
                    "text": fake_ocr(span["media_ref"]),
                    "media_ref": span["media_ref"],
                    "offset": span["offset"],
                }
            )
        else:
            out.append(dict(span))
    return out


def synth_spans_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn: documents rows ``(doc_id:int64, text)`` →
    interleaved-doc rows ``(doc_id:string, spans:list<struct>)``."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    doc_ids = [doc_id_str(i) for i in ids]
    spans = [_spans_for_doc(i, t) for i, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
        },
        schema=DOC_SCHEMA,
    )


def expected_spans_batch(batch: pa.Table) -> pa.Table:
    """Golden expected extraction output for the same documents rows."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    doc_ids = [doc_id_str(i) for i in ids]
    spans = [_expected_for_doc(i, t) for i, t in zip(ids, texts)]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "spans": pa.array(spans, pa.list_(SPAN_STRUCT)),
        },
        schema=DOC_SCHEMA,
    )
