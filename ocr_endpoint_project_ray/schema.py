"""Arrow schemas for the engine.

The canonical input is an *interleaved document* table (per
``BASELINE.json.input_hint``)::

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

``kind`` distinguishes text content from media references; ``offset`` carries
document order explicitly so it survives shuffles (Ray Data does not guarantee
row order after an all-to-all; the reference guarantees order only by
sequential iteration — ``ocr_common.py:441-460``).

The structured-record schema mirrors the reference's only *declared* schema,
``RESUME_EXTRACTION_SCHEMA`` (``cv_api/resume_schema.py:11-131``).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Interleaved document spans
# ---------------------------------------------------------------------------

#: Span kinds. "text" is plain content; "html" is markup needing a
#: boilerplate strip; "image_ref"/"pdf_ref" are media needing OCR / layout
#: parse; "heading"/"list_item" are allowed text subtypes.
SPAN_KINDS = ("text", "html", "image_ref", "pdf_ref", "heading", "list_item")

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

#: Canonical interleaved-document table schema.
DOC_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_STRUCT)),
    ]
)

#: Exploded (one row per span) schema used between explode and reassembly.
FLAT_SPAN_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("salt", pa.int32()),
        pa.field("offset", pa.int32()),
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Structured resume record (reference: cv_api/resume_schema.py:11-131)
# ---------------------------------------------------------------------------

_EXPERIENCE = pa.struct(
    [
        ("position_title", pa.string()),
        ("institution_name", pa.string()),
        ("linkedin_url", pa.string()),
        ("from_date", pa.string()),
        ("to_date", pa.string()),
        ("duration", pa.string()),
        ("location", pa.string()),
        ("description", pa.string()),
    ]
)

_EDUCATION = pa.struct(
    [
        ("degree", pa.string()),
        ("institution_name", pa.string()),
        ("linkedin_url", pa.string()),
        ("from_date", pa.string()),
        ("to_date", pa.string()),
        ("duration", pa.string()),
        ("location", pa.string()),
        ("description", pa.string()),
    ]
)

_SKILL = pa.struct([("category", pa.string()), ("items", pa.list_(pa.string()))])

_PROJECT = pa.struct(
    [
        ("project_name", pa.string()),
        ("role", pa.string()),
        ("from_date", pa.string()),
        ("to_date", pa.string()),
        ("duration", pa.string()),
        ("technologies", pa.list_(pa.string())),
        ("description", pa.string()),
        ("url", pa.string()),
    ]
)

RESUME_STRUCT = pa.struct(
    [
        ("linkedin_url", pa.string()),
        ("name", pa.string()),
        ("location", pa.string()),
        ("about", pa.string()),
        ("open_to_work", pa.bool_()),
        ("experiences", pa.list_(_EXPERIENCE)),
        ("educations", pa.list_(_EDUCATION)),
        ("skills", pa.list_(_SKILL)),
        ("projects", pa.list_(_PROJECT)),
        ("interests", pa.list_(pa.string())),
        ("accomplishments", pa.list_(pa.string())),
        ("contacts", pa.list_(pa.string())),
    ]
)

#: JSON-Schema twin of RESUME_STRUCT, used by the validation operator
#: (reference semantics: cv_api/resume_schema.py:201-213).
RESUME_JSON_SCHEMA: dict = {
    "type": "object",
    "additionalProperties": False,
    "properties": {
        "linkedin_url": {"type": ["string", "null"]},
        "name": {"type": ["string", "null"]},
        "location": {"type": ["string", "null"]},
        "about": {"type": ["string", "null"]},
        "open_to_work": {"type": ["boolean", "null"]},
        "experiences": {
            "type": "array",
            "items": {
                "type": "object",
                "additionalProperties": False,
                "properties": {
                    k: {"type": ["string", "null"]}
                    for k in (
                        "position_title",
                        "institution_name",
                        "linkedin_url",
                        "from_date",
                        "to_date",
                        "duration",
                        "location",
                        "description",
                    )
                },
            },
        },
        "educations": {
            "type": "array",
            "items": {
                "type": "object",
                "additionalProperties": False,
                "properties": {
                    k: {"type": ["string", "null"]}
                    for k in (
                        "degree",
                        "institution_name",
                        "linkedin_url",
                        "from_date",
                        "to_date",
                        "duration",
                        "location",
                        "description",
                    )
                },
            },
        },
        "skills": {
            "type": "array",
            "items": {
                "type": "object",
                "additionalProperties": False,
                "properties": {
                    "category": {"type": ["string", "null"]},
                    "items": {"type": "array", "items": {"type": "string"}},
                },
            },
        },
        "projects": {
            "type": "array",
            "items": {
                "type": "object",
                "additionalProperties": False,
                "properties": {
                    "project_name": {"type": ["string", "null"]},
                    "role": {"type": ["string", "null"]},
                    "from_date": {"type": ["string", "null"]},
                    "to_date": {"type": ["string", "null"]},
                    "duration": {"type": ["string", "null"]},
                    "technologies": {"type": "array", "items": {"type": "string"}},
                    "description": {"type": ["string", "null"]},
                    "url": {"type": ["string", "null"]},
                },
            },
        },
        "interests": {"type": "array", "items": {"type": "string"}},
        "accomplishments": {"type": "array", "items": {"type": "string"}},
        "contacts": {"type": "array", "items": {"type": "string"}},
    },
}
