"""Robust JSON extraction + schema projection/validation operators.

Semantics per the reference (cited); used by the structured-parse stage to
turn model text output into validated records, with errors kept in-band.
"""

from __future__ import annotations

import json
import re
from typing import Any

try:
    import jsonschema

    _HAVE_JSONSCHEMA = True
except ImportError:  # pragma: no cover
    _HAVE_JSONSCHEMA = False

_FENCE_RE = re.compile(r"```(?:json)?\s*(.*?)```", re.DOTALL)


def parse_json_from_response(text: str) -> Any | None:
    """Robust JSON extraction (reference: cv_api/resume_schema.py:134-184):
    direct parse → fenced ```json block → balanced-brace scan from first '{'.
    Returns None when nothing parses."""
    if not text:
        return None
    try:
        return json.loads(text)
    except (json.JSONDecodeError, ValueError):
        pass
    m = _FENCE_RE.search(text)
    if m:
        try:
            return json.loads(m.group(1).strip())
        except (json.JSONDecodeError, ValueError):
            pass
    start = text.find("{")
    if start == -1:
        return None
    depth = 0
    in_str = False
    esc = False
    for i in range(start, len(text)):
        c = text[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            continue
        if c == '"':
            in_str = True
        elif c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                try:
                    return json.loads(text[start : i + 1])
                except (json.JSONDecodeError, ValueError):
                    return None
    return None


def strip_extra_keys_to_schema(obj: Any, schema: dict) -> Any:
    """Recursive projection onto schema keys
    (reference: cv_api/resume_schema.py:187-198). Arrow analogue: a cast to a
    declared ``pa.struct`` drops unknown fields for free."""
    if schema.get("type") == "object" or "properties" in schema:
        if not isinstance(obj, dict):
            return obj
        props = schema.get("properties", {})
        return {k: strip_extra_keys_to_schema(v, props[k]) for k, v in obj.items() if k in props}
    stype = schema.get("type")
    if stype == "array" or "items" in schema:
        if not isinstance(obj, list):
            return obj
        item_schema = schema.get("items", {})
        return [strip_extra_keys_to_schema(v, item_schema) for v in obj]
    return obj


def validate_against_schema(obj: Any, schema: dict) -> tuple[bool, str | None, Any]:
    """(ok, error, cleaned) — projection then jsonschema validation
    (reference: cv_api/resume_schema.py:201-213). Errors are returned as
    data, never raised (in-band error semantics)."""
    cleaned = strip_extra_keys_to_schema(obj, schema)
    if not _HAVE_JSONSCHEMA:  # pragma: no cover
        return True, None, cleaned
    try:
        jsonschema.validate(cleaned, schema)
        return True, None, cleaned
    except jsonschema.ValidationError as e:
        return False, str(e.message)[:500], cleaned
