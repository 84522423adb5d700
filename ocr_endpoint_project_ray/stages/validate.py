"""Ingestion-time validation filters with skip accounting.

Reference semantics: upload validation rejects bad extensions / empty / >10 MB
payloads with typed errors (``cv_api/main.py:322-348``, F3), and the
benchmark's fixture filter collects a ``(filename, reason)`` skipped list
(``pages/parallel_ocr_test.py:146-176``, F2). Distributed translation: one
vectorized pass TAGS every row with a reject reason (null = accepted) — a
tagged union column instead of a side list, so accept/reject streams are both
datasets and nothing is silently dropped.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

ALLOWED_EXTENSIONS = ("pdf", "png", "jpg", "jpeg", "docx")
MAX_PAYLOAD_BYTES = 10 * 1024 * 1024  # reference's 10 MB cap


def extension_of(filename_col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Lowercased extension (≙ _ext, cv_api/main.py:99-100), vectorized."""
    return pc.utf8_lower(pc.replace_substring_regex(filename_col, r"^.*\.", ""))


def tag_invalid_rows(
    batch: pa.Table,
    *,
    filename_col: str = "filename",
    payload_col: str | None = None,
    allowed: tuple[str, ...] = ALLOWED_EXTENSIONS,
    max_bytes: int = MAX_PAYLOAD_BYTES,
) -> pa.Table:
    """Append ``reject_reason`` (string, null = valid). Reasons mirror the
    reference's typed errors: unsupported_media_type (415), empty_file,
    payload_too_large (413)."""
    n = batch.num_rows
    reason = pa.array([None] * n, pa.string())
    fname = batch.column(filename_col)
    # null filename first — otherwise the extension checks evaluate to null
    # and if_else silently passes the row through as valid
    reason = pc.if_else(pc.is_null(fname), pa.scalar("missing_filename"), reason)
    ext = extension_of(fname)
    bad_ext = pc.fill_null(
        pc.invert(pc.is_in(ext, value_set=pa.array(list(allowed)))), False
    )
    reason = pc.if_else(
        pc.and_(bad_ext, pc.is_null(reason)), pa.scalar("unsupported_media_type"), reason
    )
    if payload_col is not None:
        size = pc.binary_length(batch.column(payload_col))
        # null payload → null size → null conditions, which would poison
        # if_else and WIPE an already-set reason; treat null payload as empty
        empty = pc.fill_null(pc.equal(size, 0), True)
        too_big = pc.fill_null(pc.greater(size, max_bytes), False)
        reason = pc.if_else(pc.and_(empty, pc.is_null(reason)), pa.scalar("empty_file"), reason)
        reason = pc.if_else(
            pc.and_(too_big, pc.is_null(reason)), pa.scalar("payload_too_large"), reason
        )
    return batch.append_column("reject_reason", reason)


def split_valid(
    ds: ray.data.Dataset, **tag_kwargs
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(accepted, rejected) — rejected keeps the reason column (skip
    accounting); materialize the tagged dataset first if consuming both to
    avoid recomputing the upstream twice."""
    tagged = ds.map_batches(
        tag_invalid_rows,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=tag_kwargs,
    )

    def _ok(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b.column("reject_reason"))).drop_columns(["reject_reason"])

    def _rej(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_valid(b.column("reject_reason")))

    return (
        tagged.map_batches(_ok, batch_size=None, batch_format="pyarrow"),
        tagged.map_batches(_rej, batch_size=None, batch_format="pyarrow"),
    )


#: Error-category mapping (≙ categorize_llm_error,
#: generate_decision_report.py:79-89) — vectorized case-when.
def categorize_errors(batch: pa.Table, *, error_col: str = "error") -> pa.Table:
    err = batch.column(error_col)
    cat = pa.array(["none"] * batch.num_rows, pa.string())
    cat = pc.if_else(pc.match_substring(err, "timeout", ignore_case=True), pa.scalar("timeout"), cat)
    cat = pc.if_else(
        pc.match_substring(err, "JSON_INVALID", ignore_case=True), pa.scalar("invalid_json"), cat
    )
    cat = pc.if_else(
        pc.match_substring(err, "SCHEMA_VALIDATION", ignore_case=True),
        pa.scalar("schema_validation"),
        cat,
    )
    other = pc.and_(pc.is_valid(err), pc.equal(cat, "none"))
    cat = pc.if_else(other, pa.scalar("other_error"), cat)
    cat = pc.if_else(pc.is_null(err), pa.scalar("none"), cat)
    return batch.append_column("error_category", cat)
