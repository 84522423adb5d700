"""Training-sequence construction operators: token-window chunking,
order-preserving sequence packing, and intra-document repetition signals.

These are the corpus→training-batch steps of an LLM data pipeline (the
reference stops at extraction/scoring — SURVEY §2.8 training-data
extensions): ``chunk_tokens`` explodes documents into overlapping
fixed-token windows, ``pack_sequences`` assigns documents to fixed-token-
budget training sequences in a global order WITHOUT any shuffle (a
distributed exclusive prefix sum: two streaming passes + O(num_blocks)
driver state), ``top_bigram_stats`` emits the Gopher-style most-frequent-
2-gram repetition signal, and ``redact_pattern`` is the vectorized scrub
transform (PII-shaped: the pattern is the parameter, RE2 on both the
engine and the DuckDB oracle so parity is exact).

All token arithmetic uses the repo-wide token definition
(functions/text.py::TOKEN_RE, RE2 ``\\S+``) — see CLAUDE.md's one-token-
definition rule.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.text import TOKEN_RE, count_tokens_ws

__all__ = [
    "chunk_tokens",
    "pack_sequences",
    "top_bigram_stats",
    "redact_pattern",
]

_TOKEN_RE_C = re.compile(TOKEN_RE)


def chunk_tokens(
    ds: ray.data.Dataset,
    *,
    window: int = 16,
    stride: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """1→N explode of documents into overlapping token windows.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + window)``; the last
    window may be short; a document with no tokens emits no chunks. Output:
    ``(id_col, chunk_no, chunk_text, n_tokens)``.

    Scale shape: pure streaming map — no shuffle, no state; output rows ≈
    input tokens × (window/stride) / window. Tokenization is the per-string
    hot loop (inherently per-row), run once per batch over the raw column.
    """
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def _chunks(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        out_id, out_no, out_text, out_n = [], [], [], []
        for i, t in zip(ids, texts):
            ws = _TOKEN_RE_C.findall(t or "")
            n = len(ws)
            for c, start in enumerate(range(0, n, stride)):
                seg = ws[start : start + window]
                out_id.append(i)
                out_no.append(c)
                out_text.append(" ".join(seg))
                out_n.append(len(seg))
        return pa.table(
            {
                id_col: pa.array(out_id, b.schema.field(id_col).type),
                "chunk_no": pa.array(out_no, pa.int64()),
                "chunk_text": pa.array(out_text, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
            }
        )

    return ds.map_batches(
        _chunks, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def pack_sequences(
    ds: ray.data.Dataset,
    *,
    target_tokens: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Assign each document to a fixed-token-budget training sequence:
    ``seq_id = floor(exclusive_prefix_sum(n_tokens) / target_tokens)`` in
    ``id_col`` order — the deterministic contiguous-fill packing rule
    (SQL twin: ``SUM(n) OVER (ORDER BY doc_id ROWS … 1 PRECEDING)``).

    Distributed shape — a two-pass exclusive prefix sum, NO shuffle on the
    happy path:

    1. Project to ``(id, n_tokens)`` and materialize (the re-scan pattern of
       functions/quantiles.py). One pass collects per-block
       ``(min_id, max_id, sum_tokens)`` — O(num_blocks) driver state.
    2. If block id-ranges already partition the order key (true for a
       parquet read of an id-sorted table — the testdata shape, and the
       natural layout of any ingest that writes ordered shards), the driver
       computes each block's exclusive prefix offset; otherwise the dataset
       is range-shuffled once with ``sort(id_col)`` and the partials are
       recomputed. A second streaming pass adds the block offset to the
       within-block exclusive cumsum.

    Batch↔block identity across the two passes holds because both run
    ``map_batches(batch_size=None)`` over the SAME materialized blocks;
    each pass-2 batch finds its offset by its min id. Driver state is
    O(num_blocks) integers regardless of data size.

    Output: ``(id_col, n_tokens, seq_id)``; null text counts 0 tokens.

    Deliberate exemption from the errors-are-data rule (CLAUDE.md): a
    duplicate order key straddling block boundaries is a CONTRACT violation
    of the whole operator (packing order — and the SQL twin's ORDER BY —
    is ill-defined), not a bad row; an in-band error column would let a
    silently mis-packed result flow downstream, so the stage raises.
    """
    proj = ds.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column(id_col),
                "n_tokens": pc.fill_null(
                    pc.cast(count_tokens_ws(b.column(text_col)), pa.int64()), 0
                ),
            }
        ),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    def _partials(p: ray.data.Dataset) -> list[dict]:
        def _one(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return pa.table(
                    {
                        "__min": pa.array([], pa.int64()),
                        "__max": pa.array([], pa.int64()),
                        "__sum": pa.array([], pa.int64()),
                    }
                )
            ids = b.column(id_col)
            return pa.table(
                {
                    "__min": pa.array([pc.min(ids).as_py()], pa.int64()),
                    "__max": pa.array([pc.max(ids).as_py()], pa.int64()),
                    "__sum": pa.array(
                        [pc.sum(b.column("n_tokens")).as_py() or 0], pa.int64()
                    ),
                }
            )

        return p.map_batches(
            _one, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        ).take_all()

    blocks = sorted(_partials(proj), key=lambda r: r["__min"])
    overlapping = any(
        a["__max"] >= b["__min"] for a, b in zip(blocks, blocks[1:])
    )
    if overlapping:
        # Blocks interleave the order key: range-shuffle once, then the
        # prefix-sum passes run on the sorted blocks.
        proj = proj.sort(id_col).materialize()
        blocks = sorted(_partials(proj), key=lambda r: r["__min"])
        if any(a["__max"] >= b["__min"] for a, b in zip(blocks, blocks[1:])):
            # Equal order-key values straddle a block boundary even after
            # the range sort. Packing order among duplicate keys is
            # ill-defined (the SQL twin's ORDER BY is equally ambiguous),
            # and the min-id offset lookup below would collide — refuse
            # loudly instead of packing wrong.
            raise ValueError(
                f"pack_sequences requires {id_col} values unique across "
                "block boundaries; duplicates straddle blocks even after "
                "range sorting"
            )

    offsets: dict[int, int] = {}
    acc = 0
    for blk in blocks:
        offsets[blk["__min"]] = acc
        acc += blk["__sum"]

    def _assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            # build the empty block from the INCOMING schema (a hardcoded
            # int64 would emit a schema-mismatched block for int32/string
            # order keys and fail at union time — r3 ADVICE)
            return pa.table(
                {
                    id_col: pa.array([], b.schema.field(id_col).type),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                }
            )
        order = pc.sort_indices(b.column(id_col))
        tbl = b.take(order)
        n = np.asarray(tbl.column("n_tokens"), dtype=np.int64)
        prefix = np.concatenate(([0], np.cumsum(n)[:-1]))
        base = offsets[pc.min(tbl.column(id_col)).as_py()]
        return pa.table(
            {
                id_col: tbl.column(id_col),
                "n_tokens": tbl.column("n_tokens"),
                "seq_id": pa.array((base + prefix) // target_tokens, pa.int64()),
            }
        )

    return proj.map_batches(
        _assign, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def top_bigram_stats(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document repetition signal (the Gopher rule family): count of the
    most frequent word 2-gram and its share of all 2-grams.

    Output ``(id_col, top_bigram_count, top_bigram_frac)``; a document with
    fewer than two tokens has count 0 and a NULL fraction (0/0 — the SQL
    twin's NULL division). ``top_bigram_frac = max_count / (n_tokens - 1)``
    is one int/int double division on both sides, so oracle parity is exact
    with no rounding discipline. Pure streaming map, no shuffle.
    """

    def _stats(b: pa.Table) -> pa.Table:
        from collections import Counter

        ids = b.column(id_col).to_pylist()
        texts = b.column(text_col).to_pylist()
        counts, fracs = [], []
        for t in texts:
            ws = _TOKEN_RE_C.findall(t or "")
            if len(ws) < 2:
                counts.append(0)
                fracs.append(None)
                continue
            c = Counter(zip(ws, ws[1:]))
            top = max(c.values())
            counts.append(top)
            fracs.append(top / (len(ws) - 1))
        return pa.table(
            {
                id_col: pa.array(ids, b.schema.field(id_col).type),
                "top_bigram_count": pa.array(counts, pa.int64()),
                "top_bigram_frac": pa.array(fracs, pa.float64()),
            }
        )

    return ds.map_batches(
        _stats, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def redact_pattern(
    ds: ray.data.Dataset,
    *,
    pattern: str,
    replacement: str = "[REDACTED]",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Vectorized scrub transform: replace every match of an RE2 ``pattern``
    and report the per-document match count.

    This is the PII-redaction shape (emails, phone numbers, ID digit runs —
    the pattern is the parameter); both the engine
    (``pc.replace_substring_regex``) and DuckDB (``regexp_replace … 'g'``)
    compile the pattern with RE2, so the oracle check is exact for any
    pattern, not just the test one. Null text stays null (both engines
    propagate). Output ``(id_col, redacted, n_masked)``; pure streaming
    map, no shuffle, no per-row Python.
    """

    def _redact(b: pa.Table) -> pa.Table:
        col = b.column(text_col)
        return pa.table(
            {
                id_col: b.column(id_col),
                "redacted": pc.replace_substring_regex(
                    col, pattern=pattern, replacement=replacement
                ),
                "n_masked": pc.cast(
                    pc.count_substring_regex(col, pattern), pa.int64()
                ),
            }
        )

    return ds.map_batches(
        _redact, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
