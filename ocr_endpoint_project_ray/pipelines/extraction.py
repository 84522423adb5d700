"""The flagship pipeline: interleaved documents → extracted ordered spans.

Ray-Data shape (SURVEY.md §7.0)::

    docs (doc_id, spans)
      .map_batches(explode_spans)            # vectorized flat_map + skew salt
      .map_batches(strip_html_spans)         # stateless, html → main content
      .map_batches(OcrStage, concurrency=…)  # actor pool, media → text
      |> reassemble_spans                    # keyed hash repartition + vectorized assembly
"""

from __future__ import annotations

import ray.data

from ..sources.corpus import synth_spans_batch
from ..sources.tables import read_table
from ..stages.extract import (
    DEFAULT_SHARD_SIZE,
    OcrStage,
    explode_spans,
    reassemble_spans,
    strip_html_spans,
)


def extract_documents(
    docs: ray.data.Dataset,
    *,
    num_partitions: int = 64,
    salted: bool = True,
    shard_size: int = DEFAULT_SHARD_SIZE,
    ocr_concurrency: int | tuple[int, int] = (1, 8),
    ocr_batch_size: int = 1024,
) -> ray.data.Dataset:
    """Run the full extraction over an interleaved-document Dataset.

    Returns a Dataset with the input schema ``(doc_id, spans)`` where html
    spans have been reduced to main-content text and media spans carry OCR
    text — span order restored by explicit offset sort after the shuffle.
    """
    flat = docs.map_batches(
        explode_spans,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"shard_size": shard_size},
    )
    stripped = flat.map_batches(
        strip_html_spans, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    ocred = stripped.map_batches(
        OcrStage,
        batch_size=ocr_batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=ocr_concurrency,
    )
    return reassemble_spans(ocred, num_partitions=num_partitions, salted=salted)


def extraction_pipeline(sf_dir: str, **kwargs) -> ray.data.Dataset:
    """documents.parquet → synthetic interleaved corpus → extraction.

    Column-pruned read: only (doc_id, text) leave storage.
    """
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        synth_spans_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return extract_documents(docs, **kwargs)


def extraction_flat(sf_dir: str, **kwargs) -> ray.data.Dataset:
    """Extraction result exploded back to one row per span — a stable flat
    schema (doc_id, offset, kind, text, media_ref) convenient for checks."""
    out = extraction_pipeline(sf_dir, **kwargs)
    flat = out.map_batches(
        explode_spans, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return flat.drop_columns(["salt"])
