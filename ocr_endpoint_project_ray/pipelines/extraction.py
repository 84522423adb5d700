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
    ocr_media_spans,
    reassemble_spans,
    strip_html_spans,
)


def extract_documents(
    docs: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
    salted: bool = True,
    shard_size: int = DEFAULT_SHARD_SIZE,
    ocr_concurrency: int | tuple[int, int] | None = None,
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
    if ocr_concurrency is None:
        # task-based OCR with a warm per-worker-process engine: stateless
        # task pools scale with blocks and fuse with the upstream maps into
        # one pass. An actor pool here would become the fused chain's
        # concurrency ceiling (operator fusion folds the whole map chain
        # into the actor-pool operator).
        ocred = stripped.map_batches(
            ocr_media_spans, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    else:
        # explicit actor pool for heavyweight engines (multi-GB model load)
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

    Column-pruned read: only (doc_id, text) leave storage. The local corpus
    is a single small parquet file → one read block → downstream map
    parallelism of 1; split it across the cluster first (a real 100 TB corpus
    arrives as thousands of fragments and doesn't need this).
    """
    from ..context import default_num_partitions

    docs = (
        read_table(sf_dir, "documents", columns=["doc_id", "text"])
        .repartition(default_num_partitions(per_cpu=1))
        .map_batches(synth_spans_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)
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
