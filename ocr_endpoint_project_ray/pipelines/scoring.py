"""Extraction-quality scoring — the distributed twin of the reference's OCR
benchmark loop (``pages/parallel_ocr_test.py:187-198``: per doc, score
prediction vs golden with CER/WER/layout/word-recall, append a result row,
then aggregate per model).

Two "stages" are scored against the golden text, playing the role of the
reference's competing models: ``extracted`` (the full pipeline output) and
``raw`` (no boilerplate strip, no OCR — the naive baseline). The result table
has the reference's run-log shape (§1.5) and feeds the same aggregations.

The golden join is a distributed hash join (``Dataset.join``) on doc_id —
both sides are real datasets here, exercising the large×large join path.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import default_num_partitions
from ..functions.agg import Agg, grouped_agg
from ..functions.metrics import word_metrics
from ..sources.corpus import expected_spans_batch, synth_spans_batch
from ..sources.tables import read_table
from .extraction import extract_documents


def _join_spans_text(spans_col: pa.ChunkedArray | pa.Array) -> list[str]:
    texts = []
    for spans in spans_col.to_pylist():
        texts.append("\n\n".join(s["text"] for s in spans if s["text"]))
    return texts


def _goldens_batch(batch: pa.Table) -> pa.Table:
    """documents rows → (doc_id, golden_text, raw_text)."""
    expected = expected_spans_batch(batch)
    raw = synth_spans_batch(batch)
    return pa.table(
        {
            "doc_id": expected.column("doc_id"),
            "golden_text": pa.array(_join_spans_text(expected.column("spans")), pa.string()),
            "raw_text": pa.array(_join_spans_text(raw.column("spans")), pa.string()),
        }
    )


def _extracted_text_batch(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "extracted_text": pa.array(_join_spans_text(batch.column("spans")), pa.string()),
        }
    )


def _score_batch(batch: pa.Table) -> pa.Table:
    """Two result rows per doc (stage ∈ {extracted, raw}), reference run-log
    shape (cer/wer/layout/accuracy + in-band error)."""
    out = {k: [] for k in ("doc_id", "stage", "cer_pct", "wer_pct",
                           "layout_accuracy_pct", "accuracy_pct", "error")}
    for doc_id, gold, extracted, raw in zip(
        batch.column("doc_id").to_pylist(),
        batch.column("golden_text").to_pylist(),
        batch.column("extracted_text").to_pylist(),
        batch.column("raw_text").to_pylist(),
    ):
        for stage, pred in (("extracted", extracted), ("raw", raw)):
            try:
                m = word_metrics(gold or "", pred or "")
                out["doc_id"].append(doc_id)
                out["stage"].append(stage)
                out["cer_pct"].append(m["cer_pct"])
                out["wer_pct"].append(m["wer_pct"])
                out["layout_accuracy_pct"].append(m["layout_accuracy_pct"])
                out["accuracy_pct"].append(m["accuracy_pct"])
                out["error"].append(None)
            except Exception as e:  # in-band, never fatal
                out["doc_id"].append(doc_id)
                out["stage"].append(stage)
                for k in ("cer_pct", "wer_pct", "layout_accuracy_pct", "accuracy_pct"):
                    out[k].append(None)
                out["error"].append(f"{type(e).__name__}: {e}")
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.string()),
            "stage": pa.array(out["stage"], pa.string()),
            "cer_pct": pa.array(out["cer_pct"], pa.float64()),
            "wer_pct": pa.array(out["wer_pct"], pa.float64()),
            "layout_accuracy_pct": pa.array(out["layout_accuracy_pct"], pa.float64()),
            "accuracy_pct": pa.array(out["accuracy_pct"], pa.float64()),
            "error": pa.array(out["error"], pa.string()),
        }
    )


def extraction_scores(sf_dir: str, *, num_partitions: int | None = None) -> ray.data.Dataset:
    """Full scoring pipeline: extract → join goldens (hash join) → score."""
    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)
    docs_raw = read_table(sf_dir, "documents", columns=["doc_id", "text"]).repartition(n)
    spans = docs_raw.map_batches(
        synth_spans_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    extracted = extract_documents(spans, num_partitions=n, salted=False).map_batches(
        _extracted_text_batch, batch_size=None, batch_format="pyarrow"
    )
    goldens = docs_raw.map_batches(
        _goldens_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = extracted.join(
        goldens, join_type="inner", num_partitions=n, on=("doc_id",)
    )
    return joined.map_batches(_score_batch, batch_size=None, batch_format="pyarrow")


def x_extraction_scores(sf_dir: str) -> ray.data.Dataset:
    return extraction_scores(sf_dir)


def x_score_summary(sf_dir: str) -> ray.data.Dataset:
    """Per-stage metric means over error-free rows (≙ A1 + F1). The
    'extracted' stage must score ~0 CER (it matches goldens by construction);
    'raw' is the naive baseline with boilerplate noise."""
    return score_summary(extraction_scores(sf_dir))


def score_summary(scores: ray.data.Dataset) -> ray.data.Dataset:
    """The aggregation half of ``x_score_summary``, decoupled so a consumer
    that already materialized ``extraction_scores`` output (e.g. bench.py's
    shared snapshot — each query is standalone by contract, so run twice the
    extraction would otherwise be) can feed it directly."""

    def _ok(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_null(b.column("error")))

    ok = scores.map_batches(_ok, batch_size=None, batch_format="pyarrow")
    return grouped_agg(
        ok,
        ["stage"],
        [
            Agg("n_docs", "cer_pct", "count_rows"),
            Agg("avg_cer", "cer_pct", "mean"),
            Agg("avg_wer", "wer_pct", "mean"),
            Agg("avg_layout", "layout_accuracy_pct", "mean"),
            Agg("avg_word_acc", "accuracy_pct", "mean"),
        ],
        small_groups=True,
    )
