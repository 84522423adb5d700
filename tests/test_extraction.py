"""Span-sequence correctness gate (BASELINE.json.input_hint): exact
(kind, text, media_ref, order) equality per doc_id against golden expected
spans — through the full distributed path (explode → stages → shuffle →
reassembly), salted and unsalted."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_endpoint_project_ray.pipelines.extraction import extract_documents
from ocr_endpoint_project_ray.sources.corpus import (
    expected_spans_batch,
    synth_spans_batch,
)

import ray.data


def _golden_map(table: pa.Table) -> dict[str, list[tuple]]:
    out = {}
    for row in table.to_pylist():
        out[row["doc_id"]] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
        ]
    return out


@pytest.fixture(scope="module")
def documents_table(sf_dir) -> pa.Table:
    return pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


@pytest.mark.parametrize("salted", [False, True])
def test_span_sequence_equality(documents_table, salted):
    docs = ray.data.from_arrow(documents_table).map_batches(
        synth_spans_batch, batch_format="pyarrow", batch_size=64
    )
    result = extract_documents(
        docs, num_partitions=8, salted=salted, shard_size=64, ocr_concurrency=2
    )
    got = _golden_map(pa.Table.from_pylist(result.take_all()))
    want = _golden_map(expected_spans_batch(documents_table))
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == want[doc_id], f"span mismatch for {doc_id}"


def test_mega_doc_present(documents_table):
    """The synthetic corpus must include skewed mega-documents."""
    spans = synth_spans_batch(documents_table)
    lengths = [len(r) for r in spans.column("spans").to_pylist()]
    assert max(lengths) > 10 * (sorted(lengths)[len(lengths) // 2] or 1)


def test_offsets_strictly_ordered(documents_table):
    docs = ray.data.from_arrow(documents_table).map_batches(
        synth_spans_batch, batch_format="pyarrow", batch_size=64
    )
    result = extract_documents(docs, num_partitions=4, salted=True, shard_size=32)
    for row in result.take_all():
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == sorted(offsets)
        assert len(set(offsets)) == len(offsets)
