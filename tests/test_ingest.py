"""Ingestion-edge pipelines (pipelines/ingest.py): incremental content
dedup, and job-level delta processing through the run.py CLI + manifest."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ocr_endpoint_project_ray.pipelines.ingest import incremental_dedup


def test_incremental_dedup_drops_seen_content():
    new = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
                "text": ["fresh one", "already seen", "fresh two", "already seen"],
            }
        )
    )
    seen = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": ["already seen", "other prior"],
            }
        )
    )
    out = incremental_dedup(new, seen).take_all()
    assert sorted(r["doc_id"] for r in out) == [10, 12]
    # schema passes through (fp helper column dropped)
    assert sorted(out[0]) == ["doc_id", "text"]


def test_incremental_dedup_empty_seen_keeps_all():
    new = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["x"]})
    )
    seen = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert len(incremental_dedup(new, seen).take_all()) == 1


def test_run_extract_processes_only_delta(tmp_path, capsys):
    """Re-running the extract job over an EXTENDED corpus must process only
    the new shard: the manifest marks shards 0-1 done, the re-submitted job
    skips them and extracts shard 2 alone (r4 verdict item 4 — job-level
    resume is the manifest's contract; Ray task retries only cover blocks)."""
    from ocr_endpoint_project_ray.run import main
    from ocr_endpoint_project_ray.sources.corpus import synth_spans_batch

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, 60)
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    out_dir = tmp_path / "out"
    for shard in range(2):
        spans = synth_spans_batch(docs.slice(shard * 20, 20))
        pq.write_table(spans, corpus_dir / f"shard-{shard:03d}.parquet")

    args = [
        "extract",
        "--input", str(corpus_dir),
        "--output", str(out_dir),
        "--num-partitions", "4",
    ]
    assert main(args) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["partitions"] == 2 and first["skipped"] == 0

    # the corpus grows by one shard; the re-run must do ONLY that shard
    spans = synth_spans_batch(docs.slice(40, 20))
    pq.write_table(spans, corpus_dir / "shard-002.parquet")
    assert main(args) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["partitions"] == 3 and second["skipped"] == 2
    # output contains all three partitions' rows
    assert second["rows_out"] > first["rows_out"]
