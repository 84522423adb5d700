"""decontaminate_hashed (q63): path parity (broadcast vs distributed),
semantic parity with q54's substring scan on token-boundary phrase sets,
canonicalization, and edge cases."""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from ocr_endpoint_project_ray.pipelines.textops import (
    Q63_ORACLE,
    _bench_phrases,
    decontaminate_hashed,
    q54_decontaminate,
    q63_decontaminate_hashed,
)
from ocr_endpoint_project_ray.sources.tables import read_table

SF = "/root/testdata/sf0.001"


def _as_map(ds) -> dict[int, int]:
    return {r["doc_id"]: r["n_hits"] for r in ds.take_all()}


@pytest.fixture(scope="module")
def docs():
    return read_table(SF, "documents", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def mixed_phrases(docs):
    """Bench 5-grams plus 3-grams and a 1-gram pulled from real docs, plus
    misses — a multi-length set exercising the per-length dispatch."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    words = (t.column("text").to_pylist()[3] or "").split()
    return _bench_phrases(docs) + [
        " ".join(words[0:3]),
        " ".join(words[5:8]),
        words[2],
        "zz-never-a-token-qq",
        "three tokens missing-entirely",
    ]


def test_broadcast_vs_distributed_parity(docs, mixed_phrases):
    broad = _as_map(decontaminate_hashed(docs, mixed_phrases))
    dist = _as_map(
        decontaminate_hashed(docs, mixed_phrases, max_broadcast_phrases=0, num_partitions=4)
    )
    assert broad == dist
    assert len(broad) > 0


def test_matches_substring_scan_on_bench_set(docs):
    """On whole-token n-gram phrases whose occurrences fall on token
    boundaries (the q54 benchmark set by construction), the hashed path and
    the substring scan are the same operator."""
    sub = {r["doc_id"]: r["n_hits"] for r in q54_decontaminate(SF).take_all()}
    hashed = _as_map(q63_decontaminate_hashed(SF))
    assert sub == hashed
    assert len(hashed) > 0


def test_q63_oracle_parity_with_nulls(tmp_path):
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).slice(0, 400)
    texts = src.column("text").to_pylist()
    texts[5] = None
    texts[11] = "tiny"
    pq.write_table(
        pa.table({"doc_id": src.column("doc_id"), "text": pa.array(texts, pa.string())}),
        str(tmp_path / "documents.parquet"),
    )
    got = sorted(q63_decontaminate_hashed(str(tmp_path)).take_all(), key=lambda r: r["doc_id"])
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = sorted(
        con.execute(Q63_ORACLE).fetch_arrow_table().to_pylist(), key=lambda r: r["doc_id"]
    )
    assert got == exp
    assert len(got) > 0


def test_phrase_canonicalization_and_dataset_input():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["alpha beta gamma delta", "beta gamma", "alpha  beta\tgamma"],
                    pa.string(),
                ),
            }
        )
    )
    # irregular whitespace in the phrase canonicalizes to the token sequence
    phrases = ray.data.from_arrow(
        pa.table({"phrase": pa.array(["  alpha   beta\n gamma ", "beta gamma"], pa.string())})
    )
    got = _as_map(decontaminate_hashed(docs, phrases))
    # doc1: both phrases present; doc2: only "beta gamma"; doc3: both
    assert got == {1: 2, 2: 1, 3: 2}


def test_int32_id_corpus_same_schema_on_both_paths():
    """ADVICE r4: the broadcast branch used to pass the input id type
    through (int32 stayed int32) while the distributed branch's sentinel
    protocol always emits int64 — both paths must return the identical
    schema for any accepted id type."""
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int32()),
                "text": pa.array(["alpha beta", "gamma"], pa.string()),
            }
        )
    )
    broad = decontaminate_hashed(docs, ["alpha beta"])
    dist = decontaminate_hashed(
        docs, ["alpha beta"], max_broadcast_phrases=0, num_partitions=4
    )
    assert broad.schema().base_schema.field("doc_id").type == pa.int64()
    assert dist.schema().base_schema.field("doc_id").type == pa.int64()
    assert _as_map(broad) == _as_map(dist) == {1: 1}
    # degenerate branches keep the same contract
    empty = decontaminate_hashed(docs, [])
    assert empty.schema().base_schema.field("doc_id").type == pa.int64()


def test_empty_phrases_and_short_docs():
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["one two", None], pa.string()),
            }
        )
    )
    assert _as_map(decontaminate_hashed(docs, [])) == {}
    assert _as_map(decontaminate_hashed(docs, ["", "   "])) == {}
    # phrase longer than every doc: no hits, no crash
    assert _as_map(decontaminate_hashed(docs, ["one two three four"])) == {}
