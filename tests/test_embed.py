"""Embedding-generation stage (stages/embed.py) — stub-encoder semantics,
actor-pool plumbing, and the float-clearance certificates q68's hash-exact
oracle parity rests on."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ocr_endpoint_project_ray.stages.embed import (
    EmbedStage,
    embed_documents,
    encode_table,
)


def _naive_embed(text: str, dim: int = 16) -> np.ndarray:
    out = np.zeros(dim, dtype=np.float64)
    for w in (text or "").split():
        j = int(hashlib.md5(w.encode()).hexdigest()[:16], 16) % dim
        out[j] += 1.0
    return out


def test_stub_encoder_matches_naive_reference():
    texts = ["the quick brown fox", "the the the", "", "a b c d e f g", "éàü 日本語 x"]
    tbl = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    enc = encode_table(tbl)
    assert enc.column_names == ["vec_id", "embedding"]
    assert enc.schema.field("embedding").type == pa.list_(pa.float32())
    got = np.asarray(enc.column("embedding").to_pylist(), dtype=np.float64)
    want = np.stack([_naive_embed(t) for t in texts])
    np.testing.assert_array_equal(got, want)
    # counts are exact integers (float32-representable), total = token count
    assert got.sum(axis=1).tolist() == [4.0, 3.0, 0.0, 7.0, 3.0]


def test_embed_stage_passthrough_and_id_cast():
    tbl = pa.table(
        {
            "doc_id": pa.array([7, 8], pa.int32()),
            "text": ["x y", "z"],
            "lang": ["en", "fr"],
        }
    )
    out = EmbedStage(8, keep_cols=("lang",))(tbl)
    assert out.schema.field("vec_id").type == pa.int64()
    assert out.column("lang").to_pylist() == ["en", "fr"]
    assert len(out.column("embedding")[0].as_py()) == 8


def test_embed_documents_actor_pool(sf_dir):
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = embed_documents(docs, concurrency=(1, 2)).take_all()
    src = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    by_id = {r["vec_id"]: r["embedding"] for r in out}
    assert len(by_id) == src.num_rows
    for doc_id, text in zip(
        src.column("doc_id").to_pylist()[:25], src.column("text").to_pylist()[:25]
    ):
        np.testing.assert_array_equal(
            np.asarray(by_id[doc_id], dtype=np.float64), _naive_embed(text)
        )


def test_q68_rounding_boundary_clearance():
    """q68 ranks by round(sim, 9) on both sides, so parity rests on ONE
    measurable condition: no candidate cosine lies closer to a 9-decimal
    rounding boundary than the cross-engine cosine discrepancy. numpy and
    DuckDB each compute a 16-element unit-vector dot to ≤ ~4 ulp ≈ 4.4e-16,
    so their results differ by < 1e-15; away from boundaries by ≥ 5e-15
    (5× that bound) both round to the same decimal, and true near-ties —
    observed 1-ulp pairs at sf0.001 — collapse to one value that the
    neighbor_id tie-break orders identically. Measured clearance: ≥ 4.2e-14
    (sf0.001), ≥ 1.7e-13 (sf0.01)."""
    from ocr_endpoint_project_ray.stages.ann import _l2norm

    for sf in ("0.001", "0.01"):
        tbl = pq.read_table(
            f"/root/testdata/sf{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        ids = np.asarray(tbl.column("doc_id").to_pylist())
        m = np.stack([_naive_embed(t) for t in tbl.column("text").to_pylist()])
        mn = _l2norm(m)
        q_rows = np.nonzero(ids < 4)[0]
        c_rows = np.nonzero(ids >= 4)[0]
        clearances = []
        for qi in q_rows:
            sims = mn[c_rows] @ mn[qi]
            off = np.abs(sims - np.round(sims, 9))  # ≤ 0.5e-9, near 0.5e-9 = near boundary
            clearances.append((0.5e-9 - off).min())
        assert min(clearances) > 5e-15, sf  # boundary clearance ≥ 5× noise bound


def test_q68_empty_text_doc_oracle_parity(tmp_path):
    """A whitespace-only corpus doc embeds as the zero vector; the engine
    scores its cosine 0.0 (zero-norm guard) and the SQL twin must agree —
    DuckDB's list_cosine_similarity would say -1.0 and rank it strictly
    below orthogonal neighbors (review finding, round 5)."""
    import duckdb

    from ocr_endpoint_project_ray.pipelines.textops import Q68_ORACLE, q68_embed_ann

    # corpus doc 5 is token-free (zero vector); docs 6/7 are orthogonal to
    # the query (distinct md5 buckets), so they tie with doc 5 at sim 0.0 —
    # the engine's nid-asc tie-break puts 5 BEFORE 6/7, while an unguarded
    # cosine (-1.0 for the zero vector) would rank 5 strictly last
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3, 4, 5, 6, 7], pa.int64()),
            "text": ["aa", "aa", "aa", "aa", "aa aa", "   \n\t  ", "bb", "cc"],
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")

    got = pa.Table.from_pylist(q68_embed_ann(str(tmp_path)).take_all())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.execute(Q68_ORACLE).arrow()
    key = ["query_id", "nn_rank"]
    g = got.to_pandas().sort_values(key, ignore_index=True)
    e = exp.to_pandas().sort_values(key, ignore_index=True)
    assert g[["query_id", "neighbor_id", "nn_rank"]].equals(
        e[["query_id", "neighbor_id", "nn_rank"]]
    )
