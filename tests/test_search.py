"""BM25 ranked retrieval: naive-reference equivalence, block-structure
invariance, the q74 float-clearance certificate, and edge cases."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ocr_endpoint_project_ray.functions.text import TOKEN_RE
from ocr_endpoint_project_ray.stages.search import bm25_topk

TERMS = ("hash", "join", "window", "spark")


def _naive_bm25(rows, terms, k1=1.2, b=0.75):
    """Reference scorer in the engine's exact operation order."""
    tok = re.compile(TOKEN_RE)
    docs = [(i, tok.findall(t or "")) for i, t in rows]
    n = len(docs)
    sum_dl = sum(len(ws) for _, ws in docs)
    avgdl = sum_dl / n
    df = [sum(1 for _, ws in docs if term in ws) for term in terms]
    idf = [math.log((n - d + 0.5) / (d + 0.5) + 1.0) for d in df]
    out = []
    for i, ws in docs:
        dl = len(ws)
        knorm = k1 * ((1.0 - b) + b * (dl / avgdl))
        score = 0.0
        matched = 0
        for j, term in enumerate(terms):
            tf = float(ws.count(term))
            score = score + idf[j] * (tf * (k1 + 1.0)) / (tf + knorm)
            matched += tf > 0
        if matched:
            # np.round, the engine's rounding (stages/search.py)
            out.append((i, float(np.round(score, 9)), dl, matched))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def _table(rows):
    return pa.table(
        {
            "doc_id": pa.array([i for i, _ in rows], pa.int64()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }
    )


ROWS = [
    (0, "hash join hash window group"),
    (1, "spark spark spark"),
    (2, "the quick brown fox"),  # zero matches — excluded
    (3, "join window join hash spark filter sort"),
    (4, None),  # null text: dl 0, counts toward N/avgdl, excluded from output
    (5, "window"),
    (6, "hash " * 50),  # long doc: dl normalization bites
    (7, "hash"),
]


class TestBm25:
    def test_matches_naive_reference(self, ray_session):
        ds = ray.data.from_arrow(_table(ROWS)).repartition(num_blocks=3)
        got = bm25_topk(ds, TERMS, topk=20).take_all()
        want = _naive_bm25(ROWS, TERMS)
        assert [(r["doc_id"], r["dl"], r["n_matched"], r["bm25_rank"]) for r in got] == [
            (i, dl, m, rank) for rank, (i, _, dl, m) in enumerate(want, 1)
        ]
        for r, (_, score, _, _) in zip(got, want):
            assert r["score"] == score

    def test_block_structure_invariant(self, ray_session):
        """Stats partials and per-block candidate cuts must not depend on
        how the corpus is blocked."""
        one = bm25_topk(
            ray.data.from_arrow(_table(ROWS)).repartition(num_blocks=1), TERMS
        ).take_all()
        many = bm25_topk(
            ray.data.from_arrow(_table(ROWS)).repartition(num_blocks=7), TERMS
        ).take_all()
        assert one == many

    def test_topk_cut_and_exclusions(self, ray_session):
        ds = ray.data.from_arrow(_table(ROWS))
        got = bm25_topk(ds, TERMS, topk=2).take_all()
        assert len(got) == 2
        assert [r["bm25_rank"] for r in got] == [1, 2]
        ids = {r["doc_id"] for r in bm25_topk(ds, TERMS, topk=20).take_all()}
        assert 2 not in ids and 4 not in ids  # no-match and null-text docs

    def test_rejects_duplicate_or_empty_terms(self, ray_session):
        import pytest as _pytest

        ds = ray.data.from_arrow(_table(ROWS))
        with _pytest.raises(ValueError):
            bm25_topk(ds, ("hash", "hash"))
        with _pytest.raises(ValueError):
            bm25_topk(ds, ())

    def test_empty_corpus(self, ray_session):
        ds = ray.data.from_arrow(_table([]))
        assert bm25_topk(ds, TERMS).take_all() == []


def test_q74_rounding_boundary_clearance():
    """q74 ranks by round(score, 9) on both sides (the q68 protocol).
    Parity rests on no candidate score lying closer to a 9-decimal
    rounding boundary than the cross-engine arithmetic discrepancy
    (identical IEEE op order, shared platform libm ln → < 1e-14 here)."""
    tok = re.compile(TOKEN_RE)
    for sf in ("0.001", "0.01"):
        tbl = pq.read_table(
            f"/root/testdata/sf{sf}/documents.parquet", columns=["doc_id", "text"]
        )
        rows = list(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
        docs = [(i, tok.findall(t or "")) for i, t in rows]
        n = len(docs)
        avgdl = sum(len(ws) for _, ws in docs) / n
        df = [sum(1 for _, ws in docs if term in ws) for term in TERMS]
        idf = [math.log((n - d + 0.5) / (d + 0.5) + 1.0) for d in df]
        scores = []
        for _, ws in docs:
            dl = len(ws)
            knorm = 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))
            s = 0.0
            for j, term in enumerate(TERMS):
                tf = float(ws.count(term))
                s = s + idf[j] * (tf * (1.2 + 1.0)) / (tf + knorm)
            if s > 0:
                scores.append(s)
        scores = np.asarray(scores)
        off = np.abs(scores - np.round(scores, 9))  # near 0.5e-9 = near boundary
        clearance = (0.5e-9 - off).min()
        assert clearance > 1e-13, (sf, clearance)
