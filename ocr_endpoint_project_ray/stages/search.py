"""Lexical ranked retrieval — Okapi BM25 top-k over the token stream.

BM25 (Robertson et al., the public Okapi probabilistic-relevance form):
score(D, Q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1−b+b·|D|/avgdl))
with idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1). Tokens are the
repo-wide RE2 ``\\S+`` rule (functions/text.py::TOKEN_RE); a NULL text is
the empty document (dl = 0) and still counts toward N and avgdl — the SQL
twin's COALESCE semantics.

Two corpus passes BY DESIGN: pass 1 reduces the corpus to |terms|+2
global integers (N, Σdl, per-term document frequencies) via per-block
1-row partials — driver state is O(blocks), the countmin grid-stream
shape — and pass 2 re-tokenizes and scores with the resulting idf
constants shipped in the task closure (a handful of doubles; no
shuffle). A single-pass design would either materialize the per-doc tf
table (corpus-sized at 10¹² docs) or fork the lazy DAG and re-execute
the upstream scan per consumer (the q65 note); two streamed scans are
the cheaper tax — the salted as-of argument (stages/asof.py).

Top-k is the per-block-candidates shape (stages/ann.py::ann_topk /
countmin_topk): each block forwards its local top-k by the TOTAL order
(score DESC, id ASC), the union coalesces to one block, and the final
exact cut + rank assignment happens there — correct because the global
top-k is a subset of the union of block top-ks under any total order.

Float parity with the SQL twin (q74) is the q68 protocol: identical
operation order term by term (Python/numpy and DuckDB both delegate ln
and IEEE ·/÷ to the platform libm), scores rounded to 9 decimals on
both sides before ranking, and a boundary-clearance pytest certifying
no score sits near a rounding boundary (tests/test_search.py).

Reference analogue: none — training-data extension (corpus search /
relevance ranking; the lexical counterpart of stages/ann.py's vector
top-k)."""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.text import TOKEN_RE


def _tf_dl(
    batch: pa.Table, terms: tuple[str, ...], text_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(tf[n_rows, n_terms], dl[n_rows]) for one batch. The token walk is
    inherently per-string (the repo-wide rule: loop once per row, count
    into preallocated arrays — no per-row Python objects survive)."""
    tokre = re.compile(TOKEN_RE)
    col_of = {t: j for j, t in enumerate(terms)}
    n = batch.num_rows
    tf = np.zeros((n, len(terms)), dtype=np.int64)
    dl = np.zeros(n, dtype=np.int64)
    for row, t in enumerate(batch.column(text_col).to_pylist()):
        ws = tokre.findall(t or "")
        dl[row] = len(ws)
        for w in ws:
            j = col_of.get(w)
            if j is not None:
                tf[row, j] += 1
    return tf, dl


def bm25_topk(
    docs: ray.data.Dataset,
    terms: tuple[str, ...],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
    round_scores: int | None = 9,
) -> ray.data.Dataset:
    """Top-``topk`` documents by BM25 relevance to the ``terms`` query.

    Output: (bm25_rank 1.., doc_id int64, score double, dl, n_matched) —
    zero-match documents are excluded before the cut. ``round_scores``
    ranks by the rounded score (the q68 tie-robust mode; None ranks raw).
    ``terms`` must be non-empty and distinct — a duplicated term would
    silently shadow its own tf column and mis-score.
    """
    if not terms or len(set(terms)) != len(terms):
        raise ValueError(f"terms must be non-empty and distinct, got {terms!r}")

    def _stats(batch: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(batch, terms, text_col)
        row: dict[str, list[int]] = {
            "n": [batch.num_rows],
            "sum_dl": [int(dl.sum())],
        }
        for j in range(len(terms)):
            row[f"df{j}"] = [int((tf[:, j] > 0).sum())]
        return pa.table({k: pa.array(v, pa.int64()) for k, v in row.items()})

    parts = docs.map_batches(
        _stats, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    n_total = sum(r["n"] for r in parts)
    if n_total == 0:
        return ray.data.from_arrow(_empty_result())
    sum_dl = sum(r["sum_dl"] for r in parts)
    df = [sum(r[f"df{j}"] for r in parts) for j in range(len(terms))]
    # exact int/int IEEE quotient — the SQL twin's CAST(sum AS DOUBLE)/CAST(n)
    avgdl = sum_dl / n_total
    # math.log = platform libm, the same function DuckDB's ln() calls
    idf = [math.log((n_total - d + 0.5) / (d + 0.5) + 1.0) for d in df]

    def _score_block(batch: pa.Table) -> pa.Table:
        tf, dl = _tf_dl(batch, terms, text_col)
        tff = tf.astype(np.float64)
        # operation order mirrors the SQL twin text exactly, term by term:
        # idf_j * (tf_j * (k1 + 1.0)) / (tf_j + k1 * ((1.0 - b) + b * (dl / avgdl)))
        knorm = k1 * ((1.0 - b) + b * (dl / avgdl))
        score = np.zeros(batch.num_rows, dtype=np.float64)
        for j in range(len(terms)):
            score = score + idf[j] * (tff[:, j] * (k1 + 1.0)) / (tff[:, j] + knorm)
        if round_scores is not None:
            score = np.round(score, round_scores)
        n_matched = (tf > 0).sum(axis=1).astype(np.int64)
        t = pa.table(
            {
                "doc_id": pc.cast(batch.column(id_col), pa.int64()),
                "score": pa.array(score, pa.float64()),
                "dl": pa.array(dl, pa.int64()),
                "n_matched": pa.array(n_matched, pa.int64()),
            }
        ).filter(pa.array(n_matched > 0))
        return _cut_topk(t, topk)

    candidates = docs.map_batches(
        _score_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def _final(batch: pa.Table) -> pa.Table:
        t = _cut_topk(batch, topk)
        return t.append_column(
            "bm25_rank", pa.array(np.arange(1, t.num_rows + 1, dtype=np.int64))
        )

    return candidates.repartition(num_blocks=1).map_batches(
        _final, batch_size=None, batch_format="pyarrow"
    )


def _cut_topk(t: pa.Table, topk: int) -> pa.Table:
    order = pc.sort_indices(
        t, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
    )
    return t.take(order[:topk])


def _empty_result() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "dl": pa.array([], pa.int64()),
            "n_matched": pa.array([], pa.int64()),
            "bm25_rank": pa.array([], pa.int64()),
        }
    )
