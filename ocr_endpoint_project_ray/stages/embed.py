"""Embedding generation: text → vector, as an actor-pool ``map_batches`` stage.

The ANN / embedding-dedup family (stages/ann.py) consumes an ``embedding``
column; a real 100 TB pipeline computes those vectors from text rather than
reading them precomputed (r4 verdict item 2). The stage shape is the
``build_ocr_engine`` pattern (stages/extract.py): a real
sentence-transformers encoder activates the moment the library lands in the
environment, while this container runs a deterministic, SQL-replayable stub —
the **hashing-trick bag-of-tokens encoder**:

    bucket(token) = md5-64(token) % dim        (the repo-wide md5-64 hash)
    embedding[j]  = count of tokens in bucket j, as float32

Tokens are the ONE repo-wide token definition (``functions/text.py::TOKEN_RE``,
RE2 ``\\S+``). Counts are emitted RAW (un-normalized): every downstream
consumer (``ann_topk``, ``embedding_dupe_pairs``) computes cosine, which is
scale-invariant, and integer counts are exactly representable in float32
(≤ 2^24), so the engine and a DuckDB oracle score bit-identical vectors —
what makes the end-to-end pipeline (q68) hash-checkable. A learned encoder
has no SQL twin; with one installed, q68-style oracles become rows-only.

Reference analogue: none — training-data extension (SURVEY.md §2 extras).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

import ray.data


def build_text_encoder(dim: int = 16, model_name: str | None = None):
    """Encoder factory, resolved once per actor: a real sentence-transformers
    model when importable (and requested), else the deterministic hashing
    stub. Returns ``(kind, encode)`` where ``encode(list[str]) -> np.ndarray
    (n, dim) float32``."""
    if model_name is not None:
        try:  # pragma: no cover — not installed in this container
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(model_name)

            def _encode_real(texts: list[str]) -> np.ndarray:
                return np.asarray(
                    model.encode(texts, show_progress_bar=False), dtype=np.float32
                )

            return "sentence-transformers", _encode_real
        except ImportError:
            pass  # fall through to the stub

    from ..functions.text import TOKEN_RE
    from .dedup import _md5_hash64

    tok = re.compile(TOKEN_RE)
    # per-actor token→bucket cache: corpora repeat tokens heavily, and the
    # md5 is the per-row cost; bounded by skip-on-full (ADVICE r4: never
    # clear a hot cache wholesale)
    cache: dict[str, int] = {}

    def _encode_stub(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for w in tok.findall(t or ""):
                j = cache.get(w)
                if j is None:
                    j = _md5_hash64(w) % dim
                    if len(cache) < 1_000_000:
                        cache[w] = j
                out[i, j] += 1.0
        return out

    return "hashing-stub", _encode_stub


class EmbedStage:
    """Actor-pool embedding stage — encoder loaded ONCE per actor
    (``__init__``), batches encoded in ``__call__``. Output schema matches
    the precomputed ``embeddings`` table: ``(vec_id: int64,
    embedding: list<float32>)`` plus any passthrough columns requested."""

    def __init__(
        self,
        dim: int = 16,
        *,
        model_name: str | None = None,
        id_col: str = "doc_id",
        text_col: str = "text",
        keep_cols: tuple[str, ...] = (),
    ) -> None:
        self._dim = dim
        self._id_col = id_col
        self._text_col = text_col
        self._keep = keep_cols
        self._kind, self._encode = build_text_encoder(dim, model_name)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text_col).to_pylist()
        m = self._encode(texts)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {
            "vec_id": batch.column(self._id_col).cast(pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), pa.float32()), self._dim
            ).cast(pa.list_(pa.float32())),
        }
        for c in self._keep:
            cols[c] = batch.column(c)
        return pa.table(cols)


def embed_documents(
    docs: ray.data.Dataset,
    *,
    dim: int = 16,
    model_name: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int | None = 1024,
) -> ray.data.Dataset:
    """documents → ``(vec_id, embedding)`` on an actor pool. Feeds every
    downstream embedding consumer (``ann_topk``, ``embedding_dupe_pairs``,
    IVF/LSH) without a precomputed vector table."""
    return docs.map_batches(
        EmbedStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "dim": dim,
            "model_name": model_name,
            "id_col": id_col,
            "text_col": text_col,
            "keep_cols": keep_cols,
        },
    )


def encode_table(table: pa.Table, *, dim: int = 16, id_col: str = "doc_id",
                 text_col: str = "text") -> pa.Table:
    """Driver-side encode of a SMALL table (e.g. the query side of an ANN
    search) with the identical stub arithmetic — the broadcast companion to
    :class:`EmbedStage`."""
    stage = EmbedStage(dim, id_col=id_col, text_col=text_col)
    return stage(table)
