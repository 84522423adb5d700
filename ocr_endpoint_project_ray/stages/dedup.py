"""Deduplication operators: exact keyed dedup / latest-snapshot, MinHash+LSH,
SimHash, n-gram Jaccard.

Exact dedup is the reference's resume/idempotency primitive
(``scripts/export_benchmark_results.py:47-56``: sort by run_at desc,
drop_duplicates keep-first). Here it is a **keyed hash repartition + per-block
vectorized first-of-run** — no per-group Python callback, and only one
all-to-all of the (usually pre-projected) rows.

Near-dedup is the training-data extension: shingle → minhash → band → bucket
groupby → candidate pairs verified by true Jaccard. All hashing is
content-derived and process-independent (blake2b), never Python ``hash()``
(which is salted per process and would break distributed determinism).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import default_num_partitions
from ..functions.text import jaccard, word_ngrams

# ---------------------------------------------------------------------------
# Exact keyed dedup (first row per key under a sort order)
# ---------------------------------------------------------------------------


def _null_safe_neq(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Element-wise 'values differ' with SQL-grouping null semantics:
    null == null, null != non-null. (Plain ``pc.not_equal`` yields null when
    either side is null, which poisons the boolean mask.)"""
    va = pc.is_valid(a)
    vb = pc.is_valid(b)
    both_valid = pc.and_(va, vb)
    raw = pc.fill_null(pc.not_equal(a, b), False)
    different = pc.or_(pc.xor(va, vb), pc.and_(both_valid, raw))
    return different.to_numpy(zero_copy_only=False).astype(bool)


def _first_per_key(batch: pa.Table, keys: list[str], order: list[tuple[str, str]]) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    sort_keys = [(k, "ascending") for k in keys] + order
    batch = batch.take(pc.sort_indices(batch, sort_keys=sort_keys))
    # boundary mask: first row of each key-run (null keys form a group)
    n = batch.num_rows
    is_first = np.zeros(n, dtype=bool)
    is_first[0] = True
    for k in keys:
        col = batch.column(k).combine_chunks()
        is_first[1:] |= _null_safe_neq(col.slice(1), col.slice(0, n - 1))
    return batch.filter(pa.array(is_first))


def keyed_latest(
    ds: ray.data.Dataset,
    keys: list[str],
    order: list[tuple[str, str]],
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Keep one row per key: the first under ``order`` (e.g.
    ``[("run_at","descending"), ("id","descending")]`` = latest snapshot).

    Scale shape: per-block pre-dedup (cheap, shrinks the shuffle) → keyed
    hash repartition → per-block vectorized first-of-run.
    """
    n = num_partitions or default_num_partitions()
    fn_kwargs = {"keys": keys, "order": order}
    pre = ds.map_batches(
        _first_per_key,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=fn_kwargs,
    )
    co = pre.repartition(num_blocks=n, keys=keys)
    return co.map_batches(
        _first_per_key,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs=fn_kwargs,
    )


def exact_dedup_by_content(
    ds: ray.data.Dataset,
    *,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact dedup: one keeper (min id) + duplicate count per distinct content.

    Hash-partition on a content digest (so the shuffle moves a fixed-width
    key, not the document bytes, when the caller pre-projects), combine
    per-block first: emits (content, keeper id, partial count) per block,
    then finalizes after the keyed repartition.
    """
    n = num_partitions or default_num_partitions()

    def _rename(table: pa.Table, mapping: dict[str, str]) -> pa.Table:
        # name-based rename: pyarrow's group_by output column ORDER has
        # changed across versions, so positional renames silently mislabel
        return table.rename_columns([mapping.get(c, c) for c in table.column_names])

    def _partial(batch: pa.Table) -> pa.Table:
        gb = batch.group_by([content_col], use_threads=False)
        out = gb.aggregate([(id_col, "min"), (id_col, "count")])
        return _rename(out, {f"{id_col}_min": "__keep", f"{id_col}_count": "__cnt"})

    def _final(batch: pa.Table) -> pa.Table:
        gb = batch.group_by([content_col], use_threads=False)
        out = gb.aggregate([("__keep", "min"), ("__cnt", "sum")])
        out = _rename(out, {"__keep_min": id_col, "__cnt_sum": "dup_count"})
        return out.select([id_col, "dup_count"])

    partial = ds.map_batches(
        _partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    co = partial.repartition(num_blocks=n, keys=[content_col])
    return co.map_batches(_final, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Deterministic hashing helpers
# ---------------------------------------------------------------------------


def _stable_hash64(s: str) -> int:
    """Process-independent 64-bit hash (blake2b)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dedup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """Stateful minhash signer — permutation coefficients built once per
    actor in ``__init__`` (model-load pattern), applied vectorized per batch."""

    def __init__(self, num_perm: int = 64, ngram: int = 3, seed: int = 7) -> None:
        rng = np.random.default_rng(seed)
        self._a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self._b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self._num_perm = num_perm
        self._ngram = ngram

    def signature(self, text: str) -> np.ndarray:
        shingles = word_ngrams(text, self._ngram)
        if not shingles:
            return np.zeros(self._num_perm, dtype=np.uint64)
        h = np.array([_stable_hash64(s) for s in shingles], dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (n_shingles, num_perm) universal hashes, wraparound mod 2^64
            sig = (h[:, None] * self._a[None, :] + self._b[None, :]).min(axis=0)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t or "") for t in texts]) if texts else np.zeros((0, self._num_perm), np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(list(sigs.astype(np.int64)), pa.list_(pa.int64(), self._num_perm)),
            }
        )


def _bands_batch(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """Explode signatures into (band_key, doc_id) rows; band_key is a digest
    of the band slice so bucket keys are fixed-width."""
    ids = batch.column("doc_id").to_pylist()
    sigs = batch.column("sig").to_pylist()
    out_keys: list[str] = []
    out_ids: list = []
    for doc_id, sig in zip(ids, sigs):
        for b in range(bands):
            chunk = sig[b * rows : (b + 1) * rows]
            key = hashlib.blake2b(
                (str(b) + ":" + ",".join(map(str, chunk))).encode(), digest_size=8
            ).hexdigest()
            out_keys.append(key)
            out_ids.append(doc_id)
    return pa.table({"band_key": pa.array(out_keys, pa.string()), "doc_id": pa.array(out_ids)})


def _bucket_pairs(batch: pa.Table, max_bucket: int = 64) -> pa.Table:
    """Per-block (post keyed repartition): emit candidate pairs within each
    band bucket. Buckets above ``max_bucket`` are truncated (logged in-band
    via the truncated flag) — a degenerate bucket means the band hash is
    uninformative, and emitting O(n²) pairs would blow up."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "truncated": pa.array([], pa.bool_()),
            }
        )
    batch = batch.take(pc.sort_indices(batch, sort_keys=[("band_key", "ascending"), ("doc_id", "ascending")]))
    keys = batch.column("band_key").to_pylist()
    ids = batch.column("doc_id").to_pylist()
    a_out, b_out, trunc_out = [], [], []
    i = 0
    n = len(keys)
    while i < n:
        j = i
        while j < n and keys[j] == keys[i]:
            j += 1
        bucket = ids[i:j]
        truncated = len(bucket) > max_bucket
        bucket = bucket[:max_bucket]
        for x in range(len(bucket)):
            for y in range(x + 1, len(bucket)):
                a_out.append(bucket[x])
                b_out.append(bucket[y])
                trunc_out.append(truncated)
        i = j
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "truncated": pa.array(trunc_out, pa.bool_()),
        }
    )


class _JaccardVerifier:
    """Verify candidate pairs with true n-gram Jaccard. The doc-text lookup
    is broadcast once (ray.put) and indexed once per actor."""

    def __init__(self, texts_ref, ngram: int) -> None:
        import ray as _ray

        tbl: pa.Table = _ray.get(texts_ref)
        self._texts = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()))
        self._ngram = ngram
        self._cache: dict = {}

    def _shingles(self, doc_id) -> set:
        if doc_id not in self._cache:
            self._cache[doc_id] = word_ngrams(self._texts.get(doc_id, "") or "", self._ngram)
        return self._cache[doc_id]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sims = [
            jaccard(self._shingles(a), self._shingles(b))
            for a, b in zip(batch.column("doc_a").to_pylist(), batch.column("doc_b").to_pylist())
        ]
        return batch.append_column("jaccard_sim", pa.array(sims, pa.float64()))


def minhash_lsh_pairs(
    docs: ray.data.Dataset,
    *,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    threshold: float = 0.5,
    num_partitions: int | None = None,
    verify_texts: pa.Table | None = None,
) -> ray.data.Dataset:
    """Near-duplicate candidate pairs via MinHash+LSH.

    shingle→minhash (actor pool) → band explode → keyed repartition on
    band_key → per-bucket pair emit → global pair dedup → optional exact
    Jaccard verify (broadcast text lookup) with ``threshold`` filter.

    At 10^12-doc scale, ``verify_texts`` must be None (no broadcastable text
    table); verification then joins text shards by doc_id instead — the
    candidate generation path is identical.
    """
    rows = num_perm // bands
    n = num_partitions or default_num_partitions()
    sigs = docs.map_batches(
        MinHasher,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=512,
        concurrency=(1, 8),
        fn_constructor_kwargs={"num_perm": num_perm, "ngram": ngram},
    )
    band_rows = sigs.map_batches(
        _bands_batch,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"bands": bands, "rows": rows},
    )
    pairs = (
        band_rows.repartition(num_blocks=n, keys=["band_key"])
        .map_batches(_bucket_pairs, batch_size=None, batch_format="pyarrow")
    )
    # a pair can match in several bands → exact dedup on the pair key
    uniq = keyed_latest(
        pairs, ["doc_a", "doc_b"], [("truncated", "ascending")], num_partitions=n
    )
    if verify_texts is not None:
        import ray as _ray

        ref = _ray.put(verify_texts)
        verified = uniq.map_batches(
            _JaccardVerifier,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=(1, 4),
            fn_constructor_args=(ref, ngram),
        )
        def _thresh(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater_equal(b.column("jaccard_sim"), threshold))

        return verified.map_batches(_thresh, batch_size=None, batch_format="pyarrow")
    return uniq


def dup_groups_from_pairs(pairs: pa.Table, *, id_cols: tuple[str, str] = ("doc_a", "doc_b")) -> pa.Table:
    """Near-dup pair list → connected-component cluster labels
    (doc_id, cluster = min doc_id in component).

    Driver-side union-find: the verified-pair set is orders of magnitude
    smaller than the corpus (it only contains near-dups), so collecting it is
    bounded. Scale path when even pairs don't fit: iterate min-label
    propagation as keyed joins (label(doc) = min(label(doc), min over
    neighbors) until fixpoint) — same result, log-diameter rounds.
    """
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo

    a_col, b_col = id_cols
    for a, b in zip(pairs.column(a_col).to_pylist(), pairs.column(b_col).to_pylist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)
    members = sorted(parent)
    return pa.table(
        {
            "doc_id": pa.array(members),
            "cluster": pa.array([find(m) for m in members]),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """64-bit SimHash per doc: sign-sum of token-hash bit vectors."""
    texts = batch.column(text_col).to_pylist()
    out = []
    for t in texts:
        from ..functions.text import normalize_words

        words = normalize_words(t or "")
        if not words:
            out.append(0)
            continue
        hs = np.array([_stable_hash64(w) for w in words], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        v = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for bit in np.nonzero(v > 0)[0]:
            sim |= np.uint64(1) << np.uint64(bit)
        out.append(int(sim.astype(np.int64)))
    return pa.table({"doc_id": batch.column("doc_id"), "simhash": pa.array(out, pa.int64())})


def hamming_distance64(a: int, b: int) -> int:
    return bin((a & 0xFFFFFFFFFFFFFFFF) ^ (b & 0xFFFFFFFFFFFFFFFF)).count("1")
