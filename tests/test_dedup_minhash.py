"""MinHash+LSH near-dedup: vectorized signer determinism, band explode
shape, and pair-for-pair parity between the broadcast verify path and the
sharded (join-by-doc_id) verify path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ocr_endpoint_project_ray.stages.dedup import (
    MinHasher,
    _bands_batch,
    minhash_lsh_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and every good boy deserves fudge today"
)


def _corpus() -> pa.Table:
    texts = [
        BASE,
        BASE + " with one extra tail clause appended here",  # near-dup of 0
        "completely different content about database systems and query planning",
        "ray data streams arrow blocks through a pipelined executor with backpressure",
        BASE.replace("fox", "wolf"),  # near-dup of 0
        "short doc",  # < ngram words: single-shingle fallback
        "",
    ]
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )


def test_minhasher_deterministic_across_instances():
    a = MinHasher(num_perm=32, ngram=3, seed=7)
    b = MinHasher(num_perm=32, ngram=3, seed=7)
    for t in [BASE, "short doc", "one"]:
        assert np.array_equal(a.signature(t), b.signature(t))
    # empty text → zero signature, stable
    assert np.array_equal(a.signature(""), np.zeros(32, np.uint64))
    # near-identical docs share most minhash slots; disjoint docs share few
    s0 = a.signature(BASE)
    s1 = a.signature(BASE + " tail")
    s2 = a.signature("unrelated words entirely about other topics and things")
    assert (s0 == s1).mean() > (s0 == s2).mean()


def test_bands_batch_vectorized_shape():
    m = MinHasher(num_perm=16, ngram=3, seed=7)
    tbl = m(_corpus())
    out = _bands_batch(tbl, bands=4, rows=4)
    assert out.column_names == ["band_key", "doc_id"]
    assert out.num_rows == tbl.num_rows * 4
    assert out.schema.field("band_key").type == pa.int64()
    # identical docs collide in every band; doc-major repeat order
    ids = out.column("doc_id").to_pylist()
    assert ids[:4] == [0, 0, 0, 0]


def test_verify_paths_agree():
    corpus = _corpus()
    docs = ray.data.from_arrow(corpus)

    def norm(rows):
        return sorted((r["doc_a"], r["doc_b"], round(r["jaccard_sim"], 9)) for r in rows)

    bc = minhash_lsh_pairs(
        docs, threshold=0.3, num_partitions=4, verify_texts=corpus
    ).take_all()
    jn = minhash_lsh_pairs(
        ray.data.from_arrow(corpus),
        threshold=0.3,
        num_partitions=4,
        verify_docs=ray.data.from_arrow(corpus),
    ).take_all()
    assert norm(bc) == norm(jn)
    found = {(r["doc_a"], r["doc_b"]) for r in bc}
    assert (0, 1) in found and (0, 4) in found
    assert all(a < b for a, b in found)


def test_distributed_components_match_union_find():
    from ocr_endpoint_project_ray.stages.dedup import (
        dup_groups_distributed,
        dup_groups_from_pairs,
    )

    # multi-component graph incl. a chain (diameter 4 → forces several
    # propagation rounds) and an isolated pair
    edges = [(10, 11), (11, 12), (12, 13), (13, 14), (20, 21), (30, 31), (31, 30)]
    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in edges], pa.int64()),
            "doc_b": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    want = {r["doc_id"]: r["cluster"] for r in dup_groups_from_pairs(tbl).to_pylist()}
    got_rows = dup_groups_distributed(
        ray.data.from_arrow(tbl), num_partitions=4
    ).take_all()
    got = {r["doc_id"]: r["cluster"] for r in got_rows}
    assert got == want
    assert got[14] == 10 and got[21] == 20 and got[31] == 30


def test_distributed_components_empty_pairs():
    from ocr_endpoint_project_ray.stages.dedup import dup_groups_distributed

    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    out = dup_groups_distributed(ray.data.from_arrow(empty), num_partitions=2).take_all()
    assert out == []


def test_minhash_rejects_indivisible_bands():
    """num_perm must divide evenly into bands (the signature matrix reshapes
    to (n, bands, rows)) — fail fast instead of a numpy ValueError mid-run."""
    import pytest

    from ocr_endpoint_project_ray.stages.dedup import minhash_lsh_pairs

    ds = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["hello world"]}))
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs(ds, num_perm=64, bands=10)


class TestJaccardPairsExact:
    def _docs(self):
        base = "the quick brown fox jumps over the lazy dog again and again today"
        texts = [
            base,
            base + " extra",                     # near-dup of 0
            base.replace("quick", "slow"),       # near-dup of 0
            "completely different text about ray data pipelines and arrow tables",
            "completely different text about ray data pipelines and arrow kernels",
            "sh",                                # < ngram tokens: no shingles
        ]
        return pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )

    def test_broadcast_and_hash_paths_agree(self):
        from ocr_endpoint_project_ray.stages.dedup import jaccard_pairs_exact

        ds = ray.data.from_arrow(self._docs()).repartition(3)
        key = lambda rows: sorted((r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows)
        b = key(jaccard_pairs_exact(ds, threshold=0.1, num_partitions=2).take_all())
        h = key(
            jaccard_pairs_exact(
                ds, threshold=0.1, num_partitions=2, sizes_join="hash"
            ).take_all()
        )
        assert b == h and len(b) >= 2  # the two near-dup families both pair up
        pairs = {(a, bb) for a, bb, _ in b}
        assert (0, 1) in pairs and (3, 4) in pairs

    def test_exact_values_vs_brute_force(self):
        from ocr_endpoint_project_ray.functions.text import word_ngrams
        from ocr_endpoint_project_ray.stages.dedup import jaccard_pairs_exact

        tbl = self._docs()
        ds = ray.data.from_arrow(tbl).repartition(2)
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs_exact(ds, threshold=0.05, num_partitions=2).take_all()
        }
        texts = tbl.column("text").to_pylist()
        # brute force over full (unhashed) shingle sets; corpus has no
        # stop-shingles (max_df=32 > n_docs) and no md5 collisions
        sets = {
            i: {s for s in word_ngrams(t, 3)} if len(t.split()) >= 3 else set()
            for i, t in enumerate(texts)
        }
        for (a, b), j in got.items():
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            assert j == inter / union, (a, b)

    def test_stop_shingle_bound(self):
        """A shingle present in more than max_df docs is dropped from the
        index on BOTH sides of the jaccard — a degenerate common phrase
        cannot create an O(n²) bucket."""
        from ocr_endpoint_project_ray.stages.dedup import jaccard_pairs_exact

        n = 12
        texts = [f"common shared prefix unique{i} tail{i} word{i}" for i in range(n)]
        tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})
        ds = ray.data.from_arrow(tbl).repartition(3)
        # "common shared prefix" appears in all 12 docs; max_df=4 drops it,
        # leaving each doc only its unique shingles -> zero pairs.
        out = jaccard_pairs_exact(ds, max_df=4, threshold=0.01, num_partitions=2).take_all()
        assert out == []
        # with the bound relaxed the common shingle pairs everything up
        out2 = jaccard_pairs_exact(ds, max_df=32, threshold=0.01, num_partitions=2).take_all()
        assert len(out2) == n * (n - 1) // 2


class TestMinhashPairsMd5:
    """q53: the SQL-replayable MinHash+LSH path."""

    def test_subset_of_exact_jaccard_with_equal_values(self):
        """Every md5-minhash pair is an exact-Jaccard pair (same threshold,
        same max_df), with a bit-identical jaccard value — banding can only
        MISS pairs, never invent or perturb them."""
        from ocr_endpoint_project_ray.stages.dedup import (
            jaccard_pairs_exact,
            minhash_pairs_md5,
        )

        ds = ray.data.from_arrow(_corpus()).repartition(3)
        exact = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs_exact(ds, threshold=0.1, num_partitions=2).take_all()
        }
        mh = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_pairs_md5(ds, threshold=0.1, num_partitions=2).take_all()
        }
        assert mh, "high-similarity near-dups must survive banding"
        for pair, j in mh.items():
            assert pair in exact and exact[pair] == j, pair

    def test_overfull_bucket_dropped(self):
        """Identical docs all share every band bucket; with max_bucket below
        the corpus size the bucket is dropped outright (the SQL-mirrored
        drop rule) — zero pairs, not O(n²)."""
        from ocr_endpoint_project_ray.stages.dedup import minhash_pairs_md5

        n = 10
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["identical text shared by every doc here"] * n),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(2)
        out = minhash_pairs_md5(ds, max_bucket=4, threshold=0.01, num_partitions=2).take_all()
        assert out == []
        out2 = minhash_pairs_md5(ds, max_bucket=64, threshold=0.01, num_partitions=2).take_all()
        assert len(out2) == n * (n - 1) // 2
        assert all(r["jaccard"] == 1.0 for r in out2)

    def test_rejects_indivisible_bands(self):
        import pytest

        from ocr_endpoint_project_ray.stages.dedup import minhash_pairs_md5

        ds = ray.data.from_arrow(_corpus())
        with pytest.raises(ValueError, match="divisible"):
            minhash_pairs_md5(ds, num_perm=16, bands=5)


def test_bucket_pairs_kernel_matches_naive_reference():
    """_bucket_pairs (numpy run boundaries, r3 verdict item 5) vs a naive
    per-key Python reference, including over-full truncated buckets and
    cross-run doc-id ordering."""
    from ocr_endpoint_project_ray.stages.dedup import _bucket_pairs

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 60, size=400)
    ids = rng.permutation(400).astype(np.int64)
    batch = pa.table(
        {
            "band_key": pa.array(keys, pa.int64()),
            "doc_id": pa.array(ids, pa.int64()),
        }
    )
    max_bucket = 8
    got = _bucket_pairs(batch, max_bucket=max_bucket).to_pylist()

    expected = []
    for k in sorted(set(keys.tolist())):
        bucket = sorted(ids[keys == k].tolist())
        truncated = len(bucket) > max_bucket
        bucket = bucket[:max_bucket]
        for x in range(len(bucket)):
            for y in range(x + 1, len(bucket)):
                expected.append(
                    {"doc_a": bucket[x], "doc_b": bucket[y], "truncated": truncated}
                )
    assert got == expected
    assert any(r["truncated"] for r in got)  # the scenario exercises truncation
    assert any(not r["truncated"] for r in got)
