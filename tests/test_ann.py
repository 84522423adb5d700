"""ANN variants: exact brute force vs LSH and IVF recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ocr_endpoint_project_ray.stages.ann import ann_topk, ann_topk_ivf, ann_topk_lsh


def _make(n=200, dim=16, n_q=4, seed=1):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in m], pa.list_(pa.float32())),
        }
    )
    queries = tbl.slice(0, n_q)
    corpus = tbl.slice(n_q)
    return queries, corpus


def _topk_map(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    return {q: [n for _, n in sorted(v)] for q, v in out.items()}


def test_brute_force_matches_numpy():
    queries, corpus = _make()
    got = _topk_map(ann_topk(ray.data.from_arrow(corpus), queries, k=5, num_partitions=4).take_all())
    q = np.asarray([r["embedding"] for r in queries.to_pylist()], dtype=np.float64)
    c = np.asarray([r["embedding"] for r in corpus.to_pylist()], dtype=np.float64)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    sims = q @ c.T
    ids = np.asarray([r["vec_id"] for r in corpus.to_pylist()])
    for qi, qid in enumerate(r["vec_id"] for r in queries.to_pylist()):
        order = np.lexsort((ids, -sims[qi]))[:5]
        assert got[qid] == list(ids[order])


def test_ivf_recall_reasonable_and_exact_at_full_probe():
    queries, corpus = _make(n=300)
    ds = ray.data.from_arrow(corpus)
    exact = _topk_map(ann_topk(ds, queries, k=5, num_partitions=4).take_all())
    # full probe == exact search (every query probes every centroid)
    full = _topk_map(
        ann_topk_ivf(ds, queries, k=5, n_centroids=8, n_probe=8, num_partitions=4).take_all()
    )
    assert full == exact
    # partial probe: top-1 recall should be decent
    approx = _topk_map(
        ann_topk_ivf(ds, queries, k=5, n_centroids=8, n_probe=3, num_partitions=4).take_all()
    )
    hits = sum(1 for q in exact if q in approx and approx[q] and approx[q][0] == exact[q][0])
    assert hits >= len(exact) // 2


def test_ivf_centroids_storage_order_invariant():
    """The quantizer trains on an md5-hash-order sample, so a CLUSTERED
    corpus (sorted so similar rows are adjacent — the storage-order bias of
    every time/source-partitioned real corpus) and its shuffled permutation
    must yield bit-identical centroids (r3 verdict: corpus.limit() trained
    on the first blocks and silently degraded recall on clustered input)."""
    from ocr_endpoint_project_ray.stages.ann import train_ivf_centroids

    queries, corpus = _make(n=600)
    # clustered layout: sort by first embedding coordinate
    first = [r[0] for r in corpus.column("embedding").to_pylist()]
    order = np.argsort(first)
    clustered = corpus.take(pa.array(order, pa.int64()))
    rng = np.random.default_rng(9)
    shuffled = corpus.take(pa.array(rng.permutation(len(corpus)), pa.int64()))

    c1 = train_ivf_centroids(
        ray.data.from_arrow(clustered).repartition(6), n_centroids=8, sample_rows=128
    )
    c2 = train_ivf_centroids(
        ray.data.from_arrow(shuffled).repartition(6), n_centroids=8, sample_rows=128
    )
    assert np.array_equal(c1, c2)


def test_lsh_returns_subset_of_corpus():
    queries, corpus = _make(n=150)
    rows = ann_topk_lsh(
        ray.data.from_arrow(corpus), queries, k=5, n_planes=4, num_partitions=4
    ).take_all()
    corpus_ids = {r["vec_id"] for r in corpus.to_pylist()}
    assert all(r["neighbor_id"] in corpus_ids for r in rows)
    assert all(1 <= r["rank"] <= 5 for r in rows)


def test_q52_threshold_and_plane_clearances():
    """q52's hash-exact oracle parity rests on two float-stability margins:
    no embedding sits close enough to a hyperplane for the bucket sign to
    flip between numpy and DuckDB float64 summation orders (noise ~1e-13),
    and no within-bucket pair's cosine sits that close to the 0.35
    threshold. Assert both margins on the real test tables so data
    regeneration can't silently break the parity guarantee."""
    import pyarrow.parquet as pq

    from ocr_endpoint_project_ray.stages.ann import HyperplaneSigner, _l2norm, _to_matrix

    for sf in ("0.001", "0.01"):
        tbl = pq.read_table(f"/root/testdata/sf{sf}/embeddings.parquet")
        m = _to_matrix(tbl.column("embedding"))
        signer = HyperplaneSigner(64, 6)
        dots = m @ signer._planes
        assert np.abs(dots).min() > 1e-9, sf  # sign-flip margin
        buckets = signer.sign(m)
        mn = _l2norm(m)
        margins = []
        for b in np.unique(buckets):
            rows = np.nonzero(buckets == b)[0]
            if len(rows) < 2:
                continue
            s = mn[rows] @ mn[rows].T
            iu = np.triu_indices(len(rows), k=1)
            margins.append(np.abs(s[iu] - 0.35).min())
        assert min(margins) > 1e-6, sf  # threshold-membership margin


def test_q55_rank_boundary_and_plane_clearances():
    """q55's hash-exact oracle parity rests on: no embedding close enough to
    an 8-plane hyperplane to flip bucket sign between summation orders, and
    no adjacent candidate sims (per query, within matching buckets) close
    enough for numpy-vs-DuckDB cosine noise (~1e-13) to reorder a rank.
    Assert both margins on the real test tables."""
    import pyarrow.parquet as pq

    from ocr_endpoint_project_ray.stages.ann import HyperplaneSigner, _l2norm, _to_matrix

    for sf in ("0.001", "0.01"):
        tbl = pq.read_table(f"/root/testdata/sf{sf}/embeddings.parquet")
        ids = np.asarray(tbl.column("vec_id").to_pylist())
        m = _to_matrix(tbl.column("embedding"))
        signer = HyperplaneSigner(64, 8)
        dots = m @ signer._planes
        assert np.abs(dots).min() > 1e-9, sf  # sign-flip margin
        buckets = signer.sign(m)
        mn = _l2norm(m)
        q_rows = np.nonzero(ids < 8)[0]
        gaps = []
        for qi in q_rows:
            cand = np.nonzero((ids >= 8) & (buckets == buckets[qi]))[0]
            if len(cand) < 2:
                continue
            sims = np.sort(mn[cand] @ mn[qi])
            gaps.append(np.diff(sims).min())
        assert gaps and min(gaps) > 1e-9, sf  # rank-order margin
