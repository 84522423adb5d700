"""HLL sketch: accuracy, mergeability, serialization; dup-group clustering."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ocr_endpoint_project_ray.functions.sketch import HllSketch, approx_distinct
from ocr_endpoint_project_ray.stages.dedup import dup_groups_from_pairs


class TestHll:
    def test_accuracy(self):
        for true_n in (100, 5_000, 50_000):
            sk = HllSketch(p=12)
            sk.update([f"v{i}" for i in range(true_n)])
            est = sk.estimate()
            assert abs(est - true_n) / true_n < 0.05, (true_n, est)

    def test_merge_equals_union(self):
        a = HllSketch(p=12).update([f"a{i}" for i in range(1000)])
        b = HllSketch(p=12).update([f"a{i}" for i in range(500, 1500)])
        merged_est = a.merge(b).estimate()
        direct = HllSketch(p=12).update([f"a{i}" for i in range(1500)]).estimate()
        assert merged_est == direct  # identical registers → identical estimate

    def test_serialize_roundtrip(self):
        sk = HllSketch(p=10).update(["x", "y", "z"])
        rt = HllSketch.deserialize(sk.serialize())
        assert rt.p == 10 and np.array_equal(rt.registers, sk.registers)

    def test_dataset_approx_distinct(self):
        rng = np.random.default_rng(0)
        keys = rng.integers(0, 3, size=20_000)
        vals = rng.integers(0, 2_000, size=20_000)
        tbl = pa.table({"k": pa.array([f"k{i}" for i in keys]), "v": pa.array(vals)})
        ds = ray.data.from_arrow(tbl)
        out = {r["k"]: r["approx_distinct"] for r in approx_distinct(ds, ["k"], "v", num_partitions=4).take_all()}
        import collections

        truth = collections.defaultdict(set)
        for k, v in zip(keys, vals):
            truth[f"k{k}"].add(v)
        for k, est in out.items():
            true_n = len(truth[k])
            assert abs(est - true_n) / true_n < 0.1, (k, true_n, est)


class TestDupGroups:
    def test_components(self):
        pairs = pa.table(
            {
                "doc_a": pa.array([1, 2, 10, 20], pa.int64()),
                "doc_b": pa.array([2, 3, 11, 21], pa.int64()),
            }
        )
        out = {r["doc_id"]: r["cluster"] for r in dup_groups_from_pairs(pairs).to_pylist()}
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}
