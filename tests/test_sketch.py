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


class TestTDigest:
    def test_rank_error_bound(self):
        """Dunning's bound: rank error ~O(1/delta); at delta=200 empirically
        ≲1e-3 — assert a conservative 0.005 across the quantile range on a
        skewed distribution."""
        from ocr_endpoint_project_ray.functions.sketch import TDigest

        rng = np.random.default_rng(7)
        v = rng.lognormal(0.0, 1.5, 100_000)
        d = TDigest(200).update(v)
        assert len(d.means) <= 200  # bounded regardless of input size
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99):
            est = d.quantile(q)
            rank = float((v <= est).mean())
            assert abs(rank - q) <= 0.005, (q, rank)
        # extremes are exact (tracked min/max)
        assert d.quantile(0.0) == v.min()
        assert d.quantile(1.0) == v.max()

    def test_merge_matches_single_pass_bound(self):
        """Sharded build + merge must stay within the same rank-error bound
        as one-shot construction (mergeability is what makes it a per-batch
        combiner)."""
        from ocr_endpoint_project_ray.functions.sketch import TDigest

        rng = np.random.default_rng(11)
        v = rng.standard_normal(80_000) * 10.0
        shards = [TDigest(200).update(s) for s in np.array_split(v, 17)]
        merged = shards[0]
        for s in shards[1:]:
            merged.merge(TDigest.deserialize(s.serialize()))  # exercise (de)serialize
        for q in (0.05, 0.5, 0.95):
            rank = float((v <= merged.quantile(q)).mean())
            assert abs(rank - q) <= 0.005, (q, rank)

    def test_approx_quantiles_operator_vs_exact(self):
        """Distributed t-digest per group tracks numpy's exact quantiles;
        NaN values are ignored; group sizes differ by 100×."""
        from ocr_endpoint_project_ray.functions.sketch import approx_quantiles

        rng = np.random.default_rng(3)
        sizes = {"big": 50_000, "small": 500}
        keys, vals = [], []
        for k, n in sizes.items():
            keys.extend([k] * n)
            vals.extend(rng.gamma(2.0, 3.0, n).tolist())
        keys.append("big")
        vals.append(float("nan"))
        tbl = pa.table({"g": pa.array(keys), "value": pa.array(vals, pa.float64())})
        ds = ray.data.from_arrow(tbl).repartition(8)
        out = {
            r["g"]: (r["p50"], r["p95"])
            for r in approx_quantiles(
                ds, ["g"], "value", {"p50": 0.5, "p95": 0.95}, num_partitions=2
            ).take_all()
        }
        arr = {k: np.array([v for kk, v in zip(keys, vals) if kk == k and v == v]) for k in sizes}
        for k in sizes:
            for (q, est) in zip((0.5, 0.95), out[k]):
                rank = float((arr[k] <= est).mean())
                assert abs(rank - q) <= 0.01, (k, q, rank)


class TestHllExactArith:
    def test_md5_exact_arith_matches_reference_formula(self):
        """The SQL-twin estimate (integer S_num + one division) must agree
        with the float formula to within one count, and serialization must
        carry the hasher."""
        import math

        from ocr_endpoint_project_ray.functions.sketch import HllSketch, exact_arith_constant

        sk = HllSketch(4, hasher="md5").update([f"u{i}" for i in range(500)])
        rt = HllSketch.deserialize(sk.serialize())
        assert rt.hasher == "md5"
        assert (rt.registers == sk.registers).all()
        got = sk.estimate_exact_arith()
        # same quantity via the float path (no small-range branch at n=500)
        s = float(np.sum(np.exp2(-sk.registers.astype(np.float64))))
        ref = exact_arith_constant(4) / (s * float(1 << 61))
        assert abs(got - math.floor(ref)) <= 1
        # m=16 HLL: within ~3 sigma (sigma = 1.04/sqrt(16) = 26%)
        assert 100 <= got <= 1500


class TestExactQuantilesTwoPass:
    def test_bit_exact_vs_duckdb_with_refinement(self):
        """Forced multi-pass refinement (tiny collect_cap) on skewed data
        with a duplicate mass must reproduce DuckDB quantile_cont BIT-exact
        — the whole point of mirroring the interpolation op order."""
        import duckdb

        from ocr_endpoint_project_ray.functions.quantiles import grouped_quantiles_exact

        rng = np.random.default_rng(2)
        n = 20000
        g = rng.choice(["a", "b", "c"], n, p=[0.8, 0.15, 0.05])
        v = np.round(rng.lognormal(1, 1, n) * 100, 2)
        v[::97] = 42.42  # duplicate mass inside one bin
        tbl = pa.table({"g": pa.array(g), "value": pa.array(v, pa.float64())})
        out = grouped_quantiles_exact(
            ray.data.from_arrow(tbl).repartition(6),
            ["g"],
            "value",
            {"p50": 0.5, "p95": 0.95},
            bins=64,
            collect_cap=300,
            num_partitions=2,
        )
        got = {r["g"]: (r["p50"], r["p95"]) for r in out.to_pylist()}
        con = duckdb.connect()
        con.register("t", tbl)
        exact = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                "SELECT g, quantile_cont(value, 0.5), quantile_cont(value, 0.95)"
                " FROM t GROUP BY g"
            ).fetchall()
        }
        assert got == exact

    def test_edge_groups(self):
        """All-identical group (point interval), null-only group, group
        smaller than collect_cap."""
        from ocr_endpoint_project_ray.functions.quantiles import grouped_quantiles_exact

        tbl = pa.table(
            {
                "g": pa.array(["x"] * 100 + ["y"] + ["z"] * 3),
                "value": pa.array([7.0] * 100 + [None] + [1.0, 2.0, 3.0], pa.float64()),
            }
        )
        out = grouped_quantiles_exact(
            ray.data.from_arrow(tbl).repartition(3),
            ["g"],
            "value",
            {"p50": 0.5},
            bins=16,
            collect_cap=2,
            num_partitions=2,
        )
        got = {r["g"]: r["p50"] for r in out.to_pylist()}
        assert got == {"x": 7.0, "y": None, "z": 2.0}


class TestSortedGroupRuns:
    """The vectorized group-split kernel must match SQL GROUP BY / pandas
    groupby(dropna=False) on degenerate keys: nulls are one group, float
    NaNs are one group (Arrow's not_equal says NaN≠NaN, which un-fixed
    split every NaN row into its own run)."""

    def test_nan_and_null_float_keys_group_together(self):
        import numpy as np
        import pyarrow as pa

        from ocr_endpoint_project_ray.functions.sketch import _sorted_group_runs

        t = pa.table(
            {
                "k": pa.array(
                    [float("nan"), 1.0, float("nan"), None, 1.0, None, 2.0],
                    pa.float64(),
                ),
                "v": pa.array(range(7), pa.int64()),
            }
        )
        b, bounds = _sorted_group_runs(t, ["k"])
        sizes = np.diff(bounds)
        # groups: 1.0 ×2, 2.0 ×1, NaN ×2, null ×2 — exactly four runs
        assert sorted(sizes.tolist()) == [1, 2, 2, 2]
        keys = [b.column("k")[int(s)].as_py() for s in bounds[:-1]]
        n_nan = sum(1 for x in keys if x is not None and x != x)
        assert n_nan == 1 and keys.count(None) == 1

    def test_string_and_int_keys_unaffected(self):
        import numpy as np
        import pyarrow as pa

        from ocr_endpoint_project_ray.functions.sketch import _sorted_group_runs

        t = pa.table(
            {
                "a": pa.array(["x", None, "x", "y", None], pa.string()),
                "b": pa.array([1, 2, 1, 1, 2], pa.int64()),
            }
        )
        _, bounds = _sorted_group_runs(t, ["a", "b"])
        assert sorted(np.diff(bounds).tolist()) == [1, 2, 2]


class TestCountMin:
    def _exact(self, terms):
        from collections import Counter

        return Counter(t for t in terms if t is not None)

    def test_estimate_never_undercounts_and_exact_without_collisions(self):
        from ocr_endpoint_project_ray.functions.sketch import CountMinSketch

        terms = [f"t{i}" for i in range(30) for _ in range(i + 1)]
        exact = self._exact(terms)
        # w=8 forces collisions: every estimate is an upper bound
        sk = CountMinSketch(d=4, w=8).add(
            list(exact), np.array(list(exact.values()), np.int64)
        )
        est = sk.estimate(list(exact))
        assert all(e >= exact[t] for t, e in zip(exact, est))
        # w large enough that 30 terms x 4 rows collide with ~0 probability
        sk2 = CountMinSketch(d=4, w=1 << 16).add(
            list(exact), np.array(list(exact.values()), np.int64)
        )
        est2 = sk2.estimate(list(exact))
        assert all(e == exact[t] for t, e in zip(exact, est2))

    def test_merge_is_linear(self):
        from ocr_endpoint_project_ray.functions.sketch import CountMinSketch

        a = CountMinSketch(d=2, w=16).add(["x", "y"], np.array([3, 5], np.int64))
        b = CountMinSketch(d=2, w=16).add(["x", "z"], np.array([7, 1], np.int64))
        whole = CountMinSketch(d=2, w=16).add(
            ["x", "y", "z"], np.array([10, 5, 1], np.int64)
        )
        merged = a.merge(
            CountMinSketch.deserialize(b.serialize(), 2, 16, "md5")
        )
        assert np.array_equal(merged.grid, whole.grid)

    def test_topk_block_structure_invariant(self, ray_session):
        """The distributed result must equal the single-sketch brute result
        and be independent of how rows split into blocks (linearity)."""
        import ray.data

        from ocr_endpoint_project_ray.functions.sketch import (
            CountMinSketch,
            countmin_topk,
        )

        rows = [{"term": f"w{i % 17}"} for i in range(400)] + [{"term": None}] * 5
        exact = self._exact(r["term"] for r in rows)
        sk = CountMinSketch(d=4, w=16).add(
            list(exact), np.array(list(exact.values()), np.int64)
        )
        est = dict(zip(exact, sk.estimate(list(exact))))
        want = sorted(exact, key=lambda t: (-est[t], t))[:5]
        want = [{"term": t, "approx_count": int(est[t])} for t in want]
        for par in (1, 7):
            ds = ray.data.from_items(rows, override_num_blocks=par)
            got = countmin_topk(
                ds, "term", k=5, d=4, w=16, num_partitions=2
            ).take_all()
            assert got == want, (par, got[:3], want[:3])

    def test_weighted_path_matches_unweighted(self, ray_session):
        import ray.data

        from ocr_endpoint_project_ray.functions.sketch import countmin_topk

        flat = [{"term": t} for t in ["a"] * 6 + ["b"] * 3 + ["c"] * 9]
        pre = [
            {"term": "a", "n": 4}, {"term": "a", "n": 2},
            {"term": "b", "n": 3},
            {"term": "c", "n": 9}, {"term": None, "n": 99},
        ]
        r1 = countmin_topk(
            ray.data.from_items(flat, override_num_blocks=3), "term", k=3, w=32
        ).take_all()
        r2 = countmin_topk(
            ray.data.from_items(pre, override_num_blocks=2),
            "term", weight_col="n", k=3, w=32,
        ).take_all()
        assert r1 == r2 == [
            {"term": "c", "approx_count": 9},
            {"term": "a", "approx_count": 6},
            {"term": "b", "approx_count": 3},
        ]

    def test_candidate_topm_keeps_heavy_hitters(self, ray_session):
        """Web-vocab mode: with per-block top-m candidate streams, every
        term heavy in SOME block (all true global heavy hitters here — they
        dominate every block they touch) survives to the final top-k even
        though most of the vocabulary never leaves its block."""
        import ray.data

        from ocr_endpoint_project_ray.functions.sketch import countmin_topk

        rows = []
        for blk in range(4):  # 4 heavy terms (100x) + 200 singleton terms
            rows += [{"term": f"HEAVY{i}"} for i in range(4) for _ in range(100)]
            rows += [{"term": f"rare{blk}_{j}"} for j in range(200)]
        ds = ray.data.from_items(rows, override_num_blocks=4)
        got = countmin_topk(
            ds, "term", k=4, d=4, w=4096, hasher="blake2b",
            candidate_topm=8, num_partitions=2,
        ).take_all()
        assert sorted(r["term"] for r in got) == [f"HEAVY{i}" for i in range(4)]
        # estimates still upper-bound the truth (400 each)
        assert all(r["approx_count"] >= 400 for r in got)

    def test_null_weight_rows_contribute_nothing(self, ray_session):
        """A null weight must be ignored (SQL sum semantics) — unguarded it
        becomes NaN → INT64_MIN in the grid and poisons every estimate."""
        import ray.data

        from ocr_endpoint_project_ray.functions.sketch import countmin_topk

        rows = [
            {"term": "a", "n": 4}, {"term": "a", "n": None},
            {"term": "b", "n": 3}, {"term": None, "n": 7},
        ]
        got = countmin_topk(
            ray.data.from_items(rows, override_num_blocks=2),
            "term", weight_col="n", k=2, w=32,
        ).take_all()
        assert got == [
            {"term": "a", "approx_count": 4},
            {"term": "b", "approx_count": 3},
        ]


class TestBloom:
    def test_no_false_negatives_and_fp_bound(self):
        from ocr_endpoint_project_ray.functions.sketch import BloomFilter

        inserted = [f"key-{i}" for i in range(1000)]
        bf = BloomFilter(m=1 << 14, k=4).add_many(inserted)
        assert bf.contains_many(inserted).all(), "Bloom false negative"
        probes = [f"absent-{i}" for i in range(20000)]
        fp = float(bf.contains_many(probes).mean())
        # theory: (1 - e^{-kn/m})^k = (1 - e^{-4000/16384})^4 ≈ 0.0022;
        # allow 3x sampling slack
        assert fp < 0.0066, fp

    def test_merge_equals_bulk_add(self):
        from ocr_endpoint_project_ray.functions.sketch import BloomFilter

        a = BloomFilter(m=1 << 10, k=3).add_many(["x", "y"])
        b = BloomFilter(m=1 << 10, k=3).add_many(["y", "z"])
        whole = BloomFilter(m=1 << 10, k=3).add_many(["x", "y", "z"])
        merged = a.merge(BloomFilter.deserialize(b.serialize(), 1 << 10, 3, "blake2b"))
        assert np.array_equal(merged.bits, whole.bits)

    def test_power_of_two_enforced(self):
        import pytest as _pytest

        from ocr_endpoint_project_ray.functions.sketch import BloomFilter

        with _pytest.raises(ValueError):
            BloomFilter(m=1000)

    def test_md5_positions_match_sql_twin(self):
        """The q73 oracle contract: (h1 % m + i*(h2 % m)) % m in unbounded
        SQL integers equals the engine's wrapping-uint64 (h1 + i*h2) % m."""
        import duckdb

        from ocr_endpoint_project_ray.functions.sketch import BloomFilter

        vals = ["alpha beta", "k1 k2 k3", "", "Ünïcode test"]
        bf = BloomFilter(m=1 << 10, k=3, hasher="md5")
        eng = bf._positions(vals)
        con = duckdb.connect()
        for j, v in enumerate(vals):
            rows = con.execute(
                """
                SELECT (((('0x'||substr(md5(?),1,16))::UBIGINT % 1024)::BIGINT
                       + i.i * ((('0x'||substr(md5(?),17,16))::UBIGINT % 1024)::BIGINT)) % 1024)
                FROM (SELECT unnest(range(3)) AS i) i ORDER BY i.i
                """,
                [v, v],
            ).fetchall()
            assert [r[0] for r in rows] == list(eng[:, j])

    def test_dataset_build_matches_local(self, ray_session):
        from ocr_endpoint_project_ray.functions.sketch import (
            BloomFilter,
            bloom_from_dataset,
        )

        vals = [f"v{i}" for i in range(500)] + [None]
        ds = ray.data.from_arrow(
            pa.table({"s": pa.array(vals, pa.string())})
        ).repartition(num_blocks=7)
        dist = bloom_from_dataset(ds, "s", m=1 << 12, k=3)
        local = BloomFilter(m=1 << 12, k=3).add_many([v for v in vals if v is not None])
        assert np.array_equal(dist.bits, local.bits)

    def test_view_is_zero_copy_and_immutable(self):
        import pytest as _pytest

        from ocr_endpoint_project_ray.functions.sketch import BloomFilter

        bf = BloomFilter(m=1 << 10, k=2, hasher="md5").add_many(["a b", "c d"])
        v = BloomFilter.view(bf.serialize(), 1 << 10, 2, "md5")
        assert v.contains_many(["a b", "c d"]).all()
        assert not v.bits.flags.writeable  # np.frombuffer view, no copy
        # np.bitwise_or.at ignores the writeable flag (it would scribble on
        # a shared plasma buffer) — add_many must refuse explicitly
        with _pytest.raises(ValueError):
            v.add_many(["x"])
        # merge TARGET must also refuse (plain |= respects the flag)
        with _pytest.raises(ValueError):
            v.merge(bf)
