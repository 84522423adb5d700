"""Grouped aggregation with map-side partial aggregation (combiners).

``ds.groupby(k).aggregate(...)`` shuffles every row. For the grouped
reductions the reference runs (per-model means/sums/counts — SURVEY.md §2.6
A1-A5) the group cardinality is tiny relative to the data, so we combine
inside ``map_batches`` first (pyarrow ``Table.group_by`` per batch — pure
Arrow, no Python rows), then shuffle only the partials. At 100 TB this turns
an all-to-all of N rows into one of ``n_blocks × n_groups`` rows.

Supported kinds: sum, count (non-null), count_rows, min, max, mean
(sum+count carried through the shuffle and finished after).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import default_keyed_partitions


@dataclass(frozen=True)
class Agg:
    """One output aggregate: ``out`` = ``kind``(``col``).

    ``sum_round``: for ``mean`` over decimal-quantized data, round the sum to
    this many digits before dividing. Rounding at the quantization level
    recovers the exact decimal sum on every engine (summation-order ulp noise
    is far below half a quantum), so ``round(sum)/count`` is bit-identical to
    a SQL oracle computing the same — whereas rounding the *mean* lands on
    knife edges whenever the true mean sits exactly on the rounding grid.
    """

    out: str
    col: str | None  # None allowed for count_rows
    kind: str  # sum | count | count_rows | min | max | mean
    sum_round: int | None = None

    def __post_init__(self):
        if self.kind not in ("sum", "count", "count_rows", "min", "max", "mean"):
            raise ValueError(f"unknown agg kind: {self.kind}")


_ONE = "__ones"


def _partial_specs(aggs: list[Agg]) -> list[tuple[str, str, str]]:
    """(source_col, pa_agg, internal_name) for the per-batch combine."""
    specs: dict[str, tuple[str, str, str]] = {}
    for a in aggs:
        if a.kind in ("sum", "min", "max"):
            specs[f"{a.col}__{a.kind}"] = (a.col, a.kind, f"{a.col}__{a.kind}")
        elif a.kind == "count":
            specs[f"{a.col}__count"] = (a.col, "count", f"{a.col}__count")
        elif a.kind == "count_rows":
            specs[f"{_ONE}__sum"] = (_ONE, "sum", f"{_ONE}__sum")
        elif a.kind == "mean":
            specs[f"{a.col}__sum"] = (a.col, "sum", f"{a.col}__sum")
            specs[f"{a.col}__count"] = (a.col, "count", f"{a.col}__count")
    return list(specs.values())


def _partial_batch(batch: pa.Table, keys: list[str], aggs: list[Agg]) -> pa.Table:
    needs_ones = any(a.kind == "count_rows" for a in aggs)
    if needs_ones:
        batch = batch.append_column(_ONE, pa.array([1] * batch.num_rows, pa.int64()))
    specs = _partial_specs(aggs)
    gb = batch.group_by(keys, use_threads=False)
    result = gb.aggregate([(col, kind) for col, kind, _ in specs])
    # pyarrow names outputs f"{col}_{kind}"; rename to our internal names
    rename = {f"{col}_{kind}": name for col, kind, name in specs}
    return result.rename_columns([rename.get(c, c) for c in result.column_names])


def _finalize_batch(batch: pa.Table, keys: list[str], aggs: list[Agg]) -> pa.Table:
    """Combine partials (itself a grouped reduce: sums add, counts add, min
    of mins, max of maxes) then compute the requested outputs."""
    combine: list[tuple[str, str]] = []
    seen = set()
    for col, kind, name in _partial_specs(aggs):
        comb = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}[kind]
        if name not in seen:
            combine.append((name, comb))
            seen.add(name)
    gb = batch.group_by(keys, use_threads=False)
    combined = gb.aggregate(combine)
    rename = {f"{name}_{comb}": name for name, comb in combine}
    combined = combined.rename_columns([rename.get(c, c) for c in combined.column_names])

    cols: dict[str, pa.ChunkedArray | pa.Array] = {k: combined.column(k) for k in keys}
    for a in aggs:
        if a.kind in ("sum", "min", "max"):
            cols[a.out] = combined.column(f"{a.col}__{a.kind}")
        elif a.kind == "count":
            cols[a.out] = combined.column(f"{a.col}__count")
        elif a.kind == "count_rows":
            cols[a.out] = combined.column(f"{_ONE}__sum")
        elif a.kind == "mean":
            s = pc.cast(combined.column(f"{a.col}__sum"), pa.float64())
            if a.sum_round is not None:
                s = py_round_array(s, a.sum_round)
            c = pc.cast(combined.column(f"{a.col}__count"), pa.float64())
            cols[a.out] = pc.divide(s, c)
    return pa.table(cols)


def grouped_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    aggs: list[Agg],
    *,
    num_partitions: int | None = None,
    small_groups: bool = False,
) -> ray.data.Dataset:
    """Distributed grouped aggregation with per-batch combining.

    map_batches(partial per-block combine) → repartition of the (small)
    partials → per-block finalize. The finalize is correct because the
    repartition co-locates every partial of a key in one block.

    ``small_groups=True``: the caller asserts the group cardinality is
    bounded and small (≲10k — e.g. statuses, languages, priorities). The
    partials (n_blocks × n_groups rows) then coalesce to ONE block via the
    split-based repartition instead of a keyed hash shuffle — skipping the
    per-query aggregator-actor pool whose startup dominates small grouped
    queries (measured 6.2 s → 1.8 s warm at 32 CPUs). Leave False for
    unbounded keys (per-customer, vocabulary): those need the keyed
    partitioning to bound per-block group size.
    """
    n = num_partitions or default_keyed_partitions()
    partials = ds.map_batches(
        _partial_batch,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"keys": keys, "aggs": aggs},
    )
    if small_groups:
        co = partials.repartition(num_blocks=1)
    else:
        co = partials.repartition(num_blocks=n, keys=keys)
    return co.map_batches(
        _finalize_batch,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"keys": keys, "aggs": aggs},
    )


def py_round_array(col: pa.ChunkedArray | pa.Array, ndigits: int) -> pa.Array:
    """Round to the nearest double of the decimal result, like SQL engines.

    NOT ``pc.round``: pyarrow rounds in binary (x·10^d, round, /10^d), which
    can return a double one ulp away from what DuckDB's decimal-correct
    rounding produces — enough to flip an exact value-hash. Python's
    ``round`` uses correctly-rounded decimal conversion and matches."""
    return pa.array(
        [None if v is None else round(v, ndigits) for v in col.to_pylist()], pa.float64()
    )


def round_columns(ds: ray.data.Dataset, cols: list[str], ndigits: int) -> ray.data.Dataset:
    """Round float columns (stabilizes value-hash comparison vs SQL oracles:
    both sides round, so summation-order ulp noise can't flip the hash).
    Apply to post-aggregation outputs (small row counts)."""

    def _round(batch: pa.Table) -> pa.Table:
        for c in cols:
            if c in batch.column_names:
                i = batch.schema.get_field_index(c)
                batch = batch.set_column(i, c, py_round_array(batch.column(c), ndigits))
        return batch

    return ds.map_batches(_round, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def quantile_cont_sorted(sorted_seg, q: float) -> float:
    """SQL ``quantile_cont`` over an already-sorted numpy segment, in
    DuckDB's exact operation order: ``(1-frac)*lower + frac*upper``.
    (``np.percentile``'s algebraically-equal expression differs by an ulp,
    which an exact value-hash comparison notices.) Shared by the q34/q40
    per-group kernels and property-tested against DuckDB."""
    import numpy as np

    h = q * (len(sorted_seg) - 1)
    lo = int(np.floor(h))
    frac = h - lo
    hi = min(lo + 1, len(sorted_seg) - 1)
    if frac == 0:
        # identical to the interpolation for finite neighbors (0*finite=0),
        # but keeps an integer-index quantile finite when the upper
        # neighbor is the NaN tail (0*NaN would poison it)
        return float(sorted_seg[lo])
    return float((1 - frac) * sorted_seg[lo] + frac * sorted_seg[hi])
