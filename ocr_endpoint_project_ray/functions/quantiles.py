"""Exact grouped quantiles with bounded per-block memory: histogram + refine.

``quantile_cont`` does not decompose into mergeable partials, and the former
q34 kernel co-located each whole group in one block (the r2 verdict's
scale-killer: with ~5 event types one task held ~1/5 of the dataset). This
operator never holds a group anywhere: each scan pass keeps O(groups ×
quantiles × bins) integers per block, the driver keeps the same, and the only
raw values ever collected are the ≤ ``collect_cap`` candidates that remain
inside each task's refined interval.

Algorithm (per (group, order-statistic-rank) task):

1. One scan computes per-group ``(n_nonnull, min, max)``; each quantile q
   needs the order statistics ``floor(h)`` / ``ceil(h)`` with
   ``h = q * (n - 1)`` (deduped per group → one task per distinct rank).
2. Refine passes: for a task's candidate interval ``[lo, hi]``, every block
   counts its group's values strictly below ``lo`` and histograms the rest
   over ``bins`` half-open equal-width cells plus one point cell for
   ``v == hi``. Membership and below-counts are recomputed from the data by
   plain value comparison each pass (``np.searchsorted`` against the edge
   array), so there is no cross-pass float-boundary bookkeeping to get
   wrong. The driver sums the partials and narrows the interval to the cell
   holding the target rank; a cell one representable double wide IS the
   answer. If equal-width edges fail to shrink the interval (a duplicate
   mass a few ulps wide), the next pass steps edges by ``np.nextafter`` so
   progress is guaranteed in representable-double count.
3. One collect scan gathers the ≤ ``collect_cap`` values remaining in each
   unresolved task's interval; the rank's value is read off the sorted
   candidates at offset ``rank - below``, and quantiles interpolate in
   DuckDB's exact operation order (``quantile_cont_sorted``).

Scale notes: the input projection is materialized once (two pruned columns)
so the 2–4 total passes re-scan object-store blocks instead of re-reading
parquet; group CARDINALITY must be driver-bounded (the control state is per
group × quantile) while group SIZE is unbounded — the complement of
``functions.sketch.approx_quantiles``, which handles unbounded cardinality
approximately. Nulls are ignored per SQL semantics; genuine float NaN is a
VALUE that sorts greatest (Arrow/DuckDB float ordering): ranks falling in
the NaN tail resolve to NaN by rank arithmetic without ever binning a NaN
(DuckDB's own quantile_cont NaN results are irregular — e.g. q=2/3 over
[1,2,3,NaN] returns NaN though rank 2 is finite — so exact NaN parity is a
non-goal; parity stays bit-exact on NaN-free data). Null-only groups yield
NULL (the engine's events data carries no NaNs).

Reference analogue: the describe/percentile reporting in
``scripts/generate_decision_report.py:442-447`` (driver-side pandas there).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .agg import quantile_cont_sorted

__all__ = ["grouped_quantiles_exact"]


def _group_mask(batch: pa.Table, keys: list[str], kv: tuple) -> pa.ChunkedArray:
    mask = None
    for col_name, v in zip(keys, kv):
        col = batch.column(col_name)
        m = pc.is_null(col) if v is None else pc.equal(col, v)
        mask = m if mask is None else pc.and_kleene(mask, m)
    return pc.coalesce(mask, False)


def _group_values(batch: pa.Table, keys: list[str], value_col: str, kv: tuple) -> np.ndarray:
    """FINITE values of a group: nulls dropped (SQL) and NaN dropped — NaN
    sorts GREATEST (Arrow/DuckDB float ordering), so the NaN tail is handled
    by rank arithmetic (ranks ≥ n_finite resolve to NaN), never binned."""
    vals = batch.column(value_col).filter(_group_mask(batch, keys, kv))
    v = np.asarray(vals.drop_null())
    return v[~np.isnan(v)] if v.dtype.kind == "f" else v


def _block_groups(batch: pa.Table, keys: list[str]) -> list[tuple]:
    """Distinct key tuples present in a block (NaN-normalized to None)."""
    import pandas as pd

    out = []
    for kv, _ in batch.select(keys).to_pandas().groupby(keys, sort=False, dropna=False):
        kv = kv if isinstance(kv, tuple) else (kv,)
        out.append(tuple(None if pd.isna(v) else v for v in kv))
    return out


def _stats_pass(ds: ray.data.Dataset, keys: list[str], value_col: str) -> dict[tuple, tuple]:
    """Per-group (n_nonnull, min, max) via per-block partials + driver sum.

    Key values travel as REAL typed Arrow columns (one per key), not a
    stringified tuple — a repr()/literal_eval round-trip crashes for any
    key type whose repr is not a Python literal (timestamps, decimals,
    numpy>=2 scalars). ``take_all`` hands back Python-native scalars, which
    hash-compare equal to the pandas/numpy scalars ``_block_groups`` yields
    inside the later passes (int/float/str/Timestamp all do)."""

    def _partial(batch: pa.Table) -> pa.Table:
        kv_rows, n_rows, nan_rows, mins, maxs = [], [], [], [], []
        for kv in _block_groups(batch, keys):
            # one mask + one filter per group; the finite array derives
            # from the nonnull values (re-calling _group_values would
            # rebuild the identical mask and filter)
            mask = _group_mask(batch, keys, kv)
            nonnull = np.asarray(
                batch.column(value_col).filter(mask).drop_null()
            )
            v = nonnull[~np.isnan(nonnull)] if nonnull.dtype.kind == "f" else nonnull
            kv_rows.append(kv)
            n_rows.append(len(nonnull))
            nan_rows.append(len(nonnull) - len(v))
            mins.append(float(v.min()) if len(v) else np.inf)
            maxs.append(float(v.max()) if len(v) else -np.inf)
        cols: dict[str, pa.Array] = {
            f"__k{i}": pa.array(
                [kv[i] for kv in kv_rows], type=batch.schema.field(k).type
            )
            for i, k in enumerate(keys)
        }
        cols["__n"] = pa.array(n_rows, pa.int64())
        cols["__nnan"] = pa.array(nan_rows, pa.int64())
        cols["__min"] = pa.array(mins, pa.float64())
        cols["__max"] = pa.array(maxs, pa.float64())
        return pa.table(cols)

    stats: dict[tuple, list] = {}
    for row in ds.map_batches(
        _partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        kv = tuple(row[f"__k{i}"] for i in range(len(keys)))
        cur = stats.setdefault(kv, [0, 0, np.inf, -np.inf])
        cur[0] += row["__n"]
        cur[1] += row["__nnan"]
        cur[2] = min(cur[2], row["__min"])
        cur[3] = max(cur[3], row["__max"])
    return {kv: tuple(c) for kv, c in stats.items()}


def _hist_pass(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    tasks: dict[int, dict],
) -> dict[int, tuple[int, np.ndarray]]:
    """One scan: per task, (count below lo, histogram over the task's edges).

    Cell j < len(edges)-1 counts ``edges[j] <= v < edges[j+1]``; the final
    cell is the point ``v == hi``. All assignment is by comparison against
    the edge array (searchsorted), never by float bin arithmetic, so the
    below/inside bookkeeping is exactly consistent across passes.
    """
    by_group: dict[tuple, list[tuple[int, np.ndarray, float]]] = {}
    for tid, t in tasks.items():
        by_group.setdefault(t["kv"], []).append((tid, t["edges"], t["hi"]))

    def _partial(batch: pa.Table) -> pa.Table:
        tids, belows, hists = [], [], []
        present = set(_block_groups(batch, keys))
        for kv, group_tasks in by_group.items():
            if kv not in present:
                continue
            v = _group_values(batch, keys, value_col, kv)
            for tid, edges, hi in group_tasks:
                idx = np.searchsorted(edges, v, side="right")
                inside = (idx > 0) & (v <= hi)
                tids.append(tid)
                belows.append(int(np.count_nonzero(idx == 0)))
                hists.append(np.bincount(idx[inside] - 1, minlength=len(edges)).tolist())
        return pa.table(
            {
                "__tid": pa.array(tids, pa.int64()),
                "__below": pa.array(belows, pa.int64()),
                "__hist": pa.array(hists, pa.list_(pa.int64())),
            }
        )

    acc: dict[int, tuple[int, np.ndarray]] = {
        tid: (0, np.zeros(len(t["edges"]), np.int64)) for tid, t in tasks.items()
    }
    for row in ds.map_batches(
        _partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        below, hist = acc[row["__tid"]]
        acc[row["__tid"]] = (below + row["__below"], hist + np.asarray(row["__hist"], np.int64))
    return acc


def _collect_pass(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    tasks: dict[int, dict],
) -> dict[int, np.ndarray]:
    """One scan gathering each resolved task's ≤collect_cap candidate values."""
    by_group: dict[tuple, list[tuple[int, float, float]]] = {}
    for tid, t in tasks.items():
        by_group.setdefault(t["kv"], []).append((tid, t["lo"], t["hi"]))

    def _partial(batch: pa.Table) -> pa.Table:
        tids, vals = [], []
        present = set(_block_groups(batch, keys))
        for kv, group_tasks in by_group.items():
            if kv not in present:
                continue
            v = _group_values(batch, keys, value_col, kv)
            for tid, lo, hi in group_tasks:
                hit = v[(v >= lo) & (v <= hi)]
                if len(hit):
                    tids.append(tid)
                    vals.append(hit.tolist())
        return pa.table(
            {
                "__tid": pa.array(tids, pa.int64()),
                "__vals": pa.array(vals, pa.list_(pa.float64())),
            }
        )

    out: dict[int, list[float]] = {tid: [] for tid in tasks}
    for row in ds.map_batches(
        _partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    ).take_all():
        out[row["__tid"]].extend(row["__vals"])
    return {tid: np.sort(np.asarray(v, np.float64)) for tid, v in out.items()}


def _edges_for(lo: float, hi: float, bins: int, *, ulp_step: bool) -> np.ndarray:
    if ulp_step:
        # One representable double per cell: guaranteed progress when the
        # interval is a few ulps wide and equal-width edges collapse.
        e = [lo]
        while e[-1] < hi and len(e) < bins + 1:
            e.append(float(np.nextafter(e[-1], np.inf)))
        if e[-1] < hi:
            e.append(hi)
        return np.asarray(e, np.float64)
    e = np.linspace(lo, hi, bins + 1)
    e[0], e[-1] = lo, hi
    return e


def grouped_quantiles_exact(
    ds: ray.data.Dataset,
    keys: list[str],
    value_col: str,
    qs: dict[str, float],
    *,
    bins: int = 128,
    collect_cap: int = 4096,
    num_partitions: int | None = None,  # noqa: ARG001 — API parity with approx_quantiles
    max_passes: int = 128,
) -> pa.Table:
    """Exact per-group ``quantile_cont`` matching DuckDB bit-for-bit, with no
    block ever holding a whole group. See the module docstring for the
    algorithm; ``num_partitions`` is accepted for signature parity with
    ``approx_quantiles`` (the reduce here is the driver's O(groups × bins)
    partial sum, not a keyed shuffle)."""
    key_types = {f.name: f.type for f in ds.schema().base_schema}
    proj = ds.map_batches(
        lambda b: b.select(keys + [value_col]).set_column(
            len(keys), value_col, b.column(value_col).cast(pa.float64())
        ),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    stats = _stats_pass(proj, keys, value_col)

    # One task per (group, distinct order-statistic rank).
    tasks: dict[int, dict] = {}
    rank_tid: dict[tuple, dict[int, int]] = {}  # kv -> rank -> tid
    resolved: dict[int, float] = {}
    next_tid = 0
    for kv, (n, nnan, mn, mx) in stats.items():
        rank_tid[kv] = {}
        if n == 0:
            continue
        nf = n - nnan  # finite count; ranks nf..n-1 are the NaN tail
        need: set[int] = set()
        for q in qs.values():
            h = q * (n - 1)
            lo_k = int(np.floor(h))
            need.add(lo_k)
            if h != lo_k:  # integer rank needs no upper neighbor (frac==0
                # short-circuits the interpolation — a refined value there
                # would be provably dead work)
                need.add(min(lo_k + 1, n - 1))
        for k in sorted(need):
            tid, next_tid = next_tid, next_tid + 1
            rank_tid[kv][k] = tid
            if k >= nf:
                # NaN sorts greatest: any rank inside the NaN tail IS NaN
                resolved[tid] = float("nan")
            elif mn == mx:
                resolved[tid] = mn
            else:
                tasks[tid] = {
                    "kv": kv,
                    "k": k,
                    "lo": mn,
                    "hi": mx,
                    "edges": _edges_for(mn, mx, bins, ulp_step=False),
                }

    to_collect: dict[int, dict] = {}
    passes = 0
    while tasks:
        passes += 1
        if passes > max_passes:  # pragma: no cover — ulp stepping guarantees progress
            raise RuntimeError(f"quantile refinement did not converge in {max_passes} passes")
        counts = _hist_pass(proj, keys, value_col, tasks)
        still: dict[int, dict] = {}
        for tid, t in tasks.items():
            below, hist = counts[tid]
            if int(hist.sum()) <= collect_cap:
                to_collect[tid] = {"kv": t["kv"], "k": t["k"], "lo": t["lo"], "hi": t["hi"], "below": below}
                continue
            edges = t["edges"]
            cum = below + np.cumsum(hist)
            j = int(np.searchsorted(cum, t["k"], side="right"))
            if j >= len(edges) - 1:
                resolved[tid] = t["hi"]  # the point cell v == hi
                continue
            new_lo, new_hi = float(edges[j]), float(edges[j + 1])
            if float(np.nextafter(new_lo, np.inf)) >= new_hi:
                # Half-open single-double cell: every member equals new_lo.
                resolved[tid] = new_lo
                continue
            no_shrink = new_lo == t["lo"] and new_hi == t["hi"]
            still[tid] = {
                "kv": t["kv"],
                "k": t["k"],
                "lo": new_lo,
                "hi": new_hi,
                "edges": _edges_for(new_lo, new_hi, bins, ulp_step=no_shrink),
            }
        tasks = still

    if to_collect:
        gathered = _collect_pass(proj, keys, value_col, to_collect)
        for tid, meta in to_collect.items():
            resolved[tid] = float(gathered[tid][meta["k"] - meta["below"]])

    # Assemble: one row per group, DuckDB interpolation op order.
    kvs = sorted(stats.keys(), key=lambda kv: tuple((v is None, v) for v in kv))
    cols: dict[str, list] = {k: [] for k in keys}
    qcols: dict[str, list] = {name: [] for name in qs}
    for kv in kvs:
        n = stats[kv][0]
        for k_name, v in zip(keys, kv):
            cols[k_name].append(v)
        for name, q in qs.items():
            if n == 0:
                qcols[name].append(None)
                continue
            h = q * (n - 1)
            lo_k = int(np.floor(h))
            if h == lo_k:
                qcols[name].append(resolved[rank_tid[kv][lo_k]])
                continue
            hi_k = min(lo_k + 1, n - 1)
            seg = [resolved[rank_tid[kv][lo_k]], resolved[rank_tid[kv][hi_k]]]
            qcols[name].append(quantile_cont_sorted(seg, h - lo_k))
    out = {k: pa.array(cols[k], type=key_types[k]) for k in keys}
    for name in qs:
        out[name] = pa.array(qcols[name], pa.float64())
    return pa.table(out)
