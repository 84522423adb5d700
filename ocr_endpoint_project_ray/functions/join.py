"""Joins: broadcast small-side equi-join (the engine's default) and a thin
wrapper over Ray's distributed hash join for large×large.

Every join in the reference is a filename-stem lookup against a small fixture
set (SURVEY.md §2.8) — a broadcast join. We ``ray.put`` the small side ONCE
and build the hash index ONCE PER WORKER PROCESS (not per batch, not per
task), then map it over batches with a vectorized pandas ``.map``.

The stage is TASK-based, not an actor pool: operator fusion folds the whole
upstream stateless map chain into a class-based stage, making the pool size
the fused chain's concurrency ceiling (the round-1 measured fusion trap,
~4× throughput on fused chains). The index cache lives in the worker
process and is keyed by the object ref, so warm workers pay the build once.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..context import default_num_partitions

#: Per-worker-process broadcast-index cache: ref hex → (maps, types, key_set).
#: Bounded: cleared when it outgrows a handful of concurrent joins.
_JOIN_INDEX_CACHE: dict[str, tuple] = {}


def _get_join_index(small_ref, right_on: str, value_cols: list[str]):
    key = small_ref.hex()
    if key not in _JOIN_INDEX_CACHE:
        if len(_JOIN_INDEX_CACHE) > 8:
            _JOIN_INDEX_CACHE.clear()
        small: pa.Table = ray.get(small_ref)  # zero-copy from object store
        keys = small.column(right_on).to_pandas()
        maps = {
            c: pd.Series(small.column(c).to_pandas().values, index=keys) for c in value_cols
        }
        types = {c: small.schema.field(c).type for c in value_cols}
        _JOIN_INDEX_CACHE[key] = (maps, types, set(keys))
    return _JOIN_INDEX_CACHE[key]


def _broadcast_join_batch(
    batch: pa.Table, small_ref, left_on: str, right_on: str, value_cols: list[str], how: str
) -> pa.Table:
    maps, types, key_set = _get_join_index(small_ref, right_on, value_cols)
    keys = batch.column(left_on).to_pandas()
    if how == "inner":
        # filter FIRST so every mapped key hits — no NaN fill, and the
        # appended columns keep the small side's exact Arrow type in
        # every block (pandas .map would silently promote int64→float64
        # in blocks containing misses, yielding inconsistent schemas)
        mask = keys.isin(key_set).values
        batch = batch.filter(pa.array(mask))
        keys = keys[mask]
    for c, mapping in maps.items():
        mapped = keys.map(mapping)
        # vectorized conversion pinning the small side's Arrow type:
        # NaN→null, lossless cast back from pandas' float promotion
        batch = batch.append_column(c, pa.Array.from_pandas(mapped, type=types[c]))
    return batch


def broadcast_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    *,
    left_on: str,
    right_on: str,
    value_cols: list[str] | None = None,
    how: str = "inner",
    concurrency=None,  # retained for API compat; task-based stage scales with blocks
) -> ray.data.Dataset:
    """Join a Dataset against a small in-memory Arrow table without a shuffle.

    The small side is put in the object store once; every worker process
    reads it zero-copy and indexes it once (cached by ref). Use for
    dimension tables up to ~100s of MB per node; beyond that use
    :func:`hash_join`.
    """
    if value_cols is None:
        value_cols = [c for c in small.column_names if c != right_on]
    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join supports inner/left, got {how}")
    # A null key never equals any probe key (SQL equality), and duplicate
    # NaNs would make the pd.Series index ambiguous — drop null-key rows.
    if small.column(right_on).null_count:
        small = small.filter(pc.is_valid(small.column(right_on)))
    # 1:N small sides would make the pd.Series key index ambiguous and raise
    # InvalidIndexError deep inside a Ray task — fail fast with a clear error.
    n_distinct = len(pc.unique(small.column(right_on)))
    if n_distinct != small.num_rows:
        raise ValueError(
            f"broadcast_join small side has duplicate keys in {right_on!r} "
            f"({small.num_rows - n_distinct} dups); dedup the dimension table or use hash_join"
        )
    ref = ray.put(small)
    return ds.map_batches(
        _broadcast_join_batch,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
        fn_kwargs={
            "small_ref": ref,
            "left_on": left_on,
            "right_on": right_on,
            "value_cols": value_cols,
            "how": how,
        },
    )


def broadcast_range_join(
    ds: ray.data.Dataset,
    bands: pa.Table,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    label_col: str,
    out_col: str | None = None,
) -> ray.data.Dataset:
    """Range join against a small, non-overlapping band table
    (``lo <= value < hi``), broadcast once and resolved per batch with a
    vectorized ``np.searchsorted`` — no shuffle, no per-row loop. Values
    outside every band get null. Bands must be sorted, non-overlapping
    (validated once)."""
    import numpy as np

    out_col = out_col or label_col
    if bands.num_rows == 0:
        raise ValueError("bands table is empty; range join needs at least one band")
    label_type = bands.schema.field(label_col).type
    los = np.asarray(bands.column(lo_col).to_pylist(), dtype=np.float64)
    his = np.asarray(bands.column(hi_col).to_pylist(), dtype=np.float64)
    labels = bands.column(label_col).to_pylist()
    order = np.argsort(los)
    los, his = los[order], his[order]
    labels_arr = np.asarray([labels[i] for i in order], dtype=object)
    if np.any(los[1:] < his[:-1]):
        raise ValueError("bands overlap; range join requires disjoint bands")
    ref = ray.put((los, his, labels_arr))

    def _band(batch: pa.Table) -> pa.Table:
        los_, his_, labels_ = ray.get(ref)
        v = batch.column(value_col).combine_chunks().to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los_, v, side="right") - 1
        clipped = np.clip(idx, 0, len(his_) - 1)
        valid = (idx >= 0) & (v < his_[clipped])
        # fully vectorized label scatter; None where no band matched
        out = np.where(valid, labels_[clipped], None)
        return batch.append_column(out_col, pa.array(out, type=label_type))

    return ds.map_batches(_band, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def anti_join_auto(
    left: ray.data.Dataset,
    right_keys: ray.data.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    max_broadcast_rows: int = 2_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Anti join (left rows whose key appears nowhere in ``right_keys``),
    size-dispatched like ``grouped_agg(small_groups=...)``:

    - probe the right side with a LIMIT-bounded scan; if its key set fits
      (≤ ``max_broadcast_rows``, ~16 MB of int64 at the default), broadcast
      the deduped keys once and anti-filter every batch with a vectorized
      ``is_in`` — no shuffle, no aggregator-actor pool (the pool startup is
      the latency floor on small queries: measured 0.6 s vs 5.2 s at sf0.1);
    - otherwise fall back to the distributed ``left_anti`` hash join, whose
      memory stays bounded per partition at any scale.

    The probe executes the right-side pipeline once; above the threshold
    that partial scan is discarded and the join re-executes it — a bounded
    toll paid only on the path where the join itself dwarfs it. Left rows
    with a null key are always kept (SQL anti-join semantics: null equals
    nothing).
    """
    right_on = right_on or on
    # iter_batches keeps native Arrow types (to_pandas would promote a
    # nullable int64 key to float64 and silently break is_in matching) and
    # yields nothing for an empty right side — no exception-based control
    # flow, so a REAL right-pipeline failure propagates instead of being
    # mistaken for "empty" (Ray re-raises task errors as subclasses of the
    # original type, so catching ValueError here would turn a cast/schema
    # bug into a silent unfiltered result).
    batches = list(
        right_keys.limit(max_broadcast_rows + 1).iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    )
    if not batches:  # empty right side → nothing to remove
        return left
    probe = pa.concat_tables(batches)
    if probe.num_rows <= max_broadcast_rows:
        keys = pc.unique(pc.drop_null(probe.column(right_on)))
        keys_ref = ray.put(keys)

        def _anti(batch: pa.Table) -> pa.Table:
            value_set = ray.get(keys_ref)  # zero-copy from local plasma
            mask_in = pc.fill_null(pc.is_in(batch.column(on), value_set=value_set), False)
            return batch.filter(pc.invert(mask_in))

        return left.map_batches(
            _anti, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
    return hash_join(
        left, right_keys, on=on, right_on=right_on,
        join_type="left_anti", num_partitions=num_partitions,
    )


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str | tuple[str, ...],
    right_on: str | tuple[str, ...] | None = None,
    join_type: str = "inner",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Large×large distributed hash join (both sides shuffle by key).

    The Join operator spawns one aggregator actor per partition, so the
    default is deliberately conservative (≤16 on a single node — 64 actors
    at 32 CPUs is startup-bound and measured to stall a query sweep); at
    multi-node scale pass an explicit ``num_partitions`` sized to the
    cluster so per-partition memory stays bounded."""
    on = (on,) if isinstance(on, str) else tuple(on)
    right_on = (right_on,) if isinstance(right_on, str) else (tuple(right_on) if right_on else None)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions or min(default_num_partitions(per_cpu=1), 16),
        on=on,
        right_on=right_on,
    )
