"""As-of join — a custom operator Ray Data lacks (SURVEY.md custom-op rule).

For each left row ``(key, ts)``, find the latest right row with the same key
and ``right.ts <= left.ts``. Composition: tag both sides, union, **keyed hash
repartition on the join key**, then a per-block vectorized
sort + forward-fill. Partitioning assumption: all rows of one key co-located
(guaranteed by the keyed repartition); within a block everything is numpy.

Tie semantics: a right row at exactly ``left.ts`` qualifies (<=); among
right rows sharing the qualifying timestamp the *timestamp* is the output,
so exact-ts duplicates are unambiguous.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import default_num_partitions, ensure_hash_shuffle


def _asof_block(batch: pa.Table, key: str, out_col: str, bucket_col: str | None = None) -> pa.Table:
    if batch.num_rows == 0 or key not in batch.column_names:
        return pa.table(
            {
                key: pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                out_col: pa.array([], pa.timestamp("us")),
            }
        )
    # views (right side, is_left=0) sort before purchases at equal ts so <=
    # semantics fall out of the forward-fill
    group_keys = [(key, "ascending")] + (
        [(bucket_col, "ascending")] if bucket_col else []
    )
    batch = batch.take(
        pc.sort_indices(
            batch,
            sort_keys=group_keys
            + [
                ("ts", "ascending"),
                ("is_left", "ascending"),
                ("event_id", "ascending"),
            ],
        )
    )
    keys = batch.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    if bucket_col is not None:
        # composite group boundary: forward-fill must reset at bucket edges
        # (each bucket carries its own best-before synthetic right row)
        buckets = batch.column(bucket_col).combine_chunks().to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    is_left = batch.column("is_left").combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
    ids = batch.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
    n = len(keys)
    arange = np.arange(n)
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
    if bucket_col is not None:
        new_key |= np.concatenate(([True], buckets[1:] != buckets[:-1]))
    key_start = np.maximum.accumulate(np.where(new_key, arange, 0))
    right_pos = np.where(~is_left, arange, -1)
    last_right = np.maximum.accumulate(right_pos)
    valid = (last_right >= key_start) & is_left
    matched_ts = np.where(valid, ts[np.clip(last_right, 0, n - 1)], 0)

    left_mask = is_left
    out_ts = pa.array(matched_ts[left_mask], pa.int64()).cast(pa.timestamp("us"))
    out_ts = pc.if_else(pa.array(valid[left_mask]), out_ts, pa.scalar(None, pa.timestamp("us")))
    return pa.table(
        {
            key: pa.array(keys[left_mask]),
            "event_id": pa.array(ids[left_mask]),
            out_col: out_ts,
        }
    )


def asof_join_latest_ts(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    out_col: str = "asof_ts",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """For each left row, the latest right ``ts`` ≤ left ``ts`` per ``key``
    (null when none). Both inputs need columns (key, event_id, ts)."""
    ensure_hash_shuffle()
    n = num_partitions or default_num_partitions(per_cpu=1)

    def _tag(flag: int):
        def _f(b: pa.Table) -> pa.Table:
            return b.append_column("is_left", pa.array([flag] * b.num_rows, pa.int8()))

        return _f

    tagged = left.map_batches(_tag(1), batch_size=None, batch_format="pyarrow").union(
        right.map_batches(_tag(0), batch_size=None, batch_format="pyarrow")
    )
    co = tagged.repartition(num_blocks=n, keys=[key])
    return co.map_batches(
        _asof_block,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"key": key, "out_col": out_col},
    )


# ---------------------------------------------------------------------------
# Time-range-salted twin (mega-key strategy)
# ---------------------------------------------------------------------------


def asof_join_latest_ts_salted(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    span_us: int = 24 * 3_600_000_000,
    out_col: str = "asof_ts",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Skew-safe as-of join, partitioned on ``(key, ts // span_us)``.

    As-of lookback is UNBOUNDED (the latest right row may be arbitrarily far
    back), so unlike the rolling window a fixed context copy can't make each
    bucket self-contained. Instead a summary pre-pass makes it so:

    1. right side → per-(key, bucket) max ts (grouped combiner, tiny);
       left side → distinct (key, bucket) markers (per-block pre-dedup);
    2. summaries co-partition by key (SUMMARY-sized: ≤ #buckets rows per key,
       independent of event counts) and a running max emits one synthetic
       "best-before" right row per left bucket — the latest right ts from
       all strictly-earlier buckets;
    3. left + right + synthetic rows co-partition by (key, bucket) and the
       standard per-block forward-fill kernel runs with the group boundary
       extended to the bucket.

    Exact: within-bucket right rows and the best-before row together cover
    every candidate. Cost: each input is scanned twice (once for summaries,
    once for the join) — the salting tax, paid instead of an unbounded
    block. Output identical to :func:`asof_join_latest_ts` (property test
    with a 50 %-skew key in tests/test_skew_and_errors.py).
    """
    ensure_hash_shuffle()
    from ..functions.agg import Agg, grouped_agg
    from ..stages.dedup import keyed_latest

    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)
    n_small = min(n, 8)

    def _bucketed(ds: ray.data.Dataset, flag: int) -> ray.data.Dataset:
        def _f(b: pa.Table) -> pa.Table:
            ts = pc.cast(b.column("ts"), pa.int64())
            return pa.table(
                {
                    key: b.column(key),
                    "event_id": b.column("event_id"),
                    "ts": b.column("ts"),
                    "is_left": pa.array([flag] * b.num_rows, pa.int8()),
                    "bucket": pc.cast(pc.divide(ts, span_us), pa.int64()),
                }
            )

        return ds.map_batches(_f, batch_size=None, batch_format="pyarrow")

    # 1) summaries
    right_b = _bucketed(right, 0)
    right_max = grouped_agg(
        right_b.map_batches(
            lambda b: pa.table(
                {
                    key: b.column(key),
                    "bucket": b.column("bucket"),
                    "ts_i": pc.cast(b.column("ts"), pa.int64()),
                }
            )
            if key in b.column_names
            else pa.table({}),
            batch_size=None,
            batch_format="pyarrow",
        ),
        [key, "bucket"],
        [Agg("max_ts", "ts_i", "max")],
        num_partitions=n_small,
    ).map_batches(
        lambda b: b.append_column("kind", pa.array([1] * b.num_rows, pa.int8()))
        if b.num_rows
        else pa.table({}),
        batch_size=None,
        batch_format="pyarrow",
    )
    left_marks = keyed_latest(
        _bucketed(left, 1).drop_columns(["event_id", "ts", "is_left"]),
        [key, "bucket"],
        [],
        num_partitions=n_small,
    ).map_batches(
        lambda b: pa.table(
            {
                key: b.column(key),
                "bucket": b.column("bucket"),
                "max_ts": pa.array([None] * b.num_rows, pa.int64()),
                "kind": pa.array([0] * b.num_rows, pa.int8()),
            }
        )
        if b.num_rows and key in b.column_names
        else pa.table({}),
        batch_size=None,
        batch_format="pyarrow",
    )

    # 2) per-key running max over buckets → synthetic best-before rows
    def _best_before(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "is_left": pa.array([], pa.int8()),
                "bucket": pa.array([], pa.int64()),
            }
        )
        if b.num_rows == 0 or key not in b.column_names:
            return empty
        # left markers (kind 0) sort before right summaries (kind 1) within a
        # bucket, so a marker sees only strictly-earlier buckets' rights
        b = b.take(
            pc.sort_indices(
                b,
                sort_keys=[(key, "ascending"), ("bucket", "ascending"), ("kind", "ascending")],
            )
        )
        # Vectorized exclusive segmented running max (r4 verdict item 7 —
        # replaces the per-row Python walk): MIN is "no right seen yet";
        # prev[i] holds row i-1's contribution, reset at each key boundary,
        # and np.maximum.accumulate runs per key segment. int64 throughout —
        # no float round-trip for timestamps.
        ks = b.column(key).combine_chunks().to_numpy(zero_copy_only=False)
        buckets = b.column("bucket").combine_chunks().to_numpy(zero_copy_only=False)
        kinds = b.column("kind").combine_chunks().to_numpy(zero_copy_only=False)
        ts_min = np.iinfo(np.int64).min
        mx = (
            pc.fill_null(b.column("max_ts"), ts_min)
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
        )
        contrib = np.where(kinds == 1, mx, ts_min)
        n = len(ks)
        prev = np.concatenate(([ts_min], contrib[:-1]))
        starts = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        prev[starts] = ts_min
        run = np.empty_like(prev)
        bounds = np.concatenate((starts, [n]))
        for s, e in zip(bounds[:-1], bounds[1:]):  # O(#keys), vectorized inner
            np.maximum.accumulate(prev[s:e], out=run[s:e])
        keep = (kinds == 0) & (run != ts_min)
        return pa.table(
            {
                key: pa.array(ks[keep], pa.int64()),
                "event_id": pa.array(np.full(int(keep.sum()), -1, np.int64), pa.int64()),
                "ts": pa.array(run[keep], pa.int64()).cast(pa.timestamp("us")),
                "is_left": pa.array(np.zeros(int(keep.sum()), np.int8), pa.int8()),
                "bucket": pa.array(buckets[keep], pa.int64()),
            }
        )

    summaries = right_max.union(left_marks).repartition(num_blocks=n_small, keys=[key])
    synthetic = summaries.map_batches(_best_before, batch_size=None, batch_format="pyarrow")

    # 3) the join itself, grouped on (key, bucket)
    tagged = _bucketed(left, 1).union(_bucketed(right, 0)).union(synthetic)
    co = tagged.repartition(num_blocks=n, keys=[key, "bucket"])
    return co.map_batches(
        _asof_block,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"key": key, "out_col": out_col, "bucket_col": "bucket"},
    )
