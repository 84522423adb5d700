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


def _asof_block(batch: pa.Table, key: str, out_col: str) -> pa.Table:
    if batch.num_rows == 0:
        return pa.table(
            {
                key: pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                out_col: pa.array([], pa.timestamp("us")),
            }
        )
    # views (right side, is_left=0) sort before purchases at equal ts so <=
    # semantics fall out of the forward-fill
    batch = batch.take(
        pc.sort_indices(
            batch,
            sort_keys=[
                (key, "ascending"),
                ("ts", "ascending"),
                ("is_left", "ascending"),
                ("event_id", "ascending"),
            ],
        )
    )
    keys = batch.column(key).combine_chunks().to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    is_left = batch.column("is_left").combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
    ids = batch.column("event_id").combine_chunks().to_numpy(zero_copy_only=False)
    n = len(keys)
    arange = np.arange(n)
    new_key = np.concatenate(([True], keys[1:] != keys[:-1]))
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
