"""Windowed operators over event streams.

Tumbling windows are a grouped aggregate on a truncated timestamp (see
``q11_hourly_events``). Session windows (gap-based) are genuinely not a
built-in Ray Data op — implemented here as the canonical custom-operator
composition: **keyed hash repartition on the session key + per-block
vectorized sessionization**.

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
all events of one ``user_id`` must be co-located in one block — guaranteed by
``repartition(keys=["user_id"])`` under the hash-shuffle strategy. Within the
block everything is numpy (no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..context import default_num_partitions, ensure_hash_shuffle
from ..functions.agg import py_round_array

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


def _sessionize_block(batch: pa.Table, gap_us: int = DEFAULT_GAP_US) -> pa.Table:
    if batch.num_rows == 0:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_ts": pa.array([], pa.timestamp("us")),
                "end_ts": pa.array([], pa.timestamp("us")),
                "sum_value": pa.array([], pa.float64()),
            }
        )
    batch = batch.take(
        pc.sort_indices(
            batch,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
    )
    users = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    values = batch.column("value").combine_chunks().to_numpy(zero_copy_only=False)
    n = len(users)

    new_user = np.concatenate(([True], users[1:] != users[:-1]))
    gap = np.concatenate(([True], (ts[1:] - ts[:-1]) > gap_us))
    is_start = new_user | gap
    # session ordinal per user: cumulative starts minus cumulative starts at
    # the user's first row (so each user restarts at 1)
    global_sid = np.cumsum(is_start)
    user_first_sid = np.maximum.accumulate(np.where(new_user, global_sid, 0))
    session_id = global_sid - user_first_sid + 1

    # per-(user, session) reduction via boundary segments
    starts_idx = np.nonzero(is_start)[0]
    ends_idx = np.concatenate((starts_idx[1:], [n]))
    counts = ends_idx - starts_idx
    sum_value = np.add.reduceat(values, starts_idx)
    return pa.table(
        {
            "user_id": pa.array(users[starts_idx], pa.int64()),
            "session_id": pa.array(session_id[starts_idx], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "start_ts": pa.array(ts[starts_idx], pa.int64()).cast(pa.timestamp("us")),
            "end_ts": pa.array(ts[ends_idx - 1], pa.int64()).cast(pa.timestamp("us")),
            "sum_value": py_round_array(pa.array(sum_value, pa.float64()), 2),
        }
    )


def sessionize(
    events: ray.data.Dataset,
    *,
    gap_us: int = DEFAULT_GAP_US,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Gap-based session windows per user: (user_id, session_id, n_events,
    start_ts, end_ts, sum_value)."""
    ensure_hash_shuffle()
    n = num_partitions or default_num_partitions(per_cpu=1)
    co = events.repartition(num_blocks=n, keys=["user_id"])
    return co.map_batches(
        _sessionize_block,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"gap_us": gap_us},
    )


# ---------------------------------------------------------------------------
# Sliding (RANGE-frame) windowed aggregate
# ---------------------------------------------------------------------------


def _rolling_block(batch: pa.Table, window_us: int) -> pa.Table:
    """Per-block kernel: rows co-located per user (keyed repartition);
    rolling count/sum over the SQL RANGE frame
    ``[ts - window, ts]`` *including all peers of the current ts* (RANGE
    ... AND CURRENT ROW spans every row whose ORDER BY value equals the
    current row's). Two searchsorted calls per user run over prefix sums —
    no per-row loop."""
    if batch.num_rows == 0 or "user_id" not in batch.column_names:
        return pa.table({})
    batch = batch.take(
        pc.sort_indices(
            batch,
            sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
        )
    )
    users = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    vals = batch.column("value").combine_chunks().to_numpy(zero_copy_only=False)
    m = len(users)
    starts = np.nonzero(np.concatenate(([True], users[1:] != users[:-1])))[0]
    ends = np.concatenate((starts[1:], [m]))
    n_out = np.empty(m, dtype=np.int64)
    sum_out = np.empty(m, dtype=np.float64)
    for s, e in zip(starts, ends):
        seg_ts = ts[s:e]
        prefix = np.concatenate(([0.0], np.cumsum(vals[s:e])))
        lo = np.searchsorted(seg_ts, seg_ts - window_us, side="left")
        hi = np.searchsorted(seg_ts, seg_ts, side="right")  # peers included
        n_out[s:e] = hi - lo
        sum_out[s:e] = prefix[hi] - prefix[lo]
    return pa.table(
        {
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "n_window": pa.array(n_out),
            "sum_value": py_round_array(pa.array(sum_out, pa.float64()), 2),
        }
    )


def rolling_window(
    events: ray.data.Dataset,
    *,
    window_us: int = 3_600_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Sliding-window aggregate per user (SQL ``RANGE BETWEEN INTERVAL ...
    PRECEDING AND CURRENT ROW``): rolling event count + value sum over the
    trailing window for every event. Needs columns (user_id, event_id, ts,
    value). Sum rounded at the value quantum (2dp) so the prefix-difference
    float noise can't flip an exact oracle comparison."""
    ensure_hash_shuffle()
    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)
    co = events.repartition(num_blocks=n, keys=["user_id"])
    return co.map_batches(
        _rolling_block,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
        fn_kwargs={"window_us": window_us},
    )
