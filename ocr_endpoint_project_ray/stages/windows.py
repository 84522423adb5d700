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

Key skew: a single pathological user makes that co-located block unbounded,
so both operators have a time-range-salted twin (``sessionize_salted``,
``rolling_window_salted``) partitioned on ``(user_id, ts // span_us)`` —
the same mega-key strategy as the extraction path's ``salt = offset //
shard_size`` (stages/extract.py). Sessionize repairs bucket boundaries by
merging per-bucket SESSION SUMMARIES in a second keyed pass (data volume =
sessions, not events); rolling windows duplicate each bucket's trailing
``window_us`` of rows into the next bucket as read-only context (exact
because the RANGE frame's lookback is bounded by ``window_us ≤ span_us``).
Property tests assert salted/unsalted parity on a corpus where one user owns
half the events (tests/test_skew_and_errors.py).
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


# ---------------------------------------------------------------------------
# Time-range-salted twins (mega-key strategy)
# ---------------------------------------------------------------------------


def _add_time_bucket(span_us: int):
    def _f(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        bucket = pc.divide(ts, span_us)  # event ts are non-negative
        return batch.append_column("bucket", pc.cast(bucket, pa.int64()))

    return _f


def _sessionize_partial_block(batch: pa.Table, gap_us: int) -> pa.Table:
    """Phase-1 kernel for the salted path: per-user session summaries within
    the block with RAW sums (rounding happens once, after the boundary
    merge). Grouping by user alone is sound even when several buckets of one
    user share a block: merging on true inter-event gaps is confluent — any
    partial merge agrees with the final one."""
    if batch.num_rows == 0 or "user_id" not in batch.column_names:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "start_ts": pa.array([], pa.int64()),
                "end_ts": pa.array([], pa.int64()),
                "sum_raw": pa.array([], pa.float64()),
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
    starts_idx = np.nonzero(is_start)[0]
    ends_idx = np.concatenate((starts_idx[1:], [n]))
    return pa.table(
        {
            "user_id": pa.array(users[starts_idx], pa.int64()),
            "n_events": pa.array(ends_idx - starts_idx, pa.int64()),
            "start_ts": pa.array(ts[starts_idx], pa.int64()),
            "end_ts": pa.array(ts[ends_idx - 1], pa.int64()),
            "sum_raw": pa.array(np.add.reduceat(values, starts_idx), pa.float64()),
        }
    )


def _merge_sessions_block(batch: pa.Table, gap_us: int) -> pa.Table:
    """Phase-2 kernel: all SESSION SUMMARIES of a user co-located; merge
    chains whose inter-summary gap ≤ gap_us, renumber session_id per user,
    round the sum once. The loop runs over summaries (sessions), not events —
    that is the whole point of the salting."""
    out_schema = {
        "user_id": pa.int64(),
        "session_id": pa.int64(),
        "n_events": pa.int64(),
        "start_ts": pa.timestamp("us"),
        "end_ts": pa.timestamp("us"),
        "sum_value": pa.float64(),
    }
    if batch.num_rows == 0 or "user_id" not in batch.column_names:
        return pa.table({k: pa.array([], t) for k, t in out_schema.items()})
    batch = batch.take(
        pc.sort_indices(
            batch,
            sort_keys=[("user_id", "ascending"), ("start_ts", "ascending"), ("end_ts", "ascending")],
        )
    )
    users = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
    starts = batch.column("start_ts").combine_chunks().to_numpy(zero_copy_only=False)
    ends = batch.column("end_ts").combine_chunks().to_numpy(zero_copy_only=False)
    counts = batch.column("n_events").combine_chunks().to_numpy(zero_copy_only=False)
    sums = batch.column("sum_raw").combine_chunks().to_numpy(zero_copy_only=False)
    o_user, o_sid, o_n, o_start, o_end, o_sum = [], [], [], [], [], []
    i, n = 0, len(users)
    while i < n:
        u = users[i]
        sid = 0
        while i < n and users[i] == u:
            sid += 1
            c_start, c_end = starts[i], ends[i]
            c_n, c_sum = int(counts[i]), float(sums[i])
            i += 1
            while i < n and users[i] == u and starts[i] - c_end <= gap_us:
                c_end = max(c_end, ends[i])
                c_n += int(counts[i])
                c_sum += float(sums[i])
                i += 1
            o_user.append(u)
            o_sid.append(sid)
            o_n.append(c_n)
            o_start.append(int(c_start))
            o_end.append(int(c_end))
            o_sum.append(c_sum)
    return pa.table(
        {
            "user_id": pa.array(o_user, pa.int64()),
            "session_id": pa.array(o_sid, pa.int64()),
            "n_events": pa.array(o_n, pa.int64()),
            "start_ts": pa.array(o_start, pa.int64()).cast(pa.timestamp("us")),
            "end_ts": pa.array(o_end, pa.int64()).cast(pa.timestamp("us")),
            "sum_value": py_round_array(pa.array(o_sum, pa.float64()), 2),
        }
    )


def sessionize_salted(
    events: ray.data.Dataset,
    *,
    gap_us: int = DEFAULT_GAP_US,
    span_us: int = 24 * 3_600_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Skew-safe sessionize: phase 1 partitions on ``(user_id, ts//span_us)``
    so a mega-user's events spread over ~time-range/span blocks; phase 2
    merges the per-bucket session summaries (keyed by user alone, but the
    data is now sessions — orders of magnitude smaller than events; a user
    with pathologically many sessions bounds phase 2, not phase 1). Output
    identical to :func:`sessionize` (property test with a 50 %-skew user)."""
    ensure_hash_shuffle()
    n = num_partitions or default_num_partitions(per_cpu=1)
    bucketed = events.map_batches(
        _add_time_bucket(span_us), batch_size=None, batch_format="pyarrow"
    )
    co = bucketed.repartition(num_blocks=n, keys=["user_id", "bucket"])
    partial = co.map_batches(
        _sessionize_partial_block,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"gap_us": gap_us},
    )
    co2 = partial.repartition(num_blocks=n, keys=["user_id"])
    return co2.map_batches(
        _merge_sessions_block,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"gap_us": gap_us},
    )


def _rolling_salt_explode(span_us: int, window_us: int):
    def _f(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        bucket = pc.cast(pc.divide(ts, span_us), pa.int64())
        own = batch.append_column("bucket", bucket).append_column(
            "is_ctx", pa.array([False] * batch.num_rows, pa.bool_())
        )
        # trailing window_us of each bucket also feeds the NEXT bucket as
        # read-only context (exact: RANGE lookback ≤ window_us ≤ span_us)
        next_edge = pc.multiply(pc.add(bucket, 1), span_us)
        tail = pc.greater_equal(ts, pc.subtract(next_edge, window_us))
        ctx = batch.filter(tail)
        ctx_bucket = pc.add(pc.cast(pc.divide(pc.cast(ctx.column("ts"), pa.int64()), span_us), pa.int64()), 1)
        ctx = ctx.append_column("bucket", ctx_bucket).append_column(
            "is_ctx", pa.array([True] * ctx.num_rows, pa.bool_())
        )
        return pa.concat_tables([own, ctx])

    return _f


def _rolling_block_salted(batch: pa.Table, window_us: int) -> pa.Table:
    """Like ``_rolling_block`` but grouped on (user_id, bucket); context rows
    (previous bucket's tail) join the prefix sums but are not emitted."""
    if batch.num_rows == 0 or "user_id" not in batch.column_names:
        return pa.table({})
    batch = batch.take(
        pc.sort_indices(
            batch,
            sort_keys=[
                ("user_id", "ascending"),
                ("bucket", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
    )
    users = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
    buckets = batch.column("bucket").combine_chunks().to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    vals = batch.column("value").combine_chunks().to_numpy(zero_copy_only=False)
    is_ctx = batch.column("is_ctx").combine_chunks().to_numpy(zero_copy_only=False)
    m = len(users)
    new_grp = np.concatenate(
        ([True], (users[1:] != users[:-1]) | (buckets[1:] != buckets[:-1]))
    )
    starts = np.nonzero(new_grp)[0]
    ends = np.concatenate((starts[1:], [m]))
    n_out = np.empty(m, dtype=np.int64)
    sum_out = np.empty(m, dtype=np.float64)
    for s, e in zip(starts, ends):
        seg_ts = ts[s:e]
        prefix = np.concatenate(([0.0], np.cumsum(vals[s:e])))
        lo = np.searchsorted(seg_ts, seg_ts - window_us, side="left")
        hi = np.searchsorted(seg_ts, seg_ts, side="right")
        n_out[s:e] = hi - lo
        sum_out[s:e] = prefix[hi] - prefix[lo]
    own = ~is_ctx
    return pa.table(
        {
            "user_id": batch.column("user_id").filter(pa.array(own)),
            "event_id": batch.column("event_id").filter(pa.array(own)),
            "n_window": pa.array(n_out[own]),
            "sum_value": py_round_array(pa.array(sum_out[own], pa.float64()), 2),
        }
    )


def rolling_window_salted(
    events: ray.data.Dataset,
    *,
    window_us: int = 3_600_000_000,
    span_us: int | None = None,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Skew-safe rolling window: partition on ``(user_id, ts//span_us)``;
    each bucket receives the previous bucket's trailing ``window_us`` of rows
    as context, so every row's full RANGE frame is in-block. Exact (requires
    ``span_us ≥ window_us``); output identical to :func:`rolling_window`.
    Duplication overhead = window/span fraction of rows (~4 % at the
    default 24× window)."""
    ensure_hash_shuffle()
    span = span_us or 24 * window_us
    if span < window_us:
        raise ValueError(f"span_us ({span}) must be >= window_us ({window_us})")
    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)
    exploded = events.map_batches(
        _rolling_salt_explode(span, window_us), batch_size=None, batch_format="pyarrow"
    )
    co = exploded.repartition(num_blocks=n, keys=["user_id", "bucket"])
    return co.map_batches(
        _rolling_block_salted,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"window_us": window_us},
    )


# ---------------------------------------------------------------------------
# Running (ROWS UNBOUNDED PRECEDING) aggregate + LAG
# ---------------------------------------------------------------------------


def _cumulative_block(batch: pa.Table) -> pa.Table:
    """Per-block kernel: rows co-located per user (keyed repartition).
    Running value sum restarts per user and accumulates strictly left to
    right in (ts, event_id) order — ``np.cumsum`` per user segment, NOT a
    global cumsum minus a segment offset, which would change the float
    association versus the SQL window's sequential accumulation. The LAG
    delta is exact int64 microseconds (null on each user's first event)."""
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
    varr = batch.column("value").combine_chunks()
    # SQL SUM OVER skips NULLs (a null row still shows the running sum;
    # the frame is NULL only until the user's first non-null value) — a
    # raw to_numpy would NaN-poison every later row of that user.
    val_null = pc.is_null(varr).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(varr, 0.0).to_numpy(zero_copy_only=False)
    m = len(users)
    is_first = np.concatenate(([True], users[1:] != users[:-1]))
    starts = np.nonzero(is_first)[0]
    ends = np.concatenate((starts[1:], [m]))
    cum = np.empty(m, dtype=np.float64)
    cum_null = np.empty(m, dtype=bool)
    for s, e in zip(starts, ends):
        cum[s:e] = np.cumsum(vals[s:e])
        cum_null[s:e] = np.cumsum(~val_null[s:e]) == 0
    prev_ts = np.empty(m, dtype=np.int64)
    prev_ts[0] = 0
    prev_ts[1:] = ts[:-1]
    delta = ts - prev_ts
    return pa.table(
        {
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "cum_value": py_round_array(pa.array(cum, pa.float64(), mask=cum_null), 2),
            "ts_delta_us": pa.array(delta, pa.int64(), mask=is_first),
        }
    )


def cumulative_window(
    events: ray.data.Dataset,
    *,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-key running aggregate + LAG (SQL ``SUM ... OVER (PARTITION BY
    user ORDER BY ts ROWS UNBOUNDED PRECEDING)`` and ``lag(ts)``): the
    cumulative value total and the inter-event gap for every event. Needs
    columns (user_id, event_id, ts, value). One keyed shuffle co-locates a
    user's events; the kernel is one sort + one cumsum per block. Sum
    rounded at the value quantum (2dp, Python round — house float
    protocol) so accumulation-tree differences versus the SQL window
    engine can't flip an exact value hash."""
    ensure_hash_shuffle()
    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)
    co = events.repartition(num_blocks=n, keys=["user_id"])
    return co.map_batches(
        _cumulative_block,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _bucket_totals_block(batch: pa.Table) -> pa.Table:
    """Pass-1 partial for the salted cumulative window: per-(user, bucket)
    RAW value sum + last event ts. Data volume out = user×bucket summaries
    per block, not events."""
    if batch.num_rows == 0 or "user_id" not in batch.column_names:
        return pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
                "n_values": pa.array([], pa.int64()),
                "last_ts": pa.array([], pa.int64()),
            }
        )
    t = batch.append_column("__ts_us", pc.cast(batch.column("ts"), pa.int64()))
    gb = t.group_by(["user_id", "bucket"], use_threads=False).aggregate(
        [("value", "sum"), ("value", "count"), ("__ts_us", "max")]
    )
    rename = {
        "value_sum": "sum_value",
        "value_count": "n_values",
        "__ts_us_max": "last_ts",
    }
    return gb.rename_columns([rename.get(c, c) for c in gb.column_names])


def _cumulative_salted_block(batch: pa.Table, offsets_ref) -> pa.Table:
    """Pass-2 kernel: rows co-located per (user, bucket). Local sequential
    cumsum per segment + the broadcast exclusive bucket offset; the LAG
    delta uses the broadcast previous-bucket last_ts for each segment's
    first row (null when the bucket is the user's first)."""
    if batch.num_rows == 0 or "user_id" not in batch.column_names:
        return pa.table({})
    import ray

    off_map, prev_map = ray.get(offsets_ref)
    batch = batch.take(
        pc.sort_indices(
            batch,
            sort_keys=[
                ("user_id", "ascending"),
                ("bucket", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
    )
    users = batch.column("user_id").combine_chunks().to_numpy(zero_copy_only=False)
    buckets = batch.column("bucket").combine_chunks().to_numpy(zero_copy_only=False)
    ts = pc.cast(batch.column("ts"), pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
    varr = batch.column("value").combine_chunks()
    # same null rule as _cumulative_block: nulls contribute 0 to the sum,
    # and the frame is NULL only until the user's first non-null value —
    # which may sit in an EARLIER bucket (the broadcast seen-flag)
    val_null = pc.is_null(varr).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(varr, 0.0).to_numpy(zero_copy_only=False)
    m = len(users)
    new_seg = np.concatenate(
        ([True], (users[1:] != users[:-1]) | (buckets[1:] != buckets[:-1]))
    )
    starts = np.nonzero(new_seg)[0]
    ends = np.concatenate((starts[1:], [m]))
    cum = np.empty(m, dtype=np.float64)
    cum_null = np.zeros(m, dtype=bool)
    prev_ts = np.empty(m, dtype=np.int64)
    prev_ts[0] = 0
    prev_ts[1:] = ts[:-1]
    is_null = np.zeros(m, dtype=bool)
    for s, e in zip(starts, ends):
        key = (int(users[s]), int(buckets[s]))
        off, seen_earlier = off_map.get(key, (0.0, False))
        cum[s:e] = np.cumsum(vals[s:e]) + off
        if not seen_earlier:
            cum_null[s:e] = np.cumsum(~val_null[s:e]) == 0
        pt = prev_map.get(key)
        if pt is None:
            is_null[s] = True
        else:
            prev_ts[s] = pt
    delta = ts - prev_ts
    return pa.table(
        {
            "user_id": batch.column("user_id"),
            "event_id": batch.column("event_id"),
            "cum_value": py_round_array(pa.array(cum, pa.float64(), mask=cum_null), 2),
            "ts_delta_us": pa.array(delta, pa.int64(), mask=is_null),
        }
    )


def cumulative_window_salted(
    events: ray.data.Dataset,
    *,
    span_us: int = 24 * 3_600_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Skew-safe running aggregate + LAG: same output as
    :func:`cumulative_window` without ever co-locating one user's events.
    A prefix sum can't use the context-copy trick (the lookback is
    unbounded), so this is the distributed exclusive-prefix-sum shape
    already proven by ``pack_sequences``: pass 1 streams per-(user,
    time-bucket) totals + last-ts (map-side group partials; volume =
    summaries, not events), the driver combines them into exclusive
    per-bucket offsets and previous-bucket boundary timestamps and
    broadcasts ONCE (``ray.put``), pass 2 re-streams the events
    partitioned on ``(user_id, bucket)`` — a mega-user spreads over
    ~time-range/span blocks — and each segment adds its broadcast offset
    to a local cumsum. Driver state is O(users × buckets) summaries
    (driver-bounded, the same cardinality assumption as
    ``grouped_quantiles_exact``); both passes re-execute the upstream
    read (the documented two-pass cost — forking the lazy DAG would
    materialize the corpus instead). The bucket offset re-associates the
    float sum versus the unsalted sequential cumsum; the 2dp rounding
    protocol absorbs it (parity pytest with a 50 %-skew user)."""
    ensure_hash_shuffle()
    n = num_partitions or min(default_num_partitions(per_cpu=1), 16)
    bucketed = events.map_batches(
        _add_time_bucket(span_us), batch_size=None, batch_format="pyarrow"
    )
    partial_rows = bucketed.map_batches(
        _bucket_totals_block, batch_size=None, batch_format="pyarrow"
    ).take_all()
    off_map: dict[tuple[int, int], tuple[float, bool]] = {}
    prev_map: dict[tuple[int, int], int] = {}
    if partial_rows:
        ptbl = pa.Table.from_pylist(partial_rows)
        gb = ptbl.group_by(["user_id", "bucket"], use_threads=False).aggregate(
            [("sum_value", "sum"), ("n_values", "sum"), ("last_ts", "max")]
        )
        rename = {
            "sum_value_sum": "sum_value",
            "n_values_sum": "n_values",
            "last_ts_max": "last_ts",
        }
        gb = gb.rename_columns([rename.get(c, c) for c in gb.column_names])
        gb = gb.take(
            pc.sort_indices(
                gb, sort_keys=[("user_id", "ascending"), ("bucket", "ascending")]
            )
        )
        run_user, run_sum, run_last, run_nn = None, 0.0, None, 0
        for u, b, s, nn, lt in zip(
            gb.column("user_id").to_pylist(),
            gb.column("bucket").to_pylist(),
            gb.column("sum_value").to_pylist(),
            gb.column("n_values").to_pylist(),
            gb.column("last_ts").to_pylist(),
        ):
            if u != run_user:
                run_user, run_sum, run_last, run_nn = u, 0.0, None, 0
            # run_nn > 0 ⇔ an earlier bucket already saw a non-null value,
            # so this bucket's rows can't be leading-null (SQL frame rule)
            off_map[(u, b)] = (run_sum, run_nn > 0)
            if run_last is not None:
                prev_map[(u, b)] = run_last
            run_sum += float(s or 0.0)  # all-null buckets sum to null
            run_nn += int(nn)
            run_last = lt
    import ray

    ref = ray.put((off_map, prev_map))
    co = bucketed.repartition(num_blocks=n, keys=["user_id", "bucket"])
    return co.map_batches(
        _cumulative_salted_block,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"offsets_ref": ref},
    )
