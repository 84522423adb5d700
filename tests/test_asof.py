"""As-of join edge cases: no prior right row, exact-timestamp ties,
key isolation (no bleed across keys)."""

from __future__ import annotations

import datetime

import pyarrow as pa

import ray.data

from ocr_endpoint_project_ray.stages.asof import asof_join_latest_ts


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=r[2]) for r in rows],
                    pa.timestamp("us"),
                ),
            }
        )
    )


def test_asof_semantics():
    #           user, event_id, minute
    left = _ds([(1, 100, 10), (1, 101, 30), (2, 200, 5), (3, 300, 50)])
    right = _ds([(1, 900, 10), (1, 901, 20), (2, 902, 7), (3, 903, 60)])
    out = {
        r["event_id"]: r["last_view_ts"]
        for r in asof_join_latest_ts(left, right, key="user_id", out_col="last_view_ts",
                                     num_partitions=4).take_all()
    }
    base = datetime.datetime(2024, 1, 1)
    # exact-ts tie qualifies (<=)
    assert out[100] == base + datetime.timedelta(minutes=10)
    # latest prior, not first
    assert out[101] == base + datetime.timedelta(minutes=20)
    # right row AFTER left ts for user 2 only at minute 7 ≤ 5? no → but 7 > 5 → none
    assert out[200] is None
    # user 3's only view is after the purchase → none (no bleed from other keys)
    assert out[300] is None
    assert len(out) == 4


def test_asof_salted_empty_right():
    """Salted path with an empty right side: every left row gets null."""
    from ocr_endpoint_project_ray.stages.asof import asof_join_latest_ts_salted

    left = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([1, 2], pa.int64()),
                "event_id": pa.array([10, 20], pa.int64()),
                "ts": pa.array([1000, 2000], pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )
    out = asof_join_latest_ts_salted(left, right, key="user_id", num_partitions=2).take_all()
    assert len(out) == 2 and all(r["asof_ts"] is None for r in out)
