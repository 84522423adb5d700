"""Skew handling (a genuinely giant document through the salted path) and
in-band OCR error placeholders."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ocr_endpoint_project_ray.pipelines.extraction import extract_documents
from ocr_endpoint_project_ray.schema import SPAN_STRUCT
from ocr_endpoint_project_ray.stages.extract import OcrStage, _ocr_apply


def test_giant_doc_salted_reassembly():
    """One 20k-span mega-doc among 50 small docs: the salted path must split
    it into many shuffle groups and still reassemble exactly."""
    rows = []
    for d in range(50):
        for o in range(5):
            rows.append((f"small{d:03d}", o, f"s{d}-{o}"))
    mega_n = 20_000
    for o in range(mega_n):
        rows.append(("mega", o, f"m{o}"))
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "spans": pa.array([None] * len(rows), pa.list_(SPAN_STRUCT)),
        }
    )
    # build as flat rows → list per doc via python (input table shape)
    by_doc: dict[str, list] = {}
    for doc_id, o, t in rows:
        by_doc.setdefault(doc_id, []).append(
            {"kind": "text", "text": t, "media_ref": "", "offset": o}
        )
    docs = pa.table(
        {
            "doc_id": pa.array(list(by_doc), pa.string()),
            "spans": pa.array(list(by_doc.values()), pa.list_(SPAN_STRUCT)),
        }
    )
    ds = ray.data.from_arrow(docs)
    out = extract_documents(ds, num_partitions=8, salted=True, shard_size=512).take_all()
    got = {r["doc_id"]: r["spans"] for r in out}
    assert len(got) == 51
    mega = got["mega"]
    assert len(mega) == mega_n
    assert [s["offset"] for s in mega] == list(range(mega_n))
    assert mega[12345]["text"] == "m12345"
    assert len(got["small007"]) == 5


def test_ocr_error_stays_in_band():
    """A failing engine must produce placeholder text, not an exception
    (reference: ocr_common.py:444,457 '[page N error: …]')."""
    batch = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "salt": pa.array([0], pa.int32()),
            "offset": pa.array([0], pa.int32()),
            "kind": pa.array(["image_ref"], pa.string()),
            "text": pa.array([""], pa.string()),
            "media_ref": pa.array(["media://d/0"], pa.string()),
        }
    )
    out = _ocr_apply(batch, {"kind": "tesseract"})  # engine path not installed
    assert out.column("text").to_pylist()[0].startswith("[page error:")


def test_ocr_actor_stage_stub():
    stage = OcrStage()
    batch = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "salt": pa.array([0], pa.int32()),
            "offset": pa.array([0], pa.int32()),
            "kind": pa.array(["image_ref"], pa.string()),
            "text": pa.array([""], pa.string()),
            "media_ref": pa.array(["media://d/0"], pa.string()),
        }
    )
    out = stage(batch)
    assert out.column("text").to_pylist()[0].startswith("[ocr ")


# ---------------------------------------------------------------------------
# Salted/unsalted parity for per-key window & as-of ops (mega-key strategy)
# ---------------------------------------------------------------------------


def _skewed_events(n: int = 4000, n_users: int = 20, seed: int = 5):
    """Event corpus where user 1 owns HALF the events (the pathological key
    the unsalted ops would co-locate into one unbounded block)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    users = np.where(rng.random(n) < 0.5, 1, rng.integers(2, n_users + 1, n))
    # ts over ~10 days in us, bursty (so sessions/windows span salt buckets)
    ts = np.sort(rng.integers(0, 10 * 24 * 3_600_000_000, n))
    values = np.round(rng.random(n) * 100, 2)
    return pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(values, pa.float64()),
        }
    )


def _rows_set(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def test_sessionize_salted_parity():
    from ocr_endpoint_project_ray.stages.windows import sessionize, sessionize_salted

    tbl = _skewed_events()
    gap = 45 * 60 * 1_000_000  # 45 min, larger than typical inter-event gap
    cols = ["user_id", "session_id", "n_events", "start_ts", "end_ts", "sum_value"]
    plain = _rows_set(
        sessionize(ray.data.from_arrow(tbl).repartition(8), gap_us=gap, num_partitions=4), cols
    )
    # span 6h → sessions frequently cross bucket boundaries
    salted = _rows_set(
        sessionize_salted(
            ray.data.from_arrow(tbl).repartition(8),
            gap_us=gap,
            span_us=6 * 3_600_000_000,
            num_partitions=4,
        ),
        cols,
    )
    assert plain == salted


def test_rolling_window_salted_parity():
    from ocr_endpoint_project_ray.stages.windows import rolling_window, rolling_window_salted

    tbl = _skewed_events(seed=9)
    cols = ["user_id", "event_id", "n_window", "sum_value"]
    window = 2 * 3_600_000_000  # 2h
    plain = _rows_set(
        rolling_window(ray.data.from_arrow(tbl).repartition(8), window_us=window, num_partitions=4),
        cols,
    )
    salted = _rows_set(
        rolling_window_salted(
            ray.data.from_arrow(tbl).repartition(8),
            window_us=window,
            span_us=3 * 3_600_000_000,  # barely above window → heavy context traffic
            num_partitions=4,
        ),
        cols,
    )
    assert plain == salted


def test_rolling_window_salted_rejects_small_span():
    import pytest

    from ocr_endpoint_project_ray.stages.windows import rolling_window_salted

    with pytest.raises(ValueError, match="span_us"):
        rolling_window_salted(
            ray.data.from_arrow(_skewed_events(100)), window_us=100, span_us=50
        )


def test_asof_salted_parity():
    from ocr_endpoint_project_ray.stages.asof import (
        asof_join_latest_ts,
        asof_join_latest_ts_salted,
    )

    tbl = _skewed_events(seed=13)
    # left = odd event ids, right = even; right sparse for some users so many
    # lefts must look back across several salt buckets (and some find nothing)
    import pyarrow.compute as pc

    left_tbl = tbl.filter(pc.equal(pc.bit_wise_and(tbl.column("event_id"), 1), 1))
    right_tbl = tbl.filter(
        pc.and_(
            pc.equal(pc.bit_wise_and(tbl.column("event_id"), 1), 0),
            pc.less(pc.bit_wise_and(tbl.column("event_id"), 7), 2),  # sparse
        )
    ).drop_columns(["value"])
    cols = ["user_id", "event_id", "asof_ts"]
    plain = _rows_set(
        asof_join_latest_ts(
            ray.data.from_arrow(left_tbl).repartition(6),
            ray.data.from_arrow(right_tbl).repartition(6),
            key="user_id",
            num_partitions=4,
        ),
        cols,
    )
    salted = _rows_set(
        asof_join_latest_ts_salted(
            ray.data.from_arrow(left_tbl).repartition(6),
            ray.data.from_arrow(right_tbl).repartition(6),
            key="user_id",
            span_us=12 * 3_600_000_000,
            num_partitions=4,
        ),
        cols,
    )
    assert plain == salted
    # sanity: the skew corpus actually exercises cross-bucket lookback
    assert any(v[2] is None for v in plain) and any(v[2] is not None for v in plain)


def test_cumulative_window_salted_parity():
    from ocr_endpoint_project_ray.stages.windows import (
        cumulative_window,
        cumulative_window_salted,
    )

    tbl = _skewed_events(seed=17)
    cols = ["user_id", "event_id", "cum_value", "ts_delta_us"]
    plain = _rows_set(
        cumulative_window(ray.data.from_arrow(tbl).repartition(8), num_partitions=4),
        cols,
    )
    # span 6h → many users span several salt buckets, exercising both the
    # exclusive offset and the cross-bucket LAG boundary
    salted = _rows_set(
        cumulative_window_salted(
            ray.data.from_arrow(tbl).repartition(8),
            span_us=6 * 3_600_000_000,
            num_partitions=4,
        ),
        cols,
    )
    assert plain == salted
