"""Regression tests for code-review findings: null keys in keyed dedup,
broadcast-join type stability, null filenames, shard-group reads,
fingerprint truncation, HLL null groups, and oracle parity on edge texts
(whitespace-only, unicode) that the stock corpus doesn't contain."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from ocr_endpoint_project_ray.functions.join import broadcast_join
from ocr_endpoint_project_ray.functions.sketch import approx_distinct
from ocr_endpoint_project_ray.functions.text import rolling_fingerprint
from ocr_endpoint_project_ray.stages.dedup import keyed_latest
from ocr_endpoint_project_ray.stages.validate import tag_invalid_rows


def test_keyed_latest_with_null_keys():
    tbl = pa.table(
        {
            "k": pa.array(["a", None, "a", None, "b"], pa.string()),
            "ts": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    out = keyed_latest(
        ray.data.from_arrow(tbl), ["k"], [("ts", "descending")], num_partitions=2
    ).take_all()
    got = {r["k"]: r["ts"] for r in out}
    # nulls form ONE group (SQL grouping semantics), latest ts wins
    assert got == {"a": 3, None: 4, "b": 5}


def test_broadcast_join_type_stable_across_batches():
    small = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "v": pa.array([10, 20], pa.int64())}
    )
    # two blocks: one all-hit, one with a miss
    left = ray.data.from_arrow_refs(
        [
            ray.put(pa.table({"k": pa.array([1, 2], pa.int64())})),
            ray.put(pa.table({"k": pa.array([1, 3], pa.int64())})),
        ]
    )
    inner = broadcast_join(left, small, left_on="k", right_on="k", how="inner")
    schema = inner.schema()
    assert dict(zip(schema.names, schema.types))["v"] == pa.int64()
    assert sorted(r["v"] for r in inner.take_all()) == [10, 10, 20]
    left2 = ray.data.from_arrow(pa.table({"k": pa.array([1, 3], pa.int64())}))
    lj = broadcast_join(left2, small, left_on="k", right_on="k", how="left")
    rows = {r["k"]: r["v"] for r in lj.take_all()}
    assert rows == {1: 10, 3: None}
    s2 = lj.schema()
    assert dict(zip(s2.names, s2.types))["v"] == pa.int64()


def test_null_filename_rejected():
    batch = pa.table(
        {
            "filename": pa.array([None, "ok.pdf"], pa.string()),
            "payload": pa.array([b"x", b"y"], pa.large_binary()),
        }
    )
    reasons = tag_invalid_rows(batch, payload_col="payload").column("reject_reason").to_pylist()
    assert reasons == ["missing_filename", None]


def test_null_payload_does_not_wipe_reason():
    """Second-review finding: null payload must not reset an already-set
    reject reason (null condition poisoning if_else)."""
    batch = pa.table(
        {
            "filename": pa.array(["bad.exe", None, "ok.pdf", "p.pdf"], pa.string()),
            "payload": pa.array([None, None, b"y", None], pa.large_binary()),
        }
    )
    reasons = tag_invalid_rows(batch, payload_col="payload").column("reject_reason").to_pylist()
    assert reasons == ["unsupported_media_type", "missing_filename", None, "empty_file"]


def test_broadcast_join_null_value_in_small_side():
    small = pa.table({"k": pa.array([1, 2], pa.int64()), "v": pa.array([10, None], pa.int64())})
    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    rows = {r["k"]: r["v"] for r in
            broadcast_join(left, small, left_on="k", right_on="k", how="inner").take_all()}
    assert rows == {1: 10, 2: None}


def test_token_definition_consistent_on_unicode_whitespace():
    """q33's n_tokens and distinct_word_ratio must share one token
    definition (RE2 \\S+), including on NBSP."""
    from ocr_endpoint_project_ray.functions.text import count_tokens_ws

    nbsp_text = "a\u00a0a a\u00a0a"
    assert count_tokens_ws(pa.array([nbsp_text])).to_pylist() == [2]
    assert count_tokens_ws(pa.array(["\u00a0"])).to_pylist() == [1]  # RE2: NBSP is \S


def test_fingerprint_differs_beyond_prefix():
    prefix = "x" * 8000
    a = rolling_fingerprint(prefix + " tail one is here")
    b = rolling_fingerprint(prefix + " tail two differs!")
    assert a != b


def test_hll_keeps_null_key_group():
    tbl = pa.table(
        {
            "k": pa.array(["a", None, "a", None], pa.string()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = approx_distinct(ray.data.from_arrow(tbl), ["k"], "v", num_partitions=2).take_all()
    keys = {r["k"] for r in out}
    assert None in keys and "a" in keys


def test_run_cli_shard_groups_no_duplication(tmp_path):
    """--shards-per-partition > 1 must read each shard exactly once."""
    from ocr_endpoint_project_ray import run as runmod
    from ocr_endpoint_project_ray.sources.corpus import synth_spans_batch

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"])
    corpus = synth_spans_batch(docs.slice(0, 64))
    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    for i in range(4):
        pq.write_table(corpus.slice(i * 16, 16), str(in_dir / f"s{i}.parquet"))
    out_dir = str(tmp_path / "out")
    rc = runmod.main(
        [
            "extract",
            "--input",
            str(in_dir),
            "--output",
            out_dir,
            "--shards-per-partition",
            "2",
            "--num-partitions",
            "4",
        ]
    )
    assert rc == 0
    # partitions are now DIRECTORIES of fragments (distributed write);
    # pq.read_table reads a part dir transparently
    total = sum(
        pq.read_table(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    assert total == 64  # every doc exactly once
    import json

    entries = [
        json.load(open(os.path.join(out_dir, "_manifest", f)))
        for f in sorted(os.listdir(os.path.join(out_dir, "_manifest")))
    ]
    assert all(e["rows_in"] == 32 for e in entries)  # real input counts, not rows_out


def test_range_join_edges():
    from ocr_endpoint_project_ray.functions.join import broadcast_range_join

    bands = pa.table(
        {
            "lo": pa.array([0.0, 10.0], pa.float64()),
            "hi": pa.array([10.0, 20.0], pa.float64()),
            "band": pa.array([1, 2], pa.int64()),  # non-string labels
        }
    )
    ds = ray.data.from_arrow(pa.table({"v": pa.array([-5.0, 0.0, 9.9, 10.0, 25.0], pa.float64())}))
    out = broadcast_range_join(ds, bands, value_col="v", lo_col="lo", hi_col="hi", label_col="band")
    got = {r["v"]: r["band"] for r in out.take_all()}
    assert got == {-5.0: None, 0.0: 1, 9.9: 1, 10.0: 2, 25.0: None}
    with pytest.raises(ValueError, match="empty"):
        broadcast_range_join(ds, bands.slice(0, 0), value_col="v", lo_col="lo", hi_col="hi", label_col="band")
    overlapping = pa.table(
        {
            "lo": pa.array([0.0, 5.0], pa.float64()),
            "hi": pa.array([10.0, 20.0], pa.float64()),
            "band": pa.array(["a", "b"], pa.string()),
        }
    )
    with pytest.raises(ValueError, match="overlap"):
        broadcast_range_join(ds, overlapping, value_col="v", lo_col="lo", hi_col="hi", label_col="band")


def test_external_aggregator_cap_respected():
    import ray.data as rd

    from ocr_endpoint_project_ray.context import ensure_hash_shuffle

    ctx = rd.DataContext.get_current()
    before = ctx.max_hash_shuffle_aggregators
    try:
        ctx.max_hash_shuffle_aggregators = 3  # explicit user setting
        ensure_hash_shuffle()
        assert ctx.max_hash_shuffle_aggregators == 3
    finally:
        ctx.max_hash_shuffle_aggregators = before
        ensure_hash_shuffle()


@pytest.fixture()
def edge_docs_dir(tmp_path):
    texts = [
        "normal words here repeated normal words here again and again ok",
        "",
        "\t\n",
        "   ",
        "café médical déjà-vu naïve über",
        "عربي نص قصير هنا",
        "a b c d e f g h i j k l",
        "x" * 300,
        "a a a a",  # NBSP: RE2 \S, not a separator
        " ",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s0"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize("qname", ["q16_token_counts", "q19_cer_scores", "q33_quality_filter"])
def test_oracle_parity_on_edge_texts(edge_docs_dir, qname):
    """Whitespace-only and non-ASCII documents must still match the oracle."""
    import __ray_entry__ as em

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{edge_docs_dir}/documents.parquet')"
    )
    mine = pa.Table.from_pylist(em.queries()[qname](edge_docs_dir).take_all()).to_pandas()
    ref = con.sql(em.oracle_sql()[qname]).df()
    c = lambda df: df[sorted(df.columns)].sort_values(by=sorted(df.columns), ignore_index=True)
    pd.testing.assert_frame_equal(c(mine), c(ref), check_dtype=False, rtol=0, atol=0)


def test_word_metrics_empty_gt_reports_extra_words():
    # Reference ocr_common.py word_metrics: empty ground truth still reports
    # the deduped prediction words as extras (ADVICE round 1).
    from ocr_endpoint_project_ray.functions.metrics import word_metrics

    m = word_metrics("", "foo bar foo baz")
    assert m["accuracy_pct"] == 100.0
    assert m["missing_words"] == []
    assert m["extra_words"] == ["foo", "bar", "baz"]
    assert word_metrics("", "")["extra_words"] == []


def test_broadcast_join_rejects_duplicate_small_keys():
    small = pa.table(
        {"k": pa.array([1, 1, 2], pa.int64()), "v": pa.array([10, 11, 20], pa.int64())}
    )
    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="duplicate keys"):
        broadcast_join(left, small, left_on="k", right_on="k")
    # null keys in the small side don't count as duplicates of each other
    small_nulls = pa.table(
        {"k": pa.array([1, None, None], pa.int64()), "v": pa.array([10, 0, 0], pa.int64())}
    )
    out = broadcast_join(
        left, small_nulls, left_on="k", right_on="k", how="inner"
    ).take_all()
    assert [r["v"] for r in out] == [10]


def test_hll_sketch_ignores_nulls():
    # COUNT(DISTINCT) semantics: nulls are not a distinct value.
    tbl = pa.table(
        {
            "g": pa.array(["a"] * 6, pa.string()),
            "v": pa.array(["x", None, "y", None, "x", None], pa.string()),
        }
    )
    out = approx_distinct(
        ray.data.from_arrow(tbl), keys=["g"], value_col="v", out="nd", num_partitions=2
    ).take_all()
    assert out == [{"g": "a", "nd": 2}]


def test_anti_join_auto_paths_agree():
    """Both anti_join_auto dispatch arms (broadcast is_in below the
    threshold, distributed left_anti above) must produce identical rows;
    null left keys are kept on both paths."""
    import ray.data

    from ocr_endpoint_project_ray.functions.join import anti_join_auto

    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5, None], pa.int64()),
                "name": pa.array(["a", "b", "c", "d", "e", "n"], pa.string()),
            }
        )
    )

    def right():
        return ray.data.from_arrow(pa.table({"rk": pa.array([2, 4, 4, 9], pa.int64())}))

    broadcast = anti_join_auto(
        left, right(), on="k", right_on="rk", max_broadcast_rows=1000
    ).take_all()
    distributed = anti_join_auto(
        left, right(), on="k", right_on="rk", max_broadcast_rows=0, num_partitions=2
    ).take_all()
    canon = lambda rows: sorted(((r["k"], r["name"]) for r in rows), key=repr)
    assert canon(broadcast) == canon(distributed)
    assert canon(broadcast) == [(1, "a"), (3, "c"), (5, "e"), (None, "n")]


def test_anti_join_auto_empty_right():
    import ray.data

    from ocr_endpoint_project_ray.functions.join import anti_join_auto

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    empty = ray.data.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    out = anti_join_auto(left, empty, on="k", right_on="rk").take_all()
    assert sorted(r["k"] for r in out) == [1, 2]


def test_q54_decontaminate_null_text_parity(tmp_path):
    """q54 engine vs oracle on a corpus containing a null-text and a
    too-short doc: null text must score 0 hits (the oracle's NULL-excluding
    contains() join), not poison the vectorized hit counting."""
    from ocr_endpoint_project_ray.pipelines.textops import Q54_ORACLE, q54_decontaminate

    src = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).slice(0, 400)
    texts = src.column("text").to_pylist()
    texts[5] = None
    texts[11] = "tiny"
    pq.write_table(
        pa.table(
            {
                "doc_id": src.column("doc_id"),
                "text": pa.array(texts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    res = (
        q54_decontaminate(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    ora = con.execute(Q54_ORACLE).fetch_df().sort_values("doc_id").reset_index(drop=True)
    assert res.equals(ora)
    assert len(res) > 0


def test_q52_oracle_mirrors_bucket_truncation(tmp_path):
    """A degenerate corpus where one LSH bucket exceeds max_bucket: the
    oracle's QUALIFY clause must reproduce the engine's first-N-by-vec_id
    truncation, or pair counts diverge the day any bucket passes the cap."""
    from ocr_endpoint_project_ray.pipelines.textops import (
        _Q52_MAX_BUCKET,
        Q52_ORACLE,
        q52_embed_pairs,
    )

    n = _Q52_MAX_BUCKET + 40  # all-identical vectors -> one bucket, truncated
    vec = [1.0] + [0.0] * 63
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([vec] * n, pa.list_(pa.float32())),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    res = q52_embed_pairs(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{tmp_path}/embeddings.parquet')"
    )
    ora = con.execute(Q52_ORACLE).fetch_df()
    expect = _Q52_MAX_BUCKET * (_Q52_MAX_BUCKET - 1) // 2
    assert len(res) == len(ora) == expect
    canon = lambda d: sorted(map(tuple, d[["vec_a", "vec_b"]].itertuples(index=False)))
    assert canon(res) == canon(ora)


def test_grouped_quantiles_timestamp_key():
    """Group keys that aren't Python literals (timestamps) must survive the
    partial-transport round trip — the repr()/literal_eval transport
    crashed on them."""
    import datetime

    from ocr_endpoint_project_ray.functions.quantiles import grouped_quantiles_exact

    t1 = datetime.datetime(2024, 1, 1)
    t2 = datetime.datetime(2024, 1, 2)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "day": pa.array([t1, t1, t1, t2, t2], pa.timestamp("us")),
                "v": pa.array([1.0, 2.0, 3.0, 10.0, 20.0], pa.float64()),
            }
        )
    ).repartition(2)
    out = grouped_quantiles_exact(ds, ["day"], "v", {"p50": 0.5})
    got = {r["day"]: r["p50"] for r in out.to_pylist()}
    assert got == {t1: 2.0, t2: 15.0}


def test_anti_join_auto_right_failure_propagates():
    """A failing right-side pipeline must raise, not silently disable the
    anti filter (the old empty-side except caught wrapped ValueErrors)."""
    from ocr_endpoint_project_ray.functions.join import anti_join_auto

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))

    def _boom(b: pa.Table) -> pa.Table:
        raise ValueError("right side bug")

    right = ray.data.from_arrow(
        pa.table({"rk": pa.array([1], pa.int64())})
    ).map_batches(_boom, batch_size=None, batch_format="pyarrow")
    with pytest.raises(Exception, match="right side bug"):
        anti_join_auto(left, right, on="k", right_on="rk").take_all()


def test_q40_describe_null_key_and_null_values(tmp_path):
    """q40 engine vs oracle on events with a NULL event_type group and NULL
    values (r3 ADVICE: the old driver merge crashed on sorted(None) and
    NaN-poisoned the moments). SQL semantics: count(*) counts null-value
    rows, mean = round(sum)/count(*), stddev over non-null only, NULL
    event_type is its own group."""
    from ocr_endpoint_project_ray.pipelines.relational import (
        RELATIONAL_ORACLES,
        q40_value_describe,
    )

    tbl = pa.table(
        {
            "event_type": pa.array(["a", "a", None, None, "b", "a", None], pa.string()),
            "value": pa.array([1.0, None, 5.0, 7.0, None, 3.0, None], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    res = q40_value_describe(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    ora = con.execute(RELATIONAL_ORACLES["q40_value_describe"]).fetch_df()
    key = lambda df: df.sort_values(  # noqa: E731
        "event_type", na_position="last"
    ).reset_index(drop=True)[sorted(df.columns)]
    pd.testing.assert_frame_equal(key(res), key(ora), check_dtype=False)


def test_q40_describe_nan_values_propagate(tmp_path):
    """Genuine float NaN is a VALUE, not a NULL (r4 review): the moments
    must poison to NaN like SQL arithmetic (the old isnan mask silently
    returned finite answers), min keeps the smallest finite value, max and
    the NaN-tail quantile ranks go NaN (NaN sorts greatest). Engine-only
    assertions: DuckDB itself RAISES OutOfRangeException on
    stddev_samp with NaN input, so oracle parity is unattainable here —
    well-defined degradation is the contract."""
    import math

    from ocr_endpoint_project_ray.pipelines.relational import q40_value_describe

    tbl = pa.table(
        {
            "event_type": pa.array(["a", "a", "a", "b", "b", None], pa.string()),
            "value": pa.array([1.0, float("nan"), 3.0, 2.0, None, 5.0], pa.float64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    rows = {r["event_type"]: r for r in q40_value_describe(str(tmp_path)).to_pylist()}

    a = rows["a"]  # values [1.0, NaN, 3.0] — NaN last: ranks 0,1 finite, 2 NaN
    assert a["n"] == 3
    assert math.isnan(a["mean"]) and math.isnan(a["std"])
    assert a["min"] == 1.0 and math.isnan(a["max"])
    assert a["p25"] == 2.0  # h=0.5 interpolates the finite ranks 1.0, 3.0
    assert a["p50"] == 3.0  # h=1.0 → exact finite rank
    assert math.isnan(a["p75"])  # h=1.5 interpolates into the NaN tail

    b = rows["b"]  # [2.0, NULL]: null excluded everywhere except n
    assert b["n"] == 2 and b["mean"] == 1.0  # round(sum)/count(*) = 2.0/2
    assert b["min"] == 2.0 and b["max"] == 2.0 and b["p50"] == 2.0

    none_row = rows[None]
    assert none_row["n"] == 1 and none_row["min"] == 5.0 and none_row["max"] == 5.0


def test_q77_q78_q81_null_and_overflow_edges(tmp_path):
    """r5 review findings: (a) a digit run that overflows int64 must yield a
    NULL k_value (TRY_CAST semantics — errors are data), never raise; the
    19-digit boundary and leading zeros resolve numerically on both
    engines; (b) a NULL value must not NaN-poison the running sum — SQL
    SUM OVER skips nulls but the frame stays NULL only until the user's
    first non-null value, including across q81's salt buckets."""
    import __ray_entry__ as entrymod

    tbl = pa.table(
        {
            "event_id": pa.array(range(12), pa.int64()),
            "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4], pa.int64()),
            "ts": pa.array(
                [10, 20, 30, 40, 100, 200, 300, 5, 15, 25, 7, 9], pa.int64()
            ).cast(pa.timestamp("us")),
            "value": pa.array(
                [None, 1.25, None, 2.50, None, None, 3.75, 4.00, None, 5.25, None, None],
                pa.float64(),
            ),
            "props": pa.array(
                [
                    "id=99999999999999999999 x=3",  # 20 digits → overflow NULL
                    "id=9223372036854775807",  # int64 max → fits
                    "id=9223372036854775808",  # max+1 → NULL
                    "id=00000000000000000000009 y=1",  # leading zeros ⇒ 9
                    None,
                    "no digits here",
                    "a1b22c333",
                    "0",
                    "id=0000",
                    "18446744073709551615",  # uint64 max → NULL
                    "1234567890123456789",  # 19 digits < max → fits
                    "9999999999999999999",  # 19 digits > max → NULL
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    qs, orc = entrymod.queries(), entrymod.oracle_sql()

    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns), ignore_index=True)

    for name in (
        "q77_field_extract",
        "q78_cumulative_window",
        "q81_cumulative_window_salted",
    ):
        got = canon(
            pa.Table.from_pylist(qs[name](str(tmp_path)).take_all()).to_pandas()
        )
        exp = canon(con.sql(orc[name]).df())
        assert len(got) == len(exp), name
        pd.testing.assert_frame_equal(got, exp, check_dtype=False, rtol=0, atol=0)
