"""Property tests (SURVEY.md §5): order invariance under repartition,
aggregation correctness vs a pandas oracle, metric implementations vs naive
reference implementations."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import ray.data

from ocr_endpoint_project_ray.functions.agg import Agg, grouped_agg
from ocr_endpoint_project_ray.functions.metrics import edit_distance
from ocr_endpoint_project_ray.functions.text import normalize_text_array, normalize_words
from ocr_endpoint_project_ray.stages.extract import explode_spans, reassemble_spans
from ocr_endpoint_project_ray.schema import SPAN_STRUCT


def _naive_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_edit_distance_matches_naive(a, b):
    assert edit_distance(list(a), list(b)) == _naive_levenshtein(a, b)


#: Realistic corpus alphabet (ASCII + French accents + Arabic + punctuation);
#: full-Unicode case-folding parity (e.g. 'İ') is explicitly out of scope.
_CORPUS_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 _"
    ".,;:!?-—'\"()[]/\\\t\n"
    "éèêàçùïöœÉÈÀÇ"
    "العربيةنصفيهذامنإلى"
)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet=_CORPUS_ALPHABET, max_size=80))
def test_normalize_array_matches_scalar(text):
    via_array = normalize_text_array(pa.array([text])).to_pylist()[0]
    assert via_array.split(" ") == normalize_words(text) or via_array == ""
    # idempotent
    assert normalize_text_array(pa.array([via_array])).to_pylist()[0] == via_array


# Ray-backed property tests: hypothesis drives the data, one shared Ray
# session (conftest); examples kept small so the suite stays fast.
_ray_settings = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@_ray_settings
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.floats(-100, 100, allow_nan=False)), min_size=1, max_size=60
    )
)
def test_grouped_agg_matches_pandas(rows):
    df = pd.DataFrame(rows, columns=["k", "v"])
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = pa.Table.from_pylist(
        grouped_agg(
            ds,
            ["k"],
            [Agg("s", "v", "sum"), Agg("n", "v", "count_rows"), Agg("mn", "v", "min")],
            num_partitions=4,
        ).take_all()
    ).to_pandas().sort_values("k", ignore_index=True)
    ref = (
        df.groupby("k")["v"].agg(s="sum", n="count", mn="min").reset_index()
    ).sort_values("k", ignore_index=True)
    assert list(out["k"]) == list(ref["k"])
    assert list(out["n"]) == list(ref["n"])
    assert out["s"].tolist() == pytest.approx(ref["s"].tolist())
    assert out["mn"].tolist() == pytest.approx(ref["mn"].tolist())


@_ray_settings
@given(seed=st.integers(0, 10_000), salted=st.booleans())
def test_reassembly_order_invariant_under_permutation(seed, salted):
    """Shuffling input span rows arbitrarily must not change reassembled
    documents — order lives in `offset`, not in block order."""
    import numpy as np

    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(1, 6))
    rows = []
    for d in range(n_docs):
        n_spans = int(rng.integers(1, 12))
        for o in range(n_spans):
            rows.append(
                {
                    "doc_id": f"doc{d}",
                    "salt": o // 4,
                    "offset": o,
                    "kind": "text",
                    "text": f"d{d}s{o}",
                    "media_ref": "",
                }
            )
    perm = rng.permutation(len(rows))
    shuffled = [rows[i] for i in perm]
    tbl = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in shuffled], pa.string()),
            "salt": pa.array([r["salt"] for r in shuffled], pa.int32()),
            "offset": pa.array([r["offset"] for r in shuffled], pa.int32()),
            "kind": pa.array([r["kind"] for r in shuffled], pa.string()),
            "text": pa.array([r["text"] for r in shuffled], pa.string()),
            "media_ref": pa.array([r["media_ref"] for r in shuffled], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = reassemble_spans(ds, num_partitions=4, salted=salted).take_all()
    assert len(out) == n_docs
    for row in out:
        offsets = [s["offset"] for s in row["spans"]]
        assert offsets == sorted(offsets)
        d = int(row["doc_id"][3:])
        assert [s["text"] for s in row["spans"]] == [f"d{d}s{o}" for o in offsets]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "<p>{t}</p>",
                "<div>{t}</div>",
                "<nav><a href='/'>{t}</a></nav>",
                "<ul><li><a href='/x'>{t}</a></li></ul>",
                "<footer>{t}</footer>",
                "{t}",
                "<h2>{t}</h2>",
                "<!-- {t} -->",
                "<br/>",
                "<p>unclosed {t}",
            ]
        ),
        max_size=8,
    ),
    st.lists(st.text(alphabet="abcdef ghij.&k", min_size=0, max_size=30), max_size=8),
)
def test_strip_fast_matches_reference(templates, texts):
    from ocr_endpoint_project_ray.functions.html import (
        strip_boilerplate,
        strip_boilerplate_reference,
    )

    html = "".join(
        tpl.format(t=texts[i % len(texts)] if texts else "filler text")
        for i, tpl in enumerate(templates)
    )
    assert strip_boilerplate(html) == strip_boilerplate_reference(html)


def test_explode_roundtrip():
    """explode(reassemble(x)) == x for a well-formed flat span table."""
    spans = [
        {"kind": "text", "text": "a", "media_ref": "", "offset": 0},
        {"kind": "html", "text": "<p>b</p>", "media_ref": "", "offset": 1},
        {"kind": "image_ref", "text": "", "media_ref": "m://x", "offset": 2},
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(["d1"], pa.string()),
            "spans": pa.array([spans], pa.list_(SPAN_STRUCT)),
        }
    )
    flat = explode_spans(docs)
    assert flat.num_rows == 3
    back = reassemble_spans(ray.data.from_arrow(flat), num_partitions=2).take_all()
    assert back[0]["spans"] == spans


@settings(deadline=None, max_examples=40, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=200,
    ),
    q=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 0.95]),
)
def test_quantile_cont_matches_duckdb(vals, q):
    """The shared q34/q40 quantile kernel must equal DuckDB quantile_cont
    bit-for-bit at any group size (incl. 1, 2, ties, duplicates)."""
    import duckdb
    import numpy as np

    from ocr_endpoint_project_ray.functions.agg import quantile_cont_sorted

    seg = np.sort(np.asarray(vals, dtype=np.float64))
    got = quantile_cont_sorted(seg, q)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    want = con.execute(f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
    con.close()
    assert got == want, (got, want, len(vals), q)


@settings(deadline=None, max_examples=20, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),            # user
            st.integers(0, 7200),         # ts offset seconds
            st.integers(0, 10000),        # value cents
        ),
        min_size=1,
        max_size=60,
    )
)
def test_rolling_window_matches_bruteforce(rows):
    """RANGE-frame semantics incl. duplicate timestamps (peers of the
    current ts belong to the frame even when they sort after the row)."""
    import pyarrow as pa

    from ocr_endpoint_project_ray.stages.windows import _rolling_block

    window_us = 600 * 1_000_000  # 10 min
    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([base + s * 1_000_000 for _, s, _ in rows], pa.timestamp("us")),
            "value": pa.array([c / 100.0 for _, _, c in rows], pa.float64()),
        }
    )
    out = _rolling_block(tbl, window_us)
    got = {
        r["event_id"]: (r["n_window"], r["sum_value"]) for r in out.to_pylist()
    }
    for i, (u, s, c) in enumerate(rows):
        ts_i = base + s * 1_000_000
        frame = [
            (cc / 100.0)
            for (uu, ss, cc) in rows
            if uu == u and ts_i - window_us <= base + ss * 1_000_000 <= ts_i
        ]
        n, sv = got[i]
        assert n == len(frame), (i, n, len(frame))
        assert sv == round(sum(frame), 2) or abs(sv - round(sum(frame), 2)) < 1e-9


@settings(deadline=None, max_examples=15, suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", None]), st.integers(-50, 50)),
        min_size=0,
        max_size=80,
    ),
    nblocks=st.integers(1, 4),
)
def test_small_groups_equals_keyed_path(rows, nblocks):
    """The coalesce fast path must be value-identical to the keyed shuffle."""
    import pyarrow as pa

    import ray.data

    from ocr_endpoint_project_ray.functions.agg import Agg, grouped_agg

    tables = []
    per = max(1, len(rows) // nblocks)
    for i in range(0, len(rows), per):
        chunk = rows[i : i + per]
        tables.append(
            pa.table(
                {
                    "k": pa.array([k for k, _ in chunk], pa.string()),
                    "v": pa.array([float(v) for _, v in chunk], pa.float64()),
                }
            )
        )
    if not tables:
        tables = [pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.float64())})]
    import ray as _ray

    ds1 = ray.data.from_arrow_refs([_ray.put(t) for t in tables])
    ds2 = ray.data.from_arrow_refs([_ray.put(t) for t in tables])
    aggs = [
        Agg("n", "v", "count_rows"),
        Agg("s", "v", "sum"),
        Agg("mn", "v", "min"),
        Agg("mx", "v", "max"),
    ]

    def norm(res):
        return sorted(
            ((r["k"], r["n"], round(r["s"], 9), r["mn"], r["mx"]) for r in res.take_all()),
            key=lambda t: (t[0] is None, t),
        )

    assert norm(grouped_agg(ds1, ["k"], aggs, small_groups=True)) == norm(
        grouped_agg(ds2, ["k"], aggs, num_partitions=3)
    )


@_ray_settings
@given(
    data=st.data(),
    n_docs=st.integers(1, 12),
    n_phrases=st.integers(0, 6),
)
def test_decontaminate_hashed_matches_naive(data, n_docs, n_phrases):
    """decontaminate_hashed (broadcast AND distributed paths) vs a naive
    Python reference: n_hits = number of DISTINCT canonical phrase token
    tuples occurring as a whole-token n-gram of the doc. Random small
    alphabets force shared n-grams, repeated phrases, multi-length phrase
    sets, and phrase-longer-than-doc edges."""
    from ocr_endpoint_project_ray.pipelines.textops import decontaminate_hashed

    word = st.sampled_from(["aa", "bb", "cc", "dd", "e"])
    docs = [
        (i, " ".join(data.draw(st.lists(word, min_size=0, max_size=12))))
        for i in range(n_docs)
    ]
    phrases = [
        " ".join(data.draw(st.lists(word, min_size=0, max_size=4)))
        for _ in range(n_phrases)
    ]

    expected: dict[int, int] = {}
    canon = {tuple(p.split()) for p in phrases if p.split()}
    for i, text in docs:
        toks = text.split()
        hits = sum(
            1
            for pt in canon
            if len(pt) <= len(toks)
            and any(tuple(toks[j : j + len(pt)]) == pt for j in range(len(toks) - len(pt) + 1))
        )
        if hits:
            expected[i] = hits

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    )
    broad = {r["doc_id"]: r["n_hits"] for r in decontaminate_hashed(ds, phrases).take_all()}
    assert broad == expected
    dist = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate_hashed(
            ds, phrases, max_broadcast_phrases=0, num_partitions=2
        ).take_all()
    }
    assert dist == expected


# --- Bloom filter invariants (functions/sketch.py::BloomFilter) ----------

_BLOOM_GEOM = st.tuples(
    st.sampled_from([256, 1024, 4096]), st.integers(min_value=1, max_value=5)
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(alphabet=_CORPUS_ALPHABET, max_size=40), max_size=60),
    _BLOOM_GEOM,
    st.sampled_from(["blake2b", "md5"]),
)
def test_bloom_never_false_negative_and_split_merge(values, geom, hasher):
    import numpy as np

    from ocr_endpoint_project_ray.functions.sketch import BloomFilter

    m, k = geom
    whole = BloomFilter(m=m, k=k, hasher=hasher).add_many(values)
    if values:
        assert whole.contains_many(values).all()
    # arbitrary split + serialize roundtrip merges to the bulk filter
    cut = len(values) // 2
    a = BloomFilter(m=m, k=k, hasher=hasher).add_many(values[:cut])
    b = BloomFilter(m=m, k=k, hasher=hasher).add_many(values[cut:])
    merged = a.merge(BloomFilter.deserialize(b.serialize(), m, k, hasher))
    assert np.array_equal(merged.bits, whole.bits)


# --- BM25 per-batch statistics vs a naive tokenizer ----------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(alphabet=_CORPUS_ALPHABET, max_size=60)),
        max_size=20,
    ),
    st.lists(
        st.text(alphabet="abchjs ", min_size=1, max_size=6).filter(str.split),
        min_size=1,
        max_size=4,
        unique=True,
    ),
)
def test_bm25_tf_dl_matches_naive(texts, raw_terms):
    import re

    from ocr_endpoint_project_ray.functions.text import TOKEN_RE
    from ocr_endpoint_project_ray.stages.search import _tf_dl

    # dedupe first tokens (duplicate terms are a caller error by contract);
    # whitespace-only strings contribute no term
    terms = tuple(dict.fromkeys(w for t in raw_terms for w in t.split()[:1]))
    batch = pa.table({"text": pa.array(texts, pa.string())})
    tf, dl = _tf_dl(batch, terms, "text")
    tok = re.compile(TOKEN_RE)
    for row, t in enumerate(texts):
        ws = tok.findall(t or "")
        assert dl[row] == len(ws)
        for j, term in enumerate(terms):
            assert tf[row, j] == ws.count(term)


_WORDS = st.sampled_from(["a", "bb", "bb ", "", "ccc", "a a"])


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(_WORDS, max_size=12), min_size=1, max_size=6))
def test_collapse_repeats_matches_naive(docs):
    """q79's flat-stream kernel vs the obvious per-doc Python loop — the
    word pool deliberately includes '' and embedded-space tokens so the
    split produces empty tokens and adjacent runs across them."""
    from ocr_endpoint_project_ray.pipelines.textops import _collapse_repeats_batch

    texts = [" ".join(words) for words in docs]
    out = _collapse_repeats_batch(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).to_pylist()
    for row, text in zip(out, texts):
        toks = text.split(" ")
        kept = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
        assert row["n_tokens"] == len(toks)
        assert row["n_kept"] == len(kept)
        assert row["clean_text"] == " ".join(kept)


@_ray_settings
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 4),  # user
            st.integers(0, 10**9),  # ts (us)
            st.one_of(
                st.none(),
                st.decimals(
                    min_value=-100, max_value=100, places=2, allow_nan=False
                ),
            ),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_cumulative_window_matches_pandas(rows):
    """q78's keyed cumsum + LAG vs a sequential pandas reference: pandas
    cumsum accumulates left-to-right exactly like the kernel's per-user
    np.cumsum, so cum_value matches bit-exactly after the shared 2dp
    round. Null values follow the SQL frame rule (skip-but-carry: a null
    row shows the running sum; leading nulls show NULL) — pandas cumsum
    leaves NaN at the null row, so the reference forward-fills it."""
    from ocr_endpoint_project_ray.stages.windows import cumulative_window

    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "value"])
    df["value"] = df["value"].astype(float)
    df["event_id"] = range(len(df))
    tbl = pa.table(
        {
            "user_id": pa.array(df.user_id, pa.int64()),
            "event_id": pa.array(df.event_id, pa.int64()),
            "ts": pa.array(df.ts_us, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(df.value, pa.float64()),
        }
    )
    got = (
        pa.Table.from_pylist(
            cumulative_window(
                ray.data.from_arrow(tbl).repartition(4), num_partitions=2
            ).take_all()
        )
        .to_pandas()
        .sort_values(["user_id", "event_id"], ignore_index=True)
    )
    ref = df.sort_values(["user_id", "ts_us", "event_id"], ignore_index=True)
    ref["cum_value"] = (
        ref.groupby("user_id")["value"]
        .transform(lambda v: v.cumsum().ffill())
        .map(lambda v: v if pd.isna(v) else round(v, 2))
    )
    ref["ts_delta_us"] = ref["ts_us"] - ref.groupby("user_id")["ts_us"].shift(1)
    ref = ref.sort_values(["user_id", "event_id"], ignore_index=True)
    got_cum = [None if pd.isna(v) else v for v in got["cum_value"]]
    ref_cum = [None if pd.isna(v) else v for v in ref["cum_value"]]
    assert got_cum == ref_cum
    got_delta = [None if pd.isna(v) else int(v) for v in got["ts_delta_us"]]
    ref_delta = [None if pd.isna(v) else int(v) for v in ref["ts_delta_us"]]
    assert got_delta == ref_delta
