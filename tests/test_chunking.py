"""Edge-case tests for the training-sequence operators (stages/chunking.py):
chunk explosion on short/empty/null docs, packing's shuffled-input dispatch
parity with the range-partitioned fast path, repetition-signal null
semantics, and redaction null propagation. Oracle parity on the stock
corpus is covered by test_oracles' parametrized sweep (q56–q59)."""

from __future__ import annotations

import pyarrow as pa
import pytest

import ray.data

from ocr_endpoint_project_ray.stages.chunking import (
    chunk_tokens,
    pack_sequences,
    redact_pattern,
    top_bigram_stats,
)


def _docs(rows: list[tuple[int, str | None]]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


class TestChunkTokens:
    def test_window_stride_explode(self):
        ds = _docs([(1, " ".join(f"w{i}" for i in range(30)))])
        out = sorted(chunk_tokens(ds, window=16, stride=12).take_all(), key=lambda r: r["chunk_no"])
        # starts 0, 12, 24 -> lengths 16, 16, 6
        assert [(r["chunk_no"], r["n_tokens"]) for r in out] == [(0, 16), (1, 16), (2, 6)]
        assert out[0]["chunk_text"].split() == [f"w{i}" for i in range(16)]
        assert out[2]["chunk_text"].split() == [f"w{i}" for i in range(24, 30)]

    def test_short_empty_null_docs(self):
        ds = _docs([(1, "one two"), (2, ""), (3, None), (4, "   \t ")])
        out = chunk_tokens(ds, window=16, stride=12).take_all()
        # only doc 1 emits (a single short chunk); 0-token docs emit nothing
        assert [(r["doc_id"], r["chunk_no"], r["n_tokens"]) for r in out] == [(1, 0, 2)]

    def test_stride_validation(self):
        with pytest.raises(ValueError):
            chunk_tokens(_docs([(1, "a")]), stride=0)


class TestPackSequences:
    def test_contiguous_fill_rule(self):
        # token counts: 3, 4, 5, 2 -> exclusive prefix 0, 3, 7, 12 -> //5 = 0,0,1,2
        ds = _docs([(0, "a b c"), (1, "a b c d"), (2, "a b c d e"), (3, "a b")])
        out = {r["doc_id"]: r["seq_id"] for r in pack_sequences(ds, target_tokens=5).take_all()}
        assert out == {0: 0, 1: 0, 2: 1, 3: 2}

    def test_shuffled_blocks_match_sorted_path(self):
        """Input whose blocks interleave doc_id must be range-shuffled once
        and produce the identical assignment as presorted input."""
        texts = [(i, " ".join("t" for _ in range(1 + i % 7))) for i in range(100)]
        sorted_ds = _docs(texts).repartition(4)
        # reverse order + repartition -> overlapping id ranges across blocks
        shuffled_ds = _docs(texts[::-1]).repartition(4)
        a = sorted(
            pack_sequences(sorted_ds, target_tokens=16).take_all(),
            key=lambda r: r["doc_id"],
        )
        b = sorted(
            pack_sequences(shuffled_ds, target_tokens=16).take_all(),
            key=lambda r: r["doc_id"],
        )
        assert a == b
        # global invariant: seq_id is nondecreasing in doc_id order
        seqs = [r["seq_id"] for r in a]
        assert seqs == sorted(seqs)

    def test_null_text_counts_zero(self):
        ds = _docs([(0, "a b c d e"), (1, None), (2, "a")])
        out = {r["doc_id"]: (r["n_tokens"], r["seq_id"]) for r in pack_sequences(ds, target_tokens=5).take_all()}
        assert out == {0: (5, 0), 1: (0, 1), 2: (1, 1)}


class TestTopBigram:
    def test_repeated_bigram(self):
        ds = _docs([(1, "a b a b a"), (2, "x"), (3, None)])
        out = {r["doc_id"]: (r["top_bigram_count"], r["top_bigram_frac"]) for r in top_bigram_stats(ds).take_all()}
        # doc 1: bigrams (a,b)x2 (b,a)x2 -> top 2 of 4
        assert out[1] == (2, 0.5)
        assert out[2] == (0, None)
        assert out[3] == (0, None)


class TestRedact:
    def test_replacement_and_count(self):
        ds = _docs([(1, "key is a value of keys"), (2, None), (3, "nothing")])
        out = {r["doc_id"]: (r["redacted"], r["n_masked"]) for r in redact_pattern(ds, pattern=r"\b(key|value)\b").take_all()}
        # \b excludes 'keys'
        assert out[1] == ("[REDACTED] is a [REDACTED] of keys", 2)
        assert out[2] == (None, None)
        assert out[3] == ("nothing", 0)


def test_pack_sequences_duplicate_ids_pack_coherently_or_refuse():
    """Duplicate order-key values spread across blocks trigger the sort
    fallback. If the range sort consolidates the run into one block the
    packing proceeds and must be coherent; if equal ids still straddle a
    boundary the operator must raise (offset lookup would collide) — either
    way, never a silent mis-packing."""
    dup = _docs([(5, "a b"), (5, "c"), (5, "d e f"), (6, "g")]).repartition(3)
    try:
        rows = pack_sequences(dup, target_tokens=4).take_all()
    except ValueError as e:
        assert "unique" in str(e)
        return
    by_id6 = [r for r in rows if r["doc_id"] == 6]
    # id 6 sorts after every id-5 row: its exclusive prefix is the full
    # id-5 token mass (2+1+3=6) -> seq 6//4 = 1, regardless of tie order
    assert [r["seq_id"] for r in by_id6] == [1]
    assert sorted(r["n_tokens"] for r in rows) == [1, 1, 2, 3]
    assert all(r["seq_id"] in (0, 1) for r in rows)


# ---------------------------------------------------------------------------
# Property tests vs naive references — the property under test is the
# DISTRIBUTED machinery (explode across batches, prefix sum across random
# block splits), so the naive refs share the engine's TOKEN_RE tokenizer.
# ---------------------------------------------------------------------------

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ocr_endpoint_project_ray.functions.text import TOKEN_RE

_TOK = re.compile(TOKEN_RE)
_texts = st.lists(
    st.text(alphabet=" ab\t\n.", max_size=40), min_size=0, max_size=12
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_texts, st.integers(1, 6), st.integers(1, 8), st.integers(1, 4))
def test_chunk_tokens_matches_naive(texts, stride, window, nblocks):
    rows = list(enumerate(texts))
    expect = sorted(
        (i, c, " ".join(ws[s : s + window]), min(s + window, len(ws)) - s)
        for i, t in rows
        for ws in [_TOK.findall(t)]
        for c, s in enumerate(range(0, len(ws), stride))
    )
    ds = _docs(rows).repartition(nblocks)
    got = sorted(
        (r["doc_id"], r["chunk_no"], r["chunk_text"], r["n_tokens"])
        for r in chunk_tokens(ds, window=window, stride=stride).take_all()
    )
    assert got == expect


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_texts, st.integers(1, 16), st.integers(1, 4))
def test_pack_sequences_matches_naive(texts, target, nblocks):
    rows = list(enumerate(texts))
    acc, expect = 0, []
    for i, t in rows:  # already in doc_id order
        n = len(_TOK.findall(t))
        expect.append((i, n, acc // target))
        acc += n
    ds = _docs(rows).repartition(nblocks)
    got = sorted(
        (r["doc_id"], r["n_tokens"], r["seq_id"])
        for r in pack_sequences(ds, target_tokens=target).take_all()
    )
    assert got == sorted(expect)
