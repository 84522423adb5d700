"""Training-sequence construction queries (q56–q59): token-window chunking,
order-preserving sequence packing, repetition signals, and pattern
redaction — the corpus→training-batch steps of an LLM data pipeline, each
with an exact DuckDB oracle.

All four share the repo-wide token definition (functions/text.py::TOKEN_RE,
RE2 ``\\S+``) and its generated SQL char-class twin
(pipelines/textops.py::_SQL_TOKEN_PATTERN), per CLAUDE.md's one-token-
definition rule.

Reference analogue: none — SURVEY §2.8 training-data extensions (the
reference stops at extraction/scoring)."""

from __future__ import annotations

import ray.data

from ..sources.tables import read_table
from ..stages.chunking import (
    chunk_tokens,
    pack_sequences,
    redact_pattern,
    top_bigram_stats,
)
from .textops import _SQL_TOKEN_PATTERN

#: RE2 scrub pattern for q59 — PII-shaped machinery (the pattern is the
#: parameter); word-boundary alternation exercises real regex semantics on
#: the synthetic corpus, whose texts contain these terms throughout.
_REDACT_PATTERN = r"\b(key|value)\b"


def q56_chunk_tokens(sf_dir: str) -> ray.data.Dataset:
    """Overlapping fixed-token-window chunking (window 16, stride 12) —
    the context-window construction explode (stages/chunking.py::
    chunk_tokens). 1→N streaming map, no shuffle."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_tokens(ds, window=16, stride=12)


def q57_pack_sequences(sf_dir: str) -> ray.data.Dataset:
    """Fixed-token-budget sequence packing in doc_id order via a
    distributed exclusive prefix sum — two streaming passes, O(num_blocks)
    driver state, no shuffle on range-partitioned input
    (stages/chunking.py::pack_sequences)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(ds, target_tokens=256)


def q58_top_bigram(sf_dir: str) -> ray.data.Dataset:
    """Gopher-style repetition signal: most-frequent word-2-gram count and
    its share of all 2-grams per document (stages/chunking.py::
    top_bigram_stats)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return top_bigram_stats(ds)


def q59_redact_terms(sf_dir: str) -> ray.data.Dataset:
    """Vectorized RE2 scrub + per-doc match count (stages/chunking.py::
    redact_pattern) — the PII-redaction transform shape."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return redact_pattern(ds, pattern=_REDACT_PATTERN)


#: SQL twin of q56. DuckDB list slices are 1-based INCLUSIVE: the engine's
#: ``ws[start : start+window]`` is ``ts[start+1 : start+window]`` clamped by
#: least(); range(0, len, stride) enumerates exactly the engine's chunk
#: starts (empty for 0-token docs, which emit no chunks on both sides).
Q56_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
st AS (
  SELECT doc_id, ts, CAST(s.s AS BIGINT) AS start
  FROM tok, unnest(range(0, len(ts), 12)) AS s(s)
)
SELECT doc_id,
       start // 12 AS chunk_no,
       array_to_string(ts[CAST(start + 1 AS INTEGER):CAST(least(start + 16, len(ts)) AS INTEGER)], ' ') AS chunk_text,
       least(start + 16, len(ts)) - start AS n_tokens
FROM st
"""

#: SQL twin of q57 — the packing rule IS a window function: seq_id =
#: floor(exclusive-prefix-sum(n_tokens) / 256) in doc_id order. SUM OVER on
#: BIGINT yields HUGEINT; CAST restores the engine's int64.
Q57_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (
            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) // 256 AS BIGINT) AS seq_id
FROM tok
"""

#: SQL twin of q58. Tokens contain no whitespace, so the ' '-joined bigram
#: key is injective (no tuple/string collision); mc/tot is one int/int
#: double division on both sides — hash-exact. Docs with <2 tokens have no
#: bigram rows: LEFT JOIN gives count 0, NULL fraction (the engine's 0/0).
Q58_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(COALESCE(text, ''), '{_SQL_TOKEN_PATTERN}') AS ts
  FROM documents
),
bg AS (
  SELECT doc_id, ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i + 1 AS INTEGER)] AS b
  FROM tok, unnest(range(1, len(ts))) AS t(i)
),
cnt AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b),
top AS (SELECT doc_id, max(c) AS mc, sum(c) AS tot FROM cnt GROUP BY doc_id)
SELECT t.doc_id,
       COALESCE(mc, 0) AS top_bigram_count,
       CAST(mc AS DOUBLE) / tot AS top_bigram_frac
FROM tok t LEFT JOIN top USING (doc_id)
"""

#: SQL twin of q59 — both engines compile the pattern with RE2 (pyarrow
#: replace/count_substring_regex; DuckDB regexp_replace/'g' +
#: regexp_extract_all), so replacement text and match counts agree exactly
#: for ANY pattern; NULL text propagates NULL on both sides.
Q59_ORACLE = f"""
SELECT doc_id,
       regexp_replace(text, '{_REDACT_PATTERN}', '[REDACTED]', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{_REDACT_PATTERN}')) AS BIGINT) AS n_masked
FROM documents
"""

CHUNK_QUERIES = {
    "q56_chunk_tokens": q56_chunk_tokens,
    "q57_pack_sequences": q57_pack_sequences,
    "q58_top_bigram": q58_top_bigram,
    "q59_redact_terms": q59_redact_terms,
}

CHUNK_ORACLES = {
    "q56_chunk_tokens": Q56_ORACLE,
    "q57_pack_sequences": Q57_ORACLE,
    "q58_top_bigram": Q58_ORACLE,
    "q59_redact_terms": Q59_ORACLE,
}
