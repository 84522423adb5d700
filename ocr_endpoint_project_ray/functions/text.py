"""Text analysis primitives — vectorized over Arrow string arrays.

Normalization follows the reference's ``normalize_words``
(``ocr_common.py:111-115``: lowercase, ``[^\\w\\s]``→space, split); tokenizing,
quality scoring, language-ID and fingerprinting are the training-data-pipeline
extensions (SURVEY.md §2 extras). Hot paths use ``pyarrow.compute`` kernels;
the few per-row ops (hashing) loop only over a batch's Python strings once.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Normalization (reference: ocr_common.py:111-115)
# ---------------------------------------------------------------------------

_PUNCT_RE = re.compile(r"[^\w\s]")


def normalize_words(text: str) -> list[str]:
    """Lowercase, replace punctuation with spaces, split into words."""
    return _PUNCT_RE.sub(" ", (text or "").lower()).split()


def normalize_text_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized: lowercase + punctuation→space + whitespace-collapse.

    Must agree with :func:`normalize_words` (Python ``re``): Python's ``\\w``
    is Unicode (letters ∪ numbers ∪ '_'), but RE2's ``\\w`` is ASCII-only —
    using it here would strip Arabic/accented text (the reference corpus is
    fr/en/ar). Spell the classes out for RE2.
    """
    lowered = pc.utf8_lower(arr)
    no_punct = pc.replace_substring_regex(lowered, r"[^\p{L}\p{N}_\s]", " ")
    collapsed = pc.replace_substring_regex(no_punct, r"\s+", " ")
    return pc.utf8_trim_whitespace(collapsed)


# ---------------------------------------------------------------------------
# Token counting
# ---------------------------------------------------------------------------

#: BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols —
#: the common GPT-2-style pre-split shape (public pattern), no model needed.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


#: ASCII-whitespace token pattern — the RE2 ``\S`` definition, usable
#: identically from Python re, pyarrow (RE2) and DuckDB (RE2), so engine and
#: SQL oracle agree by construction. (``str.split()`` differs only on exotic
#: Unicode whitespace like NBSP, which it treats as a separator.)
TOKEN_RE = r"[^ \t\n\r\f\v]+"


def count_tokens_ws(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per string: maximal runs of non-(ASCII-)space
    characters, vectorized. 0 for empty/whitespace-only strings."""
    return pc.count_substring_regex(arr, TOKEN_RE)


def count_tokens_bpe(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    """BPE-ish token count per string (regex pre-tokenizer), vectorized."""
    return pc.count_substring_regex(arr, _BPE_RE.pattern)


# ---------------------------------------------------------------------------
# Quality scoring (length / character-class ratios / stopword ratio)
# ---------------------------------------------------------------------------


def quality_features(arr: pa.ChunkedArray | pa.Array) -> dict[str, pa.Array]:
    """Per-string quality features, all vectorized.

    Ratios use ASCII character classes (``[a-zA-Z]`` etc.) so they are
    byte-stable across locales and reproducible in ANSI SQL oracles.
    Empty strings yield 0.0 ratios.
    """
    n_chars = pc.utf8_length(arr)
    denom = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    nf = pc.cast(n_chars, pa.float64())

    def ratio(pattern: str) -> pa.Array:
        cnt = pc.cast(pc.count_substring_regex(arr, pattern), pa.float64())
        r = pc.divide(cnt, denom)
        return pc.if_else(pc.equal(nf, 0.0), pa.scalar(0.0), r)

    return {
        "n_chars": pc.cast(n_chars, pa.int64()),
        "alpha_ratio": ratio(r"[a-zA-Z]"),
        "digit_ratio": ratio(r"[0-9]"),
        "space_ratio": ratio(r" "),
        "punct_ratio": ratio(r"[.,;:!?]"),
    }


#: Tiny stopword lists for the language-ID heuristic (public common words).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "was", "on", "as"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "dans", "pour", "que"},
    "ar": {"في", "من", "على", "إلى", "عن", "هذا", "هذه", "التي", "الذي", "مع", "كان", "أن"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "en", "por", "que", "con"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "in", "mit", "von", "zu", "den"},
}


def detect_language(text: str) -> str:
    """Stopword-overlap language ID; 'und' when no evidence.

    Generalizes the reference corpus's fr/en/ar stratification
    (``ground_truth_database/DATABASE.md``): the engine must tag language at
    scale instead of reading it from curated metadata.
    """
    words = set(normalize_words(text)[:512])
    if not words:
        return "und"
    best, best_hits = "und", 0
    for lang in sorted(_STOPWORDS):
        hits = len(words & _STOPWORDS[lang])
        if hits > best_hits:
            best, best_hits = lang, hits
    return best


def detect_language_batch(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    texts = arr.to_pylist()
    return pa.array([detect_language(t or "") for t in texts], pa.string())


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


def md5_hex(text: str) -> str:
    return hashlib.md5((text or "").encode("utf-8")).hexdigest()


def md5_hex_batch(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return pa.array([md5_hex(t) for t in arr.to_pylist()], pa.string())


_ROLL_BASE = np.uint64(1000003)


#: Fingerprint field: Mersenne prime 2^31-1. Chosen (over wraparound-2^64)
#: so the DuckDB oracle can mirror the arithmetic exactly — 64-bit products
#: would overflow HUGEINT, (codepoint * pow) % p fits comfortably.
_FP_MOD = 2147483647


def rolling_fingerprint(text: str, window: int = 16) -> int:
    """Document fingerprint: XOR of rolling polynomial hashes (mod 2^31-1,
    base ``_ROLL_BASE``) over ``window``-codepoint windows — content-derived
    and shift-tolerant. Docs shorter than ``window`` hash their full
    codepoint sequence. SQL-oracled (q42): DuckDB reproduces it with
    unicode()/bit_xor over the same windows."""
    cps = np.frombuffer((text or "").encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    n = len(cps)
    if n == 0:
        return 0
    w = min(window, n)
    pows = np.array(
        [pow(int(_ROLL_BASE), w - 1 - j, _FP_MOD) for j in range(w)], dtype=np.uint64
    )
    # per-term mod keeps everything < 2^52 (cp < 2^21, pow < 2^31): exact in
    # uint64, no wraparound — the XOR over ALL windows keeps long shared
    # prefixes from colliding
    windows = np.lib.stride_tricks.sliding_window_view(cps, w)
    terms = (windows * pows[None, :]) % np.uint64(_FP_MOD)
    hashes = terms.sum(axis=1) % np.uint64(_FP_MOD)
    return int(np.bitwise_xor.reduce(hashes.astype(np.int64)))


# ---------------------------------------------------------------------------
# Shingles / n-grams (for Jaccard & MinHash dedup)
# ---------------------------------------------------------------------------


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = normalize_words(text)
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)
