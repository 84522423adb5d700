"""Pairwise scoring metrics — CER / WER / layout accuracy / word metrics /
JSON leaf accuracy.

Semantics match the reference exactly (cited per function) so golden-fixture
comparisons carry over; the implementation is new: the edit-distance DP inner
loop is vectorized with numpy (O(n) numpy row ops instead of a Python O(n·m)
double loop), which is what makes per-row scoring viable inside
``map_batches`` at scale.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .text import normalize_words

# ---------------------------------------------------------------------------
# Edit distance (reference semantics: ocr_common.py:118-133)
# ---------------------------------------------------------------------------


def edit_distance(ref: list | str, hyp: list | str) -> int:
    """Levenshtein distance over two sequences (tokens or characters).

    numpy-vectorized rows: for row i, ``t[j] = min(prev[j]+1, prev[j-1]+cost)``
    is elementwise; the sequential insertion dependency
    ``cur[j] = min(t[j], cur[j-1]+1)`` is resolved in closed form as
    ``cur = min.accumulate(t - arange) + arange``.
    """
    if not ref:
        return len(hyp)
    if not hyp:
        return len(ref)
    # interning dict → ids: collision-free by construction (Python hash()
    # could collide two distinct tokens and silently undercount edits)
    ids: dict = {}
    r = np.asarray([ids.setdefault(x, len(ids)) for x in ref], dtype=np.int64)
    h = np.asarray([ids.setdefault(x, len(ids)) for x in hyp], dtype=np.int64)
    m = len(h)
    idx = np.arange(1, m + 1, dtype=np.int64)
    prev = np.arange(0, m + 1, dtype=np.int64)
    for i in range(len(r)):
        cost = (h != r[i]).astype(np.int64)
        t = np.minimum(prev[1:] + 1, prev[:-1] + cost)
        t = np.concatenate(([i + 1], t))  # boundary: cur[0] = i+1
        arange = np.arange(m + 1, dtype=np.int64)
        cur = np.minimum.accumulate(t - arange) + arange
        prev = cur
    return int(prev[-1])


def cer(ground_truth: str, prediction: str) -> float:
    """Character error rate %, 0.0 when ref empty (ocr_common.py:136-141)."""
    gt = (ground_truth or "").strip()
    pred = (prediction or "").strip()
    if not gt:
        return 0.0
    return edit_distance(list(gt), list(pred)) / len(gt) * 100.0


def wer(ground_truth: str, prediction: str) -> float:
    """Word error rate % over normalized words (ocr_common.py:144-149)."""
    gt_words = normalize_words(ground_truth)
    pred_words = normalize_words(prediction)
    if not gt_words:
        return 0.0
    return edit_distance(gt_words, pred_words) / len(gt_words) * 100.0


# ---------------------------------------------------------------------------
# Layout accuracy (reference semantics: ocr_common.py:152-170)
# ---------------------------------------------------------------------------


def _is_section_header(line: str) -> bool:
    s = line.strip()
    if not s or len(s) > 60 or "--" in s or "—" in s:
        return False
    letters = [c for c in s if c.isalpha()]
    if len(letters) < 2 or len(letters) / len(s) < 0.4:
        return False
    if s.isupper():
        return True
    return s[0].isupper() and not s.endswith((",", "."))


def layout_accuracy(ground_truth: str, prediction: str) -> float:
    """Heuristic section-header recall %, 100.0 when GT has no headers."""
    headers = [ln.strip() for ln in (ground_truth or "").splitlines() if _is_section_header(ln)]
    headers = list(dict.fromkeys(headers))[:30]  # dedup keep-order, cap 30
    if not headers:
        return 100.0
    pred_lower = (prediction or "").lower()
    found = sum(1 for h in headers if h.lower() in pred_lower)
    return found / len(headers) * 100.0


# ---------------------------------------------------------------------------
# Word metrics bundle (reference semantics: ocr_common.py:173-201)
# ---------------------------------------------------------------------------


def word_metrics(ground_truth: str, prediction: str) -> dict[str, Any]:
    if ground_truth == prediction and ground_truth:
        # identical strings score perfectly by definition — skip the O(n²)
        # DPs (the extraction-vs-golden stage matches exactly by design, so
        # this halves the scoring pipeline's Levenshtein work)
        return {
            "accuracy_pct": 100.0,
            "cer_pct": 0.0,
            "wer_pct": 0.0,
            "layout_accuracy_pct": 100.0,
            "missing_words": [],
            "extra_words": [],
        }
    gt_words = normalize_words(ground_truth)
    pred_words = normalize_words(prediction)
    if not gt_words:
        # Reference (ocr_common.py word_metrics) still reports the deduped
        # prediction words as extra when the ground truth is empty.
        return {
            "accuracy_pct": 100.0,
            "cer_pct": 0.0,
            "wer_pct": 0.0,
            "layout_accuracy_pct": 100.0,
            "missing_words": [],
            "extra_words": list(dict.fromkeys(pred_words)),
        }
    gt_set, pred_set = set(gt_words), set(pred_words)
    found = sum(1 for w in gt_words if w in pred_set)
    missing = list(dict.fromkeys(w for w in gt_words if w not in pred_set))
    extra = list(dict.fromkeys(w for w in pred_words if w not in gt_set))
    return {
        "accuracy_pct": found / len(gt_words) * 100.0,
        "cer_pct": cer(ground_truth, prediction),
        "wer_pct": wer(ground_truth, prediction),
        "layout_accuracy_pct": layout_accuracy(ground_truth, prediction),
        "missing_words": missing,
        "extra_words": extra,
    }


# ---------------------------------------------------------------------------
# JSON leaf accuracy (reference: pages/llm_parsing_benchmark.py:317-350)
# ---------------------------------------------------------------------------


def flatten_leaves(obj: Any, prefix: str = "") -> list[tuple[str, Any]]:
    """Nested JSON → (dotted-path, leaf) pairs; list paths are positional
    (``experiences[0].x``) so the metric is order-sensitive."""
    out: list[tuple[str, Any]] = []
    if isinstance(obj, dict):
        for k in obj:
            out.extend(flatten_leaves(obj[k], f"{prefix}.{k}" if prefix else str(k)))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.extend(flatten_leaves(v, f"{prefix}[{i}]"))
    else:
        out.append((prefix, obj))
    return out


def normalize_value(v: Any) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v).strip().lower()


def leaf_accuracy(ground_truth: Any, prediction: Any) -> float:
    """% of GT leaves whose normalized value equals prediction at the same
    dotted path; 100.0 for empty GT."""
    gt_leaves = flatten_leaves(ground_truth)
    if not gt_leaves:
        return 100.0
    pred_map = dict(flatten_leaves(prediction))
    ok = sum(
        1
        for path, val in gt_leaves
        if normalize_value(pred_map.get(path)) == normalize_value(val)
    )
    return ok / len(gt_leaves) * 100.0
