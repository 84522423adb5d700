"""Unit tests for metrics / text / html / json operators (FIXTURES.md §6)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ocr_endpoint_project_ray.functions.html import strip_boilerplate
from ocr_endpoint_project_ray.functions.jsonx import (
    parse_json_from_response,
    strip_extra_keys_to_schema,
    validate_against_schema,
)
from ocr_endpoint_project_ray.functions.metrics import (
    cer,
    edit_distance,
    layout_accuracy,
    leaf_accuracy,
    wer,
    word_metrics,
)
from ocr_endpoint_project_ray.functions.text import (
    count_tokens_ws,
    detect_language,
    jaccard,
    normalize_text_array,
    normalize_words,
    quality_features,
    rolling_fingerprint,
    word_ngrams,
)
from ocr_endpoint_project_ray.schema import RESUME_JSON_SCHEMA


class TestEditDistance:
    def test_identical(self):
        assert edit_distance(list("kitten"), list("kitten")) == 0

    def test_known(self):
        assert edit_distance(list("kitten"), list("sitting")) == 3
        assert edit_distance(list("abc"), list("adc")) == 1

    def test_empty(self):
        assert edit_distance([], list("abc")) == 3
        assert edit_distance(list("abc"), []) == 3

    def test_tokens(self):
        assert edit_distance(["a", "b", "c"], ["a", "c"]) == 1


class TestCerWer:
    def test_empty_gt_is_zero(self):
        assert cer("", "anything") == 0.0
        assert wer("", "anything") == 0.0

    def test_identical(self):
        assert cer("hello world", "hello world") == 0.0
        assert wer("hello world", "hello world") == 0.0

    def test_single_edit(self):
        assert cer("abcd", "abed") == pytest.approx(25.0)

    def test_wer_normalization(self):
        # punctuation and case must not count as errors (ocr_common.py:111-115)
        assert wer("Hello, World!", "hello world") == 0.0


class TestLayoutAccuracy:
    def test_no_headers_is_100(self):
        assert layout_accuracy("just some lowercase prose here\nand more", "x") == 100.0

    def test_header_found(self):
        gt = "EXPERIENCE\nworked at a company doing software things\nEDUCATION\nthe university of somewhere"
        assert layout_accuracy(gt, "experience blah education") == 100.0
        assert layout_accuracy(gt, "experience only mentioned") == 50.0

    def test_header_filters(self):
        assert layout_accuracy("A" * 61, "x") == 100.0  # too long
        assert layout_accuracy("SECTION -- TITLE", "x") == 100.0  # contains --
        assert layout_accuracy("1234 56", "x") == 100.0  # <40% alpha / <2 letters
        assert layout_accuracy("Ends with,", "x") == 100.0  # trailing comma


class TestWordMetrics:
    def test_empty_gt(self):
        m = word_metrics("", "whatever")
        assert m["accuracy_pct"] == 100.0 and m["cer_pct"] == 0.0

    def test_missing_extra_dedup_order(self):
        m = word_metrics("alpha beta alpha gamma", "beta delta delta")
        assert m["missing_words"] == ["alpha", "gamma"]
        assert m["extra_words"] == ["delta"]
        assert m["accuracy_pct"] == pytest.approx(25.0)


class TestLeafAccuracy:
    def test_identical(self):
        obj = {"a": 1, "b": [{"c": "x"}, {"c": "y"}]}
        assert leaf_accuracy(obj, obj) == 100.0

    def test_order_sensitive(self):
        gt = {"experiences": [{"t": "one"}, {"t": "two"}]}
        swapped = {"experiences": [{"t": "two"}, {"t": "one"}]}
        assert leaf_accuracy(gt, swapped) == 0.0

    def test_normalization(self):
        assert leaf_accuracy({"a": "  X  "}, {"a": "x"}) == 100.0
        assert leaf_accuracy({"a": True}, {"a": "true"}) == 100.0
        assert leaf_accuracy({"a": None}, {}) == 100.0  # None normalizes to ""


class TestJson:
    def test_direct(self):
        assert parse_json_from_response('{"a": 1}') == {"a": 1}

    def test_fenced(self):
        assert parse_json_from_response('text ```json\n{"a": 1}\n``` more') == {"a": 1}

    def test_brace_scan(self):
        assert parse_json_from_response('prefix {"a": {"b": "}"}} suffix') == {"a": {"b": "}"}}

    def test_invalid(self):
        assert parse_json_from_response("no json here") is None
        assert parse_json_from_response("") is None

    def test_strip_extra_keys(self):
        obj = {"name": "x", "bogus": 1, "skills": [{"category": "c", "items": ["a"], "junk": 2}]}
        cleaned = strip_extra_keys_to_schema(obj, RESUME_JSON_SCHEMA)
        assert "bogus" not in cleaned
        assert cleaned["skills"][0] == {"category": "c", "items": ["a"]}

    def test_validate(self):
        ok, err, cleaned = validate_against_schema({"name": "x", "junk": 5}, RESUME_JSON_SCHEMA)
        assert ok and err is None and "junk" not in cleaned
        ok, err, _ = validate_against_schema({"open_to_work": "yes"}, RESUME_JSON_SCHEMA)
        assert not ok and err


class TestText:
    def test_normalize_words(self):
        assert normalize_words("Hello, World! Don't") == ["hello", "world", "don", "t"]

    def test_normalize_array_matches_scalar(self):
        arr = pa.array(["Hello, World!", "", "  a  b  "])
        out = normalize_text_array(arr).to_pylist()
        assert out == ["hello world", "", "a b"]

    def test_token_count_ws(self):
        arr = pa.array(["a b  c", "", "   ", "one"])
        assert count_tokens_ws(arr).to_pylist() == [3, 0, 0, 1]
        # must match str.split() exactly
        for s in ["a\tb\nc", " x ", "", "a  b"]:
            assert count_tokens_ws(pa.array([s])).to_pylist()[0] == len(s.split())

    def test_quality_features(self):
        feats = quality_features(pa.array(["ab1 .", ""]))
        assert feats["n_chars"].to_pylist() == [5, 0]
        assert feats["alpha_ratio"].to_pylist()[0] == pytest.approx(0.4)
        assert feats["alpha_ratio"].to_pylist()[1] == 0.0

    def test_langid(self):
        assert detect_language("the cat sat on the mat and it was good") == "en"
        assert detect_language("le chat est dans la maison pour une heure") == "fr"
        assert detect_language("هذا النص في اللغة العربية من أجل الاختبار على كل حال") == "ar"
        assert detect_language("") == "und"

    def test_fingerprint_deterministic(self):
        a = rolling_fingerprint("some document text here for fingerprinting")
        b = rolling_fingerprint("some document text here for fingerprinting")
        assert a == b != 0
        assert rolling_fingerprint("") == 0

    def test_ngrams_jaccard(self):
        a = word_ngrams("the quick brown fox jumps", 3)
        b = word_ngrams("the quick brown fox leaps", 3)
        assert 0 < jaccard(a, b) < 1
        assert jaccard(set(), set()) == 1.0


class TestHtmlStrip:
    def test_main_content_survives(self):
        html = (
            "<html><body><nav><a href='/'>Home</a></nav>"
            "<p>This is the real main content of the page.</p>"
            "<footer>© 2026 Corp</footer></body></html>"
        )
        assert strip_boilerplate(html) == "This is the real main content of the page."

    def test_link_farm_dropped(self):
        html = (
            "<body><p>Substantive paragraph with plenty of real text.</p>"
            "<ul><li><a href='/a'>Link one here</a></li><li><a href='/b'>Link two here</a></li></ul></body>"
        )
        assert strip_boilerplate(html) == "Substantive paragraph with plenty of real text."

    def test_empty(self):
        assert strip_boilerplate("") == ""

    def test_malformed_degrades(self):
        out = strip_boilerplate("<p>unclosed <b>bold text and more words here")
        assert "bold text" in out
