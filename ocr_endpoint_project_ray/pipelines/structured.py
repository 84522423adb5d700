"""Structured-parse pipeline: text → (stub) model output → robust JSON
extraction → schema projection/validation → leaf-accuracy scoring.

The distributed re-expression of the reference's LLM stage
(``cv_api/pipeline.py:162-229`` run_llm_stage; robust parse
``cv_api/resume_schema.py:134-184``; validation ``:201-213``; order-sensitive
leaf accuracy ``pages/llm_parsing_benchmark.py:317-350``). The remote LLM is
replaced by a deterministic stub "parser model" (a function of the input
text) that emits the reference's failure modes on purpose — fenced JSON,
prose-wrapped JSON, truncated JSON, extra keys — so the robust-parse /
validate / in-band-error path is exercised for real. Errors are data
(``error`` column), never exceptions (≙ PipelineError taxonomy,
``cv_api/pipeline.py:26-38``).
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data

from ..functions.jsonx import parse_json_from_response, validate_against_schema
from ..functions.metrics import leaf_accuracy
from ..functions.text import normalize_words
from ..schema import RESUME_JSON_SCHEMA
from ..sources.tables import read_table


def stub_model_record(text: str) -> dict:
    """Deterministic structured record for a document (the 'ground truth'
    the stub model should recover)."""
    words = normalize_words(text)
    name = " ".join(words[:2]).title() if words else None
    skills = sorted(set(words[2:10]))
    return {
        "name": name,
        "location": words[10].title() if len(words) > 10 else None,
        "about": " ".join(words[:8]) or None,
        "open_to_work": (len(words) % 2 == 0),
        "experiences": [
            {
                "position_title": " ".join(words[i : i + 2]).title(),
                "institution_name": (words[i + 2].title() if len(words) > i + 2 else "Unknown"),
            }
            for i in range(11, min(len(words), 17), 3)
        ],
        "educations": [],
        "skills": [{"category": "general", "items": skills}] if skills else [],
        "projects": [],
        "interests": words[17:19],
        "accomplishments": [],
        "contacts": [],
    }


def stub_model_response(doc_id: int, text: str) -> str:
    """Model-output text with the reference's observed failure modes:
    0: clean JSON; 1: fenced ```json; 2: prose-wrapped JSON with extra keys;
    3: invalid/truncated JSON (parse failure — stays in-band)."""
    record = stub_model_record(text)
    mode = int(doc_id) % 4
    if mode == 0:
        return json.dumps(record)
    if mode == 1:
        return "Here is the extraction:\n```json\n" + json.dumps(record) + "\n```"
    if mode == 2:
        noisy = dict(record)
        noisy["confidence"] = 0.97  # extra key the schema must strip
        return "Sure! The structured record is " + json.dumps(noisy) + " — let me know."
    return json.dumps(record)[: max(10, len(json.dumps(record)) // 2)]  # truncated


def parse_batch(batch: pa.Table) -> pa.Table:
    """map_batches: (doc_id, response) → parsed/validated record + flags."""
    ids = batch.column("doc_id").to_pylist()
    responses = batch.column("response").to_pylist()
    out = {
        "doc_id": ids,
        "json_valid": [],
        "schema_valid": [],
        "accuracy_pct": [],
        "error": [],
        "record_json": [],
    }
    golds = batch.column("golden_json").to_pylist()
    for resp, gold_s in zip(responses, golds):
        obj = parse_json_from_response(resp)
        if obj is None:
            out["json_valid"].append(0)
            out["schema_valid"].append(0)
            out["accuracy_pct"].append(0.0)
            out["error"].append("PARSING_JSON_INVALID")
            out["record_json"].append(None)
            continue
        ok, err, cleaned = validate_against_schema(obj, RESUME_JSON_SCHEMA)
        gold = json.loads(gold_s)
        acc = leaf_accuracy(gold, cleaned)
        out["json_valid"].append(1)
        out["schema_valid"].append(1 if ok else 0)
        out["accuracy_pct"].append(acc)
        out["error"].append(None if ok else f"PARSING_SCHEMA_VALIDATION_FAILED: {err}")
        out["record_json"].append(json.dumps(cleaned, sort_keys=True))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "json_valid": pa.array(out["json_valid"], pa.int8()),
            "schema_valid": pa.array(out["schema_valid"], pa.int8()),
            "accuracy_pct": pa.array(out["accuracy_pct"], pa.float64()),
            "error": pa.array(out["error"], pa.string()),
            "record_json": pa.array(out["record_json"], pa.string()),
        }
    )


def _respond_batch(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "response": pa.array(
                [stub_model_response(i, t or "") for i, t in zip(ids, texts)], pa.string()
            ),
            "golden_json": pa.array(
                [json.dumps(stub_model_record(t or "")) for t in texts], pa.string()
            ),
        }
    )


def structured_parse_pipeline(sf_dir: str) -> ray.data.Dataset:
    """documents → stub model responses → robust parse/validate/score.

    The per-doc model/parse work is Python-heavy, so the single-file read is
    split across the cluster first (cheap split repartition; measured
    8.0 s → 4.9 s at 32 CPUs) — a real corpus arrives as many fragments and
    skips this."""
    from ..context import default_num_partitions

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"]).repartition(
        default_num_partitions(per_cpu=1)
    )
    responses = docs.map_batches(
        _respond_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return responses.map_batches(
        parse_batch, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def x_structured_parse(sf_dir: str) -> ray.data.Dataset:
    out = structured_parse_pipeline(sf_dir)
    return out.drop_columns(["record_json"])


#: Per-row oracle for the structured-parse pipeline: the stub model's
#: failure modes are a pure function of doc_id%4, and on this corpus every
#: parseable record round-trips (strip-extra-keys → cleaned == golden →
#: leaf accuracy 100). Verifies doc coverage, the parse/validate flags, the
#: in-band error taxonomy, and the score column per document.
Q44_ORACLE = """
    SELECT doc_id,
           CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END AS TINYINT) AS json_valid,
           CAST(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END AS TINYINT) AS schema_valid,
           CAST(CASE WHEN doc_id % 4 = 3 THEN 0.0 ELSE 100.0 END AS DOUBLE) AS accuracy_pct,
           CASE WHEN doc_id % 4 = 3 THEN 'PARSING_JSON_INVALID' ELSE NULL END AS error
    FROM documents
"""


def q24_parse_validity_rates(sf_dir: str) -> ray.data.Dataset:
    """Per-failure-mode validity rates (≙ A2 boolean-rate means): group by
    doc_id%4 (the stub's injected failure mode) — SQL-oracled because the
    stub's json/schema validity is a pure function of the mode."""
    from ..functions.agg import Agg, grouped_agg

    parsed = structured_parse_pipeline(sf_dir)

    def _mode(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # doc_id % 4 for non-negative ids
        mode = pc.bit_wise_and(pc.cast(b.column("doc_id"), pa.int64()), 3)
        return pa.table(
            {
                "failure_mode": mode,
                "json_valid": pc.cast(b.column("json_valid"), pa.int64()),
                "schema_valid": pc.cast(b.column("schema_valid"), pa.int64()),
            }
        )

    modes = parsed.map_batches(_mode, batch_size=None, batch_format="pyarrow")
    return grouped_agg(
        modes,
        ["failure_mode"],
        [
            Agg("n_docs", "json_valid", "count_rows"),
            Agg("n_json_valid", "json_valid", "sum"),
            Agg("n_schema_valid", "schema_valid", "sum"),
        ],
        small_groups=True,
    )


#: Oracle: the stub model is deterministic — mode 3 (doc_id%4==3) is truncated
#: JSON (invalid), everything else parses and validates after key-stripping.
Q24_ORACLE = """
    SELECT doc_id % 4 AS failure_mode,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_json_valid,
           CAST(sum(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_schema_valid
    FROM documents GROUP BY doc_id % 4
"""
