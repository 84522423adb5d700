"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes every implemented operator/pipeline (SURVEY.md §2 plus
the training-data extensions); ``oracle_sql()`` gives the DuckDB twin for the
SQL-expressible ones (the rest get rows-only checks).

Ray is initialised by the driver BEFORE this module is imported — nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# Importing the package sets the hash-shuffle strategy before any Dataset is
# created (required for keyed repartition — see ocr_endpoint_project_ray/context.py).
import ocr_endpoint_project_ray  # noqa: F401
from ocr_endpoint_project_ray.pipelines.extraction import (
    extraction_flat,
    extraction_pipeline,
)
from ocr_endpoint_project_ray.pipelines.relational import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)
from ocr_endpoint_project_ray.pipelines.scoring import (
    x_extraction_scores,
    x_score_summary,
)
from ocr_endpoint_project_ray.pipelines.structured import (
    Q24_ORACLE,
    q24_parse_validity_rates,
    x_structured_parse,
)
from ocr_endpoint_project_ray.pipelines.textops import TEXT_ORACLES, TEXT_QUERIES


def entry() -> Any:
    """Flagship pipeline: synthesize the interleaved-span corpus from
    sf0.001 documents, extract (boilerplate strip + OCR + ordered
    reassembly), return the flat span table (stable schema:
    doc_id, offset, kind, text, media_ref)."""
    return extraction_flat("/root/testdata/sf0.001", num_partitions=16)


def _extract_query(sf_dir: str) -> Any:
    return extraction_flat(sf_dir, num_partitions=16)


def queries() -> dict[str, Callable[[str], Any]]:
    out: dict[str, Callable[[str], Any]] = {}
    out.update(RELATIONAL_QUERIES)
    out.update(TEXT_QUERIES)
    out["x_extract_spans"] = _extract_query
    out["q24_parse_validity_rates"] = q24_parse_validity_rates
    out["x_structured_parse"] = x_structured_parse
    out["x_extraction_scores"] = x_extraction_scores
    out["x_score_summary"] = x_score_summary
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(RELATIONAL_ORACLES)
    out.update(TEXT_ORACLES)
    out["q24_parse_validity_rates"] = Q24_ORACLE
    return out
