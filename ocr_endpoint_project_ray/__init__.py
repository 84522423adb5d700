"""ocr_endpoint_project_ray — a Ray-Data-native document extraction engine.

A from-scratch distributed re-expression of the query / data-processing
capabilities of ``badreddinesaadioui/OCR-endpoint-project`` (see SURVEY.md):
main-content extraction over interleaved text+media documents, metric scoring,
grouped aggregation / ranking / dedup, plus the training-data operators a
100 TB pipeline needs (near-dedup, ANN, language-ID, quality scoring).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, actor pools for stateful stages,
``groupby``/``sort`` only where semantics require a shuffle.

This package never calls ``ray.init()``/``ray.shutdown()`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

from .context import ensure_hash_shuffle as _ensure_hash_shuffle

# Keyed repartition / hash aggregates need the hash-shuffle strategy, and the
# strategy is snapshotted at Dataset creation — set it before any source is
# built (see context.py).
_ensure_hash_shuffle()
