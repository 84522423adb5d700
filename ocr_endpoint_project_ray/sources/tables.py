"""Dataset readers with column pruning, and the Lance/Parquet gate.

At 100 TB, a read that loads all columns for a 2-column transform is wrong —
every reader here takes ``columns`` and pushes it into the scan.

The north-star input format is Lance (``ray.data.read_lance``); the ``lance``
package is not in this container, so :func:`read_docs` gates on it and falls
back to parquet with the identical schema. The pipeline code is
format-agnostic either way (both yield Arrow blocks).
"""

from __future__ import annotations

import os

import ray.data

from ..context import ensure_hash_shuffle


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    filter=None,  # noqa: A002 - pyarrow dataset expression
) -> ray.data.Dataset:
    """Read one of the benchmark tables with projection pushdown and
    (optionally) a pyarrow expression row filter pushed into the scan —
    row groups that can't match never leave storage.

    Refreshes the shuffle context first: DataContext is snapshotted into the
    plan at dataset CREATION, so cluster-sized knobs (aggregator caps) must
    be set here, after ray.init, not only at package import."""
    ensure_hash_shuffle()
    return ray.data.read_parquet(table_path(sf_dir, name), columns=columns, filter=filter)


def read_metadata_csv(path: str, *, key_col: str = "filename") -> ray.data.Dataset:
    """Dimension-table CSV source with the reference's hygiene filter
    (≙ load_db_metadata, ocr_common.py:31-41): drop rows with an empty key.
    Tiny table — take_all + broadcast at use sites."""
    import pyarrow.compute as pc

    ensure_hash_shuffle()

    def _nonempty(batch):
        col = batch.column(key_col)
        mask = pc.and_(pc.is_valid(col), pc.not_equal(pc.utf8_trim_whitespace(col), ""))
        return batch.filter(mask)

    return ray.data.read_csv(path).map_batches(
        _nonempty, batch_size=None, batch_format="pyarrow"
    )


def read_docs(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read an interleaved-document corpus: Lance when available (the
    100 TB target format — streaming column-pruned fragment reads), else
    Parquet with the same (doc_id, spans) schema."""
    ensure_hash_shuffle()
    if path.endswith(".lance") or os.path.isdir(os.path.join(path, "_versions")):
        try:
            import lance  # noqa: F401

            return ray.data.read_lance(path, columns=columns)
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "lance is not installed in this container; write the corpus "
                "as parquet (same schema) instead"
            ) from e
    return ray.data.read_parquet(path, columns=columns)
