"""Ingestion-edge pipelines: upload validation, incremental (delta)
ingestion against a prior run, and the multimodal decode stage — each as a
driver-checkable query with a DuckDB oracle.

These close the last §2 families with no hash-checked row (r4 verdict items
3, 4, 6): the validation filters F2/F3 (reference: upload rejection with
typed errors, ``cv_api/main.py:322-348``; fixture skip accounting,
``pages/parallel_ocr_test.py:146-176``), the corpus-scale resume primitive
(reference analogue: latest-snapshot re-run safety,
``scripts/export_benchmark_results.py:47-56``), and the stub media decode
(``stages/media.py``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.agg import Agg, grouped_agg
from ..functions.join import anti_join_auto
from ..functions.text import md5_hex_batch
from ..sources.tables import read_table


def _mod_col(b: pa.Table, m: int):
    """doc_id mod m, vectorized (pyarrow has no modulo kernel; integer
    divide truncates, and doc_ids are non-negative)."""
    ids = b.column("doc_id")
    return pc.subtract(ids, pc.multiply(pc.divide(ids, m), m))

# ---------------------------------------------------------------------------
# q69: upload validation — reject-reason accounting (F2/F3, oracled)
# ---------------------------------------------------------------------------

#: Extension cycle for the synthesized uploads table: two invalid kinds
#: (txt, exe) and one UPPERCASE valid one (PNG — exercises the lowercasing
#: in extension_of). Mirrored literally in Q69_ORACLE.
_UPLOAD_EXTS = ("pdf", "PNG", "txt", "docx", "exe")

#: Byte cap for the synthesized uploads (reference caps at 10 MB; the test
#: corpus documents are 48-600 bytes, so 400 puts real rows on both sides).
_UPLOAD_MAX_BYTES = 400


def _synth_uploads(batch: pa.Table) -> pa.Table:
    """Deterministic uploads from documents: filename is NULL every 13th doc
    (missing-filename case), extension cycles through ``_UPLOAD_EXTS``;
    payload is the utf-8 text, emptied every 11th doc (empty-file case).
    Per-row Python is inherent here (bytes construction), and this runs once
    over a pruned 2-column scan."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    fnames = [
        None if i % 13 == 0 else f"doc{i}.{_UPLOAD_EXTS[i % 5]}" for i in ids
    ]
    payloads = [
        b"" if i % 11 == 0 else (t or "").encode("utf-8") for i, t in zip(ids, texts)
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "filename": pa.array(fnames, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        }
    )


def q69_upload_validation(sf_dir: str) -> ray.data.Dataset:
    """Ingestion validation end-to-end: synthesize an uploads table from
    documents → ``tag_invalid_rows`` (the F3 vectorized tagged-union pass:
    missing_filename → unsupported_media_type → empty_file →
    payload_too_large, first match wins) → reject-reason counts (the F2
    skip-accounting roll-up). Accepted rows count under ``'accepted'`` so
    the oracle certifies BOTH streams of split_valid, not just the rejects."""
    from ..stages.validate import tag_invalid_rows

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    uploads = docs.map_batches(
        _synth_uploads, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    tagged = uploads.map_batches(
        tag_invalid_rows,
        batch_size=None,
        batch_format="pyarrow",
        fn_kwargs={"payload_col": "payload", "max_bytes": _UPLOAD_MAX_BYTES},
    )

    def _label(b: pa.Table) -> pa.Table:
        return pa.table(
            {"reject_reason": pc.fill_null(b.column("reject_reason"), "accepted")}
        )

    labeled = tagged.map_batches(_label, batch_size=None, batch_format="pyarrow")
    return grouped_agg(
        labeled,
        ["reject_reason"],
        [Agg(out="n_uploads", col=None, kind="count_rows")],
        small_groups=True,  # ≤ 5 reasons by construction
    )


#: SQL twin of q69 — the upload synthesis rule and the engine's reject
#: precedence replayed as one CASE (validate.py's if_else chain applies the
#: first matching reason). Extension = lowercase(text after the last '.'),
#: the extension_of regex; size = octet_length of the utf-8 payload.
Q69_ORACLE = f"""
WITH u AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN NULL
              ELSE 'doc' || doc_id || '.' ||
                   list_extract(['pdf','PNG','txt','docx','exe'],
                                CAST(doc_id % 5 AS INTEGER) + 1) END AS filename,
         CASE WHEN doc_id % 11 = 0 THEN '' ELSE COALESCE(text, '') END AS body
  FROM documents),
tagged AS (
  SELECT CASE
    WHEN filename IS NULL THEN 'missing_filename'
    WHEN lower(regexp_replace(filename, '^.*\\.', ''))
         NOT IN ('pdf','png','jpg','jpeg','docx') THEN 'unsupported_media_type'
    WHEN octet_length(encode(body)) = 0 THEN 'empty_file'
    WHEN octet_length(encode(body)) > {_UPLOAD_MAX_BYTES} THEN 'payload_too_large'
    ELSE 'accepted' END AS reject_reason
  FROM u)
SELECT reject_reason, count(*) AS n_uploads FROM tagged GROUP BY reject_reason
"""


# ---------------------------------------------------------------------------
# q70: incremental ingestion — drop content already extracted by a prior run
# ---------------------------------------------------------------------------


def incremental_dedup(
    new_docs: ray.data.Dataset,
    seen: ray.data.Dataset,
    *,
    text_col: str = "text",
    seen_text_col: str | None = None,
    max_broadcast_rows: int = 2_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Keep only the new-batch rows whose CONTENT digest (md5 of
    ``text_col``) appears nowhere in ``seen`` — the corpus-scale resume
    primitive: "ingest shard N+1, drop docs already extracted". In
    production ``seen`` is the prior run's output (read back column-pruned
    from the manifest's done partitions — ``state/manifest.py``); the
    partition-level skip (``run_partitioned`` resume) handles re-submitted
    WORK, this handles re-arriving CONTENT (re-crawls, overlapping shards).

    Shape: both sides reduce to digest rows before any join; the anti join
    is size-dispatched (``anti_join_auto`` — broadcast digest set below
    ``max_broadcast_rows``, distributed ``left_anti`` hash join above), so
    nothing materializes beyond the digest set on the broadcast path.

    Contract: NULL content digests as EMPTY content (``md5_hex_batch``
    hashes ``t or ''``) — a null-text row dedups against empty-text rows,
    on both sides; SQL twins must write ``md5(coalesce(text, ''))``.
    """
    seen_text = seen_text_col or text_col

    def _fp_rows(b: pa.Table) -> pa.Table:
        return pa.table({"fp": md5_hex_batch(b.column(seen_text))})

    def _with_fp(b: pa.Table) -> pa.Table:
        return b.append_column("fp", md5_hex_batch(b.column(text_col)))

    seen_fps = seen.map_batches(
        _fp_rows, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    tagged = new_docs.map_batches(
        _with_fp, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    kept = anti_join_auto(
        tagged,
        seen_fps,
        on="fp",
        max_broadcast_rows=max_broadcast_rows,
        num_partitions=num_partitions,
    )
    return kept.map_batches(
        lambda b: b.drop_columns(["fp"]), batch_size=None, batch_format="pyarrow"
    )


def q70_incremental_dedup(sf_dir: str) -> ray.data.Dataset:
    """Delta ingestion scenario on the documents table: the prior run
    extracted docs with ``doc_id % 3 < 2``; the incoming batch is the new
    shard (``doc_id % 3 = 2``) PLUS a re-crawl of every 6th doc arriving
    under a fresh id (+1,000,000) — same content, new identity, the case a
    doc_id-level anti join cannot catch. Output: the ids actually worth
    processing (new shard only; every re-crawled row drops on its digest)."""
    docs_cols = ["doc_id", "text"]
    prior = read_table(sf_dir, "documents", columns=docs_cols).map_batches(
        lambda b: b.filter(pc.less(_mod_col(b, 3), 2)),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    new_shard = read_table(sf_dir, "documents", columns=docs_cols).map_batches(
        lambda b: b.filter(pc.equal(_mod_col(b, 3), 2)),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def _recrawl(b: pa.Table) -> pa.Table:
        keep = b.filter(pc.equal(_mod_col(b, 6), 0))
        return pa.table(
            {
                "doc_id": pc.add(keep.column("doc_id"), 1_000_000),
                "text": keep.column("text"),
            }
        )

    recrawled = read_table(sf_dir, "documents", columns=docs_cols).map_batches(
        _recrawl, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    out = incremental_dedup(new_shard.union(recrawled), prior)
    return out.map_batches(
        lambda b: b.select(["doc_id"]), batch_size=None, batch_format="pyarrow"
    )


#: SQL twin of q70 — prior digest set, incoming batch (new shard ∪ re-crawl
#: under fresh ids), NOT EXISTS on the md5 content digest. coalesce mirrors
#: the engine's null-as-empty digest contract (md5(NULL) is NULL in SQL and
#: NULL never equals anything, which would silently KEEP every null-text
#: row the engine drops).
Q70_ORACLE = """
WITH prior AS (
  SELECT DISTINCT md5(coalesce(text, '')) AS fp FROM documents WHERE doc_id % 3 < 2),
incoming AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 2
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 6 = 0)
SELECT i.doc_id FROM incoming i
WHERE NOT EXISTS (SELECT 1 FROM prior p WHERE p.fp = md5(coalesce(i.text, '')))
"""


# ---------------------------------------------------------------------------
# q71: media decode/feature stage, hash-checked (r4 verdict item 6)
# ---------------------------------------------------------------------------


def q71_media_features(sf_dir: str) -> ray.data.Dataset:
    """The multimodal decode stage under a hash check: synthesized media
    refs → deterministic fake payloads → actor-pool decode
    (stages/media.py::MediaDecodeStage, stub engine). The oracled projection
    is the stub's exactly-SQL-expressible outputs — media_type
    (md5(ref) byte 1 mod 3) and n_bytes (256 + byte 0 × 16) — DuckDB's md5
    only accepts VARCHAR, so the payload-digest-derived width/height stay
    covered by x_media_features (rows-only) + unit tests. Rows with decode
    errors are excluded on both sides (none occur: payloads are non-empty
    by construction, so a dropped row WOULD flip the row-count check)."""
    from ..sources.corpus import doc_id_str
    from ..stages.media import media_features, synth_media_batch

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def _refs(b: pa.Table) -> pa.Table:
        ids, refs = [], []
        for i in b.column("doc_id").to_pylist():
            d = doc_id_str(i)
            for j in range(2):
                ids.append(d)
                refs.append(f"media://{d}/{j}")
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()), "media_ref": pa.array(refs, pa.string())}
        )

    media = docs.map_batches(_refs, batch_size=None, batch_format="pyarrow").map_batches(
        synth_media_batch, batch_size=None, batch_format="pyarrow"
    )
    feats = media_features(media, concurrency=(1, 4), batch_size=128)
    return feats.map_batches(
        lambda b: b.filter(pc.is_null(b.column("error"))).select(
            ["doc_id", "media_ref", "media_type", "n_bytes"]
        ),
        batch_size=None,
        batch_format="pyarrow",
    )


#: SQL twin of q71 — the synth_media_batch + stub-decode arithmetic replayed:
#: two refs per doc, seed = md5(media_ref); media_type = byte 1 (hex chars
#: 3-4) mod 3 over (image, audio, video); n_bytes = 256 + byte 0 (hex chars
#: 1-2) × 16. The q49 oracle established the identical byte-indexing.
Q71_ORACLE = """
WITH m AS (
  SELECT printf('doc%010d', doc_id) AS doc_id,
         'media://' || printf('doc%010d', doc_id) || '/' || j AS media_ref
  FROM documents CROSS JOIN range(2) t(j))
SELECT doc_id, media_ref,
       list_extract(['image','audio','video'],
                    ('0x' || substr(md5(media_ref), 3, 2))::INT % 3 + 1) AS media_type,
       256 + ('0x' || substr(md5(media_ref), 1, 2))::INT * 16 AS n_bytes
FROM m
"""
