"""Skew handling (a genuinely giant document through the salted path) and
in-band OCR error placeholders."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ocr_endpoint_project_ray.pipelines.extraction import extract_documents
from ocr_endpoint_project_ray.schema import SPAN_STRUCT
from ocr_endpoint_project_ray.stages.extract import OcrStage, _ocr_apply


def test_giant_doc_salted_reassembly():
    """One 20k-span mega-doc among 50 small docs: the salted path must split
    it into many shuffle groups and still reassemble exactly."""
    rows = []
    for d in range(50):
        for o in range(5):
            rows.append((f"small{d:03d}", o, f"s{d}-{o}"))
    mega_n = 20_000
    for o in range(mega_n):
        rows.append(("mega", o, f"m{o}"))
    docs = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.string()),
            "spans": pa.array([None] * len(rows), pa.list_(SPAN_STRUCT)),
        }
    )
    # build as flat rows → list per doc via python (input table shape)
    by_doc: dict[str, list] = {}
    for doc_id, o, t in rows:
        by_doc.setdefault(doc_id, []).append(
            {"kind": "text", "text": t, "media_ref": "", "offset": o}
        )
    docs = pa.table(
        {
            "doc_id": pa.array(list(by_doc), pa.string()),
            "spans": pa.array(list(by_doc.values()), pa.list_(SPAN_STRUCT)),
        }
    )
    ds = ray.data.from_arrow(docs)
    out = extract_documents(ds, num_partitions=8, salted=True, shard_size=512).take_all()
    got = {r["doc_id"]: r["spans"] for r in out}
    assert len(got) == 51
    mega = got["mega"]
    assert len(mega) == mega_n
    assert [s["offset"] for s in mega] == list(range(mega_n))
    assert mega[12345]["text"] == "m12345"
    assert len(got["small007"]) == 5


def test_ocr_error_stays_in_band():
    """A failing engine must produce placeholder text, not an exception
    (reference: ocr_common.py:444,457 '[page N error: …]')."""
    batch = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "salt": pa.array([0], pa.int32()),
            "offset": pa.array([0], pa.int32()),
            "kind": pa.array(["image_ref"], pa.string()),
            "text": pa.array([""], pa.string()),
            "media_ref": pa.array(["media://d/0"], pa.string()),
        }
    )
    out = _ocr_apply(batch, {"kind": "tesseract"})  # engine path not installed
    assert out.column("text").to_pylist()[0].startswith("[page error:")


def test_ocr_actor_stage_stub():
    stage = OcrStage()
    batch = pa.table(
        {
            "doc_id": pa.array(["d"], pa.string()),
            "salt": pa.array([0], pa.int32()),
            "offset": pa.array([0], pa.int32()),
            "kind": pa.array(["image_ref"], pa.string()),
            "text": pa.array([""], pa.string()),
            "media_ref": pa.array(["media://d/0"], pa.string()),
        }
    )
    out = stage(batch)
    assert out.column("text").to_pylist()[0].startswith("[ocr ")
