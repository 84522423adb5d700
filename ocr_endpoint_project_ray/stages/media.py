"""Multimodal column stages: decode / resize / feature-extract over opaque
binary media with typed metadata.

Schema convention: media rows are
``(doc_id, media_ref: string, media_type: string, payload: large_binary)``
— payloads stay in a dedicated column so block sizes are controlled by
``batch_size`` discipline (large binaries → small batches), and the
``media_ref`` indirection lets 100 TB pipelines ship references instead of
bytes through shuffles.

The decode libraries (PIL / ffmpeg) are NOT in this container: the decode
step is stubbed with a deterministic fake (payload-derived dimensions and
features) behind an import-try — clearly marked — while the Ray-side
plumbing (actor signature, batch sizing, schema, in-band errors) is real and
tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("media_type", pa.string()),  # image | audio | video
        pa.field("payload", pa.large_binary()),
    ]
)


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """Deterministic fake media payloads from (doc_id, media_ref) — stands in
    for reading blob storage; payload bytes are a seeded function of the ref."""
    refs = batch.column("media_ref").to_pylist()
    docs = batch.column("doc_id").to_pylist()
    payloads = []
    types = []
    for ref in refs:
        seed = hashlib.md5(ref.encode()).digest()
        size = 256 + seed[0] * 16  # 256..4336 bytes
        payloads.append((seed * (size // len(seed) + 1))[:size])
        types.append(("image", "audio", "video")[seed[1] % 3])
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "media_type": pa.array(types, pa.string()),
            "payload": pa.array(payloads, pa.large_binary()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecodeStage:
    """Actor-pool decode/feature stage — decoder acquired once per actor.

    Real path would hold PIL / libav handles; the stub derives deterministic
    width/height/duration and an 8-dim feature vector from payload bytes.
    Decode failures are in-band (``error`` column), never exceptions.
    """

    def __init__(self, target_size: tuple[int, int] = (224, 224)) -> None:
        self._target = target_size
        try:  # pragma: no cover — not installed in this container
            from PIL import Image  # noqa: F401

            self._decoder = "pil"
        except ImportError:
            self._decoder = "stub"

    def _decode_one(self, media_type: str, payload: bytes) -> dict:
        if self._decoder != "stub":  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL/libav")
        if not payload:
            raise ValueError("empty payload")
        h = hashlib.md5(payload).digest()
        width = 64 + h[0] * 8
        height = 64 + h[1] * 8
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        feats = np.array(
            [arr.mean(), arr.std(), arr.min(), arr.max(), *arr[:4]], dtype=np.float64
        )[:8]
        norm = float(np.linalg.norm(feats))
        return {
            "width": width,
            "height": height,
            "resized_w": self._target[0],
            "resized_h": self._target[1],
            "feature_norm": norm,
            "n_bytes": len(payload),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "media_type": batch.column("media_type"),
        }
        cols: dict[str, list] = {
            k: [] for k in ("width", "height", "resized_w", "resized_h", "feature_norm", "n_bytes")
        }
        errors: list[str | None] = []
        for mt, payload in zip(
            batch.column("media_type").to_pylist(), batch.column("payload").to_pylist()
        ):
            try:
                d = self._decode_one(mt, payload)
                for k in cols:
                    cols[k].append(d[k])
                errors.append(None)
            except Exception as e:
                for k in cols:
                    cols[k].append(None)
                errors.append(f"{type(e).__name__}: {e}")
        for k in ("width", "height", "resized_w", "resized_h", "n_bytes"):
            out[k] = pa.array(cols[k], pa.int64())
        out["feature_norm"] = pa.array(cols["feature_norm"], pa.float64())
        out["error"] = pa.array(errors, pa.string())
        return pa.table(out)


def media_features(
    media: ray.data.Dataset,
    *,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,  # large binary payloads → small batches
) -> ray.data.Dataset:
    """Decode + feature-extract media rows on an actor pool."""
    return media.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
