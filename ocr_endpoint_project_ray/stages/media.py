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
        if not payload:
            raise ValueError("empty payload")
        if self._decoder == "pil" and media_type == "image":  # pragma: no cover
            # real branch — active the moment PIL lands in the container
            import io

            from PIL import Image

            with Image.open(io.BytesIO(payload)) as im:
                width, height = im.size
                resized = im.convert("L").resize(self._target)
                arr = np.asarray(resized, dtype=np.float64).ravel()
            feats = np.array(
                [arr.mean(), arr.std(), arr.min(), arr.max(), *arr[:4]], dtype=np.float64
            )[:8]
            return {
                "width": width,
                "height": height,
                "resized_w": self._target[0],
                "resized_h": self._target[1],
                "feature_norm": float(np.linalg.norm(feats)),
                "n_bytes": len(payload),
            }
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


class FrameSampleStage:
    """Video → sampled frame rows (the 1→N flat_map shape for temporal
    media). Real branch decodes with PyAV when present (evenly-strided
    sample capped at ``max_frames``); this container lacks libav, so the
    stub emits a deterministic frame set (count = 1 + md5(ref)[2] % 5,
    payload digest-derived) — the Ray plumbing (actor pool, explode shape,
    in-band errors, frame order carried in ``frame_no``) is real. A custom
    ``sampler`` callable (payload → list[bytes]) is injectable for tests /
    other decoders.
    """

    def __init__(self, max_frames: int = 8, sampler=None) -> None:
        self._max_frames = max_frames
        self._sampler = sampler
        if sampler is not None:
            self._engine = "custom"
        else:
            try:  # pragma: no cover — not installed in this container
                import av  # noqa: F401

                self._engine = "av"
            except ImportError:
                self._engine = "stub"

    def _real_frames(self, payload: bytes) -> list[bytes]:  # pragma: no cover
        import io

        import av

        out: list[bytes] = []
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            total = stream.frames or 0
            step = max(1, total // self._max_frames) if total else 1
            for i, frame in enumerate(container.decode(stream)):
                if i % step == 0:
                    out.append(frame.to_ndarray(format="rgb24").tobytes())
                if len(out) >= self._max_frames:
                    break
        return out

    def _frames(self, ref: str, payload: bytes) -> list[bytes]:
        if self._engine == "custom":
            return self._sampler(payload)
        if self._engine == "av":  # pragma: no cover
            return self._real_frames(payload)
        seed = hashlib.md5(ref.encode()).digest()
        n = min(1 + seed[2] % 5, self._max_frames)
        return [
            hashlib.md5(payload + i.to_bytes(2, "little")).digest() for i in range(n)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("doc_id", "media_ref", "frame_no", "frame_ref", "frame_payload", "error")}
        for doc_id, ref, mt, payload in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("media_ref").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mt != "video":
                continue
            try:
                frames = self._frames(ref, payload or b"")
                for i, fp in enumerate(frames):
                    out["doc_id"].append(doc_id)
                    out["media_ref"].append(ref)
                    out["frame_no"].append(i)
                    out["frame_ref"].append(f"{ref}#{i}")
                    out["frame_payload"].append(fp)
                    out["error"].append(None)
            except Exception as e:  # in-band, one poison video ≠ dead job
                out["doc_id"].append(doc_id)
                out["media_ref"].append(ref)
                out["frame_no"].append(-1)
                out["frame_ref"].append(None)
                out["frame_payload"].append(None)
                out["error"].append(f"{type(e).__name__}: {e}")
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "media_ref": pa.array(out["media_ref"], pa.string()),
                "frame_no": pa.array(out["frame_no"], pa.int32()),
                "frame_ref": pa.array(out["frame_ref"], pa.string()),
                "frame_payload": pa.array(out["frame_payload"], pa.large_binary()),
                "error": pa.array(out["error"], pa.string()),
            }
        )


def sample_frames(
    media: ray.data.Dataset,
    *,
    max_frames: int = 8,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Frame-sample video rows on an actor pool (1→N explode)."""
    return media.map_batches(
        FrameSampleStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"max_frames": max_frames},
    )
