"""Multimodal (image/audio/video) column operators — Ray-side plumbing.

Binary payloads are opaque ``binary`` columns with typed metadata columns
(media_type, width/height or sample_rate, …). The decode/feature kernels
themselves need codec libraries that are NOT in this container, so each
operator routes through a decoder registry:

- ``decoder="stub"`` (default) — a deterministic fake: features are derived
  from a stable hash of the payload bytes. Real schemas, real batch sizes,
  real actor-pool signatures; fake pixels. Marked clearly.
- ``decoder="pillow"`` / ``"ffmpeg"`` — raise ``NotImplementedError`` with
  installation guidance (the intended production path).

Design rules encoded here (the parts that ARE real and tested):
- decode/feature-extract is a stateful ACTOR-POOL ``map_batches`` stage
  (model/codec loaded once per actor in ``__init__``)
- small ``batch_size`` — binary payloads are wide rows; a batch ×
  concurrency must fit the worker heap (SURVEY.md §4 memory-aware rule)
- output embeds are fixed-width ``list<float>`` columns compatible with
  stages/knn.py similarity search
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _stub_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: seeded by a stable digest of the bytes."""
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32)


class ImageFeatureExtractor:
    """Actor-pool stage: (id, image:binary) → (id, width, height, embedding).

    decoder="stub" fakes decode deterministically; "pillow" is the real
    path (PIL not available in this container → NotImplementedError)."""

    def __init__(self, id_col: str = "id", image_col: str = "image", dim: int = 64, decoder: str = "stub"):
        self.id_col, self.image_col, self.dim = id_col, image_col, dim
        if decoder == "pillow":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "pillow decoder requires PIL; install pillow or use decoder='stub'"
                ) from exc
        elif decoder != "stub":
            raise ValueError(f"unknown decoder {decoder!r}")
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.image_col].to_pylist()
        n = len(payloads)
        emb = np.zeros((n, self.dim), dtype=np.float32)
        widths = np.zeros(n, dtype=np.int32)
        heights = np.zeros(n, dtype=np.int32)
        for i, p in enumerate(payloads):
            # STUB decode: dimensions derived from the digest, embedding from
            # seeded noise — replace with PIL decode + model forward pass
            emb[i] = _stub_features(p, self.dim)
            h64 = int.from_bytes(hashlib.blake2b(p or b"", digest_size=4).digest(), "little")
            widths[i] = 64 + h64 % 1024
            heights[i] = 64 + (h64 >> 5) % 1024
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "width": pa.array(widths, type=pa.int32()),
                "height": pa.array(heights, type=pa.int32()),
                "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            }
        )


class AudioFeatureExtractor:
    """Actor-pool stage: (id, audio:binary) → (id, duration_s, embedding)."""

    def __init__(self, id_col: str = "id", audio_col: str = "audio", dim: int = 32, decoder: str = "stub"):
        self.id_col, self.audio_col, self.dim = id_col, audio_col, dim
        if decoder == "ffmpeg":
            raise NotImplementedError("ffmpeg decoder not available in this container; use decoder='stub'")
        if decoder != "stub":
            raise ValueError(f"unknown decoder {decoder!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.audio_col].to_pylist()
        n = len(payloads)
        emb = np.zeros((n, self.dim), dtype=np.float32)
        durations = np.zeros(n, dtype=np.float64)
        for i, p in enumerate(payloads):
            emb[i] = _stub_features(p, self.dim)
            durations[i] = (len(p or b"") % 30_000) / 1000.0
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "duration_s": pa.array(durations, type=pa.float64()),
                "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            }
        )


def image_feature_stage(ds, id_col="id", image_col="image", dim=64, concurrency=None, batch_size: int = 64):
    """Small batch_size: binary payloads are wide — batch × concurrency must
    fit the worker heap."""
    from entity_resolution_engine_ray.stages.block import default_pool_size

    return ds.map_batches(
        ImageFeatureExtractor,
        fn_constructor_kwargs={"id_col": id_col, "image_col": image_col, "dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or default_pool_size(),
    )


def frame_sample_stage(ds, id_col="id", video_col="video", every_n: int = 10, batch_size: int = 16):
    """Video frame sampling plumbing: explodes each video row into frame
    rows (frame payloads stubbed as digest-sliced bytes)."""

    def sample(batch: pa.Table) -> pa.Table:
        ids, frames, indices = [], [], []
        for vid, payload in zip(batch[id_col].to_pylist(), batch[video_col].to_pylist()):
            payload = payload or b""
            n_frames = max(1, (len(payload) // 1000) // every_n)
            for f in range(n_frames):
                ids.append(vid)
                indices.append(f * every_n)
                # STUB frame: digest of (payload, frame index)
                frames.append(hashlib.blake2b(payload + f.to_bytes(4, "little"), digest_size=32).digest())
        return pa.table(
            {
                id_col: pa.array(ids),
                "frame_index": pa.array(indices, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=batch_size)


def image_resize_stage(
    ds,
    id_col: str = "id",
    image_col: str = "image",
    width: int = 224,
    height: int = 224,
    decoder: str = "stub",
    concurrency=None,
    batch_size: int = 64,
):
    """Image resize plumbing: (id, image:binary) → (id, image:binary,
    width:int32, height:int32). The Ray-side shape — actor pool, small
    batches, binary in/binary out — is real; the pixel work is a clearly
    marked STUB (a real build swaps in Pillow inside ``resize_one``; the
    library is absent from this environment)."""
    if decoder != "stub":
        raise NotImplementedError(
            "real image decoding requires Pillow, which is not available in "
            "this environment — only decoder='stub' is implemented"
        )
    from entity_resolution_engine_ray.stages.block import default_pool_size

    def resize_one(payload: bytes) -> bytes:
        # STUB: deterministic digest-stream "resized pixels" of the target
        # size (3 bytes/px) — stands in for Image.open(...).resize(...)
        out = b""
        seed = payload or b""
        need = width * height * 3
        counter = 0
        while len(out) < need:
            out += hashlib.blake2b(seed + counter.to_bytes(4, "little"), digest_size=64).digest()
            counter += 1
        return out[:need]

    def resize_batch(batch: pa.Table) -> pa.Table:
        imgs = [resize_one(p) for p in batch[image_col].to_pylist()]
        n = batch.num_rows
        return pa.table(
            {
                id_col: batch[id_col],
                image_col: pa.array(imgs, type=pa.binary()),
                "width": pa.array([width] * n, type=pa.int32()),
                "height": pa.array([height] * n, type=pa.int32()),
            }
        )

    return ds.map_batches(
        resize_batch,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
