"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
environment): ``DecodeStage`` raises ``NotImplementedError`` for
``backend="real"`` and provides a deterministic fake decoder otherwise.
Everything around it — schema, actor-pool signature, batch sizing,
output layout — is real and tested, so swapping in PIL/ffmpeg later
touches only ``_decode_real``.

Large binary payloads mean SMALL batches: a batch × concurrency must
fit the worker heap, so ``media_stage`` defaults to ``batch_size=32``.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # "image" | "audio" | "video"
        ("payload", pa.binary()),    # opaque encoded bytes
        ("meta", pa.string()),       # JSON sidecar (source, mime, ...)
    ]
)

FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32())),  # fixed-dim embedding stub
    ]
)


def _decode_real(payload: bytes, kind: str):
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not available in this "
        "environment — use backend='fake' (deterministic) or plug a "
        "decoder in here"
    )


def _decode_fake(payload: bytes, kind: str):
    """Deterministic fake decode: dimensions and an 8-dim feature vector
    derived from the payload digest — stable across runs/parallelism."""
    d = hashlib.blake2b(payload or b"", digest_size=16).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    feat = (np.frombuffer(d[8:], dtype=np.uint8).astype(np.float32) / 255.0).tolist()
    return width, height, feat


class DecodeStage:
    """Actor-pool decode/feature-extract stage.  Setup (decoder init,
    model load in the real backend) happens once per actor here, not per
    batch."""

    def __init__(self, backend: str = "fake"):
        if backend not in ("fake", "real"):
            raise ValueError(f"unknown backend {backend!r}")
        self.decode = _decode_fake if backend == "fake" else _decode_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths, heights, nbytes, feats = [], [], [], []
        for p, k in zip(payloads, kinds):
            w, h, f = self.decode(p, k)
            widths.append(w)
            heights.append(h)
            nbytes.append(len(p or b""))
            feats.append(f)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_stage(
    media_ds,
    *,
    backend: str = "fake",
    concurrency: int = 2,
    batch_size: int = 32,
    num_cpus: float = 1,
):
    """media Dataset → features Dataset on an actor pool (small batches:
    payloads are large binaries)."""
    return media_ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def frame_sample_fn(n_frames: int = 4):
    """Video frame sampling stub: one output row per sampled frame
    (deterministic offsets).  Row-expanding map_batches — the real
    decoder would slice the container at these offsets."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, frame_no, offs = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            n = len(payload or b"")
            for f in range(n_frames):
                ids.append(mid)
                frame_no.append(f)
                offs.append((n * f) // max(1, n_frames))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_no": pa.array(frame_no, pa.int32()),
                "byte_offset": pa.array(offs, pa.int64()),
            }
        )

    return fn


def synthetic_media_table(n: int) -> pa.Table:
    """Deterministic media fixture (payload bytes derived from the id)."""
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": [],
        "kind": [],
        "payload": [],
        "meta": [],
    }
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(str(i).encode(), digest_size=32).digest() * (4 + i % 5)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["meta"].append(f'{{"source":"synthetic","i":{i}}}')
    return pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"], pa.string()),
            "payload": pa.array(rows["payload"], pa.binary()),
            "meta": pa.array(rows["meta"], pa.string()),
        }
    )
