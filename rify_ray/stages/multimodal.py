"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decoders are CAPABILITY-PROBED per actor (``probe_backends``): PIL for
images, stdlib ``wave`` for WAV audio, ffmpeg for video.
``backend="auto"`` uses the real decoder for a kind when its library is
present and the payload parses, and degrades to a deterministic fake
(digest-derived features) otherwise — the ``decoded_real`` output
column records which path each row took.  In this container only the
WAV decoder is real (no PIL/ffmpeg); the image/video real decoders are
written but exercised only where their libraries exist, and
``backend="real"`` raises ``NotImplementedError`` for a kind whose
library is missing.

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
        ("decoded_real", pa.bool_()),         # real decoder vs deterministic fake
    ]
)


def probe_backends() -> dict:
    """Capability probe for real decoders, evaluated once per actor (in
    ``DecodeStage.__init__``): PIL for images, stdlib ``wave`` for WAV
    audio, an ffmpeg binary for video."""
    caps = {"image": False, "audio": False, "video": False}
    try:
        from PIL import Image  # noqa: F401

        caps["image"] = True
    except ImportError:
        pass
    try:
        import wave  # noqa: F401

        caps["audio"] = True
    except ImportError:  # pragma: no cover - stdlib
        pass
    import shutil

    caps["video"] = shutil.which("ffmpeg") is not None
    return caps


def _decode_image_real(payload: bytes, kind: str):
    """PIL decode: true dimensions + an 8-dim feature (mean intensity of
    an 8-cell vertical banding of the grayscale thumbnail)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    width, height = img.size
    gray = np.asarray(img.convert("L").resize((8, 8)), dtype=np.float32) / 255.0
    return width, height, gray.mean(axis=0).tolist()


def _decode_audio_real(payload: bytes, kind: str):
    """WAV decode via stdlib ``wave``: width = sample rate in kHz,
    height = channels × bit depth, feature = per-octile RMS of the first
    channel (deterministic)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate, channels, sampwidth = w.getframerate(), w.getnchannels(), w.getsampwidth()
        frames = w.readframes(min(w.getnframes(), 65536))
    dtype = {1: np.int8, 2: np.int16, 4: np.int32}.get(sampwidth)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    samples = np.frombuffer(frames, dtype=dtype).astype(np.float64)
    if channels > 1:
        samples = samples[::channels]
    if samples.size == 0:
        feat = [0.0] * 8
    else:
        segs = np.array_split(samples, 8)
        scale = float(2 ** (8 * sampwidth - 1))
        feat = [float(np.sqrt(np.mean(s * s)) / scale) if s.size else 0.0 for s in segs]
    return rate // 1000, channels * sampwidth * 8, feat


def _decode_real(payload: bytes, kind: str):
    """Strict real decode: dispatch to the capability-probed decoder for
    ``kind``; raises when the library isn't present (``backend="auto"``
    degrades to the fake instead)."""
    caps = probe_backends()
    if kind == "image" and caps["image"]:
        return _decode_image_real(payload, kind)
    if kind == "audio" and caps["audio"]:
        return _decode_audio_real(payload, kind)
    raise NotImplementedError(
        f"real {kind} decoding requires "
        f"{'PIL' if kind == 'image' else 'wave' if kind == 'audio' else 'ffmpeg'}, "
        "not available in this environment — use backend='fake' "
        "(deterministic) or backend='auto' (real where possible)"
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
    """Actor-pool decode/feature-extract stage.  Setup — the capability
    probe and decoder resolution (model load in a real backend) —
    happens once per actor here, not per batch.

    Backends: ``"fake"`` (deterministic digest-derived features),
    ``"real"`` (capability-probed decoders, raises where the library is
    missing), ``"auto"`` (real decoder per kind when the library is
    present AND the payload parses; deterministic fake otherwise — the
    ``decoded_real`` output column records which path each row took)."""

    def __init__(self, backend: str = "fake"):
        if backend not in ("fake", "real", "auto"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        # probe ONCE per actor; per-kind real decoder or None
        caps = probe_backends() if backend in ("real", "auto") else {}
        self._real = {
            "image": _decode_image_real if caps.get("image") else None,
            "audio": _decode_audio_real if caps.get("audio") else None,
            "video": None,  # ffmpeg plumbing not implemented even when present
        }

    def _decode(self, payload: bytes, kind: str):
        if self.backend == "fake":
            return (*_decode_fake(payload, kind), False)
        real = self._real.get(kind)
        if self.backend == "real":
            if real is None:
                return (*_decode_real(payload, kind), True)  # raises with context
            return (*real(payload, kind), True)
        # auto: real when possible, deterministic fake otherwise
        if real is not None:
            try:
                return (*real(payload, kind), True)
            except Exception:
                pass  # unparseable/foreign payload → fake
        return (*_decode_fake(payload, kind), False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        widths, heights, nbytes, feats, reals = [], [], [], [], []
        for p, k in zip(payloads, kinds):
            w, h, f, is_real = self._decode(p, k)
            widths.append(w)
            heights.append(h)
            nbytes.append(len(p or b""))
            feats.append(f)
            reals.append(is_real)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_bytes": pa.array(nbytes, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "decoded_real": pa.array(reals, pa.bool_()),
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


def _synthetic_wav(i: int) -> bytes:
    """Deterministic valid WAV payload (16 kHz mono 16-bit sine at
    220 + 10·i Hz) — parses in any environment via stdlib ``wave``."""
    import io
    import wave

    rate, n = 16000, 800
    tone = (
        np.sin(2 * np.pi * (220 + 10 * i) * np.arange(n) / rate) * 16000
    ).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(tone.tobytes())
    return buf.getvalue()


def synthetic_media_table(n: int, *, real_audio: bool = False) -> pa.Table:
    """Deterministic media fixture (payload bytes derived from the id).
    ``real_audio=True`` makes the audio rows genuine WAV payloads so a
    capability-probed ``backend="auto"`` stage exercises its real
    decoder on them."""
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": [],
        "kind": [],
        "payload": [],
        "meta": [],
    }
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "audio" and real_audio:
            payload = _synthetic_wav(i)
        else:
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
