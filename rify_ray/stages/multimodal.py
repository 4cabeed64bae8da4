"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Decoders are CAPABILITY-PROBED per actor (``probe_backends``): PIL
(falling back to a vendored stdlib-only PNG parser — zlib inflate +
scanline de-filtering, ``_png_decode_gray``) for images, stdlib
``wave`` for WAV audio, and a vendored stdlib-only Y4M (YUV4MPEG2)
container parser (``_y4m_decode`` — header parse + per-frame plane
walk; compressed containers would need ffmpeg, absent here) for video.
``backend="auto"`` uses the real decoder for a kind when it parses the
payload, and degrades to a deterministic fake (digest-derived
features) otherwise — the ``decoded_real`` output column records which
path each row took.  In this container all three kinds decode real
payloads (WAV, PNG, Y4M) with no external libraries;
``backend="real"`` raises ``ValueError`` only for payloads the
vendored parsers cannot parse (e.g. an MP4 without ffmpeg).

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
    ``DecodeStage.__init__``): PIL — or the vendored stdlib PNG parser,
    always present — for images, stdlib ``wave`` for WAV audio, and the
    vendored stdlib Y4M parser — also always present — for video
    (ffmpeg, when installed, would extend coverage to compressed
    containers; the Y4M path needs nothing)."""
    caps = {"image": True, "audio": False, "video": True}
    try:
        import wave  # noqa: F401

        caps["audio"] = True
    except ImportError:  # pragma: no cover - stdlib
        pass
    return caps


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_decode_gray(payload: bytes):
    """Vendored stdlib-only PNG decode (RFC 2083): chunk walk → IHDR
    dims → zlib-inflate the IDAT stream → per-scanline de-filtering
    (all five filter types) → grayscale float array in [0, 1].

    Supports the common web shapes: 8-bit depth, color types 0
    (grayscale), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace.
    Raises ``ValueError`` on anything else — ``backend="auto"`` then
    takes the deterministic-fake path for that row."""
    import struct
    import zlib

    if not payload or not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    idat = []
    dims = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, bitd, ctype, comp, filt, inter = struct.unpack(">IIBBBBB", data)
            if bitd != 8 or comp != 0 or filt != 0 or inter != 0:
                raise ValueError("unsupported PNG encoding")
            if ctype not in (0, 2, 4, 6):
                raise ValueError(f"unsupported PNG color type {ctype}")
            dims = (w, h, ctype)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if dims is None or not idat:
        raise ValueError("truncated PNG")
    w, h, ctype = dims
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanlines")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        f = raw[p]
        line = np.frombuffer(raw[p + 1 : p + 1 + stride], np.uint8).astype(np.int32)
        p += 1 + stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 255
        elif f == 1:  # Sub — sequential left dependence
            cur = line.copy()
            for i in range(ch, stride):
                cur[i] = (cur[i] + cur[i - ch]) & 255
        elif f == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 255
        elif f == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                pp = a + b - c
                pa_, pb, pc_ = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                cur[i] = (cur[i] + pred) & 255
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = cur
        prev = cur
    px = out.reshape(h, w, ch).astype(np.float32)
    if ctype == 0:
        gray = px[..., 0]
    elif ctype == 4:
        gray = px[..., 0]
    else:
        # ITU-R 601 luma — the same weights PIL's convert("L") uses
        gray = px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114
    return w, h, gray / 255.0


def _box_thumb(gray: np.ndarray, k: int = 8) -> np.ndarray:
    """(h, w) → (k, k) box-averaged thumbnail (deterministic, no
    resampling library).  An image smaller than k in either dimension
    is nearest-neighbor upsampled first — array_split would otherwise
    produce empty chunks whose mean is NaN, silently poisoning the
    feature vector."""
    h, w = gray.shape
    if h < k:
        gray = np.repeat(gray, -(-k // h), axis=0)
    if w < k:
        gray = np.repeat(gray, -(-k // w), axis=1)
    rows = np.array_split(gray, k, axis=0)
    return np.stack(
        [np.stack([c.mean() for c in np.array_split(r, k, axis=1)]) for r in rows]
    ).astype(np.float32)


def _decode_image_real(payload: bytes, kind: str):
    """Image decode: PIL when installed; otherwise the vendored stdlib
    PNG parser.  Either way: true dimensions + an 8-dim feature (mean
    intensity per vertical band of the 8×8 grayscale thumbnail).  The
    two backends use different downsampling, so features are
    deterministic per environment, not identical across them."""
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        width, height = img.size
        gray = np.asarray(img.convert("L").resize((8, 8)), dtype=np.float32) / 255.0
        return width, height, gray.mean(axis=0).tolist()
    except ImportError:
        pass
    width, height, gray = _png_decode_gray(payload)
    return width, height, _box_thumb(gray, 8).mean(axis=0).tolist()


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


_Y4M_SIG = b"YUV4MPEG2"


def _y4m_frame_geometry(w: int, h: int, cs: str):
    """Frame payload size + Y-plane size for a Y4M colorspace tag."""
    y = w * h
    if cs.startswith("420"):
        return y + 2 * ((w // 2) * (h // 2)), y
    if cs.startswith("422"):
        return y + 2 * ((w // 2) * h), y
    if cs.startswith("444"):
        return 3 * y, y
    if cs.startswith("mono"):
        return y, y
    raise ValueError(f"unsupported Y4M colorspace C{cs}")


def _y4m_decode(payload: bytes):
    """Vendored stdlib-only Y4M (YUV4MPEG2) decode: ASCII stream header
    (``YUV4MPEG2 W<w> H<h> F<n>:<d> ... C<cs>``) → per-frame walk of
    ``FRAME`` markers + raw planar payloads → (width, height, n_frames,
    first frame's Y plane as float in [0, 1], frame byte offsets).

    Supports the 8-bit planar colorspaces (C420*, C422, C444, Cmono;
    default C420).  Raises ``ValueError`` on anything else —
    ``backend="auto"`` then takes the deterministic-fake path for that
    row, exactly like the PNG parser."""
    if not payload or not payload.startswith(_Y4M_SIG):
        raise ValueError("not a Y4M payload")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = None
    cs = "420"
    for tok in payload[len(_Y4M_SIG) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            cs = val.decode("ascii", "replace")
    if not w or not h:
        raise ValueError("Y4M header missing dimensions")
    frame_sz, y_sz = _y4m_frame_geometry(w, h, cs)
    pos = nl + 1
    n_frames = 0
    first_y = None
    offsets = []
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise ValueError("corrupt Y4M frame marker")
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_sz > len(payload):
            raise ValueError("truncated Y4M frame")
        offsets.append(pos)
        if first_y is None:
            first_y = (
                np.frombuffer(payload[fnl + 1 : fnl + 1 + y_sz], np.uint8)
                .reshape(h, w)
                .astype(np.float32)
                / 255.0
            )
        pos = fnl + 1 + frame_sz
        n_frames += 1
    if n_frames == 0:
        raise ValueError("Y4M stream has no frames")
    return w, h, n_frames, first_y, offsets


def _decode_video_real(payload: bytes, kind: str):
    """Video decode via the vendored Y4M parser: true container
    dimensions + an 8-dim feature (mean intensity per vertical band of
    the first frame's 8×8 luma thumbnail — the image feature applied to
    frame 0, so image/video features live in the same space)."""
    w, h, _n_frames, first_y, _offsets = _y4m_decode(payload)
    return w, h, _box_thumb(first_y, 8).mean(axis=0).tolist()


def _decode_real(payload: bytes, kind: str):
    """Strict real decode: dispatch to the capability-probed decoder for
    ``kind``; raises when the library isn't present (``backend="auto"``
    degrades to the fake instead)."""
    caps = probe_backends()
    if kind == "image" and caps["image"]:
        return _decode_image_real(payload, kind)
    if kind == "audio" and caps["audio"]:
        return _decode_audio_real(payload, kind)
    if kind == "video" and caps["video"]:
        return _decode_video_real(payload, kind)
    raise NotImplementedError(
        f"real {kind} decoding requires "
        f"{'PIL or the vendored PNG parser' if kind == 'image' else 'wave' if kind == 'audio' else 'the vendored Y4M parser (or ffmpeg for compressed containers)'}, "
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
            "video": _decode_video_real if caps.get("video") else None,
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
    """Video frame sampling: one output row per sampled frame.  A Y4M
    payload yields REAL container offsets — ``n_frames`` evenly-spaced
    ``FRAME`` marker positions from the vendored parser's frame walk —
    so a downstream stage can slice the container at the offset and
    decode exactly that frame.  Unparseable payloads degrade to
    byte-proportional stub offsets (the deterministic-fake discipline).
    Row-expanding map_batches either way."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, frame_no, offs = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            try:
                _w, _h, total, _y, marker_offs = _y4m_decode(payload)
                take = min(n_frames, total)
                for f in range(take):
                    ids.append(mid)
                    frame_no.append(f)
                    offs.append(marker_offs[(total * f) // take])
                continue
            except ValueError:
                pass
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


def _synthetic_png(i: int) -> bytes:
    """Deterministic valid 8-bit grayscale PNG (diagonal gradient keyed
    by ``i``) — parses in any environment via the vendored stdlib
    decoder (or PIL where installed)."""
    import struct
    import zlib

    w = h = 24 + (i % 5)
    arr = ((np.add.outer(np.arange(h), np.arange(w)) * 3 + i * 7) % 256).astype(np.uint8)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _synthetic_y4m(i: int) -> bytes:
    """Deterministic valid Y4M payload (3-frame C420 gradient video
    keyed by ``i``) — parses in any environment via the vendored stdlib
    parser."""
    w = h = 16 + (i % 4) * 2  # even dims for 4:2:0 chroma
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    frames = []
    for f in range(3):
        y = ((np.add.outer(np.arange(h), np.arange(w)) * 5 + i * 11 + f * 40) % 256).astype(
            np.uint8
        )
        uv = np.full((h // 2) * (w // 2), 128, dtype=np.uint8)
        frames.append(b"FRAME\n" + y.tobytes() + uv.tobytes() + uv.tobytes())
    return header + b"".join(frames)


def synthetic_media_table(
    n: int,
    *,
    real_audio: bool = False,
    real_image: bool = False,
    real_video: bool = False,
) -> pa.Table:
    """Deterministic media fixture (payload bytes derived from the id).
    ``real_audio=True`` makes the audio rows genuine WAV payloads,
    ``real_image=True`` the image rows genuine PNGs, and
    ``real_video=True`` the video rows genuine Y4M streams, so a
    capability-probed ``backend="auto"`` stage exercises its real
    decoders on them."""
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
        elif kind == "image" and real_image:
            payload = _synthetic_png(i)
        elif kind == "video" and real_video:
            payload = _synthetic_y4m(i)
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
