"""Dependency-free video: YUV4MPEG2 (.y4m) decode/encode and frame
features in pure numpy — the video leg of the multimodal-column tier.

y4m is the standard UNCOMPRESSED interchange container (mjpegtools
spec: plain-text stream header ``YUV4MPEG2 W.. H.. F.. C..``, then
``FRAME`` + raw YUV planes per frame) — the video analogue of PPM for
images and WAV for audio: a real, widely-emitted format that needs no
entropy decoder, so the full pipeline (container parse → frame
sampling → per-frame features) is REAL here. Compressed codecs
(H.264/VP9/AV1) need a decoder library and raise NotImplementedError,
like JPEG's WebP boundary and WAV's MP3 boundary.

Supported: C420 (all variants: chroma subsampled 2x2), C422, C444,
and mono; 8-bit. Frame features follow the cheap corpus-triage set:
per-frame mean/std luma plus inter-frame absolute difference (the
scene-change / motion signal used for frame dedup and sampling).
"""

from __future__ import annotations

import numpy as np


def sniff_y4m(content: bytes) -> bool:
    return content[:9] == b"YUV4MPEG2"


def _plane_dims(colorspace: str, w: int, h: int) -> list[tuple[int, int]]:
    if colorspace.startswith("C420") or colorspace == "":
        return [(h, w), (h // 2, w // 2), (h // 2, w // 2)]
    if colorspace.startswith("C422"):
        return [(h, w), (h, w // 2), (h, w // 2)]
    if colorspace.startswith("C444"):
        return [(h, w), (h, w), (h, w)]
    if colorspace.startswith("Cmono"):
        return [(h, w)]
    raise ValueError(f"unsupported y4m colorspace {colorspace!r}")


def decode_y4m(content: bytes) -> tuple[list[np.ndarray], float]:
    """y4m bytes → (list of uint8 luma frames (H, W), fps).

    Chroma planes are parsed (the offsets must be exact) but only luma
    is returned — the triage features are luma-based, and skipping the
    chroma copy halves the memory touch.
    """
    if not sniff_y4m(content):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = content.index(b"\n")
    header = content[:nl].decode("ascii", "replace").split(" ")
    w = h = 0
    fps = 0.0
    colorspace = ""
    for tok in header[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            num, den = tok[1:].split(":")
            fps = int(num) / int(den)
        elif tok.startswith("C"):
            colorspace = tok
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    dims = _plane_dims(colorspace, w, h)
    frame_bytes = sum(a * b for a, b in dims)
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(content):
        if content[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad y4m FRAME marker at offset {pos}")
        fnl = content.index(b"\n", pos)
        pos = fnl + 1
        if pos + frame_bytes > len(content):
            raise ValueError("truncated y4m frame payload")
        y = np.frombuffer(content, np.uint8, w * h, pos).reshape(h, w)
        frames.append(y)
        pos += frame_bytes
    return frames, fps


def encode_y4m(
    frames: list[np.ndarray], *, fps: int = 25, colorspace: str = "C420jpeg"
) -> bytes:
    """Luma frames (H, W) uint8 → y4m bytes (neutral chroma planes)."""
    h, w = frames[0].shape
    dims = _plane_dims(colorspace, w, h)
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 {colorspace}\n".encode()
    )
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("all frames must share one geometry")
        out += b"FRAME\n"
        out += np.ascontiguousarray(f, dtype=np.uint8).tobytes()
        for ph, pw in dims[1:]:
            out += np.full(ph * pw, 128, np.uint8).tobytes()  # neutral chroma
    return bytes(out)


def video_feature_vector(
    frames: list[np.ndarray], fps: float, *, sample_every: int = 1
) -> dict[str, float]:
    """Per-clip triage features over (optionally striding) luma frames:
    duration, luma stats, and mean inter-frame absolute difference —
    the motion / scene-change signal (0 for a static clip)."""
    sampled = frames[:: max(sample_every, 1)]
    lumas = np.stack([f.astype(np.float64) for f in sampled])
    means = lumas.mean(axis=(1, 2))
    if len(sampled) > 1:
        motion = float(np.abs(np.diff(lumas, axis=0)).mean())
    else:
        motion = 0.0
    return {
        "n_frames": float(len(frames)),
        "duration_s": float(len(frames) / fps) if fps else 0.0,
        "luma_mean": float(means.mean()),
        "luma_std": float(lumas.std()),
        "motion_score": motion,
    }
