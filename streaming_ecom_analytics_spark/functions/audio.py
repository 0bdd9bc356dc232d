"""Dependency-free audio: WAV/PCM decode + encode and DSP features in
pure numpy — the audio leg of the multimodal-column tier.

Like images (``functions/imaging.py`` / ``functions/jpeg.py``), audio
lives in a ``binary`` column beside typed metadata; the expensive
decode + feature step runs in Arrow-batched ``mapInPandas`` so it
scales with executors (see ``multimodal.audio_features``).

Scope:
- **WAV (RIFF) decode**: chunk walk (fmt/data, skipping LIST/fact/
  etc.), PCM 8/16/24/32-bit integer and 32/64-bit float, any channel
  count. Spec: the public RIFF/WAVE format (multimedia programming
  interface, IBM/Microsoft 1991). Compressed codecs (MP3/AAC/Opus)
  need an entropy-decoder library and raise NotImplementedError —
  honestly, like WebP on the image side.
- **WAV encode** (PCM16) for fixtures and round-trip tests.
- **Features** (the standard cheap DSP set used for corpus filtering):
  per-frame RMS energy, zero-crossing rate, spectral centroid /
  rolloff via rFFT — vectorized over a strided frame matrix.

Reference context: DrUkachi/streaming-ecom-analytics has no media
path; this serves the brief's multimodal tier (decode/feature-extract
as UDFs over opaque binary columns with typed metadata).
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_wav(content: bytes) -> bool:
    return content[:4] == b"RIFF" and content[8:12] == b"WAVE"


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate). Raises ValueError on malformed RIFF and
    NotImplementedError on non-PCM codecs."""
    if not sniff_wav(content):
        raise ValueError("not a RIFF/WAVE stream")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        body = content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_format == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                audio_format = struct.unpack_from("<H", body, 24)[0]
            fmt = (audio_format, channels, rate, bits)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, bits = fmt
    if audio_format == 1:  # integer PCM
        if bits == 8:  # unsigned
            x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            raw = np.frombuffer(data, np.uint8)
            n = len(raw) // 3
            raw = raw[: n * 3].reshape(n, 3)
            as32 = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            as32 = np.where(as32 >= 1 << 23, as32 - (1 << 24), as32)
            x = as32.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV codec {audio_format} needs a decoder library (only "
            "PCM/float supported; MP3/AAC/Opus are out of scope here)"
        )
    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels)
    else:
        x = x.reshape(-1, 1)
    return x, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """float samples in [-1, 1] (n,) or (n, channels) → PCM16 WAV."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    byte_rate = rate * ch * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, byte_rate, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def _frames(mono: np.ndarray, frame: int, hop: int) -> np.ndarray:
    """(n,) → strided (n_frames, frame) view; at least one (padded)
    frame so empty/short clips still produce features."""
    if len(mono) < frame:
        mono = np.pad(mono, (0, frame - len(mono)))
    n_frames = 1 + (len(mono) - frame) // hop
    return np.lib.stride_tricks.sliding_window_view(mono, frame)[:: hop][:n_frames]


def audio_feature_vector(
    samples: np.ndarray, rate: int, *, frame: int = 1024, hop: int = 512
) -> dict[str, float]:
    """The standard cheap-DSP descriptor set over a decoded clip:
    duration, RMS (mean/max), zero-crossing rate, spectral centroid
    and 85% rolloff (frame-averaged, Hann-windowed rFFT). All numpy,
    all deterministic."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    fr = _frames(mono, frame, hop)
    rms = np.sqrt((fr**2).mean(axis=1))
    zcr = (np.abs(np.diff(np.signbit(fr), axis=1)).sum(axis=1)) / (frame - 1)
    win = np.hanning(frame)
    mag = np.abs(np.fft.rfft(fr * win, axis=1))
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    power = mag**2
    denom = power.sum(axis=1)
    safe = np.where(denom > 0, denom, 1.0)
    centroid = (power * freqs).sum(axis=1) / safe
    cum = np.cumsum(power, axis=1)
    roll_idx = (cum >= 0.85 * denom[:, None]).argmax(axis=1)
    rolloff = freqs[roll_idx]
    return {
        "duration_s": float(len(mono) / rate),
        "rms_mean": float(rms.mean()),
        "rms_max": float(rms.max()),
        "zcr_mean": float(zcr.mean()),
        "centroid_hz": float(np.where(denom > 0, centroid, 0.0).mean()),
        "rolloff_hz": float(rolloff.mean()),
    }


def synth_tone(
    *, freq: float, seconds: float, rate: int = 16000, amp: float = 0.5, seed: int = 0
) -> np.ndarray:
    """Deterministic sine + low noise test signal."""
    t = np.arange(int(seconds * rate)) / rate
    rng = np.random.default_rng(seed)
    return amp * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(len(t))
