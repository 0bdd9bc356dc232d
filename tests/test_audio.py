"""WAV codec + DSP feature tests (functions/audio.py) and the
Spark-side audio_features pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from streaming_ecom_analytics_spark.functions import audio, multimodal


def test_wav_roundtrip_pcm16():
    sig = audio.synth_tone(freq=440, seconds=0.5, rate=8000)
    wav = audio.encode_wav(sig, 8000)
    assert audio.sniff_wav(wav)
    out, rate = audio.decode_wav(wav)
    assert rate == 8000 and out.shape == (len(sig), 1)
    # PCM16 quantization error bound: 1/32767 per sample
    assert np.abs(out[:, 0] - np.clip(sig, -1, 1)).max() < 1.5 / 32767


def test_wav_stereo_and_float_formats():
    sig = np.stack(
        [audio.synth_tone(freq=220, seconds=0.1), audio.synth_tone(freq=330, seconds=0.1)],
        axis=1,
    )
    out, rate = audio.decode_wav(audio.encode_wav(sig, 16000))
    assert out.shape == sig.shape and rate == 16000
    # hand-built float32 WAV (format 3)
    import struct

    mono = sig[:, 0].astype("<f4").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(mono))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
        + b"data"
        + struct.pack("<I", len(mono))
    )
    outf, _ = audio.decode_wav(hdr + mono)
    assert np.abs(outf[:, 0] - sig[:, 0]).max() < 1e-6


def test_wav_24bit_decode():
    import struct

    vals = np.array([0.0, 0.5, -0.5, 0.999], dtype=np.float64)
    as24 = (vals * (1 << 23)).astype(np.int64)
    raw = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in as24)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(raw))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 24000, 3, 24)
        + b"data"
        + struct.pack("<I", len(raw))
    )
    out, _ = audio.decode_wav(hdr + raw)
    assert np.allclose(out[:, 0], vals, atol=2e-7)


def test_non_pcm_codec_raises():
    import struct

    hdr = (
        b"RIFF"
        + struct.pack("<I", 36)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 85, 1, 44100, 0, 1, 0)  # 85 = MP3
        + b"data"
        + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="decoder library"):
        audio.decode_wav(hdr)
    with pytest.raises(ValueError, match="RIFF"):
        audio.decode_wav(b"ID3\x03rubbish")


def test_feature_vector_physics():
    """Spectral centroid tracks the tone frequency; RMS tracks amp."""
    lo = audio.audio_feature_vector(audio.synth_tone(freq=200, seconds=0.5), 16000)
    hi = audio.audio_feature_vector(audio.synth_tone(freq=3000, seconds=0.5), 16000)
    assert abs(lo["centroid_hz"] - 200) < 100
    assert abs(hi["centroid_hz"] - 3000) < 200
    assert lo["rolloff_hz"] < hi["rolloff_hz"]
    quiet = audio.audio_feature_vector(
        audio.synth_tone(freq=200, seconds=0.5, amp=0.05), 16000
    )
    assert quiet["rms_mean"] < lo["rms_mean"]
    assert abs(lo["duration_s"] - 0.5) < 1e-9


def test_empty_and_short_clips_do_not_crash():
    fv = audio.audio_feature_vector(np.zeros(10), 8000)
    assert fv["rms_mean"] == 0.0 and fv["centroid_hz"] == 0.0


def test_audio_features_pipeline(spark):
    media = multimodal.synthesize_audio(spark, n=8)
    out1 = multimodal.audio_features(media).orderBy("media_id").collect()
    out2 = multimodal.audio_features(media).orderBy("media_id").collect()
    assert len(out1) == 8
    for r1, r2 in zip(out1, out2):
        assert r1 == r2  # deterministic across runs
        assert r1.sample_rate == 8000
        assert r1.rms_mean > 0
        assert r1.decode_status == "real:wav"
    # media_id i has tone 110*(1+i%8): centroid must rank accordingly
    cents = {r.media_id: r.centroid_hz for r in out1}
    assert cents[0] < cents[7]


def test_audio_spectral_hash_near_dups(spark):
    """A -36 dB noisy re-take must land within the Hamming radius of
    its original, and ONLY the planted pairs may match."""
    from streaming_ecom_analytics_spark.functions import multimodal

    media = multimodal.synthesize_audio_with_dups(spark, n=32)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.audio_near_dups(media).collect()
    }
    assert set(pairs) == {(i, 1000 + i) for i in range(0, 32, 4)}
    assert all(h <= 12 for h in pairs.values())


def test_audio_spectral_hash_gain_invariant():
    """The hash must not move under pure gain change (the double
    log-difference cancels it)."""
    import numpy as np

    from streaming_ecom_analytics_spark.functions import multimodal

    rng = np.random.default_rng(3)
    t = np.arange(4000) / 8000.0
    seg = np.minimum((t * 8 / 0.5).astype(int), 7)
    amps = rng.uniform(0.2, 1.0, (8, 3))
    sig = sum(amps[seg, k] * np.sin(2 * np.pi * f * t) for k, f in enumerate((150.0, 620.0, 1900.0)))
    h1 = multimodal.audio_spectral_hash(sig, 8000)
    h2 = multimodal.audio_spectral_hash(sig * 0.25, 8000)
    assert h1 == h2
