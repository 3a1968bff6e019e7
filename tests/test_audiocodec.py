"""Pure-python WAV codec + the REAL multimodal audio path it enables
(round-4: audio decode was an env-gated fake; PCM WAV is now decoded
for real with struct+numpy, mirroring the round-4 PNG/BMP upgrade)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sassy_spark.functions.audiocodec import (
    UnsupportedAudioError,
    decode_wav,
    encode_wav,
    rms_envelope,
    sniff_wav,
)


def test_wav_round_trip_16bit_stereo():
    rng = np.random.default_rng(0)
    arr = rng.integers(-32768, 32768, (1237, 2)).astype(np.int16)
    samples, rate = decode_wav(encode_wav(arr, 44100))
    assert rate == 44100
    assert samples.dtype == np.int16
    assert np.array_equal(samples, arr)


def test_wav_round_trip_8bit_mono_odd_length():
    """Odd data size exercises the RIFF pad byte on encode and the
    pad-skip in the chunk walk on decode."""
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, (333,)).astype(np.uint8)
    samples, rate = decode_wav(encode_wav(arr, 8000))
    assert rate == 8000
    assert samples.dtype == np.uint8
    assert samples.shape == (333, 1)
    assert np.array_equal(samples[:, 0], arr)


def test_wav_decode_skips_unknown_chunks():
    """A LIST chunk between fmt and data (common in real files) must be
    walked over, not treated as corruption."""
    arr = np.arange(100, dtype=np.int16)
    raw = encode_wav(arr, 16000)
    # splice an odd-sized LIST chunk after fmt (ends at offset 36)
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = raw[:36] + junk + raw[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    samples, rate = decode_wav(spliced)
    assert rate == 16000
    assert np.array_equal(samples[:, 0], arr)


def test_wav_unsupported_loud():
    assert not sniff_wav(b"\x89PNG1234WAVE")
    with pytest.raises(UnsupportedAudioError):
        decode_wav(b"not a wav at all")
    # IEEE float format (3) is outside documented coverage
    raw = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    raw[20:22] = struct.pack("<H", 3)
    with pytest.raises(UnsupportedAudioError, match="audio format 3"):
        decode_wav(bytes(raw))
    # 24-bit PCM is outside documented coverage
    raw = bytearray(encode_wav(np.zeros(10, dtype=np.int16), 8000))
    raw[34:36] = struct.pack("<H", 24)
    with pytest.raises(UnsupportedAudioError, match="24-bit"):
        decode_wav(bytes(raw))
    with pytest.raises(UnsupportedAudioError):
        encode_wav(np.zeros(10, dtype=np.float32), 8000)


def test_rms_envelope_closed_form():
    """Constant-amplitude alternating signal: RMS of every segment is
    exactly the amplitude; 8-bit input is centred at 128 first."""
    amp = 1000
    sig = np.tile(np.array([amp, -amp], dtype=np.int16), 64)
    env = rms_envelope(sig, bins=8)
    assert env.shape == (8,)
    assert np.allclose(env, amp)
    sig8 = np.tile(np.array([128 + 50, 128 - 50], dtype=np.uint8), 64)
    assert np.allclose(rms_envelope(sig8, bins=4), 50.0)
    assert np.array_equal(rms_envelope(np.empty(0, np.int16), 5), np.zeros(5))


def test_multimodal_audio_features_decode_backed(spark):
    """The audio rows of the synthetic media table carry REAL WAVs; the
    feature path must produce the decoded-signal RMS envelope (strictly
    positive for a sine payload) with SASSY_FAKE_DECODE irrelevant, and
    duration_ms metadata must match the encoded frame count."""
    from sassy_spark.functions.audiocodec import decode_wav as dw
    from sassy_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )

    media = synthesize_media(spark, 30, seed=11)
    audio = media.where("kind = 'audio'")
    rows = audio.collect()
    assert rows, "fixture must contain audio rows"
    for r in rows:
        samples, rate = dw(bytes(r.payload))  # real WAV, decodable
        assert rate == 8000
        assert r.duration_ms == round(samples.shape[0] * 1000 / rate)
    feats = {
        r.media_id: r.feature
        for r in extract_features(audio, dim=16).collect()
    }
    for r in rows:
        env = np.array(feats[r.media_id], dtype=np.float32)
        assert env.shape == (16,)
        # a 12000-amplitude sine has RMS ~8485 in every segment — far
        # from both silence and the standard-normal fake feature
        assert env.min() > 1000.0
        # pin against the codec directly: recompute from the payload
        samples, _ = dw(bytes(r.payload))
        expect = rms_envelope(samples, bins=16)
        assert np.allclose(env, expect, rtol=1e-5)
