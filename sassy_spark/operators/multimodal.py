"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

IMAGE decode is REAL for PNG and BMP: the pure-python codec in
``functions/imagecodec.py`` (zlib + struct, no PIL) decodes, resizes
(nearest-neighbor), and re-encodes payloads, and features come from the
decoded pixels (luminance histogram). AUDIO decode is REAL for PCM WAV:
``functions/audiocodec.py`` (struct + numpy, no ffmpeg) decodes 8/16-bit
RIFF PCM and features come from the decoded signal (RMS energy
envelope). Formats beyond that coverage (JPEG/WebP/MP3/video — these
genuinely need PIL/ffmpeg, absent from this container) fall back to the
deterministic fake behind ``SASSY_FAKE_DECODE`` or raise
NotImplementedError when a real decode is demanded. Everything
Spark-side (schemas, batch iteration, partitioning, UDF signatures) is
real and tested either way.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id string, kind string, feature array<float>, n_bytes long"

FRAME_SCHEMA = (
    "media_id string, frame_idx int, ts_ms int, frame_feature array<float>"
)


def _fake_decode_allowed() -> bool:
    return os.environ.get("SASSY_FAKE_DECODE", "1") == "1"


def _fake_feature(payload: bytes, dim: int = 32) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed: hash-seeded pseudo
    features. Stable across processes (seeded from content bytes)."""
    h = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    seed = int(h.astype(np.uint64).sum() % (1 << 31))
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def _decode_image(payload: bytes):
    """(H, W, C) uint8 for PNG/BMP payloads, None for anything else
    (caller decides fake-vs-raise for the rest)."""
    from ..functions.imagecodec import (
        UnsupportedImageError,
        decode_bmp,
        decode_png,
        sniff_format,
    )

    fmt = sniff_format(payload)
    try:
        if fmt == "png":
            return decode_png(payload)
        if fmt == "bmp":
            return decode_bmp(payload)
    except UnsupportedImageError:
        return None
    return None


def _decode_audio(payload: bytes):
    """(n_frames, n_channels) samples for PCM WAV payloads, None for
    anything else (caller decides fake-vs-raise for the rest)."""
    from ..functions.audiocodec import (
        UnsupportedAudioError,
        decode_wav,
        sniff_wav,
    )

    if not sniff_wav(payload):
        return None
    try:
        samples, _rate = decode_wav(payload)
        return samples
    except UnsupportedAudioError:
        return None


def extract_features(
    media: DataFrame, dim: int = 32, batch_hint: int | None = None
) -> DataFrame:
    """binary payload -> feature vector, Arrow-batched. Real pipeline shape:
    one pass, no shuffle, output co-partitioned with input.

    PNG/BMP payloads get a REAL decode-backed feature (L1-normalized
    ``dim``-bin luminance histogram of the decoded pixels); PCM WAV
    payloads get a REAL decode-backed feature (``dim``-segment RMS
    energy envelope of the decoded signal); other payloads use the
    deterministic fake (or raise when ``SASSY_FAKE_DECODE=0``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audiocodec import rms_envelope
        from ..functions.imagecodec import gray_histogram

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                if p is None:
                    feats.append(None)
                    continue
                raw = bytes(p)
                arr = _decode_image(raw)
                if arr is not None:
                    feats.append(gray_histogram(arr, bins=dim))
                    continue
                samples = _decode_audio(raw)
                if samples is not None:
                    feats.append(rms_envelope(samples, bins=dim))
                elif _fake_decode_allowed():
                    feats.append(_fake_feature(raw, dim))
                else:
                    raise NotImplementedError(
                        "real decode beyond PNG/BMP/PCM-WAV requires "
                        "PIL/ffmpeg — not in this image; set "
                        "SASSY_FAKE_DECODE=1 for the deterministic fake"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 16, dim: int = 32
) -> DataFrame:
    """Video frame sampling: one row per sampled frame with a per-frame
    feature. Demonstrates the 1->N explode shape inside mapInPandas (row
    counts may grow, which plain pandas_udf cannot express)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _fake_decode_allowed():
            raise NotImplementedError("real frame decode not available")
        for pdf in batches:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or pd.isna(dur):
                    continue
                n = min(max_frames, max(1, int(dur) // every_ms))
                for i in range(n):
                    ts = i * every_ms
                    rows.append(
                        (
                            mid,
                            i,
                            ts,
                            _fake_feature(
                                bytes(payload) + ts.to_bytes(4, "little"), dim
                            ),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_ms", "frame_feature"]
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)


def resize_images(
    media: DataFrame, max_side: int = 256
) -> DataFrame:
    """Image resize: payloads whose metadata exceeds ``max_side`` are
    re-encoded at the scaled dimensions (aspect preserved); others pass
    through untouched. Same schema in and out, so resize composes with
    the rest of the media pipeline.

    PNG/BMP payloads take the REAL path: decode (pure-python codec),
    nearest-neighbor resample, re-encode in the SAME container format.
    Other image formats fall back to the deterministic fake payload (or
    raise when ``SASSY_FAKE_DECODE=0``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodec import (
            encode_bmp,
            encode_png,
            resize_nearest,
            sniff_format,
        )

        for pdf in batches:
            out_payload, out_w, out_h = [], [], []
            for kind, payload, w, h in zip(
                pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                if (
                    kind != "image"
                    or payload is None
                    or pd.isna(w)
                    or pd.isna(h)
                    or max(int(w), int(h)) <= max_side
                ):
                    out_payload.append(payload)
                    out_w.append(None if pd.isna(w) else int(w))
                    out_h.append(None if pd.isna(h) else int(h))
                    continue
                scale = max_side / max(int(w), int(h))
                nw = max(1, round(int(w) * scale))
                nh = max(1, round(int(h) * scale))
                raw = bytes(payload)
                arr = _decode_image(raw)
                if arr is not None:
                    resized = resize_nearest(arr, nw, nh)
                    if sniff_format(raw) == "bmp":
                        enc = encode_bmp(resized)
                    else:
                        enc = encode_png(resized)
                    out_payload.append(bytearray(enc))
                elif _fake_decode_allowed():
                    fake = _fake_feature(
                        raw + nw.to_bytes(4, "little") + nh.to_bytes(4, "little"),
                        dim=64,
                    )
                    out_payload.append(bytearray(fake.tobytes()))
                else:
                    raise NotImplementedError(
                        "real decode beyond PNG/BMP requires PIL — set "
                        "SASSY_FAKE_DECODE=1 for the deterministic fake"
                    )
                out_w.append(nw)
                out_h.append(nh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "mime": pdf["mime"],
                    "width": pd.array(out_w, dtype="Int32"),
                    "height": pd.array(out_h, dtype="Int32"),
                    "duration_ms": pdf["duration_ms"],
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def synthesize_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests. IMAGE payloads are REAL
    encoded PNGs (even image index) / BMPs (odd) — gradient + noise
    pixels, metadata width/height = the actual encoded dimensions — so
    the decode-backed feature/resize paths are exercised end-to-end.
    AUDIO payloads are REAL PCM WAVs (16-bit mono sine + noise at
    8 kHz, duration_ms = the actual encoded duration). Video payloads
    stay opaque random bytes (no pure-python codec; the fake path
    covers them)."""
    from ..functions.audiocodec import encode_wav
    from ..functions.imagecodec import encode_bmp, encode_png

    rows = []
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w = int(rng.integers(16, 400))
            h = int(rng.integers(16, 400))
            yy, xx = np.mgrid[0:h, 0:w]
            base = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
            noise = rng.integers(0, 32, (h, w, 3), dtype=np.uint8)
            arr = (base[:, :, None] + noise).astype(np.uint8)
            if (i // 3) % 2 == 0:
                payload, mime = encode_png(arr), "image/png"
            else:
                payload, mime = encode_bmp(arr), "image/bmp"
            rows.append(
                (f"m{i:05d}", kind, bytearray(payload), mime, w, h, None)
            )
            continue
        if kind == "audio":
            rate = 8000
            n_frames = int(rng.integers(rate // 4, rate * 2))  # 0.25-2 s
            t = np.arange(n_frames, dtype=np.float64) / rate
            freq = float(rng.integers(100, 2000))
            sig = 12000.0 * np.sin(2 * np.pi * freq * t)
            sig += rng.normal(0, 800.0, n_frames)
            payload = encode_wav(
                np.clip(sig, -32768, 32767).astype(np.int16), rate
            )
            rows.append(
                (
                    f"m{i:05d}",
                    kind,
                    bytearray(payload),
                    "audio/wav",
                    None,
                    None,
                    int(round(n_frames * 1000 / rate)),
                )
            )
            continue
        payload = rng.integers(0, 256, int(rng.integers(64, 2048))).astype(
            np.uint8
        ).tobytes()
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                "video/mp4",
                int(rng.integers(16, 1920)),
                int(rng.integers(16, 1080)),
                int(rng.integers(500, 60000)),
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
