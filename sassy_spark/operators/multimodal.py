"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed in Arrow batches via mapInPandas.

The decode kernels (PIL/ffmpeg/librosa) are NOT in this container, so the
byte-level decoders are stubbed behind ``SASSY_FAKE_DECODE`` — a
deterministic fake that produces stable pseudo-features from the bytes —
or raise NotImplementedError when a real decode is demanded. Everything
Spark-side (schemas, batch iteration, partitioning, UDF signatures) is
real and tested: swapping in a real decoder is a one-function change.
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


def extract_features(
    media: DataFrame, dim: int = 32, batch_hint: int | None = None
) -> DataFrame:
    """binary payload -> feature vector, Arrow-batched. Real pipeline shape:
    one pass, no shuffle, output co-partitioned with input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _fake_decode_allowed():
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg — not in this image; "
                "set SASSY_FAKE_DECODE=1 for the deterministic fake"
            )
        for pdf in batches:
            feats = [
                _fake_feature(bytes(p), dim) if p is not None else None
                for p in pdf["payload"]
            ]
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

    Decode/encode is the stubbed step (no PIL in this container): the
    deterministic fake derives the resized payload from the original
    bytes + target dims, so the Spark-side contract — metadata math,
    pass-through behavior, schema stability, batch shape — is fully
    real and tested."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not _fake_decode_allowed():
            raise NotImplementedError(
                "real image decode requires PIL — not in this image; set "
                "SASSY_FAKE_DECODE=1 for the deterministic fake"
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
                fake = _fake_feature(
                    bytes(payload) + nw.to_bytes(4, "little") + nh.to_bytes(4, "little"),
                    dim=64,
                )
                out_payload.append(bytearray(fake.tobytes()))
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
    """Deterministic fake media table for tests (binary payloads with
    plausible metadata)."""
    rows = []
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, int(rng.integers(64, 2048))).astype(
            np.uint8
        ).tobytes()
        rows.append(
            (
                f"m{i:05d}",
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 1920)) if kind != "audio" else None,
                int(rng.integers(16, 1080)) if kind != "audio" else None,
                int(rng.integers(500, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
