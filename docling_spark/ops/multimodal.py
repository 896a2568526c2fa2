"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched mapInPandas stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are STUBBED behind `_decode_image_stub` — a deterministic fake
that derives pixel stats from the payload bytes. The Spark-side contract is
real and tested: schemas, batch iteration, partition passthrough, and the
narrow (shuffle-free) plan shape are exactly what a real decoder would use —
swap the stub for the library call and nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_DDL = (
    "media_id string, media_type string, byte_len long, sha256 string"
)
IMAGE_FEATURES_DDL = (
    MEDIA_META_DDL + ", width int, height int, mean_luma double, decode_ok boolean"
)
FRAME_SAMPLE_DDL = "media_id string, frame_no int, frame_sha string"
RESIZE_DDL = (
    "media_id string, width int, height int, out_width int, out_height int, "
    "out_payload binary"
)
AUDIO_FEATURES_DDL = (
    MEDIA_META_DDL
    + ", duration_s double, sample_rate int, rms double, decode_ok boolean"
)


def _decode_image_stub(payload: bytes):
    """Deterministic fake decoder. A real implementation would be
    `PIL.Image.open(io.BytesIO(payload))`; unavailable in this container.
    Derives (width, height, mean_luma) from the payload digest so tests are
    stable and the downstream schema is exercised with realistic values."""
    if not payload:
        raise NotImplementedError("empty payload — no codec available for real decode")
    d = hashlib.sha256(payload).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    mean_luma = round(d[2] / 255.0, 6)
    return width, height, mean_luma


def media_metadata(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload",
                   type_col: str = "media_type") -> DataFrame:
    """Narrow metadata pass: byte length + content hash per blob."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "media_type": pdf[type_col].astype(str),
                    "byte_len": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                }
            )

    return df.mapInPandas(gen, schema=MEDIA_META_DDL)


def image_features(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload",
                   type_col: str = "media_type") -> DataFrame:
    """Decode + feature-extract (stubbed decode, real plumbing)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf[id_col], pdf[type_col], pdf[payload_col]
            ):
                b = bytes(payload) if payload is not None else b""
                try:
                    w, h, luma = _decode_image_stub(b)
                    ok = True
                except NotImplementedError:
                    w = h = 0
                    luma = 0.0
                    ok = False
                rows.append(
                    (str(mid), str(mtype), len(b), hashlib.sha256(b).hexdigest(), w, h, luma, ok)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "byte_len", "sha256",
                    "width", "height", "mean_luma", "decode_ok",
                ],
            )

    return df.mapInPandas(gen, schema=IMAGE_FEATURES_DDL)


def frame_sample(df: DataFrame, every_n: int = 10, id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Video frame sampling plumbing: 1 row per sampled frame. Frame count is
    derived deterministically from the payload (stub for a demuxer)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, shas = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                n_frames = 1 + (len(b) % 97)  # stub: a demuxer would count real frames
                for fno in range(0, n_frames, every_n):
                    ids.append(str(mid))
                    frames.append(fno)
                    shas.append(hashlib.sha256(b + fno.to_bytes(4, "big")).hexdigest()[:16])
            yield pd.DataFrame({"media_id": ids, "frame_no": frames, "frame_sha": shas})

    return df.mapInPandas(gen, schema=FRAME_SAMPLE_DDL)


def _decode_audio_stub(payload: bytes):
    """Deterministic fake audio decoder. A real implementation would be
    `soundfile.read(io.BytesIO(payload))` / torchaudio; unavailable in this
    container. Derives (duration, sample_rate, rms) from the payload digest."""
    if not payload:
        raise NotImplementedError("empty payload — no codec available for real decode")
    d = hashlib.sha256(payload).digest()
    sample_rate = (8000, 16000, 22050, 44100)[d[0] % 4]
    duration_s = round(0.5 + (int.from_bytes(d[1:3], "big") % 6000) / 100.0, 2)
    rms = round(d[3] / 255.0, 6)
    return duration_s, sample_rate, rms


def audio_features(df: DataFrame, id_col: str = "media_id",
                   payload_col: str = "payload",
                   type_col: str = "media_type") -> DataFrame:
    """Audio decode + feature-extract (stubbed decode, real plumbing):
    duration / sample rate / RMS loudness per blob. Same narrow
    mapInPandas shape as image_features."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf[id_col], pdf[type_col], pdf[payload_col]
            ):
                b = bytes(payload) if payload is not None else b""
                try:
                    dur, sr, rms = _decode_audio_stub(b)
                    ok = True
                except NotImplementedError:
                    dur = 0.0
                    sr = 0
                    rms = 0.0
                    ok = False
                rows.append(
                    (str(mid), str(mtype), len(b), hashlib.sha256(b).hexdigest(),
                     dur, sr, rms, ok)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "byte_len", "sha256",
                    "duration_s", "sample_rate", "rms", "decode_ok",
                ],
            )

    return df.mapInPandas(gen, schema=AUDIO_FEATURES_DDL)


def image_resize(df: DataFrame, max_side: int = 64, id_col: str = "media_id",
                 payload_col: str = "payload") -> DataFrame:
    """Resize plumbing: computes the aspect-preserving target size from the
    (stub-)decoded dimensions and emits a deterministic fake thumbnail
    payload (digest-derived bytes of the right nominal size). A real
    implementation swaps `_decode_image_stub` + the fake thumbnail for
    PIL decode + `img.thumbnail((max_side, max_side))` + re-encode; the
    schema, batch iteration and narrow plan shape stay identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                try:
                    w, h, _ = _decode_image_stub(b)
                except NotImplementedError:
                    rows.append((str(mid), 0, 0, 0, 0, b""))
                    continue
                scale = min(1.0, max_side / max(w, h))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                seed_digest = hashlib.sha256(b + b"resize").digest()
                thumb = (seed_digest * ((ow * oh) // len(seed_digest) + 1))[: ow * oh]
                rows.append((str(mid), w, h, ow, oh, thumb))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "out_width",
                         "out_height", "out_payload"],
            )

    return df.mapInPandas(gen, schema=RESIZE_DDL)


def synth_media_df(spark, n: int = 32, seed: int = 13) -> DataFrame:
    """Deterministic fake media table (binary payloads + metadata)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        size = int(rng.randint(16, 4096))
        payload = bytes(rng.randint(0, 256, size=size, dtype=np.int32).astype(np.uint8))
        mtype = ["image/png", "audio/wav", "video/mp4"][i % 3]
        rows.append((f"media-{i:04d}", mtype, bytearray(payload)))
    return spark.createDataFrame(rows, "media_id string, media_type string, payload binary")
