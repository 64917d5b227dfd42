"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode / feature
extraction / frame sampling as Arrow-batched Python over ``mapInPandas``
(the sanctioned slow path — vectorized batch transfer, never per-row UDFs).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels here are deterministic stand-ins clearly marked as such: the
Spark-side plumbing — schema contracts, Arrow batch shapes, partition
behavior — is real and tested; swapping ``_fake_decode_*`` for a real codec
is a one-function change. ``decode_image_real`` raises NotImplementedError
to mark the seam.

Scale: mapInPandas streams Arrow batches partition-parallel; payload bytes
never hit the driver; output schemas are explicit so downstream Catalyst
plans stay whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, checksum long"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_offset long, frame_bytes int"


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column + typed metadata struct.

    In production the payload is the raw image/audio bytes read from the
    lake; here it is the utf-8 encoding of ``text_col`` so every SF has a
    deterministic corpus. The downstream operators only see bytes.
    """
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "media_meta",
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col).cast("binary")).alias("n_bytes"),
        ),
    )


def decode_image_real(df: DataFrame) -> DataFrame:
    """The real-codec seam. Requires an image library absent from this
    container."""
    raise NotImplementedError(
        "real image decode requires PIL/opencv, not installed here; "
        "use image_features() (deterministic stand-in kernel) for plumbing"
    )


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    STAND-IN KERNEL: width/height/channels are deterministic functions of
    the byte length, checksum is the byte sum — stands in for a real decode
    while exercising the exact batch shape a real one uses.
    """
    cols = (id_col, payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n_bytes.astype("int64"),
                    # fake "decode": dimensions derived from length
                    "width": (n_bytes % 640).astype("int32"),
                    "height": ((n_bytes * 7) % 480).astype("int32"),
                    "channels": pd.Series([3] * len(pdf), dtype="int32"),
                    "checksum": payloads.map(
                        lambda b: sum(b) if b is not None else 0
                    ).astype("int64"),
                }
            )

    return df.select(*cols).mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    every_k: int = 4,
) -> DataFrame:
    """"Video" frame sampling: treat the payload as fixed-size frames and
    emit every k-th frame's (index, byte offset, size) — the row-explosion
    shape of real frame extraction (one input row -> many output rows),
    without the codec. Output rows carry no payload bytes by default; a real
    pipeline would add a cropped/resized frame column here."""
    cols = (id_col, payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_off, out_sz = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    out_id.append(doc_id)
                    out_idx.append(fi)
                    out_off.append(fi * frame_bytes)
                    out_sz.append(frame_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_offset": pd.Series(out_off, dtype="int64"),
                    "frame_bytes": pd.Series(out_sz, dtype="int32"),
                }
            )

    return df.select(*cols).mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)


AUDIO_WINDOWS_SCHEMA = (
    "doc_id long, window_idx int, start_byte long, mean_amp double, peak int"
)


def audio_windows(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    window: int = 32,
) -> DataFrame:
    """"Audio" feature windows: treat the payload as unsigned 8-bit PCM,
    cut non-overlapping ``window``-sample frames, emit per-frame mean
    amplitude and peak — the chunk/feature shape of real audio
    preprocessing (VAD windows, loudness normalization, mel frames),
    without the codec. Trailing partial frames are dropped, as a real
    framer does.

    STAND-IN KERNEL like image_features: a real pipeline swaps the
    np.frombuffer line for torchaudio/soundfile decode; everything else —
    Arrow batching, vectorized per-window reduction, the one-to-many row
    shape — is exactly what production runs. mean_amp divides by a
    power-of-two window so the double is exact and engine-portable.
    """
    import numpy as np

    cols = (id_col, payload_col)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_off, out_mean, out_peak = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples = np.frombuffer(payload, dtype=np.uint8)
                n_frames = len(samples) // window
                if n_frames == 0:
                    continue
                frames = samples[: n_frames * window].reshape(n_frames, window)
                out_id.append(np.full(n_frames, doc_id, dtype=np.int64))
                out_idx.append(np.arange(n_frames, dtype=np.int32))
                out_off.append(
                    np.arange(n_frames, dtype=np.int64) * window
                )
                out_mean.append(
                    frames.sum(axis=1, dtype=np.int64) / float(window)
                )
                out_peak.append(frames.max(axis=1).astype(np.int32))
            if not out_id:
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "window_idx": pd.Series([], dtype="int32"),
                        "start_byte": pd.Series([], dtype="int64"),
                        "mean_amp": pd.Series([], dtype="float64"),
                        "peak": pd.Series([], dtype="int32"),
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_id),
                    "window_idx": np.concatenate(out_idx),
                    "start_byte": np.concatenate(out_off),
                    "mean_amp": np.concatenate(out_mean),
                    "peak": np.concatenate(out_peak),
                }
            )

    return df.select(*cols).mapInPandas(kernel, schema=AUDIO_WINDOWS_SCHEMA)
