"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode/feature-extract as Arrow-batched mapInPandas stages.

The image/audio codec libraries are not available in this container, so the
DECODE step is stubbed (deterministic fake features, or
NotImplementedError for real codecs) — but everything Spark-side is real and
tested: the binary column schema, the metadata struct, the mapInPandas batch
shape, and the partition behavior.  Swapping the stub for PIL/librosa is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: set True only in an environment with real codec libraries installed
REAL_CODECS_AVAILABLE = False


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", blocks: int = 1
) -> DataFrame:
    """Simulate a multimodal table: each row carries an opaque binary blob
    plus typed metadata (mime/n_bytes), the layout a real image/audio column
    would use (binary payload + struct metadata, never decoded at scan).
    ``blocks`` md5 blocks of 16 bytes each make longer deterministic
    payloads for windowed kernels."""
    suffixes = ["", "x", "y", "z", "w"][:blocks]
    hexes = [
        F.md5(F.concat(F.col("text"), F.lit(s)) if s else F.col("text"))
        for s in suffixes
    ]
    payload = F.unhex(F.concat(*hexes))
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/x-fake").alias("mime"),
            F.length(payload).alias("n_bytes"),
            (F.col(id_col) % 4).cast("int").alias("shard"),
        ).alias("meta"),
    )


def extract_features(mm: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extractor over binary payloads.

    Stub kernel: deterministic per-blob features (byte stats).  A real
    deployment replaces `_decode_batch` with the codec call; the Spark
    plumbing (schema, Arrow batching, partition-parallelism) is identical.
    """

    def _decode_batch(blobs: pd.Series) -> pd.DataFrame:
        if REAL_CODECS_AVAILABLE:  # pragma: no cover
            raise NotImplementedError("plug image/audio codec here")
        rows = []
        for b in blobs:
            a = np.frombuffer(b, dtype=np.uint8)
            rows.append(
                (
                    int(a.size),
                    float(a.mean()),
                    float(a.std()),
                    [float(x) for x in a[:4]],
                )
            )
        return pd.DataFrame(rows, columns=["n_bytes", "byte_mean", "byte_std", "head4"])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(pdf["payload"])
            feats.insert(0, id_col, pdf[id_col].to_numpy())
            yield feats

    schema = (
        f"{id_col} long, n_bytes long, byte_mean double, byte_std double, "
        "head4 array<double>"
    )
    return mm.select(id_col, "payload").mapInPandas(gen, schema=schema)


def sample_frames(
    mm: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling over an opaque video-like payload: split each blob
    into fixed-size frames, emit every k-th frame (uniform temporal
    sampling) as its own row with (frame_idx, frame bytes, frame feature).

    Stub decode (container lacks video codecs) but REAL pipeline shape:
    one mapInPandas pass, one output row per sampled frame, partition
    parallelism and Arrow batching identical to a real ffmpeg-style
    kernel.  Output size = n_frames x input rows, bounded by parameters."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, means = [], [], [], []
            for did, blob in zip(pdf[id_col], pdf["payload"]):
                a = np.frombuffer(blob, dtype=np.uint8)
                total_frames = max(len(a) // frame_bytes, 1)
                step = max(total_frames // n_frames, 1)
                for k in list(range(0, total_frames, step))[:n_frames]:
                    chunk = a[k * frame_bytes : (k + 1) * frame_bytes]
                    ids.append(did)
                    idxs.append(k)
                    frames.append(chunk.tobytes())
                    means.append(float(chunk.mean()) if len(chunk) else 0.0)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_mean": means,
                }
            )

    return mm.select(id_col, "payload").mapInPandas(
        gen, schema=f"{id_col} long, frame_idx long, frame binary, frame_mean double"
    )


def audio_frame_energy(
    mm: DataFrame,
    win_bytes: int = 8,
    hop_bytes: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio feature extraction shape: sliding RMS-energy windows over the
    payload (librosa frame/hop semantics — full windows only, hop-strided).
    Stub "samples" are raw bytes; a real deployment decodes PCM first.
    One mapInPandas pass, one output row per window: (id, win_idx, energy).

    Output size = rows x n_windows, bounded by (payload_len - win)/hop + 1;
    the kernel is vectorized numpy (stride tricks) per Arrow batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies = [], [], []
            for did, blob in zip(pdf[id_col], pdf["payload"]):
                a = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
                n_win = max((len(a) - win_bytes) // hop_bytes + 1, 0)
                for k in range(n_win):
                    w = a[k * hop_bytes : k * hop_bytes + win_bytes]
                    ids.append(did)
                    idxs.append(k)
                    energies.append(float(np.sqrt(np.mean(w * w))))
            yield pd.DataFrame(
                {id_col: ids, "win_idx": idxs, "energy": energies}
            )

    return mm.select(id_col, "payload").mapInPandas(
        gen, schema=f"{id_col} long, win_idx long, energy double"
    )


def select_keyframes(
    mm: DataFrame,
    frame_bytes: int = 4,
    threshold: float = 40.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Video keyframe selection shape: fixed-size frames, emit frame 0 plus
    every frame whose mean-intensity DELTA vs the previous frame exceeds
    the threshold (the scene-change-detector pattern; a real deployment
    compares decoded luma histograms).  Variable output rows per input —
    the batch shape uniform sampling can't exercise."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, means = [], [], []
            for did, blob in zip(pdf[id_col], pdf["payload"]):
                a = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
                n = len(a) // frame_bytes
                fm = a[: n * frame_bytes].reshape(n, frame_bytes).mean(axis=1)
                prev = None
                for k in range(n):
                    if prev is None or abs(fm[k] - prev) > threshold:
                        ids.append(did)
                        idxs.append(k)
                        means.append(float(fm[k]))
                    prev = fm[k]
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_mean": means}
            )

    return mm.select(id_col, "payload").mapInPandas(
        gen, schema=f"{id_col} long, frame_idx long, frame_mean double"
    )


def resize_thumbnail(
    mm: DataFrame,
    out_bytes: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Image-resize batch shape: FIXED-size output per input (the third
    kernel shape next to uniform sampling and variable keyframes).  Stub
    "resize" = 1-D average pooling of the payload into out_bytes buckets
    (floor of the bucket mean); a real deployment decodes and resamples
    pixels.  Output: (id, thumb hex string, byte_sum) — one row per input,
    constant width."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, thumbs, sums = [], [], []
            for did, blob in zip(pdf[id_col], pdf["payload"]):
                a = np.frombuffer(blob, dtype=np.uint8).astype(np.float64)
                block = max(len(a) // out_bytes, 1)
                pooled = (
                    a[: block * out_bytes]
                    .reshape(out_bytes, block)
                    .mean(axis=1)
                )
                tb = np.floor(pooled).astype(np.uint8)
                ids.append(did)
                thumbs.append("".join(f"{b:02x}" for b in tb))
                sums.append(int(tb.sum()))
            yield pd.DataFrame(
                {id_col: ids, "thumb": thumbs, "byte_sum": sums}
            )

    return mm.select(id_col, "payload").mapInPandas(
        gen, schema=f"{id_col} long, thumb string, byte_sum long"
    )
