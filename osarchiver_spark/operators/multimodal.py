"""Multimodal (binary) column plumbing (north-star).

Images/audio/video ride through the engine as opaque ``binary``
columns with typed metadata. The Spark-side plumbing — schema,
Arrow-batched mapInPandas, partition-preserving decode — is real and
tested; the actual codec step is STUBBED (the image/audio libraries
are not in this container): ``decode_image``/``decode_audio`` raise
NotImplementedError unless a deterministic fake is requested, exactly
as a production pipeline would fence off codec failures.

Scale notes: decode runs inside mapInPandas over Arrow batches —
per-batch Python cost, zero per-row serde; binary payloads never
pass through the driver; downstream metadata columns are plain
Spark types so Catalyst prunes/pushes as usual.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = (
    "doc_id bigint, byte_len int, magic_int bigint, fake_width int, fake_height int"
)
FRAMES_SCHEMA = "doc_id bigint, n_frames int, frames array<int>"


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Synthesize the opaque payload column (in production this is the
    raw bytes from the object store / parquet binary column). Spread
    across cores so the Arrow decode stage below parallelizes even
    from a single-split source file."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par).select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("content_type"),
    )


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real image decode — stubbed: PIL is not in this container.

    Production swaps this for ``PIL.Image.open(io.BytesIO(payload))``.
    """
    raise NotImplementedError("image codec not available in this environment")


def _fake_dims(magic: int) -> tuple[int, int]:
    """Deterministic fake decode for tests/oracles: dimensions derived
    from the payload header bytes."""
    return 64 + magic % 960, 64 + (magic // 256) % 960


def extract_metadata(df: DataFrame) -> DataFrame:
    """Typed metadata from the binary payload — pure JVM built-ins.

    byte_len, the 4-byte big-endian magic header, and the derived
    (fake) dimensions are all arithmetic on the payload's leading
    bytes: length/substring/hex/conv stay inside whole-stage codegen,
    so the hot metadata path pays no Arrow serde. The Python codec
    fence (real decode) lives in ``extract_metadata_codec``.
    """
    magic = F.conv(F.rpad(F.hex(F.substring(F.col("payload"), 1, 4)), 8, "0"), 16, 10).cast(
        "long"
    )
    return df.select(
        "doc_id",
        F.length("payload").cast("int").alias("byte_len"),
        magic.alias("magic_int"),
    ).select(
        "doc_id",
        "byte_len",
        "magic_int",
        (F.lit(64) + F.col("magic_int") % 960).cast("int").alias("fake_width"),
        (F.lit(64) + F.expr("magic_int DIV 256") % 960).cast("int").alias("fake_height"),
    )


def extract_metadata_codec(df: DataFrame) -> DataFrame:
    """mapInPandas metadata extraction over (doc_id, payload) — the
    codec-shaped path: per-batch Python, where a real decoder
    (PIL/ffmpeg) would run. Falls back to the deterministic fake
    (stub policy above); kept for the decode plumbing, NOT used by
    the registered metadata query (built-ins above are ~10x cheaper
    for plain header arithmetic).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            byte_len = payloads.map(len)
            magic = payloads.map(
                lambda b: int.from_bytes(bytes(b[:4]).ljust(4, b"\0"), "big")
            )
            dims = magic.map(_fake_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": byte_len.astype("int32"),
                    "magic_int": magic.astype("int64"),
                    "fake_width": dims.map(lambda d: d[0]).astype("int32"),
                    "fake_height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, METADATA_SCHEMA)


def sample_frames(df: DataFrame, stride: int = 16) -> DataFrame:
    """Frame sampling: every ``stride``-th byte of the payload (the
    video-keyframe analog). Arrow-batched; output is a typed array
    column ready for downstream feature ops."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = pdf["payload"].map(lambda b: [int(x) for x in bytes(b)[::stride]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": frames.map(len).astype("int32"),
                    "frames": frames,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, FRAMES_SCHEMA)


THUMB_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, dst_w int, dst_h int, thumb binary"
)


def resize_image(payload: bytes, max_dim: int) -> bytes:
    """Real image resize — stubbed: PIL is not in this container.

    Production swaps this for ``PIL.Image.open(...).thumbnail(...)``.
    """
    raise NotImplementedError("image codec not available in this environment")


def resize_thumbs(df: DataFrame, max_dim: int = 64) -> DataFrame:
    """Thumbnail 'resize' over the binary column — the codec-shaped
    batch-transform path (where ``resize_image`` would run per
    payload). Stub policy: dimensions come from the deterministic
    fake decode, the aspect-preserving fit-to-``max_dim`` box is real
    integer arithmetic, and the 'resized' payload is a deterministic
    byte prefix — so the Arrow plumbing (binary in, binary out, typed
    dims) is exercised for real and the oracle can recompute every
    output from the source text. Payloads never visit the driver."""
    import math

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "src_w": [],
                "src_h": [],
                "dst_w": [],
                "dst_h": [],
                "thumb": [],
            }
            for b in pdf["payload"]:
                raw = bytes(b)
                magic = int.from_bytes(raw[:4].ljust(4, b"\0"), "big")
                w, h = _fake_dims(magic)
                # (w * max_dim) / longest — SAME association order as the
                # SQL oracle; w * (max_dim / longest) differs by one ulp
                # exactly when the division is exact (e.g. w == longest)
                longest = max(w, h)
                dw = max(1, math.floor(w * max_dim / longest))
                dh = max(1, math.floor(h * max_dim / longest))
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["dst_w"].append(dw)
                out["dst_h"].append(dh)
                out["thumb"].append(raw[:dw])
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(op, THUMB_SCHEMA)


AUDIO_FEATURES_SCHEMA = "doc_id bigint, window_idx int, n_samples int, rms double"
AUDIO_WINDOW = 256


def decode_audio(payload: bytes) -> list[float]:
    """Real audio decode — stubbed: no audio codec in this container.

    Production swaps this for ``soundfile``/``torchaudio`` decode.
    """
    raise NotImplementedError("audio codec not available in this environment")


def audio_features(df: DataFrame, window: int = AUDIO_WINDOW) -> DataFrame:
    """Feature extraction over the binary column: per-window RMS
    energy of the (fake-decoded) PCM stream — the windowed-feature
    shape a real torchaudio/librosa extractor drops into. Stub
    policy: 'PCM' samples are the payload's centered byte values, so
    every feature is recomputable from the source text by the oracle
    while the Arrow plumbing (binary in, window explode, typed
    feature rows out) is exercised for real. Integer sums keep the
    arithmetic exact in any engine; only the final sqrt/round is
    float."""
    import numpy as np

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, ns, rms = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                x = np.frombuffer(bytes(b), dtype=np.uint8).astype("int64") - 128
                for w in range(0, len(x), window):
                    seg = x[w : w + window]
                    ids.append(doc_id)
                    widx.append(w // window)
                    ns.append(len(seg))
                    rms.append(round(float(np.sqrt((seg * seg).sum() / len(seg))), 4))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": pd.Series(widx, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, AUDIO_FEATURES_SCHEMA)
