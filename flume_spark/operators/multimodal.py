"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* kernels are
deterministic stubs behind `mapInPandas` — the Spark-side contract (schema,
Arrow batch shape, partitioning) is real and tested.  Swapping a stub for a
real codec (PIL / torchaudio / pyav) changes only the inner function.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; keep
`spark.sql.files.maxPartitionBytes` sized so a partition of payloads fits
executor memory, and run decode as `mapInPandas` so each Arrow batch is
bounded (`spark.sql.execution.arrow.maxRecordsPerBatch`).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "id bigint, n_bytes int, media_type string, width int, height int, ok boolean"
)


def to_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo payload builder: treat UTF-8 text bytes as an opaque blob with
    metadata columns — the same shape a real image/audio table would have."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"),
        F.lit("application/octet-stream").alias("media_type"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB decode: derive a deterministic (width, height) from payload bytes.

    Replace with a real codec (e.g. PIL.Image.open) in production; raising
    NotImplementedError here would be correct too, but a deterministic fake
    lets the distributed plumbing be exercised end-to-end in tests.
    """
    if not payload:
        return (0, 0)
    return (len(payload) % 1920 + 1, payload[0] % 1080 + 1)


def decode_media_meta(payloads: DataFrame) -> DataFrame:
    """Arrow-batched 'decode' over (id, payload, n_bytes, media_type).

    Per-batch pandas work — the pattern for any per-item media kernel
    (resize, frame-sample, feature-extract).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(lambda p: _fake_decode(bytes(p)))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "media_type": pdf["media_type"],
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "ok": True,
                }
            )

    return payloads.mapInPandas(batches, schema=MEDIA_META_SCHEMA)


RESIZE_SCHEMA = "id bigint, width int, height int, resized_w int, resized_h int"


def resize_stub(payloads: DataFrame, max_dim: int = 64) -> DataFrame:
    """STUB image resize: fake-decode dims, then scale so max(w,h) == max_dim
    (no upscale).  A real kernel swaps `_fake_decode`/the arithmetic for
    PIL.Image.thumbnail over the payload bytes — batch shape is identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = pdf["payload"].map(lambda p: _fake_decode(bytes(p)))
            w = dims.map(lambda d: d[0]).astype("int64")
            h = dims.map(lambda d: d[1]).astype("int64")
            m = pd.concat([w, h], axis=1).max(axis=1).clip(lower=max_dim)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "resized_w": (w * max_dim // m).astype("int32"),
                    "resized_h": (h * max_dim // m).astype("int32"),
                }
            )

    return payloads.mapInPandas(batches, schema=RESIZE_SCHEMA)


FEATURE_SCHEMA = "id bigint, features array<double>"


def feature_extract_stub(payloads: DataFrame) -> DataFrame:
    """STUB media feature extraction: a deterministic 4-dim embedding from
    payload bytes (each component k/256, exactly representable in binary so
    any engine reproduces it bit-for-bit).  The real kernel swaps the
    arithmetic for a model forward pass over the decoded media — batch
    shape, Arrow transfer, and output schema (`array<double>`) unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf["payload"]:
                b = bytes(p)
                n = len(b)
                feats.append(
                    [
                        (n % 256) / 256.0,
                        (b[0] if b else 0) / 256.0,
                        (b[-1] if b else 0) / 256.0,
                        (n * 7 % 256) / 256.0,
                    ]
                )
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return payloads.mapInPandas(batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "id bigint, frame_idx int, frame_off int, frame_len int"


def frame_sample_stub(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """STUB video frame sampling: emit `n_frames` evenly-spaced byte-slice
    coordinates per payload (an exploding 1->N mapInPandas — the real kernel
    would also carry `frame_bytes`).  frame_len drops the tail remainder."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf["n_bytes"].astype("int64")
            out = []
            for i in range(n_frames):
                out.append(
                    pd.DataFrame(
                        {
                            "id": pdf["id"],
                            "frame_idx": i,
                            "frame_off": (i * (n // n_frames)).astype("int32"),
                            "frame_len": (n // n_frames).astype("int32"),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    return payloads.mapInPandas(batches, schema=FRAME_SCHEMA)
