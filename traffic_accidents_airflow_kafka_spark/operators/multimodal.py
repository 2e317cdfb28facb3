"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

The Spark-side contract for image/audio/video at 100 TB:

- The payload travels as a ``binary`` column next to typed metadata
  (mime, width/height, duration…). Parquet stores it as BYTE_ARRAY;
  column pruning means metadata-only queries never read payload bytes.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: one Python worker per partition, whole column
  batches across the JVM↔Python boundary, never row-at-a-time.
- Content hashing uses SHA-256 (stable across engines and available in
  DuckDB), so even this Python stage's output is oracle-checkable.
- Partition sizing: payloads dominate row width — size
  ``spark.sql.files.maxPartitionBytes`` so a partition of payloads fits
  executor memory, and repartition by a content-hash prefix for even
  batch sizes before the Python stage.

The decode bodies are STUBS (image/audio libraries are not in this
container): ``decode_image_meta`` raises ``NotImplementedError`` where a
real decoder would run, and ``fake_decode_meta`` is the deterministic
stand-in used by tests and the catalog so the Spark plumbing — schema,
UDF signature, Arrow batch shape — is real and exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema of a multimodal asset table: opaque payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

#: Output schema of the metadata-extraction stage.
META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("n_bytes", IntegerType(), True),
        StructField("sha256_prefix", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)


def decode_image_meta(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — requires an imaging library (not in this
    container). Swap in ``PIL.Image.open(io.BytesIO(payload)).size`` when
    available."""
    raise NotImplementedError(
        "image decoding requires an imaging library; use fake_decode_meta "
        "for plumbing tests"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a decoder: derives a fake (width, height)
    from the payload bytes so tests assert real values end-to-end."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 640, 16 + h[1] % 480


def extract_asset_meta(assets: DataFrame, decode=fake_decode_meta) -> DataFrame:
    """Arrow-batched metadata extraction over the payload column.

    ``mapInPandas`` processes whole record batches; the decode function is
    called per payload inside the batch loop (vectorize further inside the
    worker when the real library supports it).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [decode(p) if p is not None else (None, None) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(p) if p is not None else None for p in payloads],
                    "sha256_prefix": [
                        hashlib.sha256(p).hexdigest()[:8] if p is not None else None
                        for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return assets.mapInPandas(batches, META_SCHEMA)


def documents_as_assets(documents: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text bytes as opaque payloads
    so the multimodal plumbing runs against driver-shipped data."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
    )


def fake_embed(payload: bytes, dim: int = 64) -> list[float]:
    """Deterministic feature-extraction stand-in: counter-mode SHA-256
    over the payload expands to ``dim`` floats in [-1, 1). A real encoder
    (CLIP, audio embedder…) swaps in here with the same signature.

    The counter is appended as ASCII (``payload + b"0"``, ``+ b"1"`` …)
    and every byte maps to an exact dyadic float (b/128 - 1), so the
    whole embedding is reproducible in SQL for oracle checks.

    The byte→float map runs in numpy (one vectorized pass per payload,
    not a per-byte Python loop); b/128 − 1 is exact in float32 and
    float64 alike, so the values are bit-identical to the scalar form."""
    digests = [
        hashlib.sha256(payload + str(c).encode()).digest()
        for c in range((dim + 31) // 32)
    ]
    raw = np.frombuffer(b"".join(digests), dtype=np.uint8)[:dim]
    return (raw.astype(np.float64) / 128.0 - 1.0).tolist()


def embed_assets(assets: DataFrame, dim: int = 64, embed=fake_embed) -> DataFrame:
    """Feature extraction: payload → embedding column, Arrow-batched.

    The output shape (id, array<float>) is exactly what the similarity
    operators consume — decode → embed → ANN composes into the standard
    multimodal dedup/retrieval pipeline with no glue."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "embedding": [
                        embed(p, dim) if p is not None else None
                        for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(batches, out_schema)


def frame_sample(assets: DataFrame, every_n_bytes: int = 32) -> DataFrame:
    """'Frame sampling' plumbing demo: slice the payload at a fixed byte
    stride (the video-frame analog), emitting (asset_id, frame_idx,
    frame_bytes). Real frame extraction swaps the slicing for a decoder
    call inside the same mapInPandas shape."""

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame", BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(batches, out_schema)


def resize_images(
    assets: DataFrame, target_w: int = 64, target_h: int = 64, resize=None
) -> DataFrame:
    """Image-resize plumbing: (asset_id, payload) → (asset_id, width,
    height, payload) at the target dimensions, as an Arrow-batched
    ``mapInPandas`` stage.

    ``resize`` is the decoder hook — a real deployment passes
    ``lambda payload, w, h: PIL-or-opencv bytes`` and nothing else
    changes. The default deterministic stand-in truncates/tiles the
    payload to exactly ``target_w * target_h`` bytes (one fake byte per
    output pixel), so batch shapes, output sizes, and schema are
    exercised for real: every output payload is the exact size a real
    w×h single-channel decode would produce.
    """

    out_schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )
    n_out = target_w * target_h

    def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
        reps = -(-n_out // max(len(payload), 1))  # ceil-div tile count
        return (payload * reps)[:n_out] if payload else b"\x00" * n_out

    fn = resize or _fake_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keep = pdf["payload"].notna()
            pdf = pdf[keep]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [
                        fn(bytes(p), target_w, target_h) for p in pdf["payload"]
                    ],
                }
            )

    return assets.mapInPandas(batches, out_schema)
