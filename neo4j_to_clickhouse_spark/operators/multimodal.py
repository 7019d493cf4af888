"""Multimodal (image/audio/video) column operators (north star).

Design: media are opaque ``binary`` payload columns + typed metadata
(:data:`neo4j_to_clickhouse_spark.schemas.MULTIMODAL_SCHEMA`), the layout
that survives 100 TB — payload bytes move through Arrow record batches,
metadata stays queryable without touching payloads (column pruning means a
metadata-only query never reads a single payload byte from parquet).

Decode/resize/frame-sample are Arrow-batched ``mapInPandas`` operators.
The actual codecs (Pillow/torchaudio/ffmpeg) are NOT in this container, so
the decode core is stubbed: ``decode_stub='fake'`` produces a
deterministic feature vector from the payload hash (real Spark plumbing,
fake pixels); ``decode_stub='raise'`` raises NotImplementedError where the
codec call belongs. Everything around the stub — schema, batching,
partitioning, output contract — is production-shaped and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Literal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def ingest_binary_assets(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    modality: str,
    media_type: str | None = None,
) -> DataFrame:
    """Normalize any (id, binary) frame into the multimodal asset layout:
    content hash + byte size computed natively (sha2/octet_length are
    JVM-side), metadata fields nullable until a decoder fills them."""
    return df.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.lit(media_type).cast("string").alias("media_type"),
        F.col(payload_col).alias("payload"),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in feature vector: bytes of sha256(payload)
    cycled to `dim`, scaled to [0,1). Replace with the real model forward
    pass; the Spark-side contract (binary in, float array out, Arrow
    batches) is identical."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(
    assets: DataFrame,
    dim: int = 16,
    decode_stub: Literal["fake", "raise"] = "fake",
    batch_size: int = 256,
) -> DataFrame:
    """Decode + featurize payloads via Arrow-batched ``mapInPandas``.

    Batch shape is the real one for GPU inference at scale: the iterator
    yields bounded pandas chunks so executor memory is payload-batch-sized,
    never partition-sized. Partition count should track total payload
    bytes / ~128 MB (use ``repartition`` upstream), not row count.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "media codec not available in this environment: "
                        "plug Pillow/torchaudio/ffmpeg decode here"
                    )
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"],
                        "modality": chunk["modality"],
                        "n_bytes": chunk["n_bytes"],
                        "feature": [
                            _fake_feature(p, dim) for p in chunk["payload"]
                        ],
                    }
                )

    cols = assets.select("asset_id", "modality", "n_bytes", "payload")
    return cols.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def resize_images(
    assets: DataFrame, width: int, height: int,
    decode_stub: Literal["fake", "raise"] = "fake",
) -> DataFrame:
    """Image resize plumbing: binary in -> binary out with target dims.

    Stub semantics: 'fake' passes the payload through and stamps the target
    dims (exercises schema/batching); 'raise' marks the codec hole."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("image codec not available: plug Pillow here")
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"],
                }
            )

    return assets.select("asset_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def sample_frames(
    assets: DataFrame, every_ms: int = 1000,
    decode_stub: Literal["fake", "raise"] = "fake",
) -> DataFrame:
    """Video frame sampling plumbing: one row out per sampled frame.

    'fake' emits one frame per `every_ms` of (n_bytes-derived) duration
    with the payload hash as frame bytes — the real operator swaps the
    loop body for an ffmpeg seek+decode. Row explosion happens inside the
    executor, so a 2-hour video never materializes as one row downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError("video codec not available: plug ffmpeg here")
            out = {"asset_id": [], "frame_idx": [], "frame_ms": [], "payload": []}
            for _, row in pdf.iterrows():
                # fake duration: 1 s per KiB, capped — deterministic
                dur = min(int(row["n_bytes"] or 0), 10_000)
                for i, ms in enumerate(range(0, max(dur, 1), every_ms)):
                    out["asset_id"].append(row["asset_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(ms)
                    out["payload"].append(
                        hashlib.sha256(
                            (row["payload"] or b"") + str(i).encode()
                        ).digest()
                    )
            yield pd.DataFrame(out)

    return assets.select("asset_id", "n_bytes", "payload").mapInPandas(
        run, FRAME_SCHEMA
    )
